"""Amazon profile end-to-end (M9/M10): the AMAZON regexes drive a real
crawl over the amazon-shaped derived web, the engine matches the oracle
walker, and the amazon parse variants produce the reference's column
semantics (rating set, no-colon price, normalize_kv details, bullets
TrimSpace, dup-key overwrite)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gocrawler_ray.config import AMAZON, CrawlConfig
from gocrawler_ray.corpus import REVIEW_SEP
from gocrawler_ray.pipelines.crawl import run_crawl
from gocrawler_ray.pipelines.derived import amazon_url_of, derive_amazon_corpus
from gocrawler_ray.pipelines.oracle import crawl_oracle
from gocrawler_ray.stages.extract import parse_items_amazon
from gocrawler_ray.sources.tables import read_table

CKPT = "/tmp/gocrawler_test/golden_amazon"
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def amazon_pair():
    docs = pq.read_table(os.path.join(SF, "documents.parquet"))
    t = derive_amazon_corpus(docs)
    oracle = crawl_oracle(t["corpus"], t["hosts"], t["seeds"], AMAZON)
    shutil.rmtree(CKPT, ignore_errors=True)
    cfg = CrawlConfig(num_seen_shards=2, fetcher_concurrency=2, batch_size=512)
    res = run_crawl(t["corpus"], t["hosts"], t["seeds"], AMAZON, cfg, CKPT)
    return t, oracle, res


def _read_all(sub: str) -> pa.Table:
    base = os.path.join(CKPT, sub)
    return pa.concat_tables(
        [read_table(os.path.join(base, d)) for d in sorted(os.listdir(base))]
    )


def test_amazon_crawl_matches_oracle(amazon_pair):
    _, oracle, _ = amazon_pair
    docs = _read_all("docs")
    assert set(docs.column("url").to_pylist()) == oracle.seen
    got = {
        r["url"]: r["spans"] for r in docs.to_pylist() if r["status"] == "ok"
    }
    assert got == oracle.docs  # span-sequence equality, kind+text+order


def test_amazon_parse_semantics():
    batch = pa.table(
        {
            "doc_id": [amazon_url_of(8)],
            "spans": [
                [
                    {"kind": "name", "text": "\nEcho Dot\n", "media_ref": "", "offset": 0},
                    {"kind": "brand", "text": "Amazon Basics", "media_ref": "", "offset": 1},
                    {"kind": "stars", "text": "4.5 de 5 estrellas", "media_ref": "", "offset": 2},
                    {"kind": "price", "text": "$1,299.00", "media_ref": "", "offset": 3},
                    # detail_row: BOTH sides normalize_kv (colon + 2+ws drop)
                    {"kind": "detail_row", "text": f"Peso : neto{REVIEW_SEP}500  g\nx", "media_ref": "", "offset": 4},
                    # dup key overwrites (Go map semantics)
                    {"kind": "detail_row", "text": f"Peso : neto{REVIEW_SEP}600 g", "media_ref": "", "offset": 5},
                    # bullet_row: key normalized, value only TrimSpace-d
                    {"kind": "bullet_row", "text": f"ASIN{REVIEW_SEP}  B000000008 ", "media_ref": "", "offset": 6},
                ]
            ],
        }
    )
    out = parse_items_amazon(batch).to_pylist()[0]
    assert out["name"] == "Echo Dot"  # Trim of \n only
    assert out["brand"] == "Amazon Basics"
    assert out["rating"] == 4.5  # amazon SETS rating (mixup leaves 0)
    assert out["price_cents"] == 129900  # no colon split, $/, dropped
    assert out["description"] == ""  # amazon never sets description
    d = {kv["key"]: kv["value"] for kv in out["details"]}
    # "Peso : neto" → ':' dropped, single spaces kept → "Peso  neto"
    assert d["Peso  neto"] == "600 g"  # later row overwrote; "500  g\nx"→"500gx" anyway
    assert d["ASIN"] == "B000000008"  # TrimSpace only
    from gocrawler_ray.functions.urls import md5_hex

    assert out["id"] == md5_hex("Echo Dot/Amazon")


def test_amazon_unparseable_price_and_stars_zero():
    batch = pa.table(
        {
            "doc_id": [amazon_url_of(9)],
            "spans": [
                [
                    {"kind": "name", "text": "X", "media_ref": "", "offset": 0},
                    {"kind": "stars", "text": "sin calificación", "media_ref": "", "offset": 1},
                    {"kind": "price", "text": "$precio no disponible", "media_ref": "", "offset": 2},
                ]
            ],
        }
    )
    out = parse_items_amazon(batch).to_pylist()[0]
    assert out["rating"] == 0.0
    assert out["price_cents"] == 0
