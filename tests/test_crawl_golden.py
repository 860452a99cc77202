"""Golden end-to-end: the Ray engine must reproduce the oracle exactly —
crawl order, URL-seen membership, span sequences, politeness schedule,
lineage statuses (FIXTURES.md §4/§6)."""

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gocrawler_ray.config import CrawlConfig
from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
from gocrawler_ray.pipelines.crawl import run_crawl
from gocrawler_ray.pipelines.oracle import crawl_oracle
from gocrawler_ray.sources.tables import read_table
import os


SPEC = CorpusSpec(n_docs=300, n_hosts=3)
CKPT = "/tmp/gocrawler_test/golden"


@pytest.fixture(scope="module")
def crawl_pair():
    t = generate(SPEC)
    prof = profile_of(SPEC)
    oracle = crawl_oracle(t["corpus"], t["hosts"], t["seeds"], prof)
    shutil.rmtree(CKPT, ignore_errors=True)
    cfg = CrawlConfig(num_seen_shards=4, fetcher_concurrency=2, batch_size=512)
    res = run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, cfg, CKPT)
    return t, oracle, res


def _read_all(root: str, sub: str) -> pa.Table:
    if sub == "lineage":
        from gocrawler_ray.state.checkpoint import CheckpointStore

        return CheckpointStore(root).read_all_lineage_table()
    base = os.path.join(root, sub)
    tables = [read_table(os.path.join(base, d)) for d in sorted(os.listdir(base))]
    return pa.concat_tables([t for t in tables if t.num_rows >= 0])


def test_crawl_order_matches_oracle(crawl_pair):
    _, oracle, res = crawl_pair
    lineage = _read_all(CKPT, "lineage")
    fetch_rows = lineage.filter(
        pa.compute.not_equal(lineage.column("status"), "robots_denied")
    ).to_pylist()
    engine_order = sorted(
        (r["seq"], r["url"], r["depth"], r["priority"], r["host"]) for r in fetch_rows
    )
    assert engine_order == oracle.order


def test_seen_set_matches_oracle(crawl_pair):
    # the docs table holds one row per admitted url (incl. robots-denied)
    # — its url set IS the URL-seen membership
    _, oracle, res = crawl_pair
    docs = _read_all(CKPT, "docs")
    engine_seen = set(docs.column("url").to_pylist())
    assert engine_seen == oracle.seen


def test_span_sequences_match_oracle(crawl_pair):
    _, oracle, res = crawl_pair
    docs = _read_all(CKPT, "docs")
    ok = docs.filter(pa.compute.equal(docs.column("status"), "ok"))
    engine_docs = dict(
        zip(ok.column("url").to_pylist(), ok.column("spans").to_pylist())
    )
    assert set(engine_docs) == set(oracle.docs)
    for url, spans in oracle.docs.items():
        got = engine_docs[url]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans
        ], f"span mismatch for {url}"


def test_politeness_schedule_matches_oracle(crawl_pair):
    _, oracle, res = crawl_pair
    lineage = _read_all(CKPT, "lineage")
    rows = lineage.filter(
        pa.compute.not_equal(lineage.column("status"), "robots_denied")
    ).to_pylist()
    for r in rows:
        assert oracle.schedule[r["url"]] == (
            r["sched_start_ms"],
            r["sched_end_ms"],
        ), f"schedule mismatch for {r['url']}"


def test_lineage_statuses_match_oracle(crawl_pair):
    _, oracle, res = crawl_pair
    lineage = _read_all(CKPT, "lineage")
    engine = {
        (r["req_id"], r["url"], r["status"], r["error"])
        for r in lineage.to_pylist()
    }
    expected = {
        (r["req_id"], r["url"], r["status"], r["error"]) for r in oracle.lineage
    }
    assert engine == expected
    # failures recorded, never retried: one lineage row per url
    urls = lineage.column("url").to_pylist()
    assert len(urls) == len(set(urls))


def test_distributed_schedule_path_matches_driver_path(crawl_pair):
    """Force the groupby(host) distributed scheduler (driver_schedule_limit=0)
    and assert identical order + schedule as the driver-side path."""
    t, oracle, _ = crawl_pair
    root = CKPT + "_dist"
    shutil.rmtree(root, ignore_errors=True)
    cfg = CrawlConfig(
        num_seen_shards=4, fetcher_concurrency=2, batch_size=512,
        driver_schedule_limit=0,
    )
    run_crawl(t["corpus"], t["hosts"], t["seeds"], profile_of(SPEC), cfg, root)
    lineage = _read_all(root, "lineage")
    rows = lineage.filter(
        pa.compute.not_equal(lineage.column("status"), "robots_denied")
    ).to_pylist()
    engine_order = sorted(
        (r["seq"], r["url"], r["depth"], r["priority"], r["host"]) for r in rows
    )
    assert engine_order == oracle.order
    for r in rows:
        assert oracle.schedule[r["url"]] == (r["sched_start_ms"], r["sched_end_ms"])


def test_crawl_has_exercised_every_path(crawl_pair):
    _, oracle, res = crawl_pair
    lineage = _read_all(CKPT, "lineage")
    statuses = set(lineage.column("status").to_pylist())
    assert statuses == {"ok", "not_found", "robots_denied"}
    docs = _read_all(CKPT, "docs")
    kinds = {
        s["kind"]
        for spans in docs.filter(
            pa.compute.equal(docs.column("status"), "ok")
        ).column("spans").to_pylist()
        for s in spans
    }
    assert {"captcha", "link", "price", "review", "detail"} <= kinds
