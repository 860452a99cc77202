"""Items pipeline: parse + enrichment over a crawled corpus, vs a plain
per-doc oracle built from the same scalar kernels."""

import hashlib

import pyarrow as pa
import ray.data as rd

from gocrawler_ray.corpus import REVIEW_SEP, CorpusSpec, generate
from gocrawler_ray.functions import item_id, parse_price_text
from gocrawler_ray.functions.text import normalize_review
from gocrawler_ray.pipelines.items import build_items
from gocrawler_ray.stages.analyzer import SENTIMENTS


def _oracle_item(doc_id, spans):
    name = brand = ""
    count = 0
    details, desc, reviews = [], [], []
    price = 0
    for s in spans:
        if s["kind"] in ("text", "detail"):
            t = s["text"].strip()
            if not t:
                continue
            if count == 0:
                name = t
            elif count == 1:
                brand = t
            elif ":" in t:
                k, v = t.split(":")[0], t.split(":")[1]
                details.append((k.strip(), v.strip()))
            elif s["kind"] == "text":
                desc.append(t)
            count += 1
        elif s["kind"] == "price":
            p = parse_price_text(s["text"])
            if p is not None:
                price = p
        elif s["kind"] == "review":
            # field 5 (review-date text) is read and discarded (amazon.go:255)
            a, st, ti, c = s["text"].split(REVIEW_SEP)[:4]
            reviews.append(
                (ti, normalize_review(c), a, float(st.split()[0]))
            )
    return name, brand, "\n".join(desc), price, details, reviews


def test_items_pipeline_matches_oracle():
    t = generate(CorpusSpec(n_docs=200, n_hosts=2))
    c = t["corpus"]
    # ≥2 blocks so the analyzer actor pool (min 2) gets parallel input
    docs = rd.from_arrow([c.slice(0, 100), c.slice(100)])
    items = build_items(docs, analyzer_concurrency=2).to_pandas()
    by_doc = {r["doc_id"]: r for _, r in items.iterrows()}

    n_products = n_reviews = 0
    for row in t["corpus"].to_pylist():
        spans = row["spans"]
        if any(s["kind"] == "captcha" for s in spans):
            assert row["doc_id"] not in by_doc  # quarantined
            continue
        got = by_doc[row["doc_id"]]
        name, brand, desc, price, details, reviews = _oracle_item(
            row["doc_id"], spans
        )
        assert got["name"] == name and got["brand"] == brand
        assert got["description"] == desc
        assert got["price_cents"] == price
        assert [(d["key"], d["value"]) for d in got["details"]] == details
        assert got["id"] == item_id(name, "Synth")
        assert len(got["reviews"]) == len(reviews)
        for g, (ti, c, a, st) in zip(got["reviews"], reviews):
            n_reviews += 1
            assert (g["title"], g["content"], g["author"], g["stars"]) == (ti, c, a, st)
            # Comment.Date never populated (amazon.go:255) → Go zero time
            assert g["date"] == "1 Jan 0001 00:00:00"
            # deterministic enrichment stub
            h = hashlib.md5(c.encode()).digest()[0]
            assert g["sentiment"] == SENTIMENTS[h % 4]
            assert isinstance(list(g["entities"]), list)
        if name:
            n_products += 1
    assert n_products > 50 and n_reviews > 20
