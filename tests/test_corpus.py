"""Corpus generator: determinism, input_hint schema, graph invariants."""

import pyarrow as pa

from gocrawler_ray.corpus import CORPUS_SCHEMA, CorpusSpec, generate, profile_of
from gocrawler_ray.functions import absolutize, host_of


def test_schema_matches_input_hint():
    t = generate(CorpusSpec(n_docs=60, n_hosts=2))
    assert t["corpus"].schema.equals(CORPUS_SCHEMA)
    spans_t = t["corpus"].schema.field("spans").type
    assert pa.types.is_list(spans_t)
    names = [spans_t.value_type.field(i).name for i in range(4)]
    assert names == ["kind", "text", "media_ref", "offset"]


def test_deterministic():
    a = generate(CorpusSpec(n_docs=120, n_hosts=3))
    b = generate(CorpusSpec(n_docs=120, n_hosts=3))
    assert a["corpus"].equals(b["corpus"])
    assert a["hosts"].equals(b["hosts"])
    assert a["seeds"].equals(b["seeds"])


def test_offsets_monotone_and_kinds():
    t = generate(CorpusSpec(n_docs=100, n_hosts=2))["corpus"]
    kinds_seen = set()
    for row in t.to_pylist():
        offs = [s["offset"] for s in row["spans"]]
        assert offs == list(range(len(offs)))
        for s in row["spans"]:
            kinds_seen.add(s["kind"])
            if s["kind"] in ("media", "link"):
                assert s["media_ref"]
            else:
                assert s["media_ref"] == ""
    assert {"text", "detail", "price", "media", "link", "captcha"} <= kinds_seen


def test_links_mix_and_seed_reachability():
    spec = CorpusSpec(n_docs=200, n_hosts=2)
    t = generate(spec)
    prof = profile_of(spec)
    ex = prof.extraction_re()
    doc_ids = set(t["corpus"]["doc_id"].to_pylist())
    n_match = n_nomatch = n_rel = n_dangling = 0
    for row in t["corpus"].to_pylist():
        for s in row["spans"]:
            if s["kind"] != "link":
                continue
            if not s["media_ref"].startswith("http"):
                n_rel += 1
            url = absolutize(row["doc_id"], s["media_ref"])
            if ex.search(url):
                n_match += 1
                if url not in doc_ids:
                    n_dangling += 1
            else:
                n_nomatch += 1
    assert n_match > 50 and n_nomatch > 5 and n_rel > 5 and n_dangling > 0
    for seed in t["seeds"]["url"].to_pylist():
        assert seed in doc_ids
        assert host_of(seed) in set(t["hosts"]["host"].to_pylist())
