"""Stage unit tests: span parse (M7-M11), link extraction (M4/M5),
candidate filter RE2/Python-re parity (M1-M3), fetcher lookup (J3)."""

import numpy as np
import pyarrow as pa
import ray

from gocrawler_ray.config import CrawlConfig
from gocrawler_ray.corpus import REVIEW_SEP, SPAN_TYPE, CorpusSpec, generate, profile_of
from gocrawler_ray.functions import absolutize, item_id
from gocrawler_ray.stages.candidates import CandidateFilter
from gocrawler_ray.stages.extract import extract_links, parse_items


def _doc(doc_id, spans):
    rows = [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(spans)
    ]
    return doc_id, rows


def _batch(*docs):
    return pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.string()),
            "spans": pa.array([d[1] for d in docs], pa.list_(SPAN_TYPE)),
        }
    )


def test_parse_items_positional_semantics():
    batch = _batch(
        _doc(
            "https://h/shop/detproducto.aspx?sku=1",
            [
                ("text", "  Producto Uno  ", ""),
                ("text", "Sony", ""),
                ("detail", "Formato: CD", ""),
                ("detail", "Peso: 100 g: extra", ""),
                ("price", "Precio:  $1,234.56", ""),
                ("text", "descripcion larga sin dos puntos", ""),
                ("media", "", "https://cdn/h.jpg"),
                ("review", REVIEW_SEP.join(["ana", "4.5 out of 5 stars", "Buen disco", "me  gusto\nmucho"]), ""),
            ],
        )
    )
    out = parse_items(batch, source_store="Synth").to_pylist()[0]
    assert out["name"] == "Producto Uno"
    assert out["brand"] == "Sony"
    assert out["details"] == [
        {"key": "Formato", "value": "CD"},
        {"key": "Peso", "value": "100 g"},
    ]
    assert out["price_cents"] == 123456
    assert out["description"] == "descripcion larga sin dos puntos"
    assert out["image_urls"] == ["https://cdn/h.jpg"]
    assert out["rating"] == 0.0
    assert out["reviews"] == [
        {
            "title": "Buen disco",
            "content": "megustomucho",
            "author": "ana",
            "stars": 4.5,
            "date": "1 Jan 0001 00:00:00",
        }
    ]
    assert out["id"] == item_id("Producto Uno", "Synth")
    assert not out["is_captcha"]


def test_parse_items_price_multi_colon_matches_scalar_kernel():
    # mixup semantics: strings.Split(text, ":")[1] — ONLY the segment
    # between the 1st and 2nd colon parses ("Precio: $3: off" → 300)
    from gocrawler_ray.functions.text import parse_price_text

    batch = _batch(
        _doc(
            "https://h/shop/detproducto.aspx?sku=9",
            [("text", "N", ""), ("text", "B", ""), ("price", "Precio: $3: off", "")],
        )
    )
    out = parse_items(batch, source_store="Synth").to_pylist()[0]
    assert out["price_cents"] == 300
    assert parse_price_text("Precio: $3: off") == 300


def test_parse_items_meta_swap_matches_reference_bug():
    # mixup.go:72-73 reads meta[name="Description"] into the variable
    # named `keywords` and vice versa — the swap is part of the contract
    batch = _batch(
        _doc(
            "https://h/shop/detproducto.aspx?sku=7",
            [
                ("text", "N", ""),
                ("text", "B", ""),
                ("meta", "Keywords: kw stuff", ""),
                ("meta", "Description: a descriptive page", ""),
                ("meta", "Keywords: second ignored", ""),
            ],
        )
    )
    out = parse_items(batch, source_store="Synth").to_pylist()[0]
    assert out["meta_keywords"] == "a descriptive page"
    assert out["meta_description"] == "kw stuff"  # first match wins


def test_parse_items_captcha_and_empty():
    batch = _batch(
        _doc("https://h/a", [("captcha", "type the characters", "")]),
        _doc("https://h/b", []),
    )
    out = parse_items(batch).to_pylist()
    assert out[0]["is_captcha"] and out[0]["name"] == ""
    assert not out[1]["is_captcha"] and out[1]["name"] == ""


def test_extract_links_absolutization_and_captcha_suppression():
    batch = _batch(
        _doc(
            "https://h/shop/cat.aspx?etq=c1",
            [
                ("link", "a", "detproducto.aspx?sku=9"),
                ("link", "b", "https://other/x"),
                ("text", "hi", ""),
            ],
        ),
        _doc(
            "https://h/shop/cat.aspx?etq=c2",
            [("captcha", "blocked", ""), ("link", "c", "https://h/y")],
        ),
    )
    out = extract_links(batch).to_pylist()
    assert [r["url"] for r in out] == [
        "https://h/shop/detproducto.aspx?sku=9",
        "https://other/x",
    ]
    assert out[0]["discovered_from"] == "https://h/shop/cat.aspx?etq=c1"
    assert out[0]["anchor_text"] == "a"


def test_candidate_filter_matches_python_re():
    """RE2 (Arrow kernel) and Python re must agree on the shop patterns —
    the engine uses the former, the oracle the latter."""
    spec = CorpusSpec(n_docs=300, n_hosts=3)
    t = generate(spec)
    prof = profile_of(spec)
    # every link target in the corpus (the realistic input distribution)
    urls = []
    for row in t["corpus"].to_pylist():
        for s in row["spans"]:
            if s["kind"] == "link":
                urls.append(absolutize(row["doc_id"], s["media_ref"]))
    batch = pa.table({"url": pa.array(urls, pa.string())})
    out = CandidateFilter(prof, 4)(batch)
    got = set(out.column("url").to_pylist())
    ex, allowed = prof.extraction_re(), prof.allowed_hosts()
    from gocrawler_ray.functions import host_of

    expect = {u for u in urls if host_of(u) in allowed and ex.search(u)}
    assert got == expect
    # priority: product regex
    pr = prof.product_re()
    got_prio = dict(zip(out.column("url").to_pylist(), out.column("priority").to_pylist()))
    for u, p in got_prio.items():
        assert p == (0 if pr.search(u) else 1)


def test_fetcher_lookup_and_not_found():
    from gocrawler_ray.stages.fetcher import Fetcher, build_corpus_index

    spec = CorpusSpec(n_docs=80, n_hosts=2)
    corpus = generate(spec)["corpus"]
    ref, iref = ray.put(corpus), ray.put(build_corpus_index(corpus))
    f = Fetcher(ref, iref)
    doc_ids = corpus.column("doc_id").to_pylist()
    batch = pa.table(
        {
            "url": pa.array([doc_ids[3], "https://missing/x", doc_ids[10]]),
            "host": pa.array(["h", "h", "h"]),
            "depth": pa.array(np.zeros(3, dtype=np.int32)),
            "priority": pa.array(np.zeros(3, dtype=np.int32)),
            "seq": pa.array([0, 1, 2], pa.int64()),
            "sched_start_ms": pa.array([0, 0, 0], pa.int64()),
            "sched_end_ms": pa.array([1, 1, 1], pa.int64()),
        }
    )
    out = f(batch).to_pylist()
    assert [r["status"] for r in out] == ["ok", "not_found", "ok"]
    assert out[0]["spans"] == corpus.column("spans")[3].as_py()
    assert out[1]["spans"] is None or out[1]["spans"] == []
    # M17: header rotation surfaced in lineage, deterministic per url
    from gocrawler_ray.stages.fetcher import HEADERS_POOL, header_indices

    expect_idx = header_indices([doc_ids[3], "https://missing/x", doc_ids[10]])
    assert [r["header_idx"] for r in out] == expect_idx.tolist()
    assert all(0 <= i < len(HEADERS_POOL) for i in expect_idx)
    # T4: cookie jar accrued a session cookie for the fetched host
    assert "h" in f.cookies and f.cookies["h"].startswith("session=")
    jar_before = dict(f.cookies)
    f(batch)  # same host again: cookie is STABLE, not re-minted
    assert f.cookies == jar_before


def test_header_rotation_deterministic_sequence():
    from gocrawler_ray.stages.fetcher import HEADERS_POOL, header_indices, headers_for

    urls = [f"https://h/p{i}" for i in range(50)]
    a = header_indices(urls)
    b = header_indices(urls)
    assert a.tolist() == b.tolist()  # pinned sequence
    assert len(set(a.tolist())) > 1  # actually rotates
    assert headers_for(urls[0]) is HEADERS_POOL[a[0]]


def test_split_sample_deterministic_and_partitioned():
    """Sampling/split ops: pure hash-of-id — stable across calls and
    batch boundaries; splits partition the kept set at ~the weights."""
    from gocrawler_ray.stages.sampling import (
        assign_split, sample_bound, sample_mask, split_thresholds,
    )

    t = pa.table({"doc_id": pa.array(range(20000), pa.int64())})
    kept = sample_mask(t, rate=0.25, seed=3)
    # deterministic, and independent of how rows are batched
    again = sample_mask(t, rate=0.25, seed=3)
    assert kept.column("doc_id").to_pylist() == again.column("doc_id").to_pylist()
    halves = [sample_mask(t.slice(0, 9999), 0.25, seed=3),
              sample_mask(t.slice(9999), 0.25, seed=3)]
    assert (
        halves[0].column("doc_id").to_pylist() + halves[1].column("doc_id").to_pylist()
        == kept.column("doc_id").to_pylist()
    )
    assert abs(kept.num_rows / 20000 - 0.25) < 0.02  # uniform-ish

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s = assign_split(kept, w, seed=3)
    counts = dict(zip(*np.unique(np.asarray(s.column("split")), return_counts=True)))
    assert set(counts) == set(w)
    for name, frac in w.items():
        assert abs(counts[name] / s.num_rows - frac) < 0.03
    # a different seed reshuffles membership; same seed never does
    assert sample_mask(t, 0.25, seed=4).column("doc_id").to_pylist() != \
        kept.column("doc_id").to_pylist()
    # threshold helper: bounds are exact ints, last bound covers 2^64
    bounds = split_thresholds(w)
    assert bounds[-1][1] == 1 << 64 and all(isinstance(b, int) for _, b in bounds)
    assert 0 < sample_bound(0.25) < (1 << 64)


def test_stratified_mask_rates_and_partition_stability():
    """Per-stratum rates apply independently; unseen strata drop; the
    kept set is a pure function of (id, seed) — batch-boundary-free."""
    from gocrawler_ray.stages.sampling import stratified_mask

    n = 30000
    strata = ["a", "b", "c"]
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array([strata[i % 3] for i in range(n)]),
    })
    rates = {"a": 1.0, "b": 0.25}  # "c" absent → dropped
    kept = stratified_mask(t, rates, "event_type", seed=11)
    types = np.asarray(kept.column("event_type"))
    assert (types != "c").all()
    assert (types == "a").sum() == n // 3  # rate 1.0 keeps every row
    assert abs((types == "b").sum() / (n // 3) - 0.25) < 0.03
    halves = [stratified_mask(t.slice(0, 13337), rates, "event_type", seed=11),
              stratified_mask(t.slice(13337), rates, "event_type", seed=11)]
    assert (
        halves[0].column("event_id").to_pylist()
        + halves[1].column("event_id").to_pylist()
        == kept.column("event_id").to_pylist()
    )


def test_weighted_mask_rates_and_determinism():
    from gocrawler_ray.stages.sampling import weighted_mask

    n = 30000
    t = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    # weight 1 keeps everything; weight 0 keeps nothing
    assert weighted_mask(t, np.ones(n), seed=5).num_rows == n
    assert weighted_mask(t, np.zeros(n), seed=5).num_rows == 0
    # intermediate weights keep ~the expected fraction, deterministically
    w = np.full(n, 0.3)
    kept = weighted_mask(t, w, seed=5)
    again = weighted_mask(t, w, seed=5)
    assert kept.column("doc_id").to_pylist() == again.column("doc_id").to_pylist()
    assert abs(kept.num_rows / n - 0.3) < 0.02
    # out-of-range weights clip instead of misbehaving
    assert weighted_mask(t, np.full(n, 7.0), seed=5).num_rows == n


def test_pack_sequences_greedy_edges(ray_session):
    """Greedy packing edge semantics: exact fit stays in the pack, the
    overflowing doc opens the next one, an oversized doc owns a pack
    alone, and the first doc anchors pack 0 even when oversized."""
    import ray.data as rd
    from gocrawler_ray.stages.packing import pack_sequences

    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "ws_tokens": pa.array([120, 80, 56, 1, 999, 10], pa.int64()),
    })
    out = (
        pack_sequences(rd.from_arrow(t), budget=256, num_buckets=1)
        .to_pandas().sort_values("doc_id")
    )
    # 120+80+56 = 256 exact fit; +1 overflows; 999 oversized → alone
    assert out["pack_id"].tolist() == [0, 0, 0, 1, 2, 3]

    big_first = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "ws_tokens": pa.array([999, 5], pa.int64()),
    })
    out2 = (
        pack_sequences(rd.from_arrow(big_first), budget=256, num_buckets=1)
        .to_pandas().sort_values("doc_id")
    )
    assert out2["pack_id"].tolist() == [0, 1]


def test_pack_sequences_invariants_random(ray_session):
    """Randomized invariants: within every bucket, pack ids start at 0
    and are contiguous; every pack's token sum fits the budget unless
    it is a single oversized doc; doc order within a bucket is id
    order; and the greedy recurrence matches a reference loop."""
    import ray.data as rd
    from gocrawler_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(23)
    n, budget = 3000, 200
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "ws_tokens": pa.array(
            rng.choice([0, 1, 17, 60, 199, 200, 201, 450], size=n), pa.int64()
        ),
    })
    out = (
        pack_sequences(rd.from_arrow(t), budget=budget, num_buckets=8)
        .to_pandas().sort_values(["bucket", "doc_id"]).reset_index(drop=True)
    )
    assert len(out) == n
    for _, g in out.groupby("bucket"):
        packs = g["pack_id"].to_numpy()
        assert packs[0] == 0 and (np.diff(packs) >= 0).all()
        assert set(np.unique(packs)) == set(range(packs.max() + 1))
        # reference greedy replay (same recurrence as the kernel/oracle)
        running, p = 0, 0
        for i, (tok, pid) in enumerate(zip(g["ws_tokens"].to_numpy(), packs)):
            if i > 0 and running + tok > budget:
                p, running = p + 1, 0
            assert pid == p
            running += tok
        sums = g.groupby("pack_id")["ws_tokens"].agg(["sum", "size"])
        over = sums[sums["sum"] > budget]
        assert (over["size"] == 1).all()  # only lone oversized docs overflow


def test_sample_topk_hash_matches_global_rank(ray_session):
    """The per-block partial top-k + driver merge equals the global
    smallest-hash k-set regardless of block layout."""
    import ray.data as rd
    from gocrawler_ray.functions.urls import md5_hash64_many
    from gocrawler_ray.stages.sampling import sample_topk_hash

    ids = np.arange(5000, dtype=np.int64)
    u = md5_hash64_many([f"topk:9:{i}" for i in ids])
    expect = sorted(ids[np.lexsort((ids, u))[:64]].tolist())
    for nblocks in (1, 7):
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(nblocks)
        got = sample_topk_hash(ds, k=64, id_col="doc_id", seed=9)
        assert got.column("doc_id").to_pylist() == expect


def test_interleave_positions_match_slot_grid(ray_session):
    """interleave_positions vs an independent slot-grid simulation:
    walk cycles, hand each source w slots per cycle in ascending source
    order, assign that source's next docs (by id) to those slots."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from gocrawler_ray.stages.packing import interleave_positions

    rng = np.random.default_rng(11)
    sources = ["srcA", "srcB", "srcC", "srcD"]
    weights = {"srcA": 3, "srcB": 1, "srcC": 2, "srcD": 1}
    ids, srcs = [], []
    next_id = 0
    for s in sources:
        for _ in range(int(rng.integers(5, 40))):
            ids.append(next_id)
            srcs.append(s)
            next_id += 1
    perm = rng.permutation(len(ids))
    t = pa.table({
        "doc_id": pa.array(np.array(ids)[perm], pa.int64()),
        "source": pa.array(np.array(srcs, dtype=object)[perm], pa.string()),
    })

    cyc = sum(weights.values())
    off, acc = {}, 0
    for s in sorted(sources):
        off[s] = acc
        acc += weights[s]
    wmap_ref = ray.put({s: (weights[s], off[s], cyc) for s in sources})
    got = (
        interleave_positions(
            rd.from_arrow(t), "source", "doc_id", wmap_ref, num_buckets=3
        )
        .to_pandas()
        .set_index("doc_id")["mix_pos"]
        .to_dict()
    )

    # independent simulation: deal slots cycle by cycle
    per_src = {
        s: sorted(i for i, x in zip(ids, srcs) if x == s) for s in sources
    }
    taken = {s: 0 for s in sources}
    expected = {}
    slot = 0
    while any(taken[s] < len(per_src[s]) for s in sources):
        for s in sorted(sources):
            for _ in range(weights[s]):
                if taken[s] < len(per_src[s]):
                    expected[per_src[s][taken[s]]] = slot
                    taken[s] += 1
                slot += 1  # exhausted sources leave gaps in the grid

    assert got == expected
