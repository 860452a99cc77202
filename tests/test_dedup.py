"""Dedup suite: exact, MinHash+LSH, SimHash, Jaccard, embedding near-dup."""

import numpy as np
import pytest
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gocrawler_ray.stages.dedup import (
    embedding_near_dup,
    exact_dedup,
    hamming64,
    jaccard,
    minhash_lsh_dedup,
    minhash_signatures,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)


def _docs():
    rows = []
    for i in range(30):
        rows.append({"doc_id": f"d{i:03d}", "text": f"unique document {i} about topic {i*7} " * 3})
    # exact dup pair
    rows.append({"doc_id": "d900", "text": rows[0]["text"]})
    # near-dup pair (small edit)
    rows.append({"doc_id": "d901", "text": BASE})
    rows.append({"doc_id": "d902", "text": BASE.replace("lazy", "sleepy")})
    return rows


def test_exact_dedup():
    ds = rd.from_items(_docs())
    out = exact_dedup(ds, "text").to_pandas()
    assert len(out) == len(_docs()) - 1
    assert "d900" not in set(out["doc_id"])  # d000 (min id) wins
    assert "d000" in set(out["doc_id"])


def test_exact_dedup_empty_input():
    ds = rd.from_items(_docs()).filter(lambda r: False)
    assert exact_dedup(ds, "text").count() == 0


def test_exact_dedup_join_fallback_matches_broadcast():
    # broadcast_limit=0 forces the keeper set over the limit → the
    # hash-join scale path; results must be identical
    ds = rd.from_items(_docs())
    fast = exact_dedup(ds, "text").to_pandas()
    slow = exact_dedup(ds, "text", broadcast_limit=0).to_pandas()
    assert sorted(fast["doc_id"]) == sorted(slow["doc_id"])
    assert sorted(fast.columns) == sorted(slow.columns)


def test_minhash_similarity_tracks_jaccard():
    texts = pd.Series([BASE, BASE.replace("lazy", "sleepy"), "totally different words here now"])
    sig = minhash_signatures(texts, num_perm=128, k=3)
    est_near = (sig[0] == sig[1]).mean()
    est_far = (sig[0] == sig[2]).mean()
    true_near = jaccard(texts[0], texts[1], 3)
    assert abs(est_near - true_near) < 0.2
    assert est_far < 0.1 < est_near


def test_minhash_lsh_dedup_finds_near_dups():
    ds = rd.from_items(_docs())
    deduped, edges = minhash_lsh_dedup(ds, threshold=0.5, num_perm=64, bands=16)
    pairs = {(a, b) for a, b in edges}
    assert ("d901", "d902") in pairs
    assert ("d000", "d900") in pairs  # exact dups are near-dups too
    kept = set(deduped.to_pandas()["doc_id"])
    assert "d901" in kept and "d902" not in kept
    assert "d000" in kept and "d900" not in kept
    # unique docs untouched
    assert all(f"d{i:03d}" in kept for i in range(1, 30))


def test_minhash_lsh_degenerate_bucket_bounded():
    # adversarial: thousands of IDENTICAL boilerplate docs share every
    # band bucket. Uncapped all-pairs would be O(n²) (≈12.5M pairs at
    # 5000 docs); the bucket cap must degrade to O(m) star edges and
    # still dedup the whole cluster to one survivor.
    n = 5000
    rows = [{"doc_id": f"b{i:05d}", "text": "cookie banner accept all terms"} for i in range(n)]
    rows += [{"doc_id": f"u{i}", "text": f"unique doc {i} topic {i*13} words " * 2} for i in range(20)]
    ds = rd.from_items(rows)
    deduped, edges = minhash_lsh_dedup(ds, threshold=0.8, num_perm=64, bands=16, bucket_cap=64)
    assert len(edges) < 20 * n  # star edges, not C(n,2)
    kept = set(deduped.to_pandas()["doc_id"])
    assert kept.issuperset({f"u{i}" for i in range(20)})
    assert len([k for k in kept if k.startswith("b")]) == 1  # one survivor
    assert "b00000" in kept  # the min id


def test_components_minlabel_matches_union_find():
    from gocrawler_ray.stages.dedup import _components_driver, components_minlabel

    # a chain (tests multi-round propagation), a star, and a separate pair
    edges = [("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c5"),
             ("s0", "s1"), ("s0", "s2"), ("s0", "s3"), ("p8", "p9")]
    labels = components_minlabel(
        rd.from_items([{"a": a, "b": b} for a, b in edges]), num_partitions=2
    ).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert {n for n, l in got.items() if n != l} == _components_driver(edges)
    assert all(got[n] == "c1" for n in ["c1", "c2", "c3", "c4", "c5"])
    assert all(got[n] == "p8" for n in ["p8", "p9"])


def test_simhash_hamming():
    texts = pd.Series([BASE, BASE.replace("lazy", "sleepy"), "unrelated content entirely different"])
    h = simhash64(texts)
    d_near = hamming64(h[:1], h[1:2])[0]
    d_far = hamming64(h[:1], h[2:3])[0]
    assert d_near < d_far
    assert d_near <= 16
    # deterministic across calls
    assert np.array_equal(simhash64(texts), h)


@pytest.mark.parametrize("radius2", [24, 26])
def test_simhash_shingle_prefilter_keeps_every_verified_pair(radius2):
    """The shingle-radius second prefilter is an optimization ONLY: the
    coarse-band simhash output with it must EQUAL the output without it
    (the exact-Jaccard verify decides membership either way). Corpus
    mixes template-correlated docs (shared vocabulary, disjoint
    shingles — the pairs the prefilter exists to kill) with true
    near-dup pairs at varying edit distance. 26 is the production
    radius (q_simhash_pairs); 24 exercises the tighter setting."""
    from gocrawler_ray.stages.dedup import simhash64_shingles, simhash_near_dup

    rng = np.random.RandomState(7)
    vocab = [f"tok{j}" for j in range(40)]
    rows = []
    # template family: same 40-word vocabulary, shuffled order each time
    for i in range(60):
        ws = list(vocab)
        rng.shuffle(ws)
        rows.append({"doc_id": f"t{i:03d}", "text": " ".join(ws)})
    # true near-dups: single-word edits of a fixed sentence
    for i in range(8):
        ws = BASE.split()
        ws[3 + i] = f"edit{i}"
        rows.append({"doc_id": f"n{i:03d}", "text": " ".join(ws)})
    rows.append({"doc_id": "n900", "text": BASE})
    ds = rd.from_items(rows)

    kw = dict(col="text", id_col="doc_id", band_bits=4, threshold=0.6,
              bucket_cap=1 << 20, hamming_radius=16)
    base_pairs = simhash_near_dup(ds, **kw)
    filt_pairs = simhash_near_dup(ds, **kw, shingle_radius=radius2)
    assert filt_pairs == base_pairs
    assert len(filt_pairs) >= 8  # the near-dup family is found

    # kernel invariants: identical text → identical fingerprint;
    # deterministic across calls
    texts = pd.Series([BASE, BASE, "something else entirely here now"])
    h2 = simhash64_shingles(texts)
    assert h2[0] == h2[1]
    assert np.array_equal(simhash64_shingles(texts), h2)


def test_simhash_margin_assert_debug_mode(monkeypatch):
    """GRAFT_SIMHASH_MARGIN_ASSERT (round-4 verdict #5): the shingle
    prefilter's probabilistic radius must keep ≥6 bits of margin over the
    worst verified pair — passes at the production radius, and a radius
    deliberately shaved to the observed maximum fails LOUDLY instead of
    letting a re-seeded corpus flake the exact-equality gate."""
    from gocrawler_ray.stages.dedup import (
        hamming64,
        simhash64_shingles,
        simhash_near_dup,
    )

    rows = []
    for i in range(8):
        ws = BASE.split()
        ws[3 + i] = f"edit{i}"
        rows.append({"doc_id": f"n{i:03d}", "text": " ".join(ws)})
    rows.append({"doc_id": "n900", "text": BASE})
    ds = rd.from_items(rows)
    kw = dict(col="text", id_col="doc_id", band_bits=4, threshold=0.6,
              bucket_cap=1 << 20, hamming_radius=16)

    monkeypatch.setenv("GRAFT_SIMHASH_MARGIN_ASSERT", "1")
    pairs = simhash_near_dup(ds, **kw, shingle_radius=26)  # healthy margin
    assert len(pairs) >= 8

    # worst observed true-pair shingle hamming on this corpus
    h2 = dict(zip([r["doc_id"] for r in rows],
                  simhash64_shingles(pd.Series([r["text"] for r in rows]))))
    worst = max(
        int(hamming64(np.array([h2[a]], np.uint64), np.array([h2[b]], np.uint64))[0])
        for a, b in pairs
    )
    with pytest.raises(AssertionError, match="margin exhausted"):
        simhash_near_dup(ds, **kw, shingle_radius=worst + 2)


def test_embedding_near_dup():
    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((40, 16))
    vecs[7] = vecs[3] + rng.standard_normal(16) * 0.01  # near-dup of 3
    vecs[21] = vecs[21] / np.linalg.norm(vecs[21])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(40)]
    pairs = embedding_near_dup(rd.from_items(rows), threshold=0.99)
    assert (3, 7) in pairs
    assert all(a != b for a, b in pairs)


def test_embedding_near_dup_degenerate_bucket_is_linear(ray_session):
    """A bucket of IDENTICAL vectors (hyperplanes cannot split it) past
    bucket_cap must degrade to O(m) star pairs around the min id —
    connectivity preserved, no C(m,2) blowup (round-2 verdict)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gocrawler_ray.stages.dedup import embedding_near_dup

    m = 300
    vec = np.ones(8)
    t = pa.table({
        "vec_id": pa.array(np.arange(m), pa.int64()),
        "embedding": pa.array([vec.tolist()] * m),
    })
    pairs = embedding_near_dup(
        rd.from_arrow(t), threshold=0.99, bucket_cap=50
    )
    # star: exactly m-1 pairs, all anchored at the min id
    assert len(pairs) == m - 1
    assert all(a == 0 for a, b in pairs)
    assert sorted(b for _, b in pairs) == list(range(1, m))
    # connectivity: one component over all m nodes
    # (min-id star spans the cluster by construction)

    # under the cap the same input is complete C(m,2)
    small = embedding_near_dup(
        rd.from_arrow(t.slice(0, 20)), threshold=0.99, bucket_cap=50
    )
    assert len(small) == 20 * 19 // 2


def test_ngram_jaccard_join_matches_bruteforce():
    """Prefix filtering is EXACT: the join equals all-pairs Jaccard ≥ τ
    on a randomized corpus with planted near-dups, at several τ."""
    from gocrawler_ray.stages.dedup import ngram_jaccard_join

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(40):
        words = list(rng.choice(vocab, size=rng.integers(4, 25)))
        rows.append({"doc_id": f"d{i:03d}", "text": " ".join(words)})
    # planted: exact dup, one-token edit, empty and tiny docs
    rows.append({"doc_id": "e1", "text": rows[0]["text"]})
    rows.append({"doc_id": "e2", "text": rows[1]["text"] + " tail"})
    rows.append({"doc_id": "e3", "text": ""})
    rows.append({"doc_id": "e4", "text": ""})
    rows.append({"doc_id": "e5", "text": "solo"})
    texts = {r["doc_id"]: r["text"] for r in rows}

    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    for tau in (0.4, 0.6, 0.8):
        got = ngram_jaccard_join(ds, threshold=tau, k=3)
        got_pairs = set(zip(got["a"], got["b"]))
        ids = sorted(texts)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if jaccard(texts[a], texts[b], 3) >= tau
        }
        assert got_pairs == want, f"tau={tau}"
        for a, b, j in zip(got["a"], got["b"], got["j"]):
            assert abs(j - jaccard(texts[a], texts[b], 3)) < 1e-12


def test_ngram_jaccard_join_bucket_cap_star_degrades():
    """A degenerate corpus (every doc identical) exceeds bucket_cap and
    degrades to O(m) star pairs instead of C(m,2)."""
    from gocrawler_ray.stages.dedup import ngram_jaccard_join

    rows = [{"doc_id": f"d{i:02d}", "text": "same text for all documents here"}
            for i in range(20)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = ngram_jaccard_join(ds, threshold=0.9, bucket_cap=4)
    pairs = set(zip(got["a"], got["b"]))
    # star around the min id: m-1 pairs, all touching d00
    assert len(pairs) == 19
    assert all(a == "d00" for a, _ in pairs)


def test_ngram_jaccard_join_freq_order_exact_on_skewed_corpus():
    """Boilerplate-heavy corpus: every doc shares a long footer (hot
    shingles), uniqueness lives in a short head. freq_order=True must
    find the hot set, reorder prefixes, and STILL equal brute force."""
    from gocrawler_ray.stages.dedup import _sample_hot_shingles, ngram_jaccard_join

    footer = " ".join(f"boiler plate footer token{i % 5}" for i in range(12))
    rows = []
    for i in range(32):
        rows.append({"doc_id": f"d{i:03d}", "text": f"unique head {i} alpha {i*3} " + footer})
    rows.append({"doc_id": "e1", "text": rows[0]["text"]})  # exact dup
    texts = {r["doc_id"]: r["text"] for r in rows}
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(2)

    hot = _sample_hot_shingles(ds, "text", 3, mod=1, hot_min=4)
    assert hot.size > 0  # the footer shingles ARE detected as hot

    for fo in (True, False):
        got = ngram_jaccard_join(ds, threshold=0.5, k=3, freq_order=fo)
        got_pairs = set(zip(got["a"], got["b"]))
        ids = sorted(texts)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if jaccard(texts[a], texts[b], 3) >= 0.5
        }
        assert got_pairs == want, f"freq_order={fo}"


@pytest.mark.parametrize("with_h", [False, True])
def test_bucket_pairs_driver_path_matches_distributed_scan(with_h):
    """The capped driver gather in _bucket_pairs must emit exactly the
    fully-distributed Dataset plane's candidate set (driver_cap=None
    forces the Ray sort + spill groupby + pair-dedup shuffle), with and
    without the hamming prefilter column."""
    from gocrawler_ray.stages.dedup import _bucket_pairs

    rng = np.random.RandomState(11)
    n = 4000
    keys = rng.randint(0, 1500, n).astype(np.uint64)  # many multi-member
    docs = np.array([f"d{i % 700:04d}" for i in rng.randint(0, 10**6, n)])
    cols = {"band_key": keys, "doc_id": docs}
    if with_h:
        cols["h"] = rng.randint(0, 2**63, n).astype(np.uint64)
    ds = rd.from_pandas(pd.DataFrame(cols))
    kw = dict(bucket_cap=64, hamming_radius=40 if with_h else None)
    fast = _bucket_pairs(ds, **kw)
    slow = _bucket_pairs(ds, **kw, driver_cap=None)
    assert isinstance(fast, pd.DataFrame)
    assert isinstance(slow, rd.Dataset)  # past the cap: Dataset plane

    def canon(df):
        if isinstance(df, rd.Dataset):
            df = df.to_pandas()
        return (df.groupby(["a", "b"], as_index=False)
                .agg(capped=("capped", "max"))
                .sort_values(["a", "b"]).reset_index(drop=True)
                .astype({"capped": np.int64}))

    pd.testing.assert_frame_equal(canon(fast), canon(slow))


def test_minhash_distributed_pair_plane_matches_driver_path():
    """pair_driver_cap=None forces the Dataset pair plane + the
    co-partitioned distributed verify; edges AND survivors must equal
    the driver fast path exactly (same pattern as
    test_star_join_fallbacks_match_broadcast_path)."""
    ds = rd.from_items(_docs())
    kw = dict(threshold=0.5, num_perm=64, bands=16)
    deduped_f, edges_f = minhash_lsh_dedup(ds, **kw)
    deduped_s, edges_s = minhash_lsh_dedup(ds, **kw, pair_driver_cap=None)
    assert sorted(edges_f) == sorted(edges_s)
    assert sorted(deduped_f.to_pandas()["doc_id"]) == sorted(
        deduped_s.to_pandas()["doc_id"]
    )


def test_ngram_jaccard_distributed_plane_matches_driver_path():
    from gocrawler_ray.stages.dedup import ngram_jaccard_join

    texts = {}
    for i in range(25):
        texts[f"d{i:03d}"] = f"unique document {i} about topic {i*7} " * 3
    texts["d900"] = BASE
    texts["d901"] = BASE.replace("lazy", "sleepy")
    texts["d902"] = BASE.replace("quick", "swift").replace("dog", "hound")
    ds = rd.from_items(
        [{"doc_id": d, "text": t} for d, t in sorted(texts.items())]
    )
    fast = ngram_jaccard_join(ds, threshold=0.5, k=3)
    slow = ngram_jaccard_join(ds, threshold=0.5, k=3, pair_driver_cap=None)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True)
    )
    assert len(fast) >= 3  # the BASE cluster verifies


def test_simhash_fine_band_distributed_plane_matches_driver_path():
    from gocrawler_ray.stages.dedup import simhash_near_dup

    rows = _docs()
    ds = rd.from_items(rows)
    kw = dict(threshold=0.5, band_bits=8, bucket_cap=256)
    fast = simhash_near_dup(ds, **kw)
    slow = simhash_near_dup(ds, **kw, pair_driver_cap=None)
    assert fast == slow
    assert ("d901", "d902") in slow


def test_simhash_coarse_band_distributed_verify_matches_driver_path():
    """pair_driver_cap=None in the coarse-band (hamming-radius) regime
    forces the Dataset-plane verify (_verify_pairs_ds) instead of the
    driver gather + CSR broadcast; the pair set must be identical."""
    from gocrawler_ray.stages.dedup import simhash_near_dup

    ds = rd.from_items(_docs())
    kw = dict(threshold=0.5, band_bits=4, bucket_cap=1 << 20,
              hamming_radius=16)
    fast = simhash_near_dup(ds, **kw)
    slow = simhash_near_dup(ds, **kw, pair_driver_cap=None)
    assert fast == slow
    assert ("d901", "d902") in slow


def test_verify_pairs_ds_semi_join_path_matches_broadcast():
    """id_broadcast_cap=0 forces the corpus left_semi restriction (the
    last-resort plan when even the candidate-id set outgrows a
    broadcast); the verified pair set must be identical."""
    from gocrawler_ray.stages.dedup import _verify_pairs_ds

    docs = _docs()
    ds = rd.from_items(docs)
    pairs = []
    ids = sorted(d["doc_id"] for d in docs)
    for i in range(0, len(ids) - 1, 2):
        pairs.append({"a": ids[i], "b": ids[i + 1]})
    pairs.append({"a": "d901", "b": "d902"})
    pairs.append({"a": "d000", "b": "d900"})
    pds = rd.from_items(pairs)
    fast = _verify_pairs_ds(ds, pds, "text", 3, 0.5).to_pandas()
    slow = _verify_pairs_ds(
        ds, pds, "text", 3, 0.5, id_broadcast_cap=0
    ).to_pandas()
    assert sorted(zip(fast["a"], fast["b"])) == sorted(
        zip(slow["a"], slow["b"])
    )
    assert ("d901", "d902") in set(zip(fast["a"], fast["b"]))
    # j values equal the scalar verifier
    withj = _verify_pairs_ds(
        ds, pds, "text", 3, 0.5, with_value=True
    ).to_pandas()
    texts = {d["doc_id"]: d["text"] for d in docs}
    for _, r in withj.iterrows():
        assert abs(r["j"] - jaccard(texts[r["a"]], texts[r["b"]], 3)) < 1e-12


def test_emit_pairs_grouped_parallel_plane_matches_serial(ray_session):
    """The fanned-out coarse-band pair emission must produce exactly the
    serial loop's candidate set (forced by dropping the work threshold
    to zero)."""
    import numpy as np
    import pandas as pd

    from gocrawler_ray.stages.dedup import _emit_pairs_grouped, simhash64

    rng = np.random.default_rng(11)
    texts = pd.Series(
        [" ".join(rng.choice(["a", "b", "c", "d", "e", "f"], size=20))
         for _ in range(400)]
    )
    h = simhash64(texts)
    band_bits, n_bands = 4, 16
    mask = np.uint64(15)
    m = len(h)
    bh = np.concatenate(
        [((h >> np.uint64(b * band_bits)) & mask)
         | (np.uint64(b) << np.uint64(band_bits)) for b in range(n_bands)]
    )
    docs = np.tile(np.array([f"d{i}" for i in range(m)], dtype=object),
                   n_bands)
    hs = np.tile(h, n_bands)
    order = np.argsort(bh, kind="stable")
    bh, docs, hs = bh[order], docs[order], hs[order]
    change = np.empty(len(bh), dtype=bool)
    change[0] = True
    change[1:] = bh[1:] != bh[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(bh))
    args = (docs, hs, None, bh, starts, ends, 1 << 20, 16, band_bits,
            None)
    ser = _emit_pairs_grouped(*args, parallel_threshold=float("inf"))
    par = _emit_pairs_grouped(*args, parallel_threshold=0.0)
    key = ["a", "b", "capped"]
    pd.testing.assert_frame_equal(
        ser.sort_values(key).reset_index(drop=True)[key],
        par.sort_values(key).reset_index(drop=True)[key],
    )


def _overlap_brute(a: str, b: str, k: int = 3) -> float:
    import re

    def sh(t):
        ws = re.findall(r"\w+", (t or "").lower())
        return set(" ".join(ws[i:i + k])
                   for i in range(max(1, len(ws) - k + 1)))

    A, B = sh(a), sh(b)
    return len(A & B) / min(len(A), len(B))


def _containment_corpus():
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(40):
        words = list(rng.choice(vocab, size=rng.integers(6, 30)))
        rows.append({"doc_id": f"d{i:03d}", "text": " ".join(words)})
    # planted quotes: strict token-prefix subsets of bigger docs —
    # containment 1.0 but Jaccard well below any LSH threshold
    for i in (0, 1, 2):
        toks = rows[i]["text"].split()
        n = max(4, 2 * len(toks) // 5)
        rows.append({"doc_id": f"q{i}", "text": " ".join(toks[:n])})
    rows.append({"doc_id": "e3", "text": ""})
    rows.append({"doc_id": "e4", "text": ""})
    rows.append({"doc_id": "e5", "text": "solo"})
    return rows


def test_containment_join_matches_bruteforce():
    """Probe-prefix × full-index candidate generation is EXACT for the
    overlap coefficient: equals all-pairs C >= tau, including the
    planted low-Jaccard/high-containment quote pairs."""
    from gocrawler_ray.stages.dedup import containment_join

    rows = _containment_corpus()
    texts = {r["doc_id"]: r["text"] for r in rows}
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    for tau in (0.6, 0.8, 0.95):
        got = containment_join(ds, threshold=tau, k=3, freq_order=False)
        got_pairs = set(zip(got["a"], got["b"]))
        ids = sorted(texts)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if _overlap_brute(texts[a], texts[b], 3) >= tau
        }
        assert got_pairs == want, f"tau={tau}"
        for a, b, c in zip(got["a"], got["b"], got["c"]):
            assert abs(c - _overlap_brute(texts[a], texts[b], 3)) < 1e-12
        # the quote pairs must be present (they are what this join adds
        # over the Jaccard prefix filter)
        if tau <= 0.95:
            for i in (0, 1, 2):
                pair = tuple(sorted((f"d{i:03d}", f"q{i}")))
                assert pair in got_pairs


def test_containment_distributed_plane_matches_driver_path():
    from gocrawler_ray.stages.dedup import containment_join

    rows = _containment_corpus()
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    fast = containment_join(ds, threshold=0.8, k=3, freq_order=False)
    slow = containment_join(ds, threshold=0.8, k=3, freq_order=False,
                            pair_driver_cap=None)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True)
    )
    assert len(fast) >= 3


def test_containment_planes_agree_past_bucket_cap():
    """Post-r4 ADVICE: the two containment planes must agree when a
    bucket trips bucket_cap. One quote doc (the min id, so it anchors
    the star) is contained in 12 big docs with disjoint filler — every
    quote shingle's bucket holds 13 > cap docs, and most big docs do NOT
    carry a quote shingle in their probe prefix, so the probe×index join
    alone would miss their anchor pairs; the full-index star emission
    restores them and the planes produce identical verified output."""
    from gocrawler_ray.stages.dedup import containment_join

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [{"doc_id": "a00", "text": quote}]
    for i in range(12):
        filler = " ".join(f"w{i}x{j}" for j in range(40))
        rows.append({"doc_id": f"b{i:02d}", "text": filler + " " + quote})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    kw = dict(threshold=0.9, k=3, bucket_cap=4, freq_order=False)
    fast = containment_join(ds, **kw)
    slow = containment_join(ds, **kw, pair_driver_cap=None)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True)
    )
    # every big doc pairs with the quote anchor (C = 1.0) even though
    # the hot buckets star-degraded
    pairs = set(zip(fast["a"], fast["b"]))
    for i in range(12):
        assert ("a00", f"b{i:02d}") in pairs


def test_containment_join_bucket_cap_star_degrades():
    """Degenerate corpus: every doc identical → the index bucket blows
    past bucket_cap and degrades to the min-doc star, O(m) pairs."""
    from gocrawler_ray.stages.dedup import containment_join

    rows = [{"doc_id": f"d{i:02d}",
             "text": "same text for all documents here"}
            for i in range(20)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = containment_join(ds, threshold=0.9, bucket_cap=4,
                           freq_order=False)
    pairs = set(zip(got["a"], got["b"]))
    assert len(pairs) == 19
    assert all(a == "d00" for a, _ in pairs)


def test_containment_join_freq_order_exact_on_skewed_corpus():
    """Boilerplate-heavy corpus through the containment join: the hot
    ordering pushes footer shingles out of PROBE prefixes (they stay on
    the index side), and recall must remain exact either way."""
    from gocrawler_ray.stages.dedup import containment_join

    footer = " ".join(f"boiler plate footer token{i % 5}"
                      for i in range(12))
    rows = []
    for i in range(32):
        rows.append({"doc_id": f"d{i:03d}",
                     "text": f"unique head {i} alpha {i*3} " + footer})
    # a quote: head-only prefix of d000 (no footer) — low Jaccard vs
    # d000 but high containment
    toks = rows[0]["text"].split()
    rows.append({"doc_id": "q0", "text": " ".join(toks[:6])})
    rows.append({"doc_id": "e1", "text": rows[0]["text"]})
    texts = {r["doc_id"]: r["text"] for r in rows}
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(2)

    for fo in (True, False):
        got = containment_join(ds, threshold=0.7, k=3, freq_order=fo)
        got_pairs = set(zip(got["a"], got["b"]))
        ids = sorted(texts)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if _overlap_brute(texts[a], texts[b], 3) >= 0.7
        }
        assert got_pairs == want, f"freq_order={fo}"
        assert tuple(sorted(("d000", "q0"))) in got_pairs


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_containment_join_random_corpora_exact(seed):
    """Randomized corpora across seeds, including threshold edge 1.0
    (prefix collapses to a single shingle — recall must still be exact
    for true-duplicate and true-superset pairs)."""
    from gocrawler_ray.stages.dedup import containment_join

    rng = np.random.default_rng(seed)
    vocab = [f"v{i}" for i in range(25)]
    rows = []
    for i in range(30):
        words = list(rng.choice(vocab, size=rng.integers(4, 22)))
        rows.append({"doc_id": f"d{i:03d}", "text": " ".join(words)})
    rows.append({"doc_id": "x1", "text": rows[0]["text"]})  # exact dup
    toks = rows[1]["text"].split()
    rows.append({"doc_id": "x2", "text": " ".join(toks[:max(4, len(toks) // 2)])})
    texts = {r["doc_id"]: r["text"] for r in rows}
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    for tau in (0.5, 1.0):
        got = containment_join(ds, threshold=tau, k=3, freq_order=False)
        got_pairs = set(zip(got["a"], got["b"]))
        ids = sorted(texts)
        want = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if _overlap_brute(texts[a], texts[b], 3) >= tau
        }
        assert got_pairs == want, f"seed={seed} tau={tau}"
