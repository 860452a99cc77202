"""Unit/property tests for stages/aggregates.py (top-k per group, exact
count-distinct, document frequency, HLL sketch, grouped quantiles) —
each against an independent pandas/numpy oracle on multi-block inputs
so the shuffle paths actually execute."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from gocrawler_ray.stages.aggregates import (
    count_distinct,
    doc_frequency,
    group_quantiles,
    group_topk,
    hll_estimate,
    hll_registers,
)


def _events_df(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "key": rng.integers(0, 40, n),
            "val": np.round(rng.normal(100, 25, n), 2),
            "id": np.arange(n, dtype=np.int64),
            "user": rng.integers(0, 300, n),
        }
    )


def _ds_of(df, blocks=7):
    return rd.from_pandas(df).repartition(blocks)


def test_group_topk_matches_pandas_with_ties():
    df = _events_df()
    # force ties so the tiebreak path is exercised
    df.loc[df.index % 11 == 0, "val"] = 50.0
    got = (
        group_topk(_ds_of(df), "key", "val", k=3, tiebreak_col="id")
        .to_pandas()
        .sort_values(["key", "rank"])
        .reset_index(drop=True)
    )
    exp = df.copy()
    exp["rank"] = (
        exp.sort_values(["val", "id"], ascending=[False, True])
        .groupby("key")
        .cumcount()
        + 1
    )
    exp = (
        exp[exp["rank"] <= 3]
        .sort_values(["key", "rank"])
        .reset_index(drop=True)[["key", "val", "id", "user", "rank"]]
    )
    pd.testing.assert_frame_equal(
        got[["key", "val", "id", "user", "rank"]], exp, check_dtype=False
    )


def test_group_topk_k_larger_than_group():
    df = pd.DataFrame({"key": [1, 1, 2], "val": [3.0, 1.0, 9.0],
                       "id": [0, 1, 2]})
    got = group_topk(_ds_of(df, blocks=2), "key", "val", k=5,
                     tiebreak_col="id").to_pandas()
    assert len(got) == 3
    assert set(got["rank"]) <= {1, 2}


def test_count_distinct_exact():
    df = _events_df()
    got = (
        count_distinct(_ds_of(df), "key", "user")
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("key")["user"]
        .nunique()
        .reset_index(name="n_distinct")
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert (got["key"].to_numpy() == exp["key"].to_numpy()).all()
    assert (got["n_distinct"].to_numpy() == exp["n_distinct"].to_numpy()).all()


def test_doc_frequency_counts_docs_not_occurrences():
    docs = pd.DataFrame(
        {
            "text": [
                "alpha alpha alpha beta",   # alpha counts once here
                "Alpha gamma",              # lowercased
                "beta beta",
                "",                         # empty doc contributes nothing
            ]
        }
    )
    got = (
        doc_frequency(_ds_of(docs, blocks=3), col="text", min_df=1)
        .to_pandas()
        .set_index("term")
    )
    assert got.loc["alpha", "df"] == 2
    assert got.loc["beta", "df"] == 2
    assert got.loc["gamma", "df"] == 1
    n = 4
    assert got.loc["gamma", "idf"] == pytest.approx(
        round(np.log((1 + n) / (1 + 1)) + 1, 6)
    )


def test_hll_registers_merge_and_estimate():
    n_unique = 20000
    df = pd.DataFrame({"v": np.arange(n_unique, dtype=np.int64) % n_unique})
    regs = hll_registers(_ds_of(df, blocks=9), "v", p=10).to_pandas()
    # registers must be a function of the DISTINCT value set: duplicating
    # every row cannot change them
    regs2 = hll_registers(
        _ds_of(pd.concat([df, df], ignore_index=True), blocks=4), "v", p=10
    ).to_pandas()
    a = regs.sort_values("bucket").reset_index(drop=True)
    b = regs2.sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    est = hll_estimate(pa.Table.from_pandas(regs), p=10)
    # standard error ~1.04/sqrt(1024) = 3.3%; allow 3 sigma
    assert abs(est - n_unique) / n_unique < 0.10


def test_pivot_counts_partials_sum_to_crosstab():
    from gocrawler_ray.stages.aggregates import pivot_counts

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "u": rng.integers(0, 30, size=5000),
        "t": rng.choice(["a", "b", "c", "zz"], size=5000),  # zz unlisted
    })
    parts = pivot_counts(_ds_of(df, blocks=6), "u", "t", ["a", "b", "c"]).to_pandas()
    got = parts.groupby("u", as_index=False).sum().sort_values("u")
    ct = pd.crosstab(df["u"], df["t"])
    for c in ("a", "b", "c"):
        assert (got[f"n_{c}"].to_numpy() == ct[c].to_numpy()).all()
    # unlisted category counts only toward the total
    assert (got["n_total"].to_numpy() == ct.sum(axis=1).to_numpy()).all()

    # distributed fallback merge (the unbounded-key-domain plan):
    # groupby-sum over the wide partials + sum(col) -> col rename
    n_cols = ["n_a", "n_b", "n_c", "n_total"]
    agg = (
        pivot_counts(_ds_of(df, blocks=6), "u", "t", ["a", "b", "c"])
        .groupby("u").sum(n_cols)
        .map_batches(
            lambda t: t.rename_columns(
                [c[4:-1] if c.startswith("sum(") else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        agg[["u"] + n_cols], got[["u"] + n_cols].reset_index(drop=True),
        check_dtype=False,
    )


def test_robust_scale_degenerate_and_values():
    from gocrawler_ray.stages.aggregates import robust_scale

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 3,
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 7.0, 7.0, 7.0],  # b: IQR = 0
    })
    out = (
        robust_scale(_ds_of(df, blocks=2), "k", "v")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    # a: median 3, IQR (q75-q25) = 4-2 = 2
    a = out[out["k"] == "a"]["value_scaled"].to_numpy()
    assert a.tolist() == [-1.0, -0.5, 0.0, 0.5, 1.0]
    assert (out[out["k"] == "b"]["value_scaled"] == 0.0).all()


@pytest.mark.parametrize("combine_cap", [500_000, None])  # driver / distributed
def test_grouped_mode_matches_pandas_with_tiebreak(combine_cap):
    from gocrawler_ray.stages.aggregates import grouped_mode

    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "key": rng.integers(0, 40, size=6000),
        "val": rng.choice(list("abcde"), size=6000),
    })
    # force a tie on one key: equal counts for 'a' and 'b' → 'a' wins
    df = pd.concat(
        [df[df["key"] != 0],
         pd.DataFrame({"key": [0] * 6, "val": ["b", "a", "b", "a", "c", "z"]})],
        ignore_index=True,
    )
    res = grouped_mode(_ds_of(df, blocks=5), "key", "val",
                       combine_cap=combine_cap)
    got = (
        res.to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    counts = df.groupby(["key", "val"]).size().reset_index(name="n")
    expect = counts.sort_values(
        ["key", "n", "val"], ascending=[True, False, True]
    ).drop_duplicates("key").sort_values("key").reset_index(drop=True)
    assert (got["key"].to_numpy() == expect["key"].to_numpy()).all()
    assert (got["val"].to_numpy() == expect["val"].to_numpy()).all()
    assert (got["mode_n"].to_numpy() == expect["n"].to_numpy()).all()
    assert got.loc[got["key"] == 0, "val"].item() == "a"


def test_cms_never_undercounts_and_block_invariant():
    from gocrawler_ray.stages.aggregates import cms_counts, cms_estimate_many

    rng = np.random.default_rng(3)
    keys = rng.zipf(1.5, size=20000) % 500  # skewed frequencies
    df = pd.DataFrame({"k": keys.astype(np.int64)})
    sketch = cms_counts(_ds_of(df, blocks=7), "k")
    # merge-by-sum: the sketch is block-layout-invariant
    sketch2 = cms_counts(_ds_of(df, blocks=2), "k")
    assert (sketch == sketch2).all()
    # total mass per row is exactly the row count
    assert (sketch.sum(axis=1) == len(df)).all()
    uniq, true = np.unique(df["k"].to_numpy(), return_counts=True)
    est = cms_estimate_many(sketch, uniq.tolist())
    assert (est >= true).all()  # CMS never undercounts
    # overcount bounded: mean error well under e*N/width per query
    assert (est - true).mean() < 2.72 * len(df) / 1024
    # heavy hitters surface: the true top key is the estimated top key
    assert uniq[np.argmax(est)] == uniq[np.argmax(true)]


def test_windowed_hll_registers_per_window_and_invariance():
    from gocrawler_ray.stages.aggregates import (
        hll_estimate, hll_registers, windowed_hll_registers,
    )

    rng = np.random.default_rng(12)
    n = 8000
    base = pd.Timestamp("2024-05-01").value // 1000  # µs
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            base + rng.integers(0, 4 * 3600, size=n) * 1_000_000, unit="us"
        ),
        "v": rng.integers(0, 900, size=n),
    })
    regs = windowed_hll_registers(_ds_of(df, blocks=6), "ts", "v", p=6).to_pandas()
    assert set(regs["hour"].unique()) == set(
        (df["ts"].astype("datetime64[us]").astype(np.int64) // 3_600_000_000).unique()
    )
    # the distributed groupby-max fallback returns identical registers
    dist = windowed_hll_registers(
        _ds_of(df, blocks=6), "ts", "v", p=6, combine_cap=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        regs.sort_values(["hour", "bucket"]).reset_index(drop=True),
        dist.sort_values(["hour", "bucket"]).reset_index(drop=True),
        check_dtype=False,
    )
    # each window's registers equal an independent single-window HLL
    # over exactly that window's values (merge-by-max correctness)
    hours = sorted(regs["hour"].unique())
    for hr in hours[:2]:
        in_win = df[
            df["ts"].astype("datetime64[us]").astype(np.int64) // 3_600_000_000 == hr
        ]
        solo = hll_registers(_ds_of(in_win, blocks=2), "v", p=6).to_pandas()
        win = regs[regs["hour"] == hr][["bucket", "rho"]].sort_values(
            "bucket"
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            win, solo.sort_values("bucket").reset_index(drop=True),
            check_dtype=False,
        )
        est = hll_estimate(
            pa.Table.from_pandas(win, preserve_index=False), p=6
        )
        true = in_win["v"].nunique()
        assert abs(est - true) / true < 0.45  # p=6 → se ~13%, 3σ slack


def test_group_quantiles_matches_numpy():
    df = _events_df()
    got = (
        group_quantiles(_ds_of(df), "key", "val", qs=(0.5, 0.95))
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        vals = df.loc[df["key"] == row["key"], "val"].to_numpy()
        assert row["n"] == len(vals)
        assert row["q50"] == pytest.approx(
            round(float(np.quantile(vals, 0.5)), 6), abs=1e-6
        )
        assert row["q95"] == pytest.approx(
            round(float(np.quantile(vals, 0.95)), 6), abs=1e-6
        )


def test_group_topk_hot_key():
    """Adversarial skew: one key owns 60% of all rows across many
    blocks — the per-block partial must bound the shuffle and the
    result must still be exact."""
    rng = np.random.default_rng(3)
    n = 20000
    key = np.where(rng.random(n) < 0.6, 0, rng.integers(1, 50, n))
    df = pd.DataFrame({"key": key, "val": rng.random(n), "id": np.arange(n)})
    got = (
        group_topk(_ds_of(df, blocks=16), "key", "val", k=2, tiebreak_col="id")
        .to_pandas()
        .sort_values(["key", "rank"])
        .reset_index(drop=True)
    )
    exp = df.copy()
    exp["rank"] = (
        exp.sort_values(["val", "id"], ascending=[False, True])
        .groupby("key")
        .cumcount()
        + 1
    )
    exp = (
        exp[exp["rank"] <= 2]
        .sort_values(["key", "rank"])
        .reset_index(drop=True)[["key", "val", "id", "rank"]]
    )
    pd.testing.assert_frame_equal(
        got[["key", "val", "id", "rank"]], exp, check_dtype=False
    )


def test_tfidf_topk_broadcast_scoring():
    from gocrawler_ray.stages.aggregates import tfidf_topk

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "cat cat cat dog",     # tf(cat)=3 dominates
                "dog bird",
                "",                     # no tokens -> no rows
            ],
        }
    )
    idf = doc_frequency(_ds_of(docs, blocks=2), col="text", min_df=1)
    idf_tbl = pa.Table.from_pandas(idf.to_pandas())
    got = (
        tfidf_topk(_ds_of(docs, blocks=2), idf_tbl, k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [1, 1, 2, 2]
    assert got.loc[0, "term"] == "cat"  # highest score in doc 1
    n = 3
    idf_cat = round(np.log((1 + n) / (1 + 1)) + 1, 6)
    assert got.loc[0, "score"] == pytest.approx(round(3 * idf_cat, 6))
    # doc 2: dog (df=2) vs bird (df=1), both tf=1 -> bird scores higher
    assert got.loc[2, "term"] == "bird"


def test_sparse_pivot_setops_distributed_fallback(ray_session, monkeypatch):
    """When _combine_partials returns None (user domain over the cap),
    the set-op queries must take the distributed groupby-sum path and
    produce the same user sets — not crash on None (round-2 advice)."""
    import numpy as np

    from gocrawler_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    want_cb = q.q_clickers_buyers(sf).column("user_id").to_pylist()
    want_vn = q.q_viewers_no_purchase(sf).column("user_id").to_pylist()

    monkeypatch.setattr(q, "_combine_partials", lambda *a, **k: None)
    got_cb = q.q_clickers_buyers(sf).to_pandas()["user_id"].tolist()
    got_vn = q.q_viewers_no_purchase(sf).to_pandas()["user_id"].tolist()
    assert got_cb == want_cb
    assert got_vn == want_vn
