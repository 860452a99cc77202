"""Temporal operators: session windows + backward as-of join
(stages/temporal.py) — edge semantics pinned against hand-computed
expectations: gap EXACTLY equal (no break), strictly greater (break),
timestamp ties, no-match left rows, and bucket-boundary independence
(every user's rows co-locate whole, so results are invariant in
num_buckets)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from gocrawler_ray.stages.temporal import asof_join, sessionize

TS = pd.Timestamp("2024-03-01 00:00:00")
M = pd.Timedelta(minutes=1)


def _sessions(df, gap_min, buckets=4):
    out = (
        sessionize(
            rd.from_pandas(df), gap_us=gap_min * 60 * 1_000_000,
            num_buckets=buckets,
        )
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    return list(
        out[["user_id", "session_start", "session_end", "n_events", "sum_value"]]
        .itertuples(index=False, name=None)
    )


def test_sessionize_gap_semantics():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            # deltas: exactly 30min (NO break: rule is strictly >), then
            # 30min+1µs (break)
            "ts": [TS, TS + 30 * M, TS + 30 * M + pd.Timedelta(minutes=30, microseconds=1), TS],
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    assert _sessions(df, 30) == [
        (1, TS, TS + 30 * M, 2, 3.0),
        (1, TS + pd.Timedelta(minutes=60, microseconds=1),
         TS + pd.Timedelta(minutes=60, microseconds=1), 1, 4.0),
        (2, TS, TS, 1, 8.0),
    ]


@pytest.mark.parametrize("buckets", [1, 3, 16])
def test_sessionize_bucket_invariance(buckets):
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": TS + pd.to_timedelta(rng.integers(0, 10**7, n), unit="s"),
            "value": rng.random(n),
        }
    )
    base = _sessions(df, 60, buckets=4)
    got = _sessions(df, 60, buckets=buckets)
    assert [(u, s, e, c) for u, s, e, c, _ in base] == [
        (u, s, e, c) for u, s, e, c, _ in got
    ]
    assert np.allclose(
        [v for *_, v in base], [v for *_, v in got], rtol=0, atol=1e-9
    )


@pytest.mark.parametrize("broadcast_limit", [2_000_000, 0])
def test_asof_join_ties_and_no_match(broadcast_limit):
    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "user_id": [1, 1, 3],
            "ts": [TS - M, TS, TS],
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": [1, 1],
            "o_orderdate": [TS, TS],  # tie: max o_orderkey must win
            "o_orderkey": [7, 9],
            "o_totalprice": [70.0, 90.0],
        }
    )
    out = (
        asof_join(
            rd.from_pandas(ev), rd.from_pandas(orders),
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate",
            right_cols=["o_orderkey", "o_totalprice"],
            right_tiebreak="o_orderkey", num_buckets=2,
            broadcast_limit=broadcast_limit,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["o_orderkey"].isna().tolist() == [True, False, True]
    assert out.loc[1, "o_orderkey"] == 9  # exact-ts match, tie → max key
    assert out.loc[1, "o_totalprice"] == 90.0
    assert list(out.columns) == [
        "event_id", "user_id", "ts", "o_orderkey", "o_totalprice"
    ]


def test_asof_join_broadcast_equals_shuffle():
    rng = np.random.default_rng(11)
    n_ev, n_ord = 600, 200
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n_ev),
            "user_id": rng.integers(0, 30, n_ev),
            "ts": TS + pd.to_timedelta(rng.integers(0, 10**6, n_ev), unit="s"),
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, 30, n_ord),
            "o_orderdate": TS
            + pd.to_timedelta(rng.integers(0, 10**6, n_ord), unit="s"),
            "o_orderkey": np.arange(n_ord),
            "o_totalprice": rng.random(n_ord).round(2),
        }
    )

    def run(limit):
        return (
            asof_join(
                rd.from_pandas(ev), rd.from_pandas(orders),
                left_key="user_id", right_key="o_custkey",
                left_ts="ts", right_ts="o_orderdate",
                right_cols=["o_orderkey", "o_totalprice"],
                right_tiebreak="o_orderkey", num_buckets=8,
                broadcast_limit=limit,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(2_000_000), run(0))


@pytest.mark.parametrize("driver_cap", [2_000_000, None])
def test_hopping_window_agg(driver_cap):
    """driver_cap=None forces the hash-bucket combine shuffle — both
    plans must emit the identical window rows."""
    from gocrawler_ray.stages.temporal import hopping_window_agg

    H = 3_600_000_000  # 1h in µs
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": [TS, TS + pd.Timedelta(minutes=90), TS],
            "value": [1.0, 2.0, 4.0],
        }
    )
    out = (
        hopping_window_agg(
            rd.from_pandas(df), width_us=2 * H, hop_us=H, num_buckets=4,
            driver_cap=driver_cap,
        )
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    t0 = TS.value // 1000  # pandas Timestamp.value is ns
    # user1: ev@t0 covers windows [t0-H, t0]; ev@t0+1.5H covers [t0, t0+H]
    expect = [
        (1, t0 - H, 1, 1.0),
        (1, t0, 2, 3.0),
        (1, t0 + H, 1, 2.0),
        (2, t0 - H, 1, 4.0),
        (2, t0, 1, 4.0),
    ]
    got = list(
        out[["user_id", "window_start", "n_events", "sum_value"]]
        .itertuples(index=False, name=None)
    )
    assert got == expect


@pytest.mark.parametrize("cell_factor", [1.0, 2.5])
def test_interval_join_vs_bruteforce(cell_factor):
    from gocrawler_ray.stages.temporal import interval_join

    rng = np.random.default_rng(5)
    n_ev, n_ord = 300, 200
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n_ev),
            "user_id": rng.integers(0, 20, n_ev),
            "ts": TS + pd.to_timedelta(rng.integers(0, 10**5, n_ev), unit="s"),
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, 20, n_ord),
            "o_orderdate": TS
            + pd.to_timedelta(rng.integers(0, 10**5, n_ord), unit="s"),
            "o_orderkey": np.arange(n_ord),
        }
    )
    lower, upper = -3 * 86400 * 1_000_000, 86400 * 1_000_000  # [-3d, +1d]
    out = (
        interval_join(
            rd.from_pandas(ev), rd.from_pandas(orders),
            left_key="user_id", right_key="o_custkey",
            left_ts="ts", right_ts="o_orderdate",
            lower_us=lower, upper_us=upper,
            right_cols=["o_orderkey"], num_buckets=8,
            cell_us=int((upper - lower) * cell_factor),
        )
        .to_pandas()
        .sort_values(["event_id", "o_orderkey"])
        .reset_index(drop=True)
    )
    brute = ev.merge(orders, left_on="user_id", right_on="o_custkey")
    d = (brute["o_orderdate"] - brute["ts"]).dt.total_seconds() * 1_000_000
    brute = (
        brute[(d >= lower) & (d <= upper)][["event_id", "user_id", "ts", "o_orderkey"]]
        .sort_values(["event_id", "o_orderkey"])
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["event_id", "user_id", "ts", "o_orderkey"]
    pd.testing.assert_frame_equal(out, brute)


@pytest.mark.parametrize("buckets", [1, 4])
def test_running_total(buckets):
    from gocrawler_ray.stages.temporal import running_total

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            # user 1 has a ts tie (rows 1,2) pinned by value order
            "ts": [TS + 2 * M, TS, TS, TS + M, TS],
            "value": [0.5, 3.0, 1.25, 2.0, -1.0],
        }
    )
    out = (
        running_total(rd.from_pandas(df), num_buckets=buckets)
        .to_pandas()
        .sort_values(["user_id", "k"])
        .reset_index(drop=True)
    )
    got = list(
        out[["user_id", "k", "value_u", "running_value_u"]].itertuples(
            index=False, name=None
        )
    )
    assert got == [
        (1, 1, 1_250_000, 1_250_000),   # ts tie: 1.25 before 3.0
        (1, 2, 3_000_000, 4_250_000),
        (1, 3, 500_000, 4_750_000),
        (2, 1, -1_000_000, -1_000_000),
        (2, 2, 2_000_000, 1_000_000),
    ]
    assert list(out.loc[[0, 1], "ts"]) == [TS, TS]


@pytest.mark.parametrize("buckets", [1, 4])
def test_lag_deltas(buckets):
    from gocrawler_ray.stages.temporal import lag_deltas

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            # user 1 has a ts tie (event_ids 11,12) pinned by event_id
            "event_id": [13, 12, 11, 20, 21],
            "ts": [TS + 2 * M, TS, TS, TS + M, TS],
            "value": [0.5, 3.0, 1.25, 2.0, -1.0],
        }
    )
    out = (
        lag_deltas(rd.from_pandas(df), num_buckets=buckets)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    got = list(
        out[["user_id", "event_id", "delta_us", "lag_value_u"]].itertuples(
            index=False, name=None
        )
    )
    us = 60_000_000  # M is one minute of microseconds
    assert got == [
        (1, 11, -1, 0),                     # first of key
        (1, 12, 0, 1_250_000),              # ts tie → zero delta, lag=11's value
        (1, 13, 2 * us, 3_000_000),
        (2, 20, us, -1_000_000),            # ts order, not event_id order
        (2, 21, -1, 0),
    ]


@pytest.mark.parametrize("buckets", [1, 4])
@pytest.mark.parametrize("driver_cap", [2_000_000, None])
def test_ordered_paths_pinned_order(buckets, driver_cap):
    """driver_cap=None forces the bucket-shuffle plan — both plans must
    emit the identical paths."""
    from gocrawler_ray.stages.temporal import ordered_paths

    df = pd.DataFrame({
        "user_id": [7, 7, 7, 8],
        "event_id": [3, 1, 2, 9],
        # events 1 and 2 share a ts → event_id breaks the tie
        "ts": [TS + M, TS, TS, TS],
        "event_type": ["purchase", "view", "click", "signup"],
    })
    out = (
        ordered_paths(rd.from_pandas(df), "user_id", "ts", "event_id",
                      "event_type", num_buckets=buckets,
                      driver_cap=driver_cap)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert out["path"].tolist() == ["view>click>purchase", "signup"]
    assert out["n_steps"].tolist() == [3, 1]


@pytest.mark.parametrize("buckets", [1, 4])
def test_rank_windows_ties_and_ntile(buckets):
    from gocrawler_ray.stages.temporal import rank_windows

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"],
        "event_id": [1, 2, 3, 4, 5, 6],
        # a: values 1,1,2,2,2 → ranks 1,1,3,3,3; b: singleton
        "value": [1.0, 1.0, 2.0, 2.0, 2.0, 9.0],
    })
    out = (
        rank_windows(rd.from_pandas(df), "k", "value", "event_id",
                     ntile=4, num_buckets=buckets)
        .to_pandas().sort_values(["k", "event_id"]).reset_index(drop=True)
    )
    assert out["rnk"].tolist() == [1, 1, 3, 3, 3, 1]
    assert out["pct_rank"].tolist() == [0.0, 0.0, 0.5, 0.5, 0.5, 0.0]
    # n=5, k=4 → tile sizes 2,1,1,1 over the (value, id) order
    assert out["tile"].tolist() == [1, 1, 2, 3, 4, 1]


def test_lag_deltas_matches_pandas_shift_bruteforce():
    """Randomized brute force: the distributed LAG equals pandas
    groupby().shift() under the pinned (ts, event_id) order, including
    duplicate timestamps."""
    from gocrawler_ray.stages.temporal import lag_deltas

    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, size=n),
        "event_id": np.arange(n, dtype=np.int64),
        # coarse second resolution forces plenty of ts ties per user
        "ts": TS + pd.to_timedelta(rng.integers(0, 300, size=n), unit="s"),
        "value": rng.normal(0, 10, size=n).round(3),
    })
    got = (
        lag_deltas(rd.from_pandas(df), num_buckets=8)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["value_u"] = (ref["value"] * 1_000_000).round().astype(np.int64)
    ref["ts_us"] = ref["ts"].astype("datetime64[us]").astype(np.int64)
    g = ref.groupby("user_id")
    ref["delta_us"] = (ref["ts_us"] - g["ts_us"].shift()).fillna(-1).astype(np.int64)
    ref["lag_value_u"] = g["value_u"].shift().fillna(0).astype(np.int64)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    for c in ("delta_us", "lag_value_u", "value_u"):
        assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c


def test_moving_window_short_keys_and_exactness(ray_session):
    """Keys shorter than the window clamp n_win; window never crosses a
    key boundary; sums are fixed-point exact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gocrawler_ray.stages.temporal import moving_window

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 3, 3]),
        "ts": pa.array(
            pd.to_datetime([1, 2, 3, 4, 5, 1, 1, 2], unit="s")),
        "event_id": pa.array(range(8), pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 7.5, 0.25, 0.75]),
    })
    out = (
        moving_window(rd.from_arrow(t), window_rows=3)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert out["n_win"].tolist() == [1, 2, 3, 3, 3, 1, 1, 2]
    # user 1: windows of last 3 -> sums 1,3,6,9,12 (in 1e-6 units)
    assert out.loc[:4, "mov_sum_u"].tolist() == [
        1_000_000, 3_000_000, 6_000_000, 9_000_000, 12_000_000]
    assert out.loc[5, "mov_sum_u"] == 7_500_000   # singleton key
    assert out.loc[7, "mov_sum_u"] == 1_000_000   # 0.25+0.75, no crossover
    assert out.loc[7, "mov_avg"] == 0.5


def test_first_last_by_key_segments(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gocrawler_ray.stages.temporal import first_last_by_key

    t = pa.table({
        "user_id": pa.array([5, 5, 5, 9]),
        "ts": pa.array(pd.to_datetime([3, 1, 3, 2], unit="s")),
        "event_id": pa.array([30, 10, 20, 40], pa.int64()),
        "event_type": pa.array(["c", "a", "b", "z"]),
    })
    out = (
        first_last_by_key(rd.from_arrow(t))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    # user 5 order by (ts, id): (1,10,a) (3,20,b) (3,30,c)
    assert out.loc[0].tolist() == [5, 10, "a", 30, "c", 3]
    assert out.loc[1].tolist() == [9, 40, "z", 40, "z", 1]
