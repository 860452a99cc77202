"""Event-stream / time-series pipelines — split from the single-module catalog (round-4 verdict #7). Helpers and shared caches live in ._core; the registry in __ray_entry__ is unchanged."""
from ._core import *  # noqa: F401,F403



def q_events_hourly(sf_dir: str):
    """Tumbling event-time window as a grouped aggregate (streaming-shaped
    workload, SURVEY §2.9 / ray guide)."""
    ev = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        hour = us // 3_600_000_000
        df = pd.DataFrame(
            {
                "hour": hour,
                "event_type": t.column("event_type").to_pandas(),
                # exact milliunit ints: partial sums are order-free
                "v3": np.rint(
                    t.column("value").to_numpy() * 1000
                ).astype(np.int64).astype(object),
            }
        )
        return df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("v3", "size"), v3=("v3", "sum")
        )

    partials = ev.map_batches(partial, batch_format="pyarrow")
    out = _combine_partials(partials, ["hour", "event_type"], ["n", "v3"])
    out["sum_value"] = round_half_away(
        np.array([int(x) for x in out["v3"]], dtype=np.float64)
        / 1000.0, 6)
    return out[["hour", "event_type", "n", "sum_value"]]



def q_sessionize(sf_dir: str):
    """Gap-based session windows (6 h) over the events stream — the
    hash-bucket co-located, vectorized multi-user kernel
    (stages/temporal.py); oracle = DuckDB lag()/cumulative-sum window
    sessions. Session identity is (user_id, session_start)."""
    from ...stages.temporal import sessionize

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())
    out = sessionize(ev, gap_us=6 * 3600 * 1_000_000)

    # np.round, not pc.round: Arrow's kernel lands on a different ULP
    # than DuckDB/numpy decimal rounding and fails the value-hash gate
    def round6(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_value")
        return t.set_column(
            i, "sum_value",
            pa.array(round_half_away(t.column("sum_value").to_numpy(), 6)),
        )

    return out.map_batches(round6, batch_format="pyarrow")



def q_hopping_window(sf_dir: str):
    """Hopping (sliding) window aggregate: 4 h windows hopping hourly,
    per user — each event contributes to 4 windows; explode + partial
    agg inside the batch, one bucketed combine shuffle
    (stages/temporal.py). window_start is µs-since-epoch."""
    from ...stages.temporal import hopping_window_agg

    H = 3_600_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())
    out = hopping_window_agg(ev, width_us=4 * H, hop_us=H)

    def round6(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("sum_value")
        return t.set_column(
            i, "sum_value",
            pa.array(round_half_away(t.column("sum_value").to_numpy(), 6)),
        )

    return out.map_batches(round6, batch_format="pyarrow")



def q_interval_join(sf_dir: str):
    """Interval (range) join: pairs of same-user events within ±6 h —
    time-cell replication + one hash-bucket co-location shuffle
    (stages/temporal.py); self-pairs dropped post-join."""
    from ...stages.temporal import interval_join

    H6 = 6 * 3_600_000_000
    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"],
             num_blocks=_n_cpus())
    evr = ev.map_batches(
        lambda t: pa.table(
            {
                "b_event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
            }
        ),
        batch_format="pyarrow",
    )
    out = interval_join(
        ev, evr,
        left_key="user_id", right_key="user_id",
        left_ts="ts", right_ts="ts",
        lower_us=-H6, upper_us=H6,
        right_cols=["b_event_id"],
    )
    return out.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("event_id"), t.column("b_event_id"))
        ),
        batch_format="pyarrow",
    )



def q_asof_join(sf_dir: str):
    """Backward as-of join: each event picks the latest order of the
    same user at-or-before its timestamp (point-in-time feature join);
    ties on o_orderdate resolve to the max o_orderkey. One bucket
    shuffle, pd.merge_asof kernel per bucket (stages/temporal.py)."""
    from ...stages.temporal import asof_join

    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"],
             num_blocks=_n_cpus())
    orders = _pq(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
        num_blocks=_n_cpus(),
    )
    return asof_join(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    )



def q_events_rollup(sf_dir: str):
    """ROLLUP(event_type, hour): base tumbling-window agg from per-block
    partials, subtotal and grand-total levels derived from the ROUNDED
    base aggregate on BOTH sides (sentinels hour=-1 / event_type='ALL'),
    so every rollup level is hash-stable regardless of summation order.
    The upper levels are driver arithmetic over the bounded base table —
    at 100 TB the base agg is still (types × clock-hours) rows."""
    ev = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "hour": us // 3_600_000_000,
                "value": t.column("value").to_pandas(),
            }
        )
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )

    partials = ev.map_batches(partial, batch_format="pyarrow")
    base = _combine_partials(partials, ["event_type", "hour"], ["n", "sum_value"])
    base["sum_value"] = base["sum_value"].round(6)
    lvl1 = base.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum")
    )
    lvl1["hour"] = np.int64(-1)
    lvl2 = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "hour": np.array([-1], np.int64),
            "n": [base["n"].sum()],
            "sum_value": [base["sum_value"].sum()],
        }
    )
    out = pd.concat(
        [base, lvl1[base.columns], lvl2[base.columns]], ignore_index=True
    )
    out["sum_value"] = out["sum_value"].round(6)
    return out



def q_events_cube(sf_dir: str):
    """CUBE(event_type, hour): the rollup machinery plus the
    hour-subtotal level ROLLUP lacks — all four levels derived from the
    SAME rounded base aggregate on both sides (sentinels hour=-1 /
    event_type='ALL'), so every level is hash-stable regardless of
    summation order; upper levels are driver arithmetic over the
    bounded (types × clock-hours) base."""
    ev = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "hour": us // 3_600_000_000,
                "value": t.column("value").to_pandas(),
            }
        )
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )

    partials = ev.map_batches(partial, batch_format="pyarrow")
    base = _combine_partials(partials, ["event_type", "hour"], ["n", "sum_value"])
    base["sum_value"] = base["sum_value"].round(6)
    by_type = base.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum")
    )
    by_type["hour"] = np.int64(-1)
    by_hour = base.groupby("hour", as_index=False).agg(
        n=("n", "sum"), sum_value=("sum_value", "sum")
    )
    by_hour["event_type"] = "ALL"
    grand = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "hour": np.array([-1], np.int64),
            "n": [base["n"].sum()],
            "sum_value": [base["sum_value"].sum()],
        }
    )
    out = pd.concat(
        [base, by_type[base.columns], by_hour[base.columns], grand[base.columns]],
        ignore_index=True,
    )
    out["sum_value"] = out["sum_value"].round(6)
    return out



def q_user_paths(sf_dir: str):
    """Per-user ordered journey string — string_agg(event_type ORDER BY
    ts, event_id) over the sparse slice
    (stages/temporal.py::ordered_paths): one bucket shuffle; output is
    one row per user so per-key join cost is proportional to the
    result."""
    from ...stages.temporal import ordered_paths

    return ordered_paths(
        _sparse_events(sf_dir), "user_id", "ts", "event_id", "event_type"
    )



def q_funnel_users(sf_dir: str):
    """Ordered-funnel filter: users whose sparse journey contains the
    view → click → purchase subsequence — a regex over the path string
    on both sides (event-type names are prefix-free, so substring
    matching is exact)."""
    from ...stages.temporal import ordered_paths

    paths = ordered_paths(
        _sparse_events(sf_dir), "user_id", "ts", "event_id", "event_type"
    )

    def funnel(t: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(
            t.column("path"), r"view.*click.*purchase"
        )
        return t.filter(hit).select(["user_id", "path"])

    out = paths.map_batches(funnel, batch_format="pyarrow").materialize()
    if out.count() == 0:
        # a zero-block Dataset loses its schema on to_pandas — pin the
        # driver-contract columns explicitly for the empty-funnel case
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "path": pd.Series([], dtype=str)})
    return out



def q_hourly_distinct_hll(sf_dir: str):
    """Tumbling-window HyperLogLog: per-hour distinct-user registers
    (stages/aggregates.py::windowed_hll_registers) — bounded sketch
    state per window, the streaming-distinct pattern at 100 TB; the
    integer register table is the gated artifact (p=6)."""
    from ...stages.aggregates import windowed_hll_registers

    ev = _pq(sf_dir, "events", columns=["ts", "user_id"])
    return windowed_hll_registers(ev, "ts", "user_id", p=6)



def q_clickers_buyers(sf_dir: str):
    """INTERSECT set op: users who clicked AND purchased (within the
    sparse slice) — derived from the pivot partials (counts, never
    rows) combined on the driver, with a distributed fallback past the
    combine cap."""
    return _sparse_pivot_users(
        sf_dir, lambda df: (df["n_click"] > 0) & (df["n_purchase"] > 0)
    )



def q_user_running_total(sf_dir: str):
    """Per-user cumulative running totals over the event stream — the
    SUM OVER (PARTITION BY ... ORDER BY ts ROWS UNBOUNDED PRECEDING)
    dataflow as one bucket shuffle + segmented-cumsum kernel
    (stages/temporal.py::running_total). Fixed-point micro-units make
    the distributed cumsum bit-identical to the SQL window oracle."""
    from ...stages.temporal import running_total

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())
    return running_total(ev)



def q_event_deltas(sf_dir: str):
    """Per-user inter-event time deltas + previous-event value — the
    LAG window dataflow (stages/temporal.py::lag_deltas): one
    hash-bucket shuffle, shifted-compare kernel, order pinned by the
    unique event_id so the distributed result hash-matches the SQL
    window oracle exactly."""
    from ...stages.temporal import lag_deltas

    ev = _pq(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "value"],
             num_blocks=_n_cpus())
    return lag_deltas(ev)



def q_event_pivot(sf_dir: str):
    """PIVOT/crosstab: per-user wide counts of each event type + total
    (stages/aggregates.py::pivot_counts) — blocks emit wide int partial
    rows that merge by SUM; bounded user domain combines on the driver,
    unbounded domains fall back to one distributed groupby-sum."""
    from ...stages.aggregates import pivot_counts

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type"])
    n_cols = [f"n_{c}" for c in EVENT_TYPES] + ["n_total"]
    partials = pivot_counts(ev, "user_id", "event_type", EVENT_TYPES)
    out = _combine_partials(partials, ["user_id"], n_cols, cap=200_000)
    if out is None:  # unbounded key domain: distributed merge
        agg = partials.groupby("user_id").sum(n_cols)
        return agg.map_batches(
            lambda t: t.rename_columns(
                [c[4:-1] if c.startswith("sum(") else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return out



def q_user_top_event(sf_dir: str):
    """Exact grouped mode: each user's most frequent event type
    (stages/aggregates.py::grouped_mode) — counts-not-rows through two
    small shuffles, ties pinned by smallest value so the winner matches
    the SQL ROW_NUMBER oracle exactly."""
    from ...stages.aggregates import grouped_mode

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type")



def q_moving_avg(sf_dir: str):
    """Rows-window moving aggregate: per-user moving sum/avg of the last
    4 events ordered by (ts, event_id) — the ``ROWS BETWEEN 3 PRECEDING
    AND CURRENT ROW`` window (stages/temporal.py::moving_window). One
    hash-bucket shuffle, then a cumsum-difference kernel; fixed-point
    sums and an identical-operand division keep the emitted average
    hash-exact against the SQL window oracle."""
    from ...stages.temporal import moving_window

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"],
             num_blocks=_n_cpus())
    return moving_window(ev, window_rows=4)



def q_first_last_events(sf_dir: str):
    """Entity-snapshot window: each user's FIRST and LAST event (id +
    type) over the pinned order (ts, event_id) plus their row count
    (stages/temporal.py::first_last_by_key) — the latest-state /
    entity-resolution pattern, one bucket shuffle + segment indexing."""
    from ...stages.temporal import first_last_by_key

    ev = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"],
             num_blocks=_n_cpus())
    return first_last_by_key(ev)



def q_events_profile(sf_dir: str):
    """Column-profiling sweep (stages/aggregates.py::profile_columns):
    row/null counts + exact integer min/max per profiled column of the
    events table (timestamps as epoch-µs) — one streaming pass, one
    partial row per column per block."""
    from ...stages.aggregates import profile_columns

    ev = _pq(sf_dir, "events", columns=["event_id", "ts", "user_id"],
             num_blocks=_n_cpus())
    return profile_columns(
        ev, {"event_id": "int", "ts": "ts", "user_id": "int"}
    )



def q_events_unpivot(sf_dir: str):
    """Wide→long reshape (UNPIVOT/melt): each event row explodes into
    one (event_id, metric, mval) row per measure — a map-only stage (no
    shuffle), the standard prep step before a long-format metric store
    or per-metric windowing."""
    ev = _pq(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"],
             num_blocks=_n_cpus())

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        eid = t.column("event_id").to_numpy()
        vals = [
            t.column("value").to_numpy().astype(np.float64),
            t.column("user_id").to_numpy().astype(np.float64),
            pc.cast(t.column("ts"), pa.int64()).to_numpy().astype(np.float64),
        ]
        metric = ["value", "user_id", "epoch_us"]
        return pa.table(
            {
                "event_id": pa.array(np.tile(eid, 3)),
                "metric": pa.array(np.repeat(np.array(metric, dtype=object), n)),
                "mval": pa.array(np.concatenate(vals)),
            }
        )

    return ev.map_batches(melt, batch_format="pyarrow")



def q_daily_new_users(sf_dir: str):
    """First-touch attribution (retention-cohort prep): per-user
    first-seen day, per-day new-user counts, cumulative user total.

    ONE hash-bucket shuffle co-locates each user's events; the in-bucket
    kernel takes a segmented per-user min day and emits per-day count
    partials — each user counted exactly once globally because a user's
    rows never straddle buckets. The per-day stream is clock-bounded
    (days × buckets rows even at 100 TB), so the histogram combine and
    the cumulative sum run on the driver."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"], num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pa.Table:
        day = (
            g["ts"].astype("int64").to_numpy() // 86_400_000_000
        ).astype(np.int64)
        first = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "day": day}
        ).groupby("user_id", as_index=False)["day"].min()
        vc = first["day"].value_counts()
        return pa.table(
            {
                "day": pa.array(vc.index.to_numpy(np.int64)),
                "n_new": pa.array(vc.to_numpy(np.int64)),
            }
        )

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    out = _combine_partials(partials, ["day"], ["n_new"])
    out = out.sort_values("day").reset_index(drop=True)
    out["n_new"] = out["n_new"].astype(np.int64)
    out["cum_users"] = out["n_new"].cumsum().astype(np.int64)
    return out



def q_retention_cohorts(sf_dir: str):
    """Cohort-retention matrix: distinct users active in week-offset w
    from their first-touch day. ONE hash-bucket shuffle computes the
    first-touch AND every event's offset co-located (a user's rows never
    straddle buckets, so the per-bucket distinct (user, cohort, offset)
    dedup is globally exact) — no user→cohort broadcast, no self-join.
    The (cohort × offset) partial stream is clock-bounded."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"], num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pa.Table:
        day = (g["ts"].astype("int64").to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        u = g["user_id"].to_numpy()
        df = pd.DataFrame({"user_id": u, "day": day})
        df["cohort"] = df.groupby("user_id")["day"].transform("min")
        df["week_offset"] = (df["day"] - df["cohort"]) // 7
        act = df[["user_id", "cohort", "week_offset"]].drop_duplicates()
        out = act.groupby(["cohort", "week_offset"], as_index=False).size()
        return pa.table(
            {
                "cohort": pa.array(out["cohort"].to_numpy(np.int64)),
                "week_offset": pa.array(out["week_offset"].to_numpy(np.int64)),
                "n_users": pa.array(out["size"].to_numpy(np.int64)),
            }
        )

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    out = _combine_partials(partials, ["cohort", "week_offset"], ["n_users"])
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["cohort", "week_offset"]).reset_index(drop=True)



def q_rolling_active_users(sf_dir: str):
    """Rolling 7-day active users (sliding-window DISTINCT — the
    WAU metric): one hash-bucket shuffle co-locates each user, the
    kernel dedups (user, day), fans each active day into the ≤7 windows
    it covers, dedups (user, window) — exact because a user never
    straddles buckets — and emits clock-bounded (window, count)
    partials. Window bounds come from the partial stream itself (min
    window = first active day, max − 6 = last), no extra pass."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"], num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pa.Table:
        day = (g["ts"].astype("int64").to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        act = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "day": day}) \
            .drop_duplicates()
        n = len(act)
        win = (act["day"].to_numpy()[:, None] + np.arange(7, dtype=np.int64)).ravel()
        usr = np.repeat(act["user_id"].to_numpy(), 7)
        uw = pd.DataFrame({"user_id": usr, "win": win}).drop_duplicates()
        vc = uw["win"].value_counts()
        return pa.table(
            {
                "window_end": pa.array(vc.index.to_numpy(np.int64)),
                "active_users": pa.array(vc.to_numpy(np.int64)),
            }
        )

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    out = _combine_partials(partials, ["window_end"], ["active_users"])
    lo, hi = out["window_end"].min(), out["window_end"].max() - 6
    out = out[(out["window_end"] >= lo) & (out["window_end"] <= hi)]
    out["active_users"] = out["active_users"].astype(np.int64)
    return out.sort_values("window_end").reset_index(drop=True)



def q_event_type_pairs(sf_dir: str):
    """Market-basket co-occurrence: for every unordered event-type pair,
    how many users performed both. ONE hash-bucket shuffle on user_id
    co-locates a user's rows; the in-bucket kernel dedups (user, type)
    and self-merges per user; the pair partials combine bounded by
    type-vocabulary²."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type"],
             num_blocks=_n_cpus())

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        out = m.groupby(["event_type_x", "event_type_y"]).size()
        return pd.DataFrame({
            "type_a": out.index.get_level_values(0),
            "type_b": out.index.get_level_values(1),
            "n_users": out.to_numpy(np.int64),
        })

    per_bucket = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    out = _combine_partials(per_bucket, ["type_a", "type_b"], ["n_users"])
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)



def q_daily_value_change(sf_dir: str):
    """Aggregate-then-window: daily value totals (exact milliunit int
    sums, clock-bounded combine) with day-over-day percent change closed
    on the driver from the SAME exact integers the oracle's lag() sees —
    the canonical small-series window after a big distributed reduce."""
    ev = _pq(sf_dir, "events", columns=["ts", "value"], num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (pc.cast(t.column("ts"), pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        v3 = np.rint(t.column("value").to_numpy() * 1000).astype(np.int64)
        return pd.DataFrame({"day": day, "s3": v3}).groupby(
            "day", as_index=False
        )["s3"].sum()

    d = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["day"], ["s3"]
    ).sort_values("day").reset_index(drop=True)
    s3 = d["s3"].to_numpy(np.int64)
    prev = np.roll(s3, 1)
    keep = np.arange(len(d)) > 0
    keep &= prev != 0
    out = pd.DataFrame({
        "day": d["day"].to_numpy(np.int64)[keep],
        "total": round_half_away(s3[keep] / 1000.0, 6),
        "pct_change": round_half_away(
            (s3[keep] - prev[keep]).astype(np.float64) / prev[keep], 6
        ),
    })
    return out.sort_values("day").reset_index(drop=True)



def q_user_drawdown(sf_dir: str):
    """Per-user running-max / drawdown window: for every event, the
    user's cumulative value peak so far and how far below it this event
    sits — the cummax window op (monotone-accumulate, not cumsum). ONE
    hash-bucket shuffle on user_id; in-bucket pandas sort + C-kernel
    groupby cummax on exact milliunit ints; row order within a user is
    pinned by (ts, event_id) so LAG-free determinism holds."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        v3 = np.rint(g["value"].to_numpy() * 1000).astype(np.int64)
        g = g.assign(__v3=v3)
        peak = g.groupby("user_id")["__v3"].cummax().to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "peak": round_half_away(peak / 1000.0, 6),
            "drawdown": round_half_away((peak - v3) / 1000.0, 6),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("event_id")



def q_latest_events(sf_dir: str):
    """Dedup-by-recency (the CDC / ingest-compaction op): keep each
    (user, day)'s LAST event — max ts, event_id tie-break — emitting one
    surviving row per key. ONE hash-bucket shuffle on user_id (a user's
    rows carry all its days); the in-bucket kernel is a vectorized
    sort + drop_duplicates(keep=last), globally exact because keys never
    straddle buckets."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        day = (g["ts"].astype("int64").to_numpy() // 86_400_000_000).astype(
            np.int64
        )
        g = g.assign(day=day)
        g = g.sort_values(["user_id", "day", "ts", "event_id"])
        last = g.drop_duplicates(["user_id", "day"], keep="last")
        return pd.DataFrame({
            "user_id": last["user_id"].to_numpy(np.int64),
            "day": last["day"].to_numpy(np.int64),
            "event_id": last["event_id"].to_numpy(np.int64),
            "event_type": last["event_type"].to_numpy(dtype=object),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort(["user_id", "day"])



def q_click_to_purchase(sf_dir: str):
    """Attribution-window lead join: for every click, how many purchases
    the SAME user makes within the following 7 days (exclusive of the
    click instant) — the conversion-attribution op. ONE hash-bucket
    shuffle on user_id co-locates each user's clicks and purchases; the
    in-bucket kernel sorts each user's purchase timestamps once and
    answers every click with two vectorized np.searchsorted calls
    (O((C+P) log P) per user, never the C×P self-join the naive SQL
    plan would do)."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        return t.filter(m)

    win = np.int64(7 * 86_400_000_000)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        is_p = (g["event_type"] == "purchase").to_numpy()
        is_c = (g["event_type"] == "click").to_numpy()
        p_uid, p_ts = uid[is_p], ts[is_p]
        c_uid, c_ts = uid[is_c], ts[is_c]
        # ≤-semantics both edges (shared lexsort merge-count helper)
        lo = _merge_count(p_uid, p_ts, c_uid, c_ts)
        hi = _merge_count(p_uid, p_ts, c_uid, c_ts + win)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64)[is_c],
            "n_purchases_7d": (hi - lo).astype(np.int64),
        })

    out = (
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("event_id")



def q_range_moving_sum(sf_dir: str):
    """Time-RANGE window frame (vs q_moving_avg's ROWS frame): per
    event, the user's value sum over the trailing 24 HOURS — the frame
    every rate-limit / rolling-exposure feature uses. ONE hash-bucket
    shuffle on user_id; the in-bucket kernel is per-user prefix sums +
    one vectorized searchsorted for the window's left edge (O(n log n)
    per bucket, no per-row loop). Exact milliunit int sums; ties inside
    a user share a timestamp and are all included (RANGE semantics —
    frame bounds depend on ts VALUE, not row position)."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"],
             num_blocks=_n_cpus())
    win = np.int64(24 * 3600 * 1_000_000)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        v3 = np.rint(g["value"].to_numpy() * 1000).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(v3)])  # prefix sums

        # RANGE frame bounds via the shared lexsort merge-count: rows of
        # OTHER users appear in both edge counts and cancel in
        # cs[hi] − cs[lo], so no segment clamping is needed
        lo = _merge_count(uid, ts, uid, ts - win, q_first=True)
        hi = _merge_count(uid, ts, uid, ts, q_first=False)
        s3 = cs[hi] - cs[lo]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "sum_24h": round_half_away(s3 / 1000.0, 6),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("event_id")



def q_missing_days(sf_dir: str):
    """Calendar-gap detection: days inside the stream's [min, max] span
    with ZERO events — the data-freshness / ingestion-hole check, over
    the sparse slice ``event_id % 397 == 0`` (denser slices still cover
    every day of the 30-day span, so their gap set is degenerately
    empty). The
    distinct-day set is a clock-bounded combine (days, not rows); the
    complement closes on the driver against the integer day range."""
    ev = _pq(sf_dir, "events", columns=["event_id", "ts"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()[eid % 397 == 0]
        day = np.unique(ts // 86_400_000_000).astype(np.int64)
        return pd.DataFrame({"day": day, "n": np.int64(1)})

    days = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["day"], ["n"]
    )["day"].to_numpy(np.int64)
    full = np.arange(days.min(), days.max() + 1, dtype=np.int64)
    missing = np.setdiff1d(full, days)
    return pd.DataFrame({"day": missing})



def q_user_ema(sf_dir: str):
    """Per-user integer EMA (alpha = 1/2): e_t = (e_{t-1} + v_t) // 2 —
    a TRUE per-key recurrence that no SQL window/prefix-scan form
    expresses (the floor divide breaks linearity, unlike cumsum/cummax).
    ONE hash-bucket shuffle on user_id, then an in-bucket WAVEFRONT
    kernel: rows are laid out by (step, user) so recurrence step j is a
    single vectorized numpy op across every user's j-th event at once —
    O(rows) total work, O(max chain length) kernel launches, zero
    per-row Python. Exact milliunit ints end-to-end; the oracle replays
    the identical integer recurrence as a recursive CTE."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(np.int64)
        m = np.rint(g["value"].to_numpy() * 1000).astype(np.int64)
        rn = g.groupby("user_id").cumcount().to_numpy(np.int64)
        order = np.lexsort((u, rn))  # wavefront layout: step-major
        u2, m2, rn2 = u[order], m[order], rn[order]
        e = np.empty_like(m2)
        nsteps = int(rn2[-1]) + 1
        starts = np.searchsorted(rn2, np.arange(nsteps + 1))
        e[starts[0]:starts[1]] = m2[starts[0]:starts[1]]
        for j in range(1, nsteps):
            cur = slice(starts[j], starts[j + 1])
            prev = slice(starts[j - 1], starts[j])
            # users at step j are a prefix-closed subset of step j-1,
            # both slices sorted by user -> align by searchsorted
            pos = np.searchsorted(u2[prev], u2[cur])
            e[cur] = (e[prev][pos] + m2[cur]) // 2  # values >= 0
        df = pd.DataFrame({"user_id": u2, "rn": rn2, "e": e})
        last = df.loc[df.groupby("user_id")["rn"].idxmax()]
        return pd.DataFrame({
            "user_id": last["user_id"].to_numpy(np.int64),
            "n_events": last["rn"].to_numpy(np.int64) + 1,
            "ema": round_half_away(last["e"].to_numpy(np.int64) / 1000.0, 6),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("user_id")



def q_peak_in_transit(sf_dir: str):
    """Sweep-line MAX-CONCURRENCY: each lineitem occupies its supplier
    for a delivery window [shipdate, shipdate + quantity days); the
    query returns each supplier's PEAK number of simultaneously open
    windows — the interval-stabbing aggregate that needs an ordered
    prefix scan, not a groupby. Endpoint deltas are netted per
    (supplier, day) BEFORE the scan, so tie ordering is immaterial and
    in-bucket state is bounded by suppliers × active days, not rows.
    ONE hash-bucket shuffle on l_suppkey; exact integer throughout."""
    from ...stages.temporal import _with_bucket

    li = _pq(sf_dir, "lineitem",
             columns=["l_suppkey", "l_shipdate", "l_quantity"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        s = g["l_suppkey"].to_numpy(np.int64)
        d0 = g["l_shipdate"].to_numpy().astype("datetime64[D]").astype(
            np.int64)
        d1 = d0 + np.rint(g["l_quantity"].to_numpy()).astype(np.int64)
        ev = pd.DataFrame({
            "s": np.concatenate([s, s]),
            "d": np.concatenate([d0, d1]),
            "delta": np.concatenate([
                np.ones(len(s), np.int64), -np.ones(len(s), np.int64)]),
        })
        net = ev.groupby(["s", "d"], as_index=False)["delta"].sum()
        net = net.sort_values(["s", "d"])
        run = net.groupby("s")["delta"].cumsum().to_numpy(np.int64)
        peaks = pd.DataFrame({
            "s": net["s"].to_numpy(np.int64), "r": run,
        }).groupby("s", as_index=False)["r"].max()
        return pd.DataFrame({
            "l_suppkey": peaks["s"].to_numpy(np.int64),
            "peak": peaks["r"].to_numpy(np.int64),
        })

    out = (
        _with_bucket(li, "l_suppkey", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("l_suppkey")



def q_late_events(sf_dir: str):
    """Streaming-watermark late-event flagging: events 'arrive' in a
    deterministic md5-permuted order (simulating out-of-order delivery);
    an event is LATE if the watermark — the max event-time seen over
    ALL earlier arrivals, globally — is more than 15 days ahead of it.
    The global ordered scan distributes as ORDERED HASH-RANGE BUCKETS
    (the customer_revenue_pctile move): the uniform arrival hash is cut
    into 16 value ranges, pass 1 ships one (bucket, max ts) partial per
    block, the driver closes per-bucket CARRY-IN watermarks from the
    prefix maxima, and pass 2 flags in-bucket with a shifted prefix-max
    kernel seeded by the carry-in. No global sort, no driver scan;
    exact epoch-µs integers end-to-end."""
    from ...functions.urls import md5_hash64_many

    L_US = np.int64(15 * 86_400_000_000)
    N_RB = 16
    ev = _pq(sf_dir, "events", columns=["event_id", "ts"],
             num_blocks=_n_cpus())

    def add_arr(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_pylist()
        arr = md5_hash64_many([f"arr:{i}" for i in ids])
        rb = (arr >> np.uint64(60)).astype(np.int64)  # 16 value ranges
        return pa.table({
            "event_id": t.column("event_id"),
            # epoch-µs regardless of the source timestamp resolution
            "ts": pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                          pa.int64()),
            "arr": pa.array(arr, pa.uint64()),
            "__rb": pa.array(rb, pa.int64()),
        })

    keyed = ev.map_batches(add_arr, batch_format="pyarrow").materialize()

    def rb_max(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"rb": t.column("__rb").to_numpy(),
                           "mx": t.column("ts").to_numpy()})
        return df.groupby("rb", as_index=False)["mx"].max()

    # max-combine by hand (the shared _combine_partials sums)
    part = pd.concat(
        list(keyed.map_batches(rb_max, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True,
    ).groupby("rb", as_index=False)["mx"].max().sort_values("rb")

    # carry-in watermark per bucket = max ts over all LOWER buckets
    carry: dict[int, int | None] = {}
    run = None
    for rb in range(N_RB):
        carry[rb] = run
        row = part[part["rb"] == rb]
        if len(row):
            m = int(row["mx"].iloc[0])
            run = m if run is None else max(run, m)
    carry_ref = ray.put(carry)

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        cin = ray.get(carry_ref)[int(g["__rb"].iloc[0])]
        g = g.sort_values(["arr", "event_id"])
        ts = g["ts"].to_numpy(np.int64)
        prev = np.empty_like(ts)
        prev[1:] = np.maximum.accumulate(ts[:-1])
        if cin is None:
            prev[0] = ts[0]  # global first arrival: never late
        else:
            prev[0] = cin
            prev = np.maximum(prev, np.int64(cin))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "is_late": (prev - L_US > ts).astype(np.int64),
        })

    out = keyed.groupby("__rb").map_groups(flag, batch_format="pandas")
    return out.sort("event_id")



def q_interval_coverage(sf_dir: str):
    """Merged-interval (gaps-and-islands) coverage per user: each event
    opens an interval of ``round(value*1000) × 0.1 s``; overlapping or
    touching intervals coalesce, and the report is (n_islands, total
    covered µs) per user — the interval-union operator behind session
    coverage / airtime / utilization analytics. ONE hash-bucket shuffle
    on user_id co-locates a user's events; the in-bucket kernel is all
    vectorized pandas (sort → per-user cummax-shift → island cumsum →
    two groupbys); per-user results are tiny and gather at the end.
    All arithmetic is integer µs so partials are exactly mergeable."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def bucket_cover(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "n_islands": pd.Series([], dtype=np.int64),
                 "covered_us": pd.Series([], dtype=np.int64)}
            )
        s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        dur = (
            round_half_away(g["value"].to_numpy(np.float64) * 1000.0)
            * 100000.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {"u": g["user_id"].to_numpy(), "s": s, "e": s + dur}
        ).sort_values(["u", "s", "e"], kind="stable")
        cm = df.groupby("u", sort=False)["e"].cummax()
        prev = cm.groupby(df["u"], sort=False).shift(1)
        new_island = (
            df["s"].to_numpy() > prev.to_numpy()
        ) | prev.isna().to_numpy()
        df["gid"] = np.cumsum(new_island)
        isl = df.groupby(["u", "gid"], as_index=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        isl["span"] = isl["e"] - isl["s"]
        return isl.groupby("u", as_index=False).agg(
            n_islands=("gid", "count"), covered_us=("span", "sum")
        ).rename(columns={"u": "user_id"})

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(
            lambda g: bucket_cover(g.drop(columns="__bucket")),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)



def q_event_throttle(sf_dir: str):
    """Streaming event throttling (rate-limit dedup): an event is KEPT
    iff it is the first of its (user, event_type) key or arrives ≥ 60 s
    after the key's previous event (lag-based throttle — the stateless
    window form every stream engine ships, not the kept-chain
    recurrence). ONE hash-bucket shuffle on user_id co-locates each
    key's full history; the in-bucket kernel is a vectorized
    lexsort + diff (no per-row Python), and what leaves each bucket is
    a (event_type × {kept,dropped}) count partial — clock-bounded at
    any corpus size."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())
    GAP = 60_000_000  # 60 s in µs

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["event_type"].to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        ts = g["ts"].astype("int64").to_numpy()[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        gap_ok = np.empty(len(u), dtype=bool)
        gap_ok[0] = True
        gap_ok[1:] = (ts[1:] - ts[:-1]) >= GAP
        kept = first | gap_ok
        df = pd.DataFrame({"event_type": et, "kept": kept})
        out = df.groupby("event_type", as_index=False).agg(
            kept=("kept", "sum"), n=("kept", "size"))
        out["dropped"] = out["n"] - out["kept"]
        return out[["event_type", "kept", "dropped"]]

    partials = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    out = _combine_partials(partials, ["event_type"], ["kept", "dropped"])
    out["kept"] = out["kept"].astype(np.int64)
    out["dropped"] = out["dropped"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)



def q_user_twap(sf_dir: str):
    """Per-user time-weighted average value (TWAP): each event's value
    is weighted by the µs interval to the user's NEXT event (the
    held-until-replaced semantics of market/metric rollups); users whose
    events all share one timestamp are excluded (zero total weight).
    ONE hash-bucket shuffle on user_id, then a fully vectorized
    in-bucket kernel (lexsort + shifted diff + groupby sums) — each
    user's row count and output row are bucket-local, so nothing beyond
    the per-user result rows ever moves. Weighted sums run in float64
    with exact-integer µs weights; both sides round half-away to 6 (the
    ~1e-15 relative summation-order noise is 9 orders below the grid)."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        ts = g["ts"].astype("int64").to_numpy()[order]
        v = g["value"].to_numpy(np.float64)[order]
        last = np.empty(len(u), dtype=bool)
        last[:-1] = u[1:] != u[:-1]
        last[-1] = True
        dt = np.empty(len(u), dtype=np.float64)
        dt[:-1] = (ts[1:] - ts[:-1]).astype(np.float64)
        dt[last] = 0.0
        df = pd.DataFrame({"user_id": u, "num": v * dt, "den": dt,
                           "n_intervals": (~last).astype(np.int64)})
        agg = df.groupby("user_id", as_index=False).sum()
        agg = agg[agg["den"] > 0]
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(np.int64),
            "twap": round_half_away(
                agg["num"].to_numpy() / agg["den"].to_numpy(), 6),
            "n_intervals": agg["n_intervals"].to_numpy(np.int64),
        })

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
    return out.sort("user_id")



def q_user_streaks(sf_dir: str):
    """Gap-and-islands: each user's LONGEST run of consecutive active
    days plus their total distinct active days — the retention-quality
    report. ONE hash-bucket shuffle on user_id co-locates each user's
    history; the kernel is fully vectorized (µs → day ordinal, distinct
    (user, day) sort, island break vector where user changes or the day
    gap ≠ 1, `np.add.reduceat`-free run lengths via break indices) and
    emits one row per user — output is user-bounded, never
    event-bounded."""
    from ...stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        day = g["ts"].astype("int64").to_numpy() // DAY
        d = pd.DataFrame({"u": u, "d": day}).drop_duplicates()
        order = np.lexsort((d["d"].to_numpy(), d["u"].to_numpy()))
        u = d["u"].to_numpy()[order]
        day = d["d"].to_numpy()[order]
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (day[1:] - day[:-1] != 1)
        isl = np.cumsum(brk) - 1
        run = np.bincount(isl)  # length of each island
        isl_user = u[brk]       # owner of each island
        out = pd.DataFrame({"user_id": isl_user, "run": run})
        agg = out.groupby("user_id", as_index=False).agg(
            max_streak=("run", "max"), n_active_days=("run", "sum"))
        agg["max_streak"] = agg["max_streak"].astype(np.int64)
        agg["n_active_days"] = agg["n_active_days"].astype(np.int64)
        return agg

    out = (
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
        .select_columns(["user_id", "max_streak", "n_active_days"])
    )
    return out.sort("user_id")



def q_event_transitions(sf_dir: str):
    """First-order Markov transition matrix over the event-type
    alphabet: for every (prev, next) pair of a user's consecutive
    events, the transition count and row-normalized probability — the
    behavioral-model fit every clickstream stack runs. ONE hash-bucket
    shuffle on user_id co-locates each user's ordered history; the
    kernel is a lexsort + shifted compare (no Python per row) and emits
    type²-bounded count partials, so the combine stream is types² ×
    buckets at any corpus size."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = u[1:] == u[:-1]
        df = pd.DataFrame({"prev_type": et[:-1][same],
                           "next_type": et[1:][same]})
        out = df.groupby(["prev_type", "next_type"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["prev_type", "next_type"], ["n"],
    )
    row_tot = out.groupby("prev_type")["n"].transform("sum").to_numpy(
        np.float64)
    return pd.DataFrame({
        "prev_type": out["prev_type"],
        "next_type": out["next_type"],
        "n": out["n"].astype(np.int64),
        "p": round_half_away(out["n"].to_numpy(np.float64) / row_tot, 6),
    }).sort_values(["prev_type", "next_type"]).reset_index(drop=True)



def q_stickiness(sf_dir: str):
    """Weekly DAU/WAU stickiness: per ISO week (Monday-truncated), the
    distinct weekly actives, total user-days, active calendar days, and
    the avg-DAU/WAU ratio — the engagement-quality metric. ONE
    hash-bucket shuffle on user_id makes the (user, week, day) dedup
    bucket-local and the WAU/user-day partials exactly summable
    (buckets partition users); the week's active-day set is
    calendar-bounded and closes on the driver."""
    from ...stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        d = g["ts"].astype("int64").to_numpy() // DAY
        wk = d - (d + 3) % 7  # 1970-01-01 is a Thursday; Monday start
        dd = pd.DataFrame({"u": u, "wk": wk, "d": d}).drop_duplicates()
        ud = dd.groupby("wk", as_index=False).size().rename(
            columns={"size": "user_days"})
        wau = dd[["u", "wk"]].drop_duplicates().groupby(
            "wk", as_index=False).size().rename(columns={"size": "wau"})
        days = dd[["wk", "d"]].drop_duplicates()
        days["day_bit"] = np.int64(1) << (
            (days["d"] - days["wk"]).to_numpy(np.int64))
        db = days.groupby("wk", as_index=False)["day_bit"].sum()
        out = ud.merge(wau, on="wk").merge(db, on="wk")
        return out

    parts = _gather_capped(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
    )  # ≤ weeks × buckets rows (calendar-bounded)
    agg = parts.groupby("wk", as_index=False).agg(
        wau=("wau", "sum"), user_days=("user_days", "sum"),
        day_bits=("day_bit", lambda s: np.bitwise_or.reduce(
            s.to_numpy(np.int64))))
    n_days = np.array([bin(int(b)).count("1") for b in agg["day_bits"]],
                      dtype=np.int64)
    wk_ts = pd.to_datetime(agg["wk"].to_numpy(np.int64) * DAY, unit="us")
    return pd.DataFrame({
        "wk": wk_ts,
        "wau": agg["wau"].astype(np.int64),
        "user_days": agg["user_days"].astype(np.int64),
        "n_days": n_days,
        "stickiness": round_half_away(
            agg["user_days"].to_numpy(np.float64) / n_days
            / agg["wau"].to_numpy(np.float64), 6),
    }).sort_values("wk").reset_index(drop=True)



def q_time_to_purchase(sf_dir: str):
    """Activation funnel timing: per user, days from their FIRST event
    to their FIRST purchase, reported as a bounded histogram (same-day /
    1-7 / 8-30 / 31+ days) plus the never-purchased cohort — the
    activation-latency report. ONE hash-bucket shuffle on user_id; the
    kernel reduces each user to two firsts and emits the 5-row
    partial."""
    from ...stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"],
             num_blocks=_n_cpus())
    EDGES = np.array([0, 7, 30], dtype=np.int64)
    LABELS = np.array(["0_same_day", "1-7", "8-30", "31+"], dtype=object)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        first = pd.DataFrame({"u": u, "ts": ts}).groupby(
            "u", as_index=False)["ts"].min()
        isp = g["event_type"].to_numpy() == "purchase"
        fp = pd.DataFrame({"u": u[isp], "ts": ts[isp]}).groupby(
            "u", as_index=False)["ts"].min()
        m = first.merge(fp, on="u", how="left", suffixes=("_f", "_p"))
        never = int(m["ts_p"].isna().sum())
        got = m.dropna(subset=["ts_p"])
        gap = (got["ts_p"].to_numpy(np.int64)
               - got["ts_f"].to_numpy(np.int64)) // DAY
        b = np.searchsorted(EDGES, gap, side="left")  # count edges < gap
        h = pd.DataFrame({"bucket": LABELS[b], "n_users": np.int64(1)})
        out = h.groupby("bucket", as_index=False).sum()
        return pd.concat(
            [out, pd.DataFrame({"bucket": ["never"],
                                "n_users": [never]})],
            ignore_index=True)

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["bucket"], ["n_users"],
    )
    out = out[out["n_users"] > 0]
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)



def q_monthly_churn(sf_dir: str):
    """Month-over-month churn: per calendar month, active users and the
    share of them inactive the NEXT month (the last observed month is
    excluded — churn there is right-censored). ONE hash-bucket shuffle
    on user_id; each user's distinct-month set reduces in-bucket to
    (month, active, churned) partials; the observed-month maximum is
    data-bounded and closes on the driver."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[M]")
        mo = ts.astype(np.int64)  # months since 1970-01
        d = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                          "m": mo}).drop_duplicates()
        order = np.lexsort((d["m"].to_numpy(), d["u"].to_numpy()))
        u = d["u"].to_numpy()[order]
        m = d["m"].to_numpy()[order]
        nxt_same = np.zeros(len(u), dtype=bool)
        nxt_same[:-1] = (u[1:] == u[:-1]) & (m[1:] == m[:-1] + 1)
        df = pd.DataFrame({"month": m, "n_active": np.int64(1),
                           "n_churned": (~nxt_same).astype(np.int64)})
        return df.groupby("month", as_index=False).sum()

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["month"], ["n_active", "n_churned"],
    )
    out = out[out["month"] < out["month"].max()]  # censor last month
    mo_ts = pd.to_datetime(
        out["month"].to_numpy(np.int64).astype("datetime64[M]"))
    return pd.DataFrame({
        "month": mo_ts,
        "n_active": out["n_active"].astype(np.int64),
        "n_churned": out["n_churned"].astype(np.int64),
        "churn_rate": round_half_away(
            out["n_churned"].to_numpy(np.float64)
            / out["n_active"].to_numpy(np.float64), 6),
    }).sort_values("month").reset_index(drop=True)



def q_decayed_counts(sf_dir: str):
    """Recency-weighted activity: per event type, the exponentially
    decayed event count (half-life = 7 days against the fixed
    2024-03-01 anchor) next to the raw count — the freshness-weighted
    popularity signal. The decay weight is EXACT by construction:
    age is floored to whole half-lives j, weight = 2^(40−j) integer
    units (zero past 40 half-lives), so partials sum as integers and
    the single /2^40 float happens once, identically, on both sides."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000
    ANCHOR = int(pd.Timestamp("2024-03-01").value // 1000)

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        age_days = np.maximum(0, (ANCHOR - ts) // DAY)
        j = np.minimum(age_days // 7, 40).astype(np.int64)
        w = (np.int64(1) << (np.int64(40) - j))
        w[age_days // 7 > 40] = 0
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "n": np.int64(1),
            # object: Python-int partials, exact at any corpus size
            "w40": w.astype(object)})
        return df.groupby("event_type", as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "w40"],
    )
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n": out["n"].astype(np.int64),
        "decayed": round_half_away(
            np.array([int(x) / float(1 << 40) for x in out["w40"]]), 6),
    }).sort_values("event_type").reset_index(drop=True)



def q_hour_entropy(sf_dir: str):
    """Temporal-concentration entropy: per event type, the Shannon
    entropy (bits) of its hour-of-day histogram — 0 when all events
    land in one hour, log2(24)≈4.585 when uniform. The burstiness
    signal a scheduler uses to provision crawl/ingest capacity.

    Distributed as bounded (event_type × 24)-cell count partials;
    the driver closes H = log2(n) − (Σ_h c_h·log2 c_h)/n. Cross-engine
    determinism: each c·log2(c) term is QUANTIZED to 1e-6 units and the
    sum runs over the exact integers (the hopping-window move — float
    summation order can never flip the hash; the residual risk is a
    libm log2 1-ulp difference landing exactly on a .5e-6 boundary)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "hour": (ts // HOUR) % 24, "c": np.int64(1)})
        return df.groupby(["event_type", "hour"], as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"], ["c"],
    )
    rows = []
    for et, g in out.groupby("event_type"):
        c = g["c"].to_numpy(np.int64)
        n = int(c.sum())
        q = round_half_away(
            c.astype(np.float64) * np.log2(c.astype(np.float64)) * 1e6
        ).astype(np.int64)
        h = float(np.log2(float(n))) - (float(int(q.sum())) / 1e6) / n
        rows.append({"event_type": et, "n": np.int64(n),
                     "hours_seen": np.int64(len(c)),
                     "entropy": h})
    df = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    df["entropy"] = round_half_away(df["entropy"].to_numpy(), 6)
    return df



def q_chi2_type_dow(sf_dir: str):
    """Chi-square independence test of event_type × day-of-week — "is
    traffic mix stable across the week?" (the drift alarm a pipeline
    health monitor runs). Day-of-week is computed from epoch days as
    (day+4) % 7 (0=Sunday) on BOTH sides, dodging engine-specific
    calendar functions.

    Distributed as bounded (type × 7) count partials; the driver forms
    the FULL cross grid (absent cells count 0 but still carry expected
    mass) and closes χ² = Σ (O−E)²/E. Each cell term is deterministic
    (integer counts → two correctly-rounded float ops), and the
    cross-cell sum is QUANTIZED to 1e-6 units so summation order can
    never flip the hash (the hopping-window move)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "dow": (ts // DAY + 4) % 7, "c": np.int64(1)})
        return df.groupby(["event_type", "dow"], as_index=False).sum()

    out = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "dow"], ["c"],
    )
    piv = out.pivot_table(index="event_type", columns="dow", values="c",
                          aggfunc="sum", fill_value=0)
    obs = piv.to_numpy(np.int64)
    n = int(obs.sum())
    row_t = obs.sum(axis=1).astype(np.float64)
    col_t = obs.sum(axis=0).astype(np.float64)
    exp = row_t[:, None] * col_t[None, :] / float(n)
    dif = obs.astype(np.float64) - exp
    term = dif * dif / exp
    chi2 = float(int(round_half_away(term * 1e6).astype(np.int64).sum())
                 ) / 1e6
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return pd.DataFrame({
        "n": [np.int64(n)], "dof": [np.int64(dof)],
        "chi2": round_half_away(np.array([chi2]), 6),
    })



def q_daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of daily event value (adjacent rows of the
    day-ordered daily series): the momentum/mean-reversion diagnostic a
    capacity planner reads before trusting tomorrow ≈ today. Pearson r
    over (x_t, x_{t+1}) pairs from INTEGER-EXACT sums m, Σx, Σy, Σxy,
    Σx², Σy² — the oracle's lead() self-pairing closes the identical
    HUGEINT expression tree, so only the final casts/sqrt are float."""
    daily = _daily_value_cents(sf_dir)
    v = daily["x"].to_numpy(np.int64).astype(object)
    x, y = v[:-1], v[1:]
    m = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    num = m * sxy - sx * sy
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    r = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
    return pd.DataFrame({
        "n_pairs": [np.int64(m)],
        "autocorr": round_half_away(np.array([r]), 6),
    })



def q_day_jaccard(sf_dir: str):
    """Day-over-day audience overlap: Jaccard similarity of consecutive
    days' active-user sets — the churn-velocity dial (1.0 = the same
    users every day, →0 = a fully new audience daily). ONE user-bucket
    shuffle co-locates each user's distinct active days; the kernel
    emits CALENDAR-BOUNDED per-day partials (active count + next-day
    intersection count via one sorted diff), and the driver closes
    |A∩B| / (|A|+|B|−|A∩B|) from exact ints."""
    from ...stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        d = g["ts"].astype("int64").to_numpy() // DAY
        dd = pd.DataFrame({"u": u, "d": d}).drop_duplicates()
        u = dd["u"].to_numpy()
        d = dd["d"].to_numpy()
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        nxt = (u[1:] == u[:-1]) & (d[1:] - d[:-1] == 1)
        act = pd.DataFrame({"d": d, "act": np.int64(1),
                            "inter": np.int64(0)})
        itr = pd.DataFrame({"d": d[:-1][nxt], "act": np.int64(0),
                            "inter": np.int64(1)})
        df = pd.concat([act, itr], ignore_index=True)
        return df.groupby("d", as_index=False).sum()

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32).groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["d"], ["act", "inter"],
    ).sort_values("d").reset_index(drop=True)
    a = out["act"].to_numpy(np.int64)
    inter = out["inter"].to_numpy(np.int64)
    # row i pairs day_i with day_i+1 ONLY when they are consecutive
    consec = np.zeros(len(a), dtype=bool)
    consec[:-1] = np.diff(out["d"].to_numpy(np.int64)) == 1
    b = np.roll(a, -1)
    ix = inter[consec]
    un = a[consec] + b[consec] - ix
    return pd.DataFrame({
        "day": out["d"].to_numpy(np.int64)[consec],
        "active": a[consec],
        "next_active": b[consec],
        "intersect": ix,
        "jaccard": round_half_away(ix / un, 6)})



def q_markov2_transitions(sf_dir: str):
    """SECOND-order Markov transitions: for every (prev2, prev1, next)
    trigram of a user's ordered event stream, the count and the
    probability conditioned on the (prev2, prev1) context — the model
    that catches "view→click means purchase, error→click means retry"
    where the first-order matrix (q_event_transitions) can't. Same ONE
    user-bucket shuffle, doubly-shifted compare kernel, and a
    types³-bounded combine (125 cells at any corpus size); the
    conditional is one rounded division from exact ints."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        df = pd.DataFrame({"prev2": et[:-2][same],
                           "prev1": et[1:-1][same],
                           "next_type": et[2:][same]})
        out = df.groupby(["prev2", "prev1", "next_type"],
                         as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["prev2", "prev1", "next_type"], ["n"],
    )
    ctx = out.groupby(["prev2", "prev1"])["n"].transform("sum").to_numpy(
        np.float64)
    df = pd.DataFrame({
        "prev2": out["prev2"], "prev1": out["prev1"],
        "next_type": out["next_type"],
        "n": out["n"].astype(np.int64),
        "p": round_half_away(out["n"].to_numpy(np.float64) / ctx, 6)})
    return df.sort_values(["prev2", "prev1", "next_type"]).reset_index(
        drop=True)



def q_lag_xcorr(sf_dir: str):
    """Lead–lag cross-correlation: Pearson(clicks_t, purchases_{t+L})
    for lags L = 0..7 days — "how many days does a click take to turn
    into a purchase at the aggregate level?". One calendar-bounded
    combine of per-day (click, purchase) counts serves all eight lags;
    each lag's correlation closes from exact integer sums over the
    overlapping day range with the shared deterministic float tree."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t.column("event_type").to_pandas().to_numpy()
        m = (et == "click") | (et == "purchase")
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()[m]
        one = (et[m] == "click").astype(np.int64)
        df = pd.DataFrame({"day": ts // DAY, "clicks": one,
                           "purchases": 1 - one})
        return df.groupby("day", as_index=False).sum()

    daily = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["clicks", "purchases"],
    ).sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(np.int64)
    # reindex onto the dense [min, max] day grid (absent days = 0) so a
    # lag join is a plain array shift on both sides
    lo, hi = int(days.min()), int(days.max())
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    p = np.zeros(hi - lo + 1, dtype=np.int64)
    c[days - lo] = daily["clicks"].to_numpy(np.int64)
    p[days - lo] = daily["purchases"].to_numpy(np.int64)
    rows = []
    for lag in range(8):
        x = c[:len(c) - lag] if lag else c
        y = p[lag:]
        m = len(x)
        xo, yo = x.astype(object), y.astype(object)
        sx, sy = int(xo.sum()), int(yo.sum())
        sxy = int((xo * yo).sum())
        sxx, syy = int((xo * xo).sum()), int((yo * yo).sum())
        num = m * sxy - sx * sy
        vx, vy = m * sxx - sx * sx, m * syy - sy * sy
        r = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
        rows.append({"lag": np.int64(lag), "n_days": np.int64(m),
                     "xcorr": r})
    df = pd.DataFrame(rows)
    df["xcorr"] = round_half_away(df["xcorr"].to_numpy(), 6)
    return df



def q_burstiness(sf_dir: str):
    """Per-event-type burstiness B = (σ−μ)/(σ+μ) of same-user
    inter-event gaps (whole seconds) — the Goh–Barabási measure that
    separates periodic traffic (B→−1) from Poisson (B≈0) from bursty
    human behavior (B→+1). One hash-bucket shuffle puts every user's
    stream in one group (the lag_deltas layout); the kernel lexsorts
    (user, type, ts) once and diffs; gaps then reduce to a
    DOMAIN-BOUNDED (type, gap_s) histogram (distinct whole-second gaps
    ≤ the corpus time span, not data size), so the driver closes exact
    HUGEINT-equivalent Σg/Σg² from unbounded Python ints and B is the
    single float expression both sides evaluate."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events", columns=["user_id", "event_type", "ts"],
             num_blocks=_n_cpus())

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, et, u))
        u, et, ts = u[order], et[order], ts[order]
        same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap_s = (ts[1:] - ts[:-1])[same] // 1_000_000
        df = pd.DataFrame({"event_type": et[1:][same], "gap_s": gap_s,
                           "c": np.int64(1)})
        return df.groupby(["event_type", "gap_s"], as_index=False).sum()

    hist = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(gaps, batch_format="pandas"),
        ["event_type", "gap_s"], ["c"],
    )
    rows = []
    for et, g in hist.groupby("event_type"):
        gs = [int(x) for x in g["gap_s"]]
        cs = [int(x) for x in g["c"]]
        nn = sum(cs)
        sg = sum(c * x for c, x in zip(cs, gs))
        sg2 = sum(c * x * x for c, x in zip(cs, gs))
        sigma = np.sqrt(float(nn * sg2 - sg * sg)) / float(nn)
        mu = float(sg) / float(nn)
        rows.append({"event_type": et, "n_gaps": np.int64(nn),
                     "burstiness": round_half_away(
                         np.array([(sigma - mu) / (sigma + mu)]), 6)[0]})
    if not rows:
        return pd.DataFrame(columns=["event_type", "n_gaps",
                                     "burstiness"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)



def q_ols2_hour_dow(sf_dir: str):
    """Two-feature OLS per event type — value (milliunits) regressed on
    hour-of-day and day-of-week jointly, the multi-regressor step past
    regr_by_type's single slope ("is the weekend effect real once you
    control for hour?"). EXACT: the partial is the nine integer moment
    sums (n, Σh, Σd, Σh², Σd², Σhd, Σv, Σvh, Σvd) per type — a
    5-row combine at any corpus size — and the driver closes the 3×3
    normal equations by CRAMER'S RULE in unbounded Python ints, emitting
    each coefficient as the ×1e6 trunc-div of two determinants (the
    identical HUGEINT cofactor expansion the oracle evaluates; no float,
    no matrix solve)."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts", "value"],
             num_blocks=_n_cpus())
    HOUR, DAY = 3_600_000_000, 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        h = (ts // HOUR) % 24
        d = (ts // DAY + 4) % 7
        v = np.rint(t.column("value").to_numpy() * 1000).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "n": np.int64(1), "sh": h, "sd": d, "shh": h * h,
            "sdd": d * d, "shd": h * d, "sv": v, "svh": v * h,
            "svd": v * d})
        return df.groupby("event_type", as_index=False).sum()

    mom = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        ["n", "sh", "sd", "shh", "sdd", "shd", "sv", "svh", "svd"],
    )
    rows = []
    for _, r in mom.iterrows():
        n, sh, sd = int(r["n"]), int(r["sh"]), int(r["sd"])
        shh, sdd, shd = int(r["shh"]), int(r["sdd"]), int(r["shd"])
        sv, svh, svd = int(r["sv"]), int(r["svh"]), int(r["svd"])
        det = (n * (shh * sdd - shd * shd)
               - sh * (sh * sdd - shd * sd)
               + sd * (sh * shd - shh * sd))
        det0 = (sv * (shh * sdd - shd * shd)
                - sh * (svh * sdd - shd * svd)
                + sd * (svh * shd - shh * svd))
        det1 = (n * (svh * sdd - shd * svd)
                - sv * (sh * sdd - shd * sd)
                + sd * (sh * svd - svh * sd))
        det2 = (n * (shh * svd - svh * shd)
                - sh * (sh * svd - svh * sd)
                + sv * (sh * shd - shh * sd))
        rows.append({
            "event_type": r["event_type"], "n": np.int64(n),
            "b0_6": np.int64(_tdiv(10**6 * det0, det)),
            "b_hour6": np.int64(_tdiv(10**6 * det1, det)),
            "b_dow6": np.int64(_tdiv(10**6 * det2, det))})
    if not rows:
        return pd.DataFrame(
            columns=["event_type", "n", "b0_6", "b_hour6", "b_dow6"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)



def q_type_hour_cosine(sf_dir: str):
    """Pairwise cosine similarity between event types' 24-hour activity
    profiles — "which behaviors share a daily rhythm?" (the profile-
    space companion to type_affinity's co-user lift). The partial is
    the bounded (type × 24) count grid; every pair closes as the EXACT
    integer cos²×1e6 = (a·b)²·1e6 // (‖a‖²‖b‖²) — the squared-cosine
    trick that avoids both sqrts (dot products of counts are
    non-negative, so no sign is lost). Unbounded Python ints, no
    float."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "h": (ts // HOUR) % 24,
            "c": np.int64(1)})
        return df.groupby(["event_type", "h"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"], ["c"],
    )
    prof = {}
    for et, g in grid.groupby("event_type"):
        v = np.zeros(24, dtype=np.int64)
        v[g["h"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        prof[et] = v
    ets = sorted(prof)
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            # 24-term python-int dots: immune to int64 overflow at any
            # corpus size (counts can exceed 3e9 per cell at 100 TB)
            dot = sum(int(x) * int(y)
                      for x, y in zip(prof[a], prof[b]))
            na = sum(int(x) * int(x) for x in prof[a])
            nb = sum(int(x) * int(x) for x in prof[b])
            rows.append({
                "type_a": a, "type_b": b,
                "cos2_6": np.int64((dot * dot * 10**6) // (na * nb))})
    if not rows:
        return pd.DataFrame(columns=["type_a", "type_b", "cos2_6"])
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]
                                          ).reset_index(drop=True)



def q_dow_seasonality(sf_dir: str):
    """Day-of-week seasonal index of event activity and spend: per dow,
    count share and value share ×7 (so a flat week reads 1e6 across the
    board) — the calendar-shape screen a capacity planner reads before
    trusting any daily forecast. One bounded (dow) partial; the indices
    close as exact integer floors (count_d·7·1e6 // N and
    sum3_d·7·1e6 // S3)."""
    ev = _pq(sf_dir, "events", columns=["ts", "value"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "dow": (ts // DAY + 4) % 7,
            "c": np.int64(1),
            "s3": np.rint(t.column("value").to_numpy() * 1000
                          ).astype(np.int64)})
        return df.groupby("dow", as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["dow"], ["c", "s3"],
    ).sort_values("dow")
    N, S = int(g["c"].sum()), int(g["s3"].sum())
    return pd.DataFrame({
        "dow": g["dow"].to_numpy(np.int64),
        "n": g["c"].to_numpy(np.int64),
        "cnt_idx6": np.array([int(c) * 7 * 10**6 // N
                              for c in g["c"]], np.int64),
        "val_idx6": np.array([int(s) * 7 * 10**6 // S
                              for s in g["s3"]], np.int64),
    }).reset_index(drop=True)



def q_peak_hour_share(sf_dir: str):
    """Peak activity hour per event type and the share of traffic it
    carries (×1e6) — the load-concentration number a capacity planner
    pairs with dow_seasonality (ties break to the earlier hour on both
    sides). Bounded (type × 24) partial; exact integer close."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "h": (ts // HOUR) % 24, "c": np.int64(1)})
        return df.groupby(["event_type", "h"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"], ["c"],
    )
    rows = []
    for et, g in grid.groupby("event_type"):
        g = g.sort_values(["c", "h"], ascending=[False, True])
        n = int(g["c"].sum())
        rows.append({
            "event_type": et,
            "peak_hour": np.int64(g["h"].iloc[0]),
            "n": np.int64(n),
            "peak_share6": np.int64(int(g["c"].iloc[0]) * 10**6 // n)})
    if not rows:
        return pd.DataFrame(columns=["event_type", "peak_hour", "n",
                                     "peak_share6"])
    return pd.DataFrame(rows).sort_values("event_type"
                                          ).reset_index(drop=True)



def q_new_vs_returning(sf_dir: str):
    """Monthly revenue split between NEW customers (first-ever order
    that month) and returning ones — the growth-quality decomposition
    behind ltv_cohorts ("is revenue growth acquisition or retention?").
    Per-customer first month comes from one pre-reduced groupby-min
    (batch partials compact the stream before the shuffle); it attaches
    to the order scan via the broadcast map (hash-join fallback past
    the cap) and the CALENDAR-bounded (month, new?) partial closes with
    exact cents and integer-floor shares."""
    parts = _shuffle_partitions(_row_count(sf_dir, "orders"))
    orders = _pq(sf_dir, "orders",
                 columns=["o_custkey", "o_orderdate", "o_totalprice"],
                 num_blocks=parts)

    def to_cm(t: pa.Table) -> pa.Table:
        m = (t.column("o_orderdate").to_numpy(zero_copy_only=False)
             .astype("datetime64[M]").astype(np.int64))
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        return pa.table({
            "ck": t.column("o_custkey"),
            "m": pa.array(m, pa.int64()),
            "cents": pa.array(cents, pa.int64())})

    fact = orders.map_batches(to_cm, batch_format="pyarrow")
    def first_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"ck": t.column("ck").to_numpy(zero_copy_only=False),
             "m": t.column("m").to_numpy(zero_copy_only=False)}
        ).groupby("ck", as_index=False).min()
        # Arrow block out (pandas blocks cost the downstream
        # sort-groupby 13x — see never_ordered_parts)
        return pa.table({
            "ck": pa.array(df["ck"].to_numpy(np.int64), pa.int64()),
            "m": pa.array(df["m"].to_numpy(np.int64), pa.int64())})

    firsts = (
        fact.map_batches(first_partial, batch_format="pyarrow")
        .groupby("ck").min("m")
        .map_batches(
            lambda t: pa.table({
                "ck": t.column("ck"),
                "fm": pc.cast(t.column("min(m)"), pa.int64())}),
            batch_format="pyarrow")
    )
    attached = _broadcast_fact_attach(fact, firsts, "ck", "ck", ["fm"])
    if attached is None:  # distributed hash join past the cap
        attached = fact.join(
            firsts.map_batches(
                lambda t: t.rename_columns(["ck2", "fm"]),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=parts,
            on=("ck",), right_on=("ck2",))

    def partial(t: pa.Table) -> pd.DataFrame:
        m = t.column("m").to_numpy(zero_copy_only=False)
        new = (m == t.column("fm").to_numpy(zero_copy_only=False)
               ).astype(np.int64)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "month": m, "n_new": new, "n_ret": 1 - new,
            "new_cents": np.where(new == 1, cents, 0),
            "ret_cents": np.where(new == 0, cents, 0),
        }).groupby("month", as_index=False).sum()

    g = _combine_partials(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["month"], ["n_new", "n_ret", "new_cents", "ret_cents"],
    ).sort_values("month")
    return pd.DataFrame({
        "month": g["month"].to_numpy(np.int64),
        "n_new": g["n_new"].to_numpy(np.int64),
        "n_ret": g["n_ret"].to_numpy(np.int64),
        "new_cents": g["new_cents"].to_numpy(np.int64),
        "ret_cents": g["ret_cents"].to_numpy(np.int64),
        "new_share6": np.array(
            [int(a) * 10**6 // (int(a) + int(b)) for a, b in
             zip(g["new_cents"], g["ret_cents"])], np.int64),
    }).reset_index(drop=True)



def q_type_hour_ruzicka(sf_dir: str):
    """Weighted (Ruzicka) Jaccard between event types' 24-hour count
    profiles — Σmin/Σmax over aligned hours, the magnitude-aware
    companion to type_hour_cosine (cosine forgives scale; Ruzicka
    punishes a type that is 10× busier at the same hours). Bounded
    (type × 24) partial; every pair closes as exact integer
    Σmin·1e6 // Σmax."""
    ev = _pq(sf_dir, "events", columns=["event_type", "ts"],
             num_blocks=_n_cpus())
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().to_numpy(),
            "h": (ts // HOUR) % 24, "c": np.int64(1)})
        return df.groupby(["event_type", "h"], as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"], ["c"],
    )
    prof = {}
    for et, g in grid.groupby("event_type"):
        v = np.zeros(24, dtype=np.int64)
        v[g["h"].to_numpy(np.int64)] = g["c"].to_numpy(np.int64)
        prof[et] = v
    ets = sorted(prof)
    rows = []
    for i, a in enumerate(ets):
        for b in ets[i + 1:]:
            smin = int(np.minimum(prof[a], prof[b]).sum())
            smax = int(np.maximum(prof[a], prof[b]).sum())
            rows.append({
                "type_a": a, "type_b": b, "n_min": np.int64(smin),
                "ruz6": np.int64(smin * 10**6 // smax if smax else 0)})
    if not rows:
        return pd.DataFrame(columns=["type_a", "type_b", "n_min",
                                     "ruz6"])
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]
                                          ).reset_index(drop=True)



def q_gap_fill_ffill(sf_dir: str):
    """Calendar densification + forward fill of the daily revenue
    series: every day in [min, max] gets a row, missing days carry the
    last observed value and a was_missing flag — the gap-repair step
    every downstream forecaster assumes has already happened
    (missing_days finds the holes; this closes them). Daily cents are
    the shared calendar-bounded combine; the spine + fill is one driver
    cumsum-index trick over ≤ a few thousand rows at any corpus
    size."""
    o = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"],
            num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        d = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy() // DAY
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        return pd.DataFrame({"day": d, "cents": cents}
                            ).groupby("day", as_index=False).sum()

    g = _combine_partials(
        o.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["cents"],
    ).sort_values("day")
    days = g["day"].to_numpy(np.int64)
    cents = g["cents"].to_numpy(np.int64)
    spine = np.arange(days[0], days[-1] + 1, dtype=np.int64)
    idx = np.searchsorted(days, spine, side="right") - 1
    return pd.DataFrame({
        "day": spine,
        "rev_cents": cents[idx],
        "was_missing": (~np.isin(spine, days)).astype(np.int64)})



def q_dow_adjusted_anomalies(sf_dir: str):
    """Top-10 anomaly days after removing the weekday effect: daily
    event counts are rescaled by the dow_seasonality index
    (adj = n·1e6 // idx6(dow)), so a busy Saturday no longer reads as
    an anomaly just for being Saturday. Calendar-bounded (day) and
    (dow) combines; adjusted scores are exact integer floors; top-10
    by adj desc, day asc — fully deterministic."""
    ev = _pq(sf_dir, "events", columns=["ts"], num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        d = pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY
        return pd.DataFrame({"day": d, "n": np.int64(1)}
                            ).groupby("day", as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["day"], ["n"],
    ).sort_values("day")
    day = g["day"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    N = int(n.sum())
    dow = (day + 4) % 7
    dsum = np.zeros(7, np.int64)
    np.add.at(dsum, dow, n)
    idx6 = np.array([int(s) * 7 * 10**6 // N for s in dsum], np.int64)
    adj = np.array([int(c) * 10**6 // int(idx6[w]) if idx6[w] else 0
                    for c, w in zip(n, dow)], np.int64)
    out = pd.DataFrame({"day": day, "n": n, "adj": adj})
    out = out.sort_values(["adj", "day"],
                          ascending=[False, True]).head(10)
    return out.reset_index(drop=True)



def q_qq_click_purchase(sf_dir: str):
    """Q–Q table between the click and purchase value distributions:
    PERCENTILE_DISC-exact quantiles of BOTH at p = 5%..95% step 5 —
    the distribution-shape comparison behind ks_test's single number
    ("purchases aren't just shifted clicks, their tail bends here").
    Both quantile sets close from ONE value-domain-bounded histogram
    pass; ranks are pure integer ⌈p·n⌉ arithmetic."""
    ev = _pq(sf_dir, "events", columns=["event_type", "value"],
             num_blocks=_n_cpus())

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t.column("event_type").to_pandas().to_numpy()
        m = (et == "click") | (et == "purchase")
        v3 = np.rint(t.column("value").to_numpy()[m] * 1000
                     ).astype(np.int64)
        return pd.DataFrame({"event_type": et[m], "v": v3,
                             "c": np.int64(1)}
                            ).groupby(["event_type", "v"],
                                      as_index=False).sum()

    grid = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "v"], ["c"],
    )

    def quantiles(g: pd.DataFrame) -> dict[int, int]:
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        n = int(cum[-1])
        out = {}
        for p in range(5, 100, 5):
            r = (p * n + 99) // 100  # ⌈p·n/100⌉
            out[p] = int(v[np.searchsorted(cum, r, side="left")])
        return out

    qc = quantiles(grid[grid["event_type"] == "click"])
    qp = quantiles(grid[grid["event_type"] == "purchase"])
    ps = list(range(5, 100, 5))
    return pd.DataFrame({
        "p": np.array(ps, np.int64),
        "click_v3": np.array([qc[p] for p in ps], np.int64),
        "purchase_v3": np.array([qp[p] for p in ps], np.int64)})



def q_power_users(sf_dir: str):
    """Power-user census: of the users active in the corpus' final 4
    ISO weeks, how many were active in EVERY one of them — the
    habit-formation number stickiness's DAU/WAU ratio only hints at.
    Distinct (user, week) pairs pre-reduce per batch; one user-hash
    bucket groupby counts distinct final-window weeks per user; the
    close is a 2-counter combine. The week horizon comes from one
    scalar max partial."""
    from ...stages.temporal import _with_bucket

    WEEK = 7 * 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def mx(t: pa.Table) -> pd.DataFrame:
        w = (pc.cast(t.column("ts"), pa.int64()).to_numpy()
             + 3 * 86_400_000_000) // WEEK  # Monday-aligned weeks
        return pd.DataFrame({"k": [np.int64(0)],
                             "mx": [np.int64(w.max())]}) if len(w) else \
            pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "mx": pd.Series([], dtype=np.int64)})

    last_w = int(pd.concat(
        list(ev.map_batches(mx, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)["mx"].max())
    lo_w = last_w - 3

    def keep(t: pa.Table) -> pa.Table:
        w = (pc.cast(t.column("ts"), pa.int64()).to_numpy()
             + 3 * 86_400_000_000) // WEEK
        m = w >= lo_w
        return pa.table({
            "user_id": pa.array(
                t.column("user_id").to_numpy(zero_copy_only=False)[m],
                pa.int64()),
            "week": pa.array(w[m], pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "week"]].drop_duplicates()
        per = d.groupby("user_id").size()
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_active": [np.int64(len(per))],
            "n_power": [np.int64(int((per == 4).sum()))]})

    g = _combine_partials(
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_active", "n_power"],
    )
    n_active = int(g["n_active"].sum())
    n_power = int(g["n_power"].sum())
    return pd.DataFrame({
        "n_active": [np.int64(n_active)],
        "n_power": [np.int64(n_power)],
        "power_share6": [np.int64(n_power * 10**6 // n_active
                                  if n_active else 0)]})



def q_seasonality_strength(sf_dir: str):
    """Exact weekly-seasonality strength (one-way eta-squared of daily
    event counts grouped by position-in-week) over the corpus' complete
    weeks — the single number that says how much of daily-volume
    variance the weekly cycle explains (0 = flat, 1e6 = perfectly
    periodic), computed BEFORE anyone trusts a dow-adjusted forecast.

    Restricting to whole weeks from the first event day makes every
    group the same size W, so eta² = (7·ΣS_g² − T²)/(7W·Q − T²) closes
    in EXACT unbounded-int arithmetic (missing days count as zero days
    via the sums — they never need rows). One day-bounded count
    partial; everything else is driver integer math."""
    ev = _pq(sf_dir, "events", columns=["ts"], num_blocks=_n_cpus())
    DAY = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        day = pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY
        df = pd.DataFrame({"day": day, "n": np.int64(1)})
        return df.groupby("day", as_index=False).sum()

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"), ["day"], ["n"])
    if g is None or not len(g):  # pragma: no cover - empty events
        return pd.DataFrame({"n_weeks": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64),
                             "eta2_6": pd.Series([], dtype=np.int64)})
    g = g.sort_values("day").reset_index(drop=True)
    days = g["day"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    d0 = int(days.min())
    W = (int(days.max()) - d0 + 1) // 7
    m = days < d0 + 7 * W
    days, cnt = days[m], cnt[m]
    s_g = [0] * 7
    T = 0
    Q = 0
    for dd, cc in zip(days.tolist(), cnt.tolist()):
        s_g[(dd - d0) % 7] += cc
        T += cc
        Q += cc * cc
    num = 7 * sum(x * x for x in s_g) - T * T
    den = 7 * W * Q - T * T
    eta = num * 10**6 // den if den > 0 else 0
    return pd.DataFrame({"n_weeks": [np.int64(W)],
                         "n_events": [np.int64(T)],
                         "eta2_6": [np.int64(eta)]})



def q_timed_funnel(sf_dir: str):
    """Time-constrained conversion funnel: users with a view → click
    within 1 HOUR → purchase within 24 HOURS of that click — the
    attribution-grade funnel (funnel_users' ordered-subsequence check
    says 'eventually'; marketing windows say 'within the session').

    One user-hash bucket shuffle; the bucket kernel packs every user's
    events onto one number line (user_rank × BIG + relative_ts, BIG >
    bucket time span + both windows, so windows can never cross a user
    boundary) and closes all three stages with FOUR global
    searchsorteds — no per-user Python. Bound: user_rank × BIG must fit
    int64, i.e. ~3e5 users per bucket at multi-year µs spans — raise
    num_buckets with corpus size (the shuffle key, not the kernel, is
    the scale lever). Exact-count close; integer-floor share."""
    from ...stages.temporal import _with_bucket

    HOUR = 3_600_000_000
    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "event_type", "ts"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.is_in(
            t.column("event_type"),
            pa.array(["view", "click", "purchase"])))
        et = t2.column("event_type").to_numpy(zero_copy_only=False)
        kind = np.zeros(len(t2), np.int8)
        kind[et == "click"] = 1
        kind[et == "purchase"] = 2
        return pa.table({
            "user_id": t2.column("user_id"),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "kind": pa.array(kind, pa.int8())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        kind = g["kind"].to_numpy()
        _, inv = np.unique(uid, return_inverse=True)
        rel = ts - ts.min()
        big = int(rel.max()) + 2 * DAY + HOUR + 10
        # loud failure instead of silent int64 wrap: raise num_buckets
        # if a bucket ever packs more users x span than 2^62
        assert int(inv.max() if len(inv) else 0) * big < 2**62
        key = inv.astype(np.int64) * big + rel
        v = np.sort(key[kind == 0])
        c = np.sort(key[kind == 1])
        p = np.sort(key[kind == 2])
        has_v = np.searchsorted(v, c) > np.searchsorted(v, c - HOUR)
        cg = c[has_v]
        conv = cg[np.searchsorted(p, cg + DAY, side="right")
                  > np.searchsorted(p, cg, side="right")]
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_users": [np.int64(len(np.unique(key[kind == 0] // big)))],
            "n_conv": [np.int64(len(np.unique(conv // big)))]})

    g = _combine_partials(
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_users", "n_conv"])
    nb = int(g["n_users"].sum())
    nc = int(g["n_conv"].sum())
    return pd.DataFrame({
        "n_users": [np.int64(nb)],
        "n_converted": [np.int64(nc)],
        "conv_share6": [np.int64(nc * 10**6 // nb if nb else 0)]})



def q_click_value_uplift(sf_dir: str):
    """Click-attribution value split: purchases WITH a click in the
    preceding hour (same user) vs without, with exact mean purchase
    values — the first number an attribution discussion reaches for
    ('do clicked purchases actually spend more?').

    Same packed-number-line kernel as timed_funnel (user_rank × BIG +
    relative_ts, one global searchsorted instead of per-user windows);
    purchase values ride along in milli-units so each bucket emits two
    (n, sum3) partials and the means close as integer floors."""
    from ...stages.temporal import _with_bucket

    HOUR = 3_600_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "event_type", "ts",
                                        "value"],
             num_blocks=_n_cpus())

    def keep(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.is_in(t.column("event_type"),
                               pa.array(["click", "purchase"])))
        et = t2.column("event_type").to_numpy(zero_copy_only=False)
        v3 = np.rint(t2.column("value").to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return pa.table({
            "user_id": t2.column("user_id"),
            "ts": pc.cast(t2.column("ts"), pa.int64()),
            "is_p": pa.array(et == "purchase"),
            "v3": pa.array(v3, pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        isp = g["is_p"].to_numpy(bool)
        v3 = g["v3"].to_numpy(np.int64)
        _, inv = np.unique(uid, return_inverse=True)
        rel = ts - ts.min()
        big = int(rel.max()) + 2 * HOUR + 10
        assert int(inv.max() if len(inv) else 0) * big < 2**62
        key = inv.astype(np.int64) * big + rel
        c = np.sort(key[~isp])
        pk = key[isp]
        pv = v3[isp]
        clicked = (np.searchsorted(c, pk)
                   > np.searchsorted(c, pk - HOUR))
        return pd.DataFrame({
            "k": [np.int64(0)],
            "n_clicked": [np.int64(int(clicked.sum()))],
            "sum3_clicked": [np.int64(int(pv[clicked].sum()))],
            "n_bare": [np.int64(int((~clicked).sum()))],
            "sum3_bare": [np.int64(int(pv[~clicked].sum()))]})

    g = _combine_partials(
        _with_bucket(ev.map_batches(keep, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["k"], ["n_clicked", "sum3_clicked", "n_bare", "sum3_bare"])
    rows = []
    for label, n, s3 in (
        ("clicked", int(g["n_clicked"].sum()),
         int(g["sum3_clicked"].sum())),
        ("bare", int(g["n_bare"].sum()), int(g["sum3_bare"].sum())),
    ):
        rows.append({"cohort": label, "n_purchases": n,
                     "mean6": s3 * 1000 // n if n else 0})
    out = pd.DataFrame(rows, columns=["cohort", "n_purchases", "mean6"])
    return out.astype({"n_purchases": np.int64, "mean6": np.int64})





def q_hour_dow_heatmap(sf_dir: str):
    """The 168-cell (day-of-week × hour) activity heatmap with exact
    mean event values — the ops view behind dow_seasonality and
    events_hourly combined: WHERE in the week the load and the spend
    actually sit. One calendar-bounded (≤168 cells) count partial;
    integer-floor means in micro-units."""
    ev = _pq(sf_dir, "events", columns=["ts", "value"],
             num_blocks=_n_cpus())
    DAY = 86_400_000_000
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        v3 = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                     * 1000).astype(np.int64)
        return (pd.DataFrame({
            "dow": (ts // DAY + 4) % 7,
            "hour": (ts % DAY) // HOUR,
            "n_events": np.int64(1), "sum3": v3})
            .groupby(["dow", "hour"], as_index=False).sum())

    g = _combine_partials(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["dow", "hour"], ["n_events", "sum3"])
    g = g.sort_values(["dow", "hour"]).reset_index(drop=True)
    g["mean6"] = (g["sum3"].astype(np.int64) * 1000
                  // g["n_events"].astype(np.int64))
    return g.astype({"dow": np.int64, "hour": np.int64,
                     "n_events": np.int64, "sum3": np.int64,
                     "mean6": np.int64})



def q_transition_lift(sf_dir: str):
    """Sequence-mining lift on the user transition matrix: for every
    (prev, next) event pair, observed transitions vs the independence
    expectation — lift6 = n·N·1e6 // (row_n·col_n), the integer-exact
    'is this sequence real or just marginals' screen that the raw
    Markov probabilities (event_transitions) can't answer. Same ONE
    user-bucket shuffle + shifted-compare kernel; the lift closes on
    the types²-bounded grid with pure integer arithmetic."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = u[1:] == u[:-1]
        df = pd.DataFrame({"prev_type": et[:-1][same],
                           "next_type": et[1:][same]})
        out = df.groupby(["prev_type", "next_type"],
                         as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["prev_type", "next_type"], ["n"])
    N = int(out["n"].sum())
    row = out.groupby("prev_type")["n"].transform("sum")
    col = out.groupby("next_type")["n"].transform("sum")
    out["lift6"] = [int(n) * N * 10**6 // (int(r) * int(c))
                    for n, r, c in zip(out["n"], row, col)]
    out = out.sort_values(["prev_type", "next_type"]).reset_index(
        drop=True)
    return out.astype({"n": np.int64, "lift6": np.int64})[
        ["prev_type", "next_type", "n", "lift6"]]



def q_session_conversion(sf_dir: str):
    """Session-outcome analytics: conversion rate by session size — of
    the 6-hour-gap sessions with k events, how many contain a purchase
    (the 'do longer sessions convert' curve product teams actually
    plot; sessionize alone reports shape, not outcome). ONE user-hash
    bucket shuffle; the kernel segments sessions with a shifted
    compare + cumsum (no per-session Python) and emits size-bucket
    partials (1..5, 6-10, 11+); integer-floor shares."""
    from ...stages.temporal import _with_bucket

    GAP = 21_600_000_000
    ev = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        ts = g["ts"].astype("int64").to_numpy()[order]
        isp = (g["event_type"].to_numpy()[order] == "purchase")
        brk = np.ones(len(u), dtype=np.int64)
        if len(u) > 1:
            brk[1:] = ((u[1:] != u[:-1])
                       | (ts[1:] - ts[:-1] > GAP)).astype(np.int64)
        sid = np.cumsum(brk) - 1
        n_sess = int(sid[-1]) + 1 if len(sid) else 0
        n = np.bincount(sid, minlength=n_sess)
        conv = np.bincount(sid[isp], minlength=n_sess) > 0
        bkt = np.where(n <= 5, n, np.where(n <= 10, 6, 7))
        return (pd.DataFrame({"size_bucket": bkt.astype(np.int64),
                              "n_sessions": np.int64(1),
                              "n_converting": conv.astype(np.int64)})
                .groupby("size_bucket", as_index=False).sum())

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["size_bucket"], ["n_sessions", "n_converting"])
    g = g.sort_values("size_bucket").reset_index(drop=True)
    g["conv_share6"] = (g["n_converting"].astype(np.int64) * 10**6
                        // g["n_sessions"].astype(np.int64))
    return g.astype({"size_bucket": np.int64, "n_sessions": np.int64,
                     "n_converting": np.int64, "conv_share6": np.int64})



def q_user_lifespan_hist(sf_dir: str):
    """User lifetime-span census: days between each user's first and
    last event, bucketed (0 same-day, 1-7, 8-30, 31-90, 91+) — the
    engagement-duration histogram behind retention_cohorts' monthly
    view. Per-batch (user → min/max ts) pre-reduce in ARROW blocks,
    one user-hash bucket groupby closes the extrema exactly, and the
    bucket kernel emits 5-cell partials."""
    from ...stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def pre(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        u, inv = np.unique(uid, return_inverse=True)
        mn = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, inv, ts)
        np.maximum.at(mx, inv, ts)
        return pa.table({
            "user_id": pa.array(u.astype(np.int64), pa.int64()),
            "mn": pa.array(mn, pa.int64()),
            "mx": pa.array(mx, pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("user_id", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"))
        span = ((agg["mx"].to_numpy(np.int64) // DAY)
                - (agg["mn"].to_numpy(np.int64) // DAY))
        bkt = np.select(
            [span == 0, span <= 7, span <= 30, span <= 90],
            [0, 1, 2, 3], default=4)
        return (pd.DataFrame({"span_bucket": bkt.astype(np.int64),
                              "n_users": np.int64(1)})
                .groupby("span_bucket", as_index=False).sum())

    g = _combine_partials(
        _with_bucket(ev.map_batches(pre, batch_format="pyarrow"),
                     "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["span_bucket"], ["n_users"])
    g = g.sort_values("span_bucket").reset_index(drop=True)
    tot = int(g["n_users"].sum())
    g["user_share6"] = (g["n_users"].astype(np.int64) * 10**6 // tot)
    return g.astype({"span_bucket": np.int64, "n_users": np.int64,
                     "user_share6": np.int64})



def q_markov_entropy(sf_dir: str):
    """Behavioral predictability: the conditional entropy H(next|prev)
    of the user event-transition process in bits — the single number
    that says how far any next-event predictor can possibly get
    (transition_lift shows WHICH pairs deviate; this is how much
    structure there is at all). Same one-shuffle transition grid; the
    entropy closes on the driver over ≤ types² cells with round-6
    doubles (identical operand expressions on both sides, the
    hour_entropy convention)."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g["event_id"].to_numpy(np.int64),
            g["ts"].astype("int64").to_numpy(),
            g["user_id"].to_numpy(np.int64),
        ))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = u[1:] == u[:-1]
        df = pd.DataFrame({"prev_type": et[:-1][same],
                           "next_type": et[1:][same]})
        out = df.groupby(["prev_type", "next_type"],
                         as_index=False).size()
        return out.rename(columns={"size": "n"})

    out = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas"),
        ["prev_type", "next_type"], ["n"])
    N = int(out["n"].sum())
    row = out.groupby("prev_type")["n"].transform("sum")
    p_joint = out["n"].to_numpy(np.float64) / float(N)
    p_cond = out["n"].to_numpy(np.float64) / row.to_numpy(np.float64)
    h = float(-(p_joint * np.log2(p_cond)).sum())
    return pd.DataFrame({
        "n_transitions": [np.int64(N)],
        "h_cond_bits": [round_half_away(np.array([h]), 6)[0]]})



def q_activity_spikes(sf_dir: str):
    """Burst shortlist: the 20 hottest (user, day) cells by event count
    (ties to smaller user then earlier day) — the review queue a
    rate-limit/abuse screen opens first, complementing burstiness'
    per-user dispersion score with the actual incidents. Per-batch
    (user, day) pre-reduce, one pair-bucket groupby makes counts
    exact, per-block partial top-20 bounds the gather to blocks × 20."""
    from ...stages.temporal import _with_bucket

    DAY = 86_400_000_000
    ev = _pq(sf_dir, "events", columns=["user_id", "ts"],
             num_blocks=_n_cpus())

    def pre(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "day": pc.cast(t.column("ts"), pa.int64()).to_numpy() // DAY,
            "n": np.int64(1)})
            .groupby(["user_id", "day"], as_index=False).sum())
        return pa.table({
            "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
            "day": pa.array(df["day"].to_numpy(np.int64)),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "__key": pa.array(
                df["user_id"].to_numpy(np.int64) * 100003
                + df["day"].to_numpy(np.int64), pa.int64())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["user_id", "day"], as_index=False)["n"].sum())
        top = agg.sort_values(["n", "user_id", "day"],
                              ascending=[False, True, True]).head(20)
        return top

    parts = pd.concat(
        list(_with_bucket(ev.map_batches(pre, batch_format="pyarrow"),
                          "__key", 32)
             .groupby("__bucket").map_groups(kernel,
                                             batch_format="pandas")
             .iter_batches(batch_size=65536, batch_format="pandas")),
        ignore_index=True)
    out = parts.sort_values(["n", "user_id", "day"],
                            ascending=[False, True, True]).head(20)
    return out.reset_index(drop=True).astype(
        {"user_id": np.int64, "day": np.int64, "n": np.int64})[
        ["user_id", "day", "n"]]



def q_entry_event_mix(sf_dir: str):
    """Entry-point mix: each user's FIRST event type (pinned (ts,
    event_id) order) as a census with shares — the acquisition-surface
    view user_paths' full journeys bury (what share of users enter
    through a view vs a search vs a direct purchase). One user-bucket
    shuffle; first-of-segment kernel; type-bounded combine."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["ts"].astype("int64").to_numpy(),
                            g["user_id"].to_numpy(np.int64)))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        vc = pd.Series(et[first]).value_counts()
        return pd.DataFrame({"entry_type": vc.index.to_numpy(object),
                             "n_users": vc.to_numpy(np.int64)})

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["entry_type"], ["n_users"])
    g = g.sort_values("entry_type").reset_index(drop=True)
    tot = int(g["n_users"].sum())
    g["user_share6"] = (g["n_users"].astype(np.int64) * 10**6 // tot)
    return g.astype({"n_users": np.int64, "user_share6": np.int64})



def q_exit_event_mix(sf_dir: str):
    """Exit-point mix: each user's LAST event type — entry_event_mix's
    churn-side mirror (a corpus whose journeys end on views, not
    purchases, has a conversion leak; one that ends on purchases has
    healthy session closure). Same kernel, last-of-segment."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["ts"].astype("int64").to_numpy(),
                            g["user_id"].to_numpy(np.int64)))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = u[1:] != u[:-1]
        vc = pd.Series(et[last]).value_counts()
        return pd.DataFrame({"exit_type": vc.index.to_numpy(object),
                             "n_users": vc.to_numpy(np.int64)})

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["exit_type"], ["n_users"])
    g = g.sort_values("exit_type").reset_index(drop=True)
    tot = int(g["n_users"].sum())
    g["user_share6"] = (g["n_users"].astype(np.int64) * 10**6 // tot)
    return g.astype({"n_users": np.int64, "user_share6": np.int64})



def q_value_by_entry_type(sf_dir: str):
    """Acquisition-surface value: users grouped by their ENTRY event
    type, with each group's purchase-value total and exact mean per
    user — the census that prices an acquisition channel
    (entry_event_mix counts heads; this weighs wallets). One bucket
    kernel computes first-type AND per-user purchase milli-sums in the
    same pass; type-bounded combine; integer-floor means."""
    from ...stages.temporal import _with_bucket

    ev = _pq(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type",
                      "value"],
             num_blocks=_n_cpus())

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(np.int64),
                            g["ts"].astype("int64").to_numpy(),
                            g["user_id"].to_numpy(np.int64)))
        u = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        v3 = np.rint(g["value"].to_numpy(np.float64)[order]
                     * 1000).astype(np.int64)
        isp = et == "purchase"
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        seg = np.cumsum(first) - 1
        n_seg = int(seg[-1]) + 1 if len(seg) else 0
        psum = np.zeros(n_seg, dtype=np.int64)
        np.add.at(psum, seg[isp], v3[isp])
        df = pd.DataFrame({"entry_type": et[first],
                           "n_users": np.int64(1), "sum3": psum})
        return df.groupby("entry_type", as_index=False).sum()

    g = _combine_partials(
        _with_bucket(ev, "user_id", 32)
        .groupby("__bucket").map_groups(kernel, batch_format="pandas"),
        ["entry_type"], ["n_users", "sum3"])
    g = g.sort_values("entry_type").reset_index(drop=True)
    g["mean_per_user6"] = (g["sum3"].astype(np.int64) * 1000
                           // g["n_users"].astype(np.int64))
    return g.astype({"n_users": np.int64, "sum3": np.int64,
                     "mean_per_user6": np.int64})[
        ["entry_type", "n_users", "sum3", "mean_per_user6"]]
