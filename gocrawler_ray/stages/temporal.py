"""Temporal operators: gap-based session windows, a backward as-of
join, hopping (sliding) window aggregates, an interval/range join, and
the per-key window functions (cumulative ``running_total``, LAG-style
``lag_deltas``) — custom operators the Dataset API lacks, composed from
one hash shuffle + vectorized group kernels.

Both use the HASH-BUCKET CO-LOCATION pattern: rows get a
``bucket = siphash(key) % P`` column, ``groupby("__bucket")`` co-locates
every key's rows whole (P coarse groups, not one group per key), and the
group function processes MANY keys per invocation with numpy/pandas
kernels — so there is exactly one shuffle, no per-key Python dispatch
(``map_groups`` costs ~1ms of Python per GROUP: keying the groupby by
user would pay that per USER), and no cross-block boundary stitching
(sessions/joins never straddle buckets because a key's rows never do).

Partitioning assumption (documented per the custom-operator contract):
the heaviest single KEY must fit one task's memory — inherent to any
per-key temporal semantics; bucket count ``P`` only balances keys
ACROSS tasks. The reference has no temporal ops; these cover the
training-data-pipeline side (event sessionization, point-in-time feature
joins) of the brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ..functions.numeric import round_half_away


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow schema (pandas-block datasets report
    a PandasBlockSchema of numpy dtypes — map those through
    ``pa.from_numpy_dtype``; object dtype degrades to string)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, dt in zip(base.names, base.types):
        try:
            t = pa.from_numpy_dtype(dt)
        except (pa.ArrowNotImplementedError, TypeError):
            t = pa.string()
        fields.append(pa.field(name, t))
    return pa.schema(fields)


def _with_bucket(ds: rd.Dataset, key_col: str, num_buckets: int) -> rd.Dataset:
    def add(t: pa.Table) -> pa.Table:
        k = pd.util.hash_array(t.column(key_col).to_numpy(zero_copy_only=False))
        return t.append_column(
            "__bucket", pa.array((k % np.uint64(num_buckets)).astype(np.int32))
        )

    return ds.map_batches(add, batch_format="pyarrow")


def sessionize(
    ds: rd.Dataset,
    gap_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Gap-based session windows over an event stream.

    A session is a maximal run of one user's events where consecutive
    timestamps are ≤ ``gap_us`` apart (strictly-greater gaps break — the
    ``lag(ts)`` SQL semantics). Output: one row per session with
    (user, session_start, session_end, n_events, sum_value). Session
    identity is (user, session_start); no ordinal id is emitted, so the
    result is set-comparable without global per-user numbering.

    The group kernel is one ``np.lexsort`` + boolean break vector +
    ``np.add.reduceat`` over ALL users in the bucket — zero per-user
    Python. Equal-timestamp events sort arbitrarily, which is safe: a
    zero delta can never break a session and every emitted aggregate is
    order-invariant.
    """

    def sessions_of_bucket(g: pd.DataFrame) -> pa.Table:
        u = g[user_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        val = g[value_col].to_numpy(dtype=np.float64)
        order = np.lexsort((ts, u))
        u, ts, val = u[order], ts[order], val[order]
        n = len(u)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        return pa.table(
            {
                user_col: pa.array(u[starts]),
                "session_start": pa.array(
                    ts[starts].view("datetime64[us]")
                ),
                "session_end": pa.array(ts[ends - 1].view("datetime64[us]")),
                "n_events": pa.array(ends - starts),
                "sum_value": pa.array(np.add.reduceat(val, starts)),
            }
        )

    return (
        _with_bucket(ds, user_col, num_buckets)
        .groupby("__bucket")
        .map_groups(sessions_of_bucket, batch_format="pandas")
    )


def running_total(
    ds: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_buckets: int = 32,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Per-key cumulative running totals — the ``SUM(v) OVER (PARTITION
    BY key ORDER BY ts ROWS UNBOUNDED PRECEDING)`` dataflow, plus the
    per-key row number ``k``. One hash-bucket shuffle, then a single
    ``np.lexsort`` + segmented ``np.cumsum`` over ALL keys in the bucket
    (zero per-key Python).

    Determinism contract: values are fixed-pointed to integer
    ``1/scale`` units BEFORE accumulating, so the running sum is exact
    in any execution order, and ties on ``ts`` are pinned by the value
    itself — rows that remain tied are fully identical, so the emitted
    (k, running) SET is unique even though tied rows are
    interchangeable. That is what lets a DuckDB window-function oracle
    hash-gate a distributed cumulative aggregate.
    """

    def kernel(g: pd.DataFrame) -> pa.Table:
        u = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = round_half_away(
            g[value_col].to_numpy(dtype=np.float64) * scale
        ).astype(np.int64)
        order = np.lexsort((v, ts, u))
        u, ts, v = u[order], ts[order], v[order]
        n = len(u)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, n))
        cs = np.cumsum(v)
        base = np.where(starts > 0, cs[starts - 1], 0)
        run = cs - np.repeat(base, counts)
        k = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
        return pa.table(
            {
                key_col: pa.array(u),
                ts_col: pa.array(ts.view("datetime64[us]")),
                "value_u": pa.array(v, pa.int64()),
                "k": pa.array(k, pa.int64()),
                "running_value_u": pa.array(run, pa.int64()),
            }
        )

    return (
        _with_bucket(ds, key_col, num_buckets)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )


def lag_deltas(
    ds: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 32,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Per-key LAG: time since the previous event (``delta_us``) and the
    previous event's value (``lag_value_u``) — the ``LAG(x) OVER
    (PARTITION BY key ORDER BY ts, id)`` dataflow (inter-event gaps,
    feature deltas, dwell times). Same shape as :func:`running_total`:
    one hash-bucket shuffle, then a single ``np.lexsort`` + shifted-
    compare kernel over ALL keys in the bucket.

    Determinism contract: the within-key order is pinned by the unique
    ``id_col`` after ``ts``, so every row's predecessor — hence every
    delta — is a pure function of the data. First-of-key rows carry
    ``delta_us = -1`` / ``lag_value_u = 0`` (COALESCE on the SQL side)
    rather than nulls, keeping the hash gate null-free."""

    def kernel(g: pd.DataFrame) -> pa.Table:
        u = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g[id_col].to_numpy().astype(np.int64)
        v = round_half_away(
            g[value_col].to_numpy(dtype=np.float64) * scale
        ).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, eid, v = u[order], ts[order], eid[order], v[order]
        n = len(u)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        delta = np.empty(n, dtype=np.int64)
        delta[0] = -1
        delta[1:] = ts[1:] - ts[:-1]
        delta[first] = -1
        lagv = np.empty(n, dtype=np.int64)
        lagv[0] = 0
        lagv[1:] = v[:-1]
        lagv[first] = 0
        return pa.table(
            {
                key_col: pa.array(u),
                id_col: pa.array(eid, pa.int64()),
                ts_col: pa.array(ts.view("datetime64[us]")),
                "value_u": pa.array(v, pa.int64()),
                "delta_us": pa.array(delta, pa.int64()),
                "lag_value_u": pa.array(lagv, pa.int64()),
            }
        )

    return (
        _with_bucket(ds, key_col, num_buckets)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )


def ordered_paths(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    label_col: str,
    sep: str = ">",
    num_buckets: int = 32,
    driver_cap: int | None = 2_000_000,
) -> rd.Dataset:
    """Per-key ordered event path — ``string_agg(label, sep ORDER BY
    ts, id)`` (the product-analytics "user journey" string): one
    hash-bucket shuffle, one lexsort; the join itself runs per KEY (the
    output is one row per key, so per-key cost is proportional to the
    result, not the input). Order is pinned by the unique id after ts,
    making the concatenation deterministic.

    ``driver_cap``: path inputs are usually a FILTERED slice (funnel
    candidates, a sparse event family); when the slice fits under the
    cap the kernel runs once on a single driver gather — a Ray
    sort-groupby costs ~2 s of fixed latency regardless of how few rows
    it moves. Past the cap the bucket shuffle takes over; the kernel
    sorts globally by key either way, so both plans emit the identical
    row set."""

    def kernel(g: pd.DataFrame) -> pa.Table:
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort(
            (g[id_col].to_numpy().astype(np.int64), ts, g[key_col].to_numpy())
        )
        s = g.iloc[order]
        agg = s.groupby(key_col, sort=True)[label_col].agg(sep.join)
        out = agg.reset_index().rename(columns={label_col: "path"})
        n = s.groupby(key_col, sort=True).size().reset_index(name="n_steps")
        out["n_steps"] = n["n_steps"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    if driver_cap is not None:
        cols = [key_col, ts_col, id_col, label_col]
        frames: list[pd.DataFrame] = []
        total = 0
        for b in ds.select_columns(cols).iter_batches(
            batch_size=65536, batch_format="pandas"
        ):
            frames.append(b)
            total += len(b)
            if total > driver_cap:
                frames = None
                break
        if frames is not None:
            g = (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(columns=cols)
            )
            if not len(g):
                return rd.from_arrow(
                    pa.table({key_col: pa.array([], pa.int64()),
                              "path": pa.array([], pa.string()),
                              "n_steps": pa.array([], pa.int64())})
                )
            return rd.from_arrow(kernel(g))

    return (
        _with_bucket(ds, key_col, num_buckets)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )


def rank_windows(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    ntile: int = 4,
    num_buckets: int = 32,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """The ranking-window family in one kernel: per-key RANK (ties
    share), PERCENT_RANK = (rank−1)/(n−1) (0 for singleton keys), and
    NTILE(k) over the pinned unique order (value, id) — one hash-bucket
    shuffle, one lexsort, segment arithmetic for every key in the
    bucket. Values are fixed-pointed so tie groups are exact, and the
    percent-rank division uses integer operands — bit-identical to the
    SQL window oracle."""

    def kernel(g: pd.DataFrame) -> pa.Table:
        u = g[key_col].to_numpy()
        eid = g[id_col].to_numpy().astype(np.int64)
        v = round_half_away(
            g[value_col].to_numpy(dtype=np.float64) * scale
        ).astype(np.int64)
        order = np.lexsort((eid, v, u))
        u, eid, v = u[order], eid[order], v[order]
        n_all = len(u)
        newkey = np.empty(n_all, dtype=bool)
        newkey[0] = True
        newkey[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(newkey)
        counts = np.diff(np.append(starts, n_all))
        seg_start = np.repeat(starts, counts)
        n_of_key = np.repeat(counts, counts)
        idx = np.arange(n_all, dtype=np.int64) - seg_start  # row_number-1
        # RANK: first index of each equal-value run within the key
        newval = newkey.copy()
        newval[1:] |= v[1:] != v[:-1]
        run_start = np.maximum.accumulate(
            np.where(newval, np.arange(n_all, dtype=np.int64), 0)
        )
        rank = run_start - seg_start + 1
        denom = np.maximum(n_of_key - 1, 1)
        pr = round_half_away(
            (rank - 1).astype(np.float64) / denom.astype(np.float64), 6
        )
        pr[n_of_key == 1] = 0.0
        # NTILE(k): first n%k tiles take ceil(n/k) rows (SQL semantics)
        q, r = n_of_key // ntile, n_of_key % ntile
        big = r * (q + 1)
        tile = np.where(
            idx < big,
            idx // np.maximum(q + 1, 1),
            r + (idx - big) // np.maximum(q, 1),
        ) + 1
        return pa.table(
            {
                key_col: pa.array(u),
                id_col: pa.array(eid, pa.int64()),
                "value_u": pa.array(v, pa.int64()),
                "rnk": pa.array(rank, pa.int64()),
                "pct_rank": pa.array(pr, pa.float64()),
                "tile": pa.array(tile.astype(np.int64), pa.int64()),
            }
        )

    return (
        _with_bucket(ds, key_col, num_buckets)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str,
    num_buckets: int = 32,
    broadcast_limit: int = 2_000_000,
) -> rd.Dataset:
    """Backward as-of join: for every left row, attach ``right_cols``
    from the LATEST right row of the same key with ``right_ts ≤
    left_ts``; timestamp ties resolve to the row with the greatest
    ``right_tiebreak`` (a unique right id — this is what makes the
    operator deterministic under shuffled group order). Left rows with
    no match keep typed nulls (left join). ``right_tiebreak`` must be in
    ``right_cols``; ``right_cols`` must not collide with left columns.

    The kernel everywhere is ``pd.merge_asof(by=key)`` — the C
    merge-join over both sides sorted by timestamp (among equal
    timestamps it takes the LAST right row, hence the tie-break sort).
    Two execution paths:

    - right row count ≤ ``broadcast_limit``: the right side is pulled
      once, sorted, and broadcast via ``ray.put``; every LEFT batch
      joins against the cached sorted right in a map-only actor stage —
      NO shuffle at all. This is the dominant point-in-time feature
      join shape (a huge event stream against a dimension-sized right),
      and it skips Ray's ~2 s groupby sort-shuffle floor entirely. The
      partitioning assumption is that the right side fits one actor's
      heap (rows × width), same as any broadcast join.
    - bigger right: hash-bucket co-location — both sides take a
      ``bucket = hash(key) % P`` column, ONE union+groupby shuffle
      co-locates each key's rows, and the kernel runs per bucket.
      Neither side is broadcast, so a right side far bigger than one
      node's memory still streams.
    """
    assert right_tiebreak in right_cols
    left_schema = _arrow_schema(left)
    left_names = list(left_schema.names)
    assert not set(right_cols) & set(left_names)
    right_schema = _arrow_schema(right)
    right_types = {c: right_schema.field(c).type for c in right_cols}
    key_t = left_schema.field(left_key).type
    ts_t = left_schema.field(left_ts).type
    out_schema = pa.schema(
        [left_schema.field(c) for c in left_names]
        + [pa.field(c, right_types[c]) for c in right_cols]
    )

    if right.count() <= broadcast_limit:
        return _asof_broadcast(
            left, right, left_names, right_cols, out_schema,
            left_key, right_key, left_ts, right_ts, right_tiebreak,
            key_t, ts_t,
        )

    # both sides mapped onto ONE layout (typed nulls pad the other
    # side's columns) so a single groupby co-locates them
    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: t.column(c) for c in left_names}
        cols["__key"] = t.column(left_key).cast(key_t)
        cols["__ts"] = t.column(left_ts).cast(ts_t)
        for c in right_cols:
            cols[c] = pa.nulls(n, right_types[c])
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        cols["__bucket"] = t.column("__bucket")
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {c: pa.nulls(n, left_schema.field(c).type) for c in left_names}
        cols["__key"] = t.column(right_key).cast(key_t)
        cols["__ts"] = t.column(right_ts).cast(ts_t)
        for c in right_cols:
            cols[c] = t.column(c)
        cols["__side"] = pa.array(np.ones(n, np.int8))
        cols["__bucket"] = t.column("__bucket")
        return pa.table(cols)

    lt = _with_bucket(left, left_key, num_buckets).map_batches(
        tag_left, batch_format="pyarrow"
    )
    rt = _with_bucket(right, right_key, num_buckets).map_batches(
        tag_right, batch_format="pyarrow"
    )

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        le = (
            g[g["__side"] == 0][left_names + ["__key", "__ts"]]
            .sort_values("__ts", kind="mergesort")
        )
        ri = (
            g[g["__side"] == 1][["__key", "__ts"] + right_cols]
            .sort_values(["__ts", right_tiebreak], kind="mergesort")
        )
        out = pd.merge_asof(
            le, ri, on="__ts", by="__key", direction="backward"
        )
        arrays = [
            pa.Array.from_pandas(out[c], type=out_schema.field(c).type)
            for c in out_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return (
        lt.union(rt)
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )


def hopping_window_agg(
    ds: rd.Dataset,
    width_us: int,
    hop_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_buckets: int = 32,
    scale: int = 1_000_000,
    driver_cap: int | None = 2_000_000,
) -> rd.Dataset:
    """Hopping (sliding) window aggregate: windows ``[w, w+width)`` for
    every ``w ≡ 0 (mod hop)``; each event lands in exactly
    ``width/hop`` windows (``width % hop == 0`` required). Output: one
    row per (key, window_start) with (n_events, sum_value);
    ``window_start`` is µs-since-epoch.

    Combiner pattern end to end: the per-batch kernel EXPLODES each
    event into its covering windows with one ``np.repeat``/``arange``
    broadcast (no Python loop) and immediately partial-aggregates
    within the batch — so what combines is the pre-aggregated
    (key, window) partial stream, not width/hop copies of the raw
    events. Values are fixed-pointed to integer ``1/scale`` units
    inside the partial (the repo-wide quantization invariant, same as
    :func:`running_total`), so partial sums commute exactly — which is
    what makes the combine-path choice a pure cost decision. NOTE:
    ``sum_value`` is therefore the sum of per-event values ROUNDED to
    ``1/scale`` units, not the rounded sum — values carrying more than
    ``log10(scale)`` decimal places lose the sub-``1/scale`` tail per
    event (lossless for the 3-decimal gate data at the default
    ``scale=1e6``); raise ``scale`` for finer-grained inputs:

    * partial stream ≤ ``driver_cap`` rows → ONE driver gather +
      pandas groupby (the (key, window) domain at gate scale is far
      under the cap; a Ray sort-groupby pays ~2 s fixed latency for
      the same answer);
    * past the cap → the partials re-execute through the hash-bucket
      co-location shuffle (``hash(key, window) % P``) and sum per
      bucket — one shuffle of the small side, vectorized everywhere.
    """
    assert width_us % hop_us == 0, "width must be a multiple of hop"
    k = width_us // hop_us

    def partial(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=np.int64),
                 "window_start": pd.Series([], dtype=np.int64),
                 "n_events": pd.Series([], dtype=np.int64),
                 "sum_v": pd.Series([], dtype=np.int64)}
            )
        ts = (
            t.column(ts_col)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        v6 = round_half_away(
            t.column(value_col).to_numpy(zero_copy_only=False).astype(
                np.float64) * scale
        ).astype(np.int64)
        # floor-div that is correct for negative ts too
        w_max = (ts // hop_us) * hop_us
        starts = (
            w_max[:, None] - hop_us * np.arange(k, dtype=np.int64)[None, :]
        ).ravel()
        df = pd.DataFrame(
            {
                key_col: np.repeat(key, k),
                "window_start": starts,
                "n_events": 1,
                "sum_v": np.repeat(v6, k),
            }
        )
        return df.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_v=("sum_v", "sum")
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finish(out: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                key_col: pa.array(out[key_col]),
                "window_start": pa.array(out["window_start"], pa.int64()),
                "n_events": pa.array(out["n_events"], pa.int64()),
                "sum_value": pa.array(
                    out["sum_v"].to_numpy(np.int64) / float(scale),
                    pa.float64(),
                ),
            }
        )

    if driver_cap is not None:
        frames: list[pd.DataFrame] = []
        total = 0
        for b in partials.iter_batches(
            batch_size=65536, batch_format="pandas"
        ):
            frames.append(b)
            total += len(b)
            if total > 4 * driver_cap:
                merged = pd.concat(frames, ignore_index=True).groupby(
                    [key_col, "window_start"], as_index=False
                )[["n_events", "sum_v"]].sum()
                frames, total = [merged], len(merged)
                if total > driver_cap:
                    frames = None
                    break
        if frames is not None:
            out = (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(
                    {key_col: pd.Series([], dtype=np.int64),
                     "window_start": pd.Series([], dtype=np.int64),
                     "n_events": pd.Series([], dtype=np.int64),
                     "sum_v": pd.Series([], dtype=np.int64)}
                )
            ).groupby([key_col, "window_start"], as_index=False)[
                ["n_events", "sum_v"]
            ].sum()
            return rd.from_arrow(finish(out))

    def add_bucket(t: pa.Table) -> pa.Table:
        hk = pd.util.hash_array(t.column(key_col).to_numpy(zero_copy_only=False))
        hw = t.column("window_start").to_numpy().astype(np.uint64)
        mix = hk ^ (hw * np.uint64(0x9E3779B97F4A7C15))
        return t.append_column(
            "__bucket", pa.array((mix % np.uint64(num_buckets)).astype(np.int32))
        )

    def combine(g: pd.DataFrame) -> pa.Table:
        out = g.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_v=("sum_v", "sum")
        )
        return finish(out)

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(combine, batch_format="pandas")
    )


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    right_cols: list[str],
    num_buckets: int = 32,
    cell_us: int | None = None,
) -> rd.Dataset:
    """Interval (range) join: emit (left row × ``right_cols``) for every
    right row of the same key with ``right_ts ∈ [left_ts + lower,
    left_ts + upper]`` (µs offsets; ``lower`` may be negative). Inner
    join — unmatched left rows are dropped.

    Scale design — time-cell replication, not per-key cross products:
    time is cut into cells of ``cell_us ≥ upper - lower`` (default:
    exactly the window span). A left row lives in ONE cell
    (``ts // cell``); a right row can match lefts spanning at most TWO
    adjacent cells, so it is replicated to ≤2 (key, cell) slots. Both
    sides co-locate by ``hash(key, cell) % P`` — one union+groupby
    shuffle — and the per-bucket kernel merges on (key, cell) before
    the exact window filter. The equi-merge cross product is therefore
    bounded per (key × one window span) no matter how long the stream
    is; a key hot WITHIN one span is the irreducible output itself.
    Each (left, right) pair meets in exactly one cell (the left's), so
    no dedup pass is needed.
    """
    span = upper_us - lower_us
    assert span >= 0
    cell = int(cell_us) if cell_us else max(span, 1)
    assert cell >= span, "cell_us must cover the window span (≤2 cells/right row)"

    left_schema = _arrow_schema(left)
    left_names = list(left_schema.names)
    assert not set(right_cols) & set(left_names)
    right_schema = _arrow_schema(right)
    right_types = {c: right_schema.field(c).type for c in right_cols}
    key_t = left_schema.field(left_key).type
    ts_t = left_schema.field(left_ts).type
    out_schema = pa.schema(
        [left_schema.field(c) for c in left_names]
        + [pa.field(c, right_types[c]) for c in right_cols]
    )

    def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
        return (
            col.to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )

    def _bucket_of(key_np: np.ndarray, cell_np: np.ndarray) -> pa.Array:
        hk = pd.util.hash_array(key_np)
        mix = hk ^ (cell_np.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        return pa.array((mix % np.uint64(num_buckets)).astype(np.int32))

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = _ts_us(t.column(left_ts))
        cell_id = ts // cell
        cols = {c: t.column(c) for c in left_names}
        cols["__key"] = t.column(left_key).cast(key_t)
        cols["__ts"] = pa.array(ts, pa.int64())
        cols["__cell"] = pa.array(cell_id, pa.int64())
        for c in right_cols:
            cols[c] = pa.nulls(n, right_types[c])
        cols["__rts"] = pa.nulls(n, pa.int64())
        cols["__side"] = pa.array(np.zeros(n, np.int8))
        cols["__bucket"] = _bucket_of(
            t.column(left_key).to_numpy(zero_copy_only=False), cell_id
        )
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        ts = _ts_us(t.column(right_ts))
        # cells of the lefts this right row can match:
        # ts_l ∈ [ts_r - upper, ts_r - lower] → ≤2 adjacent cells
        c_lo = (ts - upper_us) // cell
        c_hi = (ts - lower_us) // cell
        reps = (c_hi - c_lo + 1).astype(np.int64)  # 1 or 2
        idx = np.repeat(np.arange(t.num_rows), reps)
        cum = np.cumsum(reps) - reps  # start offset per source row
        cell_id = c_lo[idx] + (np.arange(len(idx)) - cum[idx])
        tt = t.take(pa.array(idx))
        n = tt.num_rows
        cols = {c: pa.nulls(n, left_schema.field(c).type) for c in left_names}
        cols["__key"] = tt.column(right_key).cast(key_t)
        cols["__ts"] = pa.nulls(n, pa.int64())
        cols["__cell"] = pa.array(cell_id, pa.int64())
        for c in right_cols:
            cols[c] = tt.column(c)
        cols["__rts"] = pa.array(ts[idx], pa.int64())
        cols["__side"] = pa.array(np.ones(n, np.int8))
        cols["__bucket"] = _bucket_of(
            tt.column(right_key).to_numpy(zero_copy_only=False), cell_id
        )
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        le = g[g["__side"] == 0][left_names + ["__key", "__cell", "__ts"]]
        ri = g[g["__side"] == 1][["__key", "__cell", "__rts"] + right_cols]
        if len(le) == 0 or len(ri) == 0:
            return out_schema.empty_table()
        out = le.merge(ri, on=["__key", "__cell"])
        d = out["__rts"] - out["__ts"]
        out = out[(d >= lower_us) & (d <= upper_us)]
        arrays = [
            pa.Array.from_pandas(out[c], type=out_schema.field(c).type)
            for c in out_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return (
        lt.union(rt)
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )


def _asof_broadcast(
    left: rd.Dataset,
    right: rd.Dataset,
    left_names: list[str],
    right_cols: list[str],
    out_schema: pa.Schema,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    key_t: pa.DataType,
    ts_t: pa.DataType,
) -> rd.Dataset:
    """Small-right as-of join: sort the right side ONCE, ``ray.put`` it,
    and merge every left batch against the cached copy in a map-only
    TASK stage (no shuffle, no actor-pool spin-up — the closure carries
    only the object ref; ``ray.get`` resolves from node-local plasma and
    is cached per worker process). The per-batch sort of the left side
    is the only added work, and it is tiny (one block)."""
    import ray

    rt = (
        right.select_columns(
            list(dict.fromkeys([right_key, right_ts] + right_cols))
        )
        .to_pandas()
    )
    rt = pd.DataFrame(
        {
            "__key": pa.Array.from_pandas(rt[right_key]).cast(key_t).to_pandas(),
            "__ts": pa.Array.from_pandas(rt[right_ts]).cast(ts_t).to_pandas(),
            **{c: rt[c] for c in right_cols},
        }
    ).sort_values(["__ts", right_tiebreak], kind="mergesort", ignore_index=True)
    right_ref = ray.put(rt)

    def join_batch(g: pd.DataFrame) -> pa.Table:
        r = ray.get(right_ref)
        le = g[left_names].copy()
        le["__key"] = pa.Array.from_pandas(g[left_key]).cast(key_t).to_pandas()
        le["__ts"] = pa.Array.from_pandas(g[left_ts]).cast(ts_t).to_pandas()
        le = le.sort_values("__ts", kind="mergesort")
        out = pd.merge_asof(
            le, r, on="__ts", by="__key", direction="backward"
        )
        arrays = [
            pa.Array.from_pandas(out[c], type=out_schema.field(c).type)
            for c in out_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return left.map_batches(join_batch, batch_format="pandas")


def moving_window(
    ds: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window_rows: int = 4,
    num_buckets: int = 32,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Per-key rows-window moving sum/avg — the ``SUM/COUNT(v) OVER
    (PARTITION BY key ORDER BY ts, id ROWS BETWEEN w-1 PRECEDING AND
    CURRENT ROW)`` dataflow. Same shape as :func:`running_total`: one
    hash-bucket shuffle, then one lexsort + a global-cumsum difference
    per bucket (``mov = cs[i] − cs[lo−1]`` with ``lo`` clamped at the
    key's segment start) — zero per-key Python.

    Determinism contract: fixed-point integer sums in any execution
    order; the emitted average divides the SAME integer operands the SQL
    window oracle divides (``mov_sum_u / (n_win * 1e6)`` rounded
    half-away to 6), so floats are hash-exact."""

    def kernel(g: pd.DataFrame) -> pa.Table:
        u = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g[id_col].to_numpy().astype(np.int64)
        v = round_half_away(
            g[value_col].to_numpy(dtype=np.float64) * scale
        ).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, eid, v = u[order], ts[order], eid[order], v[order]
        n = len(u)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, n))
        idx = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        n_win = np.minimum(idx + 1, window_rows)
        cs = np.cumsum(v)
        lo = np.arange(n, dtype=np.int64) - n_win + 1  # window start row
        mov = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        avg = round_half_away(mov / (n_win * float(scale)), 6)
        return pa.table(
            {
                key_col: pa.array(u),
                id_col: pa.array(eid, pa.int64()),
                "value_u": pa.array(v, pa.int64()),
                "mov_sum_u": pa.array(mov, pa.int64()),
                "n_win": pa.array(n_win, pa.int64()),
                "mov_avg": pa.array(avg, pa.float64()),
            }
        )

    return (
        _with_bucket(ds, key_col, num_buckets)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )


def first_last_by_key(
    ds: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    attr_col: str = "event_type",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Per-key FIRST_VALUE/LAST_VALUE snapshot over the pinned unique
    order (ts, id): one row per key with the first and last event's id
    and attribute plus the key's row count — the entity-state /
    latest-snapshot pattern. One hash-bucket shuffle, one lexsort,
    segment first/last indexing; zero per-key Python."""

    def kernel(g: pd.DataFrame) -> pa.Table:
        u = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g[id_col].to_numpy().astype(np.int64)
        attr = g[attr_col].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, eid, attr = u[order], eid[order], attr[order]
        n = len(u)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(brk)
        lasts = np.append(starts[1:], n) - 1
        return pa.table(
            {
                key_col: pa.array(u[starts]),
                "first_event_id": pa.array(eid[starts], pa.int64()),
                "first_type": pa.array(attr[starts]),
                "last_event_id": pa.array(eid[lasts], pa.int64()),
                "last_type": pa.array(attr[lasts]),
                "n": pa.array(lasts - starts + 1, pa.int64()),
            }
        )

    return (
        _with_bucket(ds, key_col, num_buckets)
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
