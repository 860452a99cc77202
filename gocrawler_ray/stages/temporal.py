"""Temporal operators: gap-based session windows and a backward as-of
join — custom operators the Dataset API lacks, composed from one hash
shuffle + vectorized group kernels.

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
