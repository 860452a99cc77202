"""Vectorized list-column kernels (Arrow offsets, zero Python per row)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def first_list_element(col) -> pa.Array:
    """First element of each list (NULL for empty or null lists).

    Works for any element type (struct, string, …): flatten once, then a
    single ``take`` at each row's first-child offset — the round-4
    verdict #3 replacement for ``to_pylist()`` + per-row comprehensions
    on the flagship projections (same offsets idiom as the captcha span
    scan, stages/extract.py:110-126). Null/empty rows take a NULL index,
    so no per-type null literal is needed."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.nulls(0, type=col.type.value_type)
    lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy()
    has = lengths > 0
    flat = pc.list_flatten(col)  # drops null/empty parents
    starts = np.cumsum(lengths, dtype=np.int64) - lengths
    idx = pa.array(np.where(has, starts, 0), pa.int64(), mask=~has)
    return flat.take(idx)


def kv_lookup(col, key: str, default: str = "") -> pa.Array:
    """Per-row ``value`` of the first {key, value} entry matching ``key``
    in a list<struct{key,value}> column (``default`` when absent) — the
    vectorized form of a per-row linear scan over a details map. One
    equality kernel over the flattened children + one take."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], pa.string())
    lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy()
    flat = pc.list_flatten(col)
    m = pc.fill_null(
        pc.equal(pc.struct_field(flat, "key"), pa.scalar(key)), False
    ).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    docs = doc_idx[m]
    hit_pos = np.flatnonzero(m)
    uniq, first = np.unique(docs, return_index=True)
    sel = np.zeros(n, dtype=np.int64)
    hasv = np.zeros(n, dtype=bool)
    sel[uniq] = hit_pos[first]
    hasv[uniq] = True
    idx = pa.array(sel, pa.int64(), mask=~hasv)
    return pc.fill_null(
        pc.struct_field(flat, "value").take(idx), pa.scalar(default)
    )
