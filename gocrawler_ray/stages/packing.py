"""Greedy sequence packing — grouping tokenized documents into
fixed-budget training windows (the "pack to 2k/8k context" step of an
LLM data pipeline; docs never split, a pack closes when the next doc
would overflow it).

Distribution contract: packing is SEQUENTIAL by definition (each doc's
pack depends on every doc before it), so a single global packing would
serialize the corpus. Instead the corpus shards by a REPRODUCIBLE hash
of the doc id (md5-derived, the repo's semantic-sketch scheme — a SQL
oracle rebuilds the same shards) and each shard packs independently in
doc-id order. That is exactly how an N-node cluster packs: one
deterministic greedy scan per shard, shards in parallel, no
coordination — at 100 TB ``num_buckets`` scales with the cluster while
each scan stays a linear pass over its bucket.

The reference has no notion of token budgets or packing (its unit of
work is one page, /root/reference/pkg/itemparser/extractor.go:30-67);
this is part of the beyond-reference LLM-data operator suite.

The per-bucket scan is an explicit Python loop over a numpy array: the
recurrence ``running ← running + x if ≤ B else x`` has no vectorized
form (each step depends on the previous reset), and the loop touches
each row once — the same deliberate-sequential exception as
``pd.merge_asof`` in the as-of join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.urls import md5_hash64_many


def pack_bucket_of(ids, num_buckets: int) -> np.ndarray:
    """Shard key: ``md5-derived-uint64('pack:' || id) % num_buckets`` —
    shared verbatim with the SQL oracle."""
    return (
        md5_hash64_many([f"pack:{i}" for i in ids]) % np.uint64(num_buckets)
    ).astype(np.int32)


def pack_sequences(
    ds: rd.Dataset,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    num_buckets: int = 8,
) -> rd.Dataset:
    """Assign each doc a ``(bucket, pack_id)`` training-window slot.

    Greedy per bucket in ``id_col`` order: a pack accumulates docs
    while the running token total stays ≤ ``budget``; the doc that
    would overflow starts the next pack (an oversized doc therefore
    occupies a pack alone). Output columns: id, bucket, pack_id,
    tokens. Deterministic — a recursive-CTE SQL oracle replays the
    same recurrence."""

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(pack_bucket_of(ids, num_buckets))
        )

    def pack_of_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col)
        tok = g[tokens_col].to_numpy(dtype=np.int64)
        pack = np.empty(len(tok), dtype=np.int64)
        running, p = 0, 0
        for i, x in enumerate(tok):
            if i > 0 and running + x > budget:
                p, running = p + 1, 0
            running += x
            pack[i] = p
        return pa.table(
            {
                id_col: pa.array(g[id_col].to_numpy()),
                "bucket": pa.array(g["bucket"].to_numpy(np.int32), pa.int32()),
                "pack_id": pa.array(pack, pa.int64()),
                tokens_col: pa.array(tok, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_of_bucket, batch_format="pandas")
    )


def interleave_positions(
    ds: "rd.Dataset",
    key_col: str,
    id_col: str,
    weights_ref,
    num_buckets: int = 32,
) -> "rd.Dataset":
    """Deterministic weighted corpus interleave — the dataset-mixing
    step of LLM training (each source s appears ``w(s)`` times per
    round-robin cycle, cycle order = sources ascending). Emits
    ``(id_col, key_col, mix_pos)`` where ``mix_pos`` is the doc's slot
    in the global mixed stream:

        rn      = 0-based rank of the doc within its source (by id)
        mix_pos = (rn // w) * cycle_len + offset(source) + rn % w

    ``weights_ref`` is a ray.put of ``{source: (w, offset, cycle_len)}``
    (driver-computed from the bounded distinct-source combine).

    Plan: ONE hash-bucket shuffle on the source key — a source's rows
    co-locate, so the in-bucket sort-by-id rank is globally exact; the
    position formula is pure per-row arithmetic after that. Skewed
    giant sources would hot-spot their bucket; the scale path is the
    standard two-pass salted rank (per-salt-segment counts, then prefix
    offsets broadcast back), the same machinery as the politeness
    sidecar's salted schedule."""
    import pyarrow as pa
    import ray

    from .temporal import _with_bucket

    def positions(g: pd.DataFrame) -> pa.Table:
        wmap = ray.get(weights_ref)
        g = g.sort_values([key_col, id_col], kind="mergesort")
        rn = g.groupby(key_col, sort=False).cumcount().to_numpy(np.int64)
        meta = g[key_col].map(wmap)
        w = np.array([m[0] for m in meta], dtype=np.int64)
        off = np.array([m[1] for m in meta], dtype=np.int64)
        cyc = np.array([m[2] for m in meta], dtype=np.int64)
        pos = (rn // w) * cyc + off + rn % w
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(np.int64)),
            key_col: pa.array(g[key_col].astype(str), pa.string()),
            "mix_pos": pa.array(pos, pa.int64()),
        })

    return (
        _with_bucket(ds, key_col, num_buckets)
        .groupby("__bucket")
        .map_groups(positions, batch_format="pandas")
    )
