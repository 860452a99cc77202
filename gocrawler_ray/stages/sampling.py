"""Deterministic splits and samples for training-data pipelines.

A 100 TB corpus is split train/val/test and subsampled by HASH, never by
position or RNG state: each row's fate is a pure function of its id and
the seed, so the assignment is stable under re-partitioning, retries,
and incremental re-runs (the properties a resumable Ray pipeline needs),
and any node can evaluate it map-only — no shuffle, no coordination.

The hash is the repo's semantic-sketch scheme (first 8 big-endian bytes
of md5, ``functions/urls.py::md5_hash64_many``) so a SQL oracle
reproduces it exactly:
``CAST(('0x' || substr(md5(key), 1, 16)) AS UBIGINT)``.

The reference has no sampling at all (its only "split" is the shop
profile switch, /root/reference/pkg/scraper/shopfactory.go:20-37); these
are part of the beyond-reference LLM-data operator suite.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urls import md5_hash64_many

_U64 = 1 << 64


def _unit_hash(ids, salt: str) -> np.ndarray:
    """uint64 hash of ``salt || id`` — uniform on [0, 2^64)."""
    return md5_hash64_many([f"{salt}{i}" for i in ids])


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper uint64 bound) per split, in dict order.
    Bounds are exact integers — embed the SAME literals in any oracle."""
    total = float(sum(weights.values()))
    acc = 0.0
    out = []
    for name, w in weights.items():
        acc += w / total
        out.append((name, min(int(acc * _U64), _U64)))
    out[-1] = (out[-1][0], _U64)  # float roundoff must not orphan rows
    return out


def assign_split(
    batch: pa.Table,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 7,
    out: str = "split",
) -> pa.Table:
    """Append a split-name column: row → the first split whose cumulative
    hash bound exceeds ``hash(split:{seed}:{id})``. Map-only kernel."""
    u = _unit_hash(batch.column(id_col).to_pylist(), f"split:{seed}:")
    names, bounds = zip(*split_thresholds(weights))
    idx = np.searchsorted(np.array(bounds[:-1], dtype=np.uint64), u, side="right")
    arr = pa.DictionaryArray.from_arrays(
        pa.array(idx, pa.int32()), pa.array(list(names))
    ).cast(pa.string())
    return batch.append_column(out, arr)


def sample_bound(rate: float) -> int:
    """Exact uint64 keep-bound for ``rate`` — the single source of truth
    shared by the kernel and any SQL oracle."""
    return min(int(rate * _U64), _U64 - 1)


def sample_mask(
    batch: pa.Table, rate: float, id_col: str = "doc_id", seed: int = 7
) -> pa.Table:
    """Filter to a deterministic ``rate`` fraction:
    keep iff ``hash(sample:{seed}:{id}) < rate * 2^64``."""
    u = _unit_hash(batch.column(id_col).to_pylist(), f"sample:{seed}:")
    bound = np.uint64(sample_bound(rate))
    return batch.filter(pa.array(u < bound))


def stratified_mask(
    batch: pa.Table,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "event_id",
    seed: int = 7,
) -> pa.Table:
    """Per-stratum deterministic sampling: each row keeps iff
    ``hash(strat:{seed}:{id}) < rates[stratum] * 2^64``; strata absent
    from ``rates`` are dropped (rate 0). The standard class-rebalancing
    move for training corpora (downsample boilerplate `view`/`click`
    rows, keep every rare `purchase`) — still a pure map-only kernel,
    so the rebalanced corpus is stable under retries and incremental
    re-runs. The per-stratum bound vector is looked up through the
    batch's dictionary encoding: one hash per row, one bound per
    DISTINCT stratum value per batch, zero per-row Python."""
    u = _unit_hash(batch.column(id_col).to_pylist(), f"strat:{seed}:")
    enc = batch.column(strata_col).combine_chunks().dictionary_encode()
    bound_of = {s: sample_bound(r) for s, r in rates.items()}
    per_dict = np.array(
        [bound_of.get(v, 0) for v in enc.dictionary.to_pylist()], dtype=np.uint64
    )
    row_bounds = per_dict[enc.indices.to_numpy(zero_copy_only=False)]
    return batch.filter(pa.array(u < row_bounds))


def weighted_mask(
    batch: pa.Table,
    weights: np.ndarray,
    id_col: str = "doc_id",
    seed: int = 7,
) -> pa.Table:
    """Importance sampling: keep each row with probability
    ``weights[i]`` (clipped to [0, 1]) — longer/higher-quality docs
    kept preferentially, boilerplate downsampled, still a pure
    map-only function of (id, seed, weight).

    Determinism across the SQL gate: the comparison runs in DOUBLE on
    both sides — ``hash/2^64 < weight`` — so as long as the oracle
    computes the weight with the same arithmetic expression, the
    operands (hence the verdict) are bit-identical; no integer-bound
    rounding is involved."""
    u = _unit_hash(batch.column(id_col).to_pylist(), f"wsample:{seed}:")
    frac = u.astype(np.float64) / float(_U64)
    w = np.clip(np.asarray(weights, dtype=np.float64), 0.0, 1.0)
    return batch.filter(pa.array(frac < w))


def sample_topk_hash(ds, k: int, id_col: str = "doc_id", seed: int = 7) -> pa.Table:
    """Deterministic uniform k-sample without replacement: the k rows
    with the globally smallest ``hash(topk:{seed}:{id})`` — the
    distributed equivalent of reservoir sampling, but reproducible and
    order-free. Each block contributes its local k smallest (a partial
    top-k, so at most ``blocks × k`` rows ever leave the mappers); the
    driver merges the bounded partials and keeps the global k. Ties are
    pinned by the id itself so the winner set is unique.

    Returns an Arrow table of the winning ids (the payload re-attaches
    with a broadcast-keeper filter, the same move as exact_dedup)."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        u = _unit_hash(ids, f"topk:{seed}:")
        order = np.lexsort((ids, u))[:k]
        return pa.table(
            {id_col: pa.array(ids[order]), "__hv": pa.array(u[order], pa.uint64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    ids = np.array([r[id_col] for r in parts])
    hv = np.array([r["__hv"] for r in parts], dtype=np.uint64)
    order = np.lexsort((ids, hv))[:k]
    return pa.table({id_col: pa.array(np.sort(ids[order]))})


def group_sample_k(
    ds,
    key_col: str,
    id_col: str,
    k: int,
    seed: int = 7,
) -> pa.Table:
    """Deterministic k-PER-CLASS uniform sample without replacement —
    the class-balancing move for training corpora (cap every class at k
    examples, uniformly and reproducibly). Per class, keep the k rows
    with the smallest ``hash(bal:{seed}:{id})``; ranks are exact uint64
    comparisons (never float64-rounded — a 64-bit hash loses low bits in
    a double and could select differently from the SQL oracle).

    Same partial-top-k shape as :func:`sample_topk_hash`: each block
    contributes at most k rows PER CLASS IT SEES, so the gather is
    bounded by blocks × classes × k regardless of data size; the driver
    merge re-ranks the bounded partials. Classes are assumed
    catalog-bounded (event types, languages, labels); a key domain that
    grows with the data wants :func:`stratified_mask` (rate-based)
    instead."""

    def partial(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        u = _unit_hash(ids, f"bal:{seed}:")
        order = np.lexsort((ids, u, key))
        key, ids, u = key[order], ids[order], u[order]
        n = len(key)
        if n == 0:
            return pa.table(
                {key_col: key, id_col: ids, "__hv": pa.array(u, pa.uint64())}
            )
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        keep = rank < k
        return pa.table(
            {
                key_col: pa.array(key[keep]),
                id_col: pa.array(ids[keep]),
                "__hv": pa.array(u[keep], pa.uint64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    merged = pa.Table.from_pandas(
        parts.to_pandas(), preserve_index=False
    )  # bounded: blocks × classes × k
    key = merged.column(key_col).to_numpy(zero_copy_only=False)
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    u = merged.column("__hv").to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((ids, u, key))
    key, ids = key[order], ids[order]
    n = len(key)
    if n == 0:
        return pa.table({key_col: key, id_col: ids,
                         "rank": pa.array([], pa.int64())})
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, n))
    rank = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    keep = rank < k
    out = pa.table(
        {
            key_col: pa.array(key[keep]),
            id_col: pa.array(ids[keep]),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
        }
    )
    return out.sort_by([(key_col, "ascending"), ("rank", "ascending")])
