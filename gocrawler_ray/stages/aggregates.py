"""Distributed aggregate / sketch operators for training-data pipelines:
top-k per group, exact grouped count-distinct, document frequency (IDF),
HyperLogLog registers, and grouped quantiles.

The reference has no grouped aggregation at all (SURVEY §2.5 — its only
"aggregates" are mutex counters, scraper.go:195); these are the
wide-aggregation half of the training-data-op brief, built on the two
patterns every other wide op in this repo uses:

- PARTIAL-THEN-SMALL-GROUPBY: each block reduces to at most (keys-in-
  block) rows inside ``map_batches`` before anything shuffles, so the
  exchange moves partials, not rows (``doc_frequency``, ``hll_registers``,
  the final combine of ``count_distinct``).
- HASH-BUCKET CO-LOCATION (see stages/temporal.py): one
  ``groupby(siphash(key) % P)`` shuffle, then a single vectorized numpy
  kernel handles MANY keys per group — never ``map_groups`` keyed by the
  raw key (~1 ms Python per group) and never per-key Python loops
  (``group_topk``, ``group_quantiles``, the pair-dedup of
  ``count_distinct``).

Partitioning assumptions (custom-operator contract):
- ``group_topk`` / ``group_quantiles``: the heaviest single KEY's rows
  fit one task after per-block partial reduction (top-k pre-prunes each
  block to ≤k rows per key; quantiles are exact and therefore must see
  every value of a key — the documented inherent bound).
- ``count_distinct`` buckets by the (key, value) PAIR, so one key's
  pairs spread over all buckets and no single bucket owns a hot key;
  only the deduped partial counts (≤ P rows per key) meet again.
- ``hll_registers`` is the bounded-state path when exact distinct is
  too big: state is 2^p registers TOTAL regardless of input size. The
  register table (not the float estimate) is the operator output, so a
  SQL oracle can reproduce it bit-for-bit from the same md5-derived
  hashes (functions/urls.py::md5_hash64_many).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ..functions.numeric import round_half_away
import pyarrow.compute as pc

import ray.data as rd

from ..functions.urls import md5_hash64_many


def _bucket_of(values: np.ndarray, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_array(values)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _rank_in_key(
    key: np.ndarray, val: np.ndarray, tie: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sort by (key asc, val desc, tie asc); return (order, 0-based rank
    within key). One lexsort + one cummax — no per-key loop."""
    order = np.lexsort((tie, -val, key))
    k = key[order]
    n = len(k)
    idx = np.arange(n, dtype=np.int64)
    new = np.empty(n, dtype=bool)
    if n:
        new[0] = True
        new[1:] = k[1:] != k[:-1]
    start = np.maximum.accumulate(np.where(new, idx, 0))
    return order, idx - start


def group_topk(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Top-k rows per key by ``order_col`` DESC (ties broken by
    ``tiebreak_col`` ASC), with a 1-based ``rank`` column.

    Two-phase: every block first prunes itself to ≤k rows per key (a
    local top-k can only shrink the global one), then one hash-bucket
    shuffle co-locates the survivors and the same kernel ranks them
    globally. The shuffle therefore moves at most k × blocks rows per
    key no matter how hot the key is.
    """
    cols = [c.name for c in _schema_fields(ds)]

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        val = t.column(order_col).to_numpy(zero_copy_only=False).astype(np.float64)
        tie = t.column(tiebreak_col).to_numpy(zero_copy_only=False)
        order, rank = _rank_in_key(key, val, tie)
        return t.take(pa.array(order[rank < k]))

    def bucket_col(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__bucket", pa.array([], pa.int32()))
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(_bucket_of(key, num_buckets)))

    def final_topk(g: pd.DataFrame) -> pa.Table:
        key = g[key_col].to_numpy()
        val = g[order_col].to_numpy(dtype=np.float64)
        tie = g[tiebreak_col].to_numpy()
        order, rank = _rank_in_key(key, val, tie)
        keep = rank < k
        out = g.iloc[order[keep]][cols].reset_index(drop=True)
        out["rank"] = (rank[keep] + 1).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .map_batches(bucket_col, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(final_topk, batch_format="pandas")
    )


def _schema_fields(ds: rd.Dataset):
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return list(base)
    return [pa.field(n, pa.string()) for n in base.names]


def count_distinct(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Exact COUNT(DISTINCT value) GROUP BY key, two-level.

    Level 1 dedups (key, value) pairs: blocks drop local duplicates,
    then pairs shuffle by ``hash(key ⊕ value) % P`` — the SAME pair
    always lands in the SAME bucket, so a per-bucket dedup is globally
    exact, while one key's distinct values spread across all buckets
    (no hot-key bucket). Level 2 sums the per-bucket partial counts per
    key — a groupby over ≤ P rows per key.
    """

    def local_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: t.column(key_col),
                    value_col: t.column(value_col),
                    "__bucket": pa.array([], pa.int32()),
                }
            )
        df = pd.DataFrame(
            {
                key_col: t.column(key_col).to_numpy(zero_copy_only=False),
                value_col: t.column(value_col).to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        pair_hash = pd.util.hash_pandas_object(
            df[[key_col, value_col]], index=False
        ).to_numpy()
        df["__bucket"] = (pair_hash % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_counts(g: pd.DataFrame) -> pa.Table:
        part = (
            g[[key_col, value_col]]
            .drop_duplicates()
            .groupby(key_col, sort=False)
            .size()
            .reset_index(name="__n")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    partials = (
        ds.map_batches(local_pairs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_counts, batch_format="pandas")
    )
    out = partials.groupby(key_col).sum("__n")
    return out.map_batches(
        lambda t: pa.table(
            {
                key_col: t.column(key_col),
                "n_distinct": pc.cast(t.column("sum(__n)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


_TOKEN_RE = r"\w+"


def doc_frequency(
    ds: rd.Dataset,
    col: str = "text",
    min_df: int = 1,
) -> rd.Dataset:
    """Document frequency + smoothed IDF per term (the global half of
    TF-IDF — the per-doc TF side is a stateless map once this small
    table is broadcast).

    Per block: tokenize (lowercased ``\\w+``), dedup terms WITHIN each
    doc, count docs per term — one partial row per (term, block). The
    shuffle then moves term partials (vocabulary-sized), never the
    corpus, and a tiny groupby sums them. ``idf = ln((1+N)/(1+df)) + 1``
    (sklearn's smooth variant), rounded to 6 so a SQL oracle reproduces
    it with ``round(ln(...), 6)``.
    """
    n_docs = ds.count()

    def partial_df(t: pa.Table) -> pd.DataFrame:
        texts = t.column(col).to_pandas()
        if len(texts) == 0:
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 "__df": pd.Series([], dtype=np.int64)})
        toks = texts.str.lower().str.findall(_TOKEN_RE)
        ex = toks.explode().dropna()
        # within-doc dedup without a per-row Python set(): explode keeps
        # the doc's positional index, so (doc, term) drop_duplicates is
        # one vectorized pass
        pairs = pd.DataFrame(
            {"d": ex.index.to_numpy(), "term": ex.to_numpy(dtype=object)}
        ).drop_duplicates()
        part = pairs["term"].value_counts()
        return pd.DataFrame({"term": part.index.to_numpy(dtype=object),
                             "__df": part.to_numpy(dtype=np.int64)})

    summed = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .sum("__df")
    )

    def finish(t: pa.Table) -> pa.Table:
        df_ = t.column("sum(__df)").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = df_ >= min_df
        df_k = df_[keep]
        idf = round_half_away(np.log((1.0 + n_docs) / (1.0 + df_k)) + 1.0, 6)
        return pa.table(
            {
                "term": pc.cast(t.column("term"), pa.string()).filter(
                    pa.array(keep)
                ),
                "df": pa.array(df_k),
                "idf": pa.array(idf),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length of uint64 values (bitlength(0) = 0):
    float log2 seeds the answer, integer shifts repair the
    power-of-two off-by-ones exactly — matches SQL ``length(bin(w))``."""
    nz = w > 0
    bitlen = np.zeros(len(w), dtype=np.int32)
    bitlen[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int32) + 1
    too_hi = nz & (w >> np.clip(bitlen, 0, 63).astype(np.uint64) > 0)
    bitlen[too_hi] += 1
    too_lo = nz & (w < (np.uint64(1) << np.clip(bitlen - 1, 0, 63).astype(np.uint64)))
    bitlen[too_lo] -= 1
    return bitlen


def windowed_hll_registers(
    ds: rd.Dataset,
    ts_col: str,
    value_col: str,
    p: int = 6,
    window_s: int = 3600,
    combine_cap: int = 1_000_000,
):
    """Per-window HyperLogLog registers — COUNT(DISTINCT value) per
    tumbling time window with BOUNDED state per window (2^p mergeable
    ints), the streaming-sketch pattern a 100 TB event pipeline needs
    where exact per-window distinct would buffer every key.

    Each block emits ≤ (windows-in-block × 2^p) partial registers that
    merge by MAX; bounded streams combine on the driver, bigger ones
    fall back to one distributed groupby-max over the partials (the
    grouped_mode policy). Output (hour, bucket, rho) is integer-exact
    and md5-derived, so a SQL oracle rebuilds it register-for-register.
    """
    w_bits = 64 - p
    window_us = window_s * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        # normalize to µs first — inputs may carry ns or us timestamps
        us = pc.cast(
            pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy()
        hour = us // window_us
        vals = t.column(value_col).to_pandas().astype(str)
        h = md5_hash64_many(vals.to_numpy(dtype=object))
        bucket = (h >> np.uint64(w_bits)).astype(np.int32)
        w = h & np.uint64((1 << w_bits) - 1)
        rho = (w_bits - _bitlen_u64(w) + 1).astype(np.int32)
        df = pd.DataFrame({"hour": hour, "bucket": bucket, "rho": rho})
        part = df.groupby(["hour", "bucket"], sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(part, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    frames: list[pd.DataFrame] = []
    total, fits = 0, True
    for b in partials.iter_batches(batch_size=65536, batch_format="pandas"):
        frames.append(b)
        total += len(b)
        if total > 4 * combine_cap:
            merged = pd.concat(frames, ignore_index=True).groupby(
                ["hour", "bucket"], as_index=False
            )["rho"].max()
            frames, total = [merged], len(merged)
            if total > combine_cap:
                fits = False
                break
    if fits:
        if not frames:
            return pa.table({"hour": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32()),
                             "rho": pa.array([], pa.int32())})
        regs = pd.concat(frames, ignore_index=True).groupby(
            ["hour", "bucket"], as_index=False
        )["rho"].max()
        return pa.table(
            {
                "hour": pa.array(regs["hour"].to_numpy(np.int64)),
                "bucket": pa.array(regs["bucket"].to_numpy(np.int32)),
                "rho": pa.array(regs["rho"].to_numpy(np.int32)),
            }
        )
    # distributed fallback (lazy partials re-execute)
    agg = partials.groupby(["hour", "bucket"]).max("rho")
    return agg.map_batches(
        lambda t: pa.table(
            {
                "hour": pc.cast(t.column("hour"), pa.int64()),
                "bucket": pc.cast(t.column("bucket"), pa.int32()),
                "rho": pc.cast(t.column("max(rho)"), pa.int32()),
            }
        ),
        batch_format="pyarrow",
    )


def hll_registers(
    ds: rd.Dataset,
    value_col: str,
    p: int = 10,
) -> pa.Table:
    """HyperLogLog register table for COUNT(DISTINCT value), 2^p
    registers (Flajolet et al. 2007).

    ``h = md5-derived uint64(value)``; register index = top ``p`` bits;
    rho = leading-zero count of the remaining ``64-p`` bits + 1 (rho =
    65-p when they are all zero). Registers merge by MAX, so each block
    emits its ≤2^p partial registers and ONE small groupby(bucket).max
    finishes — the only state that ever moves is 2^p ints per block,
    which is what makes this the 100 TB path when exact
    :func:`count_distinct` would shuffle too many pairs.

    Output (bucket, rho) contains only non-empty registers and is
    integer-exact — a SQL oracle recomputes it from the same md5 hash
    (the float estimate, :func:`hll_estimate`, is derived client-side).
    """
    w_bits = 64 - p

    def partial(t: pa.Table) -> pd.DataFrame:
        vals = t.column(value_col).to_pandas().astype(str)
        empty = pd.DataFrame({"bucket": pd.Series([], dtype=np.int32),
                              "rho": pd.Series([], dtype=np.int32)})
        if len(vals) == 0:
            return empty
        h = md5_hash64_many(vals.to_numpy(dtype=object))
        bucket = (h >> np.uint64(w_bits)).astype(np.int32)
        w = h & np.uint64((1 << w_bits) - 1)
        # rho = w_bits - bitlength(w) + 1; bitlength(0) treated as 0
        rho = (w_bits - _bitlen_u64(w) + 1).astype(np.int32)
        part = pd.DataFrame({"bucket": bucket, "rho": rho}).groupby(
            "bucket", sort=False
        )["rho"].max().reset_index()
        return part

    # registers are sketch-sized BY DESIGN (≤2^p rows per block), so the
    # final MAX-merge is a driver combine of partials — the same bounded-
    # key pattern as pipelines/queries/_core.py::_combine_partials; a Ray
    # groupby here would pay a full sort-shuffle launch (~3 s fixed) to
    # merge a few thousand ints. At extreme block counts (100 TB ⇒ ~1e5
    # blocks ⇒ ≤1e8 partial rows) insert one coalescing repartition
    # before the combine; the state itself never grows past 2^p.
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pa.table({"bucket": pa.array([], pa.int32()),
                         "rho": pa.array([], pa.int32())})
    regs = parts.groupby("bucket", sort=True)["rho"].max().reset_index()
    return pa.table(
        {
            "bucket": pa.array(regs["bucket"].to_numpy(np.int32)),
            "rho": pa.array(regs["rho"].to_numpy(np.int32)),
        }
    )


def hll_estimate(registers: pa.Table, p: int = 10) -> float:
    """Cardinality estimate from a register table (standard HLL with
    small-range linear counting; no large-range correction — 64-bit
    hashes don't need it)."""
    m = 1 << p
    rho = np.zeros(m, dtype=np.int32)
    rho[registers.column("bucket").to_numpy()] = registers.column("rho").to_numpy()
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
    zeros = int(np.sum(rho == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def grouped_mode(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    num_buckets: int = 64,
    combine_cap: int | None = 500_000,
):
    """Exact MODE(value) per key — the most frequent value, ties broken
    by smallest value (so the winner is unique and SQL-reproducible via
    ``ROW_NUMBER() OVER (ORDER BY n DESC, value)``).

    Everything downstream of the input scan moves COUNTS, never rows:
    blocks emit partial (key, value, n) counts. When the distinct-pair
    stream compacts under ``combine_cap`` the argmax finishes on the
    driver in one pass (two Ray sort-groupby launches cost ~2 s fixed
    each at ANY scale — the bounded-partials combine is the fast path
    exactly as in ``pipelines/queries._combine_partials``). Otherwise
    the distributed plan runs: a pair-hash bucket shuffle co-locates
    equal pairs so per-bucket sums are globally exact (same bucketing
    proof as :func:`count_distinct`), then the pair-count table
    re-buckets by KEY and a vectorized sort + drop_duplicates kernel
    picks each key's argmax. Output: ``(key, value, mode_n)``; the fast
    path returns an Arrow table, the distributed path a Dataset."""

    def local_counts(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: t.column(key_col).to_numpy(zero_copy_only=False),
                value_col: t.column(value_col).to_numpy(zero_copy_only=False),
            }
        )
        part = df.groupby([key_col, value_col], sort=False).size().reset_index(
            name="__n"
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    partials = ds.map_batches(local_counts, batch_format="pyarrow")

    def _argmax_frame(summed: pd.DataFrame) -> pa.Table:
        g = summed.sort_values(
            [key_col, "__n", value_col], ascending=[True, False, True]
        ).drop_duplicates(key_col, keep="first")
        return pa.table(
            {
                key_col: pa.array(g[key_col].to_numpy()),
                value_col: pa.array(g[value_col].to_numpy()),
                "mode_n": pa.array(g["__n"].to_numpy(np.int64), pa.int64()),
            }
        )

    if combine_cap:
        frames: list[pd.DataFrame] = []
        total, fits = 0, True
        for b in partials.iter_batches(batch_size=65536, batch_format="pandas"):
            frames.append(b)
            total += len(b)
            if total > 4 * combine_cap:
                merged = pd.concat(frames, ignore_index=True).groupby(
                    [key_col, value_col], as_index=False
                )["__n"].sum()
                frames, total = [merged], len(merged)
                if total > combine_cap:
                    fits = False
                    break
        if fits:
            if not frames:
                return _argmax_frame(
                    pd.DataFrame(columns=[key_col, value_col, "__n"])
                )
            summed = pd.concat(frames, ignore_index=True).groupby(
                [key_col, value_col], as_index=False
            )["__n"].sum()
            return _argmax_frame(summed)

    # distributed plan (partials are lazy — this simply re-executes them)
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        pair_hash = pd.util.hash_pandas_object(
            df[[key_col, value_col]], index=False
        ).to_numpy()
        df["__bucket"] = (pair_hash % np.uint64(num_buckets)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pair_sums(g: pd.DataFrame) -> pa.Table:
        part = (
            g.groupby([key_col, value_col], sort=False)["__n"]
            .sum()
            .reset_index()
        )
        key = part[key_col].to_numpy()
        part["__bucket"] = _bucket_of(key, num_buckets)
        return pa.Table.from_pandas(part, preserve_index=False)

    def argmax_of_key(g: pd.DataFrame) -> pa.Table:
        return _argmax_frame(g)

    pairs = (
        partials.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pair_sums, batch_format="pandas")
    )
    return pairs.groupby("__bucket").map_groups(
        argmax_of_key, batch_format="pandas"
    )


def cms_counts(
    ds: rd.Dataset,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> np.ndarray:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over a key
    column: a ``depth × width`` int64 counter matrix where row ``r``
    counts keys by ``md5-derived-hash('cms{r}:' || key) % width``.

    The third mergeable sketch beside HLL and the bloom filter, and the
    frequency counterpart to HLL's cardinality: rows merge by ADDITION,
    so each block emits ONE fixed 32 KB partial matrix (at the default
    geometry) and the driver sums them — bounded state regardless of
    data scale, the 100 TB path when exact per-key counts would shuffle
    the whole key domain. Estimates read back as the MIN over rows
    (:func:`cms_estimate_many`): never an undercount, overcounts bounded
    by collisions (ε ≈ e/width of total mass, δ ≈ e^-depth).

    Integer-exact and hash-reproducible: a SQL oracle rebuilds the same
    registers from the same md5 scheme, so the sketch itself — not a
    float summary — is the gated artifact."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(value_col).to_pandas().astype(str).to_numpy(dtype=object)
        m = np.zeros((depth, width), dtype=np.int64)
        for r in range(depth):
            h = md5_hash64_many([f"cms{r}:{v}" for v in vals]) % np.uint64(width)
            m[r] = np.bincount(h.astype(np.int64), minlength=width)
        return pa.table({"m": pa.array([m.tobytes()], pa.binary())})

    total = np.zeros((depth, width), dtype=np.int64)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for buf in b.column("m").to_pylist():
            total += np.frombuffer(buf, dtype=np.int64).reshape(depth, width)
    return total


def cms_counts_and_keys(
    ds: rd.Dataset,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """One-pass variant of :func:`cms_counts` that also returns the
    sorted distinct key set (for bounded key domains, where the caller
    wants point estimates for every key without a second scan): each
    block ships its partial matrix PLUS its distinct keys as one row —
    still bounded state per block, one job instead of two."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(value_col).to_pandas().astype(str).to_numpy(dtype=object)
        m = np.zeros((depth, width), dtype=np.int64)
        for r in range(depth):
            h = md5_hash64_many([f"cms{r}:{v}" for v in vals]) % np.uint64(width)
            m[r] = np.bincount(h.astype(np.int64), minlength=width)
        uk = np.unique(t.column(value_col).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "m": pa.array([m.tobytes()], pa.binary()),
                "keys": pa.array([uk.astype(np.int64).tobytes()], pa.binary()),
            }
        )

    total = np.zeros((depth, width), dtype=np.int64)
    key_parts: list[np.ndarray] = []
    for b in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for buf, kbuf in zip(
            b.column("m").to_pylist(), b.column("keys").to_pylist()
        ):
            total += np.frombuffer(buf, dtype=np.int64).reshape(depth, width)
            key_parts.append(np.frombuffer(kbuf, dtype=np.int64))
    keys = (
        np.unique(np.concatenate(key_parts))
        if key_parts
        else np.zeros(0, dtype=np.int64)
    )
    return total, keys


def cms_estimate_many(
    sketch: np.ndarray, keys, depth: int = 4, width: int = 1024
) -> np.ndarray:
    """Point-query the sketch for each key: ``min_r sketch[r][h_r(key)]``
    — ≥ the true count, with the standard (ε, δ) overcount bound."""
    keys = [str(k) for k in keys]
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        h = md5_hash64_many([f"cms{r}:{k}" for k in keys]) % np.uint64(width)
        est = np.minimum(est, sketch[r][h.astype(np.int64)])
    return est


def group_quantiles(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    num_buckets: int = 32,
) -> rd.Dataset:
    """Exact linear-interpolated quantiles per key (numpy's default /
    SQL ``quantile_cont`` semantics), vectorized across all keys of a
    bucket: one lexsort, per-key segment arithmetic on the sorted
    array, zero per-key Python. Exactness requires each key's values to
    co-locate (the documented per-key memory bound); for sketch-sized
    state at 100 TB swap in a mergeable digest the same way
    :func:`hll_registers` replaces :func:`count_distinct`."""

    def bucket_col(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__bucket", pa.array([], pa.int32()))
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("__bucket", pa.array(_bucket_of(key, num_buckets)))

    q_arr = np.asarray(qs, dtype=np.float64)

    def quantiles_of_bucket(g: pd.DataFrame) -> pa.Table:
        key = g[key_col].to_numpy()
        val = g[value_col].to_numpy(dtype=np.float64)
        order = np.lexsort((val, key))
        k, v = key[order], val[order]
        n = len(k)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        out = {key_col: k[starts], "n": lens.astype(np.int64)}
        last = starts + lens - 1
        for q in q_arr:
            pos = starts + q * (lens - 1)
            lo = np.floor(pos).astype(np.int64)
            hi = np.minimum(lo + 1, last)
            frac = pos - lo
            out[f"q{int(round(q * 100))}"] = round_half_away(
                v[lo] + (v[hi] - v[lo]) * frac, 6
            )
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    return (
        ds.map_batches(bucket_col, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(quantiles_of_bucket, batch_format="pandas")
    )


def pivot_counts(
    ds: rd.Dataset,
    key_col: str,
    col: str,
    categories: list[str],
) -> rd.Dataset:
    """Wide per-key category counts (the PIVOT/crosstab dataflow):
    blocks emit one wide partial row per distinct key — ``n_<cat>``
    columns plus ``n_total`` — and everything downstream merges by SUM
    (the caller finishes with ``_combine_partials`` for bounded key
    domains or one distributed ``groupby(key).sum`` otherwise). The
    category list is fixed up front, so the exchange carries
    ``distinct keys × blocks`` rows of ints, never the input rows.
    Unlisted categories land only in ``n_total``."""

    cat_idx = {c: i for i, c in enumerate(categories)}

    def partial(t: pa.Table) -> pa.Table:
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        cat = t.column(col).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        m = np.zeros((len(uk), len(categories) + 1), dtype=np.int64)
        code = np.array([cat_idx.get(c, -1) for c in cat], dtype=np.int64)
        hit = code >= 0
        np.add.at(m, (inv[hit], code[hit]), 1)
        np.add.at(m, (inv, len(categories)), 1)  # n_total counts every row
        out = {key_col: pa.array(uk)}
        for c, i in cat_idx.items():
            out[f"n_{c}"] = pa.array(m[:, i], pa.int64())
        out["n_total"] = pa.array(m[:, -1], pa.int64())
        return pa.table(out)

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None)


def robust_scale(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    out_col: str = "value_scaled",
) -> rd.Dataset:
    """Per-key robust scaling: ``(value - median) / IQR`` — the feature
    normalization pass of a training pipeline, in two phases:

    1. grouped quartiles via :func:`group_quantiles` (already
       hash-gate-proven ULP-equal to SQL ``quantile_cont``), gathered
       driver-side — bounded by key cardinality, the documented
       contract of every broadcast stat here;
    2. one stateless ``map_batches`` pass with the (median, IQR) table
       broadcast via ``ray.put`` — no shuffle touches the rows.

    Determinism: the quartiles are rounded to 6 decimals INSIDE the
    quantile kernel, so both sides of the gate scale with bit-identical
    operands; degenerate keys (IQR = 0) emit 0."""
    import ray

    stats = group_quantiles(ds, key_col, value_col, qs=(0.25, 0.5, 0.75)).to_pandas()
    med = pd.Series(stats["q50"].to_numpy(), index=stats[key_col])
    iqr = pd.Series(
        stats["q75"].to_numpy() - stats["q25"].to_numpy(), index=stats[key_col]
    )
    ref = ray.put((med, iqr))

    def scale(t: pa.Table) -> pa.Table:
        m, q = ray.get(ref)
        key = pd.Series(t.column(key_col).to_numpy(zero_copy_only=False))
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mv = key.map(m).to_numpy(dtype=np.float64)
        qv = key.map(q).to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = round_half_away((v - mv) / qv, 6)
        z[qv == 0] = 0.0
        return t.append_column(out_col, pa.array(z, pa.float64()))

    return ds.map_batches(scale, batch_format="pyarrow")


def tfidf_topk(
    ds: rd.Dataset,
    idf_table: pa.Table,
    id_col: str = "doc_id",
    col: str = "text",
    k: int = 3,
) -> rd.Dataset:
    """Top-k TF-IDF terms per document, given the (small) global IDF
    table from :func:`doc_frequency`.

    The IDF table is vocabulary-sized, so it broadcasts once via
    ``ray.put`` and every task reads it zero-copy from the local object
    store — the classic broadcast-small-side pattern (no shuffle at
    all: the whole operator is one stateless ``map_batches`` pass).
    Score = term count in the doc × idf, ranked (score DESC, term ASC);
    terms absent from the IDF table (e.g. pruned by min_df) score 0 and
    are dropped.
    """
    import ray

    idf_ref = ray.put(
        pd.Series(
            idf_table.column("idf").to_numpy(),
            index=pd.Index(idf_table.column("term").to_pylist(), dtype=object),
        )
    )

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], t.column(id_col).type),
                "term": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        idf: pd.Series = ray.get(idf_ref)
        ids = t.column(id_col).to_pandas()
        toks = t.column(col).to_pandas().str.lower().str.findall(_TOKEN_RE)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return empty
        # tf per (doc, term) in one vectorized groupby; idf joins via an
        # indexed Series.map (hash lookup in C) — no per-doc Python
        tf = (
            pd.DataFrame(
                {"d": ex.index.to_numpy(), "term": ex.to_numpy(dtype=object)}
            )
            .groupby(["d", "term"], sort=False)
            .size()
            .reset_index(name="c")
        )
        tf["idf"] = tf["term"].map(idf)
        tf = tf.dropna(subset=["idf"])
        if len(tf) == 0:
            return empty
        # round BEFORE ranking: rank and emitted value must be the same
        # quantity or a tie at 6 decimals could rank differently from
        # the value a SQL oracle sorts by
        sc = round_half_away(tf["c"].to_numpy(np.float64) * tf["idf"].to_numpy(), 6)
        order, rank = _rank_in_key(
            tf["d"].to_numpy(), sc, tf["term"].to_numpy(dtype=object)
        )
        keep = rank < k
        sel = order[keep]
        return pa.table(
            {
                id_col: pa.array(
                    ids.iloc[tf["d"].to_numpy()[sel]].to_numpy(),
                    t.column(id_col).type,
                ),
                "term": pa.array(tf["term"].to_numpy(dtype=object)[sel], pa.string()),
                "score": pa.array(sc[sel], pa.float64()),
                "rank": pa.array((rank[keep] + 1).astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def profile_columns(
    ds: rd.Dataset,
    int_cols: dict[str, str],
) -> pa.Table:
    """One-pass column profiler — the data-quality sweep every ingest
    runs before training: per column (row count, null count, int64
    min/max). ``int_cols`` maps column name → kind (``"int"`` or
    ``"ts"``; timestamps profile as epoch-µs so min/max stay exact
    integers — float formatting never crosses the hash gate).

    Per-batch partials are one ROW PER COLUMN (never per value), so the
    driver combine is bounded by columns × blocks at any data size;
    merge rules are sum/sum/min/max."""

    cols = list(int_cols)

    def partial(t: pa.Table) -> pd.DataFrame:
        rows = []
        for c in cols:
            col = t.column(c)
            n = len(col)
            n_null = col.null_count
            if int_cols[c] == "ts":
                v = col.cast(pa.timestamp("us")).cast(pa.int64())
            else:
                v = col.cast(pa.int64())
            vmin = pc.min(v).as_py()
            vmax = pc.max(v).as_py()
            rows.append((c, n, n_null, vmin, vmax))
        return pd.DataFrame(
            rows, columns=["col", "n", "n_null", "min_i", "max_i"]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("col", as_index=False).agg(
        n=("n", "sum"), n_null=("n_null", "sum"),
        min_i=("min_i", "min"), max_i=("max_i", "max"),
    )
    g = g.sort_values("col").reset_index(drop=True)
    return pa.table(
        {
            "col": pa.array(g["col"], pa.string()),
            "n": pa.array(g["n"].to_numpy(), pa.int64()),
            "n_null": pa.array(g["n_null"].to_numpy(), pa.int64()),
            "min_i": pa.array(g["min_i"].to_numpy(), pa.int64()),
            "max_i": pa.array(g["max_i"].to_numpy(), pa.int64()),
        }
    )
