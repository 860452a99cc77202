"""Bloom-filtered distributed semi-join.

The scale problem: ``fact ⋉ dim`` (keep fact rows whose key exists in a
filtered dimension) as a plain hash join shuffles the ENTIRE fact side —
at 100 TB that is the whole corpus through the object store even when
only a few percent of rows survive. The classic fix is bloom-filter
pushdown:

1. summarize the small side's key set as an m-bit Bloom filter, built
   DISTRIBUTEDLY — each small-side block emits a partial bit array and
   the driver ORs them (the HLL move: bounded mergeable state, a few
   hundred KB regardless of data scale);
2. broadcast the bits once via ``ray.put`` and apply them MAP-ONLY to
   the streaming fact side — no shuffle, each block drops every row the
   filter rules out (no false negatives, ~``fpp`` false positives);
3. run the EXACT distributed hash semi-join on the survivors only, so
   the all-to-all exchange moves ``match_rate + fpp`` of the fact bytes
   instead of all of them.

Correctness does not depend on the filter: step 3 removes the false
positives, the bloom only prunes bytes. The reference has no relational
joins at all (its only lookups are the Redis URL-seen set,
/root/reference/pkg/scraper/redis.go:20-41); this is part of the
beyond-reference relational/LLM-data operator suite.

Hashing: two independent 64-bit splitmix64 streams double-hashed into k
probe positions (Kirsch–Mitzenmacher), pure numpy on uint64 — one
vectorized pass per probe, zero per-row Python.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)
_H2_SALT = np.uint64(0xA5A5A5A55A5A5A5A)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = x.astype(np.uint64, copy=True) + _SM_GAMMA
    z ^= z >> np.uint64(30)
    z *= _SM_M1
    z ^= z >> np.uint64(27)
    z *= _SM_M2
    z ^= z >> np.uint64(31)
    return z


class Bloom:
    """Fixed-size Bloom filter over int64/uint64 keys; the bit array is
    a numpy uint64 word vector, so partials merge with a single ``|=``
    and broadcast as one contiguous buffer."""

    def __init__(self, n_items: int, fpp: float = 0.008):
        n = max(1, int(n_items))
        m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        self.m_bits = max(64, ((m + 63) // 64) * 64)
        self.k = max(1, round(self.m_bits / n * math.log(2)))
        self.words = np.zeros(self.m_bits // 64, dtype=np.uint64)

    def _probes(self, keys: np.ndarray):
        u = keys.astype(np.int64, copy=False).view(np.uint64)
        h1 = splitmix64(u)
        h2 = splitmix64(u ^ _H2_SALT) | np.uint64(1)
        m = np.uint64(self.m_bits)
        for i in range(self.k):
            yield (h1 + np.uint64(i) * h2) % m

    def add_many(self, keys: np.ndarray) -> None:
        for pos in self._probes(keys):
            np.bitwise_or.at(
                self.words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Membership mask — no false negatives."""
        out = np.ones(len(keys), dtype=bool)
        for pos in self._probes(keys):
            w = self.words[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (w >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out


def build_bloom(keys_ds: rd.Dataset, key_col: str, n_items: int,
                fpp: float = 0.008) -> Bloom:
    """Distributed build: each block sets bits into its own partial
    filter (identical geometry), the driver ORs the bounded partials —
    one word vector per block crosses the wire, never the keys."""
    proto = Bloom(n_items, fpp)
    m_bits, k = proto.m_bits, proto.k

    def partial(t: pa.Table) -> pa.Table:
        b = Bloom(n_items, fpp)
        assert (b.m_bits, b.k) == (m_bits, k)
        b.add_many(t.column(key_col).to_numpy(zero_copy_only=False))
        return pa.table({"bits": pa.array([b.words.tobytes()], pa.binary())})

    for batch in keys_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in batch.column("bits").to_pylist():
            proto.words |= np.frombuffer(buf, dtype=np.uint64)
    return proto


def bloom_semi_join(
    fact: rd.Dataset,
    dim_keys: rd.Dataset,
    fact_key: str,
    dim_key: str,
    num_partitions: int,
    fpp: float = 0.008,
    broadcast_limit: int = 4_000_000,
) -> rd.Dataset:
    """``fact ⋉ dim_keys`` — exact semi-join with bloom pushdown.

    ``dim_keys`` must carry UNIQUE keys in ``dim_key`` (the caller
    dedupes if its dimension isn't keyed); the final inner join is then
    exactly the semi-join and emits each matching fact row once. The
    broadcast is one ``ray.put`` of the bit words, read zero-copy by
    every prefilter task.

    Auto-switch (same policy as the as-of join's broadcast path): when
    the key set itself fits a broadcast (≤ ``broadcast_limit`` keys —
    a sorted int64 array, 32 MB at the default), the EXACT membership
    filter runs map-only via ``np.isin`` against the broadcast keys and
    no join ships a single fact row; the bloom stage only earns its
    keep when the key set is too big to broadcast exactly, which is
    precisely when the verify join needs its shuffle volume pruned."""
    # the small side is consumed up to three times (count, bloom build,
    # the verify join) — pin it; it is dimension-sized by contract
    dim_keys = dim_keys.materialize()
    n_keys = dim_keys.count()
    fact_cols = list(fact.schema().names)

    if n_keys <= broadcast_limit:
        keys = np.sort(dim_keys.to_pandas()[dim_key].to_numpy())
        keys_ref = ray.put(keys)

        def exact_filter(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            col = t.column(fact_key).to_numpy(zero_copy_only=False)
            if len(ks) == 0:
                return t.filter(pa.array(np.zeros(len(col), dtype=bool)))
            pos = np.clip(np.searchsorted(ks, col), 0, len(ks) - 1)
            return t.filter(pa.array(ks[pos] == col))

        return fact.map_batches(exact_filter, batch_format="pyarrow")

    bloom = build_bloom(dim_keys, dim_key, n_items=n_keys, fpp=fpp)
    m_bits, k = bloom.m_bits, bloom.k
    bits_ref = ray.put(bloom.words)

    def prefilter(t: pa.Table) -> pa.Table:
        b = Bloom.__new__(Bloom)
        b.m_bits, b.k = m_bits, k
        b.words = ray.get(bits_ref)
        keys = t.column(fact_key).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(b.contains_many(keys)))

    survivors = fact.map_batches(prefilter, batch_format="pyarrow")
    joined = survivors.join(
        dim_keys,
        join_type="inner",
        num_partitions=num_partitions,
        on=(fact_key,),
        right_on=(dim_key,),
    )
    return joined.map_batches(
        lambda t: t.select(fact_cols), batch_format="pyarrow"
    )
