"""Sharded URL-seen set (T1/J2) — the one shared mutable index.

The reference's visited-set lives inside the colly collector
(/root/reference/pkg/scraper/scraper.go:79-88); the anti-semi-join of
candidates against it happens implicitly at ``c.Visit``
(scraper.go:196). Here it is S ``@ray.remote`` cuckoo-shard actors —
raw actors on purpose: a monotonically growing, mutated-in-place
membership index is exactly the state the Dataset API cannot express
(SURVEY §2.3 T1). Everything around them stays in the Dataset world: a
``map_batches`` stage partitions each Arrow batch by the stable
``url_hash % S`` (SURVEY §7.3) and issues one ``add_if_absent`` RPC per
touched shard, in parallel.

Scale notes (10^10-URL frontier): routing is by stable hash, so each
shard sees 1/S of the keyspace regardless of host skew; per-batch
within-batch dedup (np.unique) cuts RPC payload by the duplicate factor
before any network hop; shards serialize to the checkpoint dir per wave
(state/checkpoint.py). Admission = membership insert BEFORE fetch
visibility — colly marks visited at Visit time, which is what makes
resume duplicate-free (SURVEY §4.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.cuckoo import CuckooFilter


@ray.remote(num_cpus=0.25)
class UrlSeenShard:
    """One cuckoo shard.

    num_cpus=0.25 is load-bearing: with a lower reservation the shards
    starve whenever the map stages saturate every CPU, and the seen
    stage (blocked in ray.get on the shards) stalls the whole pipeline —
    S=16 shards reserve 4 CPUs, guaranteeing admission throughput at any
    cluster width."""

    def __init__(self, capacity: int = 1 << 16, exact: bool = True):
        self.filter = CuckooFilter(capacity=capacity, exact=exact)

    def add_if_absent(self, keys: np.ndarray) -> np.ndarray:
        return self.filter.add_if_absent(keys)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self.filter.contains_many(keys)

    def snapshot(self) -> bytes:
        return self.filter.serialize()

    def restore(self, data: bytes) -> None:
        self.filter = CuckooFilter.restore(data)

    def count(self) -> int:
        return self.filter.count


def create_shards(num_shards: int, capacity: int, exact: bool = True) -> list:
    return [
        UrlSeenShard.remote(capacity=capacity, exact=exact) for _ in range(num_shards)
    ]


_WORKER_SEEN_CACHE: dict = {}
_CACHE_CAP = 20_000_000  # keys per worker before reset (cache is advisory)


class SeenFilter:
    """``map_batches`` callable: keep only rows whose url was never seen,
    admitting them to the seen set in the same step (seen-before-fetch).

    Duplicate urls inside one batch are collapsed before the RPC; across
    concurrent batches the shard actor serializes calls, so exactly one
    batch wins each url (which one is arbitrary — it only decides which
    ``discovered_from`` survives, excluded from golden correctness).

    **Worker-local seen cache**: membership is MONOTONE (once seen, always
    seen), so caching *seen* verdicts locally is always correct. Each
    worker keeps a per-crawl sorted-array cache of every key a shard has
    ever answered "seen" (or this worker admitted); with web-graph dup
    factors of 5-10× this removes most shard RPC traffic — the fix for
    many filter tasks blocking in ``ray.get`` on few shard actors. The
    cache is advisory: resetting it (cap hit) only re-asks shards.
    """

    def __init__(self, shards: list):
        self.shards = shards
        self.num_shards = len(shards)
        self._cache_key = tuple(str(s) for s in shards)

    def _cache(self):
        from ..state.cuckoo import _ExactStore

        store = _WORKER_SEEN_CACHE.get(self._cache_key)
        if store is None or len(store) > _CACHE_CAP:
            store = _ExactStore()
            _WORKER_SEEN_CACHE[self._cache_key] = store
        return store

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        cache = self._cache()
        hashes = batch.column("url_hash").to_numpy().astype(np.uint64)
        uniq, first_idx = np.unique(hashes, return_index=True)
        fresh = ~cache.contains(uniq)  # cache hit ⇒ definitely seen
        uniq, first_idx = uniq[fresh], first_idx[fresh]
        keep_mask = np.zeros(n, dtype=bool)
        if uniq.size:
            shard_of = (uniq % np.uint64(self.num_shards)).astype(np.int64)
            futures = []
            touched = []
            for s in range(self.num_shards):
                sel = shard_of == s
                if sel.any():
                    futures.append(self.shards[s].add_if_absent.remote(uniq[sel]))
                    touched.append(first_idx[sel])
            for fut, idx in zip(ray.get(futures), touched):
                keep_mask[idx[fut]] = True
            cache.add_many(uniq)  # every asked key is now seen crawl-wide
        return batch.filter(pa.array(keep_mask))
