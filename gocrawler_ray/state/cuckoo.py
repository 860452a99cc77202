"""Cuckoo filter for the URL-seen set (T1/J2).

Replaces the reference's in-process colly visited-map
(/root/reference/pkg/scraper/scraper.go:79-88, go.mod:13) with a
serializable, shardable structure:

- partial-key cuckoo hashing: 4-slot buckets, 16-bit fingerprints,
  ``i2 = i1 XOR h(fp)`` (Fan et al., "Cuckoo Filter: Practically Better
  Than Bloom", CoNEXT 2014);
- **no false negatives**: inserts that fail after max kicks park the
  displaced fingerprint in a victim list the membership check consults;
- **exact membership**: the filter is the O(1) fast path that rejects the
  never-seen majority; cuckoo-positives (true dups + ~2^-13 FPs) are
  confirmed against an exact key store. The north rule demands the final
  URL-seen set match the reference exactly, so exactness is part of the
  contract. The exact store is a sorted uint64 array + a small pending
  set (merged geometrically), so the dup-heavy membership path is a
  vectorized ``searchsorted``, not a Python set loop, and serialization
  is a flat ``tobytes`` — both matter at 10^8-keys-per-shard scale. A
  deployment that tolerates FP-rate crawl loss can set ``exact=False``.
- serialize()/restore() round-trip bit-identically for checkpointing
  (SURVEY §4.3).

Keys are stable 64-bit url hashes (``functions.urls.url_hash64``), never
Python's salted ``hash``.
"""

from __future__ import annotations

import io
import pickle

import numpy as np

_KICKS = 500
_SLOTS = 4
_MERGE_THRESHOLD = 8192

# Mixing constants (splitmix64 finalizer) — derive bucket index and
# fingerprint from independent bit regions of the key.
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix(keys: np.ndarray) -> np.ndarray:
    x = keys.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _M1
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


class _ExactStore:
    """Exact uint64 membership: sorted array + pending set, geometric merge."""

    def __init__(self):
        self.sorted = np.zeros(0, dtype=np.uint64)
        self.pending: set[int] = set()
        self.pending_arrays: list[np.ndarray] = []

    def __contains__(self, k: int) -> bool:  # pragma: no cover - debug aid
        return bool(self.contains(np.array([k], dtype=np.uint64))[0])

    def contains(self, keys: np.ndarray) -> np.ndarray:
        out = np.zeros(keys.size, dtype=bool)
        if self.sorted.size:
            pos = np.searchsorted(self.sorted, keys)
            pos = np.clip(pos, 0, self.sorted.size - 1)
            out = self.sorted[pos] == keys
        for arr in self.pending_arrays:
            miss = ~out
            if not miss.any():
                return out
            pos = np.clip(np.searchsorted(arr, keys[miss]), 0, arr.size - 1)
            out[np.nonzero(miss)[0][arr[pos] == keys[miss]]] = True
        if self.pending:
            p = self.pending
            for j in np.nonzero(~out)[0]:
                if int(keys[j]) in p:
                    out[j] = True
        return out

    def add(self, k: int) -> None:
        self.pending.add(k)
        # geometric threshold: each merge re-sorts everything, so merging
        # every fixed-size batch is O(n²) as the store grows
        if len(self.pending) >= max(_MERGE_THRESHOLD, self.sorted.size // 4):
            self._merge()

    def add_many(self, keys: np.ndarray) -> None:
        """Bulk add (vectorized path for the worker-local seen cache)."""
        if keys.size == 0:
            return
        self.pending_arrays.append(np.sort(np.asarray(keys, dtype=np.uint64)))
        total = sum(a.size for a in self.pending_arrays)
        if len(self.pending_arrays) > 16 or total >= max(
            4 * _MERGE_THRESHOLD, self.sorted.size // 2
        ):
            self._merge()

    def _merge(self) -> None:
        parts = [self.sorted] + self.pending_arrays
        if self.pending:
            parts.append(
                np.fromiter(self.pending, dtype=np.uint64, count=len(self.pending))
            )
        if len(parts) > 1:
            self.sorted = np.sort(np.concatenate(parts))
            self.pending = set()
            self.pending_arrays = []

    def __len__(self) -> int:
        return (
            self.sorted.size
            + len(self.pending)
            + sum(a.size for a in self.pending_arrays)
        )

    def state(self) -> dict:
        self._merge()
        return {"sorted": self.sorted.tobytes()}

    @classmethod
    def from_state(cls, d: dict) -> "_ExactStore":
        s = cls()
        s.sorted = np.frombuffer(d["sorted"], dtype=np.uint64).copy()
        return s


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, exact: bool = True):
        nb = 1
        while nb * _SLOTS < capacity:
            nb <<= 1
        self.num_buckets = nb
        self._mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.victims: list[tuple[int, int]] = []  # (bucket, fp) at saturation
        self.exact = exact
        self.exact_store = _ExactStore()
        self.count = 0
        self._rng_state = np.uint64(0x9E3779B97F4A7C15)  # deterministic evictions

    # -- hashing ---------------------------------------------------------
    def _fp_and_index(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        mixed = _mix(keys)
        fp = (mixed & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
        i1 = ((mixed >> np.uint64(16)) & self._mask).astype(np.uint64)
        return fp, i1

    def _alt_index(self, i: np.ndarray | np.uint64, fp) -> np.ndarray | np.uint64:
        fph = _mix(np.asarray(fp, dtype=np.uint64))
        return (np.asarray(i, dtype=np.uint64) ^ fph) & self._mask

    # -- core ops --------------------------------------------------------
    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership (exact when ``self.exact``)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_and_index(keys)
        i2 = self._alt_index(i1, fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        if self.victims:
            for j in np.nonzero(~hit)[0]:
                f, b1, b2 = int(fp[j]), int(i1[j]), int(i2[j])
                for vb, vf in self.victims:
                    if vf == f and vb in (b1, b2):
                        hit[j] = True
                        break
        if self.exact and hit.any():
            # cuckoo-positive → exact confirm (vectorized searchsorted)
            idx = np.nonzero(hit)[0]
            hit[idx] = self.exact_store.contains(keys[idx])
        return hit

    def _insert_one(self, fp: int, i1: int) -> None:
        t = self.table
        row = t[i1]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = fp
            return
        i2 = int(self._alt_index(np.uint64(i1), np.uint16(fp)))
        row = t[i2]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = fp
            return
        i, f = i2, fp
        for _ in range(_KICKS):
            self._rng_state = _mix(np.asarray(self._rng_state, dtype=np.uint64))
            slot = int(self._rng_state & np.uint64(_SLOTS - 1))
            f, t[i][slot] = int(t[i][slot]), f
            i = int(self._alt_index(np.uint64(i), np.uint16(f)))
            row = t[i]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = f
                return
        # Saturated: park the displaced fingerprint so no key ever turns
        # falsely negative.
        self.victims.append((int(i), int(f)))

    def _maybe_grow(self, incoming: int) -> None:
        """Double the table when load factor approaches 1.

        A saturated cuckoo table degenerates: every insert runs the full
        eviction loop and parks a victim, and victim scans turn linear.
        With the exact store present we can always rebuild the table from
        the authoritative key set; amortized cost is O(n) total.
        """
        if not self.exact:
            return
        while (self.count + incoming) > 0.85 * self.num_buckets * _SLOTS:
            self.num_buckets *= 2
            self._mask = np.uint64(self.num_buckets - 1)
            self.table = np.zeros((self.num_buckets, _SLOTS), dtype=np.uint16)
            self.victims = []
            self.exact_store._merge()
            keys = self.exact_store.sorted
            fp, i1 = self._fp_and_index(keys)
            for j in range(keys.size):
                self._insert_one(int(fp[j]), int(i1[j]))

    def add_if_absent(self, keys: np.ndarray) -> np.ndarray:
        """Insert keys not present; return mask of keys that were UNSEEN.

        Duplicates within the batch: the first occurrence is unseen, later
        ones seen (matches colly marking visited at ``Visit`` time —
        /root/reference/pkg/scraper/scraper.go:196).
        """
        keys = np.asarray(keys, dtype=np.uint64)
        self._maybe_grow(keys.size)
        n = keys.size
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        seen_before = self.contains_many(keys)
        fp, i1 = self._fp_and_index(keys)
        batch_local: set[int] = set()
        new_idx = np.nonzero(~seen_before)[0]
        for j in new_idx:
            k = int(keys[j])
            if k in batch_local:
                continue
            out[j] = True
            batch_local.add(k)
            if self.exact:
                self.exact_store.add(k)
            self._insert_one(int(fp[j]), int(i1[j]))
            self.count += 1
        return out

    # -- checkpoint ------------------------------------------------------
    @property
    def exact_keys(self) -> set[int]:
        """Exact key set (test/debug convenience)."""
        self.exact_store._merge()
        return set(self.exact_store.sorted.tolist())

    def serialize(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump(
            {
                "num_buckets": self.num_buckets,
                "table": self.table.tobytes(),
                "victims": self.victims,
                "exact": self.exact,
                "exact_state": self.exact_store.state() if self.exact else None,
                "count": self.count,
                "rng": int(self._rng_state),
            },
            buf,
            protocol=4,
        )
        return buf.getvalue()

    @classmethod
    def restore(cls, data: bytes) -> "CuckooFilter":
        d = pickle.loads(data)
        f = cls(capacity=d["num_buckets"] * _SLOTS, exact=d["exact"])
        f.table = np.frombuffer(d["table"], dtype=np.uint16).reshape(
            d["num_buckets"], _SLOTS
        ).copy()
        f.victims = d["victims"]
        if d["exact"]:
            f.exact_store = _ExactStore.from_state(d["exact_state"])
        f.count = d["count"]
        f._rng_state = np.uint64(d["rng"])
        return f
