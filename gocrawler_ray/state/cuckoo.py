"""Cuckoo filter for the URL-seen set (T1/J2).

Replaces the reference's in-process colly visited-map
(/root/reference/pkg/scraper/scraper.go:79-88, go.mod:13) with a
serializable, shardable structure:

- partial-key cuckoo hashing: 4-slot buckets, 16-bit fingerprints,
  ``i2 = i1 XOR h(fp)`` (Fan et al., "Cuckoo Filter: Practically Better
  Than Bloom", CoNEXT 2014);
- **no false negatives**: inserts that fail after max kicks go to an
  exact overflow set;
- **exact membership**: the filter is the O(1) fast path that rejects the
  never-seen majority; cuckoo-positives (true dups + ~2^-13 FPs) are
  confirmed against an exact uint64-key set. The north rule demands the
  final URL-seen set match the reference exactly, so exactness is part of
  the contract, not just a test sidecar. At 10^10-URL scale the exact set
  costs ~8B/url spread over S shards; a deployment that accepts FP-rate
  crawl loss can drop it (``exact=False``).
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


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, exact: bool = True):
        nb = 1
        while nb * _SLOTS < capacity:
            nb <<= 1
        self.num_buckets = nb
        self._mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.overflow: set[int] = set()  # keys whose insert raised — exact fallback
        self.victims: list[tuple[int, int]] = []  # (bucket, fp) displaced at saturation
        self.exact = exact
        self.exact_keys: set[int] = set()
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
        if self.overflow:
            ov = self.overflow
            for j in np.nonzero(~hit)[0]:
                if int(keys[j]) in ov:
                    hit[j] = True
        if self.victims:
            for j in np.nonzero(~hit)[0]:
                f, b1 = int(fp[j]), int(i1[j])
                b2 = int(i2[j])
                for vb, vf in self.victims:
                    if vf == f and vb in (b1, b2):
                        hit[j] = True
                        break
        if self.exact:
            ek = self.exact_keys
            for j in np.nonzero(hit)[0]:
                if int(keys[j]) not in ek:
                    hit[j] = False  # cuckoo false positive, exact set overrules
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
        # evict deterministically
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
        # Saturated: the displaced fingerprint would otherwise be lost and
        # create a false negative for whichever key owned it — park it in
        # the victim list, which contains_many consults.
        self.victims.append((int(i), int(f)))

    def add_if_absent(self, keys: np.ndarray) -> np.ndarray:
        """Insert keys not present; return mask of keys that were UNSEEN.

        Duplicates within the batch: the first occurrence is unseen, later
        ones seen (matches colly marking visited at ``Visit`` time —
        /root/reference/pkg/scraper/scraper.go:196).
        """
        keys = np.asarray(keys, dtype=np.uint64)
        n = keys.size
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        seen_before = self.contains_many(keys)
        fp, i1 = self._fp_and_index(keys)
        batch_local: set[int] = set()
        for j in range(n):
            k = int(keys[j])
            if seen_before[j] or k in batch_local:
                continue
            out[j] = True
            batch_local.add(k)
            if self.exact:
                self.exact_keys.add(k)
            try:
                self._insert_one(int(fp[j]), int(i1[j]))
            except Exception:
                self.overflow.add(k)
            self.count += 1
        return out

    # -- checkpoint ------------------------------------------------------
    def serialize(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump(
            {
                "num_buckets": self.num_buckets,
                "table": self.table.tobytes(),
                "overflow": self.overflow,
                "victims": self.victims,
                "exact": self.exact,
                "exact_keys": np.fromiter(
                    self.exact_keys, dtype=np.uint64, count=len(self.exact_keys)
                ).tobytes(),
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
        f.overflow = d["overflow"]
        f.victims = d["victims"]
        f.exact_keys = set(np.frombuffer(d["exact_keys"], dtype=np.uint64).tolist())
        f.count = d["count"]
        f._rng_state = np.uint64(d["rng"])
        return f
