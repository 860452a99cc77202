"""Range-salted distributed politeness scheduling for enormous waves.

The analytic driver sidecar (politeness.schedule_wave_driver) schedules
any wave that fits driver memory with zero shuffle. Beyond
``CrawlConfig.driver_schedule_limit`` the schedule must distribute — and
a plain ``groupby("host")`` straggles on a Zipf frontier: one hot host
can be half the wave, and politeness math needs GLOBAL per-host ranks,
which hash-salting cannot provide (a sub-group's local rank ≠ its global
rank).

Range-salting fixes that, because both outputs are closed-form functions
of a row's global rank in its (host[, priority]) segment:

1. one pass computes exact per-(priority, host) counts (tiny result) and
   a seeded hash-sample of (priority, url) keys per host;
2. the driver cuts each hot host's sorted key domain at sample quantiles
   → ``n_salts = ceil(count / target_range_rows)`` contiguous ranges;
3. a map stage assigns each row its range id (vectorized searchsorted on
   a priority-prefixed sort key — no shuffle yet);
4. one exact count per (host, salt, priority) (tiny) gives every range
   its CUMULATIVE rank offsets;
5. ``groupby(host, salt)`` schedules each range independently: global
   rank = range offset + local rank, so seq and virtual start times come
   out identical to the analytic path — the equality test pins it.

The shuffle is now keyed by (host, salt): a hot host splits into
count/target_range_rows balanced groups instead of one straggler.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .politeness import HostConfig


def _sort_key(priority: np.ndarray, url: np.ndarray) -> np.ndarray:
    """Monotone composite key for (priority, url) order: zero-padded
    priority prefix + url (priority is a small non-negative int)."""
    p = np.char.zfill(priority.astype(np.int64).astype(str), 10)
    return np.char.add(np.char.add(p, "|"), url.astype(str))


def assign_range_salts(
    ds: rd.Dataset,
    host_total: dict[str, int],
    target_range_rows: int = 2_000_000,
    sample_mod: int = 512,
    sample_seed: int = 97,
) -> rd.Dataset:
    """Append a ``salt`` column cutting each hot host's sorted
    (priority, url) key domain into ``ceil(count / target_range_rows)``
    contiguous ranges at seeded-hash-sample quantiles (steps 1-3 of the
    module docstring). Shared by the distributed schedule sidecar and the
    chunked polite dispatcher (stages/dispatch.py) — both rely on ranges
    being CONTIGUOUS in the (priority, url) order so global ranks are
    range offset + local rank. Consumes ``ds`` twice (sample + salt map):
    callers pass a re-executable or materialized dataset."""
    n_salts = {
        h: max(1, -(-int(c) // target_range_rows)) for h, c in host_total.items()
    }

    # -- boundaries from a seeded hash sample of the hot hosts' keys -----
    hot = {h for h, s in n_salts.items() if s > 1}
    boundaries: dict[str, np.ndarray] = {}
    if hot:
        from ..functions.urls import url_hash64_many

        def pick(t: pa.Table) -> pa.Table:
            urls = t.column("url").to_pandas().to_numpy(dtype=object)
            hosts = t.column("host").to_pandas().to_numpy(dtype=object)
            keep = url_hash64_many(urls) % np.uint64(sample_mod) == np.uint64(
                sample_seed % sample_mod
            )
            keep &= pd.Series(hosts).isin(hot).to_numpy()
            return t.filter(pa.array(keep))

        sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        for h, g in sample.groupby("host"):
            k = np.sort(
                _sort_key(g["priority"].to_numpy(), g["url"].to_numpy(dtype=object))
            )
            s = n_salts[str(h)]
            if len(k) >= s:
                qs = (np.arange(1, s) * len(k)) // s
                boundaries[str(h)] = k[qs]
            else:  # sample too thin — degrade to one range
                n_salts[str(h)] = 1

    def add_salt(t: pa.Table) -> pa.Table:
        hosts = t.column("host").to_pandas().to_numpy(dtype=object)
        key = _sort_key(
            t.column("priority").to_numpy(), t.column("url").to_pandas().to_numpy(dtype=object)
        )
        salt = np.zeros(t.num_rows, dtype=np.int32)
        for h, b in boundaries.items():
            m = hosts == h
            if m.any():
                salt[m] = np.searchsorted(b, key[m], side="right").astype(np.int32)
        return t.append_column("salt", pa.array(salt))

    return ds.map_batches(add_salt, batch_format="pyarrow")


def range_rank_offsets(salted: rd.Dataset) -> dict[tuple[str, int], int]:
    """Exact global rank offset of every (host, salt) range: rows of the
    host in earlier (smaller-salt) ranges. Per-batch pyarrow partials →
    driver combine bounded by hosts × salts, never rows (house rule)."""

    def part(t: pa.Table) -> pa.Table:
        df = (
            t.select(["host", "salt"])
            .to_pandas()
            .groupby(["host", "salt"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = salted.map_batches(part, batch_format="pyarrow").to_pandas()
    seg = (
        parts.groupby(["host", "salt"], as_index=False)["n"]
        .sum()
        .sort_values(["host", "salt"])
    )
    seg["off"] = seg.groupby("host")["n"].cumsum() - seg["n"]
    return {
        (str(r["host"]), int(r["salt"])): int(r["off"]) for _, r in seg.iterrows()
    }


def schedule_wave_distributed(
    ds: rd.Dataset,
    host_cfg: HostConfig,
    seq_offsets: dict[tuple[int, str], int],
    counts: pd.DataFrame,
    target_range_rows: int = 2_000_000,
    sample_mod: int = 512,
    sample_seed: int = 97,
) -> rd.Dataset:
    """(url, host, priority) dataset → (url, seq, sched_start_ms,
    sched_end_ms), range-salted. ``counts`` = exact per-(priority, host)
    row counts (the same tiny aggregate that feeds ``seq_offsets``)."""
    from ray.data.aggregate import Count

    host_total = counts.groupby("host")["n"].sum()
    salted = assign_range_salts(
        ds, dict(host_total), target_range_rows, sample_mod, sample_seed
    )

    # -- exact per-(host, salt, priority) counts → cumulative offsets ----
    seg = (
        salted.groupby(["host", "salt", "priority"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["host", "priority", "salt"])
    )
    # rank offset of a (host, salt) range = rows of that host in EARLIER
    # ranges (any priority) ... in (priority, url) order ranges are
    # contiguous, so "earlier" = smaller salt
    seg_hs = seg.groupby(["host", "salt"], as_index=False)["n"].sum().sort_values(["host", "salt"])
    seg_hs["rank_offset"] = seg_hs.groupby("host")["n"].cumsum() - seg_hs["n"]
    rank_offset = {
        (r["host"], int(r["salt"])): int(r["rank_offset"])
        for _, r in seg_hs.iterrows()
    }
    seg["seq_off"] = seg.groupby(["host", "priority"])["n"].cumsum() - seg["n"]
    seq_off_within = {
        (r["host"], int(r["salt"]), int(r["priority"])): int(r["seq_off"])
        for _, r in seg.iterrows()
    }

    def schedule_range(g: pd.DataFrame) -> pd.DataFrame:
        host = str(g["host"].iloc[0])
        salt = int(g["salt"].iloc[0])
        g = g.sort_values(["priority", "url"], kind="mergesort").reset_index(drop=True)
        m = len(g)
        k = rank_offset[(host, salt)] + np.arange(m, dtype=np.int64)
        delay = host_cfg.delay.get(host, host_cfg.default_delay)
        par = host_cfg.parallel.get(host, host_cfg.default_parallel)
        lat = host_cfg.latency.get(host, host_cfg.default_latency)
        if par * delay >= lat:
            starts = k * delay
        else:
            starts = (k // par) * lat + (k % par) * delay
        prio = g["priority"].to_numpy()
        seq = np.empty(m, dtype=np.int64)
        for p in np.unique(prio):
            sel = prio == p
            base = seq_offsets.get((int(p), host), 0) + seq_off_within[
                (host, salt, int(p))
            ]
            seq[sel] = base + np.arange(int(sel.sum()), dtype=np.int64)
        return pd.DataFrame(
            {
                "url": g["url"],
                "seq": seq,
                "sched_start_ms": starts,
                "sched_end_ms": starts + lat,
            }
        )

    return salted.groupby(["host", "salt"]).map_groups(
        schedule_range, batch_format="pandas"
    )
