"""Per-host politeness scheduler (T2/T3/O1/O2) — deterministic virtual clock.

The reference throttles with colly's
``LimitRule{Parallelism:4, RandomDelay:6s}``
(/root/reference/pkg/scraper/scraper.go:101-105) and honors robots.txt
via the collector default (go.mod:21). Both are wall-clock,
nondeterministic. The engine strengthens them into the deterministic
budget the north rule requires:

- per host, requests dispatch in crawl order; request *k* starts at
  ``max(earliest_free_slot, prev_start + crawl_delay_ms)`` over
  ``max_parallel`` slots, each held for ``fetch_latency_ms`` — so
  in-flight ≤ max_parallel AND consecutive starts ≥ crawl_delay apart
  (the property test checks exactly these two invariants);
- robots: a url whose path+query starts with a disallowed prefix is
  admitted to the seen set (colly marks visited before the robots gate)
  but never scheduled — it becomes a ``robots_denied`` lineage row.

Skew strategy: because the schedule is a closed-form function of a
url's rank within its (host, priority) segment, the PRIMARY path is the
analytic driver sidecar (``schedule_wave_driver`` — one Arrow sort +
numpy segment arithmetic, no shuffle at all); only waves beyond
``CrawlConfig.driver_schedule_limit`` fall back to the distributed
``groupby("host").map_groups`` path, where hot hosts are range-salted
(``pipelines/crawl.py``) so no single group owns a Zipf head host.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa


class HostConfig:
    """Broadcastable per-host politeness config (FIXTURES.md §2)."""

    def __init__(self, hosts_table: pa.Table, default_delay_ms: int = 3000,
                 default_parallel: int = 4, default_latency_ms: int = 100):
        self.delay: dict[str, int] = {}
        self.parallel: dict[str, int] = {}
        self.latency: dict[str, int] = {}
        self.disallow: dict[str, list[str]] = {}
        for row in hosts_table.to_pylist():
            h = row["host"]
            self.delay[h] = int(row["crawl_delay_ms"])
            self.parallel[h] = int(row["max_parallel"])
            self.latency[h] = int(row["fetch_latency_ms"])
            self.disallow[h] = list(row["robots_disallow"] or [])
        self.default_delay = default_delay_ms
        self.default_parallel = default_parallel
        self.default_latency = default_latency_ms

    def robots_denied(self, host: str, url: str) -> bool:
        prefixes = self.disallow.get(host)
        if not prefixes:
            return False
        # path+query relative to the authority
        i = url.find("/", url.find("://") + 3)
        pathq = url[i:] if i >= 0 else "/"
        return any(pathq.startswith(p) for p in prefixes)


def schedule_host_group(
    group: pd.DataFrame, cfg: HostConfig, seq_offsets: dict[tuple[int, str], int]
) -> pd.DataFrame:
    """One host's admitted urls → ordered, seq-stamped, virtually timed.

    ``seq_offsets`` maps (priority, host) → global seq base (computed on
    the driver from the tiny per-(priority,host) count aggregate), making
    ``seq`` a contiguous global rank in (priority, host, url) order
    without any global enumerate pass.
    """
    host = group["host"].iloc[0]
    group = group.sort_values(["priority", "url"], kind="mergesort").reset_index(
        drop=True
    )
    prio = group["priority"].to_numpy()
    seq = np.empty(len(group), dtype=np.int64)
    for p in np.unique(prio):
        m = prio == p
        base = seq_offsets.get((int(p), host), 0)
        seq[m] = base + np.arange(int(m.sum()), dtype=np.int64)
    group["seq"] = seq

    delay = cfg.delay.get(host, cfg.default_delay)
    par = cfg.parallel.get(host, cfg.default_parallel)
    lat = cfg.latency.get(host, cfg.default_latency)
    n = len(group)
    # Closed form of the slot/delay recurrence (equal service times ⇒
    # FIFO slot reuse):  t_k = max(k·D, ⌊k/P⌋·L + (k mod P)·D)
    # — the delay chain binds when P·D ≥ L, else the slot chain does.
    # Identical to the reference-style heap simulation the oracle runs
    # (test_politeness property-checks both invariants; the golden tests
    # pin engine == oracle schedules).
    k = np.arange(n, dtype=np.int64)
    if par * delay >= lat:
        starts = k * delay
    else:
        starts = (k // par) * lat + (k % par) * delay
    group["sched_start_ms"] = starts
    group["sched_end_ms"] = starts + lat
    return group


def schedule_wave_driver(
    sched_tbl: pa.Table, cfg: HostConfig, offsets: dict[tuple[int, str], int]
) -> pa.Table:
    """Driver-side wave scheduling — Arrow sort + vectorized closed form.

    Same math as the distributed ``groupby("host").map_groups`` path and
    the per-group pandas helper (the golden tests pin all three against
    the oracle), but expressed as one multi-threaded Arrow sort by
    (host, priority, url) plus numpy segment arithmetic, so a multi-M-row
    wave schedules in ~1s of driver time instead of a pandas groupby
    loop. Below ``CrawlConfig.driver_schedule_limit`` rows this replaces
    a whole Ray shuffle job per wave."""
    if sched_tbl.num_rows == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "priority": pa.array([], pa.int32()),
                "seq": pa.array([], pa.int64()),
                "sched_start_ms": pa.array([], pa.int64()),
                "sched_end_ms": pa.array([], pa.int64()),
            }
        )
    order = pa.compute.sort_indices(
        sched_tbl,
        sort_keys=[("host", "ascending"), ("priority", "ascending"), ("url", "ascending")],
    )
    t = sched_tbl.take(order)
    n = t.num_rows
    host_dict = pa.compute.dictionary_encode(t.column("host").combine_chunks())
    if isinstance(host_dict, pa.ChunkedArray):
        host_dict = host_dict.combine_chunks()
    host_idx = np.asarray(host_dict.indices, dtype=np.int64)
    host_names = host_dict.dictionary.to_pylist()
    prio = np.asarray(t.column("priority"), dtype=np.int64)

    # per-host segments (host-major sort ⇒ contiguous)
    host_change = np.empty(n, dtype=bool)
    host_change[0] = True
    host_change[1:] = host_idx[1:] != host_idx[:-1]
    host_start = np.maximum.accumulate(np.where(host_change, np.arange(n), 0))
    k = np.arange(n) - host_start  # rank within host, (priority, url) order

    delay = np.array(
        [cfg.delay.get(h, cfg.default_delay) for h in host_names], dtype=np.int64
    )[host_idx]
    par = np.array(
        [cfg.parallel.get(h, cfg.default_parallel) for h in host_names], dtype=np.int64
    )[host_idx]
    lat = np.array(
        [cfg.latency.get(h, cfg.default_latency) for h in host_names], dtype=np.int64
    )[host_idx]
    # closed form (see schedule_host_group)
    starts = np.where(
        par * delay >= lat, k * delay, (k // par) * lat + (k % par) * delay
    )

    # seq: offsets[(priority, host)] + rank within the (host, priority) segment
    combo_change = host_change | np.concatenate(([True], prio[1:] != prio[:-1]))
    combo_start = np.maximum.accumulate(np.where(combo_change, np.arange(n), 0))
    seg_rank = np.arange(n) - combo_start
    seg_ids = np.flatnonzero(combo_change)
    seg_lengths = np.diff(np.append(seg_ids, n))
    base_per_seg = np.array(
        [offsets.get((int(prio[s]), host_names[host_idx[s]]), 0) for s in seg_ids],
        dtype=np.int64,
    )
    seq = np.repeat(base_per_seg, seg_lengths) + seg_rank

    return pa.table(
        {
            "url": t.column("url"),
            "host": t.column("host"),
            "priority": t.column("priority"),
            "seq": pa.array(seq),
            "sched_start_ms": pa.array(starts.astype(np.int64)),
            "sched_end_ms": pa.array((starts + lat).astype(np.int64)),
        }
    )


def compute_seq_offsets(
    counts: list[tuple[int, str, int]], seq_base: int
) -> dict[tuple[int, str], int]:
    """(priority, host, count) rows → global seq base per group, in
    (priority, host) order, starting at ``seq_base`` (the running counter
    across waves)."""
    offsets: dict[tuple[int, str], int] = {}
    acc = seq_base
    for p, h, c in sorted(counts):
        offsets[(p, h)] = acc
        acc += c
    return offsets
