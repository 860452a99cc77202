"""Politeness-ENFORCING fetch dispatch (T2 at dispatch time, not post-hoc).

The default crawl path fetches immediately and back-computes the virtual
politeness schedule as a sidecar (pipelines/crawl.py) — deterministically
correct, but nothing *bounds* dispatch while fetching. That is fine while
"fetch" is a local corpus lookup and wrong the day the Fetcher is a real
HTTP client: the reference's ``LimitRule{Parallelism, Delay}`` is a real
request-time throttle (/root/reference/pkg/scraper/scraper.go:101-105).

``CrawlConfig(enforce_politeness=True)`` routes each wave's admitted urls
through ``groupby("host").map_groups(polite_dispatch)`` instead: ALL of a
host's requests flow through ONE group invocation, which

1. orders them in crawl order (priority, url) — identical to the
   schedule sidecar, so seq/golden outputs are unchanged;
2. computes the same closed-form virtual start times and VALIDATES the
   two politeness invariants before dispatching (consecutive starts ≥
   crawl_delay apart; in-flight ≤ max_parallel — with equal service
   times: ``starts[k] − starts[k−P] ≥ latency``), raising loudly if the
   budget would be violated;
3. dispatches the fetch in start-time order, optionally pacing on the
   WALL clock (``real_time=True`` sleeps until each request's virtual
   start — the production HTTP mode; tests and the synthetic bench keep
   the clock virtual).

Skew note: this path pays a groupby(host) shuffle per wave, and a Zipf
head host serializes behind one group — that is INHERENT to politeness
(a polite crawler cannot parallelize one host past max_parallel), so the
straggler is the budget, not a bug. The analytic sidecar path remains
the default when fetches are simulated.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa

from .politeness import HostConfig


def virtual_starts(n: int, delay: int, par: int, lat: int) -> np.ndarray:
    """Closed-form virtual start times (same math as the sidecar):
    t_k = max(k·D, ⌊k/P⌋·L + (k mod P)·D)."""
    k = np.arange(n, dtype=np.int64)
    if par * delay >= lat:
        return k * delay
    return (k // par) * lat + (k % par) * delay


def check_budget(starts: np.ndarray, delay: int, par: int, lat: int) -> None:
    """Raise if the dispatch plan would violate the politeness budget."""
    if len(starts) > 1:
        gaps = np.diff(starts)
        if (gaps < delay).any():
            raise RuntimeError(
                f"politeness violation: consecutive starts {gaps.min()}ms "
                f"apart < crawl_delay {delay}ms"
            )
    if len(starts) > par:
        # with equal service times, in-flight ≤ P ⇔ the (k−P)-th request
        # finished before the k-th starts
        if (starts[par:] - starts[:-par] < lat).any():
            raise RuntimeError(
                f"politeness violation: more than {par} requests in flight"
            )


def make_polite_dispatch(
    host_cfg: HostConfig,
    fetch_fn,
    real_time: bool = False,
    dispatch_log: list | None = None,
):
    """Per-host-group dispatcher: order → validate budget → fetch in order.

    ``fetch_fn`` is the batched fetch callable (pa.Table → pa.Table);
    rows are handed to it in dispatch order, so a real HTTP fetcher
    drop-in honors the budget by construction. ``dispatch_log`` (tests)
    collects (host, url, virtual_start) in dispatch order.
    """

    def dispatch(g: pd.DataFrame) -> pa.Table:
        host = str(g["host"].iloc[0])
        g = g.sort_values(["priority", "url"], kind="mergesort").reset_index(drop=True)
        denied = (
            g["robots_denied"].to_numpy()
            if "robots_denied" in g.columns
            else np.zeros(len(g), dtype=bool)
        )
        live = g[~denied]
        delay = host_cfg.delay.get(host, host_cfg.default_delay)
        par = host_cfg.parallel.get(host, host_cfg.default_parallel)
        lat = host_cfg.latency.get(host, host_cfg.default_latency)
        starts = virtual_starts(len(live), delay, par, lat)
        check_budget(starts, delay, par, lat)
        if dispatch_log is not None:
            dispatch_log.extend(
                (host, u, int(s)) for u, s in zip(live["url"], starts)
            )
        if real_time:  # pragma: no cover - wall-clock mode for real HTTP
            t0 = time.monotonic()
            for s in starts:
                lag = s / 1000.0 - (time.monotonic() - t0)
                if lag > 0:
                    time.sleep(lag)
        # batched fetch in dispatch order (robots-denied rows ride along
        # at the tail: never dispatched, fetch_fn marks them denied)
        ordered = pd.concat([live, g[denied]], ignore_index=True)
        return fetch_fn(pa.Table.from_pandas(ordered, preserve_index=False))

    return dispatch
