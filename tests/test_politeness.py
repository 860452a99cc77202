"""Politeness property tests (FIXTURES.md §6): per-host in-flight ≤
max_parallel and inter-start gap ≥ crawl_delay_ms under the virtual
clock, for arbitrary workloads."""

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from gocrawler_ray.stages.politeness import (
    HostConfig,
    compute_seq_offsets,
    schedule_host_group,
)


def _host_cfg(delay, par, lat):
    tbl = pa.table(
        {
            "host": ["h"],
            "allowed": [True],
            "robots_disallow": [[]],
            "crawl_delay_ms": [delay],
            "max_parallel": [par],
            "fetch_latency_ms": [lat],
        }
    )
    return HostConfig(tbl)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 120),
    delay=st.integers(0, 2000),
    par=st.integers(1, 8),
    lat=st.integers(1, 5000),
)
def test_budget_invariants(n, delay, par, lat):
    cfg = _host_cfg(delay, par, lat)
    g = pd.DataFrame(
        {
            "host": ["h"] * n,
            "url": [f"https://h/p{i:05d}" for i in range(n)],
            "priority": [i % 2 for i in range(n)],
        }
    )
    n0 = (g["priority"] == 0).sum()
    out = schedule_host_group(g, cfg, {(0, "h"): 0, (1, "h"): int(n0)})
    starts = np.sort(out["sched_start_ms"].to_numpy())
    ends = starts + lat
    # inter-start gap ≥ delay
    if n > 1:
        assert (np.diff(starts) >= delay).all()
    # in-flight ≤ par at every start instant
    for i, t in enumerate(starts):
        in_flight = ((starts <= t) & (ends > t)).sum()
        assert in_flight <= par
    # seq contiguous in (priority, url) order
    out_sorted = out.sort_values(["priority", "url"])
    assert out_sorted["seq"].tolist() == list(range(0, n))


def test_seq_offsets_global_order():
    counts = [(1, "b", 3), (0, "z", 2), (1, "a", 1), (0, "a", 4)]
    off = compute_seq_offsets(counts, seq_base=100)
    # (priority, host) lexicographic: (0,a)=100..103, (0,z)=104..105,
    # (1,a)=106, (1,b)=107..109
    assert off == {(0, "a"): 100, (0, "z"): 104, (1, "a"): 106, (1, "b"): 107}


def test_robots_prefix_match():
    tbl = pa.table(
        {
            "host": ["h"],
            "allowed": [True],
            "robots_disallow": [["/shop/cat.aspx?etq=z"]],
            "crawl_delay_ms": [0],
            "max_parallel": [4],
            "fetch_latency_ms": [1],
        }
    )
    cfg = HostConfig(tbl)
    assert cfg.robots_denied("h", "https://h/shop/cat.aspx?etq=z9")
    assert not cfg.robots_denied("h", "https://h/shop/cat.aspx?etq=c9")
    assert not cfg.robots_denied("unknown", "https://unknown/shop/cat.aspx?etq=z9")
