"""Politeness property tests (FIXTURES.md §6): per-host in-flight ≤
max_parallel and inter-start gap ≥ crawl_delay_ms under the virtual
clock, for arbitrary workloads."""

import heapq

import pytest
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


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 80),
    delay=st.integers(0, 500),
    par=st.integers(1, 6),
    lat=st.integers(1, 2000),
)
def test_polite_dispatch_orders_and_enforces(n, delay, par, lat):
    """The ENFORCING dispatcher (stages/dispatch.py): rows reach the
    fetch in schedule order, the dispatch log satisfies both budget
    invariants, and its virtual starts equal the sidecar's."""
    from gocrawler_ray.stages.dispatch import make_polite_dispatch

    cfg = _host_cfg(delay, par, lat)
    rng = np.random.RandomState(n)
    urls = [f"https://h/p{i:05d}" for i in rng.permutation(n)]
    g = pd.DataFrame(
        {
            "host": ["h"] * n,
            "url": urls,
            "priority": [i % 2 for i in range(n)],
            "robots_denied": [False] * n,
        }
    )
    seen_order = []

    def fake_fetch(t: pa.Table) -> pa.Table:
        seen_order.extend(t.column("url").to_pylist())
        return t

    log: list = []
    make_polite_dispatch(cfg, fake_fetch, dispatch_log=log)(g)
    # fetch receives rows exactly in dispatch order
    assert [u for _, u, _ in log] == seen_order
    # dispatch order is crawl order (priority, url)
    expect = g.sort_values(["priority", "url"])["url"].tolist()
    assert seen_order == expect
    # budget invariants hold on the logged virtual starts
    starts = np.array([s for _, _, s in log])
    if n > 1:
        assert (np.diff(starts) >= delay).all()
    if n > par:
        assert (starts[par:] - starts[:-par] >= lat).all()
    # and they equal the analytic sidecar's schedule
    sidecar = schedule_host_group(
        g.drop(columns=["robots_denied"]), cfg, {(0, "h"): 0, (1, "h"): (n + 1) // 2}
    )
    assert starts.tolist() == sorted(sidecar["sched_start_ms"].tolist())


def test_enforced_crawl_matches_default():
    """enforce_politeness=True must produce bit-identical docs + schedule
    to the default analytic path (the budget changes WHEN fetches
    dispatch, never WHAT is crawled)."""
    import os
    import shutil

    from gocrawler_ray.config import CrawlConfig
    from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
    from gocrawler_ray.pipelines.crawl import run_crawl
    from gocrawler_ray.sources.tables import read_table

    spec = CorpusSpec(n_docs=200, n_hosts=2)
    t = generate(spec)
    prof = profile_of(spec)
    outs = {}
    for mode, enforce in [("default", False), ("enforced", True)]:
        root = f"/tmp/gocrawler_test/dispatch_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        cfg = CrawlConfig(
            num_seen_shards=2, fetcher_concurrency=2, batch_size=512,
            enforce_politeness=enforce,
        )
        run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, cfg, root)
        rows = []
        for sub in ("docs", "schedule"):
            base = os.path.join(root, sub)
            for d in sorted(os.listdir(base)):
                tb = read_table(os.path.join(base, d))
                cols = (
                    ["url", "status", "depth"] if sub == "docs"
                    else ["url", "seq", "sched_start_ms"]
                )
                rows.extend(
                    sorted(tuple(r[c] for c in cols) for r in tb.select(cols).to_pylist())
                )
        outs[mode] = rows
    assert outs["default"] == outs["enforced"]


def test_crawl_distributed_sidecar_matches_analytic():
    """driver_schedule_limit=0 forces every wave through the distributed
    range-salted sidecar; the full crawl's schedule tables must be
    identical to the default analytic run."""
    import os
    import shutil

    from gocrawler_ray.config import CrawlConfig
    from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
    from gocrawler_ray.pipelines.crawl import run_crawl
    from gocrawler_ray.sources.tables import read_table

    spec = CorpusSpec(n_docs=200, n_hosts=2)
    t = generate(spec)
    prof = profile_of(spec)
    outs = {}
    for mode, limit in [("analytic", 20_000_000), ("distributed", 0)]:
        root = f"/tmp/gocrawler_test/salted_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        cfg = CrawlConfig(
            num_seen_shards=2, fetcher_concurrency=2, batch_size=512,
            driver_schedule_limit=limit,
        )
        run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, cfg, root)
        rows = []
        base = os.path.join(root, "schedule")
        for d in sorted(os.listdir(base)):
            tb = read_table(os.path.join(base, d))
            rows.extend(
                sorted(
                    (r["url"], r["seq"], r["sched_start_ms"], r["sched_end_ms"])
                    for r in tb.to_pylist()
                )
            )
        outs[mode] = rows
    if outs["analytic"] != outs["distributed"]:
        # intermittent in full-suite runs (seen twice in round 2) —
        # surface a real diff instead of a bare assert so the next
        # occurrence is diagnosable from CI output alone
        a, d = outs["analytic"], outs["distributed"]
        sa, sd = set(a), set(d)
        msg = [
            f"analytic {len(a)} rows vs distributed {len(d)} rows",
            f"only-analytic ({len(sa - sd)}): {sorted(sa - sd)[:8]}",
            f"only-distributed ({len(sd - sa)}): {sorted(sd - sa)[:8]}",
        ]
        pytest.fail("schedule mismatch: " + "; ".join(msg))


def test_range_salted_schedule_matches_analytic():
    """The range-salted distributed scheduler (stages/salting.py) must be
    bit-identical to the analytic driver path on a Zipf frontier where
    one host owns >50% of the wave, with salting FORCED (tiny
    target_range_rows ⇒ the hot host splits into many ranges)."""
    import ray.data as rd

    from gocrawler_ray.stages.politeness import schedule_wave_driver
    from gocrawler_ray.stages.salting import schedule_wave_distributed

    rng = np.random.RandomState(5)
    n = 4000
    hosts = np.where(
        rng.rand(n) < 0.6, "hot.example", np.where(rng.rand(n) < 0.5, "warm.example", "cold.example")
    )
    urls = np.array([f"https://{h}/p{i:06d}" for i, h in enumerate(hosts)], dtype=object)
    prio = (rng.rand(n) < 0.3).astype(np.int32)
    tbl = pa.table({"url": urls, "host": hosts, "priority": prio})

    cfg_tbl = pa.table(
        {
            "host": ["hot.example", "warm.example", "cold.example"],
            "allowed": [True] * 3,
            "robots_disallow": [[], [], []],
            "crawl_delay_ms": [100, 300, 50],
            "max_parallel": [4, 2, 8],
            "fetch_latency_ms": [900, 100, 1000],
        }
    )
    cfg = HostConfig(cfg_tbl)
    counts_pd = (
        pd.DataFrame({"priority": prio, "host": hosts})
        .groupby(["priority", "host"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    offsets = compute_seq_offsets(
        [(int(r["priority"]), str(r["host"]), int(r["n"])) for _, r in counts_pd.iterrows()],
        seq_base=1000,
    )
    expect = (
        schedule_wave_driver(tbl, cfg, offsets)
        .select(["url", "seq", "sched_start_ms", "sched_end_ms"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    got = (
        schedule_wave_distributed(
            rd.from_arrow(tbl).repartition(8), cfg, offsets, counts_pd,
            target_range_rows=500,  # force ~5 ranges on the hot host
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)[["url", "seq", "sched_start_ms", "sched_end_ms"]]
    )
    pd.testing.assert_frame_equal(expect, got, check_dtype=False)


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


def test_distributed_sidecar_never_reads_wave_on_driver(monkeypatch):
    """The driver_schedule_limit-exceeded path must not build ANY
    full-wave driver-side table: quarantine is a distributed filtered
    write and seq counts come from per-batch partials. Guard by making
    a driver-side read_table of a docs/ dir an error (round-2 verdict)."""
    import os
    import shutil

    from gocrawler_ray.config import CrawlConfig
    from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
    from gocrawler_ray.pipelines.crawl import run_crawl
    from gocrawler_ray.sources import tables as tables_mod

    real_read_table = tables_mod.read_table

    def guarded(uri, columns=None):
        assert f"{os.sep}docs{os.sep}" not in str(uri), (
            f"driver-side read_table of wave docs in distributed mode: {uri}"
        )
        return real_read_table(uri, columns=columns)

    monkeypatch.setattr(tables_mod, "read_table", guarded)

    spec = CorpusSpec(n_docs=150, n_hosts=2)
    t = generate(spec)
    root = "/tmp/gocrawler_test/sidecar_guard"
    shutil.rmtree(root, ignore_errors=True)
    cfg = CrawlConfig(
        num_seen_shards=2, fetcher_concurrency=2, batch_size=512,
        driver_schedule_limit=0,
    )
    res = run_crawl(t["corpus"], t["hosts"], t["seeds"], profile_of(spec), cfg, root)
    assert res.fetched > 0
    # quarantine dir exists per wave (distributed write or empty marker)
    qbase = os.path.join(root, "quarantine")
    assert sorted(os.listdir(qbase)) and all(
        os.listdir(os.path.join(qbase, d)) for d in os.listdir(qbase)
    )
