"""Single-threaded Python reference oracle (SURVEY §5).

An independent, dead-simple re-implementation of the reference crawler's
semantics (BFS from seeds, filters M1-M4, seen-before-fetch J2, robots
gate T3, politeness budget T2 on a virtual clock, span extraction
M5-M12) used to produce the golden outputs the Ray engine must match:

- ``order``   : (seq, url, depth, priority, host) — fetch attempts in the
  deterministic (depth, priority, host, url) total order;
- ``seen``    : exact URL-seen membership at crawl end (incl. robots-denied);
- ``lineage`` : req_id/status/error per request (incl. failures — logged,
  never retried, /root/reference/pkg/scraper/scraper.go:123-150);
- ``docs``    : url → span sequence of every successfully fetched page;
- ``schedule``: url → (start_ms, end_ms) virtual politeness times.

Control flow here is plain dict/set/list — no Ray, no Arrow — so an
engine bug cannot hide in shared plumbing (the scalar kernels in
``functions/`` are shared on purpose: they are unit-tested against the
reference semantics directly).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import pyarrow as pa

from ..config import ShopProfile
from ..functions.urls import absolutize, host_of, md5_hex
from ..stages.politeness import HostConfig


@dataclass
class OracleResult:
    order: list = field(default_factory=list)  # (seq, url, depth, priority, host)
    seen: set = field(default_factory=set)
    lineage: list = field(default_factory=list)  # dict rows
    docs: dict = field(default_factory=dict)  # url -> list[span dict]
    schedule: dict = field(default_factory=dict)  # url -> (start, end)


def crawl_oracle(
    corpus: pa.Table,
    hosts: pa.Table,
    seeds: pa.Table,
    profile: ShopProfile,
    max_waves: int | None = None,
) -> OracleResult:
    pages = {
        r["doc_id"]: r["spans"] for r in corpus.to_pylist()
    }
    cfg = HostConfig(hosts)
    allowed = profile.allowed_hosts()
    ex_re = profile.extraction_re()
    prod_re = profile.product_re()

    res = OracleResult()
    seq = 0
    frontier = [s for s in seeds.column("url").to_pylist()]
    depth = 0
    while frontier:
        if max_waves is not None and depth >= max_waves:
            break
        # M1/M2 filter, then J2 admission (dedup against seen)
        admitted = []
        for url in frontier:
            h = host_of(url)
            if h not in allowed or not ex_re.search(url):
                continue
            if url in res.seen:
                continue
            res.seen.add(url)
            admitted.append((url, h))
        if not admitted:
            break

        # robots gate (admitted but never fetched)
        sched, denied = [], []
        for url, h in admitted:
            (denied if cfg.robots_denied(h, url) else sched).append((url, h))
        for url, h in denied:
            res.lineage.append(
                {
                    "req_id": md5_hex(url),
                    "url": url,
                    "status": "robots_denied",
                    "error": "robots.txt disallow",
                }
            )

        # deterministic total order within the wave
        rows = sorted(
            ((0 if prod_re.search(u) else 1, h, u) for u, h in sched)
        )
        # politeness virtual clock, per host in wave order
        slots: dict[str, list] = {}
        last_start: dict[str, int] = {}
        next_frontier: list[str] = []
        for priority, h, url in rows:
            res.order.append((seq, url, depth, priority, h))
            seq += 1
            par = cfg.parallel.get(h, cfg.default_parallel)
            delay = cfg.delay.get(h, cfg.default_delay)
            lat = cfg.latency.get(h, cfg.default_latency)
            heap = slots.setdefault(h, [0] * par)
            t = max(heapq.heappop(heap), last_start.get(h, -delay) + delay)
            heapq.heappush(heap, t + lat)
            last_start[h] = t
            res.schedule[url] = (t, t + lat)

            spans = pages.get(url)
            if spans is None:
                res.lineage.append(
                    {
                        "req_id": md5_hex(url),
                        "url": url,
                        "status": "not_found",
                        "error": "Not Found",
                    }
                )
                continue
            res.lineage.append(
                {"req_id": md5_hex(url), "url": url, "status": "ok", "error": ""}
            )
            res.docs[url] = spans
            if any(s["kind"] == "captcha" for s in spans):
                continue  # quarantined: no link extraction
            for s in spans:
                if s["kind"] == "link":
                    next_frontier.append(absolutize(url, s["media_ref"]))
        frontier = next_frontier
        depth += 1
    return res
