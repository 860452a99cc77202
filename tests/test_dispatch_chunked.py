"""Chunked polite dispatch (round-4 verdict #2) + real-HTTP fetcher seam
(round-4 verdict #4): a Zipf head host dispatches in bounded rank-range
chunks bit-identically to whole-host dispatch; real_time pacing runs on
an injectable clock; HttpFetcher enforces the reference's one-attempt
error discipline over an injected transport."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gocrawler_ray.stages.dispatch import (
    FakeClock,
    check_budget_window,
    make_polite_dispatch,
    virtual_starts,
)
from gocrawler_ray.stages.politeness import HostConfig


def _host_cfg(delay, par, lat, host="h"):
    return HostConfig(pa.table({
        "host": [host], "allowed": [True], "robots_disallow": [[]],
        "crawl_delay_ms": [delay], "max_parallel": [par],
        "fetch_latency_ms": [lat],
    }))


def _frame(n, host="h"):
    rng = np.random.RandomState(7)
    return pd.DataFrame({
        "host": [host] * n,
        "url": [f"https://{host}/p{i:05d}" for i in rng.permutation(n)],
        "priority": [i % 2 for i in range(n)],
        "robots_denied": [False] * n,
    })


def test_chunked_dispatch_matches_whole_host():
    """Splitting one host's ordered domain into rank-range chunks and
    dispatching each with its global rank offset yields the exact start
    times and dispatch order of the single-group dispatcher."""
    cfg = _host_cfg(100, 3, 700)
    n, chunk = 500, 64
    g = _frame(n)

    whole_log: list = []
    make_polite_dispatch(cfg, lambda t: t, dispatch_log=whole_log)(g)

    # chunk along the TRUE (priority, url) order, exactly what
    # assign_range_salts produces (contiguous ranges)
    ordered = g.sort_values(["priority", "url"], kind="mergesort").reset_index(drop=True)
    ordered["salt"] = (np.arange(n) // chunk).astype(np.int32)
    rank_offset = {("h", s): s * chunk for s in range(-(-n // chunk))}
    chunk_log: list = []
    dispatch = make_polite_dispatch(
        cfg, lambda t: t, dispatch_log=chunk_log, rank_offset=rank_offset
    )
    outs = [
        dispatch(grp.drop(columns=["robots_denied"]).copy())
        for _, grp in ordered.groupby("salt")
    ]
    assert chunk_log == whole_log
    assert sum(t.num_rows for t in outs) == n
    # the salt column never reaches the fetch callable
    assert all("salt" not in t.schema.names for t in outs)


def test_budget_window_covers_chunk_boundaries():
    """check_budget_window validates each chunk's starts TOGETHER WITH
    its formula predecessors, so the concatenation of chunk windows is
    exactly the whole-host schedule and the budget invariants are
    checked across every seam (not just inside chunks); and check_budget
    itself rejects genuinely compressed start arrays."""
    from gocrawler_ray.stages.dispatch import check_budget

    for delay, par, lat in [(100, 2, 1000), (0, 3, 500), (300, 1, 100),
                            (50, 4, 1000)]:
        n, chunk = 137, 25
        whole = virtual_starts(n, delay, par, lat)
        got = np.concatenate([
            check_budget_window(b, min(chunk, n - b), delay, par, lat)
            for b in range(0, n, chunk)
        ])
        assert (got == whole).all()
    with pytest.raises(RuntimeError, match="consecutive starts"):
        check_budget(np.array([0, 50, 200]), 100, 2, 100)
    with pytest.raises(RuntimeError, match="in flight"):
        check_budget(np.array([0, 100, 200, 300]), 100, 2, 1000)


def test_real_time_paces_on_injected_clock():
    cfg = _host_cfg(200, 2, 900)
    n = 12
    g = _frame(n)
    clk = FakeClock()
    log: list = []
    make_polite_dispatch(
        cfg, lambda t: t, real_time=True, dispatch_log=log, clock=clk
    )(g)
    starts = np.array([s for _, _, s in log])
    # the virtual clock advanced exactly to the last start (all sleeps
    # virtual, none negative) — the wall-pacing path ran for real
    assert clk.t == pytest.approx(starts[-1] / 1000.0)
    assert all(s >= 0 for s in clk.sleeps) and len(clk.sleeps) > 0


def _crawl_rows(root):
    from gocrawler_ray.sources.tables import read_table

    rows = []
    for sub in ("docs", "schedule"):
        base = os.path.join(root, sub)
        for d in sorted(os.listdir(base)):
            tb = read_table(os.path.join(base, d))
            cols = (["url", "status", "depth"] if sub == "docs"
                    else ["url", "seq", "sched_start_ms"])
            rows.extend(sorted(
                tuple(r[c] for c in cols) for r in tb.select(cols).to_pylist()
            ))
    return rows


def test_chunked_enforced_crawl_matches_default(ray_session):
    """E2E: enforce_politeness with dispatch_chunk_rows small enough to
    force real chunk splits (sample_mod=1 keeps the boundary sample
    dense on a tiny corpus) is bit-identical to the default analytic
    path, and with real_time on a FakeClock the wall-pacing code path
    runs inside the Ray workers too."""
    from gocrawler_ray.config import CrawlConfig
    from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
    from gocrawler_ray.pipelines.crawl import run_crawl

    spec = CorpusSpec(n_docs=250, n_hosts=2)
    t = generate(spec)
    prof = profile_of(spec)
    outs = {}
    for mode, kw in [
        ("default", {}),
        ("chunked", dict(enforce_politeness=True, dispatch_chunk_rows=20,
                         dispatch_sample_mod=1)),
        ("chunked_rt", dict(enforce_politeness=True, dispatch_chunk_rows=20,
                            dispatch_sample_mod=1, real_time=True,
                            clock=FakeClock())),
    ]:
        root = f"/tmp/gocrawler_test/chunked_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        cfg = CrawlConfig(num_seen_shards=2, fetcher_concurrency=2,
                          batch_size=512, **kw)
        run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, cfg, root)
        outs[mode] = _crawl_rows(root)
    assert outs["default"] == outs["chunked"]
    assert outs["default"] == outs["chunked_rt"]


def test_chunk_groups_are_bounded(ray_session):
    """The point of the cap: with chunking forced, no (host, salt) group
    exceeds ~2× the target (sample-quantile fuzz), while the unchunked
    host group would be the whole wave slice."""
    import ray.data as rd

    from gocrawler_ray.stages.salting import assign_range_salts

    n = 3000
    urls = np.array([f"https://hot/p{i:06d}" for i in range(n)], dtype=object)
    tbl = pa.table({
        "url": urls, "host": np.array(["hot"] * n, dtype=object),
        "priority": np.zeros(n, dtype=np.int32),
    })
    salted = assign_range_salts(
        rd.from_arrow(tbl).repartition(6), {"hot": n},
        target_range_rows=250, sample_mod=1,
    ).to_pandas()
    sizes = salted.groupby("salt").size()
    assert len(sizes) >= 10          # really split
    assert sizes.max() <= 2 * 250    # and bounded near the target


# ---------------------------------------------------------------------------
# HttpFetcher seam
# ---------------------------------------------------------------------------


class ScriptedClient:
    """Fake transport: per-url scripted (code, payload) or exception;
    counts attempts; optionally advances a FakeClock by a latency."""

    def __init__(self, script, clock=None, latency_s=0.0):
        self.script = script
        self.calls: list[str] = []
        self.clock = clock
        self.latency_s = latency_s

    def get(self, url, headers):
        self.calls.append(url)
        self.last_headers = dict(headers)
        if self.clock is not None:
            self.clock.sleep(self.latency_s)
        r = self.script[url]
        if isinstance(r, Exception):
            raise r
        return r


def _span(text):
    return {"kind": "text", "text": text, "media_ref": "", "offset": 0}


def _batch(urls, host="h", denied=None):
    n = len(urls)
    return pa.table({
        "url": pa.array(urls), "host": pa.array([host] * n),
        "depth": pa.array([0] * n, pa.int32()),
        "priority": pa.array([0] * n, pa.int32()),
        "robots_denied": pa.array(denied or [False] * n),
    })


def test_http_fetcher_error_discipline_one_attempt_no_retry():
    from gocrawler_ray.stages.fetcher import HttpFetcher

    script = {
        "https://h/ok": (200, b"payload-ok"),
        "https://h/gone": (404, b""),
        "https://h/boom": TimeoutError("dial timeout after 30s"),
        "https://h/teapot": (418, b""),
    }
    client = ScriptedClient(script)
    f = HttpFetcher(client, lambda p: [_span(p.decode())])
    out = f(_batch(list(script), denied=[False, False, False, False]))
    rows = {r["url"]: r for r in out.to_pylist()}
    assert rows["https://h/ok"]["status"] == "ok"
    assert rows["https://h/ok"]["spans"][0]["text"] == "payload-ok"
    assert rows["https://h/gone"]["status"] == "not_found"
    assert rows["https://h/gone"]["error"] == "HTTP 404"
    assert rows["https://h/boom"]["status"] == "error"
    assert "dial timeout" in rows["https://h/boom"]["error"]
    assert rows["https://h/teapot"]["status"] == "error"
    # ONE attempt per url, failures included — never retried
    assert sorted(client.calls) == sorted(script)
    # req_id contract: md5 of the url (scraper.go:112)
    from gocrawler_ray.functions.urls import md5_hex_many

    assert rows["https://h/ok"]["req_id"] == md5_hex_many(["https://h/ok"])[0]


def test_http_fetcher_robots_denied_never_hits_transport():
    from gocrawler_ray.stages.fetcher import HttpFetcher

    client = ScriptedClient({"https://h/a": (200, b"x")})
    f = HttpFetcher(client, lambda p: [_span(p.decode())])
    out = f(_batch(["https://h/a", "https://h/blocked"],
                   denied=[False, True]))
    rows = {r["url"]: r for r in out.to_pylist()}
    assert rows["https://h/blocked"]["status"] == "robots_denied"
    assert client.calls == ["https://h/a"]  # denied url never dispatched


def test_http_fetcher_cookie_jar_and_header_rotation():
    from gocrawler_ray.stages.fetcher import (
        HEADERS_POOL,
        HttpFetcher,
        header_indices,
    )

    urls = [f"https://h/c{i}" for i in range(6)]
    client = ScriptedClient({u: (200, b"x") for u in urls})
    f = HttpFetcher(client, lambda p: [_span("t")])
    f(_batch(urls[:3]))
    assert "h" in f.cookies  # session cookie accrued on first success
    f(_batch(urls[3:]))
    assert client.last_headers.get("Cookie") == f.cookies["h"]  # carried
    # rotation: the chosen header entry matches the deterministic pick
    hi = int(header_indices([urls[-1]])[0])
    assert client.last_headers["Accept-Language"] == \
        HEADERS_POOL[hi]["Accept-Language"]


def test_http_fetcher_under_real_time_dispatch_budget():
    """The production wiring: polite dispatch (real_time, FakeClock)
    driving HttpFetcher through a fake-latency transport — rows reach
    the transport in schedule order and the clock shows the politeness
    budget was honored (starts spaced ≥ crawl_delay)."""
    from gocrawler_ray.stages.fetcher import HttpFetcher

    cfg = _host_cfg(250, 2, 600)
    n = 10
    urls = [f"https://h/p{i:03d}" for i in range(n)]
    clk = FakeClock()
    client = ScriptedClient({u: (200, b"x") for u in urls}, clock=clk,
                            latency_s=0.0)
    fetcher = HttpFetcher(client, lambda p: [_span("t")])
    g = pd.DataFrame({
        "host": ["h"] * n, "url": urls, "priority": [0] * n,
        "depth": [0] * n, "robots_denied": [False] * n,
    })
    log: list = []
    out = make_polite_dispatch(
        cfg, fetcher, real_time=True, dispatch_log=log, clock=clk
    )(g)
    assert client.calls == sorted(urls)  # transport sees dispatch order
    assert out.num_rows == n
    starts = np.array([s for _, _, s in log])
    assert (np.diff(starts) >= 250).all()
    assert clk.t >= starts[-1] / 1000.0


def test_http_transport_crawl_equals_corpus_crawl(ray_session):
    """The whole engine is transport-agnostic: run_crawl(fetch_fn=
    HttpFetcher(client, decode)) over a scripted HTTP transport serving
    the same synthetic web produces the same pages, statuses, spans and
    politeness schedule as the corpus-lookup Fetcher — the drop-in-real-
    crawler contract of the S2 seam (scraper.go:79-99)."""
    import json

    from gocrawler_ray.config import CrawlConfig
    from gocrawler_ray.corpus import CorpusSpec, generate, profile_of
    from gocrawler_ray.pipelines.crawl import run_crawl
    from gocrawler_ray.sources.tables import read_table
    from gocrawler_ray.stages.fetcher import HttpClient, HttpFetcher

    spec = CorpusSpec(n_docs=250, n_hosts=2)
    t = generate(spec)
    prof = profile_of(spec)
    cfg = CrawlConfig(num_seen_shards=2, fetcher_concurrency=2,
                      batch_size=512)

    class CorpusHttpClient(HttpClient):
        """Serves the synthetic web as an HTTP transport (200 + JSON
        payload, 404 for urls outside the corpus)."""

        def __init__(self, pages):
            self.pages = pages

        def get(self, url, headers):
            if url in self.pages:
                return 200, self.pages[url]
            return 404, b""

    pages = {
        r["doc_id"]: json.dumps(r["spans"]).encode()
        for r in t["corpus"].to_pylist()
    }
    def http_fetcher():
        return HttpFetcher(CorpusHttpClient(pages),
                           lambda p: json.loads(p.decode()))

    # http_enforced = the FULL production wiring: HttpFetcher through
    # chunked budget-enforcing dispatch on a fake clock
    enforced = CrawlConfig(
        num_seen_shards=2, fetcher_concurrency=2, batch_size=512,
        enforce_politeness=True, dispatch_chunk_rows=20,
        dispatch_sample_mod=1, real_time=True, clock=FakeClock(),
    )
    fetchers = {
        "corpus": (None, cfg),
        "http": (http_fetcher(), cfg),
        "http_enforced": (http_fetcher(), enforced),
    }
    outs = {}
    for mode, (fn, c) in fetchers.items():
        root = f"/tmp/gocrawler_test/transport_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        run_crawl(t["corpus"], t["hosts"], t["seeds"], prof, c, root,
                  fetch_fn=fn)
        docs, sched = [], []
        for d in sorted(os.listdir(os.path.join(root, "docs"))):
            tb = read_table(os.path.join(root, "docs", d))
            docs.extend(sorted(
                (r["url"], r["status"], r["depth"], r["header_idx"],
                 tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                       for s in (r["spans"] or [])))
                for r in tb.to_pylist()
            ))
        for d in sorted(os.listdir(os.path.join(root, "schedule"))):
            tb = read_table(os.path.join(root, "schedule", d))
            sched.extend(sorted(
                (r["url"], r["seq"], r["sched_start_ms"])
                for r in tb.to_pylist()
            ))
        outs[mode] = (docs, sched)
    assert outs["corpus"][0] == outs["http"][0]
    assert outs["corpus"][1] == outs["http"][1]
    assert outs["corpus"][0] == outs["http_enforced"][0]
    assert outs["corpus"][1] == outs["http_enforced"][1]
    assert sum(1 for r in outs["http"][0] if r[1] == "ok") > 100
