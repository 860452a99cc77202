"""Fetcher actor pool (S2/J3) + lineage contract (S6).

The reference fetches over HTTP with colly
(/root/reference/pkg/scraper/scraper.go:79-99) and records a
``requestTracker`` lineage row per request
(/root/reference/pkg/scraper/requestTracker.go:14-24,49-112); failures
are logged and NEVER retried (scraper.go:123-150). In the sandbox the
"network" is the synthetic corpus: a fetch is a keyed lookup
``url → spans`` (SURVEY §2.4 J3).

Scale design: the corpus Arrow table is ``ray.put`` ONCE by the driver;
each fetcher actor maps it zero-copy from the object store in
``__init__`` together with a sorted uint64 url-hash index (16 B/row), so
per-actor state is O(index), not a Python dict of the corpus. Lookup per
batch = vectorized ``np.searchsorted`` + a string-equality guard against
hash collisions. In a real deployment this actor is the HTTP client
(cookies/robots/session state per actor, T3/T4); everything around it is
unchanged.

Output: one row per scheduled request — fetched rows carry ``spans``,
failures carry ``status="not_found"`` and empty spans (the url still
counts as seen, matching colly's visited-before-fetch semantics).
``req_id = MD5(url)`` (scraper.go:112).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..corpus import SPAN_TYPE
from ..functions.urls import md5_hex_many, url_hash64_many

# One row per ADMITTED url (the wave's docs table doubles as the admitted
# frontier + fetch lineage). status ∈ {ok, not_found, robots_denied}; seq
# and virtual schedule times live in the per-wave schedule sidecar
# (pipelines/crawl.SCHEDULE_SCHEMA) — they are a pure function of the
# admitted set under the virtual politeness clock.
DOCS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("req_id", pa.string()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        # captcha flag column (S8): first captcha-span text, '' for clean
        # pages — lets the quarantine sink read LIGHT columns only
        ("captcha_text", pa.string()),
        # request-header rotation (M17): which headersPool entry the
        # request carried, surfaced in lineage
        ("header_idx", pa.int32()),
    ]
)

# Header rotation pool (M17). The reference keeps a pool and picks with
# rand.Intn (/root/reference/pkg/scraper/scrapingHeader.go:11-24 — one
# entry today, the rotation structure is the point); the engine
# strengthens the pick to a deterministic url-hash so lineage is
# reproducible. Entry 0 mirrors the reference's header set; the variants
# rotate Accept-Language.
HEADERS_POOL = [
    {
        "DNT": "1",
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,image/apng,*/*;q=0.8,application/signed-exchange;v=b3;q=0.9",
        "Accept-Encoding": "gzip, deflate, br",
        "Accept-Language": "es-US,es-419;q=0.9,es;q=0.8,en;q=0.7",
        "Cache-Control": "max-age=0",
        "Connection": "keep-alive",
    },
    {
        "DNT": "1",
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Encoding": "gzip, deflate, br",
        "Accept-Language": "es-MX,es;q=0.9,en;q=0.6",
        "Cache-Control": "max-age=0",
        "Connection": "keep-alive",
    },
    {
        "DNT": "1",
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Encoding": "gzip, deflate",
        "Accept-Language": "en-US,en;q=0.9,es;q=0.5",
        "Cache-Control": "no-cache",
        "Connection": "keep-alive",
    },
]


def header_indices(urls) -> np.ndarray:
    """Deterministic per-url header pick: url_hash mod pool size (the
    engine's seeded stand-in for GetHeaders' rand.Intn)."""
    return (url_hash64_many(urls) % np.uint64(len(HEADERS_POOL))).astype(np.int32)


def headers_for(url: str) -> dict:
    return HEADERS_POOL[int(header_indices([url])[0])]


_HASH2_KEY = "gocrawler_ray_h2"  # 16 chars → independent siphash family


def build_corpus_index_cached(corpus: pa.Table, cache_path: str | None) -> dict:
    """Disk-cached corpus index (a pure function of the corpus).

    Building costs ~4s/M urls of driver time; benches and repeated runs
    load the ``.npz`` instead (~0.5s mmap)."""
    import os

    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        return {k: z[k] for k in ("sorted_hashes", "perm", "hash2")}
    idx = build_corpus_index(corpus)
    if cache_path:
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **idx)
        os.replace(tmp, cache_path)
    return idx


def build_corpus_index(corpus: pa.Table) -> dict:
    """Sorted url-hash index over the corpus, built once on the driver.

    24 B/row of plain numpy arrays — workers map them zero-copy from the
    object store (never the url strings themselves). ``hash2`` is the
    independent-family verification hash (see Fetcher.lookup).
    """
    urls = np.asarray(corpus.column("doc_id").to_pylist(), dtype=object)
    hashes = url_hash64_many(urls)
    order = np.argsort(hashes, kind="stable")
    return {
        "sorted_hashes": hashes[order],
        "perm": order.astype(np.int64),
        "hash2": url_hash64_many(urls, hash_key=_HASH2_KEY),
    }


class Fetcher:
    """Fetch stage callable.

    In production this is an actor pool (``map_batches(Fetcher,
    concurrency=F, num_cpus<1)``) holding HTTP/cookie/robots session
    state (T2-T4). For the sandbox corpus-lookup fetch it is used as a
    PLAIN TASK function (``map_batches(make_fetch_fn(...))``): the corpus
    and index live in the object store once (``ray.put`` on the driver)
    and ``ray.get`` inside a reused worker process is a zero-copy mmap of
    local plasma — so per-wave actor-pool startup (which dominated wave
    latency) disappears while per-batch cost stays O(lookup).
    """

    def __init__(self, corpus_ref, index_ref):
        self.corpus: pa.Table = ray.get(corpus_ref) if not isinstance(corpus_ref, pa.Table) else corpus_ref
        # per-host cookie jar (T4): the reference carries site cookies
        # forward on every Visit (scraper.go:191-193). The jar is
        # PER-WORKER session state — a real HTTP fetcher would read
        # Set-Cookie here; the sandbox stamps a deterministic session
        # cookie per host on first successful fetch.
        self.cookies: dict[str, str] = {}
        idx = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        self.sorted_hashes: np.ndarray = idx["sorted_hashes"]
        self.perm: np.ndarray = idx["perm"]
        self.hash2: np.ndarray = idx["hash2"]

    def lookup(self, urls, h: np.ndarray | None = None) -> np.ndarray:
        """url array → corpus row index or -1. ``h`` lets the caller
        reuse already-computed url hashes."""
        if h is None:
            h = url_hash64_many(urls)
        pos = np.searchsorted(self.sorted_hashes, h)
        pos = np.clip(pos, 0, len(self.sorted_hashes) - 1)
        found = self.sorted_hashes[pos] == h
        rows = np.where(found, self.perm[pos], -1)
        if found.any():
            # collision guard: match must also hold under the second,
            # independent hash family (a string compare here would gather
            # from the 10M-row url column per batch — memory-bound)
            h2 = url_hash64_many(urls, hash_key=_HASH2_KEY)
            eq = self.hash2[np.where(found, rows, 0)] == h2
            rows = np.where(found & eq, rows, -1)
        return rows

    def _gather_spans_sorted(self, sorted_rows: np.ndarray, sorted_ok: np.ndarray):
        """Gather spans for ASCENDING row indices chunk by chunk.

        ``ChunkedArray.take`` concatenates chunks first, which overflows
        int32 list/string offsets on multi-GB nested columns (the 10M-page
        corpus). Per-chunk take keeps every intermediate under the chunk
        size and returns a chunked array — no concatenation ever touches
        the full column. Trailing null indices (failed/denied fetches)
        become one null chunk.
        """
        col = self.corpus.column("spans")
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        valid = sorted_rows[sorted_ok]
        out = []
        lo = 0
        for c in chunks:
            hi = lo + len(c)
            a, b = np.searchsorted(valid, (lo, hi))
            if b > a:
                out.append(c.take(pa.array(valid[a:b] - lo, pa.int64())))
            lo = hi
        n_null = int((~sorted_ok).sum())
        if n_null:
            out.append(pa.nulls(n_null, type=col.type))
        return pa.chunked_array(out, type=col.type)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return DOCS_SCHEMA.empty_table()
        urls = batch.column("url").to_pandas().to_numpy(dtype=object)
        if "robots_denied" in batch.schema.names:
            denied = batch.column("robots_denied").to_numpy(zero_copy_only=False)
        else:
            denied = np.zeros(n, dtype=bool)
        h = url_hash64_many(urls)
        rows = self.lookup(urls, h)
        rows = np.where(denied, -1, rows)  # robots-denied: never fetched
        ok = rows >= 0
        status = np.where(
            ok, "ok", np.where(denied, "robots_denied", "not_found")
        ).astype(object)
        error = np.where(
            ok, "", np.where(denied, "robots.txt disallow", "Not Found")
        ).astype(object)
        # gather spans from the shared corpus: SORTED take + inverse
        # permutation. A random-order gather on the big plasma-mmapped
        # nested column collapses under many concurrent workers (page/TLB
        # thrash); a sorted gather streams — ~3× faster per task and flat
        # scaling with workers. Null indices (failed/denied) → null spans.
        perm = np.argsort(
            np.where(ok, rows, np.iinfo(np.int64).max), kind="stable"
        )
        sorted_rows = rows[perm]
        sorted_ok = sorted_rows >= 0
        spans_sorted = self._gather_spans_sorted(sorted_rows, sorted_ok)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n)
        spans = spans_sorted.take(pa.array(inv, pa.int64()))  # local, in-cache
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        from .extract import first_captcha_text

        captcha = first_captcha_text(spans, n)
        # M17/T4 session state: header rotation pick per request; cookie
        # jar accrues a session cookie per successfully-fetched host
        # (Arrow unique — hosts per batch are few, rows are many)
        hdr_idx = (h % np.uint64(len(HEADERS_POOL))).astype(np.int32)
        import pyarrow.compute as _pc

        for hst in _pc.unique(
            batch.column("host").combine_chunks().filter(pa.array(ok))
        ).to_pylist():
            self.cookies.setdefault(
                hst, f"session={md5_hex_many([hst])[0][:16]}"
            )
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("host"),
                batch.column("depth"),
                batch.column("priority"),
                pa.array(md5_hex_many(urls.tolist()), type=pa.string()),
                pa.array(status, type=pa.string()),
                pa.array(error, type=pa.string()),
                spans,
                pa.array(captcha, type=pa.string()),
                pa.array(hdr_idx, type=pa.int32()),
            ],
            schema=DOCS_SCHEMA,
        )


# ---------------------------------------------------------------------------
# Real-HTTP transport seam (S2 — round-4 verdict #4)
# ---------------------------------------------------------------------------


class HttpClient:
    """Injectable transport contract mirroring the reference's collector
    discipline (/root/reference/pkg/scraper/scraper.go:92-99): 30 s
    request timeout (SetRequestTimeout, scraper.go:92), 30 s dial and TLS
    handshake timeouts (WithTransport, scraper.go:94-99), fixed
    user-agent (scraper.go:83). ``get`` performs ONE attempt and either
    returns ``(status_code, payload)`` or raises — the caller records
    the failure as one lineage row and NEVER retries (OnError,
    scraper.go:123-150)."""

    REQUEST_TIMEOUT_S = 30.0
    DIAL_TIMEOUT_S = 30.0
    TLS_HANDSHAKE_TIMEOUT_S = 30.0
    USER_AGENT = (
        "Mozilla/5.0 (Macintosh; Intel Mac OS X x.y; rv:42.0) "
        "Gecko/20100101 Firefox/42.0"
    )

    def get(self, url: str, headers: dict) -> tuple[int, bytes]:
        raise NotImplementedError


class UrllibClient(HttpClient):  # pragma: no cover - no network in sandbox
    """Stdlib transport. urllib exposes one overall timeout, so the
    request timeout doubles as the dial/TLS bound — the strictest
    reading of the reference's three 30 s knobs."""

    def get(self, url: str, headers: dict) -> tuple[int, bytes]:
        import urllib.request

        req = urllib.request.Request(
            url, headers={"User-Agent": self.USER_AGENT, **headers}
        )
        with urllib.request.urlopen(
            req, timeout=self.REQUEST_TIMEOUT_S
        ) as resp:
            return int(resp.status), resp.read()


class HttpFetcher:
    """Fetch stage over a REAL transport — same batch contract as
    ``Fetcher`` (rows in dispatch order in, one DOCS_SCHEMA lineage row
    per request out), with the per-request work delegated to an injected
    ``HttpClient`` and an injected ``decode_spans(payload) -> list``
    parser (the sandbox has no network, so tests drive this with a fake
    client; the plumbing — ordering, error discipline, cookies, header
    rotation — is real and tested).

    Error discipline (scraper.go:123-150): a transport error or non-200
    becomes ONE row with status='error' (or 'not_found' for 404) and the
    message in ``error``; the url is never retried — it is already in
    the seen set (visited-before-fetch), exactly like the reference.

    Scale/usage: an ACTOR POOL stage — ``map_batches(HttpFetcher(...),
    concurrency=F, num_cpus<1)`` — because each actor holds live session
    state (cookie jar, connection pools). The per-row loop is the
    network round-trip itself (politeness-paced, seconds per request);
    vectorization is irrelevant here by construction.
    """

    def __init__(self, client: HttpClient, decode_spans):
        self.client = client
        self.decode = decode_spans
        self.cookies: dict[str, str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..corpus import SPAN_TYPE as _SPAN_TYPE
        from .extract import first_captcha_text

        n = batch.num_rows
        if n == 0:
            return DOCS_SCHEMA.empty_table()
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        if "robots_denied" in batch.schema.names:
            denied = batch.column("robots_denied").to_pylist()
        else:
            denied = [False] * n
        hdr_idx = header_indices(np.asarray(urls, dtype=object))
        status, error, spans = [], [], []
        for url, host, d, hi in zip(urls, hosts, denied, hdr_idx):
            if d:
                status.append("robots_denied")
                error.append("robots.txt disallow")
                spans.append(None)
                continue
            headers = dict(HEADERS_POOL[int(hi)])
            if host in self.cookies:
                headers["Cookie"] = self.cookies[host]
            try:  # ONE attempt — failures are lineage, not retries
                code, payload = self.client.get(url, headers)
            except Exception as e:
                status.append("error")
                error.append(f"{type(e).__name__}: {e}")
                spans.append(None)
                continue
            if code == 200:
                status.append("ok")
                error.append("")
                spans.append(self.decode(payload))
                self.cookies.setdefault(
                    host, f"session={md5_hex_many([host])[0][:16]}"
                )
            else:
                status.append("not_found" if code == 404 else "error")
                error.append(f"HTTP {code}")
                spans.append(None)
        spans_arr = pa.array(spans, type=pa.list_(_SPAN_TYPE))
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("host"),
                batch.column("depth"),
                batch.column("priority"),
                pa.array(md5_hex_many(urls), type=pa.string()),
                pa.array(status, type=pa.string()),
                pa.array(error, type=pa.string()),
                spans_arr,
                pa.array(
                    first_captcha_text(spans_arr, n), type=pa.string()
                ),
                pa.array(hdr_idx, type=pa.int32()),
            ],
            schema=DOCS_SCHEMA,
        )


_FETCHER_CACHE: dict = {}


def make_fetch_fn(corpus_ref, index_ref):
    """Task-based fetch: one Fetcher instance cached per worker process
    (Ray reuses workers across tasks; ray.get of a local object is a
    zero-copy plasma mmap, so the cache only saves Python wrapping)."""
    key = corpus_ref.hex() if hasattr(corpus_ref, "hex") else id(corpus_ref)

    def fetch(batch: pa.Table) -> pa.Table:
        f = _FETCHER_CACHE.get(key)
        if f is None:
            f = Fetcher(corpus_ref, index_ref)
            _FETCHER_CACHE[key] = f
        return f(batch)

    return fetch
