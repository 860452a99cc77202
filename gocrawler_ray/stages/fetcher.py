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

FETCHED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),
        ("req_id", pa.string()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("sched_start_ms", pa.int64()),
        ("sched_end_ms", pa.int64()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)


def build_corpus_index(corpus: pa.Table) -> dict:
    """Sorted url-hash index over the corpus, built once on the driver."""
    hashes = url_hash64_many(corpus.column("doc_id").to_pylist())
    order = np.argsort(hashes, kind="stable")
    return {
        "sorted_hashes": hashes[order],
        "perm": order.astype(np.int64),
    }


class Fetcher:
    """``map_batches`` actor class: ``concurrency=F, num_cpus<1`` (an
    IO-bound stage in production; lookup-bound here)."""

    def __init__(self, corpus_ref, index_ref):
        self.corpus: pa.Table = ray.get(corpus_ref)
        idx = ray.get(index_ref)
        self.sorted_hashes: np.ndarray = idx["sorted_hashes"]
        self.perm: np.ndarray = idx["perm"]
        self.doc_ids = self.corpus.column("doc_id")

    def lookup(self, urls: list[str]) -> np.ndarray:
        """url list → corpus row index or -1."""
        h = url_hash64_many(urls)
        pos = np.searchsorted(self.sorted_hashes, h)
        pos = np.clip(pos, 0, len(self.sorted_hashes) - 1)
        found = self.sorted_hashes[pos] == h
        rows = np.where(found, self.perm[pos], -1)
        if found.any():
            # vectorized hash-collision guard: the matched doc_id string
            # must equal the url
            cand = self.doc_ids.take(pa.array(np.where(found, rows, 0), pa.int64()))
            eq = pa.compute.equal(cand, pa.array(urls, type=pa.string()))
            rows = np.where(found & np.asarray(eq), rows, -1)
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return FETCHED_SCHEMA.empty_table()
        urls = batch.column("url").to_pylist()
        rows = self.lookup(urls)
        ok = rows >= 0
        status = np.where(ok, "ok", "not_found").astype(object)
        error = np.where(ok, "", "Not Found").astype(object)
        # gather spans zero-copy-ish: take() on the shared corpus table;
        # null indices (failed fetches) yield null span lists
        take_idx = pa.array(
            [int(r) if r >= 0 else None for r in rows], type=pa.int64()
        ) if (~ok).any() else pa.array(rows, type=pa.int64())
        spans = self.corpus.column("spans").take(take_idx)
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("host"),
                batch.column("depth"),
                batch.column("priority"),
                batch.column("seq"),
                pa.array(md5_hex_many(urls), type=pa.string()),
                pa.array(status, type=pa.string()),
                pa.array(error, type=pa.string()),
                batch.column("sched_start_ms"),
                batch.column("sched_end_ms"),
                spans,
            ],
            schema=FETCHED_SCHEMA,
        )
