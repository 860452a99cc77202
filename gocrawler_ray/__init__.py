"""gocrawler_ray — a Ray-Data-native URL frontier + fetch scheduler.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference crawler (``Alvazz/gocrawler``,
/root/reference): fetch → parse → extract → dedup → schedule re-expressed
as Ray Data pipelines over tables of interleaved text+media documents
(``doc_id: string, spans: list<struct<kind, text, media_ref, offset>>``),
with

- a sharded cuckoo-filter URL-seen set (actor shards keyed by
  ``md5(url) % S`` — the shared mutable index the Dataset API can't
  express),
- a per-host politeness scheduler (host-hash partitioning, virtual-clock
  budget identical to the reference's ``LimitRule{Parallelism:4,
  RandomDelay:6s}`` envelope, /root/reference/pkg/scraper/scraper.go:101-105),
- link extraction / span parsing via ``map_batches`` over zero-copy Arrow
  batches,
- per-partition checkpoint/resume (frontier segments + cuckoo shards +
  lineage) so a killed crawl resumes with no duplicate fetches.

Storage: Lance when the ``lance`` package is importable, Parquet
directories otherwise (this sandbox has no Lance wheel); the layout and
schemas are identical either way (see ``gocrawler_ray.sources.tables``).
"""

__version__ = "0.1.0"

from ._compat import shim_fsspec_http as _shim_fsspec_http

# one-time, thread-safe-by-construction: runs at package import, before
# any crawl thread exists (see _compat.py for the race this prevents)
_shim_fsspec_http()
