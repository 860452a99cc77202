"""Items pipeline — the reference's parser Lambda re-expressed (SURVEY §3.2).

Reference flow: cron Lambda → Redis SCAN product:* pages of 200 →
goroutine per key → 3-way Redis lookup join reassembles each Item →
Comprehend per comment → items channel
(/root/reference/cmd/parser/main.go:14-31,
pkg/itemparser/extractor.go:30-67, pkg/storage/redis/repository.go:95-246).

Ray-Data-first: the point-lookup storm disappears — the docs table is
already denormalized, so the pipeline is a straight scan:

    read docs (streaming blocks ≙ SCAN pages, S5)
    → filter fetched ∧ ¬captcha (vectorized)
    → parse_items (zero-copy Arrow map_batches, M7-M11)
    → ReviewAnalyzer actor pool (S11/T6)
    → write items table (S3: one nested row replaces the
      product:/comments:/details: Redis key triple)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.analyzer import ReviewAnalyzer
from ..stages.extract import parse_items
from ..sources.tables import write_dataset


def build_items(
    docs: rd.Dataset,
    source_store: str = "Synth",
    analyzer_concurrency: int = 4,
    batch_size: int = 2048,
) -> rd.Dataset:
    """docs (DOCS_SCHEMA or plain doc_id+spans) → enriched items."""

    def to_items(t: pa.Table) -> pa.Table:
        if "status" in t.schema.names:
            t = t.filter(pc.equal(t.column("status"), "ok"))
            t = pa.table({"doc_id": t.column("url"), "spans": t.column("spans")})
        items = parse_items(t, source_store=source_store)
        # captcha pages quarantine (S8): no item row
        return items.filter(pc.invert(items.column("is_captcha")))

    items = docs.map_batches(to_items, batch_format="pyarrow", batch_size=batch_size)
    return items.map_batches(
        ReviewAnalyzer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=analyzer_concurrency,
    )


def run_items(docs: rd.Dataset, out_uri: str, **kwargs) -> None:
    write_dataset(build_items(docs, **kwargs), out_uri)
