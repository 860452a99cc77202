"""Frontier-candidate normalization + filtering (M1-M4, M13).

One vectorized ``map_batches`` stage: host extraction, allow-list
predicate (M1, /root/reference/pkg/scraper/scraper.go:80), URL-filter
regex (M2, scraper.go:84-86), product/category classification → priority
(M3, mixup.go:29), and the stable url hash used for seen-shard routing
(M13, scraper.go:112).

Regex evaluation uses Arrow's RE2 kernel (``pc.match_substring_regex``)
— test_stages asserts RE2/Python-`re` parity on the shop patterns so the
golden oracle (Python re) and the engine (RE2) can never diverge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ShopProfile
from ..functions.urls import url_hash64_many

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("discovered_from", pa.string()),
        ("url_hash", pa.uint64()),
    ]
)


def _strip_inline_flags(pattern: str) -> str:
    # RE2 rejects Python-placement of (?m) mid-pattern only; leading is fine,
    # but normalize anyway — none of our patterns are multiline-sensitive
    # (they match whole URLs, no newlines).
    return pattern.removeprefix("(?m)")


class CandidateFilter:
    """Callable for ``map_batches`` (stateless tasks are fine; kept as a
    class so the compiled patterns + allow-set build once per actor when
    run with ``concurrency=``)."""

    def __init__(self, profile: ShopProfile, num_seen_shards: int):
        self.extraction_pattern = _strip_inline_flags(profile.link_extraction_query)
        self.product_pattern = _strip_inline_flags(profile.link_product_query)
        self.allowed = pa.array(sorted(profile.allowed_hosts()), type=pa.string())
        self.num_seen_shards = num_seen_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return FRONTIER_SCHEMA.empty_table()
        urls = batch.column("url")
        # host = netloc; Arrow has no URL kernel → derive via regex capture
        hosts = pc.replace_substring_regex(
            urls, pattern=r"^[a-z]+://([^/]*).*$", replacement=r"\1"
        )
        ok = pc.is_in(hosts, value_set=self.allowed)  # M1
        ok = pc.and_(ok, pc.match_substring_regex(urls, self.extraction_pattern))  # M2
        tbl = batch.append_column("host", hosts).filter(ok)
        if tbl.num_rows == 0:
            return FRONTIER_SCHEMA.empty_table()
        is_product = pc.match_substring_regex(tbl.column("url"), self.product_pattern)
        priority = pc.if_else(is_product, pa.scalar(0, pa.int32()), pa.scalar(1, pa.int32()))
        hashes = url_hash64_many(
            tbl.column("url").to_pandas().to_numpy(dtype=object)
        )
        depth = (
            tbl.column("depth")
            if "depth" in tbl.schema.names
            else pa.array(np.zeros(tbl.num_rows, dtype=np.int32))
        )
        discovered = (
            tbl.column("discovered_from")
            if "discovered_from" in tbl.schema.names
            else pa.array([""] * tbl.num_rows, type=pa.string())
        )
        return pa.Table.from_arrays(
            [
                tbl.column("url"),
                tbl.column("host"),
                depth,
                priority,
                discovered,
                pa.array(hashes),
            ],
            schema=FRONTIER_SCHEMA,
        )
