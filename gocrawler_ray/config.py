"""Shop profiles + crawl configuration.

The reference's plugin surface is the ``shopCrawler`` interface
(/root/reference/pkg/scraper/shopfactory.go:12-18): per-shop link
regexes, allowed domains and an ordered callback registry. Here that is a
frozen dataclass registry; the regexes below are byte-copies of the
reference patterns (/root/reference/pkg/scraper/mixup.go:28-34,
/root/reference/pkg/scraper/amazon.go:45-64) so the URL-filter unit tests
check parity, plus a SYNTH profile used by the deterministic corpus.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ShopProfile:
    """Engine equivalent of the reference ``shop`` struct (SURVEY §2.10)."""

    name: str
    source_store: str
    domain_glob: str
    link_extraction_query: str  # M2 — URLs allowed to be visited
    link_product_query: str  # M3 — URLs that are product pages
    allowed_domains: tuple[str, ...]  # M1 — host allow-list

    def extraction_re(self) -> re.Pattern:
        return re.compile(self.link_extraction_query, re.M)

    def product_re(self) -> re.Pattern:
        return re.compile(self.link_product_query, re.M)

    def allowed_hosts(self) -> frozenset[str]:
        # colly matches on the request host; the reference allow-lists carry
        # scheme-prefixed variants too (mixup.go:30-34) — normalize to hosts.
        hosts = set()
        for d in self.allowed_domains:
            hosts.add(d.split("://", 1)[-1])
        return frozenset(hosts)


# /root/reference/pkg/scraper/mixup.go:24-34
MIXUP = ShopProfile(
    name="MIXUP",
    source_store="Mixup",
    domain_glob="*mixup.*",
    link_extraction_query=r"(?m)https://www\.mixup\.com\.mx/[Mm]ixup/(([Hh]ome\.aspx)|((Categoria|Productos)\.aspx\?(etq\=))|(detproducto\.aspx\?sku=\d+)$)",
    link_product_query=r"(?m)(https://www\.mixup\.com\.mx/[Mm]ixup/)(detproducto\.aspx\?sku=\d{12,})$",
    allowed_domains=(
        "https://www.mixup.com.mx",
        "www.mixup.com.mx",
        "mixup.com.mx",
    ),
)

# /root/reference/pkg/scraper/amazon.go:44-64
AMAZON = ShopProfile(
    name="AMAZON",
    source_store="Amazon",
    domain_glob="*amazon.*",
    link_extraction_query=r"(?m)https:\/\/www\.amazon\.(com\.mx|mx|es|co\.uk|com)\/(s[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+$)|([\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+dp[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+)",
    link_product_query=r"(?m)https:\/\/www\.amazon\.(?:com\.mx|mx|es|co\.uk|com)\/(?:[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+(dp/\w{10})[\w\-\._~:/?#[\]@!\$&'\(\)\*\+,;=.]+)",
    allowed_domains=(
        "https://www.amazon.com.mx",
        "www.amazon.com.mx",
        "amazon.com.mx",
        "https://www.amazon.com",
        "www.amazon.com",
        "amazon.com",
        "https://www.amazon.co.uk",
        "www.amazon.co.uk",
        "amazon.co.uk",
        "https://www.amazon.es",
        "www.amazon.es",
        "amazon.es",
    ),
)


def synth_profile(hosts: tuple[str, ...]) -> ShopProfile:
    """Profile for the deterministic synthetic corpus.

    URL shapes mirror the mixup grammar (category pages carry a query
    param, product pages carry a 13-digit sku and must END the url —
    exercising the same anchored-regex semantics as mixup.go:28-29).
    """
    host_alt = "|".join(re.escape(h) for h in hosts)
    return ShopProfile(
        name="SYNTH",
        source_store="Synth",
        domain_glob="*synth*",
        link_extraction_query=(
            r"(?m)https://(?:%s)/shop/((home\.aspx)|(cat\.aspx\?etq=\w+)|(detproducto\.aspx\?sku=\d+)$)"
            % host_alt
        ),
        link_product_query=(
            r"(?m)(https://(?:%s)/shop/)(detproducto\.aspx\?sku=\d{12,})$" % host_alt
        ),
        allowed_domains=hosts,
    )


@dataclass(frozen=True)
class CrawlConfig:
    """Engine-wide knobs (replaces the reference's env-var globals,
    /root/reference/internal/env/setter.go:22-85)."""

    num_seen_shards: int = 16  # S — cuckoo shards
    num_host_buckets: int = 32  # H — politeness partitions
    fetcher_concurrency: int = 8  # F — fetcher actor pool size
    max_parallel_per_host: int = 4  # LimitRule.Parallelism (scraper.go:103)
    default_crawl_delay_ms: int = 3000  # mean of RandomDelay≤6s (scraper.go:104)
    max_depth: int | None = None  # reference has MaxDepth commented out
    max_waves: int | None = None
    batch_size: int = 4096
    # NOTE on hot-host skew: no salting knobs — the analytic politeness
    # sidecar eliminates the skewed groupby(host) shuffle on the primary
    # path entirely (see pipelines/crawl.py and README "Skew")
    cuckoo_capacity: int = 1 << 16  # per-shard capacity, auto-grows
    # Enforce the politeness budget AT DISPATCH (groupby(host) →
    # ordered, budget-checked fetch; stages/dispatch.py) instead of the
    # default post-hoc analytic sidecar. Turn on when the Fetcher is a
    # real HTTP client; real_time additionally paces on the wall clock.
    enforce_politeness: bool = False
    real_time: bool = False
    # clock seam for real_time pacing (stages/dispatch.WallClock when
    # None; tests inject FakeClock to drive the wall-pacing code path
    # on a fake-latency virtual clock)
    clock: object = None
    # max rows one polite-dispatch group may hold (enforced mode): hosts
    # above this split into contiguous rank ranges (chunked dispatch,
    # stages/dispatch.py) so a Zipf head host never materializes one
    # giant frame in one task. The cap picks the PLAN, never the
    # semantics — the equality test pins chunked == whole-host outputs.
    dispatch_chunk_rows: int = 2_000_000
    # sample modulus for the chunk-boundary hash sample (1-in-mod rows;
    # tests set 1 so tiny corpora still exercise real chunk splits)
    dispatch_sample_mod: int = 512
    # waves up to this many rows are politeness-scheduled on the driver
    # (closed-form vectorized — ~1s per 2M rows; the admitted table is
    # already resident for the seq-count pass). Bigger waves use the
    # distributed groupby(host) shuffle, which on Zipf-skewed hosts pays
    # a straggler — prefer the driver path until wave size threatens
    # driver memory (~100B/row)
    driver_schedule_limit: int = 20_000_000
