"""URL / identity kernels: MD5 ids, absolutization, host extraction, sharding.

Reference semantics:
- MD5 hex ids — /root/reference/pkg/ciphersuite/md5.go:9-15 (M13)
- item id = MD5("name/STORE") — /root/reference/pkg/item/item.go:84-94
- request id = MD5(url) — /root/reference/pkg/scraper/scraper.go:112
- link absolutization — /root/reference/pkg/scraper/scraper.go:190 (M4)

Sharding helpers define the two partition keys of the engine (SURVEY §7.3):
URL-seen shard = first 8 hex digits of md5(url) mod S (stable across
processes — never Python's salted ``hash``), politeness bucket =
md5(host) mod H.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlsplit

import numpy as np


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def md5_hex_many(texts) -> list[str]:
    """Batch md5 — one C call per row; used from map_batches stages."""
    _md5 = hashlib.md5
    return [_md5(t.encode("utf-8")).hexdigest() for t in texts]


def item_id(name: str, store: str) -> str:
    """MD5 of "name/STORE" (/root/reference/pkg/item/item.go:84-94)."""
    return md5_hex(f"{name}/{store}")


def request_id(url: str) -> str:
    """MD5 of the url (/root/reference/pkg/scraper/scraper.go:112)."""
    return md5_hex(url)


def absolutize(base_url: str, href: str) -> str:
    """Resolve a (possibly relative) href against the page url (M4)."""
    return urljoin(base_url, href)


def host_of(url: str) -> str:
    return urlsplit(url).netloc


def url_hash64(url: str) -> int:
    """Stable 64-bit hash of a url (first 16 hex digits of md5)."""
    return int(hashlib.md5(url.encode("utf-8")).hexdigest()[:16], 16)


def shard_of(url: str, num_shards: int) -> int:
    """URL-seen shard id: md5(url) mod S — stable routing (SURVEY §7.3)."""
    return url_hash64(url) % num_shards


def host_bucket(host: str, num_buckets: int) -> int:
    """Politeness partition: md5(host) mod H."""
    return int(hashlib.md5(host.encode("utf-8")).hexdigest()[:16], 16) % num_buckets


def url_hash64_many(urls) -> np.ndarray:
    """Vectorized-ish stable 64-bit url hashes (uint64 ndarray)."""
    _md5 = hashlib.md5
    return np.fromiter(
        (int(_md5(u.encode("utf-8")).hexdigest()[:16], 16) for u in urls),
        dtype=np.uint64,
        count=len(urls),
    )
