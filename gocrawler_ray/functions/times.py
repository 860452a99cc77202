"""Timestamp format/parse kernels (M18).

Reference semantics:
- request ctx ``StartAt`` is *formatted* with Go ``time.UnixDate``
  (``Mon Jan _2 15:04:05 MST 2006``) when the request is issued and
  *parsed back* in OnResponse/OnError to compute the duration —
  /root/reference/pkg/scraper/scraper.go:119,126,162.
- trace JSON ``start_at``/``end_at`` are ``time.Time`` fields, i.e.
  RFC3339 on marshal; ``request_duration`` is a durafmt string
  ("1 second 200 milliseconds") —
  /root/reference/pkg/scraper/requestTracker.go:72-74,44.
- ``Comment.Date`` prints with layout ``2 Jan 2006 15:04:05`` —
  /root/reference/pkg/item/item.go:326. The scraper never populates it
  (amazon.go:255 reads the review-date text into ``_``), so every
  crawled comment carries Go's zero time.

The engine's politeness clock is virtual (ms since wave start); these
kernels pin it to a fixed epoch so every formatted timestamp is
deterministic and reproducible across runs and machines. All kernels
are vectorized (pandas datetime64 ops — no per-row strptime).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Virtual epoch: the Go reference-layout instant, UTC. Deterministic
# stand-in for the reference's wall-clock time.Now().
VIRTUAL_EPOCH = pd.Timestamp("2006-01-02T15:04:05Z")

# Go zero time (year 1) formatted with item.go:326's layout. Out of
# datetime64 range, so it is a pinned constant.
ZERO_COMMENT_DATE = "1 Jan 0001 00:00:00"

_UNIXDATE_OUT = "%a %b %e %H:%M:%S UTC %Y"  # %e = space-padded day (Go _2)
_UNIXDATE_IN = "%a %b %d %H:%M:%S UTC %Y"


def _as_ts(ms: np.ndarray) -> pd.Series:
    return pd.Series(
        VIRTUAL_EPOCH.tz_localize(None)
        + pd.to_timedelta(np.asarray(ms, dtype=np.int64), unit="ms")
    )


def format_unixdate_many(ms: np.ndarray) -> np.ndarray:
    """Virtual-clock ms → Go ``time.UnixDate`` strings (scraper.go:119)."""
    return _as_ts(ms).dt.strftime(_UNIXDATE_OUT).to_numpy(dtype=object)


def parse_unixdate_many(strs) -> np.ndarray:
    """Go ``time.UnixDate`` strings → virtual-clock ms (scraper.go:126).

    The inverse of :func:`format_unixdate_many`; ``%d`` accepts the
    space-padded day ``%e`` emits.
    """
    ts = pd.to_datetime(pd.Series(strs, dtype=object), format=_UNIXDATE_IN)
    delta = ts - VIRTUAL_EPOCH.tz_localize(None)
    return (delta.to_numpy(dtype="timedelta64[ms]")).astype(np.int64)


def to_rfc3339_many(ms: np.ndarray) -> np.ndarray:
    """Virtual-clock ms → RFC3339 (time.Time JSON marshal, seconds
    precision + fractional ms only when nonzero, like Go)."""
    ts = _as_ts(ms)
    base = ts.dt.strftime("%Y-%m-%dT%H:%M:%S").to_numpy(dtype=object)
    frac_ms = np.asarray(ms, dtype=np.int64) % 1000
    # Go trims trailing zeros in the fraction: .120 → .12, .000 → ""
    frac = np.array(
        [f".{m:03d}".rstrip("0") if m else "" for m in frac_ms], dtype=object
    )
    return base + frac + "Z"


def durafmt_ms(ms: int) -> str:
    """durafmt-style duration string (requestTracker.go:44): nonzero
    units joined with spaces, singular/plural; 0 → "0 milliseconds"."""
    ms = int(ms)
    units = [
        ("week", 7 * 24 * 3600 * 1000),
        ("day", 24 * 3600 * 1000),
        ("hour", 3600 * 1000),
        ("minute", 60 * 1000),
        ("second", 1000),
        ("millisecond", 1),
    ]
    parts = []
    for name, size in units:
        q, ms = divmod(ms, size)
        if q:
            parts.append(f"{q} {name}{'s' if q != 1 else ''}")
    return " ".join(parts) if parts else "0 milliseconds"


def format_comment_date_many(n: int) -> np.ndarray:
    """Comment.Date column for parsed reviews: always the Go zero time
    (the reference extracts the review-date text and discards it,
    amazon.go:255), formatted with item.go:326's layout."""
    return np.full(n, ZERO_COMMENT_DATE, dtype=object)
