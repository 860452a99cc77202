"""Text normalizers + price/currency kernels.

Semantics mirror the reference byte-for-byte (golden tests depend on it):

- space collapsing / block splitting / positional key:value parse —
  /root/reference/pkg/scraper/mixup.go:172-235 (M7, M15)
- price text chain (split ':', strip, drop '$' and ',', float parse) —
  /root/reference/pkg/scraper/mixup.go:115-169 (M8)
- key/value + review whitespace normalizers —
  /root/reference/pkg/scraper/amazon.go:220,250 (M10, M11, M15)
- fixed-point cents currency — /root/reference/pkg/item/currency.go:6-33 (M14)

These are scalar kernels; the vectorized entry points used in hot
``map_batches`` stages live in :mod:`gocrawler_ray.stages.extract` and call
these only through pandas ``str`` ops / numpy where possible.
"""

from __future__ import annotations

import math
import re

# (?m)( {2,}) — mixup.go:118,185: runs of 2+ spaces are REPLACED WITH "" (not a
# single space) in both the details text and the price text.
_SPACE_CLEANER = re.compile(r"( {2,})", re.M)
# (?m)(\r\n|\r|\n|\t)+ — mixup.go:186: block divider for the positional parse.
# Go's regexp.Split drops capture groups; Python's re.split would include
# them, so the group is non-capturing here to match Go's output.
_DIVIDER = re.compile(r"(?:\r\n|\r|\n|\t)+", re.M)
# (?m):|\s{2,}|\n+ — amazon.go:220,239: key/value normalizer (drops colons too).
_KV_CLEANER = re.compile(r":|\s{2,}|\n+", re.M)
# (?m)\s{2,}|\n+ — amazon.go:250: review-content normalizer (keeps colons).
_REVIEW_CLEANER = re.compile(r"\s{2,}|\n+", re.M)


def collapse_spaces(s: str) -> str:
    """Delete runs of 2+ spaces (mixup.go:118 ``spaceCleaner``)."""
    return _SPACE_CLEANER.sub("", s)


def split_blocks(s: str) -> list[str]:
    """Split on newline/tab runs (mixup.go:186 ``divider``)."""
    return _DIVIDER.split(s)


def normalize_kv(s: str) -> str:
    """Drop colons, 2+ whitespace runs and newlines (amazon.go:220)."""
    return _KV_CLEANER.sub("", s)


def normalize_review(s: str) -> str:
    """Drop 2+ whitespace runs and newlines (amazon.go:250)."""
    return _REVIEW_CLEANER.sub("", s)


def to_cents(f: float) -> int:
    """float price → int64 cents: ``int64(f*100 + 0.5)``.

    Go's int64() conversion truncates toward zero
    (/root/reference/pkg/item/currency.go:10-12); for the non-negative
    prices the reference handles this is round-half-up.
    """
    return int(math.floor(f * 100 + 0.5)) if f >= 0 else int(f * 100 + 0.5)


def cents_to_float(c: int) -> float:
    """cents → float (/root/reference/pkg/item/currency.go:15-19)."""
    return c / 100


def multiply_cents(c: int, f: float) -> int:
    """cents × float, round-half-up (/root/reference/pkg/item/currency.go:23-26)."""
    return int(math.floor(c * f + 0.5))


def format_cents(c: int) -> str:
    """``$%.2f`` (/root/reference/pkg/item/currency.go:29-33)."""
    return "$%.2f" % (c / 100)


def parse_price_text(span_text: str) -> int | None:
    """Price-span text → cents, or None when unparseable.

    Mirrors the mixup price chain (/root/reference/pkg/scraper/mixup.go:125-148):
    split on ':' and take the tail; delete 2+-space runs; strip; bail on
    empty; drop '$' and ','; ParseFloat; ToCurrency.
    """
    parts = span_text.split(":")
    text_price = parts[1] if len(parts) > 1 else ""
    text_price = collapse_spaces(text_price).strip()
    if not text_price:
        return None
    text_price = text_price.replace("$", "").replace(",", "")
    try:
        f = float(text_price)
    except ValueError:
        return None
    return to_cents(f)


def positional_parse(blocks: list[str]) -> tuple[str, str, dict[str, str]]:
    """Positional details parse: row0→name, row1→brand, rest ``key:value``.

    Mirrors /root/reference/pkg/scraper/mixup.go:188-210: blank blocks are
    skipped WITHOUT consuming a position; the key:value split takes only
    the first ':' pair (Go ``strings.Split(info, ":")`` then indices 0/1).
    """
    name, brand = "", ""
    details: dict[str, str] = {}
    count = 0
    for info in blocks:
        info = info.strip()
        if not info:
            continue
        if count == 0:
            name = info
        elif count == 1:
            brand = info
        else:
            detail = info.split(":")
            if len(detail) > 1:
                details[detail[0].strip()] = detail[1].strip()
        count += 1
    return name, brand, details


def json_int_field(col, key: str, strict: bool = False):
    """Vectorized extraction of an integer field from a flat JSON-string
    column (the engine's JSON-unmarshal surface, SURVEY §2.8 — the
    reference unmarshals items back out of Redis the same way,
    /root/reference/pkg/item/marshal.go): one Arrow ``extract_regex``
    pass, no per-row json.loads. Missing keys yield -1 (COALESCE on the
    SQL side keeps the gate null-free).

    PRECONDITION (fast path): props are FLAT objects whose ``key`` value
    is a whole JSON integer. The pattern requires the key token to open
    after ``{``/``,`` and the number to terminate at ``,``/``}``/space,
    so it cannot truncate a float (``"k":1.5`` → -1, never 1), but it
    still cannot see nesting depth — a same-named key inside a NESTED
    object or a string value containing ``,"k":7,`` would match. When
    the schema is not guaranteed flat, pass ``strict=True`` for a real
    per-row ``json.loads`` (exact ``json_extract('$.key')`` semantics,
    ~20× slower — keep it off the hot path or push it into an actor
    pool).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if strict:
        import json

        out = []
        for v in col.to_pylist():
            try:
                got = json.loads(v).get(key) if v else None
            except (ValueError, AttributeError):
                got = None
            out.append(got if isinstance(got, int) and not isinstance(got, bool) else -1)
        return pa.array(out, pa.int64())

    pat = f'[{{,]\\s*"{key}"\\s*:\\s*(?P<v>-?\\d+)\\s*[,}}]'
    ex = pc.extract_regex(col, pat)
    val = pc.cast(pc.struct_field(ex, "v"), pa.int64())
    return pc.coalesce(val, pa.scalar(-1, pa.int64()))
