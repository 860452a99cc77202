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


def words_arrow(txt, lower: bool = True):
    """RE2 word tokenization, fully in Arrow: ``\\w+`` runs extracted by
    splitting on ``\\W+`` (``pc.split_pattern_regex`` — C kernel, no
    pandas lists, no per-row Python). RE2 is the SAME dialect the DuckDB
    oracles use (``regexp_extract_all``), so engine and oracle agree on
    token boundaries by construction (RE2 ``\\w`` is ASCII; Python
    ``re`` would apply unicode word classes). Nulls tokenize as empty.

    Returns ``(flat, wlen)``: ``flat`` a StringArray of the non-empty
    tokens grouped by doc in doc order, ``wlen`` per-doc token counts.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    if lower:
        txt = pc.utf8_lower(txt)
    n = len(txt)
    if n == 0:
        return pa.array([], pa.string()), np.zeros(0, dtype=np.int64)
    lists = pc.split_pattern_regex(txt, r"\W+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lens_all = pc.list_value_length(lists).to_numpy().astype(np.int64)
    values = pc.list_flatten(lists)
    nonempty = pc.greater(pc.utf8_length(values), 0)
    ne = nonempty.to_numpy(zero_copy_only=False)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens_all[:-1], out=offs[1:])
    wlen = np.zeros(n, dtype=np.int64)
    mask = lens_all > 0
    if mask.any():
        wlen[mask] = np.add.reduceat(ne.astype(np.int64), offs[mask])
    # split() emits "" fragments at doc edges/around separators; drop
    # them (order, hence doc grouping, is preserved)
    return values.filter(nonempty), wlen


def word_kgram_strings(flat, wlen, k: int, empty_gram: bool = True):
    """Vectorized word-k-gram STRING construction over a flat token
    array (``words_arrow`` output) — the inner loop of the winnowing
    fingerprint, whose gram hash is md5-over-the-gram-string and
    therefore needs the actual strings (the oracle recomputes the md5).

    Replaces the per-row ``[" ".join(ws[i:i+k]) ...]`` Python loop with
    k zero-copy shifted slices of ``flat`` joined by
    ``pc.binary_join_element_wise`` (C kernel); docs shorter than ``k``
    words emit their single whole-doc gram through ``pc.binary_join``
    over a ListArray view of the same flat array. Per-doc gram counts:

    - ``len(ws) >= k`` → ``len(ws) - k + 1`` grams,
    - ``0 < len(ws) < k`` → 1 gram (``" ".join(ws)``),
    - ``len(ws) == 0`` → 1 empty-string gram if ``empty_gram`` else 0,

    byte-identical to the loop it replaces. Returns ``(grams, lengths)``:
    ``grams`` an object ndarray grouped by doc in doc order (intra-doc
    gram order is positional for long docs; every consumer is per-doc
    order-invariant — min / unique / sign-sum / lexsort), ``lengths``
    the per-doc counts.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(wlen)
    if n == 0:
        return np.zeros(0, dtype=object), np.zeros(0, dtype=np.int64)
    lengths = np.maximum(1, wlen - k + 1)
    if not empty_gram:
        lengths = np.where(wlen == 0, 0, lengths)
    total_w = int(wlen.sum())
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wlen, out=offs[1:])

    doc_parts: list = []
    gram_parts: list = []
    if total_w >= k:
        m = total_w - k + 1
        shifted = [flat.slice(j, m) for j in range(k)]
        grams_all = pc.binary_join_element_wise(*shifted, " ")
        p = np.arange(m, dtype=np.int64)
        doc_of = np.searchsorted(offs, p, side="right") - 1
        pos = p - offs[doc_of]
        sel = pos <= wlen[doc_of] - k  # gram must not cross a doc edge
        idx = np.flatnonzero(sel)
        if idx.size:
            doc_parts.append(doc_of[idx])
            gram_parts.append(grams_all.take(pa.array(idx, pa.int64())))
    short_sel = (wlen < k) & ((wlen > 0) | empty_gram)
    if short_sel.any():
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), flat.combine_chunks()
            if isinstance(flat, pa.ChunkedArray) else flat
        )
        idx = np.flatnonzero(short_sel)
        short = pc.binary_join(
            lists.take(pa.array(idx, pa.int64())), " "
        )
        doc_parts.append(idx)
        gram_parts.append(short)
    if not gram_parts:
        return np.zeros(0, dtype=object), lengths
    doc_idx = np.concatenate(doc_parts)
    grams = pa.chunked_array(gram_parts).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    order = np.argsort(doc_idx, kind="stable")  # regroup by doc
    return grams[order], lengths


def word_kgram_hashes(flat, wlen, k: int, empty_gram: bool = True):
    """64-bit word-k-gram hashes WITHOUT constructing gram strings — the
    shingling inner loop (minhash / simhash prefilter / n-gram Jaccard
    verify), where only hash identity matters: token hashes (one stable
    ``hash_array`` pass over the dictionary-encoded UNIQUE tokens) are
    FNV-chain-mixed over k shifted views, all uint64 numpy. Two grams
    hash equal iff their token sequences are equal (same length — a
    short doc's whole-doc gram can only equal another whole-doc gram of
    the same token count) up to the usual 2^-64 mixing collisions, the
    same exactness contract the hashed-shingle Jaccard already documents.

    Same per-doc gram counts as :func:`word_kgram_strings`; empty docs
    hash to the stable hash of the empty string. Returns ``(hashes,
    lengths)`` with ``hashes`` grouped by doc in doc order.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    FNV = np.uint64(1099511628211)
    n = len(wlen)
    if n == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    lengths = np.maximum(1, wlen - k + 1)
    if not empty_gram:
        lengths = np.where(wlen == 0, 0, lengths)
    total_w = int(wlen.sum())
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wlen, out=offs[1:])

    if total_w:
        # hash each DISTINCT token once (Zipfian corpora repeat tokens a
        # lot), then gather back through the dictionary indices
        de = (
            flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
            else flat
        ).dictionary_encode()
        uh = pd.util.hash_array(
            de.dictionary.to_numpy(zero_copy_only=False)
        ).astype(np.uint64)
        h = uh[de.indices.to_numpy()]
    else:
        h = np.zeros(0, dtype=np.uint64)

    doc_parts: list = []
    hash_parts: list = []
    if total_w >= k:
        m = total_w - k + 1
        g = h[:m].copy()
        for j in range(1, k):
            g = g * FNV + h[j : j + m]
        p = np.arange(m, dtype=np.int64)
        doc_of = np.searchsorted(offs, p, side="right") - 1
        pos = p - offs[doc_of]
        sel = pos <= wlen[doc_of] - k
        idx = np.flatnonzero(sel)
        if idx.size:
            doc_parts.append(doc_of[idx])
            hash_parts.append(g[idx])
    short_sel = (wlen < k) & (wlen > 0)
    if short_sel.any():
        idx = np.flatnonzero(short_sel)
        starts = offs[idx]
        g = h[starts].copy()
        for j in range(1, k):  # ≤ k-1 vectorized passes over short docs
            has = wlen[idx] > j
            g[has] = g[has] * FNV + h[starts[has] + j]
        doc_parts.append(idx)
        hash_parts.append(g)
    if empty_gram:
        idx = np.flatnonzero(wlen == 0)
        if idx.size:
            e = pd.util.hash_array(np.array([""], dtype=object)).astype(
                np.uint64
            )[0]
            doc_parts.append(idx)
            hash_parts.append(np.full(idx.size, e, dtype=np.uint64))
    if not hash_parts:
        return np.zeros(0, dtype=np.uint64), lengths
    doc_idx = np.concatenate(doc_parts)
    hashes = np.concatenate(hash_parts)
    order = np.argsort(doc_idx, kind="stable")  # regroup by doc
    return hashes[order], lengths


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
