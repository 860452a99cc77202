"""Span parsing + link extraction — the hot ``map_batches`` stages (M5-M12).

Both stages take zero-copy Arrow batches of interleaved documents
(``doc_id, spans``) and work on the FLATTENED span arrays (one
``np.repeat`` doc-index per span), so string kernels run once over all
spans of the batch — never a Python loop over rows in the common path.
Python touches only the sparse span classes (details/reviews/links),
a small fraction of rows.

Parse semantics re-express the reference's DOM-callback chain
(/root/reference/pkg/scraper/mixup.go:104-235, amazon.go:119-288) over
span kinds; span ORDER is load-bearing (positional name/brand/details
parse, mixup.go:188-210):

- spans of kind ``text``/``detail`` are the detail block: 1st non-empty →
  name, 2nd → brand, later ones with ':' → details (first pair only);
  later ``text`` spans without ':' → description blocks (joined "\n");
- LAST ``price`` span wins (mixup's .Each overwrite, mixup.go:121-148);
- ``review`` spans: author␟stars-text␟title␟content; stars = first
  whitespace field (amazon.go:253), content whitespace-normalized
  (amazon.go:250), date read-and-discarded (amazon.go:255);
- ``captcha`` span ⇒ quarantined page: no item, no links
  (amazon.go:290-295);
- item id = MD5(name + "/" + STORE) (item.go:84-94).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..corpus import REVIEW_SEP
from ..functions.text import to_cents
from ..functions.urls import absolutize, md5_hex_many

REVIEW_TYPE = pa.struct(
    [
        ("title", pa.string()),
        ("content", pa.string()),
        ("author", pa.string()),
        ("stars", pa.float64()),
        # Comment.Date (item.go:17). The reference's review callback
        # reads the review-date span text and DISCARDS it
        # (amazon.go:255: `_ = element.Find(...review-date...).Text()`),
        # so every crawled comment carries Go's zero time — formatted
        # with item.go:326's layout (M18). Parity with the bug is part
        # of the contract; the page's date text is likewise extracted
        # and dropped here.
        ("date", pa.string()),
    ]
)
DETAIL_TYPE = pa.struct([("key", pa.string()), ("value", pa.string())])

ITEMS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("id", pa.string()),
        ("name", pa.string()),
        ("brand", pa.string()),
        ("description", pa.string()),
        ("price_cents", pa.int64()),
        ("rating", pa.float64()),
        ("source_store", pa.string()),
        ("url", pa.string()),
        ("reviews", pa.list_(REVIEW_TYPE)),
        ("details", pa.list_(DETAIL_TYPE)),
        ("image_urls", pa.list_(pa.string())),
        # M6 meta tags — deliberately SWAPPED, reproducing the
        # reference's crossed selectors (mixup.go:72-73: the variable
        # named `keywords` reads meta[name="Description"] and vice
        # versa). Parity with the bug is part of the contract.
        ("meta_keywords", pa.string()),
        ("meta_description", pa.string()),
        ("is_captcha", pa.bool_()),
    ]
)

CANDIDATES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("discovered_from", pa.string()),
        ("anchor_text", pa.string()),
    ]
)

# Captcha quarantine rows (S8) — the evidence the reference persists on a
# blocked page (/root/reference/pkg/scraper/amazon.go:290-318): identity +
# the captcha span payload, one row per quarantined page.
QUARANTINE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("req_id", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("captcha_text", pa.string()),
    ]
)


def first_captcha_text(spans, n_rows: int) -> np.ndarray:
    """Per-row first captcha-span text ('' for clean pages), vectorized.

    ``spans`` is the (possibly null-entried) list<span> column; null rows
    (failed/denied fetches) count as clean."""
    import pyarrow.compute as pc

    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    out = np.full(n_rows, "", dtype=object)
    lengths = pc.fill_null(pc.list_value_length(spans), 0).to_numpy()
    if lengths.sum() == 0:
        return out
    flat = pc.list_flatten(spans)
    # stay in Arrow: only the (rare) captcha spans ever materialize to
    # Python — the common all-clean batch costs one equality kernel
    cmask = pc.equal(flat.field("kind"), pa.scalar("captcha"))
    if not pc.any(cmask).as_py():
        return out
    c_np = cmask.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    docs = doc_idx[c_np]
    texts = np.asarray(flat.field("text").filter(cmask).to_pylist(), dtype=object)
    uniq, first = np.unique(docs, return_index=True)
    out[uniq] = texts[first]
    return out


def _flatten_spans(batch: pa.Table):
    """spans列 → (flat struct fields as numpy/pandas, doc index per span)."""
    col = batch.column("spans")
    spans = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(spans, pa.LargeListArray) or isinstance(spans, pa.ListArray):
        flat = spans.flatten()
        offsets = spans.offsets.to_numpy()
    else:  # pragma: no cover - defensive
        raise TypeError(f"spans column is {type(spans)}")
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lengths)
    return flat, doc_idx


def parse_items(batch: pa.Table, source_store: str = "Synth") -> pa.Table:
    """Interleaved docs → one denormalized item row per non-captcha page.

    Output replaces the reference's 3-key Redis layout
    (/root/reference/pkg/storage/redis/repository.go:25-93) with a nested
    row; ``rating`` is always 0.0 exactly as mixup's parser leaves it
    (mixup.go:178,226).
    """
    n = batch.num_rows
    if n == 0:
        return ITEMS_SCHEMA.empty_table()
    flat, doc_idx = _flatten_spans(batch)
    doc_ids = batch.column("doc_id").to_pandas()
    kind = flat.field("kind").to_pandas()
    text = flat.field("text").to_pandas()
    media = flat.field("media_ref").to_pandas()

    captcha_docs = np.bincount(doc_idx[(kind == "captcha").to_numpy()], minlength=n) > 0

    # --- positional text/detail parse (vectorized rank within doc) -----
    td = (kind == "text") | (kind == "detail")
    stripped = text.str.strip()
    td &= stripped != ""
    td_np = td.to_numpy()
    td_doc = doc_idx[td_np]
    td_text = stripped[td_np]
    # rank of each text/detail span within its doc (spans are in order)
    rank = (
        pd.Series(np.ones(td_doc.size, dtype=np.int64))
        .groupby(td_doc)
        .cumcount()
        .to_numpy()
        if td_doc.size
        else np.zeros(0, dtype=np.int64)
    )

    names = np.full(n, "", dtype=object)
    brands = np.full(n, "", dtype=object)
    names[td_doc[rank == 0]] = td_text.to_numpy()[rank == 0]
    brands[td_doc[rank == 1]] = td_text.to_numpy()[rank == 1]

    later = rank >= 2
    later_doc = td_doc[later]
    later_text = td_text.to_numpy()[later]
    later_kind = kind.to_numpy()[td_np][later]
    has_colon = np.char.find(later_text.astype(str), ":") >= 0

    descriptions = np.full(n, "", dtype=object)
    desc_mask = (later_kind == "text") & ~has_colon
    if desc_mask.any():
        s = pd.Series(later_text[desc_mask]).groupby(later_doc[desc_mask]).agg("\n".join)
        descriptions[s.index.to_numpy()] = s.to_numpy()

    details_per_doc: list[list[dict]] = [[] for _ in range(n)]
    det_mask = has_colon
    for d, t in zip(later_doc[det_mask], later_text[det_mask]):
        parts = t.split(":")
        details_per_doc[d].append(
            {"key": parts[0].strip(), "value": parts[1].strip()}
        )

    # --- price: last price span wins ----------------------------------
    price_cents = np.zeros(n, dtype=np.int64)
    p_np = (kind == "price").to_numpy()
    if p_np.any():
        p_doc = doc_idx[p_np]
        # vectorized mixup chain: segment between the 1st and 2nd ':' only
        # (Go strings.Split + index 1, mixup.go:125-148 — matches the
        # scalar parse_price_text kernel), delete 2+-space runs, strip,
        # drop $/,
        p_txt = text[p_np].str.split(":").str[1].fillna("")
        p_txt = p_txt.str.replace(r" {2,}", "", regex=True).str.strip()
        p_txt = p_txt.str.replace("$", "", regex=False).str.replace(",", "", regex=False)
        vals = pd.to_numeric(p_txt, errors="coerce")
        ok = vals.notna().to_numpy()
        cents = np.floor(vals.to_numpy(dtype=np.float64) * 100 + 0.5)
        # keep the LAST parseable price per doc
        for d, c, k in zip(p_doc[ok], cents[ok], range(ok.sum())):
            price_cents[d] = int(c)

    # --- reviews -------------------------------------------------------
    reviews_per_doc: list[list[dict]] = [[] for _ in range(n)]
    r_np = (kind == "review").to_numpy()
    if r_np.any():
        from ..functions.text import normalize_review
        from ..functions.times import ZERO_COMMENT_DATE

        for d, t in zip(doc_idx[r_np], text[r_np]):
            parts = t.split(REVIEW_SEP)
            if len(parts) < 4:
                continue
            author, stars_text, title, content = parts[0], parts[1], parts[2], parts[3]
            # parts[4:] is the review-date text — extracted then
            # discarded like amazon.go:255; Date stays the zero time
            fields = stars_text.split()
            try:
                stars = float(fields[0]) if fields else 0.0
            except ValueError:
                stars = 0.0
            reviews_per_doc[d].append(
                {
                    "title": title,
                    "content": normalize_review(content),
                    "author": author,
                    "stars": stars,
                    "date": ZERO_COMMENT_DATE,
                }
            )

    # --- media ---------------------------------------------------------
    images_per_doc: list[list[str]] = [[] for _ in range(n)]
    m_np = (kind == "media").to_numpy()
    for d, ref in zip(doc_idx[m_np], media[m_np]):
        images_per_doc[d].append(ref)

    # --- meta tags (M6) — swapped per mixup.go:72-73: the Keywords
    # column holds the Description meta's content and vice versa; first
    # match wins (colly ChildAttr semantics)
    meta_kw = np.full(n, "", dtype=object)
    meta_desc = np.full(n, "", dtype=object)
    mt_np = (kind == "meta").to_numpy()
    if mt_np.any():
        for d, t in zip(doc_idx[mt_np], text[mt_np]):
            key, _, val = t.partition(":")
            key, val = key.strip(), val.strip()
            if key == "Description" and not meta_kw[d]:
                meta_kw[d] = val
            elif key == "Keywords" and not meta_desc[d]:
                meta_desc[d] = val

    ids = md5_hex_many([f"{nm}/{source_store}" for nm in names])

    out = pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(ids, type=pa.string()),
            pa.array(names, type=pa.string()),
            pa.array(brands, type=pa.string()),
            pa.array(descriptions, type=pa.string()),
            pa.array(price_cents),
            pa.array(np.zeros(n, dtype=np.float64)),
            pa.array([source_store] * n, type=pa.string()),
            pa.array(doc_ids, type=pa.string()),
            pa.array(reviews_per_doc, type=pa.list_(REVIEW_TYPE)),
            pa.array(details_per_doc, type=pa.list_(DETAIL_TYPE)),
            pa.array(images_per_doc, type=pa.list_(pa.string())),
            pa.array(meta_kw, type=pa.string()),
            pa.array(meta_desc, type=pa.string()),
            pa.array(captcha_docs),
        ],
        schema=ITEMS_SCHEMA,
    )
    return out


def parse_items_amazon(batch: pa.Table) -> pa.Table:
    """Amazon-profile item parse (M9/M10) over amazon-shaped spans.

    Mirrors the amazon DOM callbacks rather than mixup's positional
    parse (/root/reference/pkg/scraper/amazon.go:119-240):

    - ``name``/``brand`` spans: selector-addressed (first span of the
      kind), values ``strings.Trim``-med of newlines (amazon.go:130,134);
    - ``stars`` span: rating = ParseFloat(first whitespace field), 0.0
      on parse failure (amazon.go:138-147) — amazon DOES set rating,
      mixup leaves it 0;
    - ``price`` span: drop '$' and ',' then ParseFloat — NO colon split
      (amazon.go:149-159); unparseable → 0 cents;
    - ``detail_row`` spans (prodDetTable, amazon.go:231-244): text is
      ``key␟value``, BOTH sides normalized with ``:|\\s{2,}|\\n+`` → '';
    - ``bullet_row`` spans (detailBullets, amazon.go:220-228): key
      normalized, value only TrimSpace-d;
    - later duplicate detail keys overwrite (Go map semantics);
    - ``review``/``captcha``/``media`` spans: same semantics as
      :func:`parse_items`; description is never set (amazon.go:166-174);
    - id = MD5(name + "/Amazon") (item.go:84-94).
    """
    from ..corpus import REVIEW_SEP
    from ..functions.text import normalize_kv, normalize_review
    from ..functions.times import ZERO_COMMENT_DATE

    n = batch.num_rows
    if n == 0:
        return ITEMS_SCHEMA.empty_table()
    flat, doc_idx = _flatten_spans(batch)
    doc_ids = batch.column("doc_id").to_pandas()
    kind = flat.field("kind").to_pandas().to_numpy()
    text = flat.field("text").to_pandas()
    media = flat.field("media_ref").to_pandas()

    captcha_docs = np.bincount(doc_idx[kind == "captcha"], minlength=n) > 0

    def first_of(span_kind: str) -> np.ndarray:
        out = np.full(n, "", dtype=object)
        m = kind == span_kind
        if m.any():
            docs = doc_idx[m]
            vals = text.to_numpy()[m]
            uniq, first = np.unique(docs, return_index=True)
            out[uniq] = vals[first]
        return out

    names = np.array([s.strip("\n") for s in first_of("name")], dtype=object)
    brands = np.array([s.strip("\n") for s in first_of("brand")], dtype=object)

    rating = np.zeros(n, dtype=np.float64)
    for i, s in enumerate(first_of("stars")):
        fields = s.split()
        if fields:
            try:
                rating[i] = float(fields[0])
            except ValueError:
                pass

    price_cents = np.zeros(n, dtype=np.int64)
    for i, s in enumerate(first_of("price")):
        p = s.replace("$", "").replace(",", "")
        try:
            price_cents[i] = int(np.floor(float(p) * 100 + 0.5))
        except ValueError:
            pass

    details_map: list[dict] = [{} for _ in range(n)]
    for span_kind, norm_val in (("detail_row", True), ("bullet_row", False)):
        m = kind == span_kind
        for d, t in zip(doc_idx[m], text.to_numpy()[m]):
            raw_key, _, raw_val = t.partition(REVIEW_SEP)
            key = normalize_kv(raw_key)
            val = normalize_kv(raw_val) if norm_val else raw_val.strip()
            details_map[d][key] = val  # dup key overwrites (Go map)
    details_per_doc = [
        [{"key": k, "value": v} for k, v in dm.items()] for dm in details_map
    ]

    reviews_per_doc: list[list[dict]] = [[] for _ in range(n)]
    r_np = kind == "review"
    for d, t in zip(doc_idx[r_np], text.to_numpy()[r_np]):
        parts = t.split(REVIEW_SEP)
        if len(parts) < 4:
            continue
        author, stars_text, title, content = parts[0], parts[1], parts[2], parts[3]
        # parts[4:] (review-date text) extracted then discarded, amazon.go:255
        fields = stars_text.split()
        try:
            stars = float(fields[0]) if fields else 0.0
        except ValueError:
            stars = 0.0
        reviews_per_doc[d].append(
            {"title": title, "content": normalize_review(content),
             "author": author, "stars": stars, "date": ZERO_COMMENT_DATE}
        )

    images_per_doc: list[list[str]] = [[] for _ in range(n)]
    m_np = kind == "media"
    for d, ref in zip(doc_idx[m_np], media.to_numpy()[m_np]):
        images_per_doc[d].append(ref)

    ids = md5_hex_many([f"{nm}/Amazon" for nm in names])
    empty = np.full(n, "", dtype=object)
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(ids, type=pa.string()),
            pa.array(names, type=pa.string()),
            pa.array(brands, type=pa.string()),
            pa.array(empty, type=pa.string()),  # description: never set
            pa.array(price_cents),
            pa.array(rating),
            pa.array(np.full(n, "Amazon", dtype=object), type=pa.string()),
            pa.array(doc_ids, type=pa.string()),
            pa.array(reviews_per_doc, type=pa.list_(REVIEW_TYPE)),
            pa.array(details_per_doc, type=pa.list_(DETAIL_TYPE)),
            pa.array(images_per_doc, type=pa.list_(pa.string())),
            pa.array(empty, type=pa.string()),  # no meta callbacks
            pa.array(empty, type=pa.string()),
            pa.array(captcha_docs),
        ],
        schema=ITEMS_SCHEMA,
    )


def extract_links(batch: pa.Table) -> pa.Table:
    """Docs → candidate link rows (flat-map M5 + absolutization M4).

    Captcha pages emit nothing (they contain no product DOM; the
    reference saves them to the captcha sink and extracts no item —
    amazon.go:290-318). One output row per ``link`` span.
    """
    if batch.num_rows == 0:
        return CANDIDATES_SCHEMA.empty_table()
    flat, doc_idx = _flatten_spans(batch)
    kind = flat.field("kind").to_pandas().to_numpy()
    l_np = kind == "link"
    if not l_np.any():
        return CANDIDATES_SCHEMA.empty_table()
    doc_ids = batch.column("doc_id").to_pandas().to_numpy()
    captcha_docs = np.bincount(doc_idx[kind == "captcha"], minlength=batch.num_rows) > 0
    l_np &= ~captcha_docs[doc_idx]
    hrefs = flat.field("media_ref").to_pandas().to_numpy()[l_np]
    anchors = flat.field("text").to_pandas().to_numpy()[l_np]
    srcs = doc_ids[doc_idx[l_np]]
    # vectorized absolutization (M4): pandas str kernels for the common
    # shapes, per-row urljoin only for odd references
    from ..functions.urls import absolutize_many

    urls = absolutize_many(srcs, hrefs)
    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(srcs, type=pa.string()),
            pa.array(anchors, type=pa.string()),
        ],
        schema=CANDIDATES_SCHEMA,
    )
