"""Derive a crawlable interleaved-document web from the testdata
``documents`` table — deterministically, so a DuckDB recursive-CTE oracle
can reproduce the reachability/BFS-depth result row for row.

Mapping (pure functions of ``doc_id`` and the row's columns):

- url(i)  = ``https://www.synthd{i%3}.mx/shop/detproducto.aspx?sku={10^12+i}``
  (matches the synth shop grammar, config.synth_profile);
- spans(i): name/brand/detail/price spans built from the row's
  text/source/lang/n_chars, one review span (author/stars/title/content
  all pure functions of doc_id+source — so the analyzer's md5-bucket
  sentiment is SQL-reproducible for the flagship oracle), plus three
  out-links to documents ``(7i+1)%N, (13i+2)%N, (29i+5)%N`` — a fixed
  expander-ish digraph;
- captcha walls: documents with ``doc_id % 37 == 3`` are blocked pages
  (single captcha span, amazon.go:290-295): no item, no out-links —
  they land in the quarantine sink and are pruned from the BFS edge set
  (the oracle CTE excludes their edges);
- seeds: documents 0 and 1.

The DuckDB oracle for the BFS is in __ray_entry__.oracle_sql()["crawl_bfs"].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ShopProfile, synth_profile
from ..corpus import HOSTS_SCHEMA, REVIEW_SEP, SEEDS_SCHEMA, SPAN_TYPE, CORPUS_SCHEMA

HOSTS = ("www.synthd0.mx", "www.synthd1.mx", "www.synthd2.mx")
EDGE_MULS = ((7, 1), (13, 2), (29, 5))
AMAZON_HOST = "www.amazon.com.mx"


def derived_profile() -> ShopProfile:
    return synth_profile(HOSTS)


def url_of(i: int) -> str:
    return f"https://{HOSTS[i % 3]}/shop/detproducto.aspx?sku={10**12 + i}"


def edges_of(i: int, n: int) -> list[int]:
    return [(a * i + b) % n for a, b in EDGE_MULS]


def derive_corpus(documents: pa.Table) -> dict[str, pa.Table]:
    """documents(doc_id,text,lang,source,n_chars) → corpus/hosts/seeds."""
    n = documents.num_rows
    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    langs = documents.column("lang").to_pylist()
    sources = documents.column("source").to_pylist()
    n_chars = documents.column("n_chars").to_pylist()

    urls, spans_col = [], []
    for i, (d, t, lg, src, nc) in enumerate(
        zip(doc_ids, texts, langs, sources, n_chars)
    ):
        d = int(d)
        if d % 37 == 3:  # captcha wall: blocked page, nothing else on it
            urls.append(url_of(d))
            spans_col.append(
                [{"kind": "captcha", "text": f"Type the characters {d}",
                  "media_ref": "", "offset": 0}]
            )
            continue
        review = REVIEW_SEP.join(
            [
                f"user{d}",
                f"{(d % 5) + 1} stars",
                f"Opinion {d}",
                f"Muy bueno {d}" if d % 3 == 0 else f"{src} review {d}",
                # review-date text, read-and-discarded (amazon.go:255)
                f"Reseñado el {d % 28 + 1} de enero de 2021",
            ]
        )
        spans = [
            {"kind": "text", "text": f"Documento {d}", "media_ref": "", "offset": 0},
            {"kind": "text", "text": f"Marca {src}", "media_ref": "", "offset": 1},
            {"kind": "detail", "text": f"Lang: {lg}", "media_ref": "", "offset": 2},
            {"kind": "price", "text": f"Precio: ${int(nc)}.00", "media_ref": "", "offset": 3},
            {"kind": "text", "text": t, "media_ref": "", "offset": 4},
            {"kind": "review", "text": review, "media_ref": "", "offset": 5},
            # meta tags (M6) — parse stores them SWAPPED (mixup.go:72-73)
            {"kind": "meta", "text": f"Keywords: kw{d} {lg}", "media_ref": "", "offset": 6},
            {"kind": "meta", "text": f"Description: Pagina de Documento {d}", "media_ref": "", "offset": 7},
            {"kind": "media", "text": "og:image", "media_ref": f"https://cdn.synthd.mx/img{d}.jpg", "offset": 8},
        ]
        off = 9
        for dst in edges_of(d, n):
            spans.append(
                {"kind": "link", "text": f"l{dst}", "media_ref": url_of(dst), "offset": off}
            )
            off += 1
        urls.append(url_of(d))
        spans_col.append(spans)

    corpus = pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(spans_col, pa.list_(SPAN_TYPE))],
        schema=CORPUS_SCHEMA,
    )
    hosts = pa.Table.from_pydict(
        {
            "host": list(HOSTS),
            "allowed": [True] * 3,
            "robots_disallow": [[] for _ in range(3)],
            "crawl_delay_ms": [100, 200, 300],
            "max_parallel": [4, 4, 4],
            "fetch_latency_ms": [50, 60, 70],
        },
        schema=HOSTS_SCHEMA,
    )
    seeds = pa.Table.from_pydict(
        {"url": [url_of(0), url_of(1)], "priority": [1, 1], "seq": [0, 1]},
        schema=SEEDS_SCHEMA,
    )
    return {"corpus": corpus, "hosts": hosts, "seeds": seeds}


# ---------------------------------------------------------------------------
# amazon-shaped derivation (M9/M10 end-to-end with the AMAZON profile)
# ---------------------------------------------------------------------------

def amazon_url_of(i: int) -> str:
    """dp/<ASIN> product url matching the reference AMAZON regexes
    (config.AMAZON, byte-copies of amazon.go:45-64)."""
    return f"https://{AMAZON_HOST}/prod-{i}/dp/B{str(i).zfill(9)}/ref=sr_{i}"


def derive_amazon_corpus(documents: pa.Table) -> dict[str, pa.Table]:
    """Amazon-shaped web over the same expander digraph (same EDGE_MULS
    and captcha rule as :func:`derive_corpus`, so the BFS oracle CTE is
    shared). Spans are selector-addressed (name/brand/stars/price/
    detail_row/bullet_row/review) rather than positional — the amazon
    DOM-callback shape (amazon.go:119-288)."""
    from ..corpus import REVIEW_SEP

    n = documents.num_rows
    doc_ids = documents.column("doc_id").to_pylist()
    sources = documents.column("source").to_pylist()
    n_chars = documents.column("n_chars").to_pylist()

    urls, spans_col = [], []
    for d, src, nc in zip(doc_ids, sources, n_chars):
        d = int(d)
        urls.append(amazon_url_of(d))
        if d % 37 == 3:  # captcha wall, same rule as the synth derivation
            spans_col.append(
                [{"kind": "captcha", "text": f"Type the characters {d}",
                  "media_ref": "", "offset": 0}]
            )
            continue
        spans = [
            {"kind": "name", "text": f"Producto Amazon {d}\n", "media_ref": "", "offset": 0},
            {"kind": "brand", "text": f"Marca{d}\n", "media_ref": "", "offset": 1},
            {"kind": "stars", "text": f"{(d % 50) / 10:.1f} de 5 estrellas", "media_ref": "", "offset": 2},
            {"kind": "price", "text": f"${int(nc)}.50", "media_ref": "", "offset": 3},
            {"kind": "detail_row", "text": f"Fabricante{REVIEW_SEP}Marca{d}", "media_ref": "", "offset": 4},
            {"kind": "bullet_row", "text": f"ASIN{REVIEW_SEP} B{str(d).zfill(9)} ", "media_ref": "", "offset": 5},
            {"kind": "review",
             "text": REVIEW_SEP.join(
                 [f"cliente{d}", f"{(d % 5) + 1}.0 de 5 estrellas",
                  f"Titulo {d}", f"Contenido {src} {d}",
                  f"Reseñado en México el {d % 28 + 1} de enero de 2021"]
             ),
             "media_ref": "", "offset": 6},
        ]
        off = 7
        for dst in edges_of(d, n):
            spans.append(
                {"kind": "link", "text": f"l{dst}", "media_ref": amazon_url_of(dst), "offset": off}
            )
            off += 1
        spans_col.append(spans)

    corpus = pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(spans_col, pa.list_(SPAN_TYPE))],
        schema=CORPUS_SCHEMA,
    )
    hosts = pa.Table.from_pydict(
        {
            "host": [AMAZON_HOST],
            "allowed": [True],
            "robots_disallow": [[]],
            "crawl_delay_ms": [150],
            "max_parallel": [4],
            "fetch_latency_ms": [80],
        },
        schema=HOSTS_SCHEMA,
    )
    seeds = pa.Table.from_pydict(
        {"url": [amazon_url_of(0), amazon_url_of(1)], "priority": [1, 1], "seq": [0, 1]},
        schema=SEEDS_SCHEMA,
    )
    return {"corpus": corpus, "hosts": hosts, "seeds": seeds}
