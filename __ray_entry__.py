"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (derived-web crawl → item parse)
on sf0.001; ``queries()`` exposes one callable per operator family from
SURVEY.md §2 plus the training-data ops; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (the rest get the
driver's rows-only check: minhash/simhash/fingerprint — which hash with
a process-stable but SQL-unavailable hash — IVF ANN, and the multimodal
decode stubs).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Regex literals shared with the Ray side (config.MIXUP — byte-copies of
# /root/reference/pkg/scraper/mixup.go:28-29, minus the (?m) flag DuckDB
# doesn't need).
_MIXUP_EX = r"https://www\.mixup\.com\.mx/[Mm]ixup/(([Hh]ome\.aspx)|((Categoria|Productos)\.aspx\?(etq\=))|(detproducto\.aspx\?sku=\d+)$)"
_MIXUP_PROD = r"(https://www\.mixup\.com\.mx/[Mm]ixup/)(detproducto\.aspx\?sku=\d{12,})$"
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_LANGS = ["de", "en", "es", "fr"]
_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "eine", "nicht", "mit"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
}


def entry() -> Any:
    """Flagship on sf0.001: derive an interleaved-span web from the
    documents table, crawl it with the full engine (cuckoo shards,
    politeness, fetcher pool), then run the items/enrichment pipeline
    over the fetched docs (parse + analyzer actor pool)."""
    from gocrawler_ray.pipelines.queries import q_crawl_flagship

    return q_crawl_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from gocrawler_ray.pipelines import queries as q

    return {
        "crawl_bfs": q.q_crawl_bfs,
        "crawl_depth_counts": q.q_crawl_depth_counts,
        "crawl_flagship": q.q_crawl_flagship,
        "url_classify": q.q_url_classify,
        "req_md5": q.q_req_md5,
        "price_cents": q.q_price_cents,
        "items_parse": q.q_items_parse,
        "q1_agg": q.q_q1_agg,
        "top_orders": q.q_top_orders,
        "cust_nation_orders": q.q_cust_nation_orders,
        "purchases_by_user": q.q_purchases_by_user,
        "events_hourly": q.q_events_hourly,
        "text_quality": q.q_text_quality,
        "token_counts": q.q_token_counts,
        "lang_guess": q.q_lang_guess,
        "exact_dedup": q.q_exact_dedup,
        "embedding_topk": q.q_embedding_topk,
        # rows-only (non-SQL-expressible: stable-hash sketches / ANN / stubs)
        "minhash_pairs": q.q_minhash_pairs,
        "simhash": q.q_simhash,
        "fingerprint": q.q_fingerprint,
        "ivf_topk": q.q_ivf_topk,
        "multimodal_decode": q.q_multimodal_decode,
    }


def _lang_score_sql(lang: str) -> str:
    alt = "|".join(_MARKERS[lang])
    return f"len(regexp_extract_all(lower(text), '\\b({alt})\\b'))"


def oracle_sql() -> dict[str, str]:
    s_de, s_en, s_es, s_fr = (_lang_score_sql(lg) for lg in ["de", "en", "es", "fr"])
    return {
        "crawl_bfs": """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst FROM documents, nn
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n FROM documents, nn
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n FROM documents, nn
),
r(node, depth) AS (
  SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0), (CAST(1 AS BIGINT), 0))
  UNION
  SELECT e.dst, r.depth + 1 FROM r JOIN edges e ON e.src = r.node WHERE r.depth < 20
)
SELECT node AS doc_id, CAST(MIN(depth) AS INTEGER) AS depth
FROM r GROUP BY node ORDER BY doc_id
""",
        "crawl_depth_counts": """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst FROM documents, nn
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n FROM documents, nn
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n FROM documents, nn
),
r(node, depth) AS (
  SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0), (CAST(1 AS BIGINT), 0))
  UNION
  SELECT e.dst, r.depth + 1 FROM r JOIN edges e ON e.src = r.node WHERE r.depth < 20
),
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node)
SELECT CAST(depth AS INTEGER) AS depth, count(*) AS n_pages
FROM mindepth GROUP BY depth ORDER BY depth
""",
        "url_classify": f"""
WITH built AS (
  SELECT CASE doc_id % 3
    WHEN 0 THEN 'https://www.mixup.com.mx/Mixup/detproducto.aspx?sku=' || lpad(CAST(doc_id AS VARCHAR), 13, '0')
    WHEN 1 THEN 'https://www.mixup.com.mx/Mixup/Categoria.aspx?etq=c' || doc_id
    ELSE 'https://www.evil.com/page' || doc_id END AS url
  FROM documents)
SELECT url,
       regexp_replace(url, '^[a-z]+://([^/]*).*$', '\\1') AS host,
       CAST(CASE WHEN regexp_matches(url, '{_MIXUP_PROD}') THEN 0 ELSE 1 END AS INTEGER) AS priority
FROM built
WHERE regexp_replace(url, '^[a-z]+://([^/]*).*$', '\\1')
      IN ('www.mixup.com.mx', 'mixup.com.mx')
  AND regexp_matches(url, '{_MIXUP_EX}')
""",
        "req_md5": "SELECT doc_id, md5(text) AS req_id FROM documents",
        "price_cents": """
SELECT l_orderkey, l_linenumber,
       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM lineitem
""",
        "items_parse": """
SELECT doc_id,
       md5('Documento ' || doc_id || '/Synth') AS id,
       'Documento ' || doc_id AS name,
       'Marca ' || source AS brand,
       text AS description,
       CAST(n_chars * 100 AS BIGINT) AS price_cents
FROM documents
""",
        "q1_agg": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "top_orders": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
        "cust_nation_orders": """
SELECT c_nationkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
""",
        "purchases_by_user": """
SELECT user_id, count(*) AS n, round(sum(value), 6) AS total
FROM events WHERE event_type = 'purchase' GROUP BY user_id
""",
        "events_hourly": """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour, event_type,
       count(*) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
""",
        "text_quality": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_q,
       CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_words,
       CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct,
       CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
       CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
       (len(regexp_extract_all(text, '\\w+')) >= 5
        AND length(text) >= 20
        AND len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / greatest(length(text), 1) < 0.3
        AND len(regexp_extract_all(text, '[0-9]')) * 1.0 / greatest(length(text), 1) < 0.3
       ) AS quality_keep
FROM documents
""",
        "token_counts": f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_ISH}')) AS BIGINT) AS bpe_tokens
FROM documents
""",
        "lang_guess": f"""
WITH s AS (
  SELECT doc_id,
         {s_de} AS s_de, {s_en} AS s_en, {s_es} AS s_es, {s_fr} AS s_fr
  FROM documents)
SELECT doc_id,
  CASE
    WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
    WHEN s_es >= s_fr THEN 'es'
    ELSE 'fr' END AS lang_guess
FROM s
""",
        "exact_dedup": """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20)
SELECT min(doc_id) AS doc_id FROM aug GROUP BY md5(text)
""",
        "embedding_topk": """
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT CAST(0 AS BIGINT) AS query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) AS cos
  FROM embeddings e, q)
SELECT query_id, vec_id, cos FROM scored
ORDER BY cos DESC, vec_id LIMIT 10
""",
    }
