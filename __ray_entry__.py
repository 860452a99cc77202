"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (derived-web crawl → item parse)
on sf0.001; ``queries()`` exposes one callable per operator family from
SURVEY.md §2 plus the training-data ops; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for EVERY query: the sketch ops (simhash /
fingerprint) hash tokens with md5-derived uint64s DuckDB reproduces,
minhash_pairs is checked against the full exact-pairwise-Jaccard set,
ivf_topk against exact brute force (the probed partitions cover the
true top-k at this scale), multimodal against the hash-derived fake
decode, and the flagship against reachability × parse × sentiment SQL.

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
        "captcha_quarantine": q.q_captcha_quarantine,
        "amazon_flagship": q.q_amazon_flagship,
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
        "corpus_prep": q.q_corpus_prep,
        "split_sample": q.q_split_sample,
        "embedding_topk": q.q_embedding_topk,
        "minhash_pairs": q.q_minhash_pairs,
        "simhash": q.q_simhash,
        "simhash_pairs": q.q_simhash_pairs,
        "edit_distance_pairs": q.q_edit_distance_pairs,
        "pareto_parts": q.q_pareto_parts,
        "canonical_docs": q.q_canonical_docs,
        "interval_coverage": q.q_interval_coverage,
        "fingerprint": q.q_fingerprint,
        "ivf_topk": q.q_ivf_topk,
        "embedding_near_dup": q.q_embedding_near_dup,
        "sessionize": q.q_sessionize,
        "asof_join": q.q_asof_join,
        "hopping_window": q.q_hopping_window,
        "interval_join": q.q_interval_join,
        "multimodal_decode": q.q_multimodal_decode,
        "group_topk": q.q_group_topk,
        "distinct_users": q.q_distinct_users,
        "doc_frequency": q.q_doc_frequency,
        "hll_distinct": q.q_hll_distinct,
        "group_quantiles": q.q_group_quantiles,
        "tfidf_topk": q.q_tfidf_topk,
        "multimodal_frames": q.q_multimodal_frames,
        "connected_components": q.q_connected_components,
        "order_lineitem_join": q.q_order_lineitem_join,
        "customer_no_orders": q.q_customer_no_orders,
        "events_rollup": q.q_events_rollup,
        "pagerank_paths": q.q_pagerank_paths,
        "link_degrees": q.q_link_degrees,
        "url_normalize": q.q_url_normalize,
        "audio_chunks": q.q_audio_chunks,
        "user_running_total": q.q_user_running_total,
        "event_deltas": q.q_event_deltas,
        "stratified_sample": q.q_stratified_sample,
        "sample_k": q.q_sample_k,
        "urgent_lineitems": q.q_urgent_lineitems,
        "heavy_hitters": q.q_heavy_hitters,
        "user_top_event": q.q_user_top_event,
        "pack_sequences": q.q_pack_sequences,
        "event_pivot": q.q_event_pivot,
        "value_scaled": q.q_value_scaled,
        "events_cube": q.q_events_cube,
        "value_share": q.q_value_share,
        "incremental_ingest": q.q_incremental_ingest,
        "value_ranks": q.q_value_ranks,
        "value_hist": q.q_value_hist,
        "user_paths": q.q_user_paths,
        "funnel_users": q.q_funnel_users,
        "importance_sample": q.q_importance_sample,
        "hourly_distinct_hll": q.q_hourly_distinct_hll,
        "props_k_stats": q.q_props_k_stats,
        "clickers_buyers": q.q_clickers_buyers,
        "viewers_no_purchase": q.q_viewers_no_purchase,
        "moving_avg": q.q_moving_avg,
        "first_last_events": q.q_first_last_events,
        "local_supplier_revenue": q.q_local_supplier_revenue,
        "promo_revenue": q.q_promo_revenue,
        "events_profile": q.q_events_profile,
        "class_balanced_sample": q.q_class_balanced_sample,
        "ngram_jaccard_pairs": q.q_ngram_jaccard_pairs,
        "order_priority_counts": q.q_order_priority_counts,
        "customer_distribution": q.q_customer_distribution,
        "large_orders": q.q_large_orders,
        "rich_dormant_customers": q.q_rich_dormant_customers,
        "events_unpivot": q.q_events_unpivot,
        "dup_cluster_sizes": q.q_dup_cluster_sizes,
        "top_bigrams": q.q_top_bigrams,
        "daily_new_users": q.q_daily_new_users,
        "grouped_corr": q.q_grouped_corr,
        "retention_cohorts": q.q_retention_cohorts,
        "winsorized_stats": q.q_winsorized_stats,
        "rolling_active_users": q.q_rolling_active_users,
        "lsh_topk": q.q_lsh_topk,
        "decontaminate": q.q_decontaminate,
        "unigram_logprob": q.q_unigram_logprob,
        "forecast_revenue": q.q_forecast_revenue,
        "small_qty_parts": q.q_small_qty_parts,
        "shipping_priority": q.q_shipping_priority,
        "label_centroids": q.q_label_centroids,
        "repeated_ngrams": q.q_repeated_ngrams,
        "nation_trade_flows": q.q_nation_trade_flows,
        "returned_top_customers": q.q_returned_top_customers,
        "top_supplier_revenue": q.q_top_supplier_revenue,
        "disjunctive_revenue": q.q_disjunctive_revenue,
        "supplier_part_variety": q.q_supplier_part_variety,
        "kmeans_assign": q.q_kmeans_assign,
        "source_vocab": q.q_source_vocab,
        "triangle_count": q.q_triangle_count,
        "corpus_mix": q.q_corpus_mix,
        "market_share": q.q_market_share,
        "product_profit": q.q_product_profit,
        "important_parts": q.q_important_parts,
        "waiting_orders": q.q_waiting_orders,
        "cheapest_supplier": q.q_cheapest_supplier,
        "priority_linecounts": q.q_priority_linecounts,
        "dominant_supplier_counts": q.q_dominant_supplier_counts,
        "value_zscore": q.q_value_zscore,
        "bigram_lift": q.q_bigram_lift,
        "value_mad": q.q_value_mad,
        "event_type_pairs": q.q_event_type_pairs,
        "daily_value_change": q.q_daily_value_change,
        "kmeans_1d": q.q_kmeans_1d,
        "corpus_shards": q.q_corpus_shards,
        "user_drawdown": q.q_user_drawdown,
        "key_skew": q.q_key_skew,
        "latest_events": q.q_latest_events,
        "source_diversity": q.q_source_diversity,
        "click_to_purchase": q.q_click_to_purchase,
        "revenue_gini": q.q_revenue_gini,
        "range_moving_sum": q.q_range_moving_sum,
        "missing_days": q.q_missing_days,
        "training_manifest": q.q_training_manifest,
        "customer_revenue_pctile": q.q_customer_revenue_pctile,
        "user_ema": q.q_user_ema,
        "value_outliers": q.q_value_outliers,
        "peak_in_transit": q.q_peak_in_transit,
        "mutual_best_match": q.q_mutual_best_match,
        "hits_scores": q.q_hits_scores,
        "kcore": q.q_kcore,
        "late_events": q.q_late_events,
        "pii_scrub": q.q_pii_scrub,
        "chunk_windows": q.q_chunk_windows,
        "jsonl_roundtrip": q.q_jsonl_roundtrip,
        "csv_roundtrip": q.q_csv_roundtrip,
        "quantized_topk": q.q_quantized_topk,
        "rp_buckets": q.q_rp_buckets,
        "bm25_topk": q.q_bm25_topk,
        "span_kind_stats": q.q_span_kind_stats,
        "value_percentiles": q.q_value_percentiles,
        "epoch_order": q.q_epoch_order,
        "posting_lists": q.q_posting_lists,
        "rerank_topk": q.q_rerank_topk,
        "event_throttle": q.q_event_throttle,
        "user_twap": q.q_user_twap,
        "type_affinity": q.q_type_affinity,
        "regr_by_type": q.q_regr_by_type,
        "basket_pairs": q.q_basket_pairs,
        "user_streaks": q.q_user_streaks,
        "benford_cents": q.q_benford_cents,
        "ship_lag": q.q_ship_lag,
        "event_transitions": q.q_event_transitions,
        "order_intervals": q.q_order_intervals,
        "revenue_rollup": q.q_revenue_rollup,
        "fk_orphans": q.q_fk_orphans,
        "zipf_slope": q.q_zipf_slope,
        "value_anova": q.q_value_anova,
        "supplier_ontime": q.q_supplier_ontime,
        "stickiness": q.q_stickiness,
        "graph_reciprocity": q.q_graph_reciprocity,
        "basket_sizes": q.q_basket_sizes,
        "rfm_segments": q.q_rfm_segments,
        "knn_accuracy": q.q_knn_accuracy,
        "customer_360": q.q_customer_360,
        "host_depth_profile": q.q_host_depth_profile,
        "captcha_rate_by_host": q.q_captcha_rate_by_host,
        "lang_source_matrix": q.q_lang_source_matrix,
        "brand_share": q.q_brand_share,
        "split_leakage": q.q_split_leakage,
        "time_to_purchase": q.q_time_to_purchase,
        "monthly_churn": q.q_monthly_churn,
        "repurchase_rate": q.q_repurchase_rate,
        "pareto_revenue": q.q_pareto_revenue,
        "weighted_sample": q.q_weighted_sample,
        "decayed_counts": q.q_decayed_counts,
        "value_moments": q.q_value_moments,
        "hour_entropy": q.q_hour_entropy,
        "chi2_type_dow": q.q_chi2_type_dow,
        "theil_sen_trend": q.q_theil_sen_trend,
        "gini_by_nation": q.q_gini_by_nation,
        "degree_assortativity": q.q_degree_assortativity,
        "cusum_drift": q.q_cusum_drift,
        "daily_autocorr": q.q_daily_autocorr,
        "local_clustering": q.q_local_clustering,
        "poisson_bootstrap": q.q_poisson_bootstrap,
        "ks_test": q.q_ks_test,
        "source_kl": q.q_source_kl,
        "vocab_coverage": q.q_vocab_coverage,
        "km_reorder": q.q_km_reorder,
        "scd2_user_tier": q.q_scd2_user_tier,
        "pagerank_damped": q.q_pagerank_damped,
        "item_cf": q.q_item_cf,
        "ltv_cohorts": q.q_ltv_cohorts,
        "embedding_dim_stats": q.q_embedding_dim_stats,
        "gopher_filter": q.q_gopher_filter,
        "token_fertility": q.q_token_fertility,
        "rolling_median_revenue": q.q_rolling_median_revenue,
        "host_link_locality": q.q_host_link_locality,
        "cdc_dedup": q.q_cdc_dedup,
        "day_jaccard": q.q_day_jaccard,
        "slot_apportionment": q.q_slot_apportionment,
        "ivm_daily_counts": q.q_ivm_daily_counts,
        "qn_scale": q.q_qn_scale,
        "markov2_transitions": q.q_markov2_transitions,
        "spearman_value_k": q.q_spearman_value_k,
        "lag_xcorr": q.q_lag_xcorr,
        "common_neighbors": q.q_common_neighbors,
        "mann_whitney": q.q_mann_whitney,
        "mutual_info": q.q_mutual_info,
        "weighted_median": q.q_weighted_median,
        "cross_dedup": q.q_cross_dedup,
        "bfs_distances": q.q_bfs_distances,
        "adamic_adar": q.q_adamic_adar,
        "burstiness": q.q_burstiness,
        "welch_ttest": q.q_welch_ttest,
        "graph_diameter": q.q_graph_diameter,
        "cuped_uplift": q.q_cuped_uplift,
        "geo_knn": q.q_geo_knn,
        "kmv_distinct": q.q_kmv_distinct,
        "lexical_richness": q.q_lexical_richness,
        "open_orders_daily": q.q_open_orders_daily,
        "kruskal_wallis": q.q_kruskal_wallis,
        "kendall_tau": q.q_kendall_tau,
        "eps_segments": q.q_eps_segments,
        "ols2_hour_dow": q.q_ols2_hour_dow,
        "theil_index": q.q_theil_index,
        "harmonic_centrality": q.q_harmonic_centrality,
        "type_hour_cosine": q.q_type_hour_cosine,
        "type_user_jaccard": q.q_type_user_jaccard,
        "dow_seasonality": q.q_dow_seasonality,
        "decile_lift": q.q_decile_lift,
        "supplier_hhi": q.q_supplier_hhi,
        "last_touch_attribution": q.q_last_touch_attribution,
        "knn_degree_spectrum": q.q_knn_degree_spectrum,
        "brand_type_cramer": q.q_brand_type_cramer,
        "trigram_entropy": q.q_trigram_entropy,
        "value_tail_probs": q.q_value_tail_probs,
        "psi_drift": q.q_psi_drift,
        "returnflag_priority_lift": q.q_returnflag_priority_lift,
        "ipc_roundtrip": q.q_ipc_roundtrip,
        "peak_hour_share": q.q_peak_hour_share,
        "new_vs_returning": q.q_new_vs_returning,
        "crawl_fairness": q.q_crawl_fairness,
        "scc_stats": q.q_scc_stats,
        "type_hour_ruzicka": q.q_type_hour_ruzicka,
        "orphan_pages": q.q_orphan_pages,
        "chars_tokens_corr": q.q_chars_tokens_corr,
        "gap_fill_ffill": q.q_gap_fill_ffill,
        "langid_kappa": q.q_langid_kappa,
        "backlog_aging": q.q_backlog_aging,
        "bowtie_decomposition": q.q_bowtie_decomposition,
        "trimmed_mean": q.q_trimmed_mean,
        "fill_time_percentiles": q.q_fill_time_percentiles,
        "wave_branching": q.q_wave_branching,
        "personalized_pagerank": q.q_personalized_pagerank,
        "never_ordered_parts": q.q_never_ordered_parts,
        "linear_attribution": q.q_linear_attribution,
        "token_pmi": q.q_token_pmi,
        "bot_repetition": q.q_bot_repetition,
        "bucket_label_purity": q.q_bucket_label_purity,
        "dow_adjusted_anomalies": q.q_dow_adjusted_anomalies,
        "customer_features": q.q_customer_features,
        "log2_hist": q.q_log2_hist,
        "nation_share_of_region": q.q_nation_share_of_region,
        "qq_click_purchase": q.q_qq_click_purchase,
        "host_link_matrix": q.q_host_link_matrix,
        "power_users": q.q_power_users,
        "dup_rate_by_source": q.q_dup_rate_by_source,
        "logprob_buckets": q.q_logprob_buckets,
        "containment_pairs": q.q_containment_pairs,
        "frontier_dedup_rate": q.q_frontier_dedup_rate,
        "seasonality_strength": q.q_seasonality_strength,
        "centroid_distances": q.q_centroid_distances,
        "brand_premium": q.q_brand_premium,
        "quantization_recall": q.q_quantization_recall,
        "naive_forecast_mae": q.q_naive_forecast_mae,
        "host_wave_share": q.q_host_wave_share,
        "source_dup_mass": q.q_source_dup_mass,
        "timed_funnel": q.q_timed_funnel,
        "click_value_uplift": q.q_click_value_uplift,
        "partition_pruned_read": q.q_partition_pruned_read,
        "resume_skip_audit": q.q_resume_skip_audit,
        "span_offset_profile": q.q_span_offset_profile,
        "gate_bias_matrix": q.q_gate_bias_matrix,
        "lang_confusion_matrix": q.q_lang_confusion_matrix,
        "captcha_rate_by_wave": q.q_captcha_rate_by_wave,
        "link_wave_locality": q.q_link_wave_locality,
        "usable_tokens_by_source": q.q_usable_tokens_by_source,
        "cluster_separation": q.q_cluster_separation,
        "brand_return_rate": q.q_brand_return_rate,
        "repeat_customer_share": q.q_repeat_customer_share,
        "single_source_parts": q.q_single_source_parts,
        "hour_dow_heatmap": q.q_hour_dow_heatmap,
        "order_month_profile": q.q_order_month_profile,
        "segment_priority_mix": q.q_segment_priority_mix,
        "round_value_bias": q.q_round_value_bias,
        "discount_uplift_curve": q.q_discount_uplift_curve,
        "gate_length_bias": q.q_gate_length_bias,
        "most_duplicated_docs": q.q_most_duplicated_docs,
        "transition_lift": q.q_transition_lift,
        "session_conversion": q.q_session_conversion,
        "user_lifespan_hist": q.q_user_lifespan_hist,
        "dup_pair_source_split": q.q_dup_pair_source_split,
        "dup_purchase_audit": q.q_dup_purchase_audit,
        "linenumber_contiguity": q.q_linenumber_contiguity,
        "compaction_plan": q.q_compaction_plan,
        "politeness_schedule_audit": q.q_politeness_schedule_audit,
        "crawl_order_audit": q.q_crawl_order_audit,
        "crawl_manifest_audit": q.q_crawl_manifest_audit,
        "seen_shard_audit": q.q_seen_shard_audit,
        "lineage_audit": q.q_lineage_audit,
        "quarantine_audit": q.q_quarantine_audit,
        "order_total_consistency": q.q_order_total_consistency,
        "rich_club": q.q_rich_club,
        "markov_entropy": q.q_markov_entropy,
        "media_decode_batches": q.q_media_decode_batches,
        "neyman_allocation": q.q_neyman_allocation,
        "purchase_growth": q.q_purchase_growth,
        "activity_spikes": q.q_activity_spikes,
        "lead_words": q.q_lead_words,
        "same_day_orders": q.q_same_day_orders,
        "value_sorted_head": q.q_value_sorted_head,
        "native_group_aggs": q.q_native_group_aggs,
        "native_unique": q.q_native_unique,
        "containment_dedup": q.q_containment_dedup,
        "shingle_df_profile": q.q_shingle_df_profile,
        "vocab_growth": q.q_vocab_growth,
        "span_ref_integrity": q.q_span_ref_integrity,
        "wave_bytes": q.q_wave_bytes,
        "crawl_critical_path": q.q_crawl_critical_path,
        "refetch_tiers": q.q_refetch_tiers,
        "top_discoverers": q.q_top_discoverers,
        "seed_coverage": q.q_seed_coverage,
        "canonical_collisions": q.q_canonical_collisions,
        "order_status_mix": q.q_order_status_mix,
        "doc_length_quantiles": q.q_doc_length_quantiles,
        "supplier_balance_profile": q.q_supplier_balance_profile,
        "entry_event_mix": q.q_entry_event_mix,
        "exit_event_mix": q.q_exit_event_mix,
        "value_by_entry_type": q.q_value_by_entry_type,
        "quantity_hist": q.q_quantity_hist,
        "external_sort_ranks": q.q_external_sort_ranks,
        "external_sort_manifest": q.q_external_sort_manifest,
        "external_sort_order_sum": q.q_external_sort_order_sum,
        "sort_merge_revenue": q.q_sort_merge_revenue,
    }


def _lang_score_sql(lang: str) -> str:
    alt = "|".join(_MARKERS[lang])
    return f"len(regexp_extract_all(lower(text), '\\b({alt})\\b'))"


# captcha walls (doc_id % 37 == 3) are fetched+admitted but emit no links
# — their edges are pruned from the BFS edge set
_BFS_CTE = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n FROM documents, nn WHERE doc_id % 37 != 3
),
r(node, depth) AS (
  SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0), (CAST(1 AS BIGINT), 0))
  UNION
  SELECT e.dst, r.depth + 1 FROM r JOIN edges e ON e.src = r.node WHERE r.depth < 20
)"""

# exact pairwise word-3-gram Jaccard ground truth over the augmented
# near-dup corpus — gates BOTH near-dup ops (minhash_pairs at r=2 bands
# and simhash_pairs at exhaustive-recall band width)
_PAIRS_SQL = """
WITH aug AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 20000 AS VARCHAR), text || ' extra tail token appended'
  FROM documents WHERE doc_id < 10),
words AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws FROM aug),
grams AS (SELECT doc_id,
  CASE WHEN len(ws) <= 3 THEN [array_to_string(ws, ' ')]
       ELSE list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
  END AS gs FROM words),
gsets AS (SELECT doc_id, list_distinct(gs) AS gs FROM grams),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
  len(list_intersect(a.gs, b.gs)) * 1.0 / len(list_distinct(a.gs || b.gs)) AS j
  FROM gsets a JOIN gsets b ON a.doc_id < b.doc_id)
SELECT a, b FROM pairs WHERE j >= 0.6
"""

# derived-web edge set alone (no BFS recursion) — shared by the
# link-graph analytics oracles (pagerank_paths, link_degrees)
_EDGES_CTE = """
WITH nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n FROM documents, nn WHERE doc_id % 37 != 3
)"""

# analyzer stub sentiment: md5(content) first byte mod 4 (stages/analyzer.py)
_R_CONTENT = (
    "CASE WHEN d.doc_id % 3 = 0 THEN 'Muy bueno ' || d.doc_id "
    "ELSE d.source || ' review ' || d.doc_id END"
)


def oracle_sql() -> dict[str, str]:
    s_de, s_en, s_es, s_fr = (_lang_score_sql(lg) for lg in ["de", "en", "es", "fr"])
    # exact uint64 bounds shared with stages/sampling.py — computed by
    # the same helpers so the kernel and the oracle cannot drift
    from gocrawler_ray.stages.sampling import sample_bound, split_thresholds

    _samp = sample_bound(0.2)
    (_, _b_train), (_, _b_val), _ = split_thresholds(
        {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    from gocrawler_ray.pipelines.queries import STRATIFIED_RATES

    _strat_arms = "\n       ".join(
        f"WHEN '{s}' THEN {sample_bound(r)}"
        for s, r in sorted(STRATIFIED_RATES.items())
    )
    out = {
        "crawl_bfs": _BFS_CTE + """
SELECT node AS doc_id, CAST(MIN(depth) AS INTEGER) AS depth
FROM r GROUP BY node ORDER BY doc_id
""",
        "crawl_depth_counts": _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node)
SELECT CAST(depth AS INTEGER) AS depth, count(*) AS n_pages
FROM mindepth GROUP BY depth ORDER BY depth
""",
        "crawl_flagship": _BFS_CTE + f""",
reach AS (SELECT DISTINCT node AS doc_id FROM r)
SELECT d.doc_id,
  md5('Documento ' || d.doc_id || '/Synth') AS id,
  'Documento ' || d.doc_id AS name,
  'Marca ' || d.source AS brand,
  d.text AS description,
  CAST(d.n_chars * 100 AS BIGINT) AS price_cents,
  'user' || d.doc_id AS r_author,
  CAST((d.doc_id % 5) + 1 AS DOUBLE) AS r_stars,
  '1 Jan 0001 00:00:00' AS r_date,
  'Opinion ' || d.doc_id AS r_title,
  {_R_CONTENT} AS r_content,
  ['POSITIVE','NEGATIVE','NEUTRAL','MIXED'][
    (CAST(('0x' || substr(md5({_R_CONTENT}), 1, 2)) AS INT) % 4) + 1
  ] AS sentiment,
  CAST(CASE WHEN d.doc_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_entities,
  'Pagina de Documento ' || d.doc_id AS meta_keywords,
  'kw' || d.doc_id || ' ' || d.lang AS meta_description,
  'https://cdn.synthd.mx/img' || d.doc_id || '.jpg' AS first_image
FROM documents d JOIN reach USING (doc_id)
WHERE d.doc_id % 37 != 3
""",
        "captcha_quarantine": _BFS_CTE + """
SELECT DISTINCT node AS doc_id,
       'Type the characters ' || node AS captcha_text
FROM r WHERE node % 37 = 3
""",
        # amazon profile (M9/M10): same expander reachability, amazon
        # column semantics (rating set, price nc+0.50, normalize_kv
        # details, analyzer sentiment over the review content)
        "amazon_flagship": _BFS_CTE + """,
reach AS (SELECT DISTINCT node AS doc_id FROM r)
SELECT d.doc_id,
  md5('Producto Amazon ' || d.doc_id || '/Amazon') AS id,
  'Producto Amazon ' || d.doc_id AS name,
  'Marca' || d.doc_id AS brand,
  CAST(d.doc_id % 50 AS DOUBLE) / 10 AS rating,
  CAST(d.n_chars * 100 + 50 AS BIGINT) AS price_cents,
  'Marca' || d.doc_id AS d_fabricante,
  'B' || lpad(CAST(d.doc_id AS VARCHAR), 9, '0') AS d_asin,
  'cliente' || d.doc_id AS r_author,
  CAST(d.doc_id % 5 + 1 AS DOUBLE) AS r_stars,
  '1 Jan 0001 00:00:00' AS r_date,
  ['POSITIVE','NEGATIVE','NEUTRAL','MIXED'][
    (CAST(('0x' || substr(md5('Contenido ' || d.source || ' ' || d.doc_id), 1, 2)) AS INT) % 4) + 1
  ] AS r_sentiment
FROM documents d JOIN reach USING (doc_id)
WHERE d.doc_id % 37 != 3
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
       CAST(n_chars * 100 AS BIGINT) AS price_cents,
       'Pagina de Documento ' || doc_id AS meta_keywords,
       'kw' || doc_id || ' ' || lang AS meta_description
FROM documents
WHERE doc_id % 37 != 3
""",
        "q1_agg": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                      * (100 - CAST(round(l_discount * 100) AS HUGEINT)))
                  AS DOUBLE) / 10000.0, 2) AS sum_rev,
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
       count(*) AS n,
       round(CAST(sum(CAST(round(value * 1000) AS HUGEINT)) AS DOUBLE)
             / 1000.0, 6) AS sum_value
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
        # composed prep chain: the stat/filter expressions are the same
        # fragments the individual text_quality / lang_guess /
        # token_counts oracles use, applied after the min-id dedup
        "corpus_prep": f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20),
keep AS (SELECT min(doc_id) AS doc_id FROM aug GROUP BY md5(text)),
ded AS (SELECT a.doc_id, a.text FROM aug a JOIN keep USING (doc_id)),
st AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '{_BPE_ISH}')) AS BIGINT) AS bpe_tokens,
         (len(regexp_extract_all(text, '\\w+')) >= 5
          AND length(text) >= 20
          AND len(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / greatest(length(text), 1) < 0.3
          AND len(regexp_extract_all(text, '[0-9]')) * 1.0 / greatest(length(text), 1) < 0.3
         ) AS quality_keep,
         {s_de} AS s_de, {s_en} AS s_en, {s_es} AS s_es, {s_fr} AS s_fr
  FROM ded)
SELECT doc_id,
  CASE
    WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
    WHEN s_es >= s_fr THEN 'es'
    ELSE 'fr' END AS lang_guess,
  n_words, ws_tokens, bpe_tokens
FROM st
WHERE quality_keep AND greatest(s_de, s_en, s_es, s_fr) > 0
""",
        "split_sample": f"""
WITH s AS (
  SELECT doc_id FROM documents
  WHERE CAST(('0x' || substr(md5('sample:7:' || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) < {_samp}
),
h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('split:7:' || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv
  FROM s)
SELECT doc_id,
  CASE WHEN hv < {_b_train} THEN 'train'
       WHEN hv < {_b_val} THEN 'val'
       ELSE 'test' END AS split
FROM h
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
        # IVF ANN over the augmented table (12 exact copies of vec 1):
        # the true top-10 all sit in the query's own cluster, so the
        # nprobe-pruned result equals exact brute force — the oracle.
        # pytest guards recall on the raw table separately.
        "ivf_topk": """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT 100000 + t.i AS vec_id, e.embedding
  FROM embeddings e, (SELECT unnest(range(12)) AS i) t WHERE e.vec_id = 1),
q AS (SELECT embedding FROM embeddings WHERE vec_id = 1),
scored AS (
  SELECT CAST(1 AS BIGINT) AS query_id, a.vec_id,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) AS cos
  FROM aug a, q)
SELECT query_id, vec_id, cos FROM scored
ORDER BY cos DESC, vec_id LIMIT 10
""",
        # full exact pairwise word-3-gram Jaccard — the LSH recall at the
        # corpus' minimum true similarity (≈0.76) is 1-1e-27, so the
        # engine's verified pair set equals this ground truth. The
        # simhash_pairs query runs the bit-band variant at
        # exhaustive-recall band width over the SAME construction, so the
        # identical ground truth gates it (see _PAIRS_SQL below).
        "minhash_pairs": _PAIRS_SQL,
        "simhash_pairs": _PAIRS_SQL,
        # full quadratic levenshtein join over title prefixes — the
        # engine's PassJoin candidate generation is exact-recall, so its
        # verified pair set equals this ground truth (stages/strings.py)
        "edit_distance_pairs": """
WITH titles AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, substr(text, 1, 32) AS title
  FROM documents
  UNION ALL
  SELECT CAST(doc_id + 30000 AS VARCHAR),
         substr(text, 1, 4) || '#' || substr(text, 6, 27)
  FROM documents WHERE doc_id < 15)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
FROM titles a JOIN titles b ON a.doc_id < b.doc_id
WHERE levenshtein(a.title, b.title) <= 2
ORDER BY a, b
""",
        # skyline dominance: keep a part iff NO part is >= on size,
        # <= on price, and strictly better on one of them
        "pareto_parts": """
WITH p AS (SELECT p_partkey, p_size,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
           FROM part)
SELECT p_partkey, p_size, price_cents FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
    AND (b.p_size > a.p_size OR b.price_cents < a.price_cents))
ORDER BY p_partkey
""",
        # gaps-and-islands interval union per user (each event opens an
        # interval of round(value*1000) * 0.1s; touching intervals merge)
        "interval_coverage": """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value * 1000) AS BIGINT) * 100000 AS e
  FROM events),
m AS (
  SELECT user_id, s, e,
         CASE WHEN s <= max(e) OVER (PARTITION BY user_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS first_of_island
  FROM iv),
g AS (
  SELECT user_id, s, e,
         sum(first_of_island) OVER (PARTITION BY user_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM m),
isl AS (SELECT user_id, grp, min(s) AS ss, max(e) AS ee
        FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(ee - ss) AS BIGINT) AS covered_us
FROM isl GROUP BY user_id ORDER BY user_id
""",
        # simhash: md5-derived uint64 token hash, per-bit ±1 sign sum
        "simhash": """
WITH words AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS w
               FROM documents),
h AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS hv FROM words),
bitsum AS (
  SELECT doc_id, b, SUM(CASE WHEN (hv >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) bb GROUP BY doc_id, b),
sh AS (SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS UBIGINT) << CAST(b AS INT)
                                    ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS simhash
       FROM bitsum GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(sh.simhash, 0) AS UBIGINT) AS simhash
FROM documents d LEFT JOIN sh USING (doc_id)
""",
        # winnowing fingerprint: min md5-derived hash over word-4-grams
        "fingerprint": """
WITH words AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws FROM documents),
grams AS (SELECT doc_id, CASE WHEN len(ws) = 0 THEN NULL
   WHEN len(ws) <= 4 THEN [array_to_string(ws, ' ')]
   ELSE list_transform(range(1, len(ws)-2), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3])
   END AS gs FROM words),
g2 AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE gs IS NOT NULL),
m AS (SELECT doc_id, MIN(CAST(('0x'||substr(md5(g),1,16)) AS UBIGINT)) AS fingerprint
      FROM g2 GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(m.fingerprint, 0) AS UBIGINT) AS fingerprint
FROM documents d LEFT JOIN m USING (doc_id)
""",
        # embedding near-dup over the augmented table: exact pairwise
        # cosine ≥ 0.99 (only the 13 identical copies pair — the corpus'
        # natural maximum is ≈0.51, so the LSH recall is deterministic)
        "embedding_near_dup": """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT 100000 + t.i AS vec_id, e.embedding
  FROM embeddings e, (SELECT unnest(range(12)) AS i) t WHERE e.vec_id = 1)
SELECT a.vec_id AS a, b.vec_id AS b
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.99
""",
        # gap-based session windows (6h): lag() break flags → cumulative
        # session ids → per-session aggregates; identity (user_id,
        # session_start), matching stages/temporal.py::sessionize
        "sessionize": """
WITH e AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 6 HOUR
                   OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid FROM e)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM s GROUP BY user_id, sid
""",
        # backward as-of join: latest order (by o_orderdate, max
        # o_orderkey on ties) at-or-before each event's ts, left join
        "asof_join": """
SELECT event_id, user_id, ts, o_orderkey, o_totalprice FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
""",
        # hopping 4h windows on hourly hops: each event lands in 4
        # windows (explode via range(4)); window_start µs-since-epoch,
        # matching stages/temporal.py::hopping_window_agg
        "hopping_window": """
WITH w AS (
  SELECT user_id, value,
         (epoch_us(ts) // 3600000000) * 3600000000
           - 3600000000 * t.i AS window_start
  FROM events, (SELECT unnest(range(4)) AS i) t)
SELECT user_id, window_start, COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM w GROUP BY user_id, window_start
""",
        # same-user event pairs within ±6h, self-pairs excluded,
        # matching stages/temporal.py::interval_join
        "interval_join": """
SELECT a.event_id, a.user_id, a.ts, b.event_id AS b_event_id
FROM events a JOIN events b
  ON b.user_id = a.user_id AND b.event_id != a.event_id
 AND b.ts BETWEEN a.ts - INTERVAL 6 HOUR AND a.ts + INTERVAL 6 HOUR
""",
        # hash-derived fake decode (stages/multimodal.py): dims/format from
        # md5 of the payload (= the text bytes), resize = half-up round
        "multimodal_decode": """
WITH h AS (SELECT CAST(doc_id AS VARCHAR) AS media_id, md5(text) AS hx FROM documents),
dec AS (SELECT media_id,
  64 + CAST(('0x'||substr(hx,3,4)) AS INT) % 1856 AS decoded_width,
  64 + CAST(('0x'||substr(hx,7,4)) AS INT) % 1016 AS decoded_height,
  ['jpeg','png','webp'][(CAST(('0x'||substr(hx,1,2)) AS INT) % 3) + 1] AS decoded_format
  FROM h)
SELECT media_id, decoded_width, decoded_height, decoded_format,
  CAST(floor(decoded_width * least(1.0, 512.0/greatest(decoded_width, decoded_height)) + 0.5) AS INT) AS resize_width,
  CAST(floor(decoded_height * least(1.0, 512.0/greatest(decoded_width, decoded_height)) + 0.5) AS INT) AS resize_height
FROM dec
""",
        "group_topk": """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders)
WHERE rank <= 3
""",
        "distinct_users": """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
""",
        "doc_frequency": """
WITH terms AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_extract_all(lower(text), '\\w+'))) AS term
  FROM documents),
dfreq AS (SELECT term, count(*) AS df FROM terms GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT term, df, round(ln((1.0 + n.n) / (1.0 + df)) + 1.0, 6) AS idf
FROM dfreq, n WHERE df >= 2
""",
        # same md5-derived uint64 hash as the kernel; rho from the exact
        # integer bit length (length(bin(w)) — no float log in SQL)
        "hll_distinct": """
WITH h AS (
  SELECT DISTINCT
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv
  FROM events),
parts AS (
  SELECT CAST(hv >> 54 AS INT) AS bucket,
         hv & ((CAST(1 AS UBIGINT) << 54) - 1) AS w
  FROM h)
SELECT bucket,
       CAST(MAX(54 - (CASE WHEN w = 0 THEN 0 ELSE length(bin(w)) END) + 1)
            AS INT) AS rho
FROM parts GROUP BY bucket
""",
        "group_quantiles": """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS q50,
       round(quantile_cont(value, 0.95), 6) AS q95
FROM events GROUP BY event_type
""",
        # idf is rounded to 6 BEFORE the tf product (that is what the
        # broadcast table carries), and rank orders by the rounded score
        # — both sides rank and emit the same quantity
        "tfidf_topk": """
WITH n AS (SELECT count(*) AS n FROM documents),
terms AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS c FROM terms GROUP BY doc_id, term),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.c * round(ln((1.0 + n.n) / (1.0 + dfreq.df)) + 1.0, 6), 6)
           AS score
  FROM tf JOIN dfreq USING (term), n),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 3
""",
        # synthetic video duration = 10 ms/char; 1 frame/s, ≤16 frames
        "multimodal_frames": """
WITH v AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id, length(text) * 10 AS dur
  FROM documents),
f AS (
  SELECT media_id, unnest(range(0, least(dur, 16000), 1000)) AS frame_ms
  FROM v WHERE dur > 0)
SELECT media_id, CAST(frame_ms // 1000 AS BIGINT) AS frame_no,
       CAST(frame_ms AS INT) AS frame_ms
FROM f
""",
        # min-label propagation fixpoint over the exact near-dup pair
        # set (same ground-truth edges as minhash_pairs); VARCHAR MIN is
        # lexicographic on BOTH sides, and the fixpoint is order-metric
        # independent anyway
        "connected_components": """
WITH RECURSIVE
aug AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 20000 AS VARCHAR), text || ' extra tail token appended'
  FROM documents WHERE doc_id < 10),
words AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws FROM aug),
grams AS (SELECT doc_id,
  CASE WHEN len(ws) <= 3 THEN [array_to_string(ws, ' ')]
       ELSE list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
  END AS gs FROM words),
gsets AS (SELECT doc_id, list_distinct(gs) AS gs FROM grams),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
  FROM gsets a JOIN gsets b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.gs, b.gs)) * 1.0
        / len(list_distinct(a.gs || b.gs)) >= 0.6),
ed AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
r(node, label) AS (
  SELECT node, node FROM (SELECT DISTINCT a AS node FROM ed)
  UNION
  SELECT ed.b, r.label FROM r JOIN ed ON ed.a = r.node
)
SELECT node, MIN(label) AS label FROM r GROUP BY node
""",
        # big-big hash shuffle join, bounded grouped agg on top
        "order_lineitem_join": """
SELECT o_orderpriority, l_returnflag, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, l_returnflag
""",
        "customer_no_orders": """
SELECT c_custkey, c_nationkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
        # every rollup level is derived from the ROUNDED base aggregate
        # (both sides), so subtotal hashes are summation-order stable
        "events_rollup": """
WITH base AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
         count(*) AS n, round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1, 2)
SELECT event_type, hour, n, sum_value FROM base
UNION ALL
SELECT event_type, CAST(-1 AS BIGINT), CAST(SUM(n) AS BIGINT),
       round(SUM(sum_value), 6)
FROM base GROUP BY event_type
UNION ALL
SELECT 'ALL', CAST(-1 AS BIGINT), CAST(SUM(n) AS BIGINT),
       round(SUM(sum_value), 6)
FROM base
""",
        # 3-step integer power iteration (PageRank dataflow), unrolled
        "pagerank_paths": _EDGES_CTE + """,
r1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS w FROM edges GROUP BY dst),
r2 AS (SELECT e.dst AS node, CAST(SUM(r1.w) AS BIGINT) AS w
       FROM edges e JOIN r1 ON r1.node = e.src GROUP BY e.dst),
r3 AS (SELECT e.dst AS node, CAST(SUM(r2.w) AS BIGINT) AS w
       FROM edges e JOIN r2 ON r2.node = e.src GROUP BY e.dst)
SELECT d.doc_id, CAST(COALESCE(r3.w, 0) AS BIGINT) AS paths
FROM documents d LEFT JOIN r3 ON r3.node = d.doc_id
""",
        "link_degrees": _EDGES_CTE + """,
ind AS (SELECT dst, count(*) AS c FROM edges GROUP BY dst)
SELECT d.doc_id,
  CAST(CASE WHEN d.doc_id % 37 = 3 THEN 0 ELSE 3 END AS BIGINT) AS out_degree,
  CAST(COALESCE(ind.c, 0) AS BIGINT) AS in_degree
FROM documents d LEFT JOIN ind ON ind.dst = d.doc_id
""",
        # canonicalization: lowercase scheme/host, strip fragment, drop
        # default port, empty path → '/'
        "url_normalize": """
WITH built AS (
  SELECT CASE doc_id % 4
    WHEN 0 THEN 'HTTPS://WWW.MixUp.COM.MX:443/Mixup/detproducto.aspx?sku=' || doc_id || '#ref'
    WHEN 1 THEN 'https://www.synthd1.mx:8080/shop/Home.aspx#frag' || doc_id
    WHEN 2 THEN 'HTTP://News.Site.MX:80#top' || doc_id
    ELSE 'https://shop.example.mx/p?q=' || doc_id END AS url
  FROM documents),
p AS (SELECT url,
  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS host,
  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^#]*)', 1) AS rest
  FROM built),
q AS (SELECT url, scheme,
  CASE WHEN scheme = 'https' THEN regexp_replace(host, ':443$', '')
       WHEN scheme = 'http' THEN regexp_replace(host, ':80$', '')
       ELSE host END AS host2,
  CASE WHEN rest = '' THEN '/' ELSE rest END AS rest2 FROM p)
SELECT url, scheme || '://' || host2 || rest2 AS url_norm FROM q
""",
        # synthetic audio duration = 10 ms/char; 2 s chunks, ≤32, tail kept
        "audio_chunks": """
WITH a AS (SELECT CAST(doc_id AS VARCHAR) AS media_id, length(text) * 10 AS dur
           FROM documents),
c AS (SELECT media_id, dur,
             unnest(range(0, least(dur, 64000), 2000)) AS start_ms
      FROM a)
SELECT media_id, CAST(start_ms // 2000 AS BIGINT) AS chunk_no,
       CAST(start_ms AS INT) AS start_ms,
       CAST(least(start_ms + 2000, dur) AS INT) AS end_ms
FROM c
""",
        # ROWS (not the default RANGE) frame: tied (ts, value_u) rows
        # must accumulate one-by-one like the segmented cumsum kernel;
        # ties are pinned by value_u so the output SET is unique
        "user_running_total": """
SELECT user_id, ts, value_u,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, value_u) AS k,
  CAST(SUM(value_u) OVER (PARTITION BY user_id ORDER BY ts, value_u
       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_u
FROM (SELECT user_id, ts,
             CAST(round(value * 1000000) AS BIGINT) AS value_u
      FROM events) e
""",
        # order within a user is pinned by (ts, event_id) — event_id is
        # unique, so LAG's predecessor is deterministic; first-of-key
        # rows are COALESCEd to -1/0 like the kernel (null-free hash)
        "event_deltas": """
SELECT user_id, event_id, ts, value_u,
  COALESCE(ts_us - LAG(ts_us) OVER w, -1) AS delta_us,
  COALESCE(LAG(value_u) OVER w, 0) AS lag_value_u
FROM (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
             CAST(round(value * 1000000) AS BIGINT) AS value_u
      FROM events) e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
        # per-stratum uint64 keep-bounds computed by the SAME
        # sample_bound() the kernel uses (queries.STRATIFIED_RATES)
        "stratified_sample": f"""
SELECT event_id, event_type FROM events
WHERE CAST(('0x' || substr(md5('strat:7:' || CAST(event_id AS VARCHAR)), 1, 16)) AS UBIGINT)
    < CASE event_type
       {_strat_arms}
       ELSE 0 END
""",
        "sample_k": """
SELECT doc_id FROM documents
ORDER BY CAST(('0x' || substr(md5('topk:7:' || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT),
         doc_id
LIMIT 256
""",
        "urgent_lineitems": """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l_orderkey
                AND o.o_orderpriority = '1-URGENT')
""",
        # rebuild the count-min sketch from the same md5 register scheme
        # (depth 4 × width 1024, stages/aggregates.py::cms_counts), then
        # point-query it: est(key) = MIN over rows of that key's cell
        "heavy_hitters": """
WITH rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
hashed AS (
  SELECT r, user_id,
         CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':'
               || CAST(user_id AS VARCHAR)), 1, 16)) AS UBIGINT) % 1024 AS c
  FROM events, rs),
regs AS (SELECT r, c, count(*) AS cnt FROM hashed GROUP BY r, c),
keycells AS (SELECT DISTINCT user_id, r, c FROM hashed)
SELECT k.user_id, CAST(MIN(g.cnt) AS BIGINT) AS est
FROM keycells k JOIN regs g ON g.r = k.r AND g.c = k.c
GROUP BY k.user_id
""",
        # mode tie-break pinned: highest count, then smallest value
        "user_top_event": """
WITH c AS (SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM c)
SELECT user_id, event_type, CAST(n AS BIGINT) AS mode_n
FROM r WHERE rn = 1
""",
        # replay the greedy packing recurrence per md5 shard: running
        # total resets (and pack_id increments) when a doc would
        # overflow the 256-token budget; first doc of a shard anchors
        # pack 0 unconditionally — identical to stages/packing.py
        "pack_sequences": """
WITH RECURSIVE b AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
         CAST(CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 16))
              AS UBIGINT) % 8 AS INTEGER) AS bucket
  FROM documents),
t AS (SELECT b.*, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      FROM b),
g AS (
  SELECT bucket, rn, doc_id, ws_tokens,
         ws_tokens AS running, CAST(0 AS BIGINT) AS pack_id
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.bucket, t.rn, t.doc_id, t.ws_tokens,
         CASE WHEN g.running + t.ws_tokens <= 256
              THEN g.running + t.ws_tokens ELSE t.ws_tokens END,
         CASE WHEN g.running + t.ws_tokens <= 256
              THEN g.pack_id ELSE g.pack_id + 1 END
  FROM g JOIN t ON t.bucket = g.bucket AND t.rn = g.rn + 1)
SELECT doc_id, bucket, pack_id, ws_tokens FROM g
""",
        "event_pivot": """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) AS BIGINT) AS n_total
FROM events GROUP BY user_id
""",
        # quartiles rounded to 6 INSIDE the stat (matching the kernel)
        # so both sides scale with bit-identical (median, IQR) operands;
        # degenerate groups (IQR = 0) emit 0
        "value_scaled": """
WITH s AS (
  SELECT event_type,
         round(quantile_cont(value, 0.25), 6) AS q25,
         round(quantile_cont(value, 0.50), 6) AS q50,
         round(quantile_cont(value, 0.75), 6) AS q75
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       CASE WHEN s.q75 - s.q25 = 0 THEN 0.0
            ELSE round((e.value - s.q50) / (s.q75 - s.q25), 6) END AS value_scaled
FROM events e JOIN s USING (event_type)
""",
        # CUBE = the rollup levels + the by-hour subtotal; every level
        # is derived from the SAME rounded base (matching the kernel)
        "events_cube": """
WITH base AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
         count(*) AS n, round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1, 2)
SELECT event_type, hour, n, sum_value FROM base
UNION ALL
SELECT event_type, CAST(-1 AS BIGINT), CAST(SUM(n) AS BIGINT),
       round(SUM(sum_value), 6)
FROM base GROUP BY event_type
UNION ALL
SELECT 'ALL', hour, CAST(SUM(n) AS BIGINT), round(SUM(sum_value), 6)
FROM base GROUP BY hour
UNION ALL
SELECT 'ALL', CAST(-1 AS BIGINT), CAST(SUM(n) AS BIGINT),
       round(SUM(sum_value), 6)
FROM base
""",
        # integer micro-unit operands make value_u / total_u the same
        # double on both sides; zero totals pin share to 0
        "value_share": """
WITH e AS (SELECT event_id, user_id,
                  CAST(round(value * 1000000) AS BIGINT) AS value_u
           FROM events),
t AS (SELECT user_id, SUM(value_u) AS total_u FROM e GROUP BY user_id)
SELECT e.event_id, e.user_id, e.value_u,
       CASE WHEN t.total_u = 0 THEN 0.0
            ELSE round(CAST(e.value_u AS DOUBLE) / CAST(t.total_u AS DOUBLE), 6)
       END AS share
FROM e JOIN t USING (user_id)
""",
        # content anti-join: incoming = 20 exact copies + 20 edited
        # docs; a row survives only if NO existing doc shares its md5
        "incremental_ingest": """
WITH incoming AS (
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 20
  UNION ALL
  SELECT doc_id + 20000, text || ' v2' FROM documents
  WHERE doc_id >= 20 AND doc_id < 40)
SELECT i.doc_id FROM incoming i
WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE md5(d.text) = md5(i.text))
""",
        "value_hist": """
SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
""",
        "user_paths": """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       CAST(count(*) AS BIGINT) AS n_steps
FROM events WHERE event_id % 37 = 0 GROUP BY user_id
""",
        # event-type names are prefix-free, so LIKE-style subsequence
        # matching over the path string is exact
        "funnel_users": """
WITH p AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events WHERE event_id % 37 = 0 GROUP BY user_id)
SELECT user_id, path FROM p
WHERE regexp_matches(path, 'view.*click.*purchase')
""",
        # RANK orders by value alone (ties share); NTILE needs the
        # pinned unique (value, event_id) order — two window specs
        "value_ranks": """
WITH e AS (SELECT event_type, event_id,
                  CAST(round(value * 1000000) AS BIGINT) AS value_u
           FROM events)
SELECT event_type, event_id, value_u,
  RANK() OVER (PARTITION BY event_type ORDER BY value_u) AS rnk,
  round(PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value_u), 6)
    AS pct_rank,
  CAST(NTILE(4) OVER (PARTITION BY event_type ORDER BY value_u, event_id)
       AS BIGINT) AS tile
FROM e
""",
        # the keep test runs in DOUBLE on both sides with identical
        # operand expressions: hash/2^64 < min(1, ws_tokens/80)
        "importance_sample": """
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
         CAST(('0x' || substr(md5('wsample:7:' || CAST(doc_id AS VARCHAR)), 1, 16))
              AS UBIGINT) AS hv
  FROM documents)
SELECT doc_id, ws_tokens FROM t
WHERE CAST(hv AS DOUBLE) / 18446744073709551616.0
      < least(1.0, CAST(ws_tokens AS DOUBLE) / 80.0)
""",
        # per-hour HLL registers, p=6: bucket = top 6 bits, rho from
        # the exact bit length of the low 58 — same scheme as
        # hll_distinct with the tumbling window as an extra group key
        "hourly_distinct_hll": """
WITH h AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS hv
  FROM events),
parts AS (
  SELECT hour, CAST(hv >> 58 AS INT) AS bucket,
         hv & ((CAST(1 AS UBIGINT) << 58) - 1) AS w
  FROM h)
SELECT hour, bucket,
       CAST(MAX(58 - (CASE WHEN w = 0 THEN 0 ELSE length(bin(w)) END) + 1)
            AS INT) AS rho
FROM parts GROUP BY hour, bucket
""",
        # the engine extracts k with one Arrow regex pass; COALESCE -1
        # mirrors the kernel's missing-key sentinel
        "props_k_stats": """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM (SELECT event_type,
             COALESCE(CAST(json_extract(props, '$.k') AS BIGINT), -1) AS k
      FROM events) e
GROUP BY event_type
""",
        # sparse slice (event_id % 37 == 0) keeps user×type membership
        # genuinely partial so the set ops are non-trivial
        "clickers_buyers": """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'click' AND event_id % 37 = 0
INTERSECT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND event_id % 37 = 0
""",
        "viewers_no_purchase": """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'view' AND event_id % 37 = 0
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'purchase' AND event_id % 37 = 0
""",
        # fixed-point window operands; the avg divides the SAME integer
        # operands the kernel divides (mov_sum_u / (n_win * 1e6))
        "moving_avg": """
WITH e AS (SELECT user_id, ts, event_id,
                  CAST(round(value * 1000000) AS BIGINT) AS value_u
           FROM events)
SELECT user_id, event_id, value_u,
       CAST(sum(value_u) OVER w AS BIGINT) AS mov_sum_u,
       count(*) OVER w AS n_win,
       round(sum(value_u) OVER w / (count(*) OVER w * 1000000.0), 6) AS mov_avg
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
        "first_last_events": """
WITH o AS (SELECT user_id, event_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS n
           FROM events)
SELECT a.user_id,
       a.event_id  AS first_event_id, a.event_type AS first_type,
       b.event_id  AS last_event_id,  b.event_type AS last_type,
       a.n
FROM o a JOIN o b ON a.user_id = b.user_id
WHERE a.rn = 1 AND b.rn = b.n
""",
        "local_supplier_revenue": """
WITH r AS (
  SELECT n_name,
         CAST(round(l_extendedprice * 100) AS HUGEINT)
           * (100 - CAST(round(l_discount * 100) AS HUGEINT)) AS rev4
  FROM customer, orders, lineitem, supplier, nation, region
  WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
    AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'ASIA')
SELECT n_name, count(*) AS n_lines,
       round(CAST(sum(rev4) AS DOUBLE) / 10000.0, 2) AS sum_rev
FROM r
GROUP BY n_name
ORDER BY n_name
""",
        "promo_revenue": """
WITH r AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(round(l_extendedprice * 100) AS HUGEINT)
           * (100 - CAST(round(l_discount * 100) AS HUGEINT)) AS rev4,
         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS promo
  FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT month, count(*) AS n_lines,
       round(CAST(sum(CASE WHEN promo = 1 THEN rev4 ELSE 0 END)
                  AS DOUBLE) / 10000.0, 2) AS promo_rev,
       round(CAST(sum(rev4) AS DOUBLE) / 10000.0, 2) AS total_rev
FROM r
GROUP BY 1
ORDER BY 1
""",
        # timestamps profile as epoch-us so min/max are exact integers
        "events_profile": """
SELECT 'event_id' AS col, count(*) AS n,
       count(*) - count(event_id) AS n_null,
       min(event_id) AS min_i, max(event_id) AS max_i FROM events
UNION ALL
SELECT 'ts', count(*), count(*) - count(ts),
       min(epoch_us(ts)), max(epoch_us(ts)) FROM events
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       min(user_id), max(user_id) FROM events
ORDER BY col
""",
        # same md5-uint64 scheme as sample_k; rank ties are impossible
        # (the hash input embeds the unique id)
        "class_balanced_sample": """
SELECT event_type, event_id, rank FROM (
  SELECT event_type, event_id,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(('0x' || substr(md5('bal:7:' ||
                     CAST(event_id AS VARCHAR)), 1, 16)) AS UBIGINT),
                    event_id
         ) AS rank
  FROM events)
WHERE rank <= 100
ORDER BY event_type, rank
""",
        # exact similarity join: same ground-truth CTE as minhash_pairs
        # but emitting the Jaccard score (the join is exact, so the
        # value — not just membership — must match)
        "ngram_jaccard_pairs": _PAIRS_SQL.replace(
            "SELECT a, b FROM pairs",
            "SELECT a, b, round(j, 6) AS j FROM pairs",
        ),
        # EXISTS semi-join (TPC-H Q4 shape)
        "order_priority_counts": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
        # left-outer count distribution (TPC-H Q13 shape)
        "customer_distribution": """
SELECT c_count, count(*) AS n_custs FROM (
  SELECT c_custkey, count(o_custkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY c_count
""",
        # HAVING-filtered semi-join back to the header (TPC-H Q18 shape)
        "large_orders": """
SELECT o_orderkey, o_custkey, o_totalprice,
       round(sum_qty, 2) AS sum_qty
FROM orders JOIN (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) ON l_orderkey = o_orderkey
ORDER BY o_orderkey
""",
        # scalar-subquery broadcast + NOT EXISTS anti-join (Q22 shape)
        # 'above average' closes over exact cents ints: bal > S/N ⟺
        # bal2 ≥ S//N + 1 — no float average at the set boundary
        "rich_dormant_customers": """
WITH b AS (SELECT c_custkey, c_nationkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS bal2
           FROM customer),
t AS (SELECT CAST(sum(CAST(bal2 AS HUGEINT)) // count(*) AS BIGINT) + 1
        AS min_rich2 FROM b)
SELECT c_nationkey, count(*) AS n_custs,
       round(CAST(sum(CAST(bal2 AS HUGEINT)) AS DOUBLE) / 100.0, 2)
         AS total_bal
FROM b, t
WHERE bal2 >= min_rich2
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
        # wide→long reshape (UNPIVOT); values pass through bit-exact
        "events_unpivot": """
SELECT event_id, 'value' AS metric, value AS mval FROM events
UNION ALL
SELECT event_id, 'user_id', CAST(user_id AS DOUBLE) FROM events
UNION ALL
SELECT event_id, 'epoch_us', CAST(epoch_us(ts) AS DOUBLE) FROM events
""",
    }
    # derived: cluster-size histogram over the SAME component fixpoint
    out["dup_cluster_sizes"] = (
        "SELECT size, count(*) AS n_clusters FROM ("
        "SELECT label, count(*) AS size FROM ("
        + out["connected_components"]
        + ") GROUP BY label) GROUP BY size ORDER BY size"
    )
    # canonical keeper per dup cluster: most characters, tie -> min id
    out["canonical_docs"] = (
        """
SELECT label, min(doc_id) FILTER (WHERE n = mx) AS keeper,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(max(n) AS BIGINT) AS max_chars
FROM (
  SELECT c.label, c.node AS doc_id, l.n,
         max(l.n) OVER (PARTITION BY c.label) AS mx
  FROM ("""
        + out["connected_components"]
        + """) c
  JOIN (SELECT CAST(doc_id AS VARCHAR) AS doc_id, length(text) AS n
        FROM (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 20000, text || ' extra tail token appended'
              FROM documents WHERE doc_id < 10)) l
    ON l.doc_id = c.node)
GROUP BY label ORDER BY label
"""
    )
    out["top_bigrams"] = r"""
WITH words AS (
  SELECT regexp_extract_all(lower(text), '\w+') AS ws FROM documents),
bg AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i+1])) AS bigram
  FROM words WHERE len(ws) >= 2)
SELECT bigram, count(*) AS n FROM bg
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
"""
    # first-touch attribution: per-user min day -> daily new users ->
    # cumulative total (epoch-day ints so no date formatting crosses
    # the hash gate)
    out["daily_new_users"] = """
SELECT day, n_new,
       CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM (
  SELECT day, count(*) AS n_new FROM (
    SELECT user_id,
           min(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS day
    FROM events GROUP BY user_id)
  GROUP BY day)
ORDER BY day
"""
    # mergeable second-moment aggregate; corr is normalization-invariant
    # so the sufficient-statistics formula matches corr() at round-6
    out["grouped_corr"] = """
SELECT event_type, count(*) AS n,
       round(corr(value,
                  CAST(epoch_us(ts) % 86400000000 AS DOUBLE)), 6) AS corr_vh
FROM events GROUP BY event_type ORDER BY event_type
"""
    # cohort retention: distinct users active at week-offset w from
    # their first-touch day (epoch-day ints)
    out["retention_cohorts"] = """
WITH f AS (SELECT user_id,
           min(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS cohort
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT e.user_id, f.cohort,
      (CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.cohort) // 7
        AS week_offset
      FROM events e JOIN f USING (user_id))
SELECT cohort, week_offset, count(*) AS n_users
FROM a GROUP BY cohort, week_offset ORDER BY cohort, week_offset
"""
    # winsorized mean: clip bounds rounded to 6 BEFORE clipping on both
    # sides so clip decisions are hash-identical
    out["winsorized_stats"] = """
WITH q AS (SELECT event_type,
        round(quantile_cont(value, 0.05), 6) AS p05,
        round(quantile_cont(value, 0.95), 6) AS p95
        FROM events GROUP BY event_type)
SELECT e.event_type, count(*) AS n,
       any_value(q.p05) AS p05, any_value(q.p95) AS p95,
       round(CAST(sum(least(greatest(
                    CAST(round(e.value * 1000000) AS BIGINT),
                    CAST(round(q.p05 * 1000000) AS BIGINT)),
                    CAST(round(q.p95 * 1000000) AS BIGINT)))
                  AS DOUBLE) / count(*) / 1000000.0, 6)
         AS clipped_mean
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""
    # sliding 7-day distinct users per window_end day (epoch days)
    out["rolling_active_users"] = """
WITH d AS (SELECT DISTINCT user_id,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events),
w AS (SELECT DISTINCT user_id, unnest(range(day, day + 7)) AS win FROM d),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d)
SELECT win AS window_end, count(*) AS active_users
FROM w, bounds WHERE win BETWEEN lo AND hi
GROUP BY win ORDER BY win
"""
    # LSH multi-probe ANN shares ivf_topk's ground truth: the same
    # augmented table concentrates the true top-10 in the query's own
    # bucket, so exact brute force gates both approximate indexes
    out["lsh_topk"] = out["ivf_topk"]
    # benchmark 3-gram decontamination: docs with doc_id % 97 == 0 stand
    # in for the eval benchmark; a corpus doc is contaminated if it
    # shares ANY word 3-gram with the benchmark set
    out["decontaminate"] = """
WITH words AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, source, array_to_string(list_slice(w, i, i + 2), ' ') AS g
  FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
flags AS (
  SELECT d.doc_id, d.source,
         CASE WHEN EXISTS (SELECT 1 FROM grams g JOIN bench b ON g.g = b.g
                           WHERE g.doc_id = d.doc_id) THEN 1 ELSE 0 END AS hit
  FROM documents d WHERE d.doc_id % 97 <> 0
)
SELECT source, count(*) AS n_docs, CAST(sum(hit) AS BIGINT) AS n_contaminated
FROM flags GROUP BY source ORDER BY source
"""
    out["unigram_logprob"] = """
WITH words AS (
  SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS w FROM documents
),
counts AS (SELECT w, count(*) AS c FROM words GROUP BY w),
tot AS (SELECT sum(c) AS t FROM counts)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(log2(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))), 6) AS avg_logprob
FROM words JOIN counts USING (w), tot
GROUP BY doc_id ORDER BY doc_id
"""
    out["forecast_revenue"] = """
SELECT round(CAST(COALESCE(sum(CAST(round(l_extendedprice * 100)
                                    AS HUGEINT)
                       * CAST(round(l_discount * 100) AS HUGEINT)), 0)
                  AS DOUBLE) / 10000.0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
"""
    out["small_qty_parts"] = """
WITH avg_q AS (
  SELECT l_partkey AS pk, avg(l_quantity) AS aq
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#4' GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem JOIN avg_q ON l_partkey = pk
WHERE l_quantity < 0.5 * aq
"""
    # per-label embedding centroids, long form (list<float> column math)
    out["label_centroids"] = """
SELECT label, i AS dim,
       round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) AS centroid,
       count(*) AS n
FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
GROUP BY label, i ORDER BY label, dim
"""
    # word 5-grams occurring in >1 distinct document, counted per doc
    out["repeated_ngrams"] = """
WITH words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS g
  FROM words, UNNEST(range(1, len(w) - 3)) AS t(i)
),
gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
SELECT doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM grams JOIN gd USING (g) GROUP BY doc_id ORDER BY doc_id
"""
    out["shipping_priority"] = """
SELECT l_orderkey,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                      * (100 - CAST(round(l_discount * 100) AS HUGEINT)))
                  AS DOUBLE) / 10000.0, 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""
    out["nation_trade_flows"] = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       count(*) AS n_lines,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND sn.n_nationkey <> cn.n_nationkey
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""
    out["returned_top_customers"] = """
SELECT c_custkey, c_name,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""
    out["top_supplier_revenue"] = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier USING (s_suppkey)
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""
    out["disjunctive_revenue"] = """
SELECT round(COALESCE(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))), 0)
           / 10000.0, 2)
         AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""
    out["supplier_part_variety"] = """
SELECT p_brand,
       CAST((p_size - 1) // 10 AS BIGINT) AS size_bucket,
       count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
GROUP BY 1, 2
ORDER BY 1, 2
"""
    # one Lloyd step: nearest of the k=8 smallest-vec_id seed centroids
    out["kmeans_assign"] = """
WITH seeds AS (
  SELECT vec_id AS sid, CAST(embedding AS DOUBLE[]) AS s
  FROM embeddings WHERE vec_id < 8
),
d AS (
  SELECT e.vec_id, s.sid,
         sum((CAST(e.embedding[i + 1] AS DOUBLE) - s.s[i + 1])
           * (CAST(e.embedding[i + 1] AS DOUBLE) - s.s[i + 1])) AS d2
  FROM embeddings e CROSS JOIN seeds s, UNNEST(range(len(e.embedding))) AS t(i)
  GROUP BY e.vec_id, s.sid
),
a AS (SELECT vec_id, sid, d2,
      row_number() OVER (PARTITION BY vec_id ORDER BY d2, sid) AS rn FROM d)
SELECT sid AS cluster, count(*) AS n, round(avg(d2), 6) AS avg_dist2
FROM a WHERE rn = 1 GROUP BY sid ORDER BY sid
"""
    out["source_vocab"] = """
WITH w AS (
  SELECT source, unnest(string_split(trim(text), ' ')) AS tok
  FROM documents
)
SELECT source, count(*) AS n_tokens, count(DISTINCT tok) AS n_vocab
FROM w GROUP BY source ORDER BY source
"""
    # undirected triangle census of the derived-web expander
    # (edge formula + captcha pruning match pipelines/derived.py)
    out["triangle_count"] = """
WITH nn AS (SELECT count(*) AS n FROM documents),
e0 AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e0 WHERE src <> dst)
SELECT (SELECT count(*) FROM e) AS n_edges,
       (SELECT count(*) FROM e e1 JOIN e e2 ON e2.a = e1.b) AS n_wedges,
       (SELECT count(*) FROM e e1 JOIN e e2 ON e2.a = e1.b
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
"""
    # weighted round-robin interleave: even-numbered sources weight 2,
    # odd weight 1; cycle order = sources ascending
    out["corpus_mix"] = """
WITH w AS (
  SELECT DISTINCT source,
         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
              THEN 2 ELSE 1 END AS wt
  FROM documents
),
off AS (
  SELECT source, wt,
         coalesce(sum(wt) OVER (ORDER BY source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0,
         sum(wt) OVER () AS cyc
  FROM w
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rn
  FROM documents
)
SELECT doc_id, source,
       CAST((rn // wt) * cyc + off0 + (rn % wt) AS BIGINT) AS mix_pos
FROM r JOIN off USING (source)
ORDER BY doc_id
"""
    out["market_share"] = """
WITH base AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev4,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part      ON p_partkey = l_partkey
  JOIN orders    ON o_orderkey = l_orderkey
  JOIN customer  ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region    ON r_regionkey = cn.n_regionkey
  JOIN supplier  ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev4 ELSE 0 END)
             / sum(rev4), 6) AS mkt_share
FROM base GROUP BY 1 ORDER BY 1
"""
    out["product_profit"] = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0,
           2) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2
"""
    out["important_parts"] = """
WITH v AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
  FROM lineitem GROUP BY 1
)
SELECT p_partkey, round(rev4 / 10000.0, 2) AS value
FROM v
WHERE CAST(rev4 AS HUGEINT) * 2 * (SELECT count(*) FROM v)
      > 3 * (SELECT sum(rev4) FROM v)
ORDER BY value DESC, p_partkey
"""
    out["waiting_orders"] = """
WITH f AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
stats AS (
  SELECT l_orderkey, max(l_shipdate) AS mx,
         count(DISTINCT l_suppkey) AS ns
  FROM f GROUP BY 1
),
winners AS (
  SELECT f.l_orderkey, min(f.l_suppkey) AS w,
         count(DISTINCT f.l_suppkey) AS nmax
  FROM f JOIN stats ON f.l_orderkey = stats.l_orderkey
                   AND f.l_shipdate = stats.mx
  WHERE stats.ns >= 2
  GROUP BY 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM winners JOIN supplier ON s_suppkey = w
WHERE nmax = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""
    out["cheapest_supplier"] = """
WITH offers AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_size >= 30
),
best AS (
  SELECT p_partkey, min(price_cents) AS mn FROM offers GROUP BY 1
),
win AS (
  SELECT o.p_partkey, min(o.s_suppkey) AS s_suppkey, b.mn
  FROM offers o JOIN best b
    ON o.p_partkey = b.p_partkey AND o.price_cents = b.mn
  GROUP BY 1, 3
)
SELECT w.p_partkey, p_name, w.s_suppkey, s_name,
       round(mn / 100.0, 2) AS price
FROM win w
JOIN part ON part.p_partkey = w.p_partkey
JOIN supplier ON supplier.s_suppkey = w.s_suppkey
ORDER BY w.p_partkey
"""
    out["priority_linecounts"] = """
SELECT l_linestatus,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1 ORDER BY 1
"""
    out["dominant_supplier_counts"] = """
WITH pair AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS q100
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, sum(q100) AS tq FROM pair GROUP BY 1)
SELECT l_suppkey AS s_suppkey, count(*) AS n_parts
FROM pair JOIN tot USING (l_partkey)
WHERE q100 * 2 > tq
GROUP BY 1
ORDER BY n_parts DESC, s_suppkey
"""
    # z-score: the discriminant n*ss - s*s is closed over exact HUGEINTs
    # on both sides; the single int->double rounding before sqrt/divide
    # is shared, so the rounded doubles are hash-identical
    out["value_zscore"] = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(round(value * 1000) AS BIGINT) AS v3
  FROM events
),
m AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(v3 AS HUGEINT)) AS s,
         sum(CAST(v3 AS HUGEINT) * CAST(v3 AS HUGEINT)) AS ss
  FROM v GROUP BY 1
)
SELECT event_id, v.event_type,
       round(CASE WHEN n * ss - s * s > 0
             THEN CAST(v3 * n - s AS DOUBLE)
                  / sqrt(CAST(n * ss - s * s AS DOUBLE))
             ELSE 0.0 END, 6) AS z
FROM v JOIN m USING (event_type)
ORDER BY event_id
"""
    # lift = P(xy)/(P(x)P(y)) floor-scaled to 1e6, closed over exact
    # HUGEINTs (no libm log crosses the hash gate)
    out["bigram_lift"] = r"""
WITH words AS (
  SELECT regexp_extract_all(lower(text), '\w+') AS ws FROM documents),
uni AS (SELECT unnest(ws) AS w FROM words),
ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
nu AS (SELECT CAST(count(*) AS HUGEINT) AS n_u FROM uni),
bg AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i+1])) AS bigram
  FROM words WHERE len(ws) >= 2),
bcnt AS (SELECT bigram, count(*) AS n FROM bg
         GROUP BY 1 HAVING count(*) >= 5),
nb AS (SELECT CAST(count(*) AS HUGEINT) AS n_b FROM bg)
SELECT bigram, n,
       CAST(CAST(n AS HUGEINT) * n_u * n_u * 1000000
            // (n_b * cx.c * cy.c) AS BIGINT) AS lift6
FROM bcnt
CROSS JOIN nu
CROSS JOIN nb
JOIN ucnt cx ON cx.w = split_part(bigram, ' ', 1)
JOIN ucnt cy ON cy.w = split_part(bigram, ' ', 2)
ORDER BY lift6 DESC, bigram
LIMIT 20
"""
    # exact median/MAD on milliunit ints: quantile_cont interpolation
    # lands on exact half/quarter-integers both engines reproduce
    out["value_mad"] = """
WITH v AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v3
  FROM events),
m AS (SELECT event_type, quantile_cont(v3, 0.5) AS med3 FROM v GROUP BY 1)
SELECT v.event_type,
       round(any_value(med3) / 1000.0, 6) AS med,
       round(quantile_cont(abs(v3 - med3), 0.5) / 1000.0, 6) AS mad
FROM v JOIN m USING (event_type)
GROUP BY v.event_type
ORDER BY v.event_type
"""
    out["event_type_pairs"] = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""
    out["daily_value_change"] = """
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         sum(CAST(round(value * 1000) AS BIGINT)) AS s3
  FROM events GROUP BY 1),
w AS (SELECT day, s3, lag(s3) OVER (ORDER BY day) AS prev FROM d)
SELECT day, round(s3 / 1000.0, 6) AS total,
       round(CAST(s3 - prev AS DOUBLE) / prev, 6) AS pct_change
FROM w
WHERE prev IS NOT NULL AND prev != 0
ORDER BY day
"""
    # Lloyd's k-means unrolled: init + 2 refinement rounds; assignments
    # and means close over the same exact ints/doubles the engine uses
    out["kmeans_1d"] = """
WITH v AS (SELECT CAST(round(value * 1000) AS BIGINT) AS v3 FROM events),
h AS (SELECT v3, count(*) AS n FROM v GROUP BY 1),
b AS (SELECT CAST(min(v3) AS DOUBLE) AS mn,
             CAST(max(v3) AS DOUBLE) AS mx FROM h),
c0 AS (SELECT i, mn + (mx - mn) * (2 * i + 1) / 8.0 AS c
       FROM b CROSS JOIN range(4) t(i)),
a1 AS (SELECT h.v3, h.n,
              (SELECT i FROM c0 ORDER BY abs(h.v3 - c0.c), i LIMIT 1) AS cl
       FROM h),
c1 AS (SELECT c0.i,
              coalesce(CAST(u.s AS DOUBLE) / CAST(u.nn AS DOUBLE), c0.c) AS c
       FROM c0 LEFT JOIN (
         SELECT cl AS i, sum(v3 * n) AS s, sum(n) AS nn FROM a1 GROUP BY 1
       ) u USING (i)),
a2 AS (SELECT h2.v3, h2.n,
              (SELECT i FROM c1 ORDER BY abs(h2.v3 - c1.c), i LIMIT 1) AS cl
       FROM a1 h2)
SELECT cl AS cluster, CAST(sum(n) AS BIGINT) AS n,
       round(CAST(sum(v3 * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
             / 1000.0, 6) AS centroid
FROM a2 GROUP BY 1 ORDER BY 1
"""
    out["corpus_shards"] = r"""
WITH s AS (
  SELECT CAST(CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                    1, 16)) AS UBIGINT) % 16 AS BIGINT) AS shard,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
  FROM documents)
SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM s GROUP BY 1 ORDER BY 1
"""
    out["user_drawdown"] = """
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 1000) AS BIGINT) AS v3
  FROM events)
SELECT event_id, user_id,
       round(CAST(max(v3) OVER w AS BIGINT) / 1000.0, 6) AS peak,
       round((max(v3) OVER w - v3) / 1000.0, 6) AS drawdown
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
ORDER BY event_id
"""
    out["key_skew"] = """
SELECT events_per_user, count(*) AS n_users
FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS events_per_user
      FROM events GROUP BY 1)
GROUP BY 1 ORDER BY 1
"""
    out["latest_events"] = """
SELECT user_id, day, event_id, event_type
FROM (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         event_id, event_type,
         row_number() OVER (
           PARTITION BY user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT)
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
ORDER BY user_id, day
"""
    # Simpson diversity closed over exact HUGEINTs (see q_source_diversity)
    out["source_diversity"] = r"""
WITH tok AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
  FROM documents),
c AS (SELECT source, tok, CAST(count(*) AS HUGEINT) AS n
      FROM tok GROUP BY 1, 2),
f AS (SELECT source, CAST(sum(n) AS HUGEINT) AS nt, sum(n * n) AS sq
      FROM c GROUP BY 1)
SELECT source, CAST(nt AS BIGINT) AS n_tokens,
       CAST((nt * nt - sq) * 1000000 // (nt * nt) AS BIGINT) AS simpson6
FROM f ORDER BY source
"""
    out["click_to_purchase"] = """
SELECT c.event_id,
       CAST(count(p.event_id) AS BIGINT) AS n_purchases_7d
FROM events c
LEFT JOIN events p
  ON p.user_id = c.user_id AND p.event_type = 'purchase'
 AND p.ts > c.ts
 AND epoch_us(p.ts) <= epoch_us(c.ts) + 604800000000
WHERE c.event_type = 'click'
GROUP BY 1 ORDER BY 1
"""
    # exact Gini closed over HUGEINTs; Σi·x is permutation-invariant
    # within revenue ties, so ORDER BY x alone is deterministic
    out["revenue_gini"] = """
WITH r AS (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS x
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1
),
s AS (SELECT CAST(x AS HUGEINT) AS x,
             CAST(row_number() OVER (ORDER BY x) AS HUGEINT) AS i FROM r),
t AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
             sum(i * x) AS six FROM s)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(CAST(sx AS DOUBLE) / 10000.0, 2) AS total_rev,
       CAST((2 * six - (n + 1) * sx) * 1000000 // (n * sx) AS BIGINT)
         AS gini6
FROM t
"""
    out["range_moving_sum"] = """
WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS tu,
                  CAST(round(value * 1000) AS BIGINT) AS v3 FROM events)
SELECT event_id,
       round(CAST(sum(v3) OVER (PARTITION BY user_id ORDER BY tu
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
             AS BIGINT) / 1000.0, 6) AS sum_24h
FROM v ORDER BY event_id
"""
    out["missing_days"] = """
WITH d AS (SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
           AS day FROM events WHERE event_id % 397 = 0),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM d)
SELECT r.day
FROM (SELECT unnest(range(lo, hi + 1)) AS day FROM span) r
LEFT JOIN d USING (day)
WHERE d.day IS NULL
ORDER BY r.day
"""
    # capstone composition: the corpus_prep oracle verbatim as a CTE,
    # then the md5 shard routing + manifest on its survivors
    out["training_manifest"] = (
        "WITH prep AS (" + out["corpus_prep"] + """)
SELECT CAST(CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                  1, 16)) AS UBIGINT) % 16 AS BIGINT) AS shard,
       count(*) AS n_docs,
       CAST(sum(ws_tokens) AS BIGINT) AS n_tokens
FROM prep GROUP BY 1 ORDER BY 1"""
    )
    out["customer_revenue_pctile"] = """
WITH r AS (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS x
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1
),
s AS (SELECT o_custkey, x, rank() OVER (ORDER BY x) AS rk,
             count(*) OVER () AS n FROM r)
SELECT o_custkey, round(x / 10000.0, 2) AS revenue,
       CAST(CAST(rk - 1 AS HUGEINT) * 1000000
            // greatest(n - 1, 1) AS BIGINT) AS pct6
FROM s ORDER BY o_custkey
"""
    # integer EMA recurrence replayed step-by-step as a recursive CTE —
    # the floor divide makes it a true recurrence (not window-expressible);
    # both sides run e_t = (e_{t-1} + v_t) // 2 over exact milliunit ints
    out["user_ema"] = """
WITH RECURSIVE seq AS (
  SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS m,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
rec AS (
  SELECT user_id, rn, m AS e FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, (r.e + s.m) // 2
  FROM rec r JOIN seq s
    ON s.user_id = r.user_id AND s.rn = r.rn + 1),
last AS (SELECT user_id, max(rn) AS n_events FROM seq GROUP BY 1)
SELECT l.user_id, CAST(l.n_events AS BIGINT) AS n_events,
       round(r.e / 1000.0, 6) AS ema
FROM last l JOIN rec r
  ON r.user_id = l.user_id AND r.rn = l.n_events
ORDER BY l.user_id
"""
    out["value_outliers"] = """
WITH v AS (
  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v3
  FROM events),
m AS (SELECT event_type, quantile_disc(v3, 0.5) AS med3
      FROM v GROUP BY 1),
d AS (SELECT v.event_type, v3, med3, abs(v3 - med3) AS dv
      FROM v JOIN m USING (event_type)),
md AS (SELECT event_type, quantile_disc(dv, 0.5) AS mad3
       FROM d GROUP BY 1)
SELECT d.event_type,
       round(any_value(d.med3) / 1000.0, 6) AS med,
       round(any_value(md.mad3) / 1000.0, 6) AS mad,
       CAST(count(*) FILTER (WHERE dv > 3 * mad3) AS BIGINT)
         AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_events
FROM d JOIN md USING (event_type)
GROUP BY 1 ORDER BY 1
"""
    out["peak_in_transit"] = """
WITH iv AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS dd0,
         CAST(l_shipdate AS DATE)
           + CAST(round(l_quantity) AS INT) AS dd1
  FROM lineitem),
ev AS (
  SELECT l_suppkey, dd0 AS d, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT l_suppkey, dd1, CAST(-1 AS BIGINT) FROM iv),
net AS (SELECT l_suppkey, d, sum(delta) AS nd FROM ev GROUP BY 1, 2),
run AS (SELECT l_suppkey,
               sum(nd) OVER (PARTITION BY l_suppkey ORDER BY d) AS r
        FROM net)
SELECT l_suppkey, CAST(max(r) AS BIGINT) AS peak
FROM run GROUP BY 1 ORDER BY 1
"""
    out["mutual_best_match"] = """
WITH li AS (
  SELECT l_partkey p, l_suppkey s,
         CAST(round(l_extendedprice * 100) AS BIGINT) c
  FROM lineitem),
pb AS (SELECT p, s, c,
              row_number() OVER (PARTITION BY p ORDER BY c, s) rn
       FROM li),
sb AS (SELECT p, s, c,
              row_number() OVER (PARTITION BY s ORDER BY c, p) rn
       FROM li)
SELECT a.p AS p_partkey, a.s AS s_suppkey,
       round(a.c / 100.0, 2) AS price
FROM (SELECT p, s, c FROM pb WHERE rn = 1) a
JOIN (SELECT p, s FROM sb WHERE rn = 1) b
  ON a.p = b.p AND a.s = b.s
ORDER BY 1
"""
    # unnormalized integer HITS, 2 alternating rounds unrolled
    out["hits_scores"] = _EDGES_CTE + """,
a1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS w
       FROM edges GROUP BY dst),
h1 AS (SELECT e.src AS node, CAST(SUM(a1.w) AS BIGINT) AS w
       FROM edges e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
a2 AS (SELECT e.dst AS node, CAST(SUM(h1.w) AS BIGINT) AS w
       FROM edges e JOIN h1 ON h1.node = e.src GROUP BY e.dst)
SELECT d.doc_id, CAST(COALESCE(h1.w, 0) AS BIGINT) AS hub,
       CAST(COALESCE(a2.w, 0) AS BIGINT) AS auth
FROM documents d
LEFT JOIN h1 ON h1.node = d.doc_id
LEFT JOIN a2 ON a2.node = d.doc_id
ORDER BY d.doc_id
"""
    # 3 unrolled peels of the k=5 core over the undirected multigraph,
    # then the survivors' induced degree
    out["kcore"] = _EDGES_CTE + """,
und AS (SELECT src AS u, dst AS v FROM edges
        UNION ALL SELECT dst, src FROM edges),
d0 AS (SELECT u, count(*) AS c FROM und GROUP BY u),
a1 AS (SELECT u FROM d0 WHERE c >= 5),
d1 AS (SELECT e.u, count(*) AS c FROM und e
       JOIN a1 x ON x.u = e.u JOIN a1 y ON y.u = e.v GROUP BY e.u),
a2 AS (SELECT u FROM d1 WHERE c >= 5),
d2 AS (SELECT e.u, count(*) AS c FROM und e
       JOIN a2 x ON x.u = e.u JOIN a2 y ON y.u = e.v GROUP BY e.u),
a3 AS (SELECT u FROM d2 WHERE c >= 5),
d3 AS (SELECT e.u, count(*) AS c FROM und e
       JOIN a3 x ON x.u = e.u JOIN a3 y ON y.u = e.v GROUP BY e.u)
SELECT a3.u AS doc_id, CAST(COALESCE(d3.c, 0) AS BIGINT) AS core_degree
FROM a3 LEFT JOIN d3 ON d3.u = a3.u
ORDER BY a3.u
"""
    # watermark = running max event-time over md5-permuted arrival
    # order; late ⟺ watermark leads the event by > 15 days
    out["late_events"] = """
WITH a AS (
  SELECT event_id, ts,
         CAST(('0x' || substr(md5('arr:' || event_id), 1, 16))
              AS UBIGINT) AS arr
  FROM events),
w AS (
  SELECT event_id, ts,
         max(ts) OVER (ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS wm
  FROM a)
SELECT event_id,
       CAST(coalesce(wm - INTERVAL 15 DAY > ts, FALSE) AS BIGINT)
         AS is_late
FROM w ORDER BY event_id
"""
    # deterministic synthetic PII (same derivation as queries._pii_docs),
    # then regex detection + redaction; audit aggregate per source
    out["pii_scrub"] = r"""
WITH aug AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-' || (doc_id % 10000) ELSE '' END AS text
  FROM documents)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+\.[a-z]+')))
            AS BIGINT) AS n_emails,
       CAST(sum(len(regexp_extract_all(text, '555-[0-9]+')))
            AS BIGINT) AS n_phones,
       CAST(sum(length(regexp_replace(
                regexp_replace(text, '[a-z0-9]+@[a-z]+\.[a-z]+', '[PII]', 'g'),
                '555-[0-9]+', '[PII]', 'g'))) AS BIGINT) AS redacted_chars
FROM aug GROUP BY source ORDER BY source
"""
    # fixed-token-window chunk manifest: window 64, stride 48
    out["chunk_windows"] = """
WITH words AS (
  SELECT doc_id, len(string_split(trim(text), ' ')) AS n FROM documents
)
SELECT doc_id, CAST(i / 48 AS BIGINT) AS chunk_id,
       CAST(least(64, n - i) AS BIGINT) AS chunk_tokens
FROM words, UNNEST(range(0, n, 48)) AS t(i)
ORDER BY doc_id, chunk_id
"""
    # the Ray side round-trips through JSONL; values must survive exactly
    out["jsonl_roundtrip"] = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY source ORDER BY source
"""
    out["csv_roundtrip"] = out["jsonl_roundtrip"]
    # int8 scalar-quantization ANN: affine per-dim codes
    # floor((v-mn)/(mx-mn)*255 + 0.5), exact integer dot-product scores
    out["quantized_topk"] = """
WITH v AS (
  SELECT vec_id, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS val
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
stats AS (SELECT dim, MIN(val) AS mn, MAX(val) AS mx FROM v GROUP BY dim),
codes AS (
  SELECT v.vec_id, v.dim,
         CASE WHEN s.mx > s.mn
              THEN CAST(floor((v.val - s.mn) / (s.mx - s.mn) * 255 + 0.5)
                        AS BIGINT)
              ELSE 0 END AS c
  FROM v JOIN stats s USING (dim)),
qc AS (SELECT dim, c FROM codes WHERE vec_id = 1),
scored AS (
  SELECT codes.vec_id, CAST(SUM(codes.c * qc.c) AS BIGINT) AS score
  FROM codes JOIN qc USING (dim) GROUP BY codes.vec_id)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id LIMIT 10
"""
    # sign-LSH bucket histogram over md5-derived ±1 hyperplanes; values
    # fixed-pointed to 1e-6 ints before projecting so buckets are exact
    out["rp_buckets"] = """
WITH v AS (
  SELECT vec_id, i AS dim,
         CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v6
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
signs AS (
  SELECT i AS dim,
         CAST(('0x' || substr(md5('rp' || CAST(i AS VARCHAR)), 1, 16))
              AS UBIGINT) AS hv
  FROM (SELECT unnest(range((SELECT len(embedding) FROM embeddings
                             LIMIT 1))) AS i)),
proj AS (
  SELECT v.vec_id, j.j,
         SUM(v.v6 * (CASE WHEN (s.hv >> CAST(j.j AS INT)) & 1 = 1
                          THEN 1 ELSE -1 END)) AS p
  FROM v JOIN signs s USING (dim)
  CROSS JOIN (SELECT unnest(range(8)) AS j) j
  GROUP BY v.vec_id, j.j),
bkt AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN p > 0 THEN 1 << CAST(j AS INT) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id)
SELECT bucket, COUNT(*) AS n FROM bkt GROUP BY bucket ORDER BY bucket
"""
    # BM25 (k1=1.2, b=0.75, log-free monotone idf); per-term score
    # rounded half-away to 6 decimals then summed in 1e-6 integer units
    out["bm25_topk"] = """
WITH docs AS (
  SELECT doc_id, lower(text) AS txt,
         CAST(len(regexp_extract_all(text, '\\w+')) AS DOUBLE) AS dl
  FROM documents),
consts AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(dl) / COUNT(*) AS avgdl FROM docs),
terms AS (SELECT unnest(['vector', 'join', 'stream']) AS term),
tf AS (
  SELECT d.doc_id, t.term, d.dl,
         CAST(len(regexp_extract_all(d.txt, '\\b' || t.term || '\\b'))
              AS DOUBLE) AS tf
  FROM docs d CROSS JOIN terms t),
df AS (SELECT term, CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS df FROM tf GROUP BY term),
per_term AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(((c.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / c.avgdl))
                    * 1000000) AS BIGINT) AS s6
  FROM tf JOIN df USING (term) CROSS JOIN consts c WHERE tf.tf > 0)
SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS score6
FROM per_term GROUP BY doc_id
ORDER BY score6 DESC, doc_id LIMIT 20
"""
    # interleaved-span analytics over the crawled corpus: every span
    # text is a deterministic synthesis formula of the source row
    # (pipelines/derived.py), so lengths reconstruct exactly in SQL
    # over the BFS-reachable set
    out["span_kind_stats"] = _BFS_CTE + """,
reach AS (SELECT node AS doc_id FROM r GROUP BY node),
d AS (SELECT doc.* FROM documents doc JOIN reach USING (doc_id)),
nn2 AS (SELECT count(*) AS n FROM documents),
norm AS (SELECT * FROM d WHERE doc_id % 37 != 3),
cap AS (SELECT * FROM d WHERE doc_id % 37 = 3),
link_chars AS (
  SELECT d0.doc_id,
         SUM(1 + length(CAST((m.a * d0.doc_id + m.b) % nn2.n AS VARCHAR)))
           AS chars
  FROM norm d0, nn2, (VALUES (7, 1), (13, 2), (29, 5)) m(a, b)
  GROUP BY d0.doc_id),
spans AS (
  SELECT 'text' AS kind, 3 AS n_spans,
         (10 + length(CAST(doc_id AS VARCHAR)))
           + (6 + length(source)) + length(text) AS sum_chars,
         0 AS n_media FROM norm
  UNION ALL SELECT 'detail', 1, 6 + length(lang), 0 FROM norm
  UNION ALL SELECT 'price', 1,
         12 + length(CAST(n_chars AS VARCHAR)), 0 FROM norm
  UNION ALL SELECT 'review', 1,
         (4 + length(CAST(doc_id AS VARCHAR)))
       + 7
       + (8 + length(CAST(doc_id AS VARCHAR)))
       + (CASE WHEN doc_id % 3 = 0
               THEN 10 + length(CAST(doc_id AS VARCHAR))
               ELSE length(source) + 8 + length(CAST(doc_id AS VARCHAR))
          END)
       + (29 + length(CAST(doc_id % 28 + 1 AS VARCHAR)))
       + 4, 0 FROM norm
  UNION ALL SELECT 'meta', 2,
         (13 + length(CAST(doc_id AS VARCHAR)) + length(lang))
       + (33 + length(CAST(doc_id AS VARCHAR))), 0 FROM norm
  UNION ALL SELECT 'media', 1, 8, 1 FROM norm
  UNION ALL SELECT 'link', 3, lc.chars, 3
    FROM norm JOIN link_chars lc USING (doc_id)
  UNION ALL SELECT 'captcha', 1,
         20 + length(CAST(doc_id AS VARCHAR)), 0 FROM cap)
SELECT kind, CAST(SUM(n_spans) AS BIGINT) AS n_spans,
       CAST(SUM(sum_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_media) AS BIGINT) AS n_media
FROM spans GROUP BY kind ORDER BY kind
"""
    # interpolated percentile report; engine closes the interpolation in
    # exact x20 fixed-point over the milliunit histogram — results are
    # multiples of 5e-5, so round(.,6) is ulp-safe on both sides
    out["value_percentiles"] = """
SELECT event_type,
       round(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 6) AS p25,
       round(percentile_cont(0.50) WITHIN GROUP (ORDER BY value), 6) AS p50,
       round(percentile_cont(0.75) WITHIN GROUP (ORDER BY value), 6) AS p75,
       round(percentile_cont(0.90) WITHIN GROUP (ORDER BY value), 6) AS p90
FROM events GROUP BY event_type ORDER BY event_type
"""
    # deterministic dataloader epoch shuffle: first 64 slots of the
    # md5-salted per-epoch permutation, positions via row_number
    out["epoch_order"] = """
WITH ranked AS (
  SELECT e.epoch, d.doc_id,
         row_number() OVER (
           PARTITION BY e.epoch
           ORDER BY CAST(('0x' || substr(md5('epoch:' || CAST(e.epoch AS VARCHAR)
                                             || ':' || CAST(d.doc_id AS VARCHAR)),
                                         1, 16)) AS UBIGINT),
                    d.doc_id
         ) - 1 AS position
  FROM documents d CROSS JOIN (SELECT unnest([1, 2]) AS epoch) e)
SELECT CAST(epoch AS BIGINT) AS epoch, doc_id, position
FROM ranked WHERE position < 64
ORDER BY epoch, position
"""
    # inverted-index build: df + first-15 postings per term (engine:
    # within-batch dedup is globally exact — one doc per row — then a
    # vocab-bounded driver merge of per-block sorted prefixes)
    out["posting_lists"] = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents),
ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM toks)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CASE WHEN rn <= 15 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM ranked GROUP BY term ORDER BY term
"""
    # two-stage retrieval: BM25 top-50 candidates (identical expression
    # to bm25_topk, LIMIT 50), then exact-cosine rerank of only those
    # candidates against query vector 0, top 10 by (cos desc, doc_id)
    out["rerank_topk"] = """
WITH docs AS (
  SELECT doc_id, lower(text) AS txt,
         CAST(len(regexp_extract_all(text, '\\w+')) AS DOUBLE) AS dl
  FROM documents),
consts AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(dl) / COUNT(*) AS avgdl FROM docs),
terms AS (SELECT unnest(['vector', 'join', 'stream']) AS term),
tf AS (
  SELECT d.doc_id, t.term, d.dl,
         CAST(len(regexp_extract_all(d.txt, '\\b' || t.term || '\\b'))
              AS DOUBLE) AS tf
  FROM docs d CROSS JOIN terms t),
df AS (SELECT term, CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS df FROM tf GROUP BY term),
per_term AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(((c.n_docs - df.df + 0.5) / (df.df + 0.5))
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / c.avgdl))
                    * 1000000) AS BIGINT) AS s6
  FROM tf JOIN df USING (term) CROSS JOIN consts c WHERE tf.tf > 0),
cand AS (
  SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS score6
  FROM per_term GROUP BY doc_id
  ORDER BY score6 DESC, doc_id LIMIT 50),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = 0)
SELECT c.doc_id, c.score6,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
             6) AS cos
FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, q
ORDER BY cos DESC, c.doc_id LIMIT 10
"""
    # lag-based stream throttle: keep an event iff it is the first of
    # its (user, type) key or >= 60 s after the key's previous event
    out["event_throttle"] = """
WITH l AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events)
SELECT event_type,
  CAST(SUM(CASE WHEN gap IS NULL OR gap >= 60000000 THEN 1 ELSE 0 END)
       AS BIGINT) AS kept,
  CAST(SUM(CASE WHEN gap IS NOT NULL AND gap < 60000000 THEN 1 ELSE 0 END)
       AS BIGINT) AS dropped
FROM l GROUP BY event_type ORDER BY event_type
"""
    # per-user time-weighted average (weight = µs to the user's next
    # event); users with zero total weight are excluded
    out["user_twap"] = """
WITH w AS (
  SELECT user_id, value,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dt
  FROM events)
SELECT user_id,
       round(SUM(value * dt) / SUM(dt), 6) AS twap,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM w WHERE dt IS NOT NULL
GROUP BY user_id HAVING SUM(dt) > 0
ORDER BY user_id
"""
    # audience-overlap Jaccard between every two event types'
    # distinct-user sets (types are clock/vocabulary-bounded)
    out["type_affinity"] = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
p AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS co
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2),
s AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1)
SELECT p.ta, p.tb, p.co,
       round(CAST(p.co AS DOUBLE) / (sa.n + sb.n - p.co), 6) AS jaccard
FROM p JOIN s sa ON sa.event_type = p.ta
       JOIN s sb ON sb.event_type = p.tb
ORDER BY ta, tb
"""
    # per-type linear regression of value vs days since 2024-01-01
    # (fixed anchor keeps |x| small so the closed form and DuckDB's
    # stable regr_* agree far below the 1e-6 rounding grid)
    out["regr_by_type"] = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       round(regr_slope(value,
             (epoch_us(ts) - 1704067200000000) / 86400000000.0), 6)
         AS slope,
       round(regr_intercept(value,
             (epoch_us(ts) - 1704067200000000) / 86400000000.0), 6)
         AS icept
FROM events GROUP BY event_type ORDER BY event_type
"""
    # market-basket support: top-100 part pairs co-shipped in ≥ 2 orders
    out["basket_pairs"] = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)
SELECT pa, pb, n FROM p WHERE n >= 2
ORDER BY n DESC, pa, pb LIMIT 100
"""
    # gap-and-islands: longest consecutive-active-day streak per user
    out["user_streaks"] = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
g AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM d),
runs AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM g GROUP BY user_id, grp)
SELECT user_id, MAX(len) AS max_streak,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM runs GROUP BY user_id ORDER BY user_id
"""
    # Benford first-significant-digit audit over exact integer cents
    out["benford_cents"] = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c),
g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / (SELECT SUM(n) FROM g), 6) AS share,
       round(ln(1 + 1.0 / digit) / ln(10), 6) AS expected
FROM g ORDER BY digit
"""
    # fulfillment lag (orderdate → last shipdate) stats by priority
    out["ship_lag"] = """
WITH m AS (
  SELECT l_orderkey, MAX(l_shipdate) AS ms FROM lineitem
  GROUP BY l_orderkey)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(CAST(SUM((epoch_us(ms) - epoch_us(o_orderdate))
                      // 86400000000) AS DOUBLE) / COUNT(*), 6)
         AS avg_lag_days,
       CAST(MAX((epoch_us(ms) - epoch_us(o_orderdate)) // 86400000000)
         AS BIGINT) AS max_lag_days
FROM orders JOIN m ON o_orderkey = l_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
    # first-order Markov transition matrix over the event-type alphabet
    out["event_transitions"] = """
WITH s AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n,
       round(COUNT(*) * 1.0
             / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6) AS p
FROM s WHERE next_type IS NOT NULL
GROUP BY prev_type, next_type ORDER BY prev_type, next_type
"""
    # repeat-purchase gap histogram (days between consecutive orders)
    out["order_intervals"] = """
WITH g AS (
  SELECT (epoch_us(o_orderdate) - lag(epoch_us(o_orderdate)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
           // 86400000000 AS gap
  FROM orders)
SELECT CASE WHEN gap <= 7 THEN '0-7' WHEN gap <= 30 THEN '8-30'
            WHEN gap <= 90 THEN '31-90' WHEN gap <= 365 THEN '91-365'
            ELSE '366+' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(gap) AS BIGINT) AS sum_gap_days
FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1
"""
    # region → nation ROLLUP (exact integer cents; NULL levels → 'ALL')
    out["revenue_rollup"] = """
SELECT COALESCE(r_name, 'ALL') AS r_name,
       COALESCE(n_name, 'ALL') AS n_name,
       round(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100, 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name) ORDER BY r_name, n_name
"""
    # referential-integrity audit over every FK edge of the star schema
    out["fk_orphans"] = """
WITH probes AS (
  SELECT 'lineitem.l_orderkey->orders' AS fk, COUNT(*) AS n_rows,
         SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem.l_partkey->part', COUNT(*),
         SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
         SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
  UNION ALL
  SELECT 'orders.o_custkey->customer', COUNT(*),
         SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'customer.c_nationkey->nation', COUNT(*),
         SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
  UNION ALL
  SELECT 'nation.n_regionkey->region', COUNT(*),
         SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
  FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey)
SELECT fk, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_orphans AS BIGINT) AS n_orphans
FROM probes ORDER BY fk
"""
    # Zipf rank-frequency fit over the top-100 tokens
    out["zipf_slope"] = """
WITH w AS (
  SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY tok),
r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk FROM f
  QUALIFY rnk <= 100)
SELECT CAST(COUNT(*) AS BIGINT) AS k,
       round(regr_slope(ln(n), ln(rnk)), 6) AS zipf_slope,
       round(regr_intercept(ln(n), ln(rnk)), 6) AS zipf_icept
FROM r
"""
    # one-way ANOVA of value across event types (exact 1e-3 integer
    # sufficient statistics; the float close is identical on both sides)
    out["value_anova"] = """
WITH q AS (
  SELECT event_type, CAST(round(value * 1000) AS HUGEINT) AS v
  FROM events),
g AS (
  SELECT event_type, COUNT(*) AS n, SUM(v) AS s1i, SUM(v * v) AS s2i
  FROM q GROUP BY event_type),
p AS (
  SELECT n, CAST(s1i AS DOUBLE) / 1000 AS s1,
         CAST(s2i AS DOUBLE) / 1e6 AS s2
  FROM g),
t AS (
  SELECT SUM(n) AS N, SUM(s1) AS S1, COUNT(*) AS k,
         SUM(s1 * s1 / n) AS a, SUM(s2 - s1 * s1 / n) AS ssw
  FROM p)
SELECT CAST(k AS BIGINT) AS k, CAST(N AS BIGINT) AS n,
       round(((a - S1 * S1 / N) / (k - 1)) / (ssw / (N - k)), 6)
         AS f_stat,
       round((a - S1 * S1 / N) / ((a - S1 * S1 / N) + ssw), 6)
         AS eta_sq
FROM t
"""
    # supplier on-time scorecard (shipped within 90 days of order date)
    out["supplier_ontime"] = """
SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
       round(SUM(CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate)
                        <= 90 * 86400000000 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS ontime_rate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_suppkey ORDER BY l_suppkey
"""
    # weekly DAU/WAU stickiness (Monday-truncated weeks)
    out["stickiness"] = """
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk,
         date_trunc('day', ts) AS day
  FROM events)
SELECT wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
       CAST(COUNT(*) AS BIGINT) AS user_days,
       CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
       round(COUNT(*) * 1.0 / COUNT(DISTINCT day)
             / COUNT(DISTINCT user_id), 6) AS stickiness
FROM d GROUP BY wk ORDER BY wk
"""
    # reciprocity of the derived-web expander (edge formulas + captcha
    # pruning match pipelines/derived.py; self-loops excluded)
    out["graph_reciprocity"] = """
WITH nn AS (SELECT count(*) AS n FROM documents),
e0 AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION
  SELECT doc_id, (13*doc_id+2) % nn.n FROM documents, nn
  WHERE doc_id % 37 != 3
  UNION
  SELECT doc_id, (29*doc_id+5) % nn.n FROM documents, nn
  WHERE doc_id % 37 != 3),
e AS (SELECT src, dst FROM e0 WHERE src != dst),
c AS (
  SELECT (SELECT COUNT(*) FROM e) AS n_edges,
         (SELECT COUNT(*) FROM e a JOIN e b
            ON a.src = b.dst AND a.dst = b.src) AS n_recip)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_recip AS BIGINT) AS n_recip,
       round(n_recip * 1.0 / n_edges, 6) AS reciprocity
FROM c
"""
    # order-size (lines per order) distribution
    out["basket_sizes"] = """
WITH per AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey)
SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM per GROUP BY n_lines ORDER BY n_lines
"""
    # RFM segmentation census (recency anchor 2002-01-01; exact cents)
    out["rfm_segments"] = """
WITH per AS (
  SELECT o_custkey,
         (epoch_us(TIMESTAMP '2002-01-01')
          - epoch_us(MAX(o_orderdate))) // 86400000000 AS rec,
         COUNT(*) AS freq,
         SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS cents
  FROM orders GROUP BY o_custkey),
seg AS (
  SELECT CASE WHEN rec <= 365 AND freq >= 8 THEN 'champion'
              WHEN rec <= 545 AND freq >= 6 THEN 'loyal'
              WHEN rec > 1095 AND freq >= 6 THEN 'at_risk'
              WHEN rec > 1095 THEN 'hibernating'
              ELSE 'regular' END AS segment,
         freq, cents
  FROM per)
SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(SUM(freq) * 1.0 / COUNT(*), 6) AS avg_freq,
       round(CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*), 2)
         AS avg_ltv
FROM seg GROUP BY segment ORDER BY segment
"""
    # leave-one-out 1-NN label accuracy (rounded-6 cosine, vec_id
    # tie-break — the repo-wide ANN ranking convention)
    out["knn_accuracy"] = """
WITH s AS (
  SELECT a.vec_id AS qa, a.label AS la, b.vec_id AS vb, b.label AS lb,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
           AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id),
r AS (
  SELECT qa, la, lb,
         ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cos DESC, vb)
           AS rn
  FROM s)
SELECT la AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS acc
FROM r WHERE rn = 1 GROUP BY la ORDER BY la
"""
    # behavioral × purchase customer-360 (exact integer units)
    out["customer_360"] = """
WITH ev AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(CAST(round(value * 1000) AS HUGEINT)) AS v3
  FROM events GROUP BY user_id),
od AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS cents
  FROM orders GROUP BY o_custkey)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       round(CAST(v3 AS DOUBLE) / 1000.0, 6) AS sum_value,
       CAST(n_orders AS BIGINT) AS n_orders,
       round(CAST(cents AS DOUBLE) / 100.0, 2) AS total_spend
FROM ev JOIN od ON user_id = o_custkey ORDER BY user_id
"""
    # per-host crawl shape (host formula matches derived.py url_of)
    out["host_depth_profile"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
h AS (
  SELECT 'www.synthd' || CAST(node % 3 AS VARCHAR) || '.mx' AS host,
         depth
  FROM mindepth)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(MIN(depth) AS INTEGER) AS min_depth,
       CAST(MAX(depth) AS INTEGER) AS max_depth,
       round(SUM(depth) * 1.0 / COUNT(*), 6) AS avg_depth
FROM h GROUP BY host ORDER BY host
"""
    # captcha-wall incidence per host (captcha formula: doc_id % 37 = 3)
    out["captcha_rate_by_host"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
h AS (
  SELECT 'www.synthd' || CAST(node % 3 AS VARCHAR) || '.mx' AS host,
         CASE WHEN node % 37 = 3 THEN 1 ELSE 0 END AS cap
  FROM mindepth)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(cap) AS BIGINT) AS n_captcha,
       round(SUM(cap) * 1.0 / COUNT(*), 6) AS captcha_rate
FROM h GROUP BY host ORDER BY host
"""
    # corpus composition cross-tab
    out["lang_source_matrix"] = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(SUM(n_chars) * 1.0 / COUNT(*), 6) AS avg_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
"""
    # brand share-of-voice within part type
    out["brand_share"] = """
SELECT p_type, p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(COUNT(*) * 1.0
             / SUM(COUNT(*)) OVER (PARTITION BY p_type), 6) AS share
FROM part GROUP BY p_type, p_brand ORDER BY p_type, p_brand
"""
    # split-leakage audit: user-keyed vs event-keyed 80/20 hash split
    _tr80 = int(0.8 * 2**64)
    out["split_leakage"] = f"""
WITH uu AS (SELECT DISTINCT user_id FROM events),
us AS (
  SELECT CAST(('0x' || substr(md5('split:7:'
           || CAST(user_id AS VARCHAR)), 1, 16)) AS UBIGINT)
         < {_tr80} AS tr
  FROM uu),
ee AS (
  SELECT user_id,
         CAST(('0x' || substr(md5('split:7:'
           || CAST(event_id AS VARCHAR)), 1, 16)) AS UBIGINT)
         < {_tr80} AS tr
  FROM events),
pu AS (
  SELECT user_id, MAX(CASE WHEN tr THEN 1 ELSE 0 END) AS tr,
         MAX(CASE WHEN tr THEN 0 ELSE 1 END) AS te
  FROM ee GROUP BY user_id)
SELECT * FROM (
  SELECT 'by_event' AS scheme,
         CAST(SUM(tr) AS BIGINT) AS n_train_users,
         CAST(SUM(te) AS BIGINT) AS n_test_users,
         CAST(SUM(CASE WHEN tr = 1 AND te = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_leaked
  FROM pu
  UNION ALL
  SELECT 'by_user',
         CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN tr THEN 0 ELSE 1 END) AS BIGINT),
         CAST(0 AS BIGINT)
  FROM us)
ORDER BY scheme
"""
    # activation latency: first event → first purchase, bucketed days
    out["time_to_purchase"] = """
WITH f AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS tp
  FROM events GROUP BY user_id),
b AS (
  SELECT CASE
           WHEN tp IS NULL THEN 'never'
           WHEN (tp - t0) // 86400000000 <= 0 THEN '0_same_day'
           WHEN (tp - t0) // 86400000000 <= 7 THEN '1-7'
           WHEN (tp - t0) // 86400000000 <= 30 THEN '8-30'
           ELSE '31+' END AS bucket
  FROM f)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users
FROM b GROUP BY bucket ORDER BY bucket
"""
    # month-over-month churn (last observed month right-censored)
    out["monthly_churn"] = """
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('month', ts) AS mo FROM events),
j AS (
  SELECT d.mo, n.user_id IS NULL AS churned
  FROM d LEFT JOIN d n
    ON n.user_id = d.user_id AND n.mo = d.mo + INTERVAL 1 MONTH)
SELECT mo AS month, CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
         AS n_churned,
       round(SUM(CASE WHEN churned THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS churn_rate
FROM j WHERE mo < (SELECT MAX(mo) FROM d)
GROUP BY mo ORDER BY mo
"""
    # share of (customer, part) pairs bought in more than one order
    out["repurchase_rate"] = """
WITH p AS (
  SELECT DISTINCT o_custkey AS cust, l_partkey AS part,
         l_orderkey AS ok
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
per AS (SELECT cust, part, COUNT(*) AS n FROM p GROUP BY cust, part)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repurchased,
       round(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS repurchase_rate
FROM per
"""
    # exact revenue share of the top-20 % customers (fixed-point rev4;
    # ties at the boundary value are share-invariant)
    out["pareto_revenue"] = """
WITH r AS (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS x
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1),
s AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, o_custkey) AS rn,
         COUNT(*) OVER () AS n, SUM(CAST(x AS HUGEINT)) OVER () AS tot
  FROM r),
k AS (SELECT CAST(ceil(n / 5.0) AS BIGINT) AS k, n, tot FROM s LIMIT 1)
SELECT CAST(k.n AS BIGINT) AS n_customers, k.k AS k,
       round(CAST(SUM(CASE WHEN s.rn <= k.k THEN CAST(s.x AS HUGEINT)
                           ELSE 0 END) AS DOUBLE) / 10000.0, 2)
         AS top_revenue,
       round(CAST(k.tot AS DOUBLE) / 10000.0, 2) AS total_revenue,
       round(CAST(SUM(CASE WHEN s.rn <= k.k THEN CAST(s.x AS HUGEINT)
                           ELSE 0 END) AS DOUBLE)
             / CAST(k.tot AS DOUBLE), 6) AS share
FROM s, k GROUP BY k.n, k.k, k.tot
"""
    # Efraimidis–Spirakis weighted top-k reservoir (weight = n_chars)
    out["weighted_sample"] = """
WITH h AS (
  SELECT doc_id, n_chars,
         (CAST(CAST(('0x' || substr(md5('wsample:7:'
            || CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS DOUBLE)
          + 0.5) / 18446744073709551616.0 AS u
  FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM h ORDER BY ln(u) / n_chars DESC, doc_id LIMIT 100
"""
    # exponentially decayed counts (half-life 7 d, exact dyadic weights)
    out["decayed_counts"] = """
WITH a AS (
  SELECT event_type,
         least((greatest(0, epoch_us(TIMESTAMP '2024-03-01')
                            - epoch_us(ts)) // 86400000000) // 7, 41)
           AS j
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(CASE WHEN j <= 40
                           THEN (CAST(1 AS HUGEINT) << (40 - j))
                           ELSE 0 END) AS DOUBLE)
             / 1099511627776.0, 6) AS decayed
FROM a GROUP BY event_type ORDER BY event_type
"""
    # integer-exact raw moments -> scale-free skew / excess kurtosis
    out["value_moments"] = """
WITH c AS (
  SELECT event_type, CAST(round(value*100) AS HUGEINT) AS x FROM events),
m AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS s1, SUM(x*x) AS s2, SUM(x*x*x) AS s3,
         SUM(x*x*x*x) AS s4
  FROM c GROUP BY event_type),
cm AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE)/100.0 AS mean,
         n*s2 - s1*s1 AS m2,
         n*n*s3 - 3*n*s2*s1 + 2*s1*s1*s1 AS m3,
         n*n*n*s4 - 4*n*n*s3*s1 + 6*n*s2*s1*s1 - 3*s1*s1*s1*s1 AS m4
  FROM m)
SELECT event_type, CAST(n AS BIGINT) AS n, round(mean, 6) AS mean,
       round(CAST(m3 AS DOUBLE)
             / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))), 6) AS skew,
       round(CAST(m4 AS DOUBLE)
             / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0, 6) AS kurt
FROM cm ORDER BY event_type
"""
    # Shannon entropy of the hour-of-day histogram, 1e-6-quantized terms
    out["hour_entropy"] = """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
t AS (
  SELECT event_type, SUM(c) AS n, COUNT(*) AS hours_seen,
         SUM(CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                        * 1000000) AS BIGINT)) AS q
  FROM c GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(hours_seen AS BIGINT) AS hours_seen,
       round(log2(CAST(n AS DOUBLE))
             - (CAST(q AS DOUBLE)/1000000.0)/CAST(n AS DOUBLE), 6)
         AS entropy
FROM t ORDER BY event_type
"""
    # chi-square independence over the FULL type x dow grid (zero cells
    # included), 1e-6-quantized per-cell terms; dow = (epoch_day+4)%7
    out["chi2_type_dow"] = """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
rt AS (SELECT event_type, SUM(c) AS r FROM c GROUP BY 1),
ct AS (SELECT dow, SUM(c) AS col FROM c GROUP BY 1),
nt AS (SELECT SUM(c) AS n FROM c),
grid AS (
  SELECT rt.event_type, ct.dow, COALESCE(c.c, 0) AS o,
         CAST(rt.r AS DOUBLE) * CAST(ct.col AS DOUBLE)
           / CAST(nt.n AS DOUBLE) AS e
  FROM rt CROSS JOIN ct CROSS JOIN nt
  LEFT JOIN c ON c.event_type = rt.event_type AND c.dow = ct.dow),
q AS (
  SELECT CAST(round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
                    / e * 1000000) AS BIGINT) AS qq
  FROM grid)
SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM c) AS n,
       (SELECT CAST((COUNT(DISTINCT event_type) - 1) AS BIGINT)
               * (SELECT COUNT(DISTINCT dow) - 1 FROM c) FROM c) AS dof,
       round(CAST(SUM(qq) AS DOUBLE) / 1000000.0, 6) AS chi2
FROM q
"""
    # Theil-Sen: median pairwise slope of daily revenue (cents/day)
    out["theil_sen_trend"] = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1),
p AS (
  SELECT CAST(b.rev - a.rev AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
           AS slope
  FROM d a JOIN d b ON b.day > a.day)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(median(slope), 6) AS slope_cents_per_day
FROM p
"""
    # per-nation exact Gini over per-customer revenue (grouped close of
    # the revenue_gini HUGEINT formula; row_number tie splits harmless)
    out["gini_by_nation"] = """
WITH r AS (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS x
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1),
j AS (SELECT c_nationkey AS nk, CAST(x AS HUGEINT) AS x,
             CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY x)
                  AS HUGEINT) AS i
      FROM r JOIN customer ON c_custkey = o_custkey),
t AS (SELECT nk, CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
             sum(i * x) AS six
      FROM j GROUP BY nk)
SELECT n_name, CAST(n AS BIGINT) AS n_customers,
       round(CAST(sx AS DOUBLE) / 10000.0, 2) AS total_rev,
       CAST((2 * six - (n + 1) * sx) * 1000000 // (n * sx) AS BIGINT)
         AS gini6
FROM t JOIN nation ON n_nationkey = nk ORDER BY n_name
"""
    # Pearson correlation of (deg(src), deg(dst)) over directed edges,
    # integer-exact sums closed with the identical expression tree
    out["degree_assortativity"] = _EDGES_CTE + """,
ind AS (SELECT dst, count(*) AS c FROM edges GROUP BY dst),
deg AS (
  SELECT d.doc_id,
         CAST(CASE WHEN d.doc_id % 37 = 3 THEN 0 ELSE 3 END
              + COALESCE(ind.c, 0) AS HUGEINT) AS dd
  FROM documents d LEFT JOIN ind ON ind.dst = d.doc_id),
ed AS (
  SELECT a.dd AS x, b.dd AS y
  FROM edges e JOIN deg a ON a.doc_id = e.src
               JOIN deg b ON b.doc_id = e.dst),
t AS (SELECT CAST(count(*) AS HUGEINT) AS m, sum(x) AS sx, sum(y) AS sy,
             sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      FROM ed)
SELECT CAST(m AS BIGINT) AS n_edges,
       round(CAST(m*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(m*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(m*syy - sy*sy AS DOUBLE))), 6)
         AS assortativity
FROM t
"""
    # CUSUM change-point: argmax_k |n*S_k - k*T| over daily cents
    out["cusum_drift"] = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  SUM(CAST(round(value*100) AS BIGINT)) AS x
           FROM events GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS tot FROM d),
w AS (SELECT day,
             CAST(SUM(x) OVER (ORDER BY day) AS HUGEINT) AS sk,
             CAST(row_number() OVER (ORDER BY day) AS HUGEINT) AS k
      FROM d),
c AS (SELECT day, abs(t.n * w.sk - w.k * t.tot) AS ad FROM w, t)
SELECT (SELECT CAST(n AS BIGINT) FROM t) AS n_days,
       CAST(day AS BIGINT) AS peak_day,
       round(CAST(ad AS DOUBLE)
             / CAST((SELECT n FROM t) AS DOUBLE) / 100.0, 6) AS peak_dev
FROM c ORDER BY ad DESC, day LIMIT 1
"""
    # lag-1 Pearson autocorrelation of the day-ordered daily series
    out["daily_autocorr"] = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  SUM(CAST(round(value*100) AS BIGINT)) AS x
           FROM events GROUP BY 1),
p AS (SELECT CAST(x AS HUGEINT) AS x,
             CAST(lead(x) OVER (ORDER BY day) AS HUGEINT) AS y
      FROM d QUALIFY y IS NOT NULL),
t AS (SELECT CAST(count(*) AS HUGEINT) AS m, sum(x) AS sx, sum(y) AS sy,
             sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      FROM p)
SELECT CAST(m AS BIGINT) AS n_pairs,
       round(CAST(m*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(m*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(m*syy - sy*sy AS DOUBLE))), 6) AS autocorr
FROM t
"""
    # per-node local clustering coefficient, exact integer floor cc6
    out["local_clustering"] = _EDGES_CTE + """,
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
nbr AS (SELECT a AS v, b AS w FROM und
        UNION ALL SELECT b, a FROM und),
deg AS (SELECT v, count(*) AS d FROM nbr GROUP BY v),
wed AS (SELECT n1.v, n1.w AS x, n2.w AS y
        FROM nbr n1 JOIN nbr n2 ON n1.v = n2.v AND n1.w < n2.w),
tri AS (SELECT wed.v, count(*) AS t
        FROM wed JOIN und ON und.a = wed.x AND und.b = wed.y
        GROUP BY wed.v)
SELECT dd.doc_id, CAST(COALESCE(deg.d, 0) AS BIGINT) AS deg,
       CAST(COALESCE(tri.t, 0) AS BIGINT) AS tri,
       CAST(CASE WHEN COALESCE(deg.d, 0) >= 2
                 THEN 2 * COALESCE(tri.t, 0) * 1000000
                      // (deg.d * (deg.d - 1))
                 ELSE 0 END AS BIGINT) AS cc6
FROM documents dd
LEFT JOIN deg ON deg.v = dd.doc_id
LEFT JOIN tri ON tri.v = dd.doc_id
ORDER BY dd.doc_id
"""
    # one-pass Poisson(1) bootstrap: md5-uniform vs hardcoded inverse-
    # CDF thresholds (floor(CDF_k*2^64), truncated), replicate means
    # quantized to 1e-6 before the exact integer variance close
    out["poisson_bootstrap"] = """
WITH ev AS (SELECT event_id, event_type,
                   CAST(round(value*100) AS BIGINT) AS x FROM events),
r AS (SELECT ev.*, bs.b
      FROM ev CROSS JOIN (SELECT unnest(range(32)) AS b) bs),
h AS (SELECT event_type, b, x,
        CAST(('0x' || substr(md5('boot:' || CAST(b AS VARCHAR) || ':'
             || CAST(event_id AS VARCHAR)), 1, 16)) AS UBIGINT) AS u
      FROM r),
w AS (SELECT event_type, b, x,
        (CASE WHEN u >= 6786177901268885274 THEN 1 ELSE 0 END)
      + (CASE WHEN u >= 13572355802537770549 THEN 1 ELSE 0 END)
      + (CASE WHEN u >= 16965444753172213186 THEN 1 ELSE 0 END)
      + (CASE WHEN u >= 18096474403383694065 THEN 1 ELSE 0 END)
      + (CASE WHEN u >= 18379231815936564285 THEN 1 ELSE 0 END)
      + (CASE WHEN u >= 18435783298447138329 THEN 1 ELSE 0 END)
      + (CASE WHEN u >= 18445208545532234003 THEN 1 ELSE 0 END)
      + (CASE WHEN u >= 18446555009401533385 THEN 1 ELSE 0 END)
      + (CASE WHEN u >= 18446723317385195808 THEN 1 ELSE 0 END) AS w
      FROM h),
agg AS (SELECT event_type, b, SUM(w) AS sw, SUM(w*x) AS swx,
               COUNT(*) AS n
        FROM w GROUP BY 1, 2),
q AS (SELECT event_type, n,
             CAST(round(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE)
                        / 100.0 * 1000000.0) AS HUGEINT) AS q
      FROM agg),
t AS (SELECT event_type, MAX(n) AS n, SUM(q) AS sq, SUM(q*q) AS sqq
      FROM q GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(CAST(sq AS DOUBLE) / 32.0 / 1000000.0, 6) AS boot_mean,
       round(sqrt(CAST(32*sqq - sq*sq AS DOUBLE) / 992.0)
             / 1000000.0, 6) AS boot_se
FROM t ORDER BY event_type
"""
    # exact two-sample KS: max_v |n2*C1(v) - n1*C2(v)|, floor d6
    out["ks_test"] = """
WITH v AS (
  SELECT CAST(round(value*100) AS BIGINT) AS v,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
t AS (SELECT CAST(SUM(c1) AS HUGEINT) AS n1,
             CAST(SUM(c2) AS HUGEINT) AS n2 FROM v),
w AS (SELECT v, CAST(SUM(c1) OVER (ORDER BY v) AS HUGEINT) AS a,
             CAST(SUM(c2) OVER (ORDER BY v) AS HUGEINT) AS b FROM v),
d AS (SELECT v, abs(t.n2 * w.a - t.n1 * w.b) AS dev FROM w, t)
SELECT (SELECT CAST(n1 AS BIGINT) FROM t) AS n1,
       (SELECT CAST(n2 AS BIGINT) FROM t) AS n2,
       CAST(v AS BIGINT) AS at_cents,
       CAST(dev * 1000000
            // ((SELECT n1 FROM t) * (SELECT n2 FROM t)) AS BIGINT) AS d6
FROM d ORDER BY dev DESC, v LIMIT 1
"""
    # per-source KL(source ‖ corpus) over unigram counts, 1e-6-quantized
    out["source_kl"] = """
WITH w AS (SELECT source, unnest(string_split(trim(text), ' ')) AS tok
           FROM documents),
st AS (SELECT source, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
g AS (SELECT tok, SUM(c) AS ct FROM st GROUP BY 1),
ns AS (SELECT source, SUM(c) AS n FROM st GROUP BY 1),
tot AS (SELECT SUM(c) AS nn FROM st),
q AS (SELECT st.source, ns.n,
        CAST(round(CAST(st.c AS DOUBLE)
             * log2(CAST(st.c AS DOUBLE) * CAST(tot.nn AS DOUBLE)
                    / (CAST(ns.n AS DOUBLE) * CAST(g.ct AS DOUBLE)))
             * 1000000) AS BIGINT) AS qq
      FROM st JOIN g USING (tok) JOIN ns USING (source) CROSS JOIN tot)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_tokens,
       round(CAST(SUM(qq) AS DOUBLE) / 1000000.0
             / CAST(MAX(n) AS DOUBLE), 6) AS kl_bits
FROM q GROUP BY source ORDER BY source
"""
    # top-16 corpus vocabulary coverage per source (ties -> token asc)
    out["vocab_coverage"] = """
WITH w AS (SELECT source, unnest(string_split(trim(text), ' ')) AS tok
           FROM documents),
st AS (SELECT source, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
v AS (SELECT tok FROM (SELECT tok, SUM(c) AS ct FROM st GROUP BY 1)
      ORDER BY ct DESC, tok LIMIT 16),
agg AS (
  SELECT source, SUM(c) AS n,
         SUM(CASE WHEN tok IN (SELECT tok FROM v) THEN c ELSE 0 END)
           AS inv
  FROM st GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n_tokens,
       CAST(inv AS BIGINT) AS in_vocab,
       round(CAST(inv AS DOUBLE) / CAST(n AS DOUBLE), 6) AS coverage
FROM agg ORDER BY source
"""
    # Kaplan-Meier over reorder gaps; censored tails to global max day;
    # survival product closed in 1e-9-quantized log space
    out["km_reorder"] = """
WITH o AS (SELECT o_custkey,
                  epoch_us(o_orderdate) // 86400000000 AS d FROM orders),
mx AS (SELECT MAX(d) AS dmax FROM o),
g AS (SELECT d - lag(d) OVER (PARTITION BY o_custkey ORDER BY d) AS t
      FROM o),
ev AS (SELECT t FROM g WHERE t IS NOT NULL),
cen AS (SELECT mx.dmax - MAX(o.d) AS t
        FROM o, mx GROUP BY o.o_custkey, mx.dmax),
obs AS (SELECT t, 1 AS e FROM ev UNION ALL SELECT t, 0 FROM cen),
cnt AS (SELECT t, SUM(e) AS died, COUNT(*) - SUM(e) AS cens
        FROM obs GROUP BY t),
w AS (SELECT t, died,
             (SELECT COUNT(*) FROM obs)
             - COALESCE(SUM(died + cens) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n
      FROM cnt),
k AS (SELECT t, died, n,
             CAST(round(ln(CAST(n - died AS DOUBLE) / CAST(n AS DOUBLE))
                        * 1000000000) AS BIGINT) AS q
      FROM w WHERE died > 0 AND n > died)
SELECT CAST(t AS BIGINT) AS gap_days, CAST(died AS BIGINT) AS died,
       CAST(n AS BIGINT) AS at_risk,
       round(exp(CAST(SUM(q) OVER (ORDER BY t) AS DOUBLE)
                 / 1000000000.0), 6) AS km
FROM k ORDER BY gap_days
"""
    # SCD-2 tier intervals via gaps-and-islands (open tail -> -1)
    out["scd2_user_tier"] = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
                  CASE WHEN value < 10 THEN 'low'
                       WHEN value < 100 THEN 'mid'
                       ELSE 'high' END AS tier
           FROM events),
o AS (SELECT *, CASE WHEN lag(tier) OVER
                  (PARTITION BY user_id ORDER BY t, event_id)
                  IS DISTINCT FROM tier THEN 1 ELSE 0 END AS chg
      FROM e),
g AS (SELECT *, SUM(chg) OVER
        (PARTITION BY user_id ORDER BY t, event_id) AS grp FROM o),
r AS (SELECT user_id, tier, grp, MIN(t) AS valid_from_us,
             COUNT(*) AS n_events
      FROM g GROUP BY user_id, tier, grp)
SELECT user_id, tier, valid_from_us,
       COALESCE(lead(valid_from_us) OVER
                (PARTITION BY user_id ORDER BY valid_from_us), -1)
         AS valid_to_us,
       CAST(n_events AS BIGINT) AS n_events
FROM r ORDER BY user_id, valid_from_us
"""
    # 3 rounds of integer-floor damped PageRank (w' = 150000 +
    # sum((85*w)//300) over in-edges; dangling mass drains)
    out["pagerank_damped"] = _EDGES_CTE + """,
w0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS w
       FROM documents),
w1 AS (SELECT d.doc_id AS node,
              150000 + COALESCE(SUM((85 * w0.w) // 300), 0) AS w
       FROM documents d
       LEFT JOIN edges e ON e.dst = d.doc_id
       LEFT JOIN w0 ON w0.node = e.src
       GROUP BY d.doc_id),
w2 AS (SELECT d.doc_id AS node,
              150000 + COALESCE(SUM((85 * w1.w) // 300), 0) AS w
       FROM documents d
       LEFT JOIN edges e ON e.dst = d.doc_id
       LEFT JOIN w1 ON w1.node = e.src
       GROUP BY d.doc_id),
w3 AS (SELECT d.doc_id AS node,
              150000 + COALESCE(SUM((85 * w2.w) // 300), 0) AS w
       FROM documents d
       LEFT JOIN edges e ON e.dst = d.doc_id
       LEFT JOIN w2 ON w2.node = e.src
       GROUP BY d.doc_id)
SELECT node AS doc_id, CAST(w AS BIGINT) AS pr
FROM w3 ORDER BY doc_id
"""
    # item-item CF over the top-50 parts: best cosine co-purchase match
    out["item_cf"] = """
WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
cnt AS (SELECT p, COUNT(*) AS n FROM cp GROUP BY p),
v AS (SELECT p, n FROM cnt ORDER BY n DESC, p LIMIT 50),
pr AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cab
       FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
       WHERE a.p IN (SELECT p FROM v) AND b.p IN (SELECT p FROM v)
       GROUP BY 1, 2),
sym AS (SELECT pa, pb, cab FROM pr
        UNION ALL SELECT pb, pa, cab FROM pr),
sc AS (SELECT s.pa, s.pb, va.n,
              CAST(s.cab AS DOUBLE)
              / sqrt(CAST(va.n AS DOUBLE) * CAST(vb.n AS DOUBLE)) AS cos
       FROM sym s JOIN v va ON va.p = s.pa JOIN v vb ON vb.p = s.pb)
SELECT pa AS part, CAST(n AS BIGINT) AS n_cust, pb AS best_match,
       round(cos, 6) AS cos6
FROM sc
QUALIFY row_number() OVER (PARTITION BY pa ORDER BY cos DESC, pb) = 1
ORDER BY part
"""
    # cohort LTV: first-order-month cohorts x account age, exact cents
    out["ltv_cohorts"] = """
WITH o AS (SELECT o_custkey,
                  (year(o_orderdate) - 1992) * 12 + month(o_orderdate)
                    - 1 AS m,
                  CAST(round(o_totalprice*100) AS BIGINT) AS c
           FROM orders),
coh AS (SELECT o_custkey, MIN(m) AS cohort FROM o GROUP BY 1),
rv AS (SELECT coh.cohort, o.m - coh.cohort AS age, SUM(o.c) AS cents
       FROM o JOIN coh USING (o_custkey) GROUP BY 1, 2)
SELECT CAST(cohort AS BIGINT) AS cohort, CAST(age AS BIGINT) AS age,
       round(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
       round(CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY age)
                  AS DOUBLE) / 100.0, 2) AS cum_revenue
FROM rv ORDER BY cohort, age
"""
    # per-dimension embedding mean/std via 1e-6-quantized moments
    out["embedding_dim_stats"] = """
WITH u AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS HUGEINT) AS q
  FROM embeddings),
t AS (SELECT dim, CAST(COUNT(*) AS HUGEINT) AS n, SUM(q) AS sq,
             SUM(q*q) AS sqq
      FROM u GROUP BY dim)
SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
       round(CAST(sq AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE), 6)
         AS mean,
       round(sqrt(CAST(n*sqq - sq*sq AS DOUBLE)
                  / CAST(n*(n-1) AS DOUBLE)) / 1000000.0, 6) AS std
FROM t ORDER BY dim
"""
    # Gopher-style composite quality gate; ratio rules as integer
    # cross-multiplications, per-rule fail flags
    en_alt = "|".join(_MARKERS["en"])
    out["gopher_filter"] = f"""
WITH c AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\\w+')) AS n_words,
         length(text) - len(regexp_extract_all(text, '\\W'))
           AS word_chars,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(lower(text), '\\b({en_alt})\\b'))
           AS n_stop
  FROM documents),
f AS (
  SELECT doc_id, n_words,
    CASE WHEN n_words < 10 OR n_words > 10000 THEN 1 ELSE 0 END
      AS fail_words,
    CASE WHEN word_chars < 3*n_words OR word_chars > 10*n_words
         THEN 1 ELSE 0 END AS fail_wordlen,
    CASE WHEN 10*n_punct >= n_chars THEN 1 ELSE 0 END AS fail_symbol,
    CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS fail_stop,
    CASE WHEN 5*n_digit >= n_chars THEN 1 ELSE 0 END AS fail_digit
  FROM c)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(fail_words AS BIGINT) AS fail_words,
       CAST(fail_wordlen AS BIGINT) AS fail_wordlen,
       CAST(fail_symbol AS BIGINT) AS fail_symbol,
       CAST(fail_stop AS BIGINT) AS fail_stop,
       CAST(fail_digit AS BIGINT) AS fail_digit,
       CAST(CASE WHEN fail_words + fail_wordlen + fail_symbol
                      + fail_stop + fail_digit = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM f ORDER BY doc_id
"""
    # BPE-ish tokens per whitespace word, per language
    out["token_fertility"] = f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
         AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_ISH}'))) AS BIGINT)
         AS bpe_tokens,
       round(CAST(SUM(len(regexp_extract_all(text, '{_BPE_ISH}')))
                  AS DOUBLE)
             / CAST(SUM(len(regexp_extract_all(text, '\\S+')))
                    AS DOUBLE), 6) AS fertility
FROM documents GROUP BY lang ORDER BY lang
"""
    # trailing 7-day windowed MEDIAN of daily revenue (exact cents)
    out["rolling_median_revenue"] = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev
           FROM orders GROUP BY 1)
SELECT CAST(day AS BIGINT) AS day,
       round(CAST(rev AS DOUBLE) / 100.0, 2) AS revenue,
       round(CAST(median(rev) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 100.0, 2) AS med7
FROM d ORDER BY day
"""
    # per-host out-link locality (host = doc_id % 3 by construction)
    out["host_link_locality"] = _EDGES_CTE + """
SELECT CAST(src % 3 AS BIGINT) AS host,
       CAST(SUM(CASE WHEN src % 3 = dst % 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS internal,
       CAST(COUNT(*) AS BIGINT) AS total,
       round(CAST(SUM(CASE WHEN src % 3 = dst % 3 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS locality
FROM edges GROUP BY 1 ORDER BY 1
"""
    # content-defined chunking dedup: boundary where md5(trailing
    # 8-gram) % 32 == 0; distinct chunks keyed by md5 on both sides
    out["cdc_dedup"] = """
WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents
           WHERE length(text) > 0),
pos AS (SELECT doc_id, text, L, unnest(range(8, L + 1)) AS i FROM d),
b AS (SELECT doc_id, i FROM pos
      WHERE CAST(('0x' || substr(md5(substr(text, i - 7, 8)), 1, 16))
                 AS UBIGINT) % 32 = 0),
bb AS (SELECT doc_id, CAST(i AS BIGINT) AS i FROM b
       UNION SELECT doc_id, L FROM d),
seg AS (SELECT doc_id,
               COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0)
                 AS s, i AS e
        FROM bb),
chunks AS (SELECT substr(text, CAST(s + 1 AS BIGINT),
                         CAST(e - s AS BIGINT)) AS ch
           FROM seg JOIN d USING (doc_id) WHERE e > s),
dis AS (SELECT md5(ch) AS h, MAX(length(ch)) AS len
        FROM chunks GROUP BY 1)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM chunks) AS total_chunks,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dis) AS distinct_chunks,
       (SELECT CAST(SUM(length(ch)) AS BIGINT) FROM chunks)
         AS total_bytes,
       (SELECT CAST(SUM(len) AS BIGINT) FROM dis) AS distinct_bytes,
       round(1.0 - CAST((SELECT SUM(len) FROM dis) AS DOUBLE)
                   / CAST((SELECT SUM(length(ch)) FROM chunks)
                          AS DOUBLE), 6) AS dedup_ratio
"""
    # day-over-day active-user Jaccard (consecutive calendar days only)
    out["day_jaccard"] = """
WITH ud AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d FROM events),
act AS (SELECT d, COUNT(*) AS a FROM ud GROUP BY d),
itr AS (SELECT a.d, COUNT(*) AS i
        FROM ud a JOIN ud b ON b.user_id = a.user_id
                          AND b.d = a.d + 1
        GROUP BY a.d)
SELECT CAST(x.d AS BIGINT) AS day,
       CAST(x.a AS BIGINT) AS active,
       CAST(y.a AS BIGINT) AS next_active,
       CAST(COALESCE(itr.i, 0) AS BIGINT) AS intersect,
       round(CAST(COALESCE(itr.i, 0) AS DOUBLE)
             / CAST(x.a + y.a - COALESCE(itr.i, 0) AS DOUBLE), 6)
         AS jaccard
FROM act x JOIN act y ON y.d = x.d + 1
LEFT JOIN itr ON itr.d = x.d
ORDER BY day
"""
    # Hamilton largest-remainder apportionment of 1000 crawl slots
    out["slot_apportionment"] = """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
t AS (SELECT SUM(n) AS tot FROM c),
b AS (SELECT source, n, (1000 * n) // t.tot AS base,
             (1000 * n) % t.tot AS rem
      FROM c, t),
lo AS (SELECT 1000 - SUM(base) AS k FROM b),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM b)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(base + CASE WHEN rk <= (SELECT k FROM lo)
                        THEN 1 ELSE 0 END AS BIGINT) AS slots
FROM r ORDER BY source
"""
    # IVM: base+delta additive merge equals the full recompute
    out["ivm_daily_counts"] = """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS total
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""
    # Qn-style scale: ceil(m/4)-th smallest pairwise |diff| of daily
    # revenue cents — an exact integer order statistic
    out["qn_scale"] = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev
           FROM orders GROUP BY 1),
p AS (SELECT abs(b.rev - a.rev) AS ad
      FROM d a JOIN d b ON b.day > a.day),
t AS (SELECT (SELECT COUNT(*) FROM d) AS nd, COUNT(*) AS m FROM p)
SELECT CAST(t.nd AS BIGINT) AS n_days, CAST(t.m AS BIGINT) AS n_pairs,
       CAST((t.m + 3) // 4 AS BIGINT) AS k,
       round(CAST((SELECT ad FROM p ORDER BY ad
                   LIMIT 1 OFFSET ((SELECT (m + 3) // 4 FROM t) - 1))
                  AS DOUBLE) / 100.0, 2) AS qn
FROM t
"""
    # 2nd-order Markov: (prev2, prev1) -> next counts + conditionals
    out["markov2_transitions"] = """
WITH o AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
           FROM events),
tri AS (SELECT a.event_type AS prev2, b.event_type AS prev1,
               c.event_type AS next_type, COUNT(*) AS n
        FROM o a JOIN o b ON b.user_id = a.user_id AND b.rn = a.rn + 1
                 JOIN o c ON c.user_id = a.user_id AND c.rn = a.rn + 2
        GROUP BY 1, 2, 3)
SELECT prev2, prev1, next_type, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev2, prev1) AS DOUBLE),
             6) AS p
FROM tri ORDER BY prev2, prev1, next_type
"""
    # exact Spearman via DOUBLED average ranks (integers even w/ ties)
    out["spearman_value_k"] = """
WITH e AS (SELECT CAST(round(value*100) AS BIGINT) AS v,
                  COALESCE(CAST(json_extract(props, '$.k') AS BIGINT),
                           -1) AS k
           FROM events),
hv AS (SELECT v, COUNT(*) AS c FROM e GROUP BY v),
rv AS (SELECT v, CAST(2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1
                      AS HUGEINT) AS r2 FROM hv),
hk AS (SELECT k, COUNT(*) AS c FROM e GROUP BY k),
rk AS (SELECT k, CAST(2 * (SUM(c) OVER (ORDER BY k) - c) + c + 1
                      AS HUGEINT) AS r2 FROM hk),
j AS (SELECT v, k, CAST(COUNT(*) AS HUGEINT) AS c FROM e GROUP BY 1, 2),
t AS (SELECT SUM(c) AS n, SUM(c * rv.r2) AS sx, SUM(c * rk.r2) AS sy,
             SUM(c * rv.r2 * rk.r2) AS sxy,
             SUM(c * rv.r2 * rv.r2) AS sxx,
             SUM(c * rk.r2 * rk.r2) AS syy
      FROM j JOIN rv USING (v) JOIN rk USING (k))
SELECT CAST(n AS BIGINT) AS n,
       round(CAST(n*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS spearman
FROM t
"""
    # clicks->purchases cross-correlation at day lags 0..7 over the
    # DENSE day grid (absent days count 0)
    out["lag_xcorr"] = """
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS c,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS p
           FROM events WHERE event_type IN ('click', 'purchase')),
d AS (SELECT day, SUM(c) AS c, SUM(p) AS p FROM e GROUP BY day),
span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
grid AS (SELECT unnest(range(lo, hi + 1)) AS day FROM span),
g AS (SELECT grid.day, CAST(COALESCE(d.c, 0) AS HUGEINT) AS c,
             CAST(COALESCE(d.p, 0) AS HUGEINT) AS p
      FROM grid LEFT JOIN d USING (day)),
l AS (SELECT unnest(range(8)) AS lag),
pairs AS (SELECT l.lag, a.c AS x, b.p AS y
          FROM l JOIN g a ON TRUE JOIN g b ON b.day = a.day + l.lag),
t AS (SELECT lag, CAST(COUNT(*) AS HUGEINT) AS m, SUM(x) AS sx,
             SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
             SUM(y*y) AS syy
      FROM pairs GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, CAST(m AS BIGINT) AS n_days,
       round(CAST(m*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(m*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(m*syy - sy*sy AS DOUBLE))), 6) AS xcorr
FROM t ORDER BY lag
"""
    # link prediction: top-20 non-adjacent pairs by common neighbors
    out["common_neighbors"] = _EDGES_CTE + """,
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst),
adj AS (SELECT a AS v, b AS w FROM e UNION ALL SELECT b, a FROM e),
wed AS (SELECT a1.w AS x, a2.w AS y, CAST(count(*) AS BIGINT) AS cn
        FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.w < a2.w
        GROUP BY 1, 2),
nonadj AS (SELECT x AS a, y AS b, cn FROM wed
           WHERE NOT EXISTS (SELECT 1 FROM e
                             WHERE e.a = wed.x AND e.b = wed.y))
SELECT a, b, cn FROM nonadj ORDER BY cn DESC, a, b LIMIT 20
"""
    # doubled average ranks (2·avg = 2·min_rank + ties − 1) keep the
    # tie-corrected rank-sum integer-exact on both sides
    out["mann_whitney"] = """
WITH e AS (SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v3
           FROM events WHERE event_type IN ('click', 'purchase')),
r AS (SELECT event_type,
             2 * rank() OVER (ORDER BY v3)
               + CAST(count(*) OVER (PARTITION BY v3) AS BIGINT) - 1 AS r2
      FROM e),
s AS (SELECT CAST(sum(CASE WHEN event_type = 'click' THEN r2 END)
                  AS BIGINT) AS r1x2,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(count(*) AS BIGINT) AS nt
      FROM r)
SELECT n1, nt - n1 AS n2,
       r1x2 - n1 * (n1 + 1) AS u1_x2,
       2 * n1 * (nt - n1) - (r1x2 - n1 * (n1 + 1)) AS u2_x2,
       round((2 * (r1x2 - n1 * (n1 + 1)) - 2 * n1 * (nt - n1))
             / (2.0 * n1 * (nt - n1)), 6) AS rb
FROM s
"""
    # per-term 1e-6 quantization before the sum (the source_kl move)
    out["mutual_info"] = """
WITH c AS (SELECT event_type AS et,
                  (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                  count(*) AS c
           FROM events GROUP BY 1, 2),
m1 AS (SELECT et, SUM(c) AS ni FROM c GROUP BY 1),
m2 AS (SELECT dow, SUM(c) AS nj FROM c GROUP BY 1),
nt AS (SELECT SUM(c) AS n FROM c),
t AS (SELECT CAST(round(CAST(c.c AS DOUBLE)
               * log2(CAST(c.c AS DOUBLE) * CAST(nt.n AS DOUBLE)
                      / (CAST(m1.ni AS DOUBLE) * CAST(m2.nj AS DOUBLE)))
               * 1000000) AS BIGINT) AS q
      FROM c JOIN m1 USING (et) JOIN m2 USING (dow) CROSS JOIN nt)
SELECT (SELECT CAST(n AS BIGINT) FROM nt) AS n,
       round(CAST(SUM(q) AS DOUBLE) / 1000000.0
             / (SELECT CAST(n AS DOUBLE) FROM nt), 6) AS mi_bits
FROM t
"""
    # lower weighted median: smallest price with 2·cumweight ≥ total
    out["weighted_median"] = """
WITH h AS (SELECT l_returnflag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS pc_,
                  CAST(l_quantity AS BIGINT) AS w
           FROM lineitem),
g AS (SELECT l_returnflag, pc_, SUM(w) AS w FROM h GROUP BY 1, 2),
c AS (SELECT l_returnflag, pc_,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY pc_) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM g)
SELECT l_returnflag, CAST(min(tw) AS BIGINT) AS total_weight,
       CAST(min(pc_) AS BIGINT) AS wmedian_cents
FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag ORDER BY l_returnflag
"""
    # cross-parity contamination: incoming (odd id) vs reference (even
    # id) exact 3-gram Jaccard; planted tails at +20001 flip parity
    out["cross_dedup"] = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 20001, text || ' extra tail token appended'
  FROM documents WHERE doc_id < 10),
words AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
          FROM aug),
grams AS (SELECT doc_id,
  CASE WHEN len(ws) <= 3 THEN [array_to_string(ws, ' ')]
       ELSE list_transform(range(1, len(ws)-1),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
  END AS gs FROM words),
gsets AS (SELECT doc_id, list_distinct(gs) AS gs FROM grams),
pairs AS (SELECT n.doc_id AS new_id, r.doc_id AS ref_id,
  len(list_intersect(n.gs, r.gs)) * 1.0
    / len(list_distinct(n.gs || r.gs)) AS j
  FROM gsets n JOIN gsets r
    ON n.doc_id % 2 = 1 AND r.doc_id % 2 = 0),
hits AS (SELECT new_id, ref_id, j,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY j DESC, ref_id) AS rn
         FROM pairs WHERE j >= 0.6)
SELECT new_id AS doc_id, ref_id, round(j, 6) AS j
FROM hits WHERE rn = 1 ORDER BY doc_id
"""
    # directed BFS from doc 0; UNION-dedup recursion capped at 64
    # rounds on both sides (≫ the ~log₃(n) diameter)
    out["bfs_distances"] = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3),
bfs(node, dist) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, bfs.dist + 1
  FROM bfs JOIN edges e ON e.src = bfs.node
  WHERE bfs.dist < 64),
d AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
SELECT doc_id, CAST(COALESCE(d.dist, -1) AS BIGINT) AS dist
FROM documents LEFT JOIN d ON d.node = doc_id ORDER BY doc_id
"""
    # Adamic-Adar: wedge terms quantized to round(1e6/log2(deg)) so
    # per-pair scores close in exact integer sums
    out["adamic_adar"] = _EDGES_CTE + """,
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst),
adj AS (SELECT a AS v, b AS w FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
wed AS (SELECT a1.w AS x, a2.w AS y,
               SUM(CAST(round(1000000.0 / log2(CAST(deg.d AS DOUBLE)))
                        AS BIGINT)) AS aa6
        FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.w < a2.w
        JOIN deg ON deg.v = a1.v
        GROUP BY 1, 2),
nonadj AS (SELECT x AS a, y AS b, aa6 FROM wed
           WHERE NOT EXISTS (SELECT 1 FROM e
                             WHERE e.a = wed.x AND e.b = wed.y))
SELECT a, b, CAST(aa6 AS BIGINT) AS aa6
FROM nonadj ORDER BY aa6 DESC, a, b LIMIT 20
"""
    # whole-second same-user same-type gaps; population sigma;
    # B = (sigma-mu)/(sigma+mu) is one float expression on both sides
    out["burstiness"] = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts)) // 1000000
           AS gap_s
  FROM events),
h AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL),
s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             SUM(CAST(gap_s AS HUGEINT)) AS sg,
             SUM(CAST(gap_s AS HUGEINT) * CAST(gap_s AS HUGEINT)) AS sg2
      FROM h GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       round((sqrt(CAST(n*sg2 - sg*sg AS DOUBLE)) / CAST(n AS DOUBLE)
              - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
             / (sqrt(CAST(n*sg2 - sg*sg AS DOUBLE)) / CAST(n AS DOUBLE)
                + CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         AS burstiness
FROM s ORDER BY event_type
"""
    # Welch t from exact HUGEINT moments; identical float tree
    out["welch_ttest"] = """
WITH e AS (SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v3
           FROM events WHERE event_type IN ('click', 'purchase')),
s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             SUM(CAST(v3 AS HUGEINT)) AS sv,
             SUM(CAST(v3 AS HUGEINT) * CAST(v3 AS HUGEINT)) AS sv2
      FROM e GROUP BY 1),
c AS (SELECT * FROM s WHERE event_type = 'click'),
p AS (SELECT * FROM s WHERE event_type = 'purchase')
SELECT CAST(c.n AS BIGINT) AS n1, CAST(p.n AS BIGINT) AS n2,
  round(CAST(c.sv AS DOUBLE) / CAST(c.n AS DOUBLE) / 1000.0, 6) AS mean1,
  round(CAST(p.sv AS DOUBLE) / CAST(p.n AS DOUBLE) / 1000.0, 6) AS mean2,
  round((CAST(c.sv AS DOUBLE) / CAST(c.n AS DOUBLE)
         - CAST(p.sv AS DOUBLE) / CAST(p.n AS DOUBLE))
        / sqrt(CAST(c.n*c.sv2 - c.sv*c.sv AS DOUBLE)
                 / (CAST(c.n AS DOUBLE) * CAST(c.n - 1 AS DOUBLE))
                 / CAST(c.n AS DOUBLE)
               + CAST(p.n*p.sv2 - p.sv*p.sv AS DOUBLE)
                 / (CAST(p.n AS DOUBLE) * CAST(p.n - 1 AS DOUBLE))
                 / CAST(p.n AS DOUBLE)), 6) AS t
FROM c, p
"""
    # double-sweep: second recursion seeded by the first's argmax
    out["graph_diameter"] = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3),
b0(node, dist) AS (
  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, b0.dist + 1 FROM b0 JOIN edges e ON e.src = b0.node
  WHERE b0.dist < 64),
d0 AS (SELECT node, min(dist) AS dist FROM b0 GROUP BY node),
seed AS (SELECT node, dist FROM d0 ORDER BY dist DESC, node LIMIT 1),
b1(node, dist) AS (
  SELECT (SELECT node FROM seed), CAST(0 AS BIGINT)
  UNION
  SELECT e.dst, b1.dist + 1 FROM b1 JOIN edges e ON e.src = b1.node
  WHERE b1.dist < 64),
d1 AS (SELECT node, min(dist) AS dist FROM b1 GROUP BY node)
SELECT (SELECT node FROM seed) AS sweep_seed,
       (SELECT CAST(dist AS BIGINT) FROM seed) AS ecc0,
       (SELECT CAST(max(dist) AS BIGINT) FROM d1) AS ecc_seed,
       (SELECT node FROM d1 ORDER BY dist DESC, node LIMIT 1)
         AS far_node,
       (SELECT CAST(count(*) AS BIGINT) FROM d1) AS n_reachable
"""
    # CUPED: arms = user parity, pre/post split at the exact epoch
    # midpoint; theta from pooled HUGEINT moments; identical float tree
    out["cuped_uplift"] = """
WITH mid AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
             FROM events),
u AS (SELECT user_id,
             SUM(CASE WHEN epoch_us(ts) < mid.m
                      THEN CAST(round(value * 1000) AS HUGEINT)
                      ELSE 0 END) AS x,
             SUM(CASE WHEN epoch_us(ts) >= mid.m
                      THEN CAST(round(value * 1000) AS HUGEINT)
                      ELSE 0 END) AS y
      FROM events, mid GROUP BY user_id),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(x*y) AS sxy FROM u),
a0 AS (SELECT CAST(count(*) AS HUGEINT) AS n0, SUM(x) AS sx0,
              SUM(y) AS sy0 FROM u WHERE user_id % 2 = 0),
a1 AS (SELECT CAST(count(*) AS HUGEINT) AS n1, SUM(x) AS sx1,
              SUM(y) AS sy1 FROM u WHERE user_id % 2 = 1)
SELECT CAST(a0.n0 AS BIGINT) AS n_a, CAST(a1.n1 AS BIGINT) AS n_b,
  round(CAST(m.n*m.sxy - m.sx*m.sy AS DOUBLE)
        / CAST(m.n*m.sxx - m.sx*m.sx AS DOUBLE), 6) AS theta,
  round((CAST(a1.sy1 AS DOUBLE)/CAST(a1.n1 AS DOUBLE)
         - CAST(a0.sy0 AS DOUBLE)/CAST(a0.n0 AS DOUBLE)) / 1000.0, 6)
    AS uplift_raw,
  round(((CAST(a1.sy1 AS DOUBLE)/CAST(a1.n1 AS DOUBLE)
          - CAST(a0.sy0 AS DOUBLE)/CAST(a0.n0 AS DOUBLE))
         - (CAST(m.n*m.sxy - m.sx*m.sy AS DOUBLE)
            / CAST(m.n*m.sxx - m.sx*m.sx AS DOUBLE))
           * (CAST(a1.sx1 AS DOUBLE)/CAST(a1.n1 AS DOUBLE)
              - CAST(a0.sx0 AS DOUBLE)/CAST(a0.n0 AS DOUBLE)))
        / 1000.0, 6) AS uplift_cuped
FROM m, a0, a1
"""
    # md5-derived micro-degree coords; exact integer squared distance
    out["geo_knn"] = """
WITH g AS (SELECT doc_id,
  CAST(CAST(('0x' || substr(md5('geolat:' || CAST(doc_id AS VARCHAR)),
                            1, 16)) AS UBIGINT) % 180000001 AS BIGINT)
    - 90000000 AS lat_u,
  CAST(CAST(('0x' || substr(md5('geolon:' || CAST(doc_id AS VARCHAR)),
                            1, 16)) AS UBIGINT) % 360000001 AS BIGINT)
    - 180000000 AS lon_u
  FROM documents)
SELECT doc_id, lat_u, lon_u,
       (lat_u - 37774900)*(lat_u - 37774900)
         + (lon_u - (-122419400))*(lon_u - (-122419400)) AS d2
FROM g ORDER BY d2, doc_id LIMIT 10
"""
    # KMV estimate = (k-1)*2^64 // 64th-smallest md5; exact when <k
    out["kmv_distinct"] = """
WITH h AS (SELECT DISTINCT event_type,
  CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 16))
       AS UBIGINT) AS hv
  FROM events),
r AS (SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv)
               AS rn
      FROM h),
k64 AS (SELECT event_type, hv AS hk FROM r WHERE rn = 64),
nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_distinct
       FROM h GROUP BY 1)
SELECT nd.event_type,
       CAST(CASE WHEN k64.hk IS NULL THEN nd.n_distinct
            ELSE CAST((63 * CAST('18446744073709551616' AS HUGEINT))
                      // CAST(k64.hk AS HUGEINT) AS BIGINT)
            END AS BIGINT) AS kmv_est
FROM nd LEFT JOIN k64 USING (event_type) ORDER BY event_type
"""
    # type-token ratio + hapax share as exact integer floors
    out["lexical_richness"] = """
WITH w AS (SELECT source, unnest(string_split(trim(text), ' ')) AS tok
           FROM documents),
st AS (SELECT source, tok, COUNT(*) AS c FROM w GROUP BY 1, 2),
s AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
      FROM st GROUP BY 1)
SELECT source, n_tokens, n_types, n_hapax,
       n_types * 1000000 // n_tokens AS ttr6,
       n_hapax * 1000000 // n_types AS hapax6
FROM s ORDER BY source
"""
    # interval-stacking sweep: +1 at order day, -1 after last ship day
    out["open_orders_daily"] = """
WITH r AS (SELECT l_orderkey AS ok,
                  max(epoch_us(l_shipdate)) // 86400000000 AS rd
           FROM lineitem GROUP BY 1),
o AS (SELECT o_orderkey AS ok,
             epoch_us(o_orderdate) // 86400000000 AS od
      FROM orders),
j AS (SELECT o.od, r.rd FROM o JOIN r USING (ok)),
d AS (SELECT od AS day, CAST(1 AS BIGINT) AS delta FROM j
      UNION ALL SELECT rd + 1, CAST(-1 AS BIGINT) FROM j),
g AS (SELECT day, SUM(delta) AS delta FROM d GROUP BY day)
SELECT CAST(day AS BIGINT) AS day,
       CAST(SUM(delta) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM g ORDER BY day
"""
    # doubled tie-averaged ranks from the milliunit histogram; H, tie
    # factor and corrected H as ×1e6 integer floors (HUGEINT, no float)
    out["kruskal_wallis"] = """
WITH h AS (SELECT event_type, CAST(round(value*1000) AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
tv AS (SELECT v, SUM(c) AS t FROM h GROUP BY 1),
r AS (SELECT v, 2*(SUM(t) OVER (ORDER BY v) - t) + t + 1 AS r2
      FROM tv),
g AS (SELECT event_type, CAST(SUM(h.c * r.r2) AS HUGEINT) AS r2g,
             CAST(SUM(h.c) AS HUGEINT) AS ng
      FROM h JOIN r USING (v) GROUP BY 1),
tot AS (SELECT CAST(SUM(ng) AS HUGEINT) AS n,
               SUM((1000000 * r2g * r2g) // (4 * ng)) AS s6
        FROM g),
tie AS (SELECT CAST(SUM(t*t*t - t) AS HUGEINT) AS tt FROM tv),
cl AS (SELECT n,
              (3 * s6) // (n * (n + 1)) - 3 * (n + 1) * 1000000 AS h6,
              1000000 - (1000000 * tt) // (n*n*n - n) AS tie6
       FROM tot, tie)
SELECT CAST(n AS BIGINT) AS n, CAST(h6 AS BIGINT) AS h6,
       CAST(tie6 AS BIGINT) AS tie6,
       CAST((h6 * 1000000) // tie6 AS BIGINT) AS h_adj6
FROM cl
"""
    # literal O(n²) pair join per type; engine closes the same counts
    # from a 2-D prefix sum over the bounded (v, k) grid
    out["kendall_tau"] = """
WITH e AS (SELECT event_id, event_type,
                  CAST(round(value*1000) AS BIGINT) AS v,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k
           FROM events),
p AS (SELECT a.event_type,
  SUM(CASE WHEN (a.v < b.v AND a.k < b.k)
             OR (a.v > b.v AND a.k > b.k) THEN 1 ELSE 0 END) AS conc,
  SUM(CASE WHEN (a.v < b.v AND a.k > b.k)
             OR (a.v > b.v AND a.k < b.k) THEN 1 ELSE 0 END) AS disc,
  SUM(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS tiev,
  SUM(CASE WHEN a.k = b.k THEN 1 ELSE 0 END) AS tiek,
  CAST(count(*) AS HUGEINT) AS n0
  FROM e a JOIN e b ON a.event_type = b.event_type
                   AND a.event_id < b.event_id
  GROUP BY 1),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM e
      GROUP BY 1)
SELECT p.event_type, n.n, CAST(conc AS BIGINT) AS conc,
       CAST(disc AS BIGINT) AS disc,
       CAST(CASE WHEN (n0 - tiev) * (n0 - tiek) = 0 THEN 0
            ELSE (CAST(conc - disc AS HUGEINT) * abs(conc - disc)
                  * 1000000) // ((n0 - tiev) * (n0 - tiek)) END
            AS BIGINT) AS tau_s6
FROM p JOIN n USING (event_type) ORDER BY event_type
"""
    # eps-gap segmentation of each type's sorted milliunit support
    out["eps_segments"] = """
WITH h AS (SELECT event_type, CAST(round(value*1000) AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
m AS (SELECT *, CASE WHEN v - lag(v) OVER
                       (PARTITION BY event_type ORDER BY v) > 1000
                     OR lag(v) OVER
                       (PARTITION BY event_type ORDER BY v) IS NULL
                THEN 1 ELSE 0 END AS brk
      FROM h),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY event_type ORDER BY v)
                  AS seg
      FROM m),
per AS (SELECT event_type, seg, SUM(c) AS mass, max(v) - min(v) AS span
        FROM s GROUP BY 1, 2)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
       CAST(max(mass) AS BIGINT) AS max_mass,
       CAST(max(span) AS BIGINT) AS max_span
FROM per GROUP BY 1 ORDER BY event_type
"""
    # 3×3 normal equations closed by Cramer's rule in HUGEINT; each
    # coefficient is the ×1e6 trunc-div of two cofactor expansions
    out["ols2_hour_dow"] = """
WITH e AS (SELECT event_type,
  (epoch_us(ts) // 3600000000) % 24 AS h,
  ((epoch_us(ts) // 86400000000) + 4) % 7 AS d,
  CAST(round(value*1000) AS BIGINT) AS v
  FROM events),
m AS (SELECT event_type,
  CAST(count(*) AS HUGEINT) AS n, CAST(SUM(h) AS HUGEINT) AS sh,
  CAST(SUM(d) AS HUGEINT) AS sd, CAST(SUM(h*h) AS HUGEINT) AS shh,
  CAST(SUM(d*d) AS HUGEINT) AS sdd, CAST(SUM(h*d) AS HUGEINT) AS shd,
  CAST(SUM(v) AS HUGEINT) AS sv, CAST(SUM(v*h) AS HUGEINT) AS svh,
  CAST(SUM(v*d) AS HUGEINT) AS svd
  FROM e GROUP BY 1),
c AS (SELECT event_type, n,
  n*(shh*sdd - shd*shd) - sh*(sh*sdd - shd*sd)
    + sd*(sh*shd - shh*sd) AS det,
  sv*(shh*sdd - shd*shd) - sh*(svh*sdd - shd*svd)
    + sd*(svh*shd - shh*svd) AS det0,
  n*(svh*sdd - shd*svd) - sv*(sh*sdd - shd*sd)
    + sd*(sh*svd - svh*sd) AS det1,
  n*(shh*svd - svh*shd) - sh*(sh*svd - svh*sd)
    + sv*(sh*shd - shh*sd) AS det2
  FROM m)
SELECT event_type, CAST(n AS BIGINT) AS n,
  CAST((1000000 * det0) // det AS BIGINT) AS b0_6,
  CAST((1000000 * det1) // det AS BIGINT) AS b_hour6,
  CAST((1000000 * det2) // det AS BIGINT) AS b_dow6
FROM c ORDER BY event_type
"""
    # per-distinct-value Theil terms quantized to 1e-6 before the
    # count-weighted integer sum (the source_kl quantization move)
    out["theil_index"] = """
WITH h AS (SELECT event_type, CAST(round(value*1000) AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, CAST(SUM(v*c) AS BIGINT) AS sum3,
             CAST(SUM(c) AS BIGINT) AS n
      FROM h GROUP BY 1),
t AS (SELECT h.event_type,
  SUM(CAST(round(1000000.0
        * (CAST(h.v AS DOUBLE)
           / (CAST(s.sum3 AS DOUBLE) / CAST(s.n AS DOUBLE)))
        * ln(CAST(h.v AS DOUBLE)
             / (CAST(s.sum3 AS DOUBLE) / CAST(s.n AS DOUBLE))))
      AS BIGINT) * h.c) AS q
  FROM h JOIN s USING (event_type) GROUP BY 1)
SELECT t.event_type, s.n, s.sum3, CAST(t.q // s.n AS BIGINT) AS theil6
FROM t JOIN s USING (event_type) ORDER BY event_type
"""
    # 3-seed recursive-CTE BFS; per-distance terms close as 1e6 // d
    out["harmonic_centrality"] = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3),
indeg AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS c
          FROM edges GROUP BY 1),
seeds AS (SELECT v, c FROM indeg ORDER BY c DESC, v ASC LIMIT 3),
bfs(seed, node, dist) AS (
  SELECT v, v, CAST(0 AS BIGINT) FROM seeds
  UNION
  SELECT bfs.seed, e.dst, bfs.dist + 1
  FROM bfs JOIN edges e ON e.src = bfs.node
  WHERE bfs.dist < 64),
d AS (SELECT seed, node, min(dist) AS dist FROM bfs GROUP BY 1, 2),
hh AS (SELECT seed, CAST(count(*) AS BIGINT) AS n_reach,
              CAST(SUM(1000000 // dist) AS BIGINT) AS h6
       FROM d WHERE dist > 0 GROUP BY 1)
SELECT s.v AS doc_id, s.c AS in_deg,
       CAST(COALESCE(hh.n_reach, 0) AS BIGINT) AS n_reach,
       CAST(COALESCE(hh.h6, 0) AS BIGINT) AS h6
FROM seeds s LEFT JOIN hh ON hh.seed = s.v ORDER BY doc_id
"""
    # squared-cosine trick: (a·b)²·1e6 // (‖a‖²‖b‖²), no sqrt
    out["type_hour_cosine"] = """
WITH g AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS h,
                  CAST(count(*) AS HUGEINT) AS c
           FROM events GROUP BY 1, 2),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             SUM(a.c * b.c) AS dot
      FROM g a JOIN g b ON a.h = b.h
                       AND a.event_type < b.event_type
      GROUP BY 1, 2),
nrm AS (SELECT event_type, SUM(c*c) AS nn FROM g GROUP BY 1)
SELECT p.type_a, p.type_b,
       CAST((dot*dot*1000000) // (na.nn * nb.nn) AS BIGINT) AS cos2_6
FROM p JOIN nrm na ON na.event_type = p.type_a
       JOIN nrm nb ON nb.event_type = p.type_b
ORDER BY 1, 2
"""
    # audience overlap; all pairs emitted even at zero intersection
    out["type_user_jaccard"] = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM du
      GROUP BY 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM du a JOIN du b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT na.event_type AS type_a, nb.event_type AS type_b,
       CAST(COALESCE(p.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(CASE WHEN na.n + nb.n - COALESCE(p.n_inter, 0) = 0 THEN 0
            ELSE COALESCE(p.n_inter, 0) * 1000000
                 // (na.n + nb.n - COALESCE(p.n_inter, 0)) END
            AS BIGINT) AS jac6
FROM n na JOIN n nb ON na.event_type < nb.event_type
LEFT JOIN p ON p.type_a = na.event_type AND p.type_b = nb.event_type
ORDER BY 1, 2
"""
    # ×7-normalized count and value shares per day of week
    out["dow_seasonality"] = """
WITH g AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                  CAST(count(*) AS HUGEINT) AS n,
                  CAST(SUM(CAST(round(value*1000) AS BIGINT))
                       AS HUGEINT) AS s3
           FROM events GROUP BY 1),
t AS (SELECT SUM(n) AS nn, SUM(s3) AS ss FROM g)
SELECT CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
       CAST(n * 7 * 1000000 // t.nn AS BIGINT) AS cnt_idx6,
       CAST(s3 * 7 * 1000000 // t.ss AS BIGINT) AS val_idx6
FROM g, t ORDER BY dow
"""
    # rank-width deciles over exact customer revenue; cumulative share
    out["decile_lift"] = """
WITH r AS (
  SELECT o_custkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS x
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1),
t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx FROM r),
s AS (SELECT CAST(x AS HUGEINT) AS x,
             CAST(row_number() OVER (ORDER BY x) - 1 AS HUGEINT) AS rn
      FROM r),
d AS (SELECT CAST(rn * 10 // t.n AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_cust, SUM(x) AS dsx
      FROM s, t GROUP BY 1),
c AS (SELECT *, SUM(dsx) OVER (ORDER BY decile) AS cum FROM d)
SELECT decile, n_cust, round(CAST(dsx AS DOUBLE)/10000.0, 2) AS rev,
       CAST(cum * 1000000 // t.sx AS BIGINT) AS cum_share6
FROM c, t ORDER BY decile
"""
    # per-nation Herfindahl index of supplier revenue shares
    out["supplier_hhi"] = """
WITH r AS (SELECT l_suppkey,
  sum(CAST(round(l_extendedprice*100) AS BIGINT)
    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS x
  FROM lineitem GROUP BY 1),
j AS (SELECT s_nationkey, CAST(x AS HUGEINT) AS x
      FROM r JOIN supplier ON s_suppkey = l_suppkey),
g AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
             SUM(x) AS sx, SUM(x*x) AS sxx
      FROM j GROUP BY 1)
SELECT n_name, n_suppliers,
       CAST(sxx * 1000000 // (sx*sx) AS BIGINT) AS hhi6
FROM g JOIN nation ON n_nationkey = s_nationkey ORDER BY n_name
"""
    # latest click ≤ purchase within 7 days; daily attributed credit
    out["last_touch_attribution"] = """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tu,
                  CAST(round(value*1000) AS BIGINT) AS v3
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch_us(ts) AS tu FROM events
      WHERE event_type = 'click'),
m AS (SELECT p.event_id, p.tu, p.v3, max(c.tu) AS ctu
      FROM p LEFT JOIN c ON c.user_id = p.user_id
             AND c.tu <= p.tu AND c.tu >= p.tu - 604800000000
      GROUP BY 1, 2, 3)
SELECT CAST(tu // 86400000000 AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_purch,
       CAST(SUM(CASE WHEN ctu IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_attr,
       CAST(SUM(CASE WHEN ctu IS NULL THEN 0 ELSE v3 END) AS BIGINT)
         AS attr_v3
FROM m GROUP BY 1 ORDER BY day
"""
    # edge-weighted avg neighbor in-degree per source in-degree class
    out["knn_degree_spectrum"] = _EDGES_CTE + """,
indeg AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS c
          FROM edges GROUP BY 1),
j AS (SELECT COALESCE(ds.c, 0) AS k, di.c AS nbr
      FROM edges e JOIN indeg di ON di.v = e.dst
      LEFT JOIN indeg ds ON ds.v = e.src)
SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(SUM(nbr) * 1000000 // count(*) AS BIGINT) AS knn6
FROM j GROUP BY 1 ORDER BY k
"""
    # χ² with 1e-6-quantized terms; V² as the pure integer division
    out["brand_type_cramer"] = """
WITH c AS (SELECT p_brand AS b, p_type AS k, COUNT(*) AS c
           FROM part GROUP BY 1, 2),
rt AS (SELECT b, SUM(c) AS r FROM c GROUP BY 1),
ct AS (SELECT k, SUM(c) AS col FROM c GROUP BY 1),
nt AS (SELECT SUM(c) AS n FROM c),
grid AS (SELECT rt.b, ct.k, COALESCE(c.c, 0) AS o,
                CAST(rt.r AS DOUBLE) * CAST(ct.col AS DOUBLE)
                  / CAST(nt.n AS DOUBLE) AS e
         FROM rt CROSS JOIN ct CROSS JOIN nt
         LEFT JOIN c ON c.b = rt.b AND c.k = ct.k),
q AS (SELECT CAST(round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
                        / e * 1000000) AS BIGINT) AS qq
      FROM grid),
dims AS (SELECT (SELECT COUNT(*) FROM rt) AS r,
                (SELECT COUNT(*) FROM ct) AS cc,
                (SELECT CAST(n AS BIGINT) FROM nt) AS n)
SELECT n, CAST(r AS BIGINT) AS r_levels, CAST(cc AS BIGINT) AS c_levels,
       round(CAST((SELECT SUM(qq) FROM q) AS DOUBLE) / 1000000.0, 6)
         AS chi2,
       CAST((SELECT SUM(qq) FROM q) // (n * (least(r, cc) - 1))
            AS BIGINT) AS v2_6
FROM dims
"""
    # char-trigram entropy; terms quantized to 1e-6 (source_kl move)
    out["trigram_entropy"] = """
WITH tri AS (SELECT source,
                    substr(lower(text), CAST(u.i AS INT), 3) AS tri
             FROM documents d,
                  unnest(range(1, length(d.text)-1)) AS u(i)),
g AS (SELECT source, tri, CAST(count(*) AS BIGINT) AS c
      FROM tri GROUP BY 1, 2),
s AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS nd
      FROM g GROUP BY 1),
q AS (SELECT g.source,
             SUM(CAST(round(1000000.0 * CAST(g.c AS DOUBLE)
                 * ln(CAST(s.n AS DOUBLE) / CAST(g.c AS DOUBLE)))
                 AS BIGINT)) AS q
      FROM g JOIN s USING (source) GROUP BY 1)
SELECT q.source, s.n AS n_trigrams, s.nd AS n_distinct,
       CAST(q.q // s.n AS BIGINT) AS h6
FROM q JOIN s USING (source) ORDER BY source
"""
    # fixed milliunit thresholds; floors close exact
    out["value_tail_probs"] = """
WITH e AS (SELECT event_type, CAST(round(value*1000) AS BIGINT) AS v3
           FROM events),
g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN v3 > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
  CAST(SUM(CASE WHEN v3 > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS g10,
  CAST(SUM(CASE WHEN v3 > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS g100
  FROM e GROUP BY 1)
SELECT event_type, n, g1 * 1000000 // n AS p_gt1_6,
       g10 * 1000000 // n AS p_gt10_6,
       g100 * 1000000 // n AS p_gt100_6
FROM g ORDER BY event_type
"""
    # PSI over fixed power-of-two bins between calendar halves
    out["psi_drift"] = """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  CAST(round(value*1000) AS BIGINT) AS v3
           FROM events),
mid AS (SELECT (min(day) + max(day) + 1) // 2 AS m FROM d),
g AS (SELECT event_type,
             CASE WHEN day >= mid.m THEN 1 ELSE 0 END AS half,
             CAST(floor(log2(CAST(v3 AS DOUBLE))) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM d, mid GROUP BY 1, 2, 3),
n AS (SELECT event_type, half, CAST(SUM(c) AS BIGINT) AS n
      FROM g GROUP BY 1, 2),
j AS (SELECT a.event_type,
             CAST(a.c AS DOUBLE) / CAST(na.n AS DOUBLE) AS p,
             CAST(b.c AS DOUBLE) / CAST(nb.n AS DOUBLE) AS q
      FROM g a JOIN g b ON a.event_type = b.event_type
                       AND a.bin = b.bin
                       AND a.half = 0 AND b.half = 1
      JOIN n na ON na.event_type = a.event_type AND na.half = 0
      JOIN n nb ON nb.event_type = a.event_type AND nb.half = 1),
t AS (SELECT event_type,
             SUM(CAST(round(1000000.0 * (p - q) * ln(p / q))
                 AS BIGINT)) AS psi6
      FROM j GROUP BY 1)
SELECT n0.event_type, n0.n AS n_first, n1.n AS n_second,
       CAST(COALESCE(t.psi6, 0) AS BIGINT) AS psi6
FROM n n0 JOIN n n1 ON n1.event_type = n0.event_type
                   AND n0.half = 0 AND n1.half = 1
LEFT JOIN t ON t.event_type = n0.event_type ORDER BY 1
"""
    # full cross grid; exact integer lift o·N·1e6 // (rowT·colT)
    out["returnflag_priority_lift"] = """
WITH j AS (SELECT l_returnflag AS f, o_orderpriority AS p
           FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
g AS (SELECT f, p, CAST(count(*) AS HUGEINT) AS c FROM j GROUP BY 1, 2),
rt AS (SELECT f, SUM(c) AS r FROM g GROUP BY 1),
ct AS (SELECT p, SUM(c) AS col FROM g GROUP BY 1),
nt AS (SELECT SUM(c) AS n FROM g)
SELECT rt.f AS l_returnflag, ct.p AS o_orderpriority,
       CAST(COALESCE(g.c, 0) AS BIGINT) AS n,
       CAST(COALESCE(g.c, 0) * nt.n * 1000000 // (rt.r * ct.col)
            AS BIGINT) AS lift6
FROM rt CROSS JOIN ct CROSS JOIN nt
LEFT JOIN g ON g.f = rt.f AND g.p = ct.p
ORDER BY 1, 2
"""
    out["ipc_roundtrip"] = out["jsonl_roundtrip"]
    # argmax hour per type, ties to the earlier hour
    out["peak_hour_share"] = """
WITH g AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS h,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY c DESC, h ASC) AS rn
      FROM g),
n AS (SELECT event_type, SUM(c) AS n FROM g GROUP BY 1)
SELECT r.event_type, CAST(r.h AS BIGINT) AS peak_hour,
       CAST(n.n AS BIGINT) AS n,
       CAST(r.c * 1000000 // n.n AS BIGINT) AS peak_share6
FROM r JOIN n USING (event_type) WHERE rn = 1 ORDER BY event_type
"""
    # first-order-month split; months since 1970-01 on both sides
    out["new_vs_returning"] = """
WITH o AS (SELECT o_custkey,
                  (year(o_orderdate) - 1970) * 12
                    + month(o_orderdate) - 1 AS m,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
f AS (SELECT o_custkey, min(m) AS fm FROM o GROUP BY 1),
j AS (SELECT o.m, CASE WHEN o.m = f.fm THEN 1 ELSE 0 END AS is_new,
             o.cents
      FROM o JOIN f USING (o_custkey)),
g AS (SELECT m, CAST(SUM(is_new) AS BIGINT) AS n_new,
             CAST(count(*) - SUM(is_new) AS BIGINT) AS n_ret,
             CAST(SUM(CASE WHEN is_new = 1 THEN cents ELSE 0 END)
                  AS BIGINT) AS new_cents,
             CAST(SUM(CASE WHEN is_new = 0 THEN cents ELSE 0 END)
                  AS BIGINT) AS ret_cents
      FROM j GROUP BY 1)
SELECT CAST(m AS BIGINT) AS month, n_new, n_ret, new_cents, ret_cents,
       CAST(new_cents * 1000000 // (new_cents + ret_cents) AS BIGINT)
         AS new_share6
FROM g ORDER BY month
"""
    # Jain fairness over per-host fetched counts (crawled reachable set)
    out["crawl_fairness"] = _BFS_CTE + """,
mindepth AS (SELECT node FROM r GROUP BY node),
h AS (SELECT 'www.synthd' || CAST(node % 3 AS VARCHAR) || '.mx' AS host
      FROM mindepth),
g AS (SELECT host, CAST(count(*) AS HUGEINT) AS x FROM h GROUP BY 1),
t AS (SELECT CAST(count(*) AS HUGEINT) AS n, SUM(x) AS sx,
             SUM(x*x) AS sxx
      FROM g)
SELECT CAST(n AS BIGINT) AS n_hosts, CAST(sx AS BIGINT) AS n_pages,
       CAST(sx * sx * 1000000 // (n * sxx) AS BIGINT) AS jain6
FROM t
"""
    # SCC via full recursive reachability closure: label = min mutual
    # partner; histogram of component sizes
    out["scc_stats"] = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
mut AS (SELECT r1.src AS v, r1.dst AS u FROM reach r1
        JOIN reach r2 ON r2.src = r1.dst AND r2.dst = r1.src),
lab AS (SELECT d.doc_id AS v,
               least(d.doc_id, COALESCE(min(m.u), d.doc_id)) AS l
        FROM documents d LEFT JOIN mut m ON m.v = d.doc_id
        GROUP BY d.doc_id),
sz AS (SELECT l, CAST(count(*) AS BIGINT) AS s FROM lab GROUP BY 1)
SELECT CAST(s AS BIGINT) AS scc_size, CAST(count(*) AS BIGINT) AS n_sccs
FROM sz GROUP BY 1 ORDER BY 1
"""
    # weighted Jaccard over dense 24-hour profiles (zeros included)
    out["type_hour_ruzicka"] = """
WITH g AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS h,
                  CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
ty AS (SELECT DISTINCT event_type FROM g),
hr AS (SELECT unnest(range(24)) AS h),
fg AS (SELECT ty.event_type, hr.h, COALESCE(g.c, 0) AS c
       FROM ty CROSS JOIN hr
       LEFT JOIN g ON g.event_type = ty.event_type AND g.h = hr.h),
p AS (SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(SUM(least(a.c, b.c)) AS BIGINT) AS smin,
             CAST(SUM(greatest(a.c, b.c)) AS BIGINT) AS smax
      FROM fg a JOIN fg b ON a.h = b.h
                         AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT ta AS type_a, tb AS type_b, smin AS n_min,
       CAST(CASE WHEN smax = 0 THEN 0
            ELSE smin * 1000000 // smax END AS BIGINT) AS ruz6
FROM p ORDER BY 1, 2
"""
    # in-degree-0 inventory per host
    out["orphan_pages"] = _EDGES_CTE + """,
indeg AS (SELECT dst AS v, count(*) AS c FROM edges GROUP BY 1),
h AS (SELECT 'www.synthd' || CAST(doc_id % 3 AS VARCHAR) || '.mx'
        AS host,
      CASE WHEN i.v IS NULL THEN 1 ELSE 0 END AS orph
      FROM documents LEFT JOIN indeg i ON i.v = doc_id)
SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(SUM(orph) AS BIGINT) AS n_orphans
FROM h GROUP BY 1 ORDER BY 1
"""
    # Pearson r between n_chars and whitespace token count per source
    out["chars_tokens_corr"] = """
WITH w AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
                  CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                    AS y
           FROM documents),
m AS (SELECT source, CAST(count(*) AS HUGEINT) AS m,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x*y) AS HUGEINT) AS sxy,
             CAST(SUM(x*x) AS HUGEINT) AS sxx,
             CAST(SUM(y*y) AS HUGEINT) AS syy
      FROM w GROUP BY 1)
SELECT source, CAST(m AS BIGINT) AS n_docs,
       round(CAST(m*sxy - sx*sy AS DOUBLE)
             / (sqrt(CAST(m*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(m*syy - sy*sy AS DOUBLE))), 6) AS corr
FROM m ORDER BY source
"""
    # dense day spine + forward fill over daily revenue cents
    out["gap_fill_ffill"] = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
spine AS (SELECT unnest(range((SELECT min(day) FROM d),
                              (SELECT max(day) FROM d) + 1)) AS day),
j AS (SELECT spine.day, d.cents,
             CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS was_missing
      FROM spine LEFT JOIN d ON d.day = spine.day)
SELECT CAST(day AS BIGINT) AS day,
       CAST(last_value(cents IGNORE NULLS) OVER
              (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS rev_cents,
       CAST(was_missing AS BIGINT) AS was_missing
FROM j ORDER BY day
"""
    # chance-corrected agreement between lang_id heuristic and truth
    out["langid_kappa"] = f"""
WITH s AS (
  SELECT lang,
         {s_de} AS s_de, {s_en} AS s_en, {s_es} AS s_es, {s_fr} AS s_fr
  FROM documents),
g AS (SELECT lang,
  CASE
    WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
    WHEN s_es >= s_fr THEN 'es'
    ELSE 'fr' END AS guess
  FROM s),
c AS (SELECT lang, guess, CAST(count(*) AS HUGEINT) AS c
      FROM g GROUP BY 1, 2),
t AS (SELECT CAST(SUM(c) AS HUGEINT) AS n,
             CAST(SUM(CASE WHEN lang = guess THEN c ELSE 0 END)
                  AS HUGEINT) AS diag
      FROM c),
rt AS (SELECT lang AS lb, SUM(c) AS r FROM c GROUP BY 1),
ct AS (SELECT guess AS lb, SUM(c) AS col FROM c GROUP BY 1),
pe AS (SELECT CAST(COALESCE(SUM(rt.r * ct.col), 0) AS HUGEINT) AS pn
       FROM rt JOIN ct USING (lb))
SELECT CAST(t.n AS BIGINT) AS n, CAST(t.diag AS BIGINT) AS n_agree,
       CAST(t.diag * 1000000 // t.n AS BIGINT) AS po6,
       CAST((t.n * t.diag - pe.pn) * 1000000 // (t.n * t.n - pe.pn)
            AS BIGINT) AS kappa6
FROM t, pe
"""
    # backlog snapshot at the order-date midpoint; age bands
    out["backlog_aging"] = """
WITH r AS (SELECT l_orderkey AS ok,
                  max(epoch_us(l_shipdate)) // 86400000000 AS rd
           FROM lineitem GROUP BY 1),
o AS (SELECT o_orderkey AS ok,
             epoch_us(o_orderdate) // 86400000000 AS od,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
d AS (SELECT (min(od) + max(od)) // 2 AS snap FROM o),
op AS (SELECT o.od, o.cents FROM o JOIN r USING (ok), d
       WHERE o.od <= d.snap AND r.rd > d.snap),
b AS (SELECT CASE WHEN d.snap - od <= 30 THEN '000-030'
                  WHEN d.snap - od <= 90 THEN '031-090'
                  ELSE '090+' END AS bucket, cents
      FROM op, d)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM b GROUP BY 1 ORDER BY 1
"""
    # Broder bow-tie census against the recursive reachability closure
    out["bowtie_decomposition"] = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
mut AS (SELECT r1.src AS v, r1.dst AS u FROM reach r1
        JOIN reach r2 ON r2.src = r1.dst AND r2.dst = r1.src),
lab AS (SELECT d.doc_id AS v,
               least(d.doc_id, COALESCE(min(m.u), d.doc_id)) AS l
        FROM documents d LEFT JOIN mut m ON m.v = d.doc_id
        GROUP BY d.doc_id),
sz AS (SELECT l, count(*) AS s FROM lab GROUP BY 1),
core AS (SELECT l FROM sz ORDER BY s DESC, l ASC LIMIT 1),
coren AS (SELECT v FROM lab, core WHERE lab.l = core.l),
outr AS (SELECT DISTINCT r.dst AS v FROM reach r
         JOIN coren c ON r.src = c.v),
inr AS (SELECT DISTINCT r.src AS v FROM reach r
        JOIN coren c ON r.dst = c.v),
cls AS (SELECT d.doc_id AS v,
               CASE WHEN cn.v IS NOT NULL THEN 'CORE'
                    WHEN i.v IS NOT NULL THEN 'IN'
                    WHEN o.v IS NOT NULL THEN 'OUT'
                    ELSE 'OTHER' END AS region
        FROM documents d
        LEFT JOIN coren cn ON cn.v = d.doc_id
        LEFT JOIN inr i ON i.v = d.doc_id
        LEFT JOIN outr o ON o.v = d.doc_id),
g AS (SELECT region, CAST(count(*) AS BIGINT) AS n FROM cls
      GROUP BY 1),
r4 AS (SELECT unnest(['CORE', 'IN', 'OUT', 'OTHER']) AS region)
SELECT r4.region, CAST(COALESCE(g.n, 0) AS BIGINT) AS n
FROM r4 LEFT JOIN g USING (region) ORDER BY region
"""
    # drop n//10 from each tail by rank; tied sums are invariant
    out["trimmed_mean"] = """
WITH e AS (SELECT event_type, CAST(round(value*1000) AS BIGINT) AS v
           FROM events),
r AS (SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e),
m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_used,
             CAST(SUM(v) AS HUGEINT) AS s
      FROM r WHERE rn > n // 10 AND rn <= n - n // 10
      GROUP BY 1)
SELECT event_type, n_used,
       CAST(s * 1000000 // n_used AS BIGINT) AS mean_milli6
FROM m ORDER BY event_type
"""
    # PERCENTILE_DISC ranks over the calendar-bounded lag histogram
    out["fill_time_percentiles"] = """
WITH r AS (SELECT l_orderkey AS ok,
                  max(epoch_us(l_shipdate)) // 86400000000 AS rd
           FROM lineitem GROUP BY 1),
o AS (SELECT o_orderkey AS ok,
             epoch_us(o_orderdate) // 86400000000 AS od,
             o_orderpriority AS prio
      FROM orders),
j AS (SELECT prio, rd - od AS lag FROM o JOIN r USING (ok)),
g AS (SELECT prio, lag, CAST(count(*) AS BIGINT) AS c
      FROM j GROUP BY 1, 2),
w AS (SELECT prio, lag,
             SUM(c) OVER (PARTITION BY prio ORDER BY lag) AS cum,
             SUM(c) OVER (PARTITION BY prio) AS n
      FROM g)
SELECT prio AS o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MIN(CASE WHEN cum >= (n+1)//2 THEN lag END) AS BIGINT)
         AS p50_days,
       CAST(MIN(CASE WHEN cum >= (9*n+9)//10 THEN lag END) AS BIGINT)
         AS p90_days
FROM w GROUP BY prio ORDER BY 1
"""
    # wave-over-wave growth of the crawl frontier (min-depth census)
    out["wave_branching"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
g AS (SELECT depth, CAST(count(*) AS BIGINT) AS n
      FROM mindepth GROUP BY 1),
w AS (SELECT depth, n, lag(depth) OVER (ORDER BY depth) AS pd,
             lag(n) OVER (ORDER BY depth) AS pn
      FROM g)
SELECT CAST(depth AS BIGINT) AS depth, n AS n_pages,
       CAST(CASE WHEN pd IS NULL OR depth != pd + 1 THEN 0
            ELSE n * 1000000 // pn END AS BIGINT) AS growth6
FROM w ORDER BY depth
"""
    # seed-teleport PPR: identical 3 integer-floor rounds, sparse out
    out["personalized_pagerank"] = _EDGES_CTE + """,
w0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(1000000 AS BIGINT) AS w),
w1 AS (SELECT d.doc_id AS node,
              CASE WHEN d.doc_id = 0 THEN 150000 ELSE 0 END
                + COALESCE(SUM((85 * w0.w) // 300), 0) AS w
       FROM documents d
       LEFT JOIN edges e ON e.dst = d.doc_id
       LEFT JOIN w0 ON w0.node = e.src
       GROUP BY d.doc_id),
w2 AS (SELECT d.doc_id AS node,
              CASE WHEN d.doc_id = 0 THEN 150000 ELSE 0 END
                + COALESCE(SUM(CASE WHEN w1.w > 0
                               THEN (85 * w1.w) // 300 END), 0) AS w
       FROM documents d
       LEFT JOIN edges e ON e.dst = d.doc_id
       LEFT JOIN w1 ON w1.node = e.src
       GROUP BY d.doc_id),
w3 AS (SELECT d.doc_id AS node,
              CASE WHEN d.doc_id = 0 THEN 150000 ELSE 0 END
                + COALESCE(SUM(CASE WHEN w2.w > 0
                               THEN (85 * w2.w) // 300 END), 0) AS w
       FROM documents d
       LEFT JOIN edges e ON e.dst = d.doc_id
       LEFT JOIN w2 ON w2.node = e.src
       GROUP BY d.doc_id)
SELECT node AS doc_id, CAST(w AS BIGINT) AS ppr
FROM w3 WHERE w > 0 ORDER BY doc_id
"""
    # anti-join: parts absent from lineitem, per brand
    out["never_ordered_parts"] = """
WITH o AS (SELECT DISTINCT l_partkey AS pk FROM lineitem),
g AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(SUM(CASE WHEN o.pk IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_never
      FROM part LEFT JOIN o ON o.pk = p_partkey
      GROUP BY 1)
SELECT p_brand, n_parts, n_never,
       n_never * 1000000 // n_parts AS never_share6
FROM g ORDER BY p_brand
"""
    # equal split across window clicks; credit = floor(v3·1e6 / k)
    out["linear_attribution"] = """
WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tu,
                  CAST(round(value*1000) AS BIGINT) AS v3
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, epoch_us(ts) AS tu FROM events
      WHERE event_type = 'click'),
j AS (SELECT p.event_id, p.v3, c.tu AS ctu
      FROM p JOIN c ON c.user_id = p.user_id
            AND c.tu <= p.tu AND c.tu >= p.tu - 604800000000),
k AS (SELECT event_id, CAST(count(*) AS BIGINT) AS k FROM j
      GROUP BY 1),
cr AS (SELECT j.ctu // 86400000000 AS day,
              j.v3 * 1000000 // k.k AS credit
       FROM j JOIN k USING (event_id))
SELECT CAST(day AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_credits,
       CAST(SUM(credit) AS BIGINT) AS credit
FROM cr GROUP BY 1 ORDER BY day
"""
    # doc-co-occurrence PMI, min support 10, top-20 deterministic
    out["token_pmi"] = """
WITH w AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
           FROM documents),
d AS (SELECT DISTINCT doc_id, tok FROM w),
cw AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
p AS (SELECT a.tok AS a, b.tok AS b, CAST(count(*) AS BIGINT) AS c
      FROM d a JOIN d b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2 HAVING count(*) >= 10),
s AS (SELECT p.a, p.b, p.c AS n_docs,
             CAST(round(1000000.0 * log2(
               CAST(p.c AS DOUBLE) * CAST(n.n AS DOUBLE)
               / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))))
               AS BIGINT) AS pmi6
      FROM p CROSS JOIN n
      JOIN cw ca ON ca.tok = p.a
      JOIN cw cb ON cb.tok = p.b)
SELECT a, b, n_docs, pmi6 FROM s ORDER BY pmi6 DESC, a, b LIMIT 20
"""
    # consecutive identical (type, value) pairs per user
    out["bot_repetition"] = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu,
                  CAST(round(value*1000) AS BIGINT) AS v3
           FROM events),
w AS (SELECT user_id, event_type, v3,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY tu)
               AS pt,
             lag(v3) OVER (PARTITION BY user_id ORDER BY tu) AS pv
      FROM e),
g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN event_type = pt AND v3 = pv
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_identical
      FROM w WHERE pt IS NOT NULL GROUP BY 1)
SELECT event_type, n_pairs, n_identical,
       CAST(CASE WHEN n_pairs = 0 THEN 0
            ELSE n_identical * 1000000 // n_pairs END AS BIGINT)
         AS ident_share6
FROM g ORDER BY event_type
"""
    # rp_buckets' exact sign-LSH buckets joined to labels; majority mass
    out["bucket_label_purity"] = """
WITH v AS (
  SELECT vec_id, i AS dim,
         CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000)
              AS BIGINT) AS v6
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
signs AS (
  SELECT i AS dim,
         CAST(('0x' || substr(md5('rp' || CAST(i AS VARCHAR)), 1, 16))
              AS UBIGINT) AS hv
  FROM (SELECT unnest(range((SELECT len(embedding) FROM embeddings
                             LIMIT 1))) AS i)),
proj AS (
  SELECT v.vec_id, j.j,
         SUM(v.v6 * (CASE WHEN (s.hv >> CAST(j.j AS INT)) & 1 = 1
                          THEN 1 ELSE -1 END)) AS p
  FROM v JOIN signs s USING (dim)
  CROSS JOIN (SELECT unnest(range(8)) AS j) j
  GROUP BY v.vec_id, j.j),
bkt AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN p > 0 THEN 1 << CAST(j AS INT) ELSE 0 END)
              AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id),
g AS (SELECT bucket, e.label, CAST(count(*) AS BIGINT) AS c
      FROM bkt JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
m AS (SELECT bucket, MAX(c) AS maj FROM g GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(SUM(maj) AS BIGINT) AS sm FROM m),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
SELECT t.n_buckets, nn.n AS n_vecs,
       CAST(t.sm * 1000000 // nn.n AS BIGINT) AS purity6
FROM t, nn
"""
    # weekday-effect-adjusted daily counts; top-10 anomalies
    out["dow_adjusted_anomalies"] = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM d),
w AS (SELECT (day + 4) % 7 AS dow, CAST(SUM(n) AS BIGINT) AS s
      FROM d GROUP BY 1),
i AS (SELECT dow, s * 7 * 1000000 // t.nn AS idx6 FROM w, t),
a AS (SELECT d.day, d.n,
             CASE WHEN i.idx6 = 0 THEN 0
                  ELSE d.n * 1000000 // i.idx6 END AS adj
      FROM d JOIN i ON i.dow = (d.day + 4) % 7)
SELECT CAST(day AS BIGINT) AS day, n, CAST(adj AS BIGINT) AS adj
FROM a ORDER BY adj DESC, day ASC LIMIT 10
"""
    # per-customer churn features; months since 1970-01 convention
    out["customer_features"] = """
WITH o AS (SELECT o_custkey,
                  epoch_us(o_orderdate) // 86400000000 AS d,
                  (year(o_orderdate) - 1970) * 12
                    + month(o_orderdate) - 1 AS mo,
                  CAST(round(o_totalprice*100) AS BIGINT) AS cents
           FROM orders),
h AS (SELECT max(d) AS horizon FROM o),
g AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS frequency,
             CAST(SUM(cents) AS BIGINT) AS monetary_cents,
             CAST(min(d) AS BIGINT) AS dmin,
             CAST(max(d) AS BIGINT) AS dmax,
             CAST(count(DISTINCT mo) AS BIGINT) AS n_months
      FROM o GROUP BY 1)
SELECT o_custkey, CAST(h.horizon - dmax AS BIGINT) AS recency_days,
       frequency, monetary_cents,
       CAST(CASE WHEN frequency > 1
            THEN (dmax - dmin) * 1000000 // (frequency - 1)
            ELSE 0 END AS BIGINT) AS gap_days6,
       n_months
FROM g, h ORDER BY o_custkey
"""
    # fixed ⌊log2⌋ milliunit bands per type
    out["log2_hist"] = """
SELECT event_type,
       CAST(floor(log2(CAST(round(value*1000) AS DOUBLE))) AS BIGINT)
         AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""
    # two-level percent-of-parent rollup (region → nation)
    out["nation_share_of_region"] = """
WITH j AS (SELECT c_nationkey AS nk,
                  CAST(round(o_totalprice*100) AS BIGINT) AS cents
           FROM orders JOIN customer ON c_custkey = o_custkey),
g AS (SELECT nk, CAST(SUM(cents) AS BIGINT) AS cents FROM j
      GROUP BY 1),
d AS (SELECT r_name, n_name, g.cents,
             CAST(SUM(g.cents) OVER (PARTITION BY r_name) AS BIGINT)
               AS rtot
      FROM g JOIN nation ON n_nationkey = g.nk
      JOIN region ON r_regionkey = n_regionkey)
SELECT r_name, n_name, cents,
       CAST(cents * 1000000 // rtot AS BIGINT) AS region_share6
FROM d ORDER BY r_name, n_name
"""
    # PERCENTILE_DISC ranks at 5..95 step 5 for both distributions
    out["qq_click_purchase"] = """
WITH h AS (SELECT event_type, CAST(round(value*1000) AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS c
           FROM events WHERE event_type IN ('click', 'purchase')
           GROUP BY 1, 2),
w AS (SELECT event_type, v,
             SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h),
ps AS (SELECT unnest(range(5, 100, 5)) AS p),
q AS (SELECT ps.p, w.event_type,
             MIN(CASE WHEN cum >= (ps.p * n + 99) // 100 THEN v END)
               AS qv
      FROM ps CROSS JOIN w GROUP BY 1, 2)
SELECT CAST(a.p AS BIGINT) AS p,
       CAST(a.qv AS BIGINT) AS click_v3,
       CAST(b.qv AS BIGINT) AS purchase_v3
FROM q a JOIN q b ON a.p = b.p
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
ORDER BY p
"""
    # host × host link flow with row shares
    out["host_link_matrix"] = _EDGES_CTE + """,
g AS (SELECT 'www.synthd' || CAST(src % 3 AS VARCHAR) || '.mx'
        AS src_host,
      'www.synthd' || CAST(dst % 3 AS VARCHAR) || '.mx' AS dst_host,
      CAST(count(*) AS BIGINT) AS n
      FROM edges GROUP BY 1, 2)
SELECT src_host, dst_host, n AS n_links,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src_host)
            AS BIGINT) AS row_share6
FROM g ORDER BY src_host, dst_host
"""
    # users active in EVERY one of the final 4 Monday-aligned weeks
    out["power_users"] = """
WITH w AS (SELECT DISTINCT user_id,
                  (epoch_us(ts) + 259200000000) // 604800000000 AS wk
           FROM events),
mx AS (SELECT max(wk) AS lw FROM w),
f AS (SELECT user_id, count(*) AS k FROM w, mx
      WHERE wk >= lw - 3 GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN k = 4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_power,
       CAST(SUM(CASE WHEN k = 4 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS power_share6
FROM f
"""
    # per-source exact duplication rate (same doc_id<20 copy injection
    # as exact_dedup so the rate is nonzero at gate scale)
    out["dup_rate_by_source"] = """
WITH aug AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT source, text FROM documents WHERE doc_id < 20),
g AS (SELECT source, count(*) AS n_docs,
             count(DISTINCT md5(text)) AS n_distinct
      FROM aug GROUP BY source)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST((n_docs - n_distinct) * 1000000 // n_docs AS BIGINT)
         AS dup_share6
FROM g ORDER BY source
"""
    # LM-quality mix census: floor buckets of the SAME round-6 score
    # the unigram_logprob gate proves equal on both sides
    out["logprob_buckets"] = """
WITH words AS (
  SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS w FROM documents
),
counts AS (SELECT w, count(*) AS c FROM words GROUP BY w),
tot AS (SELECT sum(c) AS t FROM counts),
sc AS (SELECT doc_id,
              round(avg(log2(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))), 6)
                AS a
       FROM words JOIN counts USING (w), tot GROUP BY doc_id)
SELECT d.source, CAST(floor(sc.a) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM sc JOIN documents d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""
    # exact overlap-coefficient (containment) join: same gram pipeline
    # as _PAIRS_SQL, metric inter/min, over token-prefix quote docs
    out["containment_pairs"] = """
WITH aug AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 30000 AS VARCHAR),
         array_to_string(
           string_split(trim(text), ' ')[
             1:greatest(4, (2 * len(string_split(trim(text), ' '))) // 5)],
           ' ')
  FROM documents WHERE doc_id < 10),
words AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
          FROM aug),
grams AS (SELECT doc_id,
  CASE WHEN len(ws) <= 3 THEN [array_to_string(ws, ' ')]
       ELSE list_transform(range(1, len(ws)-1),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
  END AS gs FROM words),
gsets AS (SELECT doc_id, list_distinct(gs) AS gs FROM grams),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
  len(list_intersect(a.gs, b.gs)) * 1.0
    / least(len(a.gs), len(b.gs)) AS c
  FROM gsets a JOIN gsets b ON a.doc_id < b.doc_id)
SELECT a, b, round(c, 6) AS c FROM pairs WHERE c >= 0.8 ORDER BY a, b
"""
    # per-wave URL-seen hit rate: candidates(d) = edges out of
    # min-depth-d nodes; new(d+1) = nodes first reached at d+1
    out["frontier_dedup_rate"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
cand AS (SELECT m.depth AS d, count(*) AS n_candidates
         FROM mindepth m JOIN edges e ON e.src = m.node
         GROUP BY m.depth),
news AS (SELECT depth AS d, count(*) AS n_new FROM mindepth
         GROUP BY depth)
SELECT CAST(c.d AS BIGINT) AS depth,
       CAST(c.n_candidates AS BIGINT) AS n_candidates,
       CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
       CAST((c.n_candidates - COALESCE(n.n_new, 0)) * 1000000
            // c.n_candidates AS BIGINT) AS seen_rate6
FROM cand c LEFT JOIN news n ON n.d = c.d + 1
ORDER BY depth
"""
    # exact eta^2 of daily counts by position-in-week, complete weeks
    out["seasonality_strength"] = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
           FROM events GROUP BY 1),
b AS (SELECT min(day) AS d0, (max(day) - min(day) + 1) // 7 AS W FROM d),
h AS (SELECT (day - b.d0) % 7 AS g, c FROM d, b WHERE day < b.d0 + 7*b.W),
gs AS (SELECT g, CAST(sum(c) AS HUGEINT) AS s FROM h GROUP BY g),
t AS (SELECT CAST(sum(c) AS HUGEINT) AS T,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS Q FROM h),
nd AS (SELECT 7 * (SELECT sum(s*s) FROM gs) - t.T * t.T AS num,
              7 * b.W * t.Q - t.T * t.T AS den
       FROM t, b)
SELECT CAST(b.W AS BIGINT) AS n_weeks,
       CAST(t.T AS BIGINT) AS n_events,
       CAST(CASE WHEN nd.den > 0 THEN nd.num * 1000000 // nd.den
                 ELSE 0 END AS BIGINT) AS eta2_6
FROM b, t, nd
"""
    # pairwise centroid separation over the round-6 centroid table,
    # lifted to exact micro-unit ints so no float sum crosses the gate
    out["centroid_distances"] = """
WITH c AS (
  SELECT label, i AS dim,
         round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6) AS centroid
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
  GROUP BY label, i),
ci AS (SELECT label, dim,
              CAST(round(centroid * 1000000) AS BIGINT) AS c6 FROM c)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(sum((a.c6 - b.c6) * (a.c6 - b.c6)) AS BIGINT) AS d2_12
FROM ci a JOIN ci b ON a.dim = b.dim AND a.label < b.label
GROUP BY 1, 2 ORDER BY 1, 2
"""
    # mix-adjusted brand premium: integer-floor means on both sides
    out["brand_premium"] = """
WITH cells AS (
  SELECT p_brand AS brand, p_type AS ptype, count(*) AS n,
         sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM part GROUP BY 1, 2),
tm AS (SELECT ptype, sum(cents) * 10000 // sum(n) AS m6
       FROM cells GROUP BY ptype),
br AS (SELECT brand, sum(c.n) AS n, sum(c.cents) AS cents,
              sum(CAST(c.n AS HUGEINT) * tm.m6) AS ep
       FROM cells c JOIN tm USING (ptype) GROUP BY brand)
SELECT brand, CAST(n AS BIGINT) AS n_parts,
       CAST(cents * 10000 // n AS BIGINT) AS actual6,
       CAST(ep // n AS BIGINT) AS expected6,
       CAST(cents * 10000 // n - ep // n AS BIGINT) AS premium6
FROM br ORDER BY brand
"""
    # overlap@10 of int8-quantized vs exact fixed-point top-10, both
    # integer-scored with (score DESC, vec_id) tie pinning
    out["quantization_recall"] = """
WITH v AS (
  SELECT vec_id, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS val
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
stats AS (SELECT dim, MIN(val) AS mn, MAX(val) AS mx FROM v GROUP BY dim),
codes AS (
  SELECT v.vec_id, v.dim,
         CASE WHEN s.mx > s.mn
              THEN CAST(floor((v.val - s.mn) / (s.mx - s.mn) * 255 + 0.5)
                        AS BIGINT)
              ELSE 0 END AS c
  FROM v JOIN stats s USING (dim)),
v6 AS (SELECT vec_id, dim,
              CAST(round(val * 1000000) AS BIGINT) AS x FROM v),
qs AS (SELECT unnest(range(1, 6)) AS qid),
es AS (SELECT q.qid, a.vec_id, SUM(a.x * b.x) AS score
       FROM v6 a JOIN v6 b USING (dim) JOIN qs q ON b.vec_id = q.qid
       GROUP BY 1, 2),
et AS (SELECT qid, vec_id FROM (
         SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY score DESC, vec_id) AS rn
         FROM es) WHERE rn <= 10),
cs AS (SELECT q.qid, a.vec_id, SUM(a.c * b.c) AS score
       FROM codes a JOIN codes b USING (dim) JOIN qs q ON b.vec_id = q.qid
       GROUP BY 1, 2),
ct AS (SELECT qid, vec_id FROM (
         SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY score DESC, vec_id) AS rn
         FROM cs) WHERE rn <= 10),
ov AS (SELECT et.qid, count(*) AS n
       FROM et JOIN ct USING (qid, vec_id) GROUP BY et.qid)
SELECT CAST(q.qid AS BIGINT) AS query_id,
       CAST(COALESCE(ov.n, 0) AS BIGINT) AS n_overlap,
       CAST(COALESCE(ov.n, 0) * 1000000 // 10 AS BIGINT) AS recall6
FROM qs q LEFT JOIN ov ON ov.qid = q.qid ORDER BY query_id
"""
    # seasonal-naive backtest over the full calendar (missing days = 0)
    out["naive_forecast_mae"] = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS c
           FROM events GROUP BY 1),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
cal AS (SELECT unnest(range(b.lo + 7, b.hi + 1)) AS day FROM b),
e AS (SELECT cal.day, COALESCE(t.c, 0) AS c, COALESCE(p.c, 0) AS p
      FROM cal LEFT JOIN d t ON t.day = cal.day
      LEFT JOIN d p ON p.day = cal.day - 7)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs(c - p)) AS BIGINT) AS total_abs_err,
       CAST(sum(abs(c - p)) * 1000000 // count(*) AS BIGINT) AS mae6
FROM e
"""
    # per-wave host fetch share (host of node = node % 3 convention)
    out["host_wave_share"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
g AS (SELECT depth,
             'www.synthd' || CAST(node % 3 AS VARCHAR) || '.mx' AS host,
             count(*) AS n
      FROM mindepth GROUP BY 1, 2)
SELECT CAST(depth AS BIGINT) AS depth, host,
       CAST(n AS BIGINT) AS n_pages,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY depth)
            AS BIGINT) AS share6
FROM g ORDER BY depth, host
"""
    # per-source duplicated-5-gram occurrence mass
    out["source_dup_mass"] = """
WITH words AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS w
  FROM documents),
grams AS (
  SELECT doc_id, source,
         array_to_string(list_slice(w, i, i + 4), ' ') AS g
  FROM words, UNNEST(range(1, len(w) - 3)) AS t(i)),
gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS dup_mass6
FROM grams JOIN gd USING (g) GROUP BY source ORDER BY source
"""
    # time-constrained funnel: view -> click <=1h -> purchase <=24h
    out["timed_funnel"] = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events
           WHERE event_type IN ('view', 'click', 'purchase')),
base AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
conv AS (
  SELECT DISTINCT c.user_id
  FROM e c
  WHERE c.event_type = 'click'
    AND EXISTS (SELECT 1 FROM e v
                WHERE v.user_id = c.user_id AND v.event_type = 'view'
                  AND v.t < c.t AND v.t >= c.t - 3600000000)
    AND EXISTS (SELECT 1 FROM e p
                WHERE p.user_id = c.user_id
                  AND p.event_type = 'purchase'
                  AND p.t > c.t AND p.t <= c.t + 86400000000))
SELECT CAST((SELECT count(*) FROM base) AS BIGINT) AS n_users,
       CAST((SELECT count(*) FROM conv) AS BIGINT) AS n_converted,
       CAST((SELECT count(*) FROM conv) * 1000000
            // (SELECT count(*) FROM base) AS BIGINT) AS conv_share6
"""
    # purchases with/without a click in the preceding hour, exact means
    out["click_value_uplift"] = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t,
                  CAST(round(value * 1000) AS BIGINT) AS v3
           FROM events WHERE event_type IN ('click', 'purchase')),
p AS (SELECT user_id, t, v3,
             EXISTS (SELECT 1 FROM e c
                     WHERE c.user_id = p0.user_id
                       AND c.event_type = 'click'
                       AND c.t < p0.t AND c.t >= p0.t - 3600000000)
               AS clicked
      FROM e p0 WHERE event_type = 'purchase'),
g AS (SELECT CASE WHEN clicked THEN 'clicked' ELSE 'bare' END AS cohort,
             count(*) AS n, sum(v3) AS s3
      FROM p GROUP BY 1)
SELECT cohort, CAST(n AS BIGINT) AS n_purchases,
       CAST(s3 * 1000 // n AS BIGINT) AS mean6
FROM g ORDER BY cohort DESC
"""
    # pruned single-partition read-back vs the original table
    out["partition_pruned_read"] = """
SELECT epoch_us(ts) // 86400000000 AS day,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum3,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) * 1000 // count(*)
            AS BIGINT) AS mean6
FROM events WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""
    # every distinct partition seals exactly once; the resume re-run
    # seals nothing
    out["resume_skip_audit"] = """
SELECT DISTINCT event_type AS partition_value,
       CAST(1 AS BIGINT) AS sealed_first_run,
       CAST(0 AS BIGINT) AS sealed_second_run
FROM events ORDER BY 1
"""
    # per-kind span count + offset sum from the synthesis formulas
    # over the BFS-reachable set (offsets: text 0+1+4, detail 2,
    # price 3, review 5, meta 6+7, media 8, link 9+10+11, captcha 0)
    out["span_offset_profile"] = _BFS_CTE + """,
reach AS (SELECT node AS doc_id FROM r GROUP BY node),
d AS (SELECT doc.doc_id FROM documents doc JOIN reach USING (doc_id)),
norm AS (SELECT count(*) AS n FROM d WHERE doc_id % 37 != 3),
cap AS (SELECT count(*) AS n FROM d WHERE doc_id % 37 = 3),
spans AS (
  SELECT 'text' AS kind, 3 * norm.n AS n_spans,
         5 * norm.n AS sum_offsets FROM norm
  UNION ALL SELECT 'detail', n, 2 * n FROM norm
  UNION ALL SELECT 'price', n, 3 * n FROM norm
  UNION ALL SELECT 'review', n, 5 * n FROM norm
  UNION ALL SELECT 'meta', 2 * n, 13 * n FROM norm
  UNION ALL SELECT 'media', n, 8 * n FROM norm
  UNION ALL SELECT 'link', 3 * n, 30 * n FROM norm
  UNION ALL SELECT 'captcha', n, 0 FROM cap)
SELECT kind, CAST(n_spans AS BIGINT) AS n_spans,
       CAST(sum_offsets AS BIGINT) AS sum_offsets,
       CAST(sum_offsets * 1000000 // n_spans AS BIGINT) AS mean_off6
FROM spans WHERE n_spans > 0 ORDER BY kind
"""
    # per-language Gopher keep rate + English-stopword-rule failures
    out["gate_bias_matrix"] = f"""
WITH c AS (
  SELECT lang,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\\w+')) AS n_words,
         length(text) - len(regexp_extract_all(text, '\\W'))
           AS word_chars,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(lower(text), '\\b({en_alt})\\b'))
           AS n_stop
  FROM documents),
f AS (
  SELECT lang,
    CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS fail_stop,
    CASE WHEN (n_words < 10 OR n_words > 10000)
           OR (word_chars < 3*n_words OR word_chars > 10*n_words)
           OR 10*n_punct >= n_chars
           OR n_stop < 2
           OR 5*n_digit >= n_chars THEN 0 ELSE 1 END AS keep
  FROM c),
g AS (SELECT lang, count(*) AS n_docs, sum(keep) AS n_keep,
             sum(fail_stop) AS n_fail_stop FROM f GROUP BY lang)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_keep AS BIGINT) AS n_keep,
       CAST(n_fail_stop AS BIGINT) AS n_fail_stop,
       CAST(n_keep * 1000000 // n_docs AS BIGINT) AS keep_share6
FROM g ORDER BY lang
"""
    # full (true lang x guess) confusion matrix with row shares
    out["lang_confusion_matrix"] = f"""
WITH s AS (
  SELECT lang,
         {s_de} AS s_de, {s_en} AS s_en, {s_es} AS s_es, {s_fr} AS s_fr
  FROM documents),
g AS (SELECT lang,
  CASE
    WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
    WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
    WHEN s_es >= s_fr THEN 'es'
    ELSE 'fr' END AS guess
  FROM s),
c AS (SELECT lang, guess, count(*) AS n FROM g GROUP BY 1, 2)
SELECT lang, guess, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY lang)
            AS BIGINT) AS row_share6
FROM c ORDER BY lang, guess
"""
    # captcha incidence per first-reach wave (captcha: doc_id%37 = 3)
    out["captcha_rate_by_wave"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
g AS (SELECT depth, count(*) AS n_pages,
             SUM(CASE WHEN node % 37 = 3 THEN 1 ELSE 0 END)
               AS n_captcha
      FROM mindepth GROUP BY depth)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(n_pages AS BIGINT) AS n_pages,
       CAST(n_captcha AS BIGINT) AS n_captcha,
       CAST(n_captcha * 1000000 // n_pages AS BIGINT) AS captcha_rate6
FROM g ORDER BY depth
"""
    # signed wave delta src_first_wave - dst_first_wave per link
    out["link_wave_locality"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
e2 AS (SELECT ms.depth AS sd, md.depth AS dd
       FROM edges e
       JOIN mindepth ms ON e.src = ms.node
       JOIN mindepth md ON e.dst = md.node)
SELECT CAST(sd - dd AS BIGINT) AS wave_delta,
       CAST(count(*) AS BIGINT) AS n_links
FROM e2 GROUP BY 1 ORDER BY 1
"""
    # post-Gopher-gate whitespace-token budget per source
    out["usable_tokens_by_source"] = f"""
WITH c AS (
  SELECT source,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\\w+')) AS n_words,
         length(text) - len(regexp_extract_all(text, '\\W'))
           AS word_chars,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(lower(text), '\\b({en_alt})\\b'))
           AS n_stop,
         len(regexp_extract_all(text, '\\S+')) AS ws
  FROM documents),
f AS (
  SELECT source, ws,
    CASE WHEN (n_words < 10 OR n_words > 10000)
           OR (word_chars < 3*n_words OR word_chars > 10*n_words)
           OR 10*n_punct >= n_chars
           OR n_stop < 2
           OR 5*n_digit >= n_chars THEN 0 ELSE 1 END AS keep
  FROM c),
g AS (SELECT source, count(*) AS n_docs, sum(keep) AS n_kept,
             sum(ws) AS tokens_total, sum(keep * ws) AS tokens_kept
      FROM f GROUP BY 1)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(tokens_total AS BIGINT) AS tokens_total,
       CAST(tokens_kept AS BIGINT) AS tokens_kept,
       CAST(tokens_kept * 1000000 // tokens_total AS BIGINT)
         AS kept_share6
FROM g ORDER BY source
"""
    # intra-label scatter vs nearest-other-centroid, exact micro-ints
    out["cluster_separation"] = """
WITH v AS (
  SELECT vec_id, label, i AS dim,
         CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 1000000)
              AS BIGINT) AS x6
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)),
c AS (
  SELECT label, i AS dim,
         CAST(round(round(avg(CAST(embedding[i + 1] AS DOUBLE)), 6)
                    * 1000000) AS BIGINT) AS c6
  FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
  GROUP BY label, i),
terms AS (
  SELECT v.label,
         CAST(sum(CAST(v.x6 AS HUGEINT) * v.x6) AS HUGEINT) AS sq,
         CAST(sum(CAST(v.x6 AS HUGEINT) * c.c6) AS HUGEINT) AS xc,
         CAST(sum(CAST(c.c6 AS HUGEINT) * c.c6) AS HUGEINT) AS cc
  FROM v JOIN c ON v.label = c.label AND v.dim = c.dim
  GROUP BY v.label),
nvec AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
intra AS (
  SELECT t.label, nvec.n,
         (t.sq - 2 * t.xc + t.cc) // nvec.n AS intra_mean12
  FROM terms t JOIN nvec USING (label)),
cd AS (
  SELECT a.label AS la, b.label AS lb,
         CAST(sum(CAST(a.c6 - b.c6 AS HUGEINT) * (a.c6 - b.c6))
              AS HUGEINT) AS d2
  FROM c a JOIN c b ON a.dim = b.dim AND a.label != b.label
  GROUP BY 1, 2),
nearest AS (SELECT la AS label, min(d2) AS nearest_d2 FROM cd GROUP BY la)
SELECT i.label, CAST(i.n AS BIGINT) AS n,
       CAST(i.intra_mean12 AS BIGINT) AS intra_mean12,
       CAST(ne.nearest_d2 AS BIGINT) AS nearest_d2_12,
       CAST(CASE WHEN i.intra_mean12 > 0
                 THEN ne.nearest_d2 * 1000000 // i.intra_mean12
                 ELSE 0 END AS BIGINT) AS sep_ratio6
FROM intra i JOIN nearest ne USING (label) ORDER BY i.label
"""
    out["brand_return_rate"] = """
SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS return_rate6
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY 1 ORDER BY 1
"""
    out["repeat_customer_share"] = """
WITH pc AS (SELECT o_custkey AS ck, count(*) AS n FROM orders
            GROUP BY 1),
j AS (SELECT c_nationkey AS nation,
             CASE WHEN n >= 2 THEN 1 ELSE 0 END AS rep
      FROM pc JOIN customer ON c_custkey = ck)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(count(*) AS BIGINT) AS n_buyers,
       CAST(sum(rep) AS BIGINT) AS n_repeat,
       CAST(sum(rep) * 1000000 // count(*) AS BIGINT) AS repeat_share6
FROM j GROUP BY 1 ORDER BY 1
"""
    out["single_source_parts"] = """
WITH pp AS (SELECT l_partkey, count(DISTINCT l_suppkey) AS ns
            FROM lineitem GROUP BY 1),
h AS (SELECT ns, count(*) AS n_parts FROM pp GROUP BY ns),
t AS (SELECT sum(n_parts) AS tot FROM h)
SELECT CAST(ns AS BIGINT) AS n_suppliers,
       CAST(n_parts AS BIGINT) AS n_parts,
       CAST(n_parts * 1000000 // t.tot AS BIGINT) AS part_share6
FROM h, t ORDER BY n_suppliers
"""
    out["hour_dow_heatmap"] = """
WITH e AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
         (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
         CAST(round(value * 1000) AS BIGINT) AS v3
  FROM events),
g AS (SELECT dow, hour, count(*) AS n, sum(v3) AS s3
      FROM e GROUP BY 1, 2)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       CAST(n AS BIGINT) AS n_events, CAST(s3 AS BIGINT) AS sum3,
       CAST(s3 * 1000 // n AS BIGINT) AS mean6
FROM g ORDER BY dow, hour
"""
    out["order_month_profile"] = """
WITH o AS (SELECT month(o_orderdate) AS m,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
g AS (SELECT m, count(*) AS n, sum(cents) AS c FROM o GROUP BY m),
t AS (SELECT sum(n) AS tn FROM g)
SELECT CAST(m AS BIGINT) AS month, CAST(n AS BIGINT) AS n_orders,
       CAST(c AS BIGINT) AS cents,
       CAST(n * 12 * 1000000 // t.tn AS BIGINT) AS count_index6
FROM g, t ORDER BY month
"""
    out["segment_priority_mix"] = """
WITH j AS (SELECT c_mktsegment AS segment,
                  o_orderpriority AS priority
           FROM orders JOIN customer ON c_custkey = o_custkey),
g AS (SELECT segment, priority, count(*) AS n FROM j GROUP BY 1, 2)
SELECT segment, priority, CAST(n AS BIGINT) AS n_orders,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY segment)
            AS BIGINT) AS seg_share6
FROM g ORDER BY segment, priority
"""
    out["round_value_bias"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN CAST(round(value * 1000) AS BIGINT) % 1000 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_round,
       CAST(SUM(CASE WHEN CAST(round(value * 1000) AS BIGINT) % 1000 = 0
                     THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS round_share6
FROM events GROUP BY 1 ORDER BY 1
"""
    out["discount_uplift_curve"] = """
WITH l AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS gross
  FROM lineitem)
SELECT d AS discount_pct, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(q) AS BIGINT) AS qty,
       CAST(sum(gross) AS BIGINT) AS gross_cents,
       CAST(sum(gross * (100 - d)) // 100 AS BIGINT) AS net_cents
FROM l GROUP BY 1 ORDER BY 1
"""
    out["gate_length_bias"] = f"""
WITH c AS (
  SELECT length(text) AS n_chars,
         len(regexp_extract_all(text, '\\w+')) AS n_words,
         length(text) - len(regexp_extract_all(text, '\\W'))
           AS word_chars,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(lower(text), '\\b({en_alt})\\b'))
           AS n_stop
  FROM documents),
f AS (
  SELECT least(n_chars // 256, 15) AS len_bucket,
    CASE WHEN (n_words < 10 OR n_words > 10000)
           OR (word_chars < 3*n_words OR word_chars > 10*n_words)
           OR 10*n_punct >= n_chars
           OR n_stop < 2
           OR 5*n_digit >= n_chars THEN 0 ELSE 1 END AS keep
  FROM c),
g AS (SELECT len_bucket, count(*) AS n_docs, sum(keep) AS n_keep
      FROM f GROUP BY 1)
SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_keep AS BIGINT) AS n_keep,
       CAST(n_keep * 1000000 // n_docs AS BIGINT) AS keep_share6
FROM g ORDER BY len_bucket
"""
    out["most_duplicated_docs"] = """
WITH words AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(w, i, i + 4), ' ') AS g
  FROM words, UNNEST(range(1, len(w) - 3)) AS t(i)
),
gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g),
pd AS (SELECT doc_id, count(*) AS n_grams,
              CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dup
       FROM grams JOIN gd USING (g) GROUP BY doc_id)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, n_dup,
       CAST(n_dup * 1000000 // greatest(n_grams, 1) AS BIGINT)
         AS dup_share6
FROM pd
ORDER BY dup_share6 DESC, doc_id LIMIT 20
"""
    out["transition_lift"] = """
WITH s AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events),
c AS (SELECT prev_type, next_type, CAST(count(*) AS HUGEINT) AS n
      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT sum(n) AS N FROM c),
r AS (SELECT prev_type, sum(n) AS rn FROM c GROUP BY 1),
k AS (SELECT next_type, sum(n) AS cn FROM c GROUP BY 1)
SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n,
       CAST(c.n * t.N * 1000000 // (r.rn * k.cn) AS BIGINT) AS lift6
FROM c
JOIN r USING (prev_type) JOIN k USING (next_type)
CROSS JOIN t
ORDER BY prev_type, next_type
"""
    out["session_conversion"] = """
WITH e AS (
  SELECT user_id, ts, event_type,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 6 HOUR
                   OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid FROM e),
g AS (SELECT user_id, sid, count(*) AS n,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM s GROUP BY 1, 2),
b AS (SELECT CASE WHEN n <= 5 THEN n WHEN n <= 10 THEN 6 ELSE 7 END
               AS bkt, conv FROM g)
SELECT CAST(bkt AS BIGINT) AS size_bucket,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(conv) AS BIGINT) AS n_converting,
       CAST(sum(conv) * 1000000 // count(*) AS BIGINT) AS conv_share6
FROM b GROUP BY 1 ORDER BY 1
"""
    out["user_lifespan_hist"] = """
WITH u AS (
  SELECT user_id,
         epoch_us(max(ts)) // 86400000000
           - epoch_us(min(ts)) // 86400000000 AS span
  FROM events GROUP BY 1),
b AS (SELECT CASE WHEN span = 0 THEN 0 WHEN span <= 7 THEN 1
                  WHEN span <= 30 THEN 2 WHEN span <= 90 THEN 3
                  ELSE 4 END AS bkt FROM u),
g AS (SELECT bkt, count(*) AS n FROM b GROUP BY 1),
t AS (SELECT sum(n) AS tn FROM g)
SELECT CAST(bkt AS BIGINT) AS span_bucket,
       CAST(n AS BIGINT) AS n_users,
       CAST(n * 1000000 // t.tn AS BIGINT) AS user_share6
FROM g, t ORDER BY span_bucket
"""
    out["dup_pair_source_split"] = _PAIRS_SQL.replace(
        "SELECT a, b FROM pairs WHERE j >= 0.6",
        """SELECT
  CAST(SUM(CASE WHEN da.source = db.source THEN 1 ELSE 0 END)
       AS BIGINT) AS n_within,
  CAST(SUM(CASE WHEN da.source != db.source THEN 1 ELSE 0 END)
       AS BIGINT) AS n_cross,
  CAST(SUM(CASE WHEN da.source = db.source THEN 1 ELSE 0 END)
       * 1000000 // greatest(count(*), 1) AS BIGINT) AS within_share6
FROM pairs
JOIN documents da ON da.doc_id = CAST(pairs.a AS BIGINT) % 20000
JOIN documents db ON db.doc_id = CAST(pairs.b AS BIGINT) % 20000
WHERE j >= 0.6""")
    out["dup_purchase_audit"] = """
WITH p AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events WHERE event_type = 'purchase'),
g AS (SELECT count(*) AS n,
             SUM(CASE WHEN gap IS NOT NULL AND gap <= 300000000
                      THEN 1 ELSE 0 END) AS r FROM p)
SELECT CAST(n AS BIGINT) AS n_purchases, CAST(r AS BIGINT) AS n_rapid,
       CAST(r * 1000000 // n AS BIGINT) AS rapid_share6
FROM g
"""
    out["linenumber_contiguity"] = """
WITH o AS (SELECT l_orderkey, count(*) AS c, max(l_linenumber) AS mx,
                  min(l_linenumber) AS mn
           FROM lineitem GROUP BY 1),
g AS (SELECT count(*) AS n,
             SUM(CASE WHEN mx = c AND mn = 1 THEN 0 ELSE 1 END) AS v
      FROM o)
SELECT CAST(n AS BIGINT) AS n_orders, CAST(v AS BIGINT) AS n_violating,
       CAST((n - v) * 1000000 // n AS BIGINT) AS clean_share6
FROM g
"""
    # next-fit-decreasing compaction groups, replayed as a recursion
    out["compaction_plan"] = """
WITH RECURSIVE cells AS (
  SELECT source, lang, CAST(sum(length(text)) AS BIGINT) AS bytes
  FROM documents GROUP BY 1, 2),
ord AS (SELECT *, row_number() OVER (
          ORDER BY bytes DESC, source, lang) AS rn FROM cells),
rec(rn, grp, acc) AS (
  SELECT 1, 1, (SELECT bytes FROM ord WHERE rn = 1)
  UNION ALL
  SELECT o.rn,
         CASE WHEN rec.acc + o.bytes > 100000 THEN rec.grp + 1
              ELSE rec.grp END,
         CASE WHEN rec.acc + o.bytes > 100000 THEN o.bytes
              ELSE rec.acc + o.bytes END
  FROM rec JOIN ord o ON o.rn = rec.rn + 1)
SELECT o.source, o.lang, o.bytes, CAST(r.grp AS BIGINT) AS group_id
FROM ord o JOIN rec r USING (rn)
ORDER BY o.source, o.lang
"""
    # closed-form politeness schedule per (wave, host): start_k = k*D
    # (delay chain binds: P*D >= L for every synthd host config)
    out["politeness_schedule_audit"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
hcfg AS (SELECT * FROM (VALUES
  ('www.synthd0.mx', 100, 50), ('www.synthd1.mx', 200, 60),
  ('www.synthd2.mx', 300, 70)) v(host, d, l)),
g AS (SELECT depth AS wave,
             'www.synthd' || CAST(node % 3 AS VARCHAR) || '.mx' AS host,
             count(*) AS n
      FROM mindepth GROUP BY 1, 2)
SELECT CAST(g.wave AS BIGINT) AS wave, g.host,
       CAST(g.n AS BIGINT) AS n_scheduled,
       CAST(h.d * g.n * (g.n - 1) // 2 AS BIGINT) AS sum_start_ms,
       CAST((g.n - 1) * h.d + h.l AS BIGINT) AS max_end_ms
FROM g JOIN hcfg h USING (host)
ORDER BY wave, host
"""
    # contiguous per-(wave, host) seq blocks of the global crawl order
    out["crawl_order_audit"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
g AS (SELECT depth AS wave,
             'www.synthd' || CAST(node % 3 AS VARCHAR) || '.mx' AS host,
             CAST(count(*) AS HUGEINT) AS n
      FROM mindepth GROUP BY 1, 2),
o AS (SELECT *, SUM(n) OVER (ORDER BY wave, host
                             ROWS UNBOUNDED PRECEDING) - n AS base
      FROM g)
SELECT CAST(wave AS BIGINT) AS wave, host,
       CAST(n AS BIGINT) AS n_urls,
       CAST(base AS BIGINT) AS min_seq,
       CAST(n * base + n * (n - 1) // 2 AS BIGINT) AS sum_seq
FROM o ORDER BY wave, host
"""
    # per-wave admitted/scheduled counters vs first-reach census, plus
    # the terminal zero wave the loop records before stopping
    out["crawl_manifest_audit"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
g AS (SELECT depth AS wave, count(*) AS n FROM mindepth GROUP BY 1)
SELECT CAST(wave AS BIGINT) AS wave, CAST(n AS BIGINT) AS admitted,
       CAST(n AS BIGINT) AS scheduled
FROM g
UNION ALL
SELECT CAST(max(wave) + 1 AS BIGINT), 0, 0 FROM g
ORDER BY wave
"""
    # final persisted seen-set = the reached census (4 shards is the
    # derived crawl's num_seen_shards config)
    out["seen_shard_audit"] = _BFS_CTE + """
SELECT CAST(4 AS BIGINT) AS n_shards,
       CAST(count(DISTINCT node) AS BIGINT) AS n_seen
FROM r
"""
    # every checkpoint row's req_id must equal md5(its url)
    out["lineage_audit"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
g AS (SELECT depth AS wave, count(*) AS n FROM mindepth GROUP BY 1)
SELECT CAST(wave AS BIGINT) AS wave, CAST(n AS BIGINT) AS n_rows,
       CAST(n AS BIGINT) AS n_req_id_ok
FROM g ORDER BY wave
"""
    # per-wave quarantine-store row counts vs the BFS captcha census
    out["quarantine_audit"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
g AS (SELECT depth AS wave, count(*) AS n FROM mindepth
      WHERE node % 37 = 3 GROUP BY 1)
SELECT CAST(wave AS BIGINT) AS wave,
       CAST(n AS BIGINT) AS n_quarantined
FROM g ORDER BY wave
"""
    out["order_total_consistency"] = """
WITH lo AS (
  SELECT l_orderkey AS okey,
         sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             * (100 - CAST(round(l_discount * 100) AS HUGEINT))
             * (100 + CAST(round(l_tax * 100) AS HUGEINT))) AS s4
  FROM lineitem GROUP BY 1),
j AS (SELECT (s4 + 5000) // 10000 AS derived,
             CAST(round(o_totalprice * 100) AS HUGEINT) AS tc
      FROM lo JOIN orders ON o_orderkey = okey),
g AS (SELECT count(*) AS n,
             SUM(CASE WHEN derived = tc THEN 1 ELSE 0 END) AS ne,
             SUM(abs(derived - tc)) AS sd FROM j)
SELECT CAST(n AS BIGINT) AS n_orders, CAST(ne AS BIGINT) AS n_exact,
       CAST(ne * 1000000 // n AS BIGINT) AS exact_share6,
       CAST(sd * 1000000 // n AS BIGINT) AS mean_abs_delta_cents6
FROM g
"""
    out["rich_club"] = _EDGES_CTE + """,
deg AS (
  SELECT node, SUM(c) AS d FROM (
    SELECT src AS node, count(*) AS c FROM edges GROUP BY 1
    UNION ALL SELECT dst, count(*) FROM edges GROUP BY dst) u
  GROUP BY node),
ks AS (SELECT unnest([8, 10, 12]) AS k),
club AS (SELECT ks.k, deg.node FROM ks JOIN deg ON deg.d > ks.k),
ne AS (SELECT c1.k, count(*) AS e
       FROM edges
       JOIN club c1 ON c1.node = edges.src
       JOIN club c2 ON c2.node = edges.dst AND c2.k = c1.k
       WHERE edges.src != edges.dst
       GROUP BY c1.k),
cm AS (SELECT k, count(*) AS m FROM club GROUP BY k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(COALESCE(cm.m, 0) AS BIGINT) AS n_nodes,
       CAST(COALESCE(ne.e, 0) AS BIGINT) AS n_edges,
       CAST(CASE WHEN COALESCE(cm.m, 0) > 1
                 THEN COALESCE(ne.e, 0) * 1000000
                      // (cm.m * (cm.m - 1))
                 ELSE 0 END AS BIGINT) AS density6
FROM ks LEFT JOIN cm USING (k) LEFT JOIN ne USING (k)
ORDER BY k
"""
    out["markov_entropy"] = """
WITH s AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events),
c AS (SELECT prev_type, next_type, count(*) AS n
      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT sum(n) AS N FROM c),
r AS (SELECT prev_type, sum(n) AS rn FROM c GROUP BY 1)
SELECT CAST(t.N AS BIGINT) AS n_transitions,
       round(-SUM((CAST(c.n AS DOUBLE) / t.N)
                  * log2(CAST(c.n AS DOUBLE) / r.rn)), 6)
         AS h_cond_bits
FROM c JOIN r USING (prev_type) CROSS JOIN t
GROUP BY t.N
"""
    out["media_decode_batches"] = """
WITH m AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 3 AS fmt_idx,
         length(text) AS nbytes
  FROM documents),
r AS (SELECT *, row_number() OVER (
        PARTITION BY fmt_idx ORDER BY doc_id) - 1 AS rk FROM m)
SELECT CAST(fmt_idx AS BIGINT) AS fmt_idx,
       CAST(rk // 64 AS BIGINT) AS batch_id,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(nbytes) AS BIGINT) AS sum_bytes
FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""
    out["neyman_allocation"] = """
WITH st AS (
  SELECT lang, source, count(*) AS n,
         CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS sxx
  FROM documents GROUP BY 1, 2),
w AS (SELECT lang, source, n, n * sxx - sx * sx AS v FROM st),
t AS (SELECT sum(v) AS tot FROM w),
h AS (SELECT w.*, 1000 * v // t.tot AS base, 1000 * v % t.tot AS rem
      FROM w, t),
l AS (SELECT 1000 - sum(base) AS leftover FROM h),
rk AS (SELECT *, row_number() OVER (
         ORDER BY rem DESC, lang, source) AS r FROM h)
SELECT lang, source, CAST(n AS BIGINT) AS n_docs,
       CAST(v AS BIGINT) AS weight,
       CAST(base + CASE WHEN rk.r <= l.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM rk, l ORDER BY lang, source
"""
    out["purchase_growth"] = """
WITH p AS (
  SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS v3,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'),
f AS (SELECT a.user_id, a.v3 AS v1, b.v3 AS v2
      FROM p a JOIN p b ON a.user_id = b.user_id
      WHERE a.rn = 1 AND b.rn = 2),
g AS (SELECT count(*) AS n,
             SUM(CASE WHEN v2 > v1 THEN 1 ELSE 0 END) AS ngrew,
             SUM(CASE WHEN v2 = v1 THEN 1 ELSE 0 END) AS nt FROM f)
SELECT CAST(n AS BIGINT) AS n_repeat_buyers,
       CAST(ngrew AS BIGINT) AS n_grew, CAST(nt AS BIGINT) AS n_tied,
       CAST(ngrew * 1000000 // n AS BIGINT) AS grew_share6
FROM g
"""
    out["activity_spikes"] = """
WITH c AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(day AS BIGINT) AS day,
       CAST(n AS BIGINT) AS n
FROM c ORDER BY n DESC, user_id, day LIMIT 20
"""
    out["lead_words"] = """
WITH f AS (
  SELECT string_split(trim(text), ' ')[1] AS word FROM documents
  WHERE trim(text) != ''),
c AS (SELECT word, count(*) AS n FROM f GROUP BY 1),
t AS (SELECT sum(n) AS tot FROM c)
SELECT word, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // t.tot AS BIGINT) AS share6
FROM c, t ORDER BY n DESC, word LIMIT 20
"""
    out["same_day_orders"] = """
WITH c AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
                  count(*) AS n
           FROM orders GROUP BY 1, 2),
g AS (SELECT count(*) AS nc,
             SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS nm FROM c)
SELECT CAST(nc AS BIGINT) AS n_cust_days, CAST(nm AS BIGINT) AS n_multi,
       CAST(nm * 1000000 // nc AS BIGINT) AS multi_share6
FROM g
"""
    out["value_sorted_head"] = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(round(value * 1000) AS BIGINT) AS v3
FROM events
ORDER BY v3, event_id LIMIT 20
"""
    out["native_group_aggs"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum3,
       CAST(min(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS min3,
       CAST(max(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS max3
FROM events GROUP BY 1 ORDER BY 1
"""
    out["native_unique"] = """
SELECT DISTINCT event_type FROM events ORDER BY 1
"""
    # containment dedup survivors: contained-in-strictly-larger dropped,
    # equal-size pairs drop the larger doc_id
    out["containment_dedup"] = """
WITH aug AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
  UNION ALL
  SELECT CAST(doc_id + 30000 AS VARCHAR),
         array_to_string(
           string_split(trim(text), ' ')[
             1:greatest(4, (2 * len(string_split(trim(text), ' '))) // 5)],
           ' ')
  FROM documents WHERE doc_id < 10),
words AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
          FROM aug),
grams AS (SELECT doc_id,
  CASE WHEN len(ws) <= 3 THEN [array_to_string(ws, ' ')]
       ELSE list_transform(range(1, len(ws)-1),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
  END AS gs FROM words),
gsets AS (SELECT doc_id, list_distinct(gs) AS gs FROM grams),
pairs AS (SELECT a.doc_id AS a, len(a.gs) AS na,
                 b.doc_id AS b, len(b.gs) AS nb,
                 len(list_intersect(a.gs, b.gs)) * 1.0
                   / least(len(a.gs), len(b.gs)) AS c
          FROM gsets a JOIN gsets b ON a.doc_id < b.doc_id),
drops AS (
  SELECT DISTINCT CASE WHEN na < nb THEN a
                       WHEN nb < na THEN b
                       ELSE greatest(a, b) END AS doc_id
  FROM pairs WHERE c >= 0.9)
SELECT doc_id FROM aug
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
ORDER BY doc_id
"""
    out["shingle_df_profile"] = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
  FROM documents),
grams AS (SELECT doc_id,
  CASE WHEN len(ws) <= 3 THEN [array_to_string(ws, ' ')]
       ELSE list_transform(range(1, len(ws)-1),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
  END AS gs FROM words),
gd AS (SELECT g, count(DISTINCT doc_id) AS nd
       FROM grams, UNNEST(list_distinct(gs)) AS t(g) GROUP BY g),
b AS (SELECT CASE WHEN nd = 1 THEN 0 WHEN nd = 2 THEN 1
                  WHEN nd <= 10 THEN 2 WHEN nd <= 100 THEN 3
                  ELSE 4 END AS bkt FROM gd),
g2 AS (SELECT bkt, count(*) AS n FROM b GROUP BY 1),
t AS (SELECT sum(n) AS tn FROM g2)
SELECT CAST(bkt AS BIGINT) AS df_bucket, CAST(n AS BIGINT) AS n_shingles,
       CAST(n * 1000000 // t.tn AS BIGINT) AS share6
FROM g2, t ORDER BY df_bucket
"""
    out["vocab_growth"] = """
WITH tm AS (
  SELECT w AS tok, min(doc_id) AS mn
  FROM (SELECT doc_id, UNNEST(string_split(trim(text), ' ')) AS w
        FROM documents) GROUP BY w),
nn2 AS (SELECT count(*) AS n FROM documents),
ps AS (SELECT unnest([10, 25, 50, 100]) AS pct)
SELECT CAST(ps.pct AS BIGINT) AS pct,
       CAST(nn2.n * ps.pct // 100 AS BIGINT) AS n_docs,
       CAST((SELECT count(*) FROM tm
             WHERE tm.mn < nn2.n * ps.pct // 100) AS BIGINT) AS vocab
FROM ps, nn2 ORDER BY pct
"""
    # refs: media spans 1 each, link spans 3 per norm doc, all valid
    # https; every other kind refless
    out["span_ref_integrity"] = _BFS_CTE + """,
reach AS (SELECT node AS doc_id FROM r GROUP BY node),
d AS (SELECT doc.doc_id FROM documents doc JOIN reach USING (doc_id)),
norm AS (SELECT count(*) AS n FROM d WHERE doc_id % 37 != 3),
cap AS (SELECT count(*) AS n FROM d WHERE doc_id % 37 = 3),
k AS (
  SELECT 'text' AS kind, 3 * norm.n AS s, 0 AS wr, 0 AS vr FROM norm
  UNION ALL SELECT 'detail', n, 0, 0 FROM norm
  UNION ALL SELECT 'price', n, 0, 0 FROM norm
  UNION ALL SELECT 'review', n, 0, 0 FROM norm
  UNION ALL SELECT 'meta', 2 * n, 0, 0 FROM norm
  UNION ALL SELECT 'media', n, n, n FROM norm
  UNION ALL SELECT 'link', 3 * n, 3 * n, 3 * n FROM norm
  UNION ALL SELECT 'captcha', n, 0, 0 FROM cap)
SELECT kind, CAST(s AS BIGINT) AS n_spans,
       CAST(wr AS BIGINT) AS n_with_ref,
       CAST(vr AS BIGINT) AS n_ref_valid
FROM k WHERE s > 0 ORDER BY kind
"""
    # per-wave codepoint totals from the synthesis length formulas
    out["wave_bytes"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
nn2 AS (SELECT count(*) AS n FROM documents),
dd AS (SELECT doc.*, m.depth AS wave
       FROM documents doc JOIN mindepth m ON m.node = doc.doc_id),
link_chars AS (
  SELECT d0.doc_id,
         SUM(1 + length(CAST((v.a * d0.doc_id + v.b) % nn2.n
                             AS VARCHAR))) AS chars
  FROM dd d0, nn2, (VALUES (7, 1), (13, 2), (29, 5)) v(a, b)
  WHERE d0.doc_id % 37 != 3
  GROUP BY d0.doc_id),
per_doc AS (
  SELECT dd.wave,
         CASE WHEN dd.doc_id % 37 = 3
              THEN 20 + length(CAST(dd.doc_id AS VARCHAR))
              ELSE
           (10 + length(CAST(dd.doc_id AS VARCHAR)))
         + (6 + length(dd.source)) + length(dd.text)
         + (6 + length(dd.lang))
         + (12 + length(CAST(dd.n_chars AS VARCHAR)))
         + (4 + length(CAST(dd.doc_id AS VARCHAR))) + 7
         + (8 + length(CAST(dd.doc_id AS VARCHAR)))
         + (CASE WHEN dd.doc_id % 3 = 0
                 THEN 10 + length(CAST(dd.doc_id AS VARCHAR))
                 ELSE length(dd.source) + 8
                      + length(CAST(dd.doc_id AS VARCHAR)) END)
         + (29 + length(CAST(dd.doc_id % 28 + 1 AS VARCHAR))) + 4
         + (13 + length(CAST(dd.doc_id AS VARCHAR)) + length(dd.lang))
         + (33 + length(CAST(dd.doc_id AS VARCHAR)))
         + 8
         + COALESCE(lc.chars, 0)
         END AS chars
  FROM dd LEFT JOIN link_chars lc USING (doc_id))
SELECT CAST(wave AS BIGINT) AS wave,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(chars) AS BIGINT) AS sum_chars
FROM per_doc GROUP BY wave ORDER BY wave
"""
    # per-wave makespan + bottleneck host from the closed form
    out["crawl_critical_path"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
hcfg AS (SELECT * FROM (VALUES
  ('www.synthd0.mx', 100, 50), ('www.synthd1.mx', 200, 60),
  ('www.synthd2.mx', 300, 70)) v(host, d, l)),
g AS (SELECT depth AS wave,
             'www.synthd' || CAST(node % 3 AS VARCHAR) || '.mx' AS host,
             count(*) AS n
      FROM mindepth GROUP BY 1, 2),
m AS (SELECT g.wave, g.host, (g.n - 1) * h.d + h.l AS makespan
      FROM g JOIN hcfg h USING (host)),
rk AS (SELECT *, row_number() OVER (
         PARTITION BY wave ORDER BY makespan DESC, host) AS r FROM m)
SELECT CAST(wave AS BIGINT) AS wave, host AS bottleneck_host,
       CAST(makespan AS BIGINT) AS makespan_ms
FROM rk WHERE r = 1 ORDER BY wave
"""
    # in-degree tercile tiers: per in-degree value, its block of ranks
    # lands in one tier iff the BLOCK START is below the cut
    out["refetch_tiers"] = _EDGES_CTE + """,
ind AS (SELECT dst AS node, count(*) AS d FROM edges GROUP BY 1),
alln AS (SELECT doc_id AS node, COALESCE(ind.d, 0) AS d
         FROM documents LEFT JOIN ind ON ind.node = documents.doc_id),
h AS (SELECT d, count(*) AS c FROM alln GROUP BY d),
o AS (SELECT *, SUM(c) OVER (ORDER BY d
                             ROWS UNBOUNDED PRECEDING) - c AS lo_rank
      FROM h),
t AS (SELECT d, c,
             CASE WHEN lo_rank < (SELECT count(*) FROM alln) // 3 THEN 2
                  WHEN lo_rank < 2 * (SELECT count(*) FROM alln) // 3
                    THEN 1
                  ELSE 0 END AS tier
      FROM o)
SELECT CAST(tier AS BIGINT) AS tier,
       CAST(sum(c) AS BIGINT) AS n_pages,
       CAST(min(d) AS BIGINT) AS min_indegree,
       CAST(max(d) AS BIGINT) AS max_indegree
FROM t GROUP BY tier ORDER BY tier
"""
    out["top_discoverers"] = _BFS_CTE + """,
mindepth AS (SELECT node, MIN(depth) AS depth FROM r GROUP BY node),
e2 AS (SELECT e.src, count(*) AS n
       FROM edges e
       JOIN mindepth ms ON e.src = ms.node
       JOIN mindepth md ON e.dst = md.node
       WHERE md.depth = ms.depth + 1
       GROUP BY e.src)
SELECT CAST(src AS BIGINT) AS src, CAST(n AS BIGINT) AS n_discovered
FROM e2 ORDER BY n DESC, src LIMIT 20
"""
    # reach from seed 0 alone vs the two-seed crawl
    out["seed_coverage"] = """
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT doc_id AS src, (7*doc_id+1) % nn.n AS dst
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (13*doc_id+2) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
  UNION ALL SELECT doc_id, (29*doc_id+5) % nn.n
  FROM documents, nn WHERE doc_id % 37 != 3
),
r(node, depth) AS (
  SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0), (CAST(1 AS BIGINT), 0))
  UNION
  SELECT e.dst, r.depth + 1 FROM r JOIN edges e ON e.src = r.node
  WHERE r.depth < 20),
r0(node, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r0.depth + 1 FROM r0 JOIN edges e ON e.src = r0.node
  WHERE r0.depth < 64),
b AS (SELECT count(DISTINCT node) AS nb FROM r),
s0 AS (SELECT count(DISTINCT node) AS n0 FROM r0)
SELECT CAST(b.nb AS BIGINT) AS n_reach_both,
       CAST(s0.n0 AS BIGINT) AS n_reach_seed0,
       CAST(b.nb - s0.n0 AS BIGINT) AS n_at_risk,
       CAST((b.nb - s0.n0) * 1000000 // b.nb AS BIGINT)
         AS at_risk_share6
FROM b, s0
"""
    # raw spellings vs distinct canonical forms over the messy fixture
    out["canonical_collisions"] = """
WITH norm AS (
  SELECT CASE doc_id % 4
    WHEN 0 THEN 'https://www.mixup.com.mx/Mixup/detproducto.aspx?sku='
                || doc_id
    WHEN 1 THEN 'https://www.synthd1.mx:8080/shop/Home.aspx'
    WHEN 2 THEN 'http://news.site.mx/'
    ELSE 'https://shop.example.mx/p?q=' || doc_id END AS u
  FROM documents)
SELECT CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(DISTINCT u) AS BIGINT) AS n_canonical,
       CAST((count(*) - count(DISTINCT u)) * 1000000 // count(*)
            AS BIGINT) AS inflation6
FROM norm
"""
    out["order_status_mix"] = """
WITH g AS (SELECT year(o_orderdate) AS year, o_orderstatus AS status,
                  count(*) AS n
           FROM orders GROUP BY 1, 2)
SELECT CAST(year AS BIGINT) AS year, status,
       CAST(n AS BIGINT) AS n_orders,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY year) AS BIGINT)
         AS year_share6
FROM g ORDER BY year, status
"""
    out["doc_length_quantiles"] = """
SELECT lang, count(*) AS n,
       round(quantile_cont(n_chars, 0.5), 6) AS q50,
       round(quantile_cont(n_chars, 0.9), 6) AS q90
FROM documents GROUP BY lang ORDER BY lang
"""
    out["supplier_balance_profile"] = """
WITH s AS (SELECT s_nationkey AS nation,
                  CAST(round(s_acctbal * 100) AS HUGEINT) AS cents
           FROM supplier),
g AS (SELECT nation, count(*) AS n, sum(cents) AS c,
             SUM(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS nd
      FROM s GROUP BY 1)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(n AS BIGINT) AS n_suppliers,
       CAST(c * 10000 // n AS BIGINT) AS mean6,
       CAST(nd AS BIGINT) AS n_debt,
       CAST(nd * 1000000 // n AS BIGINT) AS debt_share6
FROM g ORDER BY nation
"""
    out["entry_event_mix"] = """
WITH f AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
g AS (SELECT event_type AS entry_type, count(*) AS n
      FROM f WHERE rn = 1 GROUP BY 1),
t AS (SELECT sum(n) AS tn FROM g)
SELECT entry_type, CAST(n AS BIGINT) AS n_users,
       CAST(n * 1000000 // t.tn AS BIGINT) AS user_share6
FROM g, t ORDER BY entry_type
"""
    out["exit_event_mix"] = """
WITH f AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
g AS (SELECT event_type AS exit_type, count(*) AS n
      FROM f WHERE rn = 1 GROUP BY 1),
t AS (SELECT sum(n) AS tn FROM g)
SELECT exit_type, CAST(n AS BIGINT) AS n_users,
       CAST(n * 1000000 // t.tn AS BIGINT) AS user_share6
FROM g, t ORDER BY exit_type
"""
    out["value_by_entry_type"] = """
WITH f AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
e AS (SELECT user_id, event_type AS entry_type FROM f WHERE rn = 1),
p AS (SELECT user_id,
             sum(CAST(round(value * 1000) AS BIGINT)) AS s3
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
g AS (SELECT e.entry_type, count(*) AS n,
             sum(COALESCE(p.s3, 0)) AS s3
      FROM e LEFT JOIN p USING (user_id) GROUP BY 1)
SELECT entry_type, CAST(n AS BIGINT) AS n_users,
       CAST(s3 AS BIGINT) AS sum3,
       CAST(s3 * 1000 // n AS BIGINT) AS mean_per_user6
FROM g ORDER BY entry_type
"""
    out["quantity_hist"] = """
WITH g AS (SELECT CAST(round(l_quantity) AS BIGINT) AS quantity,
                  count(*) AS n
           FROM lineitem GROUP BY 1),
t AS (SELECT sum(n) AS tn FROM g)
SELECT quantity, CAST(n AS BIGINT) AS n_lines,
       CAST(n * 1000000 // t.tn AS BIGINT) AS share6
FROM g, t ORDER BY quantity
"""
    # global total order through the external-sort plane: the key at
    # every N/16-th global rank (plus the last) of ORDER BY v3, event_id
    out["external_sort_ranks"] = """
WITH k AS (SELECT CAST(event_id AS BIGINT) AS event_id,
                  CAST(round(value * 1000) AS BIGINT) AS v3
           FROM events),
r AS (SELECT event_id, v3,
             row_number() OVER (ORDER BY v3, event_id) - 1 AS rn
      FROM k),
n AS (SELECT count(*) AS n FROM events),
probes AS (
  SELECT DISTINCT (t.i * n.n) // 16 AS rn FROM range(16) t(i), n
  UNION SELECT n - 1 FROM n)
SELECT CAST(r.rn AS BIGINT) AS rank, r.v3, r.event_id
FROM r JOIN probes p ON p.rn = r.rn
ORDER BY rank
"""
    out["external_sort_manifest"] = """
SELECT CAST(count(*) AS BIGINT) AS total_rows,
       CAST(1 AS BIGINT) AS monotonic,
       CAST(1 AS BIGINT) AS sealed
FROM events
"""
    # full-sequence order checksum over the external-sorted key stream
    out["external_sort_order_sum"] = """
WITH k AS (SELECT CAST(event_id AS BIGINT) AS event_id,
                  CAST(round(value * 1000) AS BIGINT) AS v3
           FROM events),
r AS (SELECT v3 * 2147483648 + event_id AS key,
             row_number() OVER (ORDER BY v3, event_id) - 1 AS rn
      FROM k)
SELECT CAST(count(*) AS BIGINT) AS total_rows,
       CAST(sum(((rn % 1000003) * (((key % 1000003) + 1000003) % 1000003))
                % 1000003) AS BIGINT) AS order_sum
FROM r
"""
    # sort-merge join plane: per-priority lineitem count + quantity sum
    out["sort_merge_revenue"] = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""
    return out
