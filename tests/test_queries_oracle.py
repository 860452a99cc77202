"""Mirror of the driver's correctness gate: every SQL-backed queries()
entry must match its oracle_sql() on row count, column names, and values
(order-insensitive) at sf0.01; rows-only entries must produce rows."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

# default sf0.01 (the driver's gate scale); override to cross-check
# another scale: GRAFT_ORACLE_SF=/root/testdata/sf0.001 pytest ...
SF_DIR = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_BACKED = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(con, name):
    ray_res = _to_df(entrymod.queries()[name](SF_DIR))
    sql_res = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(ray_res.columns) == sorted(sql_res.columns), (
        f"{name}: column mismatch {sorted(ray_res.columns)} vs {sorted(sql_res.columns)}"
    )
    assert len(ray_res) == len(sql_res), f"{name}: rowcount {len(ray_res)} vs {len(sql_res)}"
    a, b = _canon(ray_res), _canon(sql_res)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    res = _to_df(entrymod.queries()[name](SF_DIR))
    assert len(res) > 0
    assert len(res.columns) > 0


def test_entry_smoke():
    df = _to_df(entrymod.entry())
    assert len(df) >= 0 and "name" in df.columns


def test_shipping_priority_join_fallback_matches_broadcast_path():
    """Past the build-side gather caps, Q3 falls back to the native
    hash-join plan — it must produce exactly the broadcast path's
    top-10 (same keys, same exact fixed-point revenue)."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_shipping_priority(SF_DIR)
    b = q._shipping_priority_join_plan(SF_DIR, pd.Timestamp("1998-06-01"))
    a = a.reset_index(drop=True)[sorted(a.columns)]
    b = b.reset_index(drop=True)[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_star_join_fallbacks_match_broadcast_path(monkeypatch):
    """Past the build-side cap the Q5/Q7/Q8/Q9/Q10 star queries fall
    back to native hash joins — forcing _broadcast_fact_attach to
    decline must leave every output identical."""
    from gocrawler_ray.pipelines import queries as q

    names = ["local_supplier_revenue", "nation_trade_flows",
             "market_share", "product_profit", "returned_top_customers"]
    base = {n: _to_df(getattr(q, f"q_{n}")(SF_DIR)) for n in names}
    # declining _gather_capped forces BOTH fallback shapes: the helper
    # path (_broadcast_fact_attach returns None) and Q10's direct
    # capped-gather gate
    monkeypatch.setattr(q, "_gather_capped", lambda *a, **k: None)
    for n in names:
        b = _to_df(getattr(q, f"q_{n}")(SF_DIR))
        cols = sorted(base[n].columns)
        pd.testing.assert_frame_equal(
            base[n][cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False,
        )


def test_repeated_ngrams_fallback_matches_broadcast_path():
    """Past the gram-broadcast cap, the distributed groupby+semi-join
    fallback must produce exactly the broadcast path's answer."""
    from gocrawler_ray.pipelines import queries as q

    a = _to_df(q.q_repeated_ngrams(SF_DIR))
    b = _to_df(q.q_repeated_ngrams(SF_DIR, cap=10))
    a = a.sort_values("doc_id").reset_index(drop=True)[sorted(a.columns)]
    b = b.sort_values("doc_id").reset_index(drop=True)[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_basket_pairs_distributed_close_matches_driver_combine(monkeypatch):
    """Past the pair-partial cap, q_basket_pairs re-shuffles the
    partials by hash(pa) and closes per bucket — forcing the driver
    combine to decline must leave the top-100 identical."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_basket_pairs(SF_DIR)
    monkeypatch.setattr(q, "_combine_partials", lambda *x, **k: None)
    b = q.q_basket_pairs(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_fk_orphans_copartition_plan_matches_broadcast():
    """Past the build-side cap every FK edge anti-counts via the
    co-partitioned kernel — declining the gather must leave the audit
    identical."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_fk_orphans(SF_DIR)
    b = q.q_fk_orphans(SF_DIR, cap=10)  # every build past the cap
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_zipf_slope_bucket_topk_matches_driver_combine(monkeypatch):
    """Past the vocabulary cap the token counts re-shuffle by
    hash(token) with per-bucket top-100 partials — same fit."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_zipf_slope(SF_DIR)
    monkeypatch.setattr(q, "_combine_partials", lambda *x, **k: None)
    b = q.q_zipf_slope(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_revenue_rollup_join_plan_matches_broadcast(monkeypatch):
    """Past the customer cap the rollup's geography attach falls back
    to the distributed hash join — identical rollup."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_revenue_rollup(SF_DIR)
    monkeypatch.setattr(q, "_broadcast_fact_attach", lambda *x, **k: None)
    b = q.q_revenue_rollup(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_supplier_ontime_fallbacks_match_broadcast(monkeypatch):
    """Both plan caps (order-date broadcast; supplier combine) must
    leave the scorecard identical when declined."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_supplier_ontime(SF_DIR)
    monkeypatch.setattr(q, "_broadcast_fact_attach", lambda *x, **k: None)
    b = q.q_supplier_ontime(SF_DIR)
    monkeypatch.undo()
    monkeypatch.setattr(q, "_combine_partials", lambda *x, **k: None)
    c = q.q_supplier_ontime(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    pd.testing.assert_frame_equal(a, c, check_dtype=False)


def test_gini_assortativity_fallbacks_match_broadcast(monkeypatch):
    """Past the broadcast caps, gini_by_nation's nation attach and
    degree_assortativity's two degree attaches fall back to distributed
    hash joins — identical outputs."""
    from gocrawler_ray.pipelines import queries as q

    a1 = q.q_gini_by_nation(SF_DIR)
    a2 = q.q_degree_assortativity(SF_DIR)
    # declining _gather_capped forces gini's customer hash join AND
    # assortativity's two degree joins (via _broadcast_fact_attach)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b1 = q.q_gini_by_nation(SF_DIR)
    b2 = q.q_degree_assortativity(SF_DIR)
    pd.testing.assert_frame_equal(a1, b1, check_dtype=False)
    pd.testing.assert_frame_equal(a2, b2, check_dtype=False)


def test_local_clustering_join_fallback_matches_broadcast(monkeypatch):
    """Past the edge-set broadcast cap, the wedge closure runs as a
    distributed (x,y)⋈(a,b) hash join — identical cc table."""
    from gocrawler_ray.pipelines import queries as q

    a = _to_df(q.q_local_clustering(SF_DIR))
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = _to_df(q.q_local_clustering(SF_DIR))
    a = a.sort_values("doc_id").reset_index(drop=True)[sorted(a.columns)]
    b = b.sort_values("doc_id").reset_index(drop=True)[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_common_neighbors_distributed_plan_matches_driver(monkeypatch):
    """Past the edge gather cap, common_neighbors runs the distributed
    wedge plan (apex map_groups → (x,y) count groupby → left_outer
    anti-join → per-block partial top-k) — identical top-20."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_common_neighbors(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_common_neighbors(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_adamic_adar_distributed_plan_matches_driver(monkeypatch):
    """Past the edge gather cap, adamic_adar runs the distributed
    wedge plan (apex term rides the wedge stream into one (x,y) Sum
    groupby → anti-join → partial top-k) — identical top-20."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_adamic_adar(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_adamic_adar(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_bfs_distances_distributed_rounds_match_driver(monkeypatch):
    """Past the edge gather cap, each BFS round is one map_batches
    scan of the edge Dataset — identical dist table."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_bfs_distances(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_bfs_distances(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_open_orders_distributed_plan_matches_driver(monkeypatch):
    """Past the gather caps, open_orders_daily runs the Ray
    groupby-max + hash-join + delta-partial plan — identical
    timeline."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_open_orders_daily(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_open_orders_daily(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_cdc_dedup_distributed_plane_matches_driver(monkeypatch):
    """Past the chunk gather cap, the distinct plane runs as a
    distributed groupby on the chunk hash — identical totals."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_cdc_dedup(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_cdc_dedup(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_item_cf_fallbacks_match_broadcast(monkeypatch):
    """Past the caps, item_cf's orders attach runs as a hash join and
    the part-popularity cut as a distributed sort+limit — identical
    best-match table."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_item_cf(SF_DIR)
    monkeypatch.setattr(q, "_broadcast_fact_attach", lambda *x, **k: None)
    b = q.q_item_cf(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_supplier_hhi_fallback_matches_broadcast(monkeypatch):
    """Past the supplier-map cap, supplier_hhi's nationkey attach runs
    as a distributed hash join — identical concentration table."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_supplier_hhi(SF_DIR)
    monkeypatch.setattr(q, "_broadcast_fact_attach", lambda *x, **k: None)
    b = q.q_supplier_hhi(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_returnflag_lift_fallback_matches_broadcast(monkeypatch):
    """Past the orders-map cap, the priority attach runs as a
    distributed hash join — identical lift grid."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_returnflag_priority_lift(SF_DIR)
    monkeypatch.setattr(q, "_broadcast_fact_attach", lambda *x, **k: None)
    b = q.q_returnflag_priority_lift(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_new_vs_returning_fallback_matches_broadcast(monkeypatch):
    """Past the first-month-map cap, the fm attach runs as a
    distributed hash join — identical monthly split."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_new_vs_returning(SF_DIR)
    monkeypatch.setattr(q, "_broadcast_fact_attach", lambda *x, **k: None)
    b = q.q_new_vs_returning(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_scc_distributed_plan_matches_tarjan(monkeypatch):
    """Past the edge cap, scc_stats runs the FW-BW-TRIM distributed
    plan (node-bounded state, per-round edge scans) — identical SCC
    size histogram to the driver Tarjan sweep."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_scc_stats(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_scc_stats(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_backlog_aging_fallback_matches_driver(monkeypatch):
    """Past the caps, backlog_aging re-plans as groupby-max + hash
    join with distributed bucket partials — identical aging table."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_backlog_aging(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_backlog_aging(SF_DIR)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True),
                                  check_dtype=False)


def test_bowtie_distributed_plan_matches_driver(monkeypatch):
    """Past the edge cap, bow-tie runs FW-BW-TRIM SCC + distributed
    multi-source BFS rounds — identical census."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_bowtie_decomposition(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_bowtie_decomposition(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_fill_time_fallback_matches_driver(monkeypatch):
    """Past the caps, fill-time percentiles re-plan as groupby-max +
    hash join with distributed grid partials — identical table."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_fill_time_percentiles(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_fill_time_percentiles(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_never_ordered_fallback_matches_broadcast(monkeypatch):
    """Past the ordered-set cap, the anti-join runs as Ray left_outer
    + null filter — identical cold-inventory table."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_never_ordered_parts(SF_DIR)
    monkeypatch.setattr(q, "_gather_capped", lambda *x, **k: None)
    b = q.q_never_ordered_parts(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_nation_share_fallback_matches_broadcast(monkeypatch):
    """Past the customer-map cap, the nation attach runs as a
    distributed hash join — identical rollup."""
    from gocrawler_ray.pipelines import queries as q

    a = q.q_nation_share_of_region(SF_DIR)
    monkeypatch.setattr(q, "_broadcast_fact_attach", lambda *x, **k: None)
    b = q.q_nation_share_of_region(SF_DIR)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
