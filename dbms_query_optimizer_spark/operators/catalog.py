"""Central query/oracle catalog.

Maps query name -> (callable(spark, sf_dir) -> DataFrame, oracle SQL | None).
``__spark_entry__`` re-exports this; tests iterate it for DuckDB parity.

Oracle-SQL rules (driver contract):
- DuckDB dialect, runnable against views named after the testdata tables.
- Column names must match the Spark result exactly (compare sorts columns
  by name before hashing) — every computed column is aliased identically on
  both sides.
- Float aggregates are rounded on BOTH sides so summation-order differences
  between engines can't flip the value hash.
- ``None`` oracle => non-SQL-expressible; driver records rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import relational as R

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (spark callable, duckdb oracle sql | None)
CATALOG: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    assert name not in CATALOG, f"duplicate query name {name}"
    CATALOG[name] = (fn, oracle)


# ---------------------------------------------------------------- relational

register(
    "flagship_join_agg",
    R.q_flagship_join_agg,
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM customer
    JOIN orders ON c_custkey = o_custkey AND o_totalprice < 100000.0
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

register(
    "cbo_ordered_join",
    R.q_cbo_ordered_join,
    """
    SELECT n_name, COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_totalprice < 150000
    GROUP BY n_name
    ORDER BY n_name
    """,
)

register(
    "scan",
    R.q_scan,
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
)

register(
    "filter_predicates",
    R.q_filter_predicates,
    """
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
    FROM part
    WHERE p_size >= 10 AND p_size <= 40 AND p_size <> 13
      AND p_retailprice > 900.0 AND p_retailprice < 1800.0
      AND p_brand = 'Brand#3'
    ORDER BY p_partkey
    """,
)

register(
    "projection",
    R.q_projection,
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS gross_price
    FROM lineitem
    """,
)

register(
    "agg_global",
    R.q_agg_global,
    """
    SELECT COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price
    FROM orders
    """,
)

register(
    "agg_grouped",
    R.q_agg_grouped,
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 4) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE), 6) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)

register(
    "join_inner",
    R.q_join_inner,
    """
    SELECT s_suppkey, s_name, n_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ORDER BY s_suppkey
    """,
)

register(
    "join_nonequi",
    R.q_join_nonequi,
    """
    SELECT r_regionkey, r_name, COUNT(*) AS n_greater
    FROM region JOIN nation ON n_nationkey > r_regionkey
    GROUP BY r_regionkey, r_name
    ORDER BY r_regionkey
    """,
)

register(
    "join_multiway",
    R.q_join_multiway,
    """
    SELECT r_name, COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name
    ORDER BY r_name
    """,
)

register(
    "join_left_outer",
    R.q_join_left_outer,
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_big_orders
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) big
      ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

register(
    "join_full_outer",
    R.q_join_full_outer,
    """
    SELECT c_custkey, c_acctbal, o_custkey, n_recent_orders
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7500.0) rich
    FULL OUTER JOIN (
        SELECT o_custkey, COUNT(*) AS n_recent_orders
        FROM orders WHERE o_orderdate >= DATE '2001-01-01'
        GROUP BY o_custkey
    ) recent ON c_custkey = o_custkey
    ORDER BY c_custkey NULLS FIRST, o_custkey NULLS FIRST
    """,
)

register(
    "join_semi",
    R.q_join_semi,
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    """,
)

register(
    "join_anti",
    R.q_join_anti,
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    ORDER BY c_custkey
    """,
)

register(
    "join_null_aware_anti",
    R.q_join_null_aware_anti,
    R.SQL_NULL_AWARE_ANTI,
)

register(
    "distinct",
    R.q_distinct,
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders ORDER BY o_orderstatus, o_orderpriority
    """,
)

register(
    "sort_limit",
    R.q_sort_limit,
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)

register(
    "topk_per_group",
    R.q_topk_per_group,
    """
    SELECT c_mktsegment, c_custkey, c_name, c_acctbal, rk
    FROM (
        SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS rk
        FROM customer
    )
    WHERE rk <= 3
    ORDER BY c_mktsegment, rk
    """,
)

register(
    "window_running",
    R.q_window_running,
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 3
    """,
)

register("window_range_frame", R.q_window_range_frame, R.ORACLE_WINDOW_RANGE_FRAME)

register("merge_upsert", R.q_merge_upsert, R.ORACLE_MERGE_UPSERT)

register("latest_per_key", R.q_latest_per_key, R.ORACLE_LATEST_PER_KEY)

register("join_salted_skew", R.q_join_salted_skew, R.ORACLE_JOIN_SALTED_SKEW)

register("unpivot_metrics", R.q_unpivot_metrics, R.ORACLE_UNPIVOT_METRICS)

register("agg_array_ordered", R.q_agg_array_ordered, R.ORACLE_AGG_ARRAY_ORDERED)

register("incremental_agg_merge", R.q_incremental_agg_merge, R.ORACLE_INCREMENTAL_AGG_MERGE)

register(
    "set_ops",
    R.q_set_ops,
    """
    WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT nationkey, 'both' AS side FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
    UNION ALL
    SELECT nationkey, 'customer_only' AS side FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
    UNION ALL
    SELECT nationkey, 'supplier_only' AS side FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
    ORDER BY nationkey, side
    """,
)

register(
    "rollup",
    R.q_rollup,
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)

register(
    "cube",
    R.q_cube,
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)

register("approx_aggs", R.q_approx_aggs, R.ORACLE_APPROX_AGGS)

register("approx_hll_mergeable", R.q_approx_hll_mergeable, R.ORACLE_APPROX_HLL_MERGEABLE)

register(
    "exact_distinct_counts",
    R.q_exact_distinct_counts,
    """
    SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    """,
)

register(
    "expressions",
    R.q_expressions,
    """
    SELECT o_orderkey,
           YEAR(o_orderdate) AS o_year,
           MONTH(o_orderdate) AS o_month,
           UPPER(o_orderstatus) AS status_upper,
           SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           LENGTH(o_orderpriority) AS prio_len,
           ROUND(SQRT(o_totalprice), 4) AS price_sqrt,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)

register(
    "having",
    R.q_having,
    """
    SELECT l_suppkey, COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 50
    ORDER BY l_suppkey
    """,
)

register(
    "subquery_in",
    R.q_subquery_in,
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
    ORDER BY o_orderkey
    """,
)

register("subquery_not_exists", R.q_subquery_not_exists, R.ORACLE_SUBQUERY_NOT_EXISTS)

register("agg_filtered", R.q_agg_filtered, R.ORACLE_AGG_FILTERED)

register("global_row_number", R.q_global_row_number, R.ORACLE_GLOBAL_ROW_NUMBER)

register("rollup_grouping_id", R.q_rollup_grouping_id, R.ORACLE_ROLLUP_GROUPING_ID)

register("band_join_lookup", R.q_band_join_lookup, R.ORACLE_BAND_JOIN_LOOKUP)

register("monthly_growth", R.q_monthly_growth, R.ORACLE_MONTHLY_GROWTH)

register("conform_union", R.q_conform_union, R.ORACLE_CONFORM_UNION)

register("dedup_keep_best", R.q_dedup_keep_best, R.ORACLE_DEDUP_KEEP_BEST)

register("data_quality_report", R.q_data_quality_report, R.ORACLE_DATA_QUALITY_REPORT)

register("scd2_build", R.q_scd2_build, R.ORACLE_SCD2_BUILD)

register("window_share_of_total", R.q_window_share_of_total, R.ORACLE_WINDOW_SHARE_OF_TOTAL)

register(
    "correlated_scalar_subquery",
    R.q_correlated_scalar_subquery,
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (
        SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o.o_orderkey
    """,
)

register(
    "pivot",
    R.q_pivot,
    """
    SELECT o_orderstatus,
           NULLIF(COUNT(*) FILTER (WHERE prio = '1'), 0) AS p1,
           NULLIF(COUNT(*) FILTER (WHERE prio = '2'), 0) AS p2,
           NULLIF(COUNT(*) FILTER (WHERE prio = '3'), 0) AS p3,
           NULLIF(COUNT(*) FILTER (WHERE prio = '4'), 0) AS p4,
           NULLIF(COUNT(*) FILTER (WHERE prio = '5'), 0) AS p5
    FROM (SELECT o_orderstatus, SUBSTRING(o_orderpriority, 1, 1) AS prio FROM orders)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)

register(
    "recursive_cte_ancestors",
    R.q_recursive_cte_ancestors,
    R.ORACLE_RECURSIVE_CTE_ANCESTORS,
)

register(
    "values_inline",
    R.q_values_inline,
    """
    SELECT v.band_name, COUNT(*) AS n
    FROM orders o
    JOIN (VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending'))
         AS v(status, band_name)
      ON o.o_orderstatus = v.status
    GROUP BY v.band_name
    ORDER BY v.band_name
    """,
)


# ------------------------------------------------------------- text analysis

from . import text as TXT  # noqa: E402

for _name, (_fn, _sql) in TXT.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------------------------------- dedup

from . import dedup as DD  # noqa: E402

for _name, (_fn, _sql) in DD.oracles().items():
    register(_name, _fn, _sql)

# -------------------------------------------------------- similarity search

from . import similarity as SIM  # noqa: E402

for _name, (_fn, _sql) in SIM.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------------------- multimodal columns

from . import multimodal as MM  # noqa: E402

for _name, (_fn, _sql) in MM.oracles().items():
    register(_name, _fn, _sql)

# ---------------------- scalar-function families / grouping sets / lateral

from . import scalar_funcs as SF  # noqa: E402

for _name, (_fn, _sql) in SF.oracles().items():
    register(_name, _fn, _sql)

# --------------------------------------------------- pandas UDF / UDAF

from . import udfs as UDF  # noqa: E402

for _name, (_fn, _sql) in UDF.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------------------ sampling / splits

from . import sampling as SMP  # noqa: E402

for _name, (_fn, _sql) in SMP.oracles().items():
    register(_name, _fn, _sql)

# --------------------------------------------- composite corpus pipeline

from . import corpus_prep as CP  # noqa: E402

for _name, (_fn, _sql) in CP.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------------ temporal joins / rollup

from . import temporal as TMP  # noqa: E402

for _name, (_fn, _sql) in TMP.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------------- source/sink connectors

from . import sources_queries as SRC  # noqa: E402

for _name, (_fn, _sql) in SRC.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------------- event-time / streaming

from ..streaming import windows as SW  # noqa: E402

for _name, (_fn, _sql) in SW.oracles().items():
    register(_name, _fn, _sql)

from ..streaming import stateful as SST  # noqa: E402

for _name, (_fn, _sql) in SST.oracles().items():
    register(_name, _fn, _sql)

# ------------------------- incremental view maintenance (delta joins)

register(
    "incremental_join_view",
    R.q_incremental_join_view,
    R.ORACLE_INCREMENTAL_JOIN_VIEW,
)

register(
    "join_shuffle_hash",
    R.q_join_shuffle_hash,
    R.ORACLE_JOIN_SHUFFLE_HASH,
)

register(
    "scd2_point_in_time",
    R.q_scd2_point_in_time,
    R.ORACLE_SCD2_POINT_IN_TIME,
)

register(
    "stats_selectivity_report",
    R.q_stats_selectivity_report,
    R.ORACLE_STATS_SELECTIVITY_REPORT,
)
register(
    "stats_equidepth_histogram",
    R.q_stats_equidepth_histogram,
    R.ORACLE_STATS_EQUIDEPTH_HISTOGRAM,
)
register(
    "join_cardinality_audit",
    R.q_join_cardinality_audit,
    R.ORACLE_JOIN_CARDINALITY_AUDIT,
)

register("cbo_vs_dp_report", R.q_cbo_vs_dp_report, R.ORACLE_CBO_VS_DP_REPORT)
register("cbo_plan_memo", R.q_cbo_plan_memo, R.ORACLE_CBO_PLAN_MEMO)
register(
    "stats_histogram_dump",
    R.q_stats_histogram_dump,
    R.ORACLE_STATS_HISTOGRAM_DUMP,
)

register(
    "stats_histogram_2d_dump",
    R.q_stats_histogram_2d_dump,
    R.ORACLE_STATS_HISTOGRAM_2D_DUMP,
)

register("market_basket_pairs", R.q_market_basket_pairs, R.ORACLE_MARKET_BASKET_PAIRS)
register("recsys_item_cosine", R.q_recsys_item_cosine, R.ORACLE_RECSYS_ITEM_COSINE)

# -------------------------------- corpus prep: decontaminate/chunk/pack

from . import pipeline_prep as PP  # noqa: E402

for _name, (_fn, _sql) in PP.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------- corpus governance / audit / robust stats

from . import governance as GOV  # noqa: E402

for _name, (_fn, _sql) in GOV.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------------- iterative graph ops

from . import graph as GR  # noqa: E402

for _name, (_fn, _sql) in GR.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------------- classic TPC-H suite

from . import tpch as TPCH  # noqa: E402

for _name, (_fn, _sql) in TPCH.oracles().items():
    register(_name, _fn, _sql)

# ------------------------------------------- geospatial (grid-blocked)

from . import geo as GEO  # noqa: E402

for _name, (_fn, _sql) in GEO.oracles().items():
    register(_name, _fn, _sql)


# ------------------------------------------------------------ driver order
#
# The grading driver oracle-checks the FIRST 50 entries of queries(), so
# catalog order IS the driver's correctness-evidence sample. The window
# ROTATES each round: a few sentinels stay pinned (so a regression in the
# core path is always caught), and every other slot goes to queries that
# have never produced a driver CORRECTNESS row, maximizing cumulative
# independent-oracle coverage of the 190+-query catalog. Everything
# outside the window keeps registration order and is covered by the local
# full-catalog gate (tests/test_queries_oracle.py — the identical DuckDB
# hash check over every oracled entry).

# Names with a hash-checked driver row, grouped into per-round cohorts
# by the round whose CORRECTNESS_r0N.json recorded the green (minus the
# no_oracle rows-only entries; the four sentinels are listed once, in
# their original rounds-1-3 cohort, and re-checked every round
# regardless). The cohort split is load-bearing, not decorative: the
# r10+ freshness policy rotates re-check windows through the
# OLDEST-green cohort first, and r10_window() derives that schedule
# from these constants directly — a comment-only grouping would drift.
DRIVER_GREENS_R10 = frozenset({
    # round-10 greens (50/50 window green, CORRECTNESS_r10.json): the
    # 7 round-9 additions, the 4 multimodal decode planes (first
    # hash-checkable rows after the r10 LCG value-oracle upgrade), and
    # the 3 round-10 additions. The window's other 36 rows were
    # freshness re-checks of already-folded names — their hashes were
    # refreshed in green_hashes.json, not re-folded.
    "bpe_train_steps", "conformal_intervals", "dedup_winnowing",
    "embedding_random_projection", "index_refresh",
    "mmr_diversify_topk", "multimodal_audio_features",
    "multimodal_features", "multimodal_image_dhash_dedup",
    "multimodal_resize", "pii_luhn_audit", "retrieval_ndcg_report",
    "rrf_hybrid_search", "streaming_index_upsert",
})
DRIVER_GREENS_R9 = frozenset({
    # round-9 greens (46/46 oracled window green, CORRECTNESS_r09.json;
    # the window's 4 rows-only multimodal entries stay out of the green
    # cohorts — rows-only evidence is weaker — and the 4 sentinels stay
    # in their rounds-1-3 cohort)
    "approx_counts_sampled", "cbo_plan_memo", "cbo_vs_dp_report",
    "cumulative_distinct_users", "dataset_card_report",
    "embedding_kmeans_lloyd", "events_downsample_m4",
    "functions_variant", "graph_degree_distribution", "graph_kcore",
    "graph_triangle_count", "incremental_join_view",
    "interval_overlap_join", "join_null_aware_anti",
    "join_shuffle_hash", "k_anonymity_audit", "late_supplier_blame",
    "mann_whitney_u", "max_drawdown", "multimodal_frame_sample",
    "pad_waste_report", "quality_classifier_score",
    "sample_reservoir_per_group", "sample_weighted",
    "sample_weighted_reservoir", "shapley_attribution",
    "source_python_datasink", "stats_equidepth_histogram",
    "stats_histogram_2d_dump", "stats_histogram_dump", "stats_moments",
    "stratified_neyman_alloc", "streaming_foreachbatch_ingest",
    "streaming_manifest_tail", "streaming_sessionized",
    "streaming_static_join", "streaming_stream_stream_left_join",
    "streaming_upsert_ingest", "t_closeness_audit", "text_readability",
    "try_safe_arithmetic", "udf_price_score",
})
DRIVER_GREENS_R8 = frozenset({
    # round-8 greens (50/50 window, CORRECTNESS_r08.json)
    "audience_overlap_sketch", "ccnet_ppl_buckets", "chunk_documents",
    "contrastive_pairs_lsh", "conversion_lag_percentiles",
    "date_dim_generate", "dedup_cdc_chunks", "dedup_incremental_lsh",
    "dedup_simhash_pairs", "dedup_span_duplication",
    "doc_repeat_removal", "embedding_centroids", "embedding_norms",
    "embedding_quantize_int8", "embedding_truncate_renorm",
    "event_transition_matrix", "events_anomaly_zscore",
    "events_dow_hour_profile", "events_gapfill_locf",
    "events_ohlc_bars", "events_resample_interp",
    "events_rollup_multires", "events_session_window_native",
    "explode_tokens", "fuzzy_join_blocked", "geo_position_asof",
    "graph_bfs_hops", "graph_wcc", "heartbeat_gaps",
    "interval_coverage", "market_basket_pairs", "percentile_exact",
    "quantile_sketch_mergeable", "sample_kcenter_coreset",
    "shard_assignment_balanced", "skyline_pareto",
    "sliding_distinct_users", "span_corruption_mask",
    "text_bigram_logprob", "text_entropy", "text_fingerprint",
    "text_lang_confusion", "text_lang_quality_summary",
    "text_mixed_language", "text_rolling_fingerprint",
    "text_unigram_logprob",
})
DRIVER_GREENS_R7 = frozenset({
    # round-7 greens (50/50 window, CORRECTNESS_r07.json)
    "activity_islands", "approx_hll_mergeable", "approx_topk_terms",
    "argmax_per_group", "autocorr_lags", "bh_fdr_report",
    "contrastive_pairs", "dedup_ngram_jaccard", "dedup_semantic",
    "dedup_simhash", "embedding_drift", "embedding_outliers",
    "embedding_pca_project", "embedding_pq_adc", "event_trigram_mining",
    "events_funnel", "events_retention", "geo_grid_density",
    "geo_nearest_facility", "geo_trajectory_length", "grouping_sets",
    "knn_brute_force", "knn_ivf", "l_diversity_audit", "lateral_topk",
    "linear_attribution", "lsh_recall_report", "quality_gopher_rules",
    "sample_stratified", "text_quality", "text_tfidf_top_terms",
    "time_decay_attribution", "trend_per_group", "txn_clone",
    "txn_cluster_evolution", "txn_compact_scan", "txn_constraint_gate",
    "txn_delete_where", "txn_erase_keys", "txn_history",
    "txn_incremental_mv", "txn_replace_where", "txn_retention_delete",
    "txn_schema_evolution", "txn_vacuum_report", "window_analytics",
})
DRIVER_GREENS_R6 = frozenset({
    # round-6 greens (50/50 window, CORRECTNESS_r06.json; includes
    # twap_daily — red in r5 on an oracle-side epoch() cast, re-proven
    # green in r6)
    "ab_test_cuped", "benford_audit", "bloom_membership_audit",
    "bootstrap_ci_mean", "bpe_pair_merge", "cluster_key_advisor",
    "count_min_sketch_audit", "cusum_changepoint",
    "dedup_set_similarity_prefix", "dedup_token_sort",
    "dsir_importance_weights", "feature_hash_vectorize",
    "feature_standardize", "fifo_allocation", "fk_integrity_audit",
    "forecast_backtest_snaive", "gbt_inference_sql",
    "graph_link_prediction", "group_kfold_split",
    "hll_estimate_audit", "join_cardinality_audit",
    "ks_test_drift", "markov_attribution", "model_auc_roc",
    "model_calibration_report", "model_confusion_report",
    "model_gains_table", "model_pr_auc",
    "mutual_information_features", "percentile_cont_domain",
    "pipeline_funnel_report", "rate_smoothing_eb",
    "recsys_item_cosine", "rolling_corr", "seasonal_anomaly_flags",
    "seasonal_decompose", "skew_key_report", "source_loo_vocab",
    "spearman_rank_corr", "survival_km", "target_encode_kfold",
    "text_collocations", "text_keyphrase_rake", "theil_sen_trend",
    "twap_daily", "woe_binning",
})
DRIVER_GREENS_R5 = frozenset({
    # round-5 greens
    "arrow_map_stats", "asof_join_left", "audience_overlap_bitmap",
    "boilerplate_strip", "chi_square_independence", "cogroup_reconcile",
    "cohort_ltv", "column_profile", "corpus_mix_build",
    "correlation_matrix", "dedup_containment", "dedup_keep_superset",
    "drift_psi", "drift_welch_t", "entity_resolution",
    "event_pattern_match", "ewma_smooth", "feature_assembly_pit",
    "first_touch_attribution", "functions_array_json",
    "functions_bitwise", "functions_datetime", "functions_map",
    "functions_string", "gini_concentration", "pii_redact",
    "quantile_normalize", "rfm_segmentation", "rolling_median",
    "running_balance_clamped", "sample_systematic", "session_paths",
    "source_quota_cap", "stats_selectivity_report",
    "streaming_quantile_sketch", "streaming_stream_stream_join",
    "table_checksum", "tpch_q12", "txn_changes", "txn_delete_mor",
    "txn_restore", "txn_scd2_apply", "txn_wap_publish",
    "vocab_coverage", "weighted_median",
})
DRIVER_GREENS_R4 = frozenset({
    # round-4 greens
    "approx_aggs", "asof_join_forward", "asof_join_salted",
    "bucketed_colocated_join", "curriculum_bins",
    "dedup_embedding_cosine_lsh", "doc_length_histogram", "events_sliding",
    "events_tumbling", "length_winsorize", "mix_rebalance",
    "mix_temperature_weights", "scd2_point_in_time", "source_binaryfile_scan",
    "source_csv_scan", "source_json_scan", "source_orc_scan",
    "source_partitioned_scan", "source_python_stream",
    "source_schema_evolution", "source_zorder_scan", "tpch_q2", "tpch_q3",
    "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q10", "tpch_q11", "tpch_q13", "tpch_q14", "tpch_q16", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q22", "txn_merge_upsert",
    "txn_point_lookup", "txn_time_travel", "txn_zonemap_scan",
    "zipf_token_rank",
})
DRIVER_GREENS_R1_3 = frozenset({
    # rounds 1-3 (the oldest cohort; first in line for r10+ freshness
    # re-checks). Includes the four DRIVER_SENTINELS.
    "agg_array_ordered", "agg_filtered", "agg_global", "agg_grouped",
    "asof_join", "band_join_lookup", "bm25_score", "cbo_ordered_join",
    "conform_union", "corpus_prep", "correlated_scalar_subquery", "cube",
    "data_quality_report", "decontaminate_ngram", "dedup_components",
    "dedup_embedding_cosine", "dedup_exact", "dedup_keep_best",
    "dedup_minhash_lsh", "distinct", "dpp_join_pruned",
    "events_sessionized", "exact_distinct_counts", "expressions",
    "filter_predicates", "flagship_join_agg", "global_row_number",
    "graph_pagerank", "hash_split_train", "having", "higher_order_funcs",
    "incremental_agg_merge", "join_anti", "join_full_outer", "join_inner",
    "join_left_outer", "join_multiway", "join_nonequi", "join_salted_skew",
    "join_semi", "knn_lsh_bucketed", "latest_per_key", "merge_upsert",
    "monthly_growth", "multimodal_meta", "pack_sequences", "pivot",
    "projection", "range_join_bucketed", "recursive_cte_ancestors",
    "robust_stats_mad", "rollup", "rollup_grouping_id", "scan",
    "scd2_build", "set_ops", "sort_limit", "source_python_datasource",
    "streaming_dedup", "streaming_tumbling", "subquery_in",
    "subquery_not_exists", "text_lang_id", "text_token_stats",
    "topk_per_group", "tpch_q1", "tpch_q15", "txn_write_read",
    "udaf_geomean", "udtf_split_sentences", "unpivot_metrics",
    "values_inline", "window_range_frame", "window_running",
    "window_share_of_total",
})
# Round-11 fold: the only r11 window name with no prior green row was
# knn_ivfpq (added during the interrupted round-10 build); everything
# else in the r11 window was a freshness re-check whose hash refresh
# lives in green_hashes.json. streaming_index_upsert came back RED
# (worker-spawn env flake, see OPTIMIZATION_r12.md §1) — green-cohort
# membership keeps it re-check-eligible and next_window() re-enters it.
DRIVER_GREENS_R11 = frozenset({
    "knn_ivfpq",
})
# Cohorts ordered oldest-first: the r10+ freshness rotation walks this
# list front to back. Kept as an explicit tuple (not dict) so iteration
# order is the policy, visibly.
DRIVER_GREEN_COHORTS = (
    DRIVER_GREENS_R1_3, DRIVER_GREENS_R4, DRIVER_GREENS_R5,
    DRIVER_GREENS_R6, DRIVER_GREENS_R7, DRIVER_GREENS_R8,
    DRIVER_GREENS_R9, DRIVER_GREENS_R10, DRIVER_GREENS_R11,
)
DRIVER_CHECKED_PRIOR_ROUNDS = frozenset().union(*DRIVER_GREEN_COHORTS)

# Entries whose QUERY CONSTRUCTION (fn(spark, sf_dir), before any action
# on the returned frame) already runs Spark jobs or mutates state: the
# txn/streaming families write table directories, the advisor/solver
# entries collect stats or run driver solves, the source_* roundtrips
# write fixtures, and the distributed-moment entries (PCA, spearman,
# ...) collect scalars. Authoring-time sweeps that
# only need the result SCHEMA (tests/test_oracle_types.py) skip these —
# their type agreement is still enforced at full-execution time by
# oracle_utils.compare inside the complete catalog gate. Measured
# empirically: construct every oracled entry under a job group on a warm
# session and flag any that ran >= 1 job (2026-08-15 sweep). BOTH
# directions are enforced: the type test fails an unflagged entry that
# starts running jobs at construction, and scripts/check_eager_flags.py
# (run per round) reports any FLAGGED entry that has become lazy — a
# stale flag would otherwise silently skip the cheap authoring-time
# type gate forever.
EAGER_CONSTRUCTION = frozenset({
    "asof_join_salted", "bh_fdr_report", "bpe_train_steps",
    "bucketed_colocated_join",
    "cbo_ordered_join", "cbo_plan_memo", "cbo_vs_dp_report",
    "cluster_key_advisor",
    "column_profile", "curriculum_bins", "dedup_components",
    "dedup_incremental_lsh", "dedup_semantic", "dpp_join_pruned",
    "embedding_kmeans_lloyd",
    "embedding_pca_project", "embedding_pq_adc", "entity_resolution",
    "global_row_number", "graph_bfs_hops", "graph_kcore",
    "graph_pagerank", "graph_wcc",
    "index_refresh",
    "ks_test_drift", "lsh_recall_report", "mann_whitney_u",
    "markov_attribution", "mmr_diversify_topk",
    "model_auc_roc", "model_gains_table", "model_pr_auc",
    "pipeline_funnel_report", "quantile_normalize",
    "retrieval_ndcg_report", "rfm_segmentation",
    "sample_kcenter_coreset", "sample_systematic",
    "shard_assignment_balanced", "skyline_pareto",
    "source_binaryfile_scan", "source_csv_scan", "source_json_scan",
    "source_orc_scan", "source_partitioned_scan",
    "source_python_datasink", "source_schema_evolution",
    "source_zorder_scan", "spearman_rank_corr",
    "stats_equidepth_histogram", "stats_histogram_2d_dump",
    "stats_histogram_dump",
    "stats_selectivity_report",
    "streaming_dedup", "streaming_foreachbatch_ingest",
    "streaming_index_upsert",
    "streaming_manifest_tail", "streaming_quantile_sketch",
    "streaming_sessionized", "streaming_static_join",
    "streaming_stream_stream_join",
    "streaming_stream_stream_left_join", "streaming_tumbling",
    "streaming_upsert_ingest", "txn_changes", "txn_clone",
    "txn_cluster_evolution", "txn_compact_scan", "txn_constraint_gate",
    "txn_delete_mor", "txn_delete_where", "txn_erase_keys",
    "txn_history", "txn_incremental_mv", "txn_merge_upsert",
    "txn_point_lookup", "txn_replace_where", "txn_restore",
    "txn_retention_delete", "txn_scd2_apply", "txn_schema_evolution",
    "txn_time_travel", "txn_vacuum_report", "txn_wap_publish",
    "txn_write_read", "txn_zonemap_scan", "woe_binning",
})

# Pinned sentinels: re-checked every round regardless of rotation.
DRIVER_SENTINELS = [
    "flagship_join_agg",  # entry() query — the core join+agg path
    "cbo_ordered_join",   # Selinger DP join ordering end-to-end
    "txn_write_read",     # transactional write path (manifest log)
    "tpch_q1",            # pure scan + partial-agg baseline
]

# Round-9 window (the r8 verdict's prescribed rotation, applied as the
# first commit of round 9): sentinels + the 46 names that, after the
# r8 window's 50/50 green (CORRECTNESS_r08.json, folded into
# DRIVER_GREENS_R8 above), have NEVER had a driver row — this closes
# the never-checked backlog to ZERO. The window is FULL at 46/46
# non-sentinel slots (machine-checked: test_catalog_order.py asserts
# len(DRIVER_SENTINELS + R9_PLANNED_WINDOW) == 50 and set-equality
# against CATALOG − DRIVER_CHECKED_PRIOR_ROUNDS − sentinels), so any
# round-9 operator addition spills to the FRONT of the r10 window —
# r10_window() below gives new never-checked names slots ahead of
# freshness re-checks automatically. Every name below passed the full
# driver-contract drive at BOTH sf0.01 and sf0.1 in round 8.
#
# r9 window = sentinels + the remaining 46 —
#   sampling/stats (7): stats_equidepth_histogram, stats_moments,
#     stratified_neyman_alloc, approx_counts_sampled,
#     sample_reservoir_per_group, sample_weighted,
#     sample_weighted_reservoir;
#   streaming (6): streaming_foreachbatch_ingest, streaming_manifest_tail,
#     streaming_static_join, streaming_stream_stream_left_join,
#     streaming_upsert_ingest, streaming_sessionized (hash-checkable
#     since r7: the closure-predicate sandwich oracle);
#   relational/misc (13 + cbo_plan_memo): cbo_plan_memo (the r8 Selinger memo-dump
#     addition), cbo_vs_dp_report, dataset_card_report,
#     functions_variant, graph_degree_distribution, graph_triangle_count,
#     incremental_join_view, interval_overlap_join, join_shuffle_hash,
#     k_anonymity_audit, late_supplier_blame, source_python_datasink,
#     try_safe_arithmetic, udf_price_score;
#   multimodal (5): multimodal_frame_sample (oracled — hash-checked
#     slot) + the 4 rows-only-by-design decode planes
#     multimodal_audio_features, multimodal_features,
#     multimodal_image_dhash_dedup, multimodal_resize (fresh rows-only
#     driver rows replace their stale r3 `no_oracle` entries);
#   quality (1): quality_classifier_score;
# (The r8 window left zero reds — CORRECTNESS_r08.json is 50/50 — so
# no re-check slots were needed and the list above is exactly the
# never-checked remainder.)
#
# r10+ policy (the backlog is zero once this window lands): evidence
# freshness. Every oracled name then has >= 1 green driver row, but the
# oldest rows date to round 1 — code those names has flowed past for 9
# rounds. Rotate the window through the OLDEST-green cohort first
# (DRIVER_GREENS_R1_3, 77 names incl. sentinels -> two windows), then
# r4, r5, ..., keeping the 4 sentinels pinned; any round's NEW
# operators take slots ahead of re-checks, exactly as in r8/r9.
# next_window() below derives each window from the cohort constants
# so the schedule cannot drift from the sets it samples.
# (The r9 window's 46-name list was retired with the round-10 fold —
# its greens live in DRIVER_GREENS_R9 above; git has the staging list.)
# Operators ADDED during round 9, after the (full) r9 window was
# installed: no driver row until round 10 — next_window() put them at
# the front of the r10 rotation, ahead of freshness re-checks.
R9_ADDITIONS = [
    "index_refresh",
    "rrf_hybrid_search",
    "conformal_intervals",
    "streaming_index_upsert",
    "mmr_diversify_topk",
    "retrieval_ndcg_report",
    "pii_luhn_audit",
]

# Round-10 window (the r9 verdict's tasks 1+3, landed as the first
# commit of round 10): sentinels + the 7 round-9 additions (never
# driver-checked; the entire remaining correctness exposure per the r9
# verdict) + the 4 multimodal decode planes (rows-only through r9, now
# upgraded to FULL value-hash oracles via SQL re-derivation of the LCG
# payload synthesis — their first hash-checkable driver rows) + 35
# freshness re-checks from the OLDEST green cohort (rounds 1-3,
# alphabetical) — their driver rows date to rounds the code has flowed
# past for 7+ rounds. Derived by next_window() below
# (test_catalog_order.py pins the equality), so the staging cannot
# drift from the cohort constants it samples.
# Round-11 window (the r10 verdict's task 3, landed as the first
# commit of round 11): sentinels + 46 freshness re-checks of the
# STALEST driver evidence — ordered by last-green round ascending
# (green_rounds.json, new this round: the r10 window re-proved 36
# rounds-1-3 names, so age-of-FIRST-green alone would have re-sampled
# exactly those and never advanced; last-green ordering walks onto the
# names untouched since rounds 2-4 instead). No never-green names
# remain (cumulative driver coverage is 358/358 per the r10 verdict)
# and no cohort name is hash-stale at staging time, so the window is
# pure freshness rotation. Derived by next_window() below
# (test_catalog_order.py pins the equality), so the staging cannot
# drift from the records it samples. Any operator ADDED during round
# 11 has no driver row yet and spills to the front of the r12 window
# automatically.
# Round-12 window (the r11 window's 46-name list was retired with the
# round-11 fold; git has the staging list): sentinels + the queries the
# r12 optimization batches EDITED (hash-stale vs their r11-proven
# green_hashes.json records — each must be independently re-proven by
# the driver, ahead of pure freshness re-checks) + streaming_index_
# upsert (RED in the r11 drive — ungreen re-entry) + freshness
# re-checks of the stalest last-green evidence (rounds 3-4). Re-derived
# per optimization batch as edits land; test_catalog_order.py pins the
# next_window() equality so the staging can't drift from the records.
R12_PLANNED_WINDOW = [
    # hash-stale: r12 optimization-batch edits (stream-startup retry
    # wrappers, the advisor composite-rank fusion, the concurrent
    # quartile-fixture staging, the measured-and-reverted MAD / knn_ivf
    # experiments whose docstrings record the verdicts, the boilerplate
    # anti-join hint drop, ER cache release, funnel docstring)
    "robust_stats_mad", "source_python_stream", "txn_zonemap_scan",
    "boilerplate_strip", "entity_resolution", "txn_delete_mor",
    "cluster_key_advisor", "pipeline_funnel_report", "knn_ivf",
    "txn_delete_where", "txn_replace_where", "txn_retention_delete",
    "sample_kcenter_coreset", "graph_kcore", "streaming_manifest_tail",
    "index_refresh", "mmr_diversify_topk",
    # red in the r11 drive (startup flake; hardened this round)
    "streaming_index_upsert",
    # freshness re-checks, last-green round ascending
    "join_nonequi",
    "join_semi", "knn_lsh_bucketed", "multimodal_meta",
    "pack_sequences", "pivot", "projection", "range_join_bucketed",
    "recursive_cte_ancestors", "rollup", "scan", "sort_limit",
    "source_python_datasource", "streaming_dedup",
    "streaming_tumbling", "subquery_in", "text_lang_id",
    "text_token_stats", "topk_per_group", "tpch_q15", "udaf_geomean",
    "udtf_split_sentences", "window_running", "approx_aggs",
    "asof_join_forward", "asof_join_salted", "bucketed_colocated_join",
    "curriculum_bins",
]

DRIVER_PRIORITY = DRIVER_SENTINELS + R12_PLANNED_WINDOW


def query_content_hash(name: str) -> str:
    """Freshness key for the driver-window rotation: sha256 over the
    query function's SOURCE plus its oracle SQL. A green driver row
    certifies the code AS IT WAS when the driver ran it; if either the
    query body or its oracle has changed since, the green is stale
    evidence and next_window() re-enters the name ahead of pure
    age-based re-checks (r9 verdict task 7 — rotation keyed on
    (cohort age, code change), not age alone). Helper-function edits
    below the query body don't move the hash — the full-catalog local
    oracle gate (tests/test_queries_oracle.py) covers those every
    round; this key exists so the INDEPENDENT driver check can't be
    coasted on by a silently edited query."""
    import hashlib
    import inspect

    fn, sql = CATALOG[name]
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # builtins/partials: fall back to repr
        src = repr(fn)
    return hashlib.sha256(
        (src + "\n--oracle--\n" + (sql or "")).encode()
    ).hexdigest()


def green_hashes() -> dict[str, str]:
    """Content hashes recorded when each cohort name last went (or was
    re-proven) driver-green — written by scripts/fold_round_greens.py,
    read by next_window(). Missing file / missing name = treat the
    green as stale (re-check eligible)."""
    import json
    import os

    p = os.path.join(os.path.dirname(__file__), "green_hashes.json")
    try:
        with open(p) as f:
            return json.load(f)
    except OSError:
        return {}


def green_rounds() -> dict[str, int]:
    """LAST round each name was driver-proven green (fold AND freshness
    re-check alike) — written by scripts/fold_round_greens.py from each
    round's CORRECTNESS file, backfilled from CORRECTNESS_r01..r10.
    next_window() orders freshness re-checks by this, ascending, so the
    walk visits the STALEST evidence first instead of re-sampling the
    same alphabetical prefix of the oldest first-green cohort every
    round (r10 verdict task 3: rotation must cover the stalest greens —
    first-green cohort age alone cannot see re-checks). Missing file /
    missing name = round 0 (maximally stale)."""
    import json
    import os

    p = os.path.join(os.path.dirname(__file__), "green_rounds.json")
    try:
        with open(p) as f:
            return {k: int(v) for k, v in json.load(f).items()}
    except OSError:
        return {}


def next_window(window: int = 50) -> list[str]:
    """Derive the current round's driver window from the cohort
    constants (policy established round 10; r8-verdict lineage).

    Slots go, in order: (1) the pinned sentinels; (2) any catalog name
    with NO green driver row — by GREEN-COHORT membership, not window
    membership, so a window name whose drive comes back RED re-enters
    automatically instead of being dropped forever (new/unproven
    evidence always outranks freshness); (3) cohort names whose
    query_content_hash() no longer matches the hash recorded at their
    last green (stale evidence — the code or oracle changed since the
    driver proved it), oldest cohort first, alphabetical within; (4)
    freshness re-checks ordered by LAST-green round ascending
    (green_rounds.json — a round-10 re-check of a rounds-1-3 name moves
    it to the back of the freshness queue, so the walk actually
    advances onto the stalest evidence instead of re-sampling the same
    alphabetical prefix of the oldest first-green cohort every round;
    r10 verdict task 3), tie-broken by first-green cohort age then
    name, skipping sentinels (pinned anyway).
    Deterministic, so each round's rotation commit is: fold the prior
    round's greens into a DRIVER_GREENS_RN cohort + refresh
    green_hashes.json/green_rounds.json (scripts/fold_round_greens.py
    prints both), then paste DRIVER_PRIORITY = next_window().
    """
    sentinels = list(DRIVER_SENTINELS)
    taken = set(sentinels)
    out = list(sentinels)
    ungreen = [n for n in CATALOG
               if n not in DRIVER_CHECKED_PRIOR_ROUNDS and n not in taken]
    recorded = green_hashes()
    stale = [
        n
        for cohort in DRIVER_GREEN_COHORTS
        for n in sorted(cohort)
        if n not in taken and recorded.get(n) != query_content_hash(n)
    ]
    last_green = green_rounds()
    fresh_order = sorted(
        (last_green.get(n, 0), ci, n)
        for ci, cohort in enumerate(DRIVER_GREEN_COHORTS)
        for n in cohort
    )
    for name in ungreen + stale + [n for _, _, n in fresh_order]:
        if len(out) >= window:
            break
        if name not in taken:
            taken.add(name)
            out.append(name)
    return out




def _apply_driver_priority() -> None:
    missing = [n for n in DRIVER_PRIORITY if n not in CATALOG]
    assert not missing, f"priority names not registered: {missing}"
    ordered = {n: CATALOG.pop(n) for n in DRIVER_PRIORITY}
    ordered.update(CATALOG)
    CATALOG.clear()
    CATALOG.update(ordered)


_apply_driver_priority()


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in CATALOG.items()}


def oracles() -> dict[str, str]:
    return {name: sql for name, (_, sql) in CATALOG.items() if sql is not None}
