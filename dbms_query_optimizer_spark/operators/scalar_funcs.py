"""Scalar-function families, grouping sets, lateral explode, exact
percentiles, and analytic window functions.

The reference's query surface is int-only with no scalar vocabulary at all
(SURVEY §1.2, §2.2 "Scalar functions — absent"); a complete engine needs
the datetime / string / array / JSON function families, the full
grouping-set lattice (not just CUBE/ROLLUP), UDTF-style lateral expansion,
and exact quantiles. Everything here is built-in ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen-friendly, zero Python in the hot path.

Scale notes:
- Scalar projections are embarrassingly parallel: no shuffle, fully
  pipelined inside the Parquet scan stage.
- ``explode`` multiplies rows 10-100x — the follow-up aggregation uses
  map-side partial aggregation so the shuffle carries (token, count)
  partials, not raw tokens.
- Exact percentiles shuffle the full column per group; at 100 TB prefer
  ``percentile_approx`` (see ``q_approx_aggs``) — this is the exact
  companion the sketch is validated against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..engine import load_tables


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS lattice — the general form CUBE/ROLLUP
    specialize (SURVEY §2.2). The set list here is deliberately NOT a
    rollup: it includes (status, priority), (priority), () but skips
    (status), so only the explicit-list API can express it.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORACLE_GROUPING_SETS = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


MIN_TOKEN_LEN = 3
MIN_TOKEN_COUNT = 50


def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral expansion (UDTF analog): tokenize every document and count
    corpus-wide token frequencies.

    ``explode`` is Spark's generator/UDTF primitive — one input row fans
    out to one row per token. The groupBy that follows combines map-side,
    so the shuffle moves per-partition (token, count) partials rather than
    the exploded token stream — the difference between shuffling ~N·tokens
    rows and ~distinct-tokens rows at 100 TB.
    """
    t = load_tables(spark, sf_dir)
    tokens = t["documents"].select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token")
    )
    return (
        tokens.filter(F.length("token") >= MIN_TOKEN_LEN)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= MIN_TOKEN_COUNT)
        .orderBy("token")
    )


ORACLE_EXPLODE_TOKENS = f"""
    SELECT token, COUNT(*) AS n_occurrences
    FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
        FROM documents
    )
    WHERE length(token) >= {MIN_TOKEN_LEN}
    GROUP BY token
    HAVING COUNT(*) >= {MIN_TOKEN_COUNT}
    ORDER BY token
"""


def q_functions_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function family: extract / truncate / shift / diff."""
    t = load_tables(spark, sf_dir)
    d = F.to_date("o_orderdate")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            d.alias("order_date"),
            F.quarter("o_orderdate").alias("o_quarter"),
            F.dayofmonth("o_orderdate").alias("o_day"),
            F.dayofweek("o_orderdate").alias("o_dow"),
            F.trunc(d, "month").alias("month_start"),
            F.date_add(d, F.lit(30)).alias("plus_30d"),
            F.last_day("o_orderdate").alias("month_end"),
            F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch0"),
        )
        .orderBy("o_orderkey")
    )


# DuckDB dayofweek is Sunday=0; Spark's is Sunday=1 — the +1 aligns them.
ORACLE_FUNCTIONS_DATETIME = """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(quarter(o_orderdate) AS INT) AS o_quarter,
           CAST(dayofmonth(o_orderdate) AS INT) AS o_day,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS o_dow,
           date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS plus_30d,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
               AS days_since_epoch0
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
"""


def q_functions_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: pad / translate / regex / position / split."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.lpad("p_brand", 12, "*").alias("brand_padded"),
            F.translate("p_name", "aeiou", "AEIOU").alias("name_translated"),
            F.regexp_extract("p_type", "^(\\w+)", 1).alias("type_head"),
            F.instr("p_name", "e").alias("first_e"),
            F.reverse("p_brand").alias("brand_reversed"),
            F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_word1"),
            F.length("p_name").alias("name_len"),
        )
        .orderBy("p_partkey")
    )


ORACLE_FUNCTIONS_STRING = """
    SELECT p_partkey,
           concat_ws('|', p_brand, p_type) AS brand_type,
           lpad(p_brand, 12, '*') AS brand_padded,
           translate(p_name, 'aeiou', 'AEIOU') AS name_translated,
           regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
           CAST(strpos(p_name, 'e') AS INT) AS first_e,
           reverse(p_brand) AS brand_reversed,
           split_part(p_type, ' ', 1) AS type_word1,
           CAST(length(p_name) AS INT) AS name_len
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
"""


def q_functions_array_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + JSON function family over the events table: JSON path
    extraction from the ``props`` payload column and list ops over the
    tokenized event type."""
    t = load_tables(spark, sf_dir)
    toks = F.split("event_type", "_")
    return (
        t["events"]
        .filter(F.col("event_id") <= 500)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
            F.size(toks).alias("n_type_tokens"),
            F.array_contains(toks, "click").cast("int").alias("is_click"),
            F.sort_array(toks).getItem(0).alias("first_token"),
            F.array_join(F.array_distinct(toks), "+").alias("distinct_joined"),
        )
        .orderBy("event_id")
    )


ORACLE_FUNCTIONS_ARRAY_JSON = """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
           CAST(len(string_split(event_type, '_')) AS INT) AS n_type_tokens,
           CAST(list_contains(string_split(event_type, '_'), 'click') AS INT) AS is_click,
           list_sort(string_split(event_type, '_'))[1] AS first_token,
           list_aggregate(list_distinct(string_split(event_type, '_')), 'string_agg', '+')
               AS distinct_joined
    FROM events
    WHERE event_id <= 500
    ORDER BY event_id
"""


def q_functions_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family: construct / lookup / keys — outputs reduced to
    scalars so the oracle stays engine-neutral (DuckDB's MAP rendering
    differs; its oracle computes the same scalars relationally)."""
    t = load_tables(spark, sf_dir)
    m = F.create_map(
        F.lit("nation"), F.col("n_nationkey").cast("string"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return (
        t["nation"]
        .select(
            "n_name",
            F.element_at(m, "nation").cast("int").alias("nation_key"),
            F.element_at(m, "region").cast("int").alias("region_key"),
            F.size(F.map_keys(m)).alias("n_keys"),
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        )
        .orderBy("n_name")
    )


ORACLE_FUNCTIONS_MAP = """
    SELECT n_name,
           CAST(n_nationkey AS INT) AS nation_key,
           CAST(n_regionkey AS INT) AS region_key,
           2 AS n_keys,
           'nation,region' AS keys_sorted
    FROM nation
    ORDER BY n_name
"""


def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of l_extendedprice per return flag.

    ``F.percentile`` is the exact (sort-based) quantile — the tight gate
    the ``percentile_approx`` sketch in ``q_approx_aggs`` is validated
    against. Linear interpolation matches DuckDB's ``quantile_cont``.
    """
    t = load_tables(spark, sf_dir)
    # one percentile(col, array(...)) aggregate: a single sort buffer serves
    # all three quantiles instead of three independent buffers (3x the
    # per-group state and merge traffic at scale)
    qs = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), qs.alias("_qs"))
        .select(
            "l_returnflag",
            "n_rows",
            F.round(F.col("_qs")[0], 4).alias("p25"),
            F.round(F.col("_qs")[1], 4).alias("p50"),
            F.round(F.col("_qs")[2], 4).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_PERCENTILE_EXACT = """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window family — the COMPLETE set: lag / lead /
    row_number / ntile / percent_rank / cume_dist over the running
    frame, plus first_value / last_value / nth_value over the full
    partition frame (explicit ROWS UNBOUNDED..UNBOUNDED — the default
    running frame would make last_value degenerate to the current
    row). Per customer, ordered by the unique order key so every
    function is deterministic; one partitioned sort serves all nine.
    """
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        t["orders"]
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("order_seq"),
            F.lag("o_totalprice", 1).over(w).alias("prev_price"),
            F.lead("o_totalprice", 1).over(w).alias("next_price"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
            F.first("o_totalprice").over(wf).alias("first_price"),
            F.last("o_totalprice").over(wf).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORACLE_WINDOW_ANALYTICS = """
    SELECT o_custkey,
           o_orderkey,
           CAST(row_number() OVER w AS INT) AS order_seq,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cum_dist,
           first_value(o_totalprice) OVER wf AS first_price,
           last_value(o_totalprice) OVER wf AS last_price,
           nth_value(o_totalprice, 2) OVER wf AS second_price
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
"""


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates per return flag: sample
    stddev/variance of quantity plus price~quantity correlation and
    sample covariance.

    All four are single-pass mergeable aggregates (Welford-style partials)
    — map-side combine shrinks the shuffle to one partial state per
    (partition, group), the same shape as SUM at any scale. Extends the
    reference's aggregation surface (COUNT-only, implied by
    `optimizer_test.cc:553`) with the moment family."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("covar_price_qty"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_STATS_MOMENTS = """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS covar_price_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


def q_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG_MAX / MAX_BY: per nation, the customer holding the highest
    account balance (ties broken by highest custkey).

    Expressed as MAX over a (balance, key) struct — lexicographic struct
    comparison makes argmax an ordinary mergeable aggregate with map-side
    combine, instead of a rank-1 window that shuffles every row to sort
    whole partitions. The oracle states the window formulation, proving
    the two are equivalent."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.max(F.struct("c_acctbal", "c_custkey")).alias("_b"),
        )
        .select(
            "c_nationkey",
            "n_customers",
            F.col("_b.c_custkey").alias("top_custkey"),
            F.col("_b.c_acctbal").alias("top_acctbal"),
        )
        .orderBy("c_nationkey")
    )


ORACLE_ARGMAX_PER_GROUP = """
    SELECT c_nationkey, n_customers, top_custkey, top_acctbal
    FROM (
        SELECT c_nationkey,
               c_custkey AS top_custkey,
               c_acctbal AS top_acctbal,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n_customers,
               ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey DESC
               ) AS rn
        FROM customer
    )
    WHERE rn = 1
    ORDER BY c_nationkey
"""


def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda-expression family over array columns in one query:
    transform / filter / exists / aggregate / zip_with / slice.

    Higher-order functions run INSIDE codegen on the array representation —
    no explode/re-group shuffle round-trip and no Python. This is the
    JVM-side fast path for per-row vector math (the Pandas-UDF plane in
    ``similarity.py`` is only for logic these can't express). Casts to
    double happen element-wise before any arithmetic so DuckDB's
    float32-list math can't diverge.
    """
    e = load_tables(spark, sf_dir)["embeddings"]
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    head8 = F.slice(v, 1, 8)
    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.exists(v, lambda x: x > 2.0).alias("any_gt2"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda a, x: a + F.abs(x)), 6
        ).alias("l1_norm"),
        F.round(
            F.aggregate(
                F.zip_with(head8, F.reverse(head8), lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("dot_head_rev"),
    ).orderBy("vec_id")


ORACLE_HIGHER_ORDER_FUNCS = """
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        FROM embeddings
    )
    SELECT vec_id,
           len(list_filter(ve, x -> x > 0)) AS n_pos,
           len(list_filter(ve, x -> x > 2.0)) > 0 AS any_gt2,
           ROUND(list_sum(list_transform(ve, x -> abs(x))), 6) AS l1_norm,
           ROUND(list_dot_product(ve[1:8], list_reverse(ve[1:8])), 6)
               AS dot_head_rev
    FROM v
    ORDER BY vec_id
"""


def q_functions_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4's VARIANT type: ``parse_json`` once
    into the binary variant encoding, then typed ``variant_get`` path
    extraction.

    Variant is the lakehouse answer to string-JSON columns at scale —
    parse once per row into a binary form whose fields are extracted
    without re-tokenizing the text (and, with variant shredding in
    Parquet, without even reading unreferenced fields). The oracle runs
    DuckDB's JSON extraction over the same path; values are typed ints on
    both sides.
    """
    ev = load_tables(spark, sf_dir)["events"]
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_k_gt50"),
        )
        .orderBy("event_type")
    )


ORACLE_FUNCTIONS_VARIANT = """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           MAX(k) AS max_k,
           COUNT(CASE WHEN k > 50 THEN 1 END) AS n_k_gt50
    FROM (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
"""


def q_try_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression evaluation: ``try_divide`` / ``try_cast``
    turn division-by-zero and malformed casts into NULLs instead of task
    failures — the ingest-hardening posture for dirty data at scale (one
    bad row must not kill a 10-hour job).

    p_size = 10 rows make the divisor zero (NULL margin); p_type is never
    numeric (NULL cast). The oracle mirrors with TRY_CAST and an explicit
    NULLIF divisor — DuckDB's double division never raises, so the CASE
    is the semantic twin, not a workaround.
    """
    part = load_tables(spark, sf_dir)["part"]
    return (
        part.select(
            "p_partkey",
            F.try_divide(
                F.col("p_retailprice"), (F.col("p_size") - 10).cast("double")
            ).alias("margin_per_size"),
            F.col("p_type").try_cast("int").alias("type_as_int"),
            F.col("p_partkey")
            .cast("string")
            .try_cast("int")
            .alias("key_roundtrip"),
        )
        .withColumn(
            "n_nulls",
            F.col("margin_per_size").isNull().cast("int")
            + F.col("type_as_int").isNull().cast("int"),
        )
        .orderBy("p_partkey")
    )


ORACLE_TRY_SAFE_ARITHMETIC = """
    SELECT p_partkey,
           p_retailprice / NULLIF(CAST(p_size - 10 AS DOUBLE), 0.0)
               AS margin_per_size,
           TRY_CAST(p_type AS INT) AS type_as_int,
           TRY_CAST(CAST(p_partkey AS VARCHAR) AS INT) AS key_roundtrip,
           (CASE WHEN p_size = 10 THEN 1 ELSE 0 END)
           + (CASE WHEN TRY_CAST(p_type AS INT) IS NULL THEN 1 ELSE 0 END)
               AS n_nulls
    FROM part
    ORDER BY p_partkey
"""


def q_functions_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family — scalar masks/shifts/popcount per key plus
    the BIT_AND/BIT_OR/BIT_XOR aggregates (capability-flag folding). All
    codegen'd integer ops fused into the scan; the aggregate half is a
    single map-side-combinable groupBy."""
    t = load_tables(spark, sf_dir)
    scal = (
        t["orders"]
        .filter(F.col("o_orderkey") <= 400)
        .select(
            "o_orderkey",
            F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("and_lo"),
            F.col("o_orderkey").bitwiseOR(F.lit(4096)).alias("or_hi"),
            F.col("o_orderkey").bitwiseXOR(F.lit(1365)).alias("xor_pat"),
            F.shiftleft(F.col("o_orderkey"), 3).alias("shl3"),
            F.shiftright(F.col("o_orderkey"), 2).alias("shr2"),
            F.bit_count(F.col("o_orderkey")).alias("popcount"),
        )
    )
    aggd = (
        t["orders"]
        .filter(F.col("o_orderkey") <= 400)
        .groupBy(F.pmod(F.col("o_orderkey"), F.lit(4)).alias("grp"))
        .agg(
            F.bit_and("o_orderkey").alias("agg_and"),
            F.bit_or("o_orderkey").alias("agg_or"),
            F.bit_xor("o_orderkey").alias("agg_xor"),
        )
    )
    return (
        scal.join(aggd, F.pmod(F.col("o_orderkey"), F.lit(4)) == F.col("grp"))
        .drop("grp")
        .orderBy("o_orderkey")
    )


ORACLE_FUNCTIONS_BITWISE = """
    WITH scal AS (
        SELECT o_orderkey,
               o_orderkey & 255 AS and_lo,
               o_orderkey | 4096 AS or_hi,
               xor(o_orderkey, 1365) AS xor_pat,
               o_orderkey << 3 AS shl3,
               o_orderkey >> 2 AS shr2,
               CAST(bit_count(o_orderkey) AS INT) AS popcount
        FROM orders WHERE o_orderkey <= 400
    ),
    aggd AS (
        SELECT o_orderkey % 4 AS grp,
               bit_and(o_orderkey) AS agg_and,
               bit_or(o_orderkey) AS agg_or,
               bit_xor(o_orderkey) AS agg_xor
        FROM orders WHERE o_orderkey <= 400
        GROUP BY grp
    )
    SELECT s.o_orderkey, s.and_lo, s.or_hi, s.xor_pat, s.shl3, s.shr2,
           s.popcount, a.agg_and, a.agg_or, a.agg_xor
    FROM scal s JOIN aggd a ON s.o_orderkey % 4 = a.grp
    ORDER BY s.o_orderkey
"""


LATERAL_TOPK_SQL = """
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n,
    LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC
        LIMIT 2
    ) c
    ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
"""


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — per-nation top-2 customers by balance,
    written as the SQL-standard lateral derived table (Spark decorrelates
    the inner ORDER BY ... LIMIT into a per-key rank under the hood, so
    the physical plan is the same windowed top-k as ``topk_per_group``,
    not N correlated executions). The identical statement runs on DuckDB
    as the oracle — this entry pins the SQL surface itself."""
    load_tables(spark, sf_dir)  # registers views
    return spark.sql(LATERAL_TOPK_SQL)


PCTL_CONT_GRID = [50, 90, 99]  # integer-percent probes


def q_percentile_cont_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated percentiles (PERCENTILE_CONT semantics) per event
    type WITHOUT a per-group sort buffer — the 100 TB exact-quantile
    shape. ``q_percentile_exact``'s ``F.percentile`` aggregate holds a
    whole group's values in one executor's sort buffer; here the corpus
    collapses to its per-type VALUE DOMAIN (one row per distinct cent
    value with a count), the cumulative scan runs over that domain, and
    each probe p selects the two order statistics straddling rank
    k = (p·(n−1)) DIV 100 by a conditional aggregate — selection, not
    per-row ranking.

    Exact arithmetic: positions use integer DIV/MOD, and the
    interpolation numerator v_lo·(100−r) + v_hi·r is an exact BIGINT in
    cent-percent units; the emitted percentile is ONE IEEE division by
    100.0. The oracle reformulates independently via per-row
    ROW_NUMBER order statistics, so the hash check certifies the
    domain-collapse selection against the naive ranking.

    The per-type domain window is partitioned by event_type over
    domain-sized frames (distinct cent values), not rows; for an
    unbounded value domain swap in ``relational.distributed_prefix_agg``
    keyed by (type, value) — same contract as ``ks_test_drift``.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    dom = base.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wd = (
        W.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    dom2 = dom.withColumn(
        "below", F.coalesce(F.sum("cnt").over(wd), F.lit(0))
    )
    targets = (
        dom.groupBy("event_type")
        .agg(F.sum("cnt").alias("n"))
        .select(
            "event_type",
            "n",
            F.explode(
                F.array(*[F.lit(p) for p in PCTL_CONT_GRID])
            ).alias("p"),
        )
        .withColumn("pos100", F.col("p").cast("long") * (F.col("n") - 1))
        .withColumn("k", F.expr("pos100 DIV 100"))
        .withColumn("r", F.expr("pos100 % 100"))
        .drop("pos100")
    )
    j = dom2.join(F.broadcast(targets), "event_type")
    sel = j.groupBy("event_type", "p", "n", "k", "r").agg(
        F.min(
            F.when(
                (F.col("below") <= F.col("k"))
                & (F.col("below") + F.col("cnt") > F.col("k")),
                F.col("cents"),
            )
        ).alias("v_lo"),
        F.min(
            F.when(
                (F.col("below") <= F.col("k") + 1)
                & (F.col("below") + F.col("cnt") > F.col("k") + 1),
                F.col("cents"),
            )
        ).alias("v_hi"),
    )
    numer = F.col("v_lo") * (F.lit(100) - F.col("r")) + F.coalesce(
        F.col("v_hi"), F.col("v_lo")
    ) * F.col("r")
    return sel.select(
        "event_type",
        "p",
        "n",
        numer.alias("numer_centpct"),
        (numer.cast("double") / F.lit(100.0)).alias("pctl_cents"),
    ).orderBy("event_type", "p")


def _oracle_percentile_cont_domain() -> str:
    probes = ", ".join(f"({p})" for p in PCTL_CONT_GRID)
    return f"""
WITH base AS (
    SELECT event_type, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
), ranked AS (
    SELECT event_type, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY cents, event_id) AS rn
    FROM base
), ns AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM base GROUP BY event_type
), targets AS (
    SELECT event_type, n, CAST(p AS INT) AS p,
           CAST((p * (n - 1)) // 100 AS BIGINT) AS k,
           CAST((p * (n - 1)) % 100 AS BIGINT) AS r
    FROM ns, (VALUES {probes}) probes(p)
), sel AS (
    SELECT t.event_type, t.p, t.n, t.k, t.r,
           MIN(CASE WHEN rk.rn = t.k + 1 THEN rk.cents END) AS v_lo,
           MIN(CASE WHEN rk.rn = t.k + 2 THEN rk.cents END) AS v_hi
    FROM targets t
    JOIN ranked rk
      ON t.event_type = rk.event_type AND rk.rn IN (t.k + 1, t.k + 2)
    GROUP BY t.event_type, t.p, t.n, t.k, t.r
)
SELECT event_type, p, n,
       CAST(v_lo * (100 - r) + COALESCE(v_hi, v_lo) * r AS BIGINT)
           AS numer_centpct,
       CAST(v_lo * (100 - r) + COALESCE(v_hi, v_lo) * r AS DOUBLE) / 100.0
           AS pctl_cents
FROM sel
ORDER BY event_type, p
"""


def oracles() -> dict[str, tuple]:
    return {
        "percentile_cont_domain": (
            q_percentile_cont_domain,
            _oracle_percentile_cont_domain(),
        ),
        "higher_order_funcs": (q_higher_order_funcs, ORACLE_HIGHER_ORDER_FUNCS),
        "functions_bitwise": (q_functions_bitwise, ORACLE_FUNCTIONS_BITWISE),
        "lateral_topk": (q_lateral_topk, LATERAL_TOPK_SQL),
        "functions_variant": (q_functions_variant, ORACLE_FUNCTIONS_VARIANT),
        "try_safe_arithmetic": (q_try_safe_arithmetic, ORACLE_TRY_SAFE_ARITHMETIC),
        "grouping_sets": (q_grouping_sets, ORACLE_GROUPING_SETS),
        "stats_moments": (q_stats_moments, ORACLE_STATS_MOMENTS),
        "argmax_per_group": (q_argmax_per_group, ORACLE_ARGMAX_PER_GROUP),
        "explode_tokens": (q_explode_tokens, ORACLE_EXPLODE_TOKENS),
        "functions_datetime": (q_functions_datetime, ORACLE_FUNCTIONS_DATETIME),
        "functions_string": (q_functions_string, ORACLE_FUNCTIONS_STRING),
        "functions_array_json": (q_functions_array_json, ORACLE_FUNCTIONS_ARRAY_JSON),
        "functions_map": (q_functions_map, ORACLE_FUNCTIONS_MAP),
        "percentile_exact": (q_percentile_exact, ORACLE_PERCENTILE_EXACT),
        "window_analytics": (q_window_analytics, ORACLE_WINDOW_ANALYTICS),
        "date_dim_generate": (q_date_dim_generate, ORACLE_DATE_DIM_GENERATE),
        "quantile_sketch_mergeable": (
            q_quantile_sketch_mergeable,
            ORACLE_QUANTILE_SKETCH_MERGEABLE,
        ),
        "correlation_matrix": (
            q_correlation_matrix,
            _oracle_correlation_matrix(),
        ),
        "chi_square_independence": (
            q_chi_square_independence,
            ORACLE_CHI_SQUARE_INDEPENDENCE,
        ),
        "weighted_median": (q_weighted_median, ORACLE_WEIGHTED_MEDIAN),
        "audience_overlap_bitmap": (
            q_audience_overlap_bitmap,
            ORACLE_AUDIENCE_OVERLAP_BITMAP,
        ),
        "audience_overlap_sketch": (
            q_audience_overlap_sketch,
            ORACLE_AUDIENCE_OVERLAP_SKETCH,
        ),
        "trend_per_group": (q_trend_per_group, ORACLE_TREND_PER_GROUP),
        "quantile_normalize": (q_quantile_normalize, ORACLE_QUANTILE_NORMALIZE),
    }


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per return flag: the price below which half the
    shipped QUANTITY (not half the rows) sits — the quantity-weighted
    robust center every pricing/inventory analysis wants, and a window
    composition Spark has no builtin for.

    One partitioned sort serves both windows (running weight + total
    weight); the answer is MIN(price) over rows whose cumulative weight
    reaches half the total. Selection, not arithmetic: the result is an
    input value, exact on both engines. Tie blocks are safe under ANY
    intra-tie order: a block qualifies iff its END cumulative weight
    (order-invariant) reaches the threshold, and MIN collapses whichever
    block row crossed first. Integer-valued weights keep every running
    sum exactly representable.
    """
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    wc = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wp = W.partitionBy("l_returnflag")
    c = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(wc).alias("cumw"),
        F.sum("l_quantity").over(wp).alias("totw"),
        F.count(F.lit(1)).over(wp).alias("n_rows"),
    )
    return (
        c.filter(F.col("cumw") >= F.lit(0.5) * F.col("totw"))
        .groupBy("l_returnflag", "totw", "n_rows")
        .agg(F.min("l_extendedprice").alias("wmedian"))
        .select("l_returnflag", "n_rows", "totw", "wmedian")
        .orderBy("l_returnflag")
    )


ORACLE_WEIGHTED_MEDIAN = """
WITH c AS (
    SELECT l_returnflag, l_extendedprice,
           SUM(l_quantity) OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cumw,
           SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS totw,
           COUNT(*) OVER (PARTITION BY l_returnflag) AS n_rows
    FROM lineitem
)
SELECT l_returnflag, n_rows, totw, MIN(l_extendedprice) AS wmedian
FROM c
WHERE cumw >= 0.5 * totw
GROUP BY l_returnflag, totw, n_rows
ORDER BY l_returnflag
"""


CORR_COLS = ("l_discount", "l_extendedprice", "l_quantity", "l_tax")


def q_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix over the lineitem numeric
    columns, in long form — the feature-profiling pass that precedes any
    modeling work on tabular data.

    All C(4,2)+4 = 10 correlations come out of ONE aggregate over ONE
    scan: each F.corr is a single-pass mergeable moment aggregate
    (Welford partials, map-side combined), so the shuffle carries 10
    small states total — the cost is the scan, independent of how many
    pairs are requested. The wide 1-row result is unpivoted to long form
    with stack() (constant-size, driver-free). Extends `stats_moments`
    (one pair per group) to the full matrix.
    """
    t = load_tables(spark, sf_dir)
    pairs = [
        (a, b) for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i:]
    ]
    aggs = [
        F.round(F.corr(a, b), 6).alias(f"c_{i}") for i, (a, b) in enumerate(pairs)
    ]
    wide = t["lineitem"].agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
            )
        )
        .orderBy("col_a", "col_b")
    )


def _oracle_correlation_matrix() -> str:
    pairs = [(a, b) for i, a in enumerate(CORR_COLS) for b in CORR_COLS[i:]]
    selects = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"ROUND(corr({a}, {b}), 6) AS corr FROM lineitem"
        for a, b in pairs
    ]
    return " UNION ALL ".join(selects) + " ORDER BY col_a, col_b"


def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for the (lang x source) corpus
    contingency table: observed vs expected cell counts and each cell's
    chi-square contribution — the data-quality check that a corpus's
    language mix is (or isn't) uniform across sources, per cell so the
    offending cells are visible, with the statistic = SUM(contrib).

    One groupBy builds the contingency table; the row/column margins are
    window sums over the (tiny) table itself — after the first aggregate
    everything is (langs x sources)-sized no matter the corpus. Expected
    counts are integer-product / integer division: deterministic double
    math on both engines.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    margins = (
        cells.withColumn("row_n", F.sum("o").over(W.partitionBy("lang")))
        .withColumn("col_n", F.sum("o").over(W.partitionBy("source")))
        .withColumn("n", F.sum("o").over(W.partitionBy()))
    )
    e = (F.col("row_n") * F.col("col_n")).cast("double") / F.col("n").cast(
        "double"
    )
    return margins.select(
        "lang",
        "source",
        "o",
        F.round(e, 6).alias("e"),
        F.round((F.col("o") - e) * (F.col("o") - e) / e, 6).alias("contrib"),
    ).orderBy("lang", "source")


ORACLE_CHI_SQUARE_INDEPENDENCE = """
WITH cells AS (
    SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
), margins AS (
    SELECT lang, source, o,
           SUM(o) OVER (PARTITION BY lang) AS row_n,
           SUM(o) OVER (PARTITION BY source) AS col_n,
           SUM(o) OVER () AS n
    FROM cells
)
SELECT lang, source, o,
       ROUND(CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE), 6) AS e,
       ROUND((o - CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE))
             * (o - CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS contrib
FROM margins
ORDER BY lang, source
"""


def q_audience_overlap_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types via distributed
    BITMAP indexes — the roaring-bitmap / BI "segment intersection"
    pattern: user sets are packed 32 users per word
    (word = user_id / 32, bit = user_id % 32 — bit 63 would overflow
    DuckDB's checked << at the boundary, so the ladder stops at 31;
    a production Spark-only bitmap uses all 64), OR-aggregated per type,
    intersections are word-aligned AND + popcount, and Jaccard follows
    from the three exact cardinalities.

    Scale shape: the shuffle carries (types x words) words — a 32x+
    compression of the distinct (type, user) pairs and INDEPENDENT of
    event count; the pairwise stage joins bitmap-sized frames only. The
    same layout extends to billions of users (words stay sparse: absent
    word = no members). Everything is exact integer bit math — no
    rounding contract needed except the final Jaccard ratio.
    """
    ev = load_tables(spark, sf_dir)["events"]
    words = (
        ev.select(
            "event_type",
            (F.col("user_id") / 32).cast("long").alias("word"),
            # python shiftleft() wants a literal shift; the SQL form takes
            # a column amount
            F.expr("shiftleft(1L, CAST(user_id % 32 AS INT))").alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    a = words.select(
        F.col("event_type").alias("type_a"), "word", F.col("bits").alias("ba")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), "word", F.col("bits").alias("bb")
    )
    pair_counts = (
        a.join(b, "word")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb")))).alias("n_both"))
    )
    sizes = words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_users")
    )
    return (
        pair_counts.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


ORACLE_AUDIENCE_OVERLAP_BITMAP = """
WITH words AS (
    SELECT event_type, CAST(user_id // 32 AS BIGINT) AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
    FROM events GROUP BY event_type, word
), sizes AS (
    SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users FROM words
    GROUP BY event_type
), pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS n_both
    FROM words a JOIN words b USING (word)
    WHERE a.event_type < b.event_type
    GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, sa.n_users AS n_a, sb.n_users AS n_b, p.n_both,
       ROUND(CAST(p.n_both AS DOUBLE)
             / CAST(sa.n_users + sb.n_users - p.n_both AS DOUBLE), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.event_type = p.type_a
JOIN sizes sb ON sb.event_type = p.type_b
ORDER BY type_a, type_b
"""


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (quantile matching): every 'view' value is
    mapped onto the 'purchase' value distribution at the same quantile
    rank — the calibration transform behind score alignment across
    models, batch-effect correction, and making two sources' features
    comparable before a join on thresholds.

    All-integer rank math: rank_b over the source distribution,
    target position = ceil(rank_b · nA / nB) computed as
    (rank·nA + nB − 1) div nB — exact, no float quantile anywhere — and
    the normalized value is A's order statistic AT that position, an
    input value selected, not computed. Both global ranks are the
    DISTRIBUTED range-partitioned row_number (driver-computed quantile
    cuts on ``value`` → parallel partition-local numbering + an
    n_parts-row broadcast offset table; ``relational.
    distributed_row_number``) — no single-partition window, so the rank
    survives the full event log. One equi-join on position finishes the
    mapping.
    """
    from .relational import distributed_row_number, range_bucket

    ev = load_tables(spark, sf_dir)["events"]
    n_parts = 16
    a_in = ev.filter(F.col("event_type") == "purchase").select("value", "event_id")
    a, n_a = distributed_row_number(
        a_in, ["value", "event_id"], range_bucket(a_in, "value", n_parts),
        n_parts, rn_col="pos", return_total=True,
    )
    b_in = ev.filter(F.col("event_type") == "view").select("event_id", "value")
    b, n_b = distributed_row_number(
        b_in, ["value", "event_id"], range_bucket(b_in, "value", n_parts),
        n_parts, rn_col="rank_b", return_total=True,
    )
    # integer floor division like the oracle's `//` — a double quotient
    # cast to long can round across an integer boundary once
    # rank_b * n_a exceeds 2^53
    target = F.expr(f"(rank_b * {n_a}L + {n_b - 1}L) DIV {n_b}L")
    return (
        b.withColumn("pos", target)
        .join(
            a.select("pos", F.col("value").alias("normalized_value")), "pos"
        )
        .select("event_id", "value", "rank_b", "normalized_value")
        .orderBy("event_id")
    )


ORACLE_QUANTILE_NORMALIZE = """
WITH a AS (
    SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS pos
    FROM events WHERE event_type = 'purchase'
), b AS (
    SELECT event_id, value,
           ROW_NUMBER() OVER (ORDER BY value, event_id) AS rank_b
    FROM events WHERE event_type = 'view'
), sizes AS (
    SELECT (SELECT COUNT(*) FROM a) AS n_a, (SELECT COUNT(*) FROM b) AS n_b
)
SELECT b.event_id, b.value, b.rank_b, a.value AS normalized_value
FROM b CROSS JOIN sizes s
JOIN a ON a.pos = (b.rank_b * s.n_a + s.n_b - 1) // s.n_b
ORDER BY b.event_id
"""


def q_trend_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of daily event volume: OLS slope/intercept/R²
    of count ~ day-index — the "is this segment growing?" regression every
    metrics dashboard fits, as single-pass mergeable aggregates.

    The raw scan collapses to (type, day) counts first; the regression
    functions (regr_slope / regr_intercept / corr) are Welford-style
    moment aggregates over that tiny frame — the same merge algebra as
    AVG, so the plan scales like a count, not like a model fit. Day
    index is an integer (days since the global min date) so the x side
    is exact on both engines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    lo = ev.agg(F.min(F.to_date("ts")).alias("lo"))
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(lo))
        .select(
            "event_type",
            F.datediff("day", "lo").cast("double").alias("x"),
            F.col("n").cast("double").alias("y"),
        )
    )
    r2 = F.corr("y", "x") * F.corr("y", "x")
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.regr_slope("y", "x"), 6).alias("slope"),
            F.round(F.regr_intercept("y", "x"), 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .orderBy("event_type")
    )


ORACLE_TREND_PER_GROUP = """
WITH lo AS (
    SELECT MIN(CAST(ts AS DATE)) AS lo FROM events
), daily AS (
    SELECT event_type,
           CAST(datediff('day', lo.lo, CAST(ts AS DATE)) AS DOUBLE) AS x,
           CAST(COUNT(*) AS DOUBLE) AS y
    FROM events, lo
    GROUP BY event_type, CAST(ts AS DATE), lo.lo
)
SELECT event_type,
       COUNT(*) AS n_days,
       ROUND(regr_slope(y, x), 6) AS slope,
       ROUND(regr_intercept(y, x), 6) AS intercept,
       ROUND(corr(y, x) * corr(y, x), 6) AS r2
FROM daily
GROUP BY event_type
ORDER BY event_type
"""


def q_audience_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based audience overlap — the approximate twin of
    ``q_audience_overlap_bitmap`` for when exact bitmaps are too big:
    one Datasketches HLL per event type (mergeable, KBs regardless of
    audience size), pairwise union via ``hll_union``, intersection by
    inclusion-exclusion |A|+|B|−|A∪B|. At 100 TB this is the shape that
    survives: per-type sketches build in one pass and every pairwise
    estimate is a driver-free sketch merge — no per-pair data scan.

    Oracle-ability follows the ``approx_aggs`` recipe: the EXACT
    cardinalities (DuckDB recomputes them) ride alongside the estimates,
    and the hash-checked columns are exact values + booleans asserting
    each estimate met its error bound (union within 5 %; the
    inclusion-exclusion intersection inherits ~3 sketch errors, bounded
    against the union size). The estimates themselves are
    engine-specific sketch outputs and deliberately NOT hashed.
    """
    ev = load_tables(spark, sf_dir)["events"]
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_exact").alias("n_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_exact").alias("n_b"),
    )
    exact = ev.select("event_type", "user_id").distinct()
    exact_inter = (
        exact.toDF("type_a", "user_id")
        .join(exact.toDF("type_b", "u2"), F.col("user_id") == F.col("u2"))
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    est_union = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            est_union.alias("est_union"),
        )
        .join(exact_inter, ["type_a", "type_b"])
    )
    exact_union = F.col("n_a") + F.col("n_b") - F.col("n_both")
    est_inter = (F.col("n_a") + F.col("n_b") - F.col("est_union")).cast("double")
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_both",
        (F.abs(F.col("est_union") - exact_union) <= 0.05 * exact_union).alias(
            "union_in_bound"
        ),
        (F.abs(est_inter - F.col("n_both")) <= 0.10 * exact_union).alias(
            "inter_in_bound"
        ),
    ).orderBy("type_a", "type_b")


ORACLE_AUDIENCE_OVERLAP_SKETCH = """
WITH sets AS (
    SELECT DISTINCT event_type, user_id FROM events
), sizes AS (
    SELECT event_type, COUNT(*) AS n_users FROM sets GROUP BY event_type
), pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both
    FROM sets a JOIN sets b USING (user_id)
    WHERE a.event_type < b.event_type
    GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, sa.n_users AS n_a, sb.n_users AS n_b, p.n_both,
       TRUE AS union_in_bound,
       TRUE AS inter_in_bound
FROM pairs p
JOIN sizes sa ON sa.event_type = p.type_a
JOIN sizes sb ON sb.event_type = p.type_b
ORDER BY type_a, type_b
"""


QSKETCH_BINS = 64
QSKETCH_SHARDS = 8
QSKETCH_QS = (0.5, 0.9, 0.99)


def q_quantile_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width-histogram quantile sketch — the distributed
    quantile pattern where exact sort is unaffordable: each shard builds
    a fixed-size histogram (64 bins over the [min, max] range), shard
    sketches MERGE by plain bin-count addition (the query materializes
    the per-shard partials and the merge as two explicit groupBys, the
    map-combine / reduce-merge split a 1000-executor run would use), and
    the quantile estimate is the left edge of the first bin whose
    cumulative count reaches rank ceil(q*n). Per (type, q) the estimate
    is compared against the true rank-ceil(q*n) order statistic; the
    ``within_bound`` column certifies the histogram-quantile error law
    |est − exact| ≤ bin_width.

    The companion of ``q_approx_hll_mergeable`` (mergeable distinct
    sketch) and ``q_percentile_exact`` (the exact gate): unlike
    percentile_approx this sketch's merge algebra is laid out in the
    plan itself, and unlike KLL it is fully SQL-expressible — so the
    WHOLE sketch path gets a value-level DuckDB oracle, no rows-only
    weakening. The exact order statistic is the one per-type sort
    (verification column — at 100 TB you drop it, keep the sketch).

    Determinism: bin ids, cumulative ranks, and edges are integer or
    same-operation-order double math on both engines; no decimal-scale
    ROUND anywhere (the e4/scale-0 lesson from q_events_resample_interp).
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "event_id", "value"
    )
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(QSKETCH_BINS))
    binned = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "event_id",
        "value",
        F.least(
            F.lit(QSKETCH_BINS - 1),
            F.floor((F.col("value") - F.col("lo")) / width),
        )
        .cast("int")
        .alias("bin"),
    )
    # shard partials -> merged sketch: addition is the whole merge algebra
    partials = binned.groupBy(
        "event_type", F.pmod("event_id", F.lit(QSKETCH_SHARDS)).alias("shard"), "bin"
    ).agg(F.count(F.lit(1)).alias("pn"))
    merged = partials.groupBy("event_type", "bin").agg(F.sum("pn").alias("n"))
    cums = merged.select(
        "event_type",
        "bin",
        F.sum("n")
        .over(W.partitionBy("event_type").orderBy("bin"))
        .alias("cum"),
    )
    qrows = stats.select(
        "event_type",
        "lo",
        "hi",
        "n_rows",
        F.explode(F.array(*[F.lit(q) for q in QSKETCH_QS])).alias("q"),
    ).withColumn("p", F.ceil(F.col("q") * F.col("n_rows")))
    sel = (
        F.broadcast(qrows)
        .join(cums, "event_type")
        .filter(F.col("cum") >= F.col("p"))
        .groupBy("event_type", "q", "lo", "hi", "n_rows", "p")
        .agg(F.min("bin").alias("qbin"))
    )
    ranked = ev.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("event_type").orderBy("value", "event_id")),
    )
    exact = F.broadcast(qrows.select("event_type", "q", "p")).join(
        ranked, ["event_type"]
    ).filter(F.col("rn") == F.col("p")).select(
        "event_type", "q", F.col("value").alias("exact_disc")
    )
    est = F.col("lo") + F.col("qbin").cast("double") * (
        (F.col("hi") - F.col("lo")) / F.lit(float(QSKETCH_BINS))
    )
    bw = (F.col("hi") - F.col("lo")) / F.lit(float(QSKETCH_BINS))
    return (
        sel.join(exact, ["event_type", "q"])
        .select(
            "event_type",
            "q",
            "n_rows",
            "p",
            est.alias("est"),
            "exact_disc",
            (F.abs(est - F.col("exact_disc")) <= bw).alias("within_bound"),
        )
        .orderBy("event_type", "q")
    )


ORACLE_QUANTILE_SKETCH_MERGEABLE = f"""
WITH stats AS (
    SELECT event_type, MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n_rows
    FROM events GROUP BY event_type
), binned AS (
    SELECT e.event_type, e.event_id, e.value,
           CAST(LEAST({QSKETCH_BINS - 1},
                FLOOR((e.value - s.lo) / ((s.hi - s.lo) / {QSKETCH_BINS}.0)))
                AS INT) AS bin
    FROM events e JOIN stats s USING (event_type)
), partials AS (
    SELECT event_type, event_id % {QSKETCH_SHARDS} AS shard, bin, COUNT(*) AS pn
    FROM binned GROUP BY event_type, shard, bin
), merged AS (
    SELECT event_type, bin, SUM(pn) AS n FROM partials GROUP BY event_type, bin
), cums AS (
    SELECT event_type, bin,
           SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum
    FROM merged
), qrows AS (
    SELECT event_type, lo, hi, n_rows, q,
           CAST(CEIL(q * n_rows) AS BIGINT) AS p
    FROM stats, (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                         (CAST(0.99 AS DOUBLE))) v(q)
), sel AS (
    SELECT qr.event_type, qr.q, qr.lo, qr.hi, qr.n_rows, qr.p,
           MIN(c.bin) AS qbin
    FROM qrows qr JOIN cums c USING (event_type)
    WHERE c.cum >= qr.p
    GROUP BY qr.event_type, qr.q, qr.lo, qr.hi, qr.n_rows, qr.p
), ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value, event_id
           ) AS rn
    FROM events
), exact AS (
    SELECT qr.event_type, qr.q, r.value AS exact_disc
    FROM qrows qr JOIN ranked r
      ON r.event_type = qr.event_type AND r.rn = qr.p
)
SELECT s.event_type, s.q, s.n_rows, s.p,
       s.lo + CAST(s.qbin AS DOUBLE) * ((s.hi - s.lo) / {QSKETCH_BINS}.0) AS est,
       x.exact_disc,
       (ABS(s.lo + CAST(s.qbin AS DOUBLE) * ((s.hi - s.lo) / {QSKETCH_BINS}.0)
            - x.exact_disc)
        <= (s.hi - s.lo) / {QSKETCH_BINS}.0) AS within_bound
FROM sel s JOIN exact x ON x.event_type = s.event_type AND x.q = s.q
ORDER BY s.event_type, s.q
"""


def q_date_dim_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated date dimension (1995-2001): the no-input generator source
    every warehouse needs, built from sequence()+explode — rows exist only
    as a constant-folded expression until the explode, no file scan at all.
    dayofweek is Spark's Sunday=1 convention (the oracle shifts DuckDB's
    Sunday=0 to match)."""
    del sf_dir  # pure generator — no tables
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("date"),
                    F.lit("2001-12-31").cast("date"),
                )
            ).alias("d")
        )
        .select(
            "d",
            F.year("d").alias("y"),
            F.quarter("d").alias("q"),
            F.month("d").alias("m"),
            F.dayofmonth("d").alias("dom"),
            F.dayofweek("d").alias("dow"),
            (F.dayofmonth("d") == 1).alias("is_month_start"),
        )
        .orderBy("d")
    )


ORACLE_DATE_DIM_GENERATE = """
SELECT d, year(d) AS y, quarter(d) AS q, month(d) AS m,
       day(d) AS dom, dayofweek(d) + 1 AS dow,
       (day(d) = 1) AS is_month_start
FROM (SELECT CAST(UNNEST(generate_series(DATE '1995-01-01', DATE '2001-12-31',
                                         INTERVAL 1 DAY)) AS DATE) AS d)
ORDER BY d
"""
