"""Vectorized Python UDF surface: scalar pandas_udf and grouped-agg
pandas_udf (UDAF).

The reference has no UDF machinery (SURVEY §2.2). Spark's UDF ladder, worst
to best: row-at-a-time Python UDF (never used in this repo) << Arrow-batched
``pandas_udf`` << built-in JVM function. These two queries pin the middle
rung with exact oracles:

- ``q_udf_price_score`` computes the same expression through BOTH the
  built-in column path and a scalar pandas_udf, so the DuckDB oracle proves
  the Arrow transfer is numerically exact (and the two columns must agree
  row by row).
- ``q_udaf_geomean`` is a grouped-agg pandas_udf — the custom-aggregate
  shape Spark built-ins can't express directly (geometric mean), reduced
  per group in numpy.

Scale: scalar pandas_udfs stream Arrow record batches executor-side (no
driver involvement, no per-row serde); grouped-agg UDFs shuffle each group
to one worker — fine for bounded groups (here: 3 return flags), wrong for
unbounded ones; the docstring of each production use must say which.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..engine import load_tables
from ..functions.numeric import dec, disc_price_expr


# pandas_udf() parses its DDL return type against the ACTIVE session, so the
# wrappers are built lazily inside each query, not at import time.


def _price_score_fn(price: pd.Series, qty: pd.Series) -> pd.Series:
    # log-scaled price-per-unit, squashed to (0, 1) — numpy over Arrow batches
    return 1.0 / (1.0 + np.exp(-np.log1p(price / qty.clip(lower=1.0)) / 10.0))


def q_udf_price_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf vs built-in expression, side by side.

    ``score_udf`` (Arrow batch -> numpy) and ``score_builtin`` (JVM codegen)
    compute the identical formula; the oracle checks both, so any Arrow
    transfer or dtype drift fails the value hash.
    """
    t = load_tables(spark, sf_dir)
    _price_score = pandas_udf(_price_score_fn, "double")
    builtin = 1.0 / (
        1.0
        + F.exp(
            -F.log1p(F.col("l_extendedprice") / F.greatest(F.col("l_quantity"), F.lit(1.0)))
            / 10.0
        )
    )
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(_price_score("l_extendedprice", "l_quantity"), 9).alias("score_udf"),
            F.round(builtin, 9).alias("score_builtin"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


ORACLE_UDF_PRICE_SCORE = """
    SELECT l_orderkey, l_linenumber,
           ROUND(1.0 / (1.0 + exp(-ln(1 + l_extendedprice / greatest(l_quantity, 1.0)) / 10.0)), 9)
               AS score_udf,
           ROUND(1.0 / (1.0 + exp(-ln(1 + l_extendedprice / greatest(l_quantity, 1.0)) / 10.0)), 9)
               AS score_builtin
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
"""


def _geomean_fn(prices: pd.Series) -> float:
    return float(np.exp(np.log(prices.to_numpy()).mean()))


def _count_fn(prices: pd.Series) -> int:
    # grouped-agg UDFs can't mix with JVM aggregates in one agg(), so the
    # row count rides the same Arrow path
    return len(prices)


def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: geometric mean of extended price per return
    flag — an aggregate Spark has no built-in for. Groups here are few and
    bounded (3 flags), the safe regime for grouped-agg UDFs."""
    t = load_tables(spark, sf_dir)
    _geomean = pandas_udf(_geomean_fn, "double")
    _count = pandas_udf(_count_fn, "long")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            _count("l_extendedprice").alias("n_rows"),
            F.round(_geomean("l_extendedprice"), 4).alias("geomean_price"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_UDAF_GEOMEAN = """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(exp(avg(ln(l_extendedprice))), 4) AS geomean_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


UDTF_DOC_LIMIT = 100  # keep the per-sentence result set bounded


def q_udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (PySpark 4 table function): one document row in,
    one row per sentence out, used via LATERAL in SQL.

    Completes the UDF ladder's table-function rung alongside the scalar
    pandas_udf and grouped-agg UDAF. The UDTF runs executor-side over
    Arrow batches; sent_no indexes ALL '.'-separated parts (empty parts
    skipped but counted), matching the SQL oracle's ordinality arithmetic.

    Scale: a UDTF is a per-row generator — embarrassingly parallel, no
    shuffle; prefer JVM explode/split when the transform is expressible
    (see explode_tokens), reach for a UDTF when per-row Python logic is
    genuinely needed.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_no int, sentence string")
    class SplitSentences:
        def eval(self, doc_id, text):  # noqa: ANN001 - Spark infers from DDL
            if text is None:
                return
            for i, part in enumerate(text.split(".")):
                s = part.strip(" \t\n\r")
                if s:
                    yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    docs = load_tables(spark, sf_dir)["documents"]
    docs.filter(F.col("doc_id") < UDTF_DOC_LIMIT).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_no, s.sentence
        FROM _udtf_docs d, LATERAL split_sentences(d.doc_id, d.text) s
        ORDER BY d.doc_id, s.sent_no
        """
    )


ORACLE_UDTF_SPLIT_SENTENCES = f"""
    SELECT doc_id, ord - 1 AS sent_no, trim(part, ' \t\n\r') AS sentence
    FROM (
        SELECT doc_id,
               unnest(string_split(text, '.')) AS part,
               generate_subscripts(string_split(text, '.'), 1) AS ord
        FROM documents
        WHERE doc_id < {UDTF_DOC_LIMIT}
    )
    WHERE trim(part, ' \t\n\r') <> ''
    ORDER BY doc_id, sent_no
"""


def q_arrow_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-overhead Python rung: raw pyarrow
    RecordBatches in and out, no pandas conversion at all (the right
    call when the computation is itself Arrow-native — pyarrow.compute
    kernels here: utf8 length, whitespace split-count). Per-doc results
    then aggregate per language JVM-side. The DuckDB oracle recomputes
    the same quantities relationally, proving the Arrow kernel path
    value-identical to SQL semantics.

    Scale: batches stream executor-side exactly like mapInPandas, minus
    the pandas materialization — for wide binary/text columns the saved
    copy is the difference between one and two in-memory copies per
    batch.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "lang", "text")

    def stats(batches):
        for batch in batches:
            text = batch.column(2)
            n_chars = pc.utf8_length(text)
            # tokens = whitespace splits: count_substring(' ') + 1
            n_tokens = pc.add(pc.count_substring(text, " "), 1)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), n_chars, n_tokens],
                ["doc_id", "lang", "n_chars", "n_tokens"],
            )

    per_doc = docs.mapInArrow(
        stats, schema="doc_id long, lang string, n_chars int, n_tokens long"
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )


ORACLE_ARROW_MAP_STATS = """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
"""


COGROUP_CUST_LIMIT = 300  # bounded output: customers with custkey < limit


def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the two-table keyed-batch API: orders and
    (lineitem ⋈ orders-key) shuffle ON THE SAME KEY and arrive as PAIRED
    pandas frames per customer, reconciled in one Python pass (order
    count + header total vs item count + line revenue). The shape for
    side-by-side entity resolution / ledger reconciliation where per-key
    logic needs BOTH tables' rows at once and a join would force the
    pairing logic into SQL.

    Money is moved as integer CENTS (exact in int64, immune to float
    summation order), so the DuckDB oracle — the equivalent join of two
    aggregates — must match to the cent. Scale: each cogroup sees one
    customer's rows; skew bounded by the largest single key, the same
    contract as any keyed applyInPandas.
    """
    t = load_tables(spark, sf_dir)
    orders = (
        t["orders"]
        .filter(F.col("o_custkey") < COGROUP_CUST_LIMIT)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(dec("o_totalprice") * 100).cast("long").alias("total_cents"),
        )
    )
    okeys = (
        t["orders"]
        .filter(F.col("o_custkey") < COGROUP_CUST_LIMIT)
        .select(
            F.col("o_orderkey").alias("ok_orderkey"),
            F.col("o_custkey").alias("ok_custkey"),
        )
    )
    items = (
        t["lineitem"]
        .join(okeys, F.col("l_orderkey") == F.col("ok_orderkey"))
        .select(
            F.col("ok_custkey").alias("o_custkey"),
            F.round(disc_price_expr() * 10000).cast("long").alias("rev_tenthmills"),
        )
    )

    def reconcile(key, odf: pd.DataFrame, idf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": [int(key[0])],
                "n_orders": [len(odf)],
                "sum_total_cents": [int(odf["total_cents"].sum())],
                "n_items": [len(idf)],
                "sum_rev_tenthmills": [int(idf["rev_tenthmills"].sum())],
            }
        )

    return (
        orders.groupBy("o_custkey")
        .cogroup(items.groupBy("o_custkey"))
        .applyInPandas(
            reconcile,
            schema=(
                "o_custkey long, n_orders long, sum_total_cents long, "
                "n_items long, sum_rev_tenthmills long"
            ),
        )
        .orderBy("o_custkey")
    )


ORACLE_COGROUP_RECONCILE = f"""
    WITH o AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT))
                   AS BIGINT) AS sum_total_cents
        FROM orders WHERE o_custkey < {COGROUP_CUST_LIMIT}
        GROUP BY o_custkey
    ),
    i AS (
        SELECT o_custkey, COUNT(*) AS n_items,
               CAST(SUM(CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000) AS BIGINT))
                   AS BIGINT) AS sum_rev_tenthmills
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey < {COGROUP_CUST_LIMIT}
        GROUP BY o_custkey
    )
    SELECT o.o_custkey, o.n_orders, o.sum_total_cents,
           COALESCE(i.n_items, 0) AS n_items,
           COALESCE(i.sum_rev_tenthmills, 0) AS sum_rev_tenthmills
    FROM o LEFT JOIN i USING (o_custkey)
    ORDER BY o_custkey
"""


def oracles() -> dict[str, tuple]:
    return {
        "udf_price_score": (q_udf_price_score, ORACLE_UDF_PRICE_SCORE),
        "cogroup_reconcile": (q_cogroup_reconcile, ORACLE_COGROUP_RECONCILE),
        "arrow_map_stats": (q_arrow_map_stats, ORACLE_ARROW_MAP_STATS),
        "udaf_geomean": (q_udaf_geomean, ORACLE_UDAF_GEOMEAN),
        "udtf_split_sentences": (q_udtf_split_sentences, ORACLE_UDTF_SPLIT_SENTENCES),
    }
