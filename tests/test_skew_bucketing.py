"""Scale-pathology machinery: salted joins and bucketed co-located joins.

These pin the two static answers to shuffle problems the engine's docs
promise: salting splits a hot key across partitions without changing the
join result, and bucketing lets equal-bucketed tables join with NO
shuffle exchange at all.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.functions.joins import salted_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    lineitem = t["lineitem"].select("l_orderkey", "l_quantity")
    orders = t["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )

    plain = lineitem.join(orders, "l_orderkey").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q")
    )
    salted = salted_join(lineitem, orders, "l_orderkey", n_salt=4)
    salted_agg = salted.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted_agg.collect()))


def test_salted_join_spreads_hot_key(spark):
    """A 100%-skewed key must land in multiple (key, salt) groups."""
    hot = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    dim = spark.createDataFrame([(7, "x")], "k int, v string")
    out = salted_join(hot, dim, "k", n_salt=8)
    assert out.count() == 1000
    n_salts = (
        hot.withColumn("s", F.pmod(F.xxhash64(*hot.columns), F.lit(8)))
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts > 1, "salt must spread a hot key across partitions"


def test_salted_join_pins_shuffled_hash_strategy(spark):
    """The salted exchange IS the utility's contract (r12): without the
    SHUFFLE_HASH pin the planner broadcast-joins whenever the replicated
    dim side fits its estimate — erasing the salted shuffle the demo
    queries exist to prove, and building the n_salt-times-inflated
    relation single-threaded on the driver."""
    fact = spark.range(2000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plan = _plan(salted_join(fact, dim, "k", n_salt=4))
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Both sides bucketed+sorted on the join key => the sort-merge join
    reads buckets directly: zero Exchange operators in the plan."""
    t = load_tables(spark, sf_dir)
    suffix = uuid.uuid4().hex[:8]
    lt, ot = f"lineitem_b_{suffix}", f"orders_b_{suffix}"
    try:
        (
            t["lineitem"]
            .select("l_orderkey", "l_quantity", "l_extendedprice")
            .write.bucketBy(4, "l_orderkey")
            .sortBy("l_orderkey")
            .format("parquet")
            .saveAsTable(lt)
        )
        (
            t["orders"]
            .select("o_orderkey", "o_totalprice")
            .write.bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .format("parquet")
            .saveAsTable(ot)
        )
        # bucketed scans must not re-shuffle; broadcast would also defeat
        # the point of the test, so pin the join strategy with a hint
        joined = spark.table(lt).hint("merge").join(
            spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
