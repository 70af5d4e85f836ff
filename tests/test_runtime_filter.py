"""Runtime bloom-filter join pruning: the row-level analog of dynamic
partition pruning.

When a shuffle join's build side is selectively filtered, Spark can
aggregate a bloom filter over the build keys and apply it as a
``might_contain`` pre-filter on the probe side's scan stage — rows that
cannot join are dropped BEFORE the shuffle. On a 100 TB probe side this
removes most of the shuffle write for selective dim filters; locally we
lower the application-side threshold to trigger the same plan shape.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
    # force a shuffle join: broadcast joins reuse the broadcast for DPP
    # instead, and the bloom path is the one under test here
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _confs(spark, settings):
    old = {}
    for k, v in settings.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _urgent_join(t):
    orders = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    li = t["lineitem"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_prunes_probe_side(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    with _confs(spark, BLOOM_CONFS):
        j = _urgent_join(t)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "no bloom filter built on the dim side"
        assert "might_contain" in plan, "bloom filter not applied to the probe scan"
        with_bloom = {tuple(r) for r in j.collect()}

    off = dict(BLOOM_CONFS, **{
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "false"
    })
    with _confs(spark, off):
        j2 = _urgent_join(t)
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" not in plan2
        without_bloom = {tuple(r) for r in j2.collect()}

    assert with_bloom == without_bloom, "bloom pruning changed the result"
