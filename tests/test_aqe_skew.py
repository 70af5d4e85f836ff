"""AQE skew-join splitting: the runtime complement to manual salting.

`join_salted_skew` rewrites the plan statically; AQE instead DETECTS the
oversized shuffle partition from map-output statistics at runtime and
splits it across tasks (`AQEShuffleRead skewed`, `SortMergeJoin(skew=true)`)
with the dim side replicated per split — no query rewrite. At 100 TB this
is the first line of defense for unpredicted hot keys; salting remains for
skew AQE can't split (e.g. a downstream-partitioning constraint without
forceOptimizeSkewedJoin).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .test_runtime_filter import _confs

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
    # keep it a shuffle join: broadcast would dodge the skew entirely
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}

N = 2_000_000


def _skewed_join(spark):
    # half the fact rows share ONE key; dim keys are unique
    fact = spark.range(N).select(
        F.when(F.col("id") < N // 2, F.lit(0)).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = (
        spark.range(1, N)
        .select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        .unionByName(
            spark.range(1).select(
                F.lit(0).cast("long").alias("k"), F.lit("hot").alias("tag")
            )
        )
    )
    return fact.join(dim, "k")


def test_aqe_splits_skewed_partition(spark, sf_dir):
    with _confs(spark, SKEW_CONFS):
        # collect() executes THIS DataFrame's QueryExecution, so the final
        # adaptive plan (with any skew handling) is inspectable on it.
        # Keep the high-entropy v column: skew detection reads COMPRESSED
        # shuffle sizes, and a constant-key-only row compresses below the
        # detection threshold.
        j = _skewed_join(spark).select("k", "v")
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert len(rows) == N  # every fact row matched exactly one dim row
    assert "skew=true" in plan, "AQE did not mark the join as skew-handled"
    assert "AQEShuffleRead skewed" in plan, "hot partition was not split"
