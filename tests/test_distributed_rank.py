"""Property tests for the distributed global-rank machinery.

``relational.distributed_row_number`` must agree EXACTLY with the naive
single-partition ``row_number() OVER (ORDER BY ...)`` on any input —
duplicates, skewed buckets, empty buckets, one row, descending orders —
because every catalog query that uses it (sample_systematic,
quantile_normalize, rfm_segmentation, shard_assignment_balanced,
stats_equidepth_histogram, global_row_number) hashes against an oracle
that uses the plain window. ``exact_ntile`` must likewise reproduce the
NTILE window function from (rank, N) alone.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dbms_query_optimizer_spark.operators.relational import (
    distributed_row_number,
    exact_ntile,
    range_bucket,
)


@st.composite
def frames(draw):
    # values deliberately collide often to exercise tie-breaking
    vals = draw(
        st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=60)
    )
    n_parts = draw(st.sampled_from([1, 2, 3, 7]))
    return vals, n_parts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frames())
def test_distributed_rank_matches_global_window(spark, case):
    vals, n_parts = case
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    naive = df.withColumn("rn", F.row_number().over(W.orderBy("v", "id")))
    pid = range_bucket(df, "v", n_parts)
    dist = distributed_row_number(
        df, [F.col("v").asc(), F.col("id").asc()], pid, n_parts
    )
    assert sorted(map(tuple, naive.collect())) == sorted(
        map(tuple, dist.collect())
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frames())
def test_distributed_rank_matches_descending(spark, case):
    vals, n_parts = case
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    naive = df.withColumn(
        "rn", F.row_number().over(W.orderBy(F.col("v").desc(), F.col("id")))
    )
    pid = range_bucket(df, "v", n_parts, descending=True)
    dist = distributed_row_number(
        df, [F.col("v").desc(), F.col("id").asc()], pid, n_parts
    )
    assert sorted(map(tuple, naive.collect())) == sorted(
        map(tuple, dist.collect())
    )


@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (6, 5), (23, 5), (100, 7)])
def test_exact_ntile_matches_window(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
    via_window = (
        spark.range(n)
        .withColumn("q", F.ntile(k).over(W.orderBy("id")))
        .select((F.col("id") + 1).alias("rn"), "q")
    )
    via_formula = df.select("rn", exact_ntile("rn", n, k).alias("q"))
    assert sorted(map(tuple, via_window.collect())) == sorted(
        map(tuple, via_formula.collect())
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frames(), st.sampled_from(["sum", "max"]), st.booleans())
def test_distributed_prefix_agg_matches_global_window(spark, case, kind, desc):
    """distributed_prefix_agg must agree exactly with the naive
    single-partition exclusive prefix window for both kinds and both
    directions, on ties, skew, and tiny inputs. Keys are made unique
    (the helper's documented contract) by enumerating the drawn values."""
    from dbms_query_optimizer_spark.operators.relational import (
        distributed_prefix_agg,
    )

    vals, n_parts = case
    rows = [(i, v) for i, v in enumerate(vals)]  # unique order key i
    df = spark.createDataFrame(rows, "k int, v long").localCheckpoint()
    oc = F.col("k").desc() if desc else F.col("k").asc()
    w = W.orderBy(oc).rowsBetween(W.unboundedPreceding, -1)
    fn = F.sum if kind == "sum" else F.max
    naive_col = fn("v").over(w)
    if kind == "sum":
        naive_col = F.coalesce(naive_col, F.lit(0))
    naive = {
        r["k"]: r["p"]
        for r in df.withColumn("p", naive_col).collect()
    }
    got = {
        r["k"]: r["p"]
        for r in distributed_prefix_agg(
            df,
            "k",
            "v",
            range_bucket(df, "k", n_parts, descending=desc),
            n_parts,
            kind=kind,
            out_col="p",
            descending=desc,
        ).collect()
    }
    assert got == naive
