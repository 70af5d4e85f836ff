"""Property test for the interval-coverage operator's core algebra.

The catalog query (`temporal.q_interval_coverage`) is oracle-checked
against DuckDB on the events table; this test checks the underlying
gaps-and-islands merge against an INDEPENDENT straight-line Python
implementation (sort, sweep, merge) on adversarial inputs — heavy
overlap, exact-touching endpoints (end == next start merges, since the
island test is ``s > running_max_e``, i.e. half-open [s, e) with
closure at contact), duplicate starts, and singleton users.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

SPAN = 10  # each point covers [s, s + SPAN)


def _python_coverage(points):
    """Reference: merge [s, s+SPAN) intervals with closure at contact."""
    islands = []
    for s in sorted(points):
        e = s + SPAN
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    return len(islands), sum(e - s for s, e in islands)


def _spark_coverage(spark, user_points):
    rows = [
        (u, i, s)
        for u, pts in user_points.items()
        for i, s in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, s long")
    base = df.withColumn("e", F.col("s") + F.lit(SPAN))
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    flagged = base.withColumn(
        "new_isl",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    ).withColumn(
        "isl", F.sum("new_isl").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    islands = flagged.groupBy("user_id", "isl").agg(
        F.min("s").alias("st"), F.max("e").alias("en")
    )
    out = (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("en") - F.col("st")).alias("covered"),
        )
        .collect()
    )
    return {r.user_id: (r.n_islands, r.covered) for r in out}


@st.composite
def user_point_sets(draw):
    n_users = draw(st.integers(min_value=1, max_value=3))
    return {
        u: draw(
            st.lists(
                st.integers(min_value=0, max_value=60),
                min_size=1,
                max_size=25,
            )
        )
        for u in range(n_users)
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(user_point_sets())
def test_island_merge_matches_reference(spark, user_points):
    got = _spark_coverage(spark, user_points)
    for u, pts in user_points.items():
        assert got[u] == _python_coverage(pts), (u, sorted(pts))
