"""Int2DHistogram: joint-distribution selectivity for correlated columns.

events.event_id and events.ts are near-perfectly correlated (ids assigned
in arrival order — the clustering correlation real fact tables have). For
a conjunction over both, per-column histograms must multiply marginals
(independence), which under ~1.0 correlation underestimates the
intersection by ~the marginal factor; the grid histogram sees the joint
mass on the diagonal and gets it right.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.plans.stats import (
    Int2DHistogram,
    PredicateType as P,
    TableStats,
)


@pytest.fixture(scope="module")
def events_xy(spark, sf_dir):
    ev = load_tables(spark, sf_dir)["events"]
    df = ev.select(
        F.col("event_id").alias("x"),
        F.unix_seconds(F.col("ts").cast("timestamp")).alias("y"),
    )
    df.cache().count()
    yield df
    df.unpersist()


def _actual(df, vx, vy) -> float:
    n = df.count()
    return df.filter((F.col("x") <= vx) & (F.col("y") <= vy)).count() / n


def test_grid_beats_independence_on_correlated_columns(events_xy):
    df = events_xy
    grid = Int2DHistogram.from_dataframe(df, "x", "y", buckets=32)
    marginals = TableStats.from_dataframe(df).histograms

    # median cut on both axes: under corr≈1 the true conjunction fraction
    # is ~0.5 while independence predicts ~0.25
    vx = int(df.agg(F.percentile("x", 0.5)).first()[0])
    vy = int(df.agg(F.percentile("y", 0.5)).first()[0])

    actual = _actual(df, vx, vy)
    est_2d = grid.estimate_conjunction(P.LE, vx, P.LE, vy)
    est_ind = marginals["x"].estimate_selectivity(
        P.LE, vx
    ) * marginals["y"].estimate_selectivity(P.LE, vy)

    err_2d = abs(est_2d - actual)
    err_ind = abs(est_ind - actual)
    assert err_2d < 0.10, f"grid estimate {est_2d:.3f} vs actual {actual:.3f}"
    assert err_ind > 2 * err_2d, (
        f"independence ({est_ind:.3f}) should be far worse than the grid "
        f"({est_2d:.3f}) against actual {actual:.3f}"
    )


def test_grid_matches_on_multiple_cuts(events_xy):
    df = events_xy
    grid = Int2DHistogram.from_dataframe(df, "x", "y", buckets=32)
    for qx, qy in [(0.25, 0.75), (0.75, 0.25), (0.9, 0.9)]:
        vx = int(df.agg(F.percentile("x", qx)).first()[0])
        vy = int(df.agg(F.percentile("y", qy)).first()[0])
        actual = _actual(df, vx, vy)
        est = grid.estimate_conjunction(P.LE, vx, P.LE, vy)
        assert abs(est - actual) < 0.10, (qx, qy, est, actual)


def test_degenerate_and_bounds(events_xy):
    grid = Int2DHistogram.from_dataframe(events_xy, "x", "y", buckets=32)
    assert grid.estimate_conjunction(P.GE, grid.min_x, P.GE, grid.min_y) == pytest.approx(1.0)
    assert grid.estimate_conjunction(P.GT, grid.max_x, P.LE, grid.max_y) == 0.0
    empty = Int2DHistogram(8, 0, 10, 0, 10)
    assert empty.estimate_conjunction(P.LE, 5, P.LE, 5) == 0.0
