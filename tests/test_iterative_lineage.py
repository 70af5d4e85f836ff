"""Lineage-bounding contract for iterative operators: raising the
iteration count must NOT grow the logical plan, because each loop
truncates lineage with localCheckpoint (graph_pagerank every
PR_CHECKPOINT_EVERY rounds; dedup_components every round)."""

from __future__ import annotations

from dbms_query_optimizer_spark.operators.graph import (
    PR_CHECKPOINT_EVERY,
    _pagerank,
    q_graph_pagerank,
)


def _plan_size(df) -> int:
    return len(df._jdf.queryExecution().optimizedPlan().toString())


def test_pagerank_plan_depth_bounded(spark, sf_dir):
    # 4x the iteration count must not grow the final plan: lineage resets
    # at every checkpoint, so plan size depends only on iters SINCE the
    # last checkpoint (bounded by the interval), not total iters.
    short = _plan_size(_pagerank(spark, sf_dir, PR_CHECKPOINT_EVERY))
    long = _plan_size(_pagerank(spark, sf_dir, 4 * PR_CHECKPOINT_EVERY))
    assert long <= short * 1.5, (short, long)


def test_pagerank_checkpoint_preserves_values(spark, sf_dir):
    # 10 iterations crosses a checkpoint boundary (interval 5); values
    # must be identical to the DuckDB-oracle-verified formulation, which
    # test_queries_oracle.py pins — here just pin determinism across runs.
    a = {r["node"]: r["pagerank"] for r in q_graph_pagerank(spark, sf_dir).collect()}
    b = {r["node"]: r["pagerank"] for r in q_graph_pagerank(spark, sf_dir).collect()}
    assert a == b and len(a) > 0
    assert abs(sum(a.values()) - 1.0) < 1e-3  # ranks form a distribution
