"""Spark-side planning-layer tests: distributed stats builder, emitter
correctness (same rows as a direct join), plan-shape checks, and broadcast
hints visible in the physical plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import TABLES, load_tables
from dbms_query_optimizer_spark.plans.emitter import emit_plan, explain_string
from dbms_query_optimizer_spark.plans.pipeline import FilterSpec, plan_and_emit
from dbms_query_optimizer_spark.plans.planner import LogicalJoinNode
from dbms_query_optimizer_spark.plans.stats import PredicateType, TableStats

EQ = PredicateType.EQ
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF)


@pytest.fixture(scope="module")
def joins():
    return [
        LogicalJoinNode("customer", "orders", "c_custkey", "o_custkey", EQ),
        LogicalJoinNode("orders", "lineitem", "o_orderkey", "l_orderkey", EQ),
        LogicalJoinNode("customer", "nation", "c_nationkey", "n_nationkey", EQ),
    ]


def test_table_stats_from_dataframe(tables):
    stats = TableStats.from_dataframe(tables["orders"])
    assert stats.num_tuples == tables["orders"].count()
    assert stats.num_pages >= 1
    # scan cost model: 2 * io * pages
    assert stats.estimate_scan_cost() == 2 * 100 * stats.num_pages
    # histogram built for numeric cols only
    assert "o_orderkey" in stats.histograms
    assert "o_totalprice" in stats.histograms
    assert "o_orderstatus" not in stats.histograms
    # all rows landed in the o_orderkey histogram
    assert stats.histograms["o_orderkey"].ntups == stats.num_tuples

    # selectivity sanity against true fractions
    h = stats.histograms["o_totalprice"]
    true_frac = tables["orders"].filter(F.col("o_totalprice") < 150000).count() / stats.num_tuples
    est = h.estimate_selectivity(PredicateType.LT, 150000)
    assert est == pytest.approx(true_frac, abs=0.05)


def test_pipeline_matches_direct_join(spark, tables, joins):
    planned = plan_and_emit(
        tables,
        joins,
        filters=[FilterSpec("orders", "o_totalprice", PredicateType.LT, 150000)],
        pk_columns=TABLES,
    )
    assert len(planned.plan) == len(joins)

    got = (
        planned.df.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("n_name")
        .collect()
    )
    want = (
        tables["customer"]
        .join(tables["orders"].filter(F.col("o_totalprice") < 150000),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(tables["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(tables["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("n_name")
        .collect()
    )
    assert got == want


def test_plan_avoids_fact_table_outermost(tables, joins):
    """Semantic plan property in the reference's test style
    (optimizer_test.cc:492): the biggest table (lineitem) must not be the
    outer base relation of the left-deep tree."""
    planned = plan_and_emit(tables, joins, pk_columns=TABLES)
    first = planned.plan[0]
    assert first.left_table != "lineitem"


def test_broadcast_hint_in_physical_plan(tables, joins):
    planned = plan_and_emit(
        tables, joins, pk_columns=TABLES, io_cost_per_page=100
    )
    txt = explain_string(planned.df, "formatted")
    assert "BroadcastHashJoin" in txt


def test_extra_edge_becomes_filter(tables):
    """A join predicate whose tables are already joined degrades to a filter."""
    plan = [
        LogicalJoinNode("customer", "orders", "c_custkey", "o_custkey", EQ),
        LogicalJoinNode("customer", "orders", "c_nationkey", "o_custkey", PredicateType.NE),
    ]
    df = emit_plan(tables, plan)
    n = df.count()
    want = (
        tables["customer"]
        .join(tables["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("c_nationkey") != F.col("o_custkey"))
        .count()
    )
    assert n == want


def test_engine_sql_entry(spark, sf_dir):
    """Engine.sql runs full SQL over the registered views — the entry
    point the reference never had (its queries arrive pre-parsed)."""
    from dbms_query_optimizer_spark.engine import Engine

    eng = Engine(spark).load_dir(sf_dir)
    row = eng.sql(
        """
        SELECT r_name, COUNT(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY n DESC, r_name LIMIT 1
        """
    ).collect()[0]
    assert row.n >= 1 and isinstance(row.r_name, str)
