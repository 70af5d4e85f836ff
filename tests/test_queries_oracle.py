"""Every catalog query with an oracle must hash-match DuckDB at the test SF.

This mirrors the driver's t2 correctness gate so failures surface locally
before a round ends.
"""

from __future__ import annotations

import pytest

from dbms_query_optimizer_spark.operators import catalog

from .oracle_utils import compare, duckdb_conn

NAMES = sorted(catalog.CATALOG)


@pytest.fixture(scope="module")
def conn(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, sf_dir, conn):
    fn, sql = catalog.CATALOG[name]
    df = fn(spark, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only check, like the driver's weak gate
        return
    ok, msg = compare(df, conn, sql)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"c_mktsegment", "n_rows", "sum_price", "n_orders"}


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)


def test_hll_union_estimate_close_to_exact(spark, sf_dir):
    """The merged-sketch estimate must sit within HLL error of the exact
    global distinct count (and the union must cover all 5 segments).
    The query now carries the contract itself (est_within_5pct); this
    test independently recomputes the exact count and re-checks it."""
    from dbms_query_optimizer_spark.operators.relational import (
        q_approx_hll_mergeable,
    )
    from dbms_query_optimizer_spark.engine import load_tables

    row = q_approx_hll_mergeable(spark, sf_dir).collect()[0]
    exact = (
        load_tables(spark, sf_dir)["orders"]
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert row.n_segments == 5
    assert row.exact_customers == exact
    assert row.est_within_5pct
