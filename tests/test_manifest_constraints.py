"""CHECK constraints on the manifest table's write path.

Contract: constraints are TABLE metadata (every writer bound), enforced
during the staging write itself via Observation metrics (no extra pass),
with SQL CHECK null semantics (NULL passes; only provably-FALSE rows
violate). A violating insert auto-aborts the transaction: the staged
files are gone, the table version and contents are untouched.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbms_query_optimizer_spark.sources.manifest import (
    ConstraintViolation,
    TransactionalTable,
)


def _table(spark, root):
    df = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("double").alias("v"),
    )
    t = TransactionalTable.create(
        root,
        df.schema,
        constraints={"v_nonneg": "v >= 0", "k_small": "k < 1000"},
    )
    return t, df


def test_clean_insert_commits(spark, tmp_path):
    table, df = _table(spark, str(tmp_path / "t"))
    txn = table.begin()
    txn.insert(df)
    assert txn.commit() == 1
    assert table.read(spark).count() == 10


def test_violation_raises_with_counts_and_auto_aborts(spark, tmp_path):
    root = str(tmp_path / "t")
    table, df = _table(spark, root)
    t1 = table.begin()
    t1.insert(df)
    t1.commit()

    bad = spark.createDataFrame(
        [(1, -5.0), (2, -1.0), (3, 7.0)], "k long, v double"
    )
    t2 = table.begin()
    with pytest.raises(ConstraintViolation) as ei:
        t2.insert(bad)
    assert ei.value.violations == {"v_nonneg": 2}
    # auto-abort: table untouched, no staged leftovers, version unchanged
    fresh = TransactionalTable(root)
    assert fresh.latest_version() == 1
    assert fresh.read(spark).count() == 10
    data_dir = os.path.join(root, "data")
    live = {os.path.basename(os.path.dirname(f)) for f in fresh.snapshot()["files"]}
    assert set(os.listdir(data_dir)) == live


def test_multiple_constraints_reported_together(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"))
    bad = spark.createDataFrame([(5000, -1.0)], "k long, v double")
    txn = table.begin()
    with pytest.raises(ConstraintViolation) as ei:
        txn.insert(bad)
    assert ei.value.violations == {"v_nonneg": 1, "k_small": 1}


def test_null_passes_check(spark, tmp_path):
    """SQL CHECK: UNKNOWN (NULL) is not a violation."""
    table, _ = _table(spark, str(tmp_path / "t"))
    withnull = spark.createDataFrame([(1, None), (2, 3.0)], "k long, v double")
    txn = table.begin()
    txn.insert(withnull)
    txn.commit()
    assert table.read(spark).count() == 2


def test_merge_path_enforced(spark, tmp_path):
    table, df = _table(spark, str(tmp_path / "t"))
    t1 = table.begin()
    t1.insert(df)
    t1.commit()
    bad_src = spark.createDataFrame([(3, -9.0)], "k long, v double")
    t2 = table.begin()
    with pytest.raises(ConstraintViolation):
        t2.merge(spark, bad_src, "k")
    fresh = TransactionalTable(str(tmp_path / "t"))
    assert fresh.latest_version() == 1
    rows = {r["k"]: r["v"] for r in fresh.read(spark).collect()}
    assert rows[3] == 30.0  # pre-merge value intact


def test_constraints_survive_versions(spark, tmp_path):
    """Constraints are carried across commits — a writer opening the
    table later is still bound."""
    root = str(tmp_path / "t")
    table, df = _table(spark, root)
    t1 = table.begin()
    t1.insert(df)
    t1.commit()
    reopened = TransactionalTable(root)
    assert reopened.snapshot()["constraints"] == {
        "v_nonneg": "v >= 0",
        "k_small": "k < 1000",
    }
    bad = spark.createDataFrame([(1, -1.0)], "k long, v double")
    t2 = reopened.begin()
    with pytest.raises(ConstraintViolation):
        t2.insert(bad)
