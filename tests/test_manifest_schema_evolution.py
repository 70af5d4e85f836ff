"""Metadata-only schema evolution on the manifest table.

Contract: alter_schema publishes a new version with the same file list;
no file is rewritten. Each version resolves its OWN schema (time travel
shows the old shape); added columns read NULL from pre-alter files;
dropped columns are pruned from files that still carry them.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

from dbms_query_optimizer_spark.sources.manifest import TransactionalTable


@pytest.fixture()
def evolved(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    )
    table = TransactionalTable.create(root, df.schema)
    t1 = table.begin()
    t1.insert(df.coalesce(1))
    t1.commit()  # v1: 2-col files

    table.alter_schema(df.schema.add("tag", StringType()))  # v2: metadata only

    t2 = table.begin()
    t2.insert(
        spark.createDataFrame([(3, 30.0, "new")], "k long, v double, tag string")
        .coalesce(1)
    )
    t2.commit()  # v3: 3-col file joins the 2-col file
    return TransactionalTable(root)


def test_alter_rewrites_no_files(evolved):
    v1, v2 = evolved.snapshot(1), evolved.snapshot(2)
    assert v1["files"] == v2["files"]
    assert len(json.loads(v2["schema"])["fields"]) == 3


def test_added_column_null_for_old_files(spark, evolved):
    rows = {r["k"]: (r["v"], r["tag"]) for r in evolved.read(spark).collect()}
    assert rows == {1: (10.0, None), 2: (20.0, None), 3: (30.0, "new")}


def test_time_travel_shows_old_shape(spark, evolved):
    old = evolved.read(spark, version=1)
    assert old.columns == ["k", "v"]
    assert old.count() == 2


def test_drop_column_pruned_from_wide_files(spark, evolved):
    narrow = StructType([f for f in json_schema(evolved) if f.name != "v"])
    evolved.alter_schema(narrow)
    fresh = TransactionalTable(evolved.root)
    rows = {r["k"]: r["tag"] for r in fresh.read(spark).collect()}
    assert set(fresh.read(spark).columns) == {"k", "tag"}
    assert rows == {1: None, 2: None, 3: "new"}


def json_schema(table) -> StructType:
    return StructType.fromJson(json.loads(table.snapshot()["schema"]))


def test_zone_pruning_still_works_after_alter(spark, evolved):
    kept_rows = evolved.read(spark, where=("k", ">=", 3)).collect()
    assert [r["k"] for r in kept_rows] == [3]
    assert evolved.last_scan["files_read"] < evolved.last_scan["files_total"]
