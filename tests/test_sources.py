"""Connector roundtrips: every format preserves values and schemas."""

from __future__ import annotations

import pytest

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.sources import (
    TESTDATA_SCHEMAS,
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
    write_parquet,
)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_tables(spark, sf_dir)["nation"]


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_parquet")
    write_parquet(nation, path, target_files=1)
    back = read_parquet(spark, path, TESTDATA_SCHEMAS["nation"])
    assert back.schema == TESTDATA_SCHEMAS["nation"]
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_csv_roundtrip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path, target_files=1)
    back = read_csv(spark, path, TESTDATA_SCHEMAS["nation"])
    assert back.schema == TESTDATA_SCHEMAS["nation"]
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_json_roundtrip(spark, nation, tmp_path):
    path = str(tmp_path / "nation_json")
    write_json(nation, path, target_files=1)
    back = read_json(spark, path, TESTDATA_SCHEMAS["nation"])
    assert back.schema == TESTDATA_SCHEMAS["nation"]
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_csv_failfast_on_malformed(spark, tmp_path):
    bad = tmp_path / "bad_csv"
    bad.mkdir()
    (bad / "part.csv").write_text(
        "n_nationkey,n_name,n_regionkey\n0,ALGERIA,0\nnot_an_int,X,Y\n"
    )
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Py4JJavaError):
        read_csv(spark, str(bad), TESTDATA_SCHEMAS["nation"]).collect()


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    """partitionBy(col) => a filter on col reads only that directory."""
    docs = load_tables(spark, sf_dir)["documents"]
    path = str(tmp_path / "docs_by_lang")
    write_parquet(docs, path, partition_by=["lang"])
    back = read_parquet(spark, path)
    one_lang = back.filter(back.lang == "en")
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    # partition pruning shows up as the partition filter on the scan node
    assert "PartitionFilters" in plan and "lang" in plan
    expected = docs.filter(docs.lang == "en").count()
    assert one_lang.count() == expected
