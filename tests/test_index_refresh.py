"""Staleness + rebuild-equivalence contract for ``index_refresh`` (the
CDF-fed incremental maintenance of the persisted cell-partitioned ANN
index). The DuckDB gate (tests/test_queries_oracle.py) proves the
catalog entry's per-cell stats against a from-scratch rebuild; these
tests pin the lifecycle the oracle can't see: stale detection, the
no-op fast path, row-level (not just stats-level) rebuild equivalence,
and the emptied-cell partition cleanup."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dbms_query_optimizer_spark.operators.similarity import (
    IVFR_DEL_PRED,
    IVFR_INS_PRED,
    IVFR_K,
    IVFR_V1_PRED,
    _ivfr_quantize,
    build_index,
    index_version,
    refresh_index,
)
from dbms_query_optimizer_spark.sources.manifest import TransactionalTable

SF_DIR = "/root/testdata/sf0.001"


def _read_idx(spark, idx_dir):
    return spark.read.schema("vec_id bigint, qv array<bigint>, cell int").parquet(
        os.path.join(idx_dir, "corpus")
    )


def _rows(df):
    return {(r["vec_id"], r["cell"]) for r in df.select("vec_id", "cell").collect()}


@pytest.fixture(scope="module")
def scenario(spark, tmp_path_factory):
    """The catalog entry's lifecycle, paused between churn and refresh."""
    root = str(tmp_path_factory.mktemp("ivfr"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    table = TransactionalTable.create(os.path.join(root, "table"), emb.schema)
    t1 = table.begin()
    t1.insert(emb.filter(F.expr(IVFR_V1_PRED)).repartition(4))
    t1.commit()
    cent = (
        _ivfr_quantize(table.read(spark, version=1))
        .orderBy("vec_id")
        .limit(IVFR_K)
        .select(F.col("vec_id").cast("int").alias("cell"), F.col("qv").alias("cqv"))
        .localCheckpoint()
    )
    idx_dir = os.path.join(root, "index")
    build_index(spark, table, cent, idx_dir, version=1)

    erase = table.begin()
    erase.delete_keys(
        spark, emb.filter(F.expr(IVFR_DEL_PRED)).select("vec_id"), "vec_id"
    )
    erase.commit()
    ins = table.begin()
    ins.insert(emb.filter(F.expr(IVFR_INS_PRED)).repartition(2))
    ins.commit()
    return table, cent, idx_dir, root


def test_staleness_detected_and_cleared(spark, scenario):
    table, cent, idx_dir, _ = scenario
    assert index_version(idx_dir) == 1
    assert table.latest_version() == 3
    assert index_version(idx_dir) < table.latest_version()  # stale

    stale_rows = _rows(_read_idx(spark, idx_dir))
    new_v = refresh_index(spark, table, cent, idx_dir)
    assert new_v == 3
    assert index_version(idx_dir) == 3

    refreshed = _rows(_read_idx(spark, idx_dir))
    assert refreshed != stale_rows  # the churn was real

    # rebuild-equivalence at ROW level: a from-scratch build of v3 under
    # the same frozen centroids yields the identical (vec_id, cell) set
    rebuilt_dir = idx_dir + "_rebuilt"
    build_index(spark, table, cent, rebuilt_dir, version=3)
    assert refreshed == _rows(_read_idx(spark, rebuilt_dir))
    shutil.rmtree(rebuilt_dir, ignore_errors=True)


def test_refresh_is_noop_when_current(spark, scenario):
    table, cent, idx_dir, _ = scenario
    refresh_index(spark, table, cent, idx_dir)  # ensure current
    before = _rows(_read_idx(spark, idx_dir))
    assert refresh_index(spark, table, cent, idx_dir) == table.latest_version()
    assert _rows(_read_idx(spark, idx_dir)) == before


def test_emptied_cell_partition_is_cleared(spark, tmp_path):
    """Erasing EVERY member of a cell must remove its partition — the
    dynamic-overwrite blind spot (no output rows for a partition leaves
    its old files in place) handled by the explicit cleanup."""
    rows = [(i, [float(i // 4 * 10), 0.0]) for i in range(8)]  # 2 tight packs
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    table = TransactionalTable.create(str(tmp_path / "t"), emb.schema)
    t1 = table.begin()
    t1.insert(emb)
    t1.commit()
    cent = spark.createDataFrame(
        [(0, [0, 0]), (1, [10000, 0])], "cell int, cqv array<bigint>"
    )
    idx_dir = str(tmp_path / "idx")
    build_index(spark, table, cent, idx_dir, version=1)
    assert os.path.isdir(os.path.join(idx_dir, "corpus", "cell=1"))

    erase = table.begin()
    erase.delete_keys(
        spark, emb.filter(F.col("vec_id") >= 4).select("vec_id"), "vec_id"
    )
    erase.commit()
    refresh_index(spark, table, cent, idx_dir)

    assert not os.path.isdir(os.path.join(idx_dir, "corpus", "cell=1"))
    assert _rows(_read_idx(spark, idx_dir)) == {(i, 0) for i in range(4)}
