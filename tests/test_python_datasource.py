"""Custom Python Data Source: partitioning, determinism, filter pushdown.

The connector contract under test (sources/python_datasource.py): values
are a pure function of the global row id, any partitioning yields the same
dataset, and a pushed ``kind = lit`` predicate must not change results —
only where the filtering happens (source-side stride vs post-scan).
"""

from __future__ import annotations

import pytest

from dbms_query_optimizer_spark.sources.python_datasource import (
    EVENT_KINDS,
    SyntheticEventsReader,
    register,
)

N = 2000


@pytest.fixture()
def synth(spark):
    register(spark)

    def read(**opts):
        r = spark.read.format("synthevents").option("rows", str(N))
        for k, v in opts.items():
            r = r.option(k, str(v))
        return r.load()

    return read


def test_split_invariant(synth):
    """1 partition and 7 partitions produce the identical dataset."""
    a = sorted(tuple(r) for r in synth(partitions=1).collect())
    b = sorted(tuple(r) for r in synth(partitions=7).collect())
    assert a == b
    assert len(a) == N


def test_partition_count(synth):
    assert synth(partitions=7).rdd.getNumPartitions() == 7


def test_filter_pushdown_same_result(synth):
    """A pushed kind-filter returns exactly the post-scan-filtered rows."""
    full = synth(partitions=4).collect()
    expected = sorted(tuple(r) for r in full if r.kind == "click")
    pushed = sorted(
        tuple(r) for r in synth(partitions=4).filter("kind = 'click'").collect()
    )
    assert pushed == expected
    assert len(pushed) == N // len(EVENT_KINDS)


def test_pushdown_strides_at_source():
    """The reader generates ONLY matching ids once the filter is pushed —
    the source-side analog of parquet PushedFilters row skipping."""
    from pyspark.sql.datasource import EqualTo

    reader = SyntheticEventsReader({"rows": str(N), "partitions": "1"})
    remaining = reader.pushFilters([EqualTo(("kind",), "purchase")])
    assert list(remaining) == []  # fully consumed by the source
    [part] = reader.partitions()
    rows = list(reader.read(part))
    assert len(rows) == N // len(EVENT_KINDS)
    assert {r[1] for r in rows} == {"purchase"}


def test_unsupported_filters_returned():
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    reader = SyntheticEventsReader({"rows": "100"})
    leftovers = list(
        reader.pushFilters(
            [GreaterThanOrEqual(("row_id",), 10), EqualTo(("amount",), 1.0)]
        )
    )
    assert len(leftovers) == 2  # only kind-equality is consumed


def test_stream_reader_batches_and_replay():
    """Offset mechanics without a SparkSession: the high watermark ratchets
    by rowsPerBatch up to rows; any [start, end) range reads the same
    values on replay (pure function of row id); batch partitioning splits
    the range without overlap or loss."""
    from dbms_query_optimizer_spark.sources.python_datasource import (
        SyntheticEventsStreamReader,
    )

    r = SyntheticEventsStreamReader(
        {"rows": "1000", "rowsPerBatch": "300", "partitions": "3"}
    )
    assert r.initialOffset() == {"row": 0}
    highs = [r.latestOffset()["row"] for _ in range(5)]
    assert highs == [300, 600, 900, 1000, 1000]  # ratchets, then caps

    parts = r.partitions({"row": 300}, {"row": 600})
    ranges = sorted((p.start, p.end) for p in parts)
    assert ranges[0][0] == 300 and ranges[-1][1] == 600
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2  # contiguous, no overlap

    rows_a = [row for p in parts for row in r.read(p)]
    rows_b = [row for p in r.partitions({"row": 300}, {"row": 600}) for row in r.read(p)]
    assert rows_a == rows_b  # replay-identical
    assert [row[0] for row in rows_a] == list(range(300, 600))


def test_stream_query_equals_batch(spark):
    """End-to-end micro-batch drain: the streamed union equals the batch
    read of the same source (same rows, same values), across 4 batches."""
    from dbms_query_optimizer_spark.operators.sources_queries import (
        N_SYNTH_STREAM_ROWS,
        q_source_python_stream,
    )
    from dbms_query_optimizer_spark.sources.python_datasource import register

    got = {r["kind"]: (r["n_rows"], r["sum_amount"], r["max_row_id"])
           for r in q_source_python_stream(spark, "ignored").collect()}

    from pyspark.sql import functions as F

    register(spark)
    batch = (
        spark.read.format("synthevents")
        .option("rows", str(N_SYNTH_STREAM_ROWS))
        .load()
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("amount").cast("decimal(12,2)")).cast("double").alias("sum_amount"),
            F.max("row_id").alias("max_row_id"),
        )
    )
    want = {r["kind"]: (r["n_rows"], r["sum_amount"], r["max_row_id"])
            for r in batch.collect()}
    assert got == want


# ------------------------------------------------------------- sink side


def test_jsondir_sink_atomic_publish(spark, tmp_path):
    """Each partition lands as one part file, staging is cleaned up on
    commit, and the read-back equals the written frame exactly."""
    import os

    register(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.range(100).selectExpr(
        "id AS doc_id", "CAST(id % 3 AS STRING) AS lang", "id * 7 AS n_chars"
    )
    df.repartition(4).write.format("jsondirsink").mode("append").option(
        "path", out
    ).save()
    parts = sorted(p for p in os.listdir(out) if p.endswith(".jsonl"))
    assert len(parts) == 4
    assert not os.path.exists(f"{out}/_staging")
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        f"{out}/*.jsonl"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsondir_sink_double_append_accumulates(spark, tmp_path):
    """A second append job into a non-empty directory must ADD its part
    files, not silently clobber the first job's (published names carry a
    job-unique token, so os.replace can never collide across jobs)."""
    import os

    register(spark)
    out = str(tmp_path / "sink3")
    os.makedirs(out)
    for lo, hi in ((0, 50), (50, 80)):
        (
            spark.range(lo, hi)
            .selectExpr("id AS doc_id", "'en' AS lang", "id AS n_chars")
            .repartition(2)
            .write.format("jsondirsink")
            .mode("append")
            .option("path", out)
            .save()
        )
    parts = [p for p in os.listdir(out) if p.endswith(".jsonl")]
    assert len(parts) == 4  # 2 part files per job, both jobs retained
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        f"{out}/*.jsonl"
    )
    assert back.count() == 80
    assert back.agg({"doc_id": "sum"}).collect()[0][0] == sum(range(80))


def test_jsondir_sink_overwrite_replaces(spark, tmp_path):
    """mode('overwrite') removes prior part files before publishing."""
    import os

    register(spark)
    out = str(tmp_path / "sink2")
    os.makedirs(out)
    for n in (50, 20):
        (
            spark.range(n)
            .selectExpr("id AS doc_id", "'en' AS lang", "id AS n_chars")
            .repartition(2)
            .write.format("jsondirsink")
            .mode("overwrite")
            .option("path", out)
            .save()
        )
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(
        f"{out}/*.jsonl"
    )
    assert back.count() == 20
