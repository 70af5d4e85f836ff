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
