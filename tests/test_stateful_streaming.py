"""Stateful streaming sessionization must agree with batch sessionization.

The streaming operator emits a session once the event-time watermark
passes its end + gap. The watermark is GLOBAL (max event ts across all
users), so after a bounded replay every session is closed except those
ending within one gap of the stream's final timestamp. The assertion
sandwiches the boundary: every emitted session must exist in the batch
result, and every session that is definitively past the watermark
(with a rounding margin) must have been emitted — with identical
aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.streaming.stateful import GAP_US, q_streaming_sessionized
from dbms_query_optimizer_spark.streaming.windows import q_events_sessionized

MARGIN_US = 10_000  # watermark/timeout timestamps round to milliseconds


def _key(r):
    return (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 2))


def test_streamed_sessions_match_batch(spark, sf_dir):
    streamed = {_key(r) for r in q_streaming_sessionized(spark, sf_dir).collect()}

    batch = (
        q_events_sessionized(spark, sf_dir)
        .withColumn("end_us", F.unix_micros("session_end"))
        .collect()
    )
    batch_all = {_key(r) for r in batch}

    max_us = (
        load_tables(spark, sf_dir)["events"]
        .agg(F.max(F.unix_micros("ts")))
        .collect()[0][0]
    )
    must_be_closed = {
        _key(r) for r in batch if r.end_us + GAP_US + MARGIN_US < max_us
    }

    assert streamed, "stream emitted nothing"
    assert streamed <= batch_all, f"stream invented sessions: {sorted(streamed - batch_all)[:3]}"
    assert must_be_closed <= streamed, (
        f"unemitted closed sessions: {sorted(must_be_closed - streamed)[:3]}"
    )


def test_foreachbatch_idempotent_sink(spark, sf_dir, tmp_path):
    """foreachBatch exactly-once: the drained sink equals the batch table,
    and redelivering a batch (simulated retry) changes nothing."""
    from dbms_query_optimizer_spark.engine import load_tables
    from dbms_query_optimizer_spark.streaming.sinks import (
        run_events_stream_to_files,
        write_batch_idempotent,
    )

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_events_stream_to_files(spark, sf_dir, out, ckpt)

    events = load_tables(spark, sf_dir)["events"]
    sunk = spark.read.parquet(f"{out}/batch=*")
    assert sunk.count() == events.count()

    # redeliver batch 0 with the same payload — the at-least-once retry
    # path (materialized first: a real retry re-computes the batch from the
    # checkpointed source offsets, it doesn't read its own output)
    lazy = spark.read.parquet(f"{out}/batch=0")
    batch0 = spark.createDataFrame(lazy.collect(), lazy.schema)
    n_before = sunk.count()
    write_batch_idempotent(out)(batch0, 0)
    assert spark.read.parquet(f"{out}/batch=*").count() == n_before


def test_directory_shaped_events_source(spark, sf_dir, tmp_path):
    """A directory-shaped events.parquet (multiple TIME-SLICED part
    files, the layout a continuously-ingesting table actually has) must
    replay through the sessionizer identically to the single-file
    layout — exercising the source-construction branch that streams the
    directory directly (a pathGlobFilter would match part-file names
    and read nothing) with maxFilesPerTrigger derived from the file
    count, and the multi-batch watermark path (several data
    micro-batches, not one). File mtimes are staggered in time order:
    the 0-second-watermark contract assumes arrival order ≈ event-time
    order across batches, exactly as a commit-ordered table delivers —
    a deliberately scrambled file order is out of contract (its late
    rows land behind the watermark; the operator clamps their timers
    rather than crashing, but sessions split by design)."""
    import os
    import time

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    multi_dir = str(tmp_path / "sfdir")
    os.makedirs(multi_dir)
    ev_dir = os.path.join(multi_dir, "events.parquet")
    ev.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.parquet(
        ev_dir
    )
    parts = sorted(f for f in os.listdir(ev_dir) if f.endswith(".parquet"))
    assert len(parts) >= 4  # the multi-file branch is genuinely exercised
    now = time.time()
    for i, f in enumerate(parts):  # mtime order = time-slice order
        os.utime(os.path.join(ev_dir, f), (now + i, now + i))

    single = {_key(r) for r in q_streaming_sessionized(spark, sf_dir).collect()}
    multi = {_key(r) for r in q_streaming_sessionized(spark, multi_dir).collect()}
    assert multi == single
