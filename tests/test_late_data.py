"""Watermark late-data semantics: once the watermark passes a window's
end, the window is finalized, emitted (append mode), its state evicted —
and a late row for it is DROPPED, not merged. This is the bounded-state
contract that lets a stream run forever: without the drop, state grows
with the full key/window history.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

SCHEMA = "ts timestamp, v int"


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["ts", "v"]), SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def test_late_row_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ts = pd.Timestamp

    # source path must exist before the stream is defined
    _write_batch(
        spark,
        src,
        [(ts("2024-01-01 10:05:00"), 1), (ts("2024-01-01 11:00:00"), 2)],
    )
    agg = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
    )

    out = str(tmp_path / "out")

    def drain(_name):
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["w"]["start"].isoformat(), r["n"], r["sum_v"])
            for r in spark.read.parquet(out).collect()
        }

    # drain 1: the on-time data above; max ts 11:00 => watermark 10:50,
    # so the 10:00-10:15 window (one row, v=1) finalizes and emits.
    first = drain("late_sink_a")

    # drain 2 (same checkpoint): a LATE row (10:06, v=100) for the
    # finalized window, plus fresh data advancing the watermark past
    # every remaining window.
    _write_batch(
        spark,
        src,
        [(ts("2024-01-01 10:06:00"), 100), (ts("2024-01-01 12:00:00"), 3)],
    )
    second = drain("late_sink_b")

    emitted = first | second
    # the 10:00 window emitted exactly once, WITHOUT the late v=100 row
    ten_oclock = [e for e in emitted if e[0].startswith("2024-01-01T10:00")]
    assert ten_oclock == [("2024-01-01T10:00:00", 1, 1)], emitted
    # the late row must not appear merged (101) or alone (100) anywhere
    assert all(e[2] not in (100, 101) for e in emitted), emitted
