"""Incremental file ingestion with checkpoint resume: the batch-over-batch
ingest loop of a 100 TB landing zone.

Run 1 drains the files present; new files land; run 2 against the SAME
checkpoint must process ONLY the new files — already-ingested data is
neither re-read nor re-written (exactly-once across restarts, the property
that makes continuous ingestion idempotent and cheap).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _drain(spark, src, out, ckpt):
    stream = spark.readStream.schema("id long, v double").parquet(src)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_resume_ingests_only_new_files(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "ingested")
    ckpt = str(tmp_path / "ckpt")

    gen1 = spark.range(0, 100).select("id", (F.col("id") * 1.5).alias("v"))
    gen1.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 100

    gen2 = spark.range(100, 130).select("id", (F.col("id") * 1.5).alias("v"))
    gen2.coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)

    back = spark.read.parquet(out)
    assert back.count() == 130, "resume must add only the new file's rows"
    # exactly-once: no id ingested twice, none skipped
    assert back.select("id").distinct().count() == 130
    assert back.agg(F.min("id"), F.max("id")).first() == (0, 129)
