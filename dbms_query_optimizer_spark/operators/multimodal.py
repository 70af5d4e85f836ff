"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw media as an
opaque ``binary`` column next to a typed metadata struct, keep all
filtering/bookkeeping on the metadata (JVM-side, pushdown-friendly), and
run decode/feature-extraction as Arrow-batched Python over
``mapInPandas`` — executors stream record batches, so a 100 TB corpus
never materializes anywhere.

The testdata has no real media, so the *payload* is synthesized (UTF-8
bytes of the document text) and the *decoder* is a STUB: ``decode_image``
raises NotImplementedError exactly where a real pillow/ffmpeg call would
go, and the pipeline runs with a deterministic fake featurizer instead.
The Spark-side plumbing — schema, binary handling, Arrow batch shapes,
partition-parallel UDF — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import load_tables

FEATURE_BINS = 8


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct).

    The synthetic stand-in for an image table: payload = UTF-8 bytes of the
    text; meta mirrors what an ingest job would record (format, byte size,
    fake WxH derived deterministically from the content length).
    """
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.length(payload).alias("n_bytes"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — real image decoding needs pillow/opencv, not in this
    environment. The mapInPandas pipeline calls the fake featurizer
    instead; swap this in when a decoder library is available."""
    raise NotImplementedError(
        "image decode stub: install pillow/opencv and decode payload here"
    )


def _fake_features(payload: bytes) -> list[int]:
    """Deterministic stand-in featurizer: 8-bin histogram of byte values.
    Stands where decode_image(...) -> resize -> embed would run."""
    counts = [0] * FEATURE_BINS
    for b in payload:
        counts[b * FEATURE_BINS // 256] += 1
    return counts


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-plane query: all JVM-side — byte length, content digest,
    fake dimensions. This is the 99% path that must never touch Python."""
    df = multimodal_table(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.sha2("payload", 256).alias("digest"),
    ).orderBy("doc_id")


ORACLE_MULTIMODAL_META = """
    SELECT doc_id,
           'fake/raw' AS format,
           octet_length(encode(text)) AS n_bytes,
           CAST(n_chars % 640 AS INT) AS width,
           CAST(n_chars % 480 AS INT) AS height,
           sha256(text) AS digest
    FROM documents
    ORDER BY doc_id
"""


FRAME_BYTES = 64  # chunk ("frame") size in the synthetic byte stream
FRAME_STRIDE = 4  # keep every 4th frame


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque binary stream: chunk the payload into
    FRAME_BYTES frames, keep every FRAME_STRIDE-th, emit per-frame offset,
    byte length, and digest.

    This is the video/audio access pattern (decode only the sampled
    frames) on the metadata plane: slicing and hashing are JVM-side binary
    ops, so the Python decode stub is reached only for frames that
    survive sampling. The payload column is materialized in its own
    projection so the per-frame lambda slices an attribute, not a
    recomputed expression.
    """
    # frames are sliced on the hex encoding (2 chars/byte): DuckDB has no
    # BLOB substring, and hex is an exact, order-preserving byte view both
    # engines slice identically.
    df = multimodal_table(spark, sf_dir).select(
        "doc_id", F.lower(F.hex("payload")).alias("phex")
    )
    n_frames = F.ceil(F.length("phex") / F.lit(2 * FRAME_BYTES)).cast("int")
    offsets = F.when(
        n_frames >= 1,
        F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_STRIDE)),
    ).otherwise(F.array().cast("array<int>"))
    frames = df.select("doc_id", "phex", F.explode(offsets).alias("frame_no"))
    chunk = F.col("phex").substr(
        F.col("frame_no") * (2 * FRAME_BYTES) + 1, F.lit(2 * FRAME_BYTES)
    )
    return frames.select(
        "doc_id",
        "frame_no",
        (F.col("frame_no") * FRAME_BYTES).alias("byte_offset"),
        (F.length(chunk) / 2).cast("int").alias("n_bytes"),
        F.md5(chunk.cast("binary")).alias("digest"),
    ).orderBy("doc_id", "frame_no")


ORACLE_MULTIMODAL_FRAME_SAMPLE = f"""
    WITH payloads AS (
        SELECT doc_id, lower(hex(encode(text))) AS phex FROM documents
    ),
    frames AS (
        SELECT doc_id, phex, UNNEST(generate_series(
                   0,
                   CAST(ceil(length(phex) / {2 * FRAME_BYTES}.0) AS INT) - 1,
                   {FRAME_STRIDE})) AS frame_no
        FROM payloads
    )
    SELECT doc_id, frame_no,
           frame_no * {FRAME_BYTES} AS byte_offset,
           CAST(length(substring(phex, frame_no * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES})) / 2 AS INT)
               AS n_bytes,
           md5(substring(phex, frame_no * {2 * FRAME_BYTES} + 1, {2 * FRAME_BYTES}))
               AS digest
    FROM frames
    ORDER BY doc_id, frame_no
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-plane query: Arrow-batched mapInPandas over the binary
    column, emitting a fixed-width feature vector per row.

    No SQL oracle (the decode plane is definitionally not SQL); determinism
    and batch-shape behavior are asserted in tests/test_multimodal.py.
    """
    df = multimodal_table(spark, sf_dir)

    schema = (
        "doc_id long, n_bytes int, "
        + ", ".join(f"f{i} int" for i in range(FEATURE_BINS))
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_features)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                }
            )
            for i in range(FEATURE_BINS):
                out[f"f{i}"] = feats.map(lambda v, i=i: v[i]).astype("int32")
            yield out

    return df.select("doc_id", "payload").mapInPandas(featurize, schema=schema)


def oracles() -> dict[str, tuple]:
    return {
        "multimodal_meta": (q_multimodal_meta, ORACLE_MULTIMODAL_META),
        "multimodal_frame_sample": (
            q_multimodal_frame_sample,
            ORACLE_MULTIMODAL_FRAME_SAMPLE,
        ),
        "multimodal_features": (q_multimodal_features, None),
    }
