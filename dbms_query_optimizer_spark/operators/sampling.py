"""Sampling operators for training-data pipelines: deterministic hash
splits, seeded uniform sampling, stratified (per-class) sampling.

The reference has no sampling surface; these are the data-mixing primitives
a 100 TB corpus pipeline needs. Two distinct mechanisms with different
guarantees:

- **Hash split** (``q_hash_split_train``): assignment is a pure function of
  the row key — reproducible across runs, clusters, partitionings, and
  engines, which is what a train/val split must be. Oracle-checked exactly.
- **RNG sampling** (``q_sample_stratified``): per-row Bernoulli draws from
  a seeded RNG — right for downsampling, but partition-layout dependent, so
  cross-engine value equality is impossible by design (rows-only check +
  statistical tests in ``tests/test_sampling.py``).

Scale: both are narrow map-side operators — no shuffle, fully pipelined
into the scan, trivially parallel at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import load_tables

SPLIT_BUCKETS = 10
TRAIN_BUCKETS = 8  # buckets 0-7 train, 8 val, 9 test
SAMPLE_SEED = 42
STRATA_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.25}


def _split_bucket(key):
    # first 8 hex chars of md5(key) -> int -> bucket; stable everywhere
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SPLIT_BUCKETS
    )


def q_hash_split_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split of the corpus by key hash; returns the
    train shard with its bucket, plus per-document length so downstream
    token accounting can verify shard balance."""
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = _split_bucket(F.col("doc_id"))
    return (
        docs.select(
            "doc_id",
            "lang",
            bucket.cast("int").alias("bucket"),
            F.length("text").alias("n_chars_actual"),
        )
        .filter(F.col("bucket") < TRAIN_BUCKETS)
        .orderBy("doc_id")
    )


ORACLE_HASH_SPLIT_TRAIN = f"""
    SELECT doc_id, lang, bucket, n_chars_actual
    FROM (
        SELECT doc_id, lang,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % {SPLIT_BUCKETS} AS INT) AS bucket,
               CAST(length(text) AS INT) AS n_chars_actual
        FROM documents
    )
    WHERE bucket < {TRAIN_BUCKETS}
    ORDER BY doc_id
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample: per-language keep fractions (the data-mixing
    knob — e.g. downweight the dominant language), then per-stratum counts.

    ``sampleBy`` is a map-side Bernoulli filter per stratum; no shuffle
    until the summarizing groupBy. Rows-only driver check; statistical
    properties (proportions, determinism) are pytest-verified.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    sampled = docs.sampleBy("lang", STRATA_FRACTIONS, seed=SAMPLE_SEED)
    return (
        sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


def oracles() -> dict[str, tuple]:
    return {
        "hash_split_train": (q_hash_split_train, ORACLE_HASH_SPLIT_TRAIN),
        "sample_stratified": (q_sample_stratified, None),
    }
