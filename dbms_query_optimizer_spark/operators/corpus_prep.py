"""End-to-end training-corpus preparation: the operator families composed
as one job, the shape a 100 TB data-prep pipeline actually runs.

    documents
      -> language filter (labeled 'en')
      -> quality gate (composite score >= QUALITY_T)
      -> near-dup removal (minhash-LSH verified pairs; the later doc of
         each pair is dropped)
      -> per-source corpus summary

Everything stays JVM-side except nothing: scoring is codegen'd column
math, near-dup pairs come from the bucket-blocked LSH plan (dedup.py),
removal is a broadcast anti-join (the drop-list is pairs, tiny relative
to the corpus), and the final rollup shuffles one row per source. The
whole pipeline is one DAG — no materialization between stages.

The DuckDB oracle reuses dedup's verified-pair CTEs so both engines drop
exactly the same documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import load_tables
from ..functions import text as T
from .dedup import _sql_minhash_pair_ctes, q_dedup_minhash_lsh
from .text import SQL_QUALITY, SQL_TOKENS_WS

QUALITY_T = 0.5
PREP_LANG = "en"


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source summary of the cleaned corpus (kept docs, token mass,
    quality mass) plus how many eligible docs near-dup removal dropped."""
    docs = load_tables(spark, sf_dir)["documents"]
    eligible = docs.filter(F.col("lang") == PREP_LANG).select(
        "doc_id",
        "source",
        T.token_count_ws("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
    ).filter(F.col("quality") >= QUALITY_T)

    # near-dup policy: of each verified pair, the larger doc_id is dropped.
    drops = (
        q_dedup_minhash_lsh(spark, sf_dir)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    kept = eligible.join(F.broadcast(drops), "doc_id", "left_anti")

    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum("quality"), 6).alias("sum_quality"),
        )
        .orderBy("source")
    )


def _oracle_corpus_prep() -> str:
    return f"""
    WITH {_sql_minhash_pair_ctes()},
    drops AS (SELECT DISTINCT id_b AS doc_id FROM pairs),
    eligible AS (
        SELECT doc_id, source,
               {SQL_TOKENS_WS} AS n_tokens,
               {SQL_QUALITY} AS quality
        FROM documents
        WHERE lang = '{PREP_LANG}' AND {SQL_QUALITY} >= {QUALITY_T}
    ),
    kept AS (
        SELECT * FROM eligible
        WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(SUM(quality), 6) AS sum_quality
    FROM kept
    GROUP BY source
    ORDER BY source
    """


def oracles() -> dict[str, tuple]:
    return {"corpus_prep": (q_corpus_prep, _oracle_corpus_prep())}
