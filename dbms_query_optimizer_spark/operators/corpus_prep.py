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


FUNNEL_STAGES = [
    "0_raw",
    "1_lang",
    "2_quality",
    "3_exact_dedup",
    "4_token_sort_dedup",
    "5_decontaminated",
]


def q_pipeline_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-funnel dashboard every training pipeline publishes: how
    many documents (and how much token mass) survive each cleaning stage
    in sequence — raw → language filter → quality gate → exact dedup →
    order-invariant (token-sort) dedup → benchmark decontamination. The
    per-stage composite that ``q_corpus_prep`` summarizes per source,
    unrolled along the STAGE axis so losses are attributable.

    Stage semantics are cumulative (each dedup canonicalizes within the
    PREVIOUS stage's survivors — dedup sets depend on the candidate
    pool, so ordering is part of the contract the oracle mirrors).
    Canonical = min doc_id per fingerprint. Decontamination drops the
    held-out eval split (doc_id % EVAL_MOD == 0) and every remaining doc
    sharing a word 8-gram with it.

    Shape: one COMPACT checkpointed base pass computes the per-doc
    scalars (quality, both fingerprints, token count — 6 columns, never
    the token arrays); each dedup stage is a conditional-min window per
    fingerprint (= the grouped min + semi-join it replaced, in one
    shuffle, and the stage flags let ONE aggregate job count every
    stage instead of a six-branch union); contamination is the
    broadcast eval-span probe of ``q_decontaminate_ngram``,
    re-tokenizing from the source scan so no corpus-sized array frame
    is ever materialized. Counts are exact; pct_docs is a single IEEE
    division per stage.

    Null-fingerprint semantics (ADVICE r11): with the window
    formulation, rows whose fp is NULL (only possible if text is NULL)
    group TOGETHER and keep the min doc_id — matching the DuckDB
    oracle's GROUP-BY-null behavior, where the replaced semi-join
    would have dropped them all (null never equi-joins). The testdata
    contract has non-null text, so both formulations agree there; the
    window one is the one that stays oracle-faithful if that changes.
    """
    from ..functions.text import fingerprint_md5, word_ngrams
    from ..functions.text import tokens as tok_fn
    from .pipeline_prep import DECON_N, EVAL_MOD

    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.select(
        "doc_id",
        "lang",
        T.token_count_ws("text").cast("long").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
        fingerprint_md5("text").alias("fp_exact"),
        F.md5(
            F.array_join(
                F.array_sort(F.split(F.lower("text"), "[^a-z]+")), " "
            ).cast("binary")
        ).alias("fp_sorted"),
        # deliberately NO token-array column: the checkpoint must stay
        # compact (6 scalar columns per doc); materializing tokenized
        # arrays would make it corpus-sized at 100 TB — the span probe
        # below re-tokenizes from the source scan instead
    ).localCheckpoint()  # every counting stage reuses this compact pass

    # Stage membership as per-row FLAGS over the checkpointed base — the
    # six stage counts then come from ONE aggregate job instead of a
    # six-branch unionAll whose later branches re-executed the dedup
    # group-join chains per branch (r11, guide §2.3/§2.4). "Canonical =
    # min doc_id per fingerprint among the PREVIOUS stage's survivors"
    # is expressed as a conditional min window per fingerprint —
    # provably the groupBy-min + semi-join it replaces, one shuffle
    # each instead of a groupBy + two-sided join re-run per stage.
    from pyspark.sql import Window as W

    f1 = F.coalesce(F.col("lang") == PREP_LANG, F.lit(False))
    flagged = base.withColumn("f1", f1).withColumn(
        "f2", F.col("f1") & (F.col("quality") >= QUALITY_T)
    )
    min3 = F.min(F.when(F.col("f2"), F.col("doc_id"))).over(
        W.partitionBy("fp_exact")
    )
    flagged = flagged.withColumn("f3", F.col("f2") & (F.col("doc_id") == min3))
    min4 = F.min(F.when(F.col("f3"), F.col("doc_id"))).over(
        W.partitionBy("fp_sorted")
    )
    flagged = flagged.withColumn("f4", F.col("f3") & (F.col("doc_id") == min4))

    spans = (
        docs.select("doc_id", tok_fn("text").alias("toks"))
        .select("doc_id", F.explode(word_ngrams("toks", DECON_N)).alias("span"))
        .distinct()
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_spans = spans.filter(is_eval).select("span").distinct()
    contaminated = (
        spans.filter(~is_eval)
        .join(F.broadcast(eval_spans), "span", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    flagged = flagged.join(contaminated, "doc_id", "left").withColumn(
        "f5",
        F.col("f4") & ~is_eval & F.col("is_contaminated").isNull(),
    )

    flags = [F.lit(True), "f1", "f2", "f3", "f4", "f5"]
    aggs = []
    for name, flag in zip(FUNNEL_STAGES, flags):
        c = F.col(flag) if isinstance(flag, str) else flag
        aggs.append(F.count(F.when(c, F.lit(1))).alias(f"n_{name}"))
        aggs.append(F.sum(F.when(c, F.col("n_tokens"))).alias(f"t_{name}"))
    totals = flagged.agg(*aggs)
    stage_rows = ", ".join(
        f"struct('{name}' AS stage, n_{name} AS n, t_{name} AS t)"
        for name in FUNNEL_STAGES
    )
    return (
        totals.select(
            F.expr(
                f"explode(array({stage_rows}))"
            ).alias("r"),
            F.col(f"n_{FUNNEL_STAGES[0]}").alias("n_raw"),
        )
        .select(
            F.col("r.stage").alias("stage"),
            F.col("r.n").alias("n_docs"),
            F.col("r.t").alias("n_tokens"),
            (F.col("r.n").cast("double") / F.col("n_raw").cast("double")).alias(
                "pct_docs"
            ),
        )
        .orderBy("stage")
    )


def _oracle_pipeline_funnel_report() -> str:
    from .dedup import SQL_NORM
    from .pipeline_prep import DECON_N, EVAL_MOD

    concat = " || ' ' || ".join(f"tk[i+{k}]" for k in range(DECON_N))
    return f"""
WITH base AS (
    SELECT doc_id, lang,
           CAST({SQL_TOKENS_WS} AS BIGINT) AS n_tokens,
           {SQL_QUALITY} AS quality,
           md5({SQL_NORM}) AS fp_exact,
           md5(array_to_string(list_sort(
               string_split_regex(lower(text), '[^a-z]+')), ' ')) AS fp_sorted
    FROM documents
), s1 AS (
    SELECT * FROM base WHERE lang = '{PREP_LANG}'
), s2 AS (
    SELECT * FROM s1 WHERE quality >= {QUALITY_T}
), s3 AS (
    SELECT * FROM s2
    WHERE doc_id IN (SELECT MIN(doc_id) FROM s2 GROUP BY fp_exact)
), s4 AS (
    SELECT * FROM s3
    WHERE doc_id IN (SELECT MIN(doc_id) FROM s3 GROUP BY fp_sorted)
), sp AS (
    SELECT DISTINCT doc_id, {concat} AS span
    FROM (SELECT doc_id, string_split(trim({SQL_NORM}), ' ') AS tk
          FROM documents),
         UNNEST(generate_series(1, len(tk) - {DECON_N - 1})) AS t(i)
), ev AS (
    SELECT DISTINCT span FROM sp WHERE doc_id % {EVAL_MOD} = 0
), contaminated AS (
    SELECT DISTINCT doc_id FROM sp JOIN ev USING (span)
    WHERE doc_id % {EVAL_MOD} <> 0
), s5 AS (
    SELECT * FROM s4
    WHERE doc_id % {EVAL_MOD} <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
), stages AS (
    SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM base
    UNION ALL
    SELECT '1_lang', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM s1
    UNION ALL
    SELECT '2_quality', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM s2
    UNION ALL
    SELECT '3_exact_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM s3
    UNION ALL
    SELECT '4_token_sort_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM s4
    UNION ALL
    SELECT '5_decontaminated', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT) FROM s5
), raw AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_raw FROM base
)
SELECT stage, n_docs, n_tokens,
       CAST(n_docs AS DOUBLE) / CAST(n_raw AS DOUBLE) AS pct_docs
FROM stages, raw
ORDER BY stage
"""


def oracles() -> dict[str, tuple]:
    return {
        "corpus_prep": (q_corpus_prep, _oracle_corpus_prep()),
        "pipeline_funnel_report": (
            q_pipeline_funnel_report,
            _oracle_pipeline_funnel_report(),
        ),
    }
