"""Training-corpus preparation operators: decontamination, chunking,
sequence packing, and a skyline/Pareto analytic.

These extend the reference's query surface (it has none of these —
`/root/reference` stops at scan/filter/join ordering, SURVEY §2.2) with the
operations an LLM-data pipeline runs between "raw corpus" and "tokenized
shards":

- decontaminate_ngram : benchmark decontamination — drop/flag training
  documents sharing any word 8-gram with a held-out eval set (the GPT-3 /
  Gopher n-gram-overlap protocol, applied with the corpus's span length).
- chunk_documents     : fixed-size token windows with stride/overlap — the
  doc -> model-context chunking step for embedding or pretraining prep.
- pack_sequences      : concat-and-chunk packing — assign each document its
  (pack_id, pack_offset) in a fixed token-budget stream, per source shard.
- skyline_pareto      : 2-D Pareto frontier (skyline operator) via a single
  sort + running-max window — no quadratic self-join.

Scale design (100 TB corpora):
- decontamination: the eval-side span set is tiny by construction
  (benchmarks are small), so it BROADCASTS; the corpus side is touched in
  one pass — per-doc distinct spans (one shuffle, map-side combined), a
  broadcast left-semi probe (no shuffle), and a groupBy(doc_id) count whose
  input is only the matched rows.
- chunking is embarrassingly parallel (per-row generate+slice, zero
  shuffles beyond the sink's ordering).
- packing partitions by source shard: each shard's prefix-sum window runs
  independently in parallel — no global single-partition window. A global
  stream order would instead reuse the range-partition + broadcast-offsets
  pattern of ``global_row_number``.
- skyline: dominance only needs the per-price max size (groupBy, map-side
  combined), so the window runs over |distinct prices| rows, not |part|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..cache import track_persist
from ..engine import load_tables
from ..functions.text import token_count_ws, tokens, word_ngrams

DECON_N = 8  # decontamination span length (words)
EVAL_MOD = 25  # doc_id % EVAL_MOD == 0 -> held-out eval doc
CHUNK = 32  # chunk size (tokens)
STRIDE = 24  # chunk stride (tokens; CHUNK - STRIDE = 8-token overlap)
PACK_BUDGET = 256  # tokens per packed sequence

SQL_NORM = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
SQL_TOKENS_WS = "len(string_split_regex(trim(text), '\\s+'))"


# ----------------------------------------------------------- decontamination


def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination report: for every training document, the
    number of distinct word 8-grams it shares with the eval split
    (doc_id % 25 == 0), and the resulting drop flag.

    The eval span set is broadcast — at real scale the eval side is a few
    thousand benchmark documents against a 100 TB corpus, so the probe is
    map-side (no shuffle of the corpus span explosion); the only shuffles
    are the per-doc DISTINCT and the final count over matched rows.
    Reference has no text surface at all (`seq_scan.cc:44` int tuples);
    this extends SURVEY §2.2's scalar-function gap.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    spans = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.explode(word_ngrams("toks", DECON_N)).alias("span"))
        .distinct()
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_spans = spans.filter(is_eval).select("span").distinct()
    hits = (
        spans.filter(~is_eval)
        .join(F.broadcast(eval_spans), "span", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.filter(~is_eval)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_overlap_spans"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def _sql_decontaminate() -> str:
    concat = " || ' ' || ".join(f"tk[i+{k}]" for k in range(DECON_N))
    return f"""
    WITH sp AS (
        SELECT DISTINCT doc_id, {concat} AS span
        FROM (SELECT doc_id, string_split(trim({SQL_NORM}), ' ') AS tk FROM documents),
             UNNEST(generate_series(1, len(tk) - {DECON_N - 1})) AS t(i)
    ), ev AS (
        SELECT DISTINCT span FROM sp WHERE doc_id % {EVAL_MOD} = 0
    ), hits AS (
        SELECT doc_id, COUNT(*) AS n_hits
        FROM sp JOIN ev USING (span)
        WHERE doc_id % {EVAL_MOD} <> 0
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_hits, 0) AS n_overlap_spans,
           COALESCE(n_hits, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % {EVAL_MOD} <> 0) d
    LEFT JOIN hits USING (doc_id)
    ORDER BY doc_id
    """


# ----------------------------------------------------------------- chunking


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking: 32-token chunks every 24 tokens
    (8-token overlap), trailing partial chunks kept.

    Pure per-row compute — sequence + slice are JVM higher-order
    functions, the explode is a generator inside whole-stage codegen, and
    there is no shuffle at any corpus size (ordering here is
    presentational; a real pipeline writes chunks partition-preserving).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    d = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(STRIDE)
            )
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start"), CHUNK)
    return (
        d.select(
            "doc_id",
            ((F.col("start") - 1) / STRIDE).cast("long").alias("chunk_id"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


ORACLE_CHUNK_DOCUMENTS = f"""
    SELECT doc_id,
           (s - 1) // {STRIDE} AS chunk_id,
           len(list_slice(tk, s, s + {CHUNK - 1})) AS n_chunk_tokens,
           array_to_string(list_slice(tk, s, s + {CHUNK - 1}), ' ') AS chunk_text
    FROM (SELECT doc_id, string_split(trim({SQL_NORM}), ' ') AS tk FROM documents),
         UNNEST(generate_series(1, greatest(len(tk), 1), {STRIDE})) AS t(s)
    ORDER BY doc_id, chunk_id
    """


# ------------------------------------------------------------------ packing


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per source shard, documents are
    laid into a token stream in doc_id order; each doc gets the pack
    (fixed 256-token budget) and offset where it starts.

    The prefix sum is a window PARTITIONED BY source — every shard packs
    independently and in parallel, which is exactly how sharded
    pretraining pipelines pack (packing never crosses shard files). No
    single-partition global window; a global stream would reuse the
    range-partition + broadcast-offsets pattern of ``global_row_number``.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    d = docs.select(
        "doc_id", "source", token_count_ws("text").alias("n_tokens")
    ).withColumn("start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("start_off") / PACK_BUDGET).cast("long").alias("pack_id"),
        (F.col("start_off") % PACK_BUDGET).cast("long").alias("pack_offset"),
    ).orderBy("source", "doc_id")


ORACLE_PACK_SEQUENCES = f"""
    SELECT doc_id, source, n_tokens,
           CAST(start_off // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(start_off % {PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM (
        SELECT doc_id, source, {SQL_TOKENS_WS} AS n_tokens,
               COALESCE(SUM({SQL_TOKENS_WS}) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS start_off
        FROM documents
    )
    ORDER BY source, doc_id
    """


# ------------------------------------------------------------------ skyline


def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: (p_retailprice, p_size)
    pairs not dominated by any part that is >= in both dimensions and
    strictly greater in one.

    Linearithmic, not quadratic: dominance against the frontier only needs
    each price's max size (map-side-combined groupBy), then one running-max
    prefix scan in descending price order — a price survives iff its max
    size strictly exceeds every higher price's. The scan is the
    DISTRIBUTED exclusive prefix max (``relational.distributed_prefix_agg``:
    range buckets + parallel local windows + an n_parts-scalar carry) —
    the |distinct prices| domain is data-dependent, so it never rides a
    single-partition window. No NOT EXISTS self-join anywhere. The oracle
    states the textbook quadratic NOT EXISTS definition, proving the
    single-pass plan computes the same frontier.
    """
    from .relational import distributed_prefix_agg, range_bucket

    part = load_tables(spark, sf_dir)["part"]
    by_price = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("max_size")
    ).localCheckpoint()  # two passes: bucket cuts + the scan itself
    scanned = distributed_prefix_agg(
        by_price,
        "price",
        "max_size",
        range_bucket(by_price, "price", 8, descending=True),
        8,
        kind="max",
        out_col="best_above",
        descending=True,
    )
    return (
        scanned.filter(
            F.col("best_above").isNull()
            | (F.col("max_size") > F.col("best_above"))
        )
        .select("price", F.col("max_size").alias("size"))
        .orderBy(F.col("price").desc())
    )


ORACLE_SKYLINE_PARETO = """
    WITH pts AS (SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part)
    SELECT price, size
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price >= p.price AND q.size >= p.size
          AND (q.price > p.price OR q.size > p.size)
    )
    ORDER BY price DESC
    """


# --------------------------------------------------- target encoding (k-fold)

TE_FOLDS = 5  # folds for out-of-fold encoding (fold = doc_id % TE_FOLDS)
TE_SMOOTH = 20  # prior pseudo-count (m in the m-estimate smoother)


def q_target_encode_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe k-fold target encoding — the categorical-feature prep
    every tabular training pipeline needs: encode each (category, fold)
    cell with the target mean computed over the OTHER folds only, so a
    row never sees its own label through its encoding (the leak that
    silently inflates validation scores). Category = document source,
    target = is-English, fold = doc_id % TE_FOLDS; the m-estimate
    smoother shrinks thin categories toward the global prior.

    Scale shape: one groupBy collapses the corpus to |sources|×|folds|
    cells before anything wide; per-source totals are a window over that
    tiny frame, the global prior is a broadcast 1-row aggregate, and the
    out-of-fold arithmetic is total-minus-own — pure column math, no
    second scan, no per-fold job. Encodings are single IEEE divisions of
    exact integer sums (bit-identical across engines), never rounded.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.select(
        "source",
        F.pmod(F.col("doc_id"), F.lit(TE_FOLDS)).cast("int").alias("fold"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    per = base.groupBy("source", "fold").agg(
        F.count(F.lit(1)).alias("n_fold"), F.sum("y").alias("pos_fold")
    )
    w = W.partitionBy("source")
    per = per.withColumn("n_src", F.sum("n_fold").over(w)).withColumn(
        "pos_src", F.sum("pos_fold").over(w)
    )
    # global prior from the per-cell aggregate — the corpus is scanned
    # exactly once; glob is a 1-row reduction of |sources|x|folds| cells
    glob = per.agg(
        F.sum("pos_fold").alias("g_pos"), F.sum("n_fold").alias("g_n")
    )
    n_out = F.col("n_src") - F.col("n_fold")
    pos_out = F.col("pos_src") - F.col("pos_fold")
    prior = F.col("g_pos").cast("double") / F.col("g_n")
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "source",
            "fold",
            F.col("n_fold").cast("long").alias("n_fold"),
            F.col("pos_fold").cast("long").alias("pos_fold"),
            n_out.cast("long").alias("n_out"),
            pos_out.cast("long").alias("pos_out"),
            F.when(n_out > 0, pos_out.cast("double") / n_out.cast("double"))
            .otherwise(prior)
            .alias("enc_oof"),
            (
                (pos_out.cast("double") + F.lit(TE_SMOOTH) * prior)
                / (n_out.cast("double") + F.lit(TE_SMOOTH))
            ).alias("enc_smooth"),
        )
        .orderBy("source", "fold")
    )


ORACLE_TARGET_ENCODE_KFOLD = f"""
WITH base AS (
    SELECT source, CAST(doc_id % {TE_FOLDS} AS INT) AS fold,
           CAST(lang = 'en' AS BIGINT) AS y
    FROM documents
), per AS (
    SELECT source, fold,
           CAST(COUNT(*) AS BIGINT) AS n_fold,
           CAST(SUM(y) AS BIGINT) AS pos_fold
    FROM base GROUP BY source, fold
), tot AS (
    SELECT source, fold, n_fold, pos_fold,
           CAST(SUM(n_fold) OVER (PARTITION BY source) AS BIGINT) AS n_src,
           CAST(SUM(pos_fold) OVER (PARTITION BY source) AS BIGINT) AS pos_src
    FROM per
), g AS (
    SELECT CAST(SUM(y) AS BIGINT) AS g_pos, CAST(COUNT(*) AS BIGINT) AS g_n
    FROM base
)
SELECT source, fold, n_fold, pos_fold,
       CAST(n_src - n_fold AS BIGINT) AS n_out,
       CAST(pos_src - pos_fold AS BIGINT) AS pos_out,
       CASE WHEN n_src - n_fold > 0
            THEN CAST(pos_src - pos_fold AS DOUBLE)
                 / CAST(n_src - n_fold AS DOUBLE)
            ELSE CAST(g_pos AS DOUBLE) / g_n END AS enc_oof,
       (CAST(pos_src - pos_fold AS DOUBLE)
        + {TE_SMOOTH} * (CAST(g_pos AS DOUBLE) / g_n))
       / (CAST(n_src - n_fold AS DOUBLE) + {TE_SMOOTH}) AS enc_smooth
FROM tot, g
ORDER BY source, fold
"""


# ------------------------------------------------- balanced shard assignment

N_OUTPUT_SHARDS = 8
SHARD_RANK_PARTS = 8  # range buckets for the distributed size rank


def q_shard_assignment_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output sharding: assign documents to N_OUTPUT_SHARDS
    writer shards so total content per shard is near-equal — the step
    that decides whether 1000 writers finish together or one straggler
    holds the job. Greedy LPT approximation, deterministically: rank
    docs by size descending (the DISTRIBUTED range-partitioned
    row_number — no single-partition window) and deal round-robin by
    rank, so the k largest docs land on k different shards.

    Output is the per-shard manifest an orchestrator audits: exact doc
    and char totals plus each shard's extremes. One ranked projection,
    one aggregate — at 100 TB the only full-data moves are the range
    shuffle and the final |shards|-row agg.
    """
    from .relational import distributed_row_number, range_bucket

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    pid = range_bucket(docs, "n_chars", SHARD_RANK_PARTS, descending=True)
    ranked = distributed_row_number(
        docs,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        pid,
        SHARD_RANK_PARTS,
    )
    return (
        ranked.withColumn(
            "shard", ((F.col("rn") - 1) % N_OUTPUT_SHARDS).cast("int")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_chars").alias("max_chars"),
            F.min("n_chars").alias("min_chars"),
        )
        .orderBy("shard")
    )


ORACLE_SHARD_ASSIGNMENT_BALANCED = f"""
WITH ranked AS (
    SELECT doc_id, n_chars,
           ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
    FROM documents
)
SELECT CAST((rn - 1) % {N_OUTPUT_SHARDS} AS INT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars
FROM ranked
GROUP BY shard
ORDER BY shard
"""


# --------------------------------------------------- span-corruption masking

MASK_HEX = ("0", "1", "2")  # md5 first hex digit -> 3/16 token mask rate


def q_span_corruption_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption statistics: deterministically mask ~19%
    of each document's tokens (md5 of doc_id:position — reproducible
    across runs AND engines, no RNG state to ship) and report, per doc,
    the token count, masked count, and number of CONTIGUOUS masked spans
    (adjacent masked tokens merge into one sentinel span — the quantity
    that sets the denoising objective's sentinel budget).

    Span counting is a lag flag, not a second pass: a span STARTS at a
    masked token whose predecessor (in the per-doc token order) is
    unmasked or absent, so n_spans = SUM(span_start) — one
    doc-partitioned lag window (bounded by document length, never
    corpus-global) and ONE aggregate over one scan+explode. All JVM
    codegen: split, posexplode, md5; exact integers end to end.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), "[^a-z]+")).alias(
                "pos", "token"
            ),
        )
        .filter(F.length("token") > 0)
        .select(
            "doc_id",
            "pos",
            F.substring(
                F.md5(F.concat_ws(":", "doc_id", "pos")), 1, 1
            ).isin(*MASK_HEX).alias("m"),
        )
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    flagged = toks.withColumn(
        "span_start",
        (F.col("m") & ~F.coalesce(F.lag("m").over(w), F.lit(False))).cast(
            "long"
        ),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("m").cast("long")).alias("n_masked"),
            F.sum("span_start").alias("n_spans"),
        )
        .orderBy("doc_id")
    )


ORACLE_SPAN_CORRUPTION_MASK = f"""
WITH base AS (
    SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS arr
    FROM documents
), idx AS (
    SELECT doc_id, arr, UNNEST(range(len(arr))) AS pos FROM base
), flags AS (
    SELECT doc_id, CAST(pos AS INT) AS pos,
           substring(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 1)
               IN ({', '.join(repr(h) for h in MASK_HEX)}) AS m
    FROM idx WHERE length(arr[CAST(pos AS INT) + 1]) > 0
), spans AS (
    SELECT doc_id, CAST(COUNT(DISTINCT pos - rn) AS BIGINT) AS n_spans
    FROM (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        FROM flags WHERE m
    ) GROUP BY doc_id
)
SELECT f.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN f.m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(COALESCE(MAX(s.n_spans), 0) AS BIGINT) AS n_spans
FROM flags f LEFT JOIN spans s ON s.doc_id = f.doc_id
GROUP BY f.doc_id
ORDER BY f.doc_id
"""


# ------------------------------------------------- WOE / IV feature binning

WOE_BINS = 10


def q_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence feature binning — the credit-scoring /
    risk-model companion of ``q_target_encode_kfold``: bin a numeric
    feature (doc length) into exact deciles, then score each bin by
    WOE = ln(P(bin|positive) / P(bin|negative)) with Laplace smoothing,
    plus its information-value contribution. Deciles come from the
    distributed range-partitioned rank + ``exact_ntile`` (no
    single-partition window), so the binning itself is the same exact
    order-statistic machinery as ``stats_equidepth_histogram``.

    Cross-engine determinism: counts are exact integers; the smoothed
    odds ratio is assembled as ONE division of exact integer products
    (2·pos+1 scaling keeps Laplace's +0.5 in the integer domain), so
    both engines take ln of the bit-identical double; ROUND(...,6)
    absorbs any last-ulp libm difference (the text_entropy precedent).
    Per-bin IV contributions are emitted individually — no cross-bin
    float summation whose order could differ between engines.
    """
    from .relational import distributed_row_number, exact_ntile, range_bucket

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "n_chars", (F.col("lang") == "en").cast("long").alias("y")
    )
    n_parts = 8
    ranked, n = distributed_row_number(
        docs,
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        range_bucket(docs, "n_chars", n_parts),
        n_parts,
        return_total=True,
    )
    bins = (
        ranked.withColumn("bin", exact_ntile("rn", n, WOE_BINS))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("y").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"),
        )
    )
    tot = bins.agg(
        F.sum("n_pos").alias("t_pos"), F.sum("n_neg").alias("t_neg")
    )
    # Laplace +0.5 in the integer domain: p2 = 2*pos+1, scaled totals
    p2 = 2 * F.col("n_pos") + 1
    n2 = 2 * F.col("n_neg") + 1
    tp2 = 2 * F.col("t_pos") + WOE_BINS
    tn2 = 2 * F.col("t_neg") + WOE_BINS
    odds = (p2 * tn2).cast("double") / (n2 * tp2).cast("double")
    woe = F.log(odds)
    iv = (
        p2.cast("double") / tp2.cast("double")
        - n2.cast("double") / tn2.cast("double")
    ) * woe
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_rows",
            "n_pos",
            "n_neg",
            F.round(woe, 6).alias("woe"),
            F.round(iv, 6).alias("iv_contrib"),
        )
        .orderBy("bin")
    )


ORACLE_WOE_BINNING = f"""
WITH ranked AS (
    SELECT doc_id, n_chars, CAST(lang = 'en' AS BIGINT) AS y,
           NTILE({WOE_BINS}) OVER (ORDER BY n_chars, doc_id) AS bin
    FROM documents
), bins AS (
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
    FROM ranked GROUP BY bin
), tot AS (
    SELECT CAST(SUM(n_pos) AS BIGINT) AS t_pos,
           CAST(SUM(n_neg) AS BIGINT) AS t_neg
    FROM bins
)
SELECT bin, n_rows, n_pos, n_neg,
       ROUND(ln(CAST((2 * n_pos + 1) * (2 * t_neg + {WOE_BINS}) AS DOUBLE)
                / CAST((2 * n_neg + 1) * (2 * t_pos + {WOE_BINS}) AS DOUBLE)),
             6) AS woe,
       ROUND((CAST(2 * n_pos + 1 AS DOUBLE) / CAST(2 * t_pos + {WOE_BINS} AS DOUBLE)
              - CAST(2 * n_neg + 1 AS DOUBLE) / CAST(2 * t_neg + {WOE_BINS} AS DOUBLE))
             * ln(CAST((2 * n_pos + 1) * (2 * t_neg + {WOE_BINS}) AS DOUBLE)
                  / CAST((2 * n_neg + 1) * (2 * t_pos + {WOE_BINS}) AS DOUBLE)),
             6) AS iv_contrib
FROM bins, tot
ORDER BY bin
"""


FH_BUCKETS = 64  # hashed feature-vector width
FH_BASE = 257
FH_PRIME = 2_147_483_647  # Horner steps stay < 2^63 (functions.text.ROLL_*)


def q_feature_hash_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al.): project each document's
    bag-of-words into a fixed FH_BUCKETS-wide count vector via a
    portable polynomial hash — the vocabulary-free featurizer that
    needs no fitted dictionary, so it streams over any corpus size with
    zero training state. Emitted per document as the sparse-vector
    summary (nnz, exact L2² mass, heaviest bucket) rather than 64 dense
    columns.

    The hash is Horner's rule over codepoints mod 2^31−1 — the same
    exact-BIGINT construction as ``functions.text.rolling_hashes``, so
    both engines compute identical buckets (murmur built-ins differ
    between Spark and DuckDB and are unusable cross-engine; DuckDB's
    ``list_reduce`` seeds with the first element, which equals Horner
    from 0 since 0·B + c₀ = c₀).

    Scale shape: map-only per-document work (explode → hash → two
    grouped counts re-keyed by doc_id) — the shuffle carries one row
    per (doc, nonempty bucket), bounded by nnz ≤ 64 per doc; no global
    state, no Python.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("w"),
    )
    cps = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.ascii(F.col("w").substr(i, F.lit(1))),
        ).alias("cp"),
    )
    hashed = cps.select(
        "doc_id",
        F.pmod(
            F.aggregate(
                "cp",
                F.lit(0).cast("long"),
                lambda h, c: F.pmod(
                    h * F.lit(FH_BASE) + c, F.lit(FH_PRIME)
                ),
            ),
            F.lit(FH_BUCKETS),
        ).alias("bucket"),
    )
    per_bucket = hashed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_top = W.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("bucket")
    )
    return (
        per_bucket.withColumn("rk", F.row_number().over(w_top))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nnz"),
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("c")).alias("l2sq"),
            F.max(F.when(F.col("rk") == 1, F.col("bucket"))).alias(
                "top_bucket"
            ),
            F.max(F.when(F.col("rk") == 1, F.col("c"))).alias("top_count"),
        )
        .orderBy("doc_id")
    )


ORACLE_FEATURE_HASH_VECTORIZE = f"""
WITH toks AS (
    SELECT doc_id, UNNEST(list_filter(
               string_split_regex(lower(text), '[^a-z]+'),
               x -> length(x) > 0)) AS w
    FROM documents
), hashed AS (
    SELECT doc_id,
           list_reduce(list_transform(generate_series(1, length(w)),
                                      i -> CAST(ord(substr(w, CAST(i AS INT), 1))
                                                AS BIGINT)),
                       (h, c) -> (h * {FH_BASE} + c) % {FH_PRIME})
               % {FH_BUCKETS} AS bucket
    FROM toks
), per_bucket AS (
    SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
    FROM hashed GROUP BY doc_id, bucket
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY c DESC, bucket) AS rk
    FROM per_bucket
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS nnz,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(c * c) AS BIGINT) AS l2sq,
       CAST(MAX(CASE WHEN rk = 1 THEN bucket END) AS BIGINT) AS top_bucket,
       CAST(MAX(CASE WHEN rk = 1 THEN c END) AS BIGINT) AS top_count
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
"""


STD_SPLIT_BUCKETS = 10  # md5 split: buckets 0-7 train, 8-9 held out
STD_TRAIN_BUCKETS = 8
STD_Z_FENCE = 3.0  # |z| fence for the outlier flag


def q_feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe feature standardization: per-feature mean/std are
    FITTED on the train split only (the deterministic md5 hash split,
    ``sampling.q_hash_split_train``'s convention) and APPLIED to the
    held-out split — the transform every feature pipeline runs before
    modeling, with the fit/apply separation that target_encode_kfold
    enforces for encodings applied to scalers. Statistics computed on
    the full frame would leak the eval distribution into training-time
    normalization.

    Shape: features unpivot via ``stack`` (no join), the fit is one
    grouped aggregate over the train rows (2 result rows — broadcast
    back), the apply is one more grouped pass over the eval rows.
    Determinism: fit sums are exact BIGINTs; mean/std/z are fixed IEEE
    expression trees over those exact integers, written identically in
    the oracle, and the emitted per-feature row carries the exact
    integers alongside the derived doubles so any drift is localized.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % STD_SPLIT_BUCKETS
    )
    base = docs.select(
        bucket.alias("bucket"),
        F.col("n_chars").cast("long").alias("f_n_chars"),
        token_count_ws("text").cast("long").alias("f_n_tokens"),
    )
    # Reused by the fit pass and the apply pass. persist, not
    # localCheckpoint: the unpivot is CORPUS-sized (2 rows per doc), so
    # an eager checkpoint pins O(corpus) bytes with no recompute path;
    # persist keeps lineage and the harness unpersists after the action.
    long = track_persist(
        base.selectExpr(
            "bucket",
            "stack(2, 'n_chars', f_n_chars, 'n_tokens', f_n_tokens)"
            " AS (feature, x)",
        )
    )
    tr = (
        long.filter(F.col("bucket") < STD_TRAIN_BUCKETS)
        .groupBy("feature")
        .agg(
            F.count(F.lit(1)).alias("n_tr"),
            F.sum("x").alias("s_tr"),
            F.sum(F.col("x") * F.col("x")).alias("ss_tr"),
        )
    )
    ev = long.filter(F.col("bucket") >= STD_TRAIN_BUCKETS)
    mean = F.col("s_tr").cast("double") / F.col("n_tr").cast("double")
    std = F.sqrt(
        (
            F.col("n_tr").cast("double") * F.col("ss_tr").cast("double")
            - F.col("s_tr").cast("double") * F.col("s_tr").cast("double")
        )
        / (
            F.col("n_tr").cast("double")
            * (F.col("n_tr") - F.lit(1)).cast("double")
        )
    )
    z = (F.col("x").cast("double") - mean) / std
    return (
        ev.join(F.broadcast(tr), "feature")
        .groupBy("feature", "n_tr", "s_tr", "ss_tr")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                (F.abs(z) > F.lit(STD_Z_FENCE)).cast("long")
            ).alias("n_flagged"),
        )
        .select(
            "feature",
            "n_tr",
            "s_tr",
            "ss_tr",
            "n_eval",
            "n_flagged",
            mean.alias("mean_tr"),
            std.alias("std_tr"),
        )
        .orderBy("feature")
    )


_STD_MEAN = "(CAST(s_tr AS DOUBLE) / CAST(n_tr AS DOUBLE))"
_STD_STD = (
    "sqrt((CAST(n_tr AS DOUBLE) * CAST(ss_tr AS DOUBLE)"
    " - CAST(s_tr AS DOUBLE) * CAST(s_tr AS DOUBLE))"
    " / (CAST(n_tr AS DOUBLE) * CAST(n_tr - 1 AS DOUBLE)))"
)

ORACLE_FEATURE_STANDARDIZE = f"""
WITH base AS (
    SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % {STD_SPLIT_BUCKETS} AS BIGINT) AS bucket,
           CAST(n_chars AS BIGINT) AS f_n_chars,
           CAST({SQL_TOKENS_WS} AS BIGINT) AS f_n_tokens
    FROM documents
), long AS (
    SELECT bucket, 'n_chars' AS feature, f_n_chars AS x FROM base
    UNION ALL
    SELECT bucket, 'n_tokens' AS feature, f_n_tokens AS x FROM base
), tr AS (
    SELECT feature,
           CAST(COUNT(*) AS BIGINT) AS n_tr,
           CAST(SUM(x) AS BIGINT) AS s_tr,
           CAST(SUM(x * x) AS BIGINT) AS ss_tr
    FROM long WHERE bucket < {STD_TRAIN_BUCKETS} GROUP BY feature
), ev AS (
    SELECT feature, x FROM long WHERE bucket >= {STD_TRAIN_BUCKETS}
)
SELECT feature, n_tr, s_tr, ss_tr,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN abs((CAST(x AS DOUBLE) - {_STD_MEAN}) / {_STD_STD})
                          > {STD_Z_FENCE} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged,
       {_STD_MEAN} AS mean_tr,
       {_STD_STD} AS std_tr
FROM ev JOIN tr USING (feature)
GROUP BY feature, n_tr, s_tr, ss_tr
ORDER BY feature
"""


def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by the log-likelihood ratio of a TARGET hashed-unigram
    distribution (here: the English subcorpus) to the RAW corpus
    distribution — the published importance-resampling recipe for
    picking pretraining data that looks like a target domain.

    Both distributions live on the same FH_BUCKETS hashed-feature space
    as ``q_feature_hash_vectorize`` (portable Horner hash, identical
    buckets on both engines), Laplace-smoothed. Per-bucket log-ratios
    are quantized to nano-nats ONCE (ROUND(lr·1e9) → BIGINT, the
    ``mutual_information_features`` contract), so each document's
    weight Σ_b c_db·lr_nano_b is an order-free exact integer, and the
    per-token rate uses integer DIV.

    Scale shape: token explode is map-side; the two LM tables are
    FH_BUCKETS-row aggregates that broadcast; per-(doc,bucket) counts
    shuffle once keyed by doc (bounded by nnz ≤ FH_BUCKETS per doc);
    one grouped sum emits the weights. No Python, no global state —
    exactly why DSIR's hashed features scale where a neural scorer
    needs a GPU fleet.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("w"),
    )
    # The token-occurrence frame itself is never materialized (corpus-
    # sized), but since r11 it is only DERIVED ONCE: the per-(doc,
    # lang, bucket) count frame below is nnz-bounded (≤ FH_BUCKETS rows
    # per doc — the compressed representation), so THAT is what
    # persists, and both the LM tables and the per-doc weights
    # aggregate from it. The previous form re-tokenized and re-hashed
    # the whole corpus twice (once per consumer) to avoid pinning the
    # occurrence frame; collapsing to the nnz frame gets one pass AND
    # bounded storage (guide §2.3 "aggregate before you shuffle").
    hashed = toks.select(
        "doc_id",
        "lang",
        F.pmod(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.ascii(F.col("w").substr(i, F.lit(1))),
                ),
                F.lit(0).cast("long"),
                lambda h, c: F.pmod(
                    h * F.lit(FH_BASE) + c, F.lit(FH_PRIME)
                ),
            ),
            F.lit(FH_BUCKETS),
        ).alias("bucket"),
    )
    # lang is functionally dependent on doc_id, so grouping by it too
    # changes no group; the counts are exact longs either way
    per_dlb = track_persist(
        hashed.groupBy("doc_id", "lang", "bucket").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    lm = per_dlb.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("lang") == "en", F.col("c")).otherwise(F.lit(0))
        ).alias("ct"),
        F.sum("c").alias("cr"),
    )
    tot = lm.agg(F.sum("ct").alias("t_tot"), F.sum("cr").alias("r_tot"))
    lr = (
        lm.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.col("ct") + F.lit(1)).cast("double")
                        / (F.col("t_tot") + F.lit(FH_BUCKETS)).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + F.lit(1)).cast("double")
                        / (F.col("r_tot") + F.lit(FH_BUCKETS)).cast("double")
                    )
                )
                * F.lit(1000000000.0)
            ).cast("long").alias("lr_nano"),
        )
    )
    per_doc_bucket = per_dlb.select("doc_id", "bucket", "c")
    return (
        per_doc_bucket.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lr_nano")).alias("weight_nano"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "weight_nano",
            F.expr("weight_nano DIV n_tokens").alias("per_token_nano"),
        )
        .orderBy("doc_id")
    )


ORACLE_DSIR_IMPORTANCE_WEIGHTS = f"""
WITH toks AS (
    SELECT doc_id, lang,
           UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> length(x) > 0)) AS w
    FROM documents
), hashed AS (
    SELECT doc_id, lang,
           list_reduce(list_transform(generate_series(1, length(w)),
                                      i -> CAST(ord(substr(w, CAST(i AS INT), 1))
                                                AS BIGINT)),
                       (h, c) -> (h * {FH_BASE} + c) % {FH_PRIME})
               % {FH_BUCKETS} AS bucket
    FROM toks
), lm AS (
    SELECT bucket,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
           CAST(COUNT(*) AS BIGINT) AS cr
    FROM hashed GROUP BY bucket
), tot AS (
    SELECT CAST(SUM(ct) AS BIGINT) AS t_tot,
           CAST(SUM(cr) AS BIGINT) AS r_tot
    FROM lm
), lr AS (
    SELECT bucket,
           CAST(ROUND((ln(CAST(ct + 1 AS DOUBLE)
                          / CAST(t_tot + {FH_BUCKETS} AS DOUBLE))
                       - ln(CAST(cr + 1 AS DOUBLE)
                            / CAST(r_tot + {FH_BUCKETS} AS DOUBLE)))
                      * 1000000000.0) AS BIGINT) AS lr_nano
    FROM lm, tot
), per_doc_bucket AS (
    SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
    FROM hashed GROUP BY doc_id, bucket
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(c * lr_nano) AS BIGINT) AS weight_nano,
       CAST(SUM(c * lr_nano) AS BIGINT) // CAST(SUM(c) AS BIGINT)
           AS per_token_nano
FROM per_doc_bucket JOIN lr USING (bucket)
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------------------------- padding-waste report

# Fixed power-of-two batch-length ladder. A literal CASE ladder instead
# of 2^ceil(log2 n): LOG2 at exact powers of two sits on a float
# boundary both engines must round identically — a contract we refuse
# to depend on when the integer CASE costs nothing.
PAD_LADDER = [16, 32, 64, 128, 256, 512, 1024]


def _pad_cap_spark() -> F.Column:
    expr = F.lit(PAD_LADDER[-1] * 2)  # catch-all top bucket
    for cap in reversed(PAD_LADDER):
        expr = F.when(F.col("n_tokens") <= cap, F.lit(cap)).otherwise(expr)
    return expr


def _pad_cap_sql(col: str) -> str:
    branches = " ".join(
        f"WHEN {col} <= {cap} THEN {cap}" for cap in PAD_LADDER
    )
    return f"CASE {branches} ELSE {PAD_LADDER[-1] * 2} END"


def q_pad_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for length-bucketed batching — the sizing
    report a training pipeline runs BEFORE choosing batch shapes: round
    every document up to its power-of-two length bucket and report, per
    bucket, how many tokens the padding burns. (Packing —
    ``q_pack_sequences`` — eliminates the waste; this quantifies what
    naive per-document batching would cost, which is the number that
    justifies packing in a dataset card.)

    Documents longer than the top ladder rung are TRUNCATED to it —
    the real pipeline behavior for over-long sequences — and the lost
    tokens are reported separately, so padded_tokens is non-negative
    by construction (a document can never "pad" a bucket it overflows;
    review finding, round 8).

    Exact integers end to end: whitespace token counts, a literal CASE
    ladder for the bucket cap (no float log2), kept = min(tokens, cap),
    padded = cap·n_docs − Σkept, and waste in basis points via integer
    DIV. One map-side-combined aggregate over one scan; output is ≤
    |ladder|+1 rows.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    d = (
        docs.select(token_count_ws("text").alias("n_tokens"))
        .withColumn("bucket_cap", _pad_cap_spark())
        .withColumn("kept", F.least("n_tokens", "bucket_cap"))
    )
    return (
        d.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("token_sum"),
            F.sum(F.col("n_tokens") - F.col("kept")).alias("truncated_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "token_sum",
            "truncated_tokens",
            (F.col("bucket_cap") * F.col("n_docs") - F.col("token_sum")).alias(
                "padded_tokens"
            ),
            F.expr(
                "((bucket_cap * n_docs - token_sum) * 10000)"
                " DIV (bucket_cap * n_docs)"
            ).alias("waste_bp"),
        )
        .orderBy("bucket_cap")
    )


ORACLE_PAD_WASTE_REPORT = f"""
WITH d AS (
    SELECT {_pad_cap_sql(SQL_TOKENS_WS)} AS bucket_cap,
           {SQL_TOKENS_WS} AS n_tokens
    FROM documents
), agg AS (
    SELECT bucket_cap,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEAST(n_tokens, bucket_cap)) AS BIGINT) AS token_sum,
           CAST(SUM(n_tokens - LEAST(n_tokens, bucket_cap)) AS BIGINT)
               AS truncated_tokens
    FROM d GROUP BY bucket_cap
)
SELECT bucket_cap, n_docs, token_sum, truncated_tokens,
       bucket_cap * n_docs - token_sum AS padded_tokens,
       ((bucket_cap * n_docs - token_sum) * 10000)
           // (bucket_cap * n_docs) AS waste_bp
FROM agg
ORDER BY bucket_cap
"""


def oracles():
    return {
        "pad_waste_report": (q_pad_waste_report, ORACLE_PAD_WASTE_REPORT),
        "dsir_importance_weights": (
            q_dsir_importance_weights,
            ORACLE_DSIR_IMPORTANCE_WEIGHTS,
        ),
        "feature_standardize": (
            q_feature_standardize,
            ORACLE_FEATURE_STANDARDIZE,
        ),
        "feature_hash_vectorize": (
            q_feature_hash_vectorize,
            ORACLE_FEATURE_HASH_VECTORIZE,
        ),
        "woe_binning": (q_woe_binning, ORACLE_WOE_BINNING),
        "decontaminate_ngram": (q_decontaminate_ngram, _sql_decontaminate()),
        "chunk_documents": (q_chunk_documents, ORACLE_CHUNK_DOCUMENTS),
        "pack_sequences": (q_pack_sequences, ORACLE_PACK_SEQUENCES),
        "skyline_pareto": (q_skyline_pareto, ORACLE_SKYLINE_PARETO),
        "target_encode_kfold": (
            q_target_encode_kfold,
            ORACLE_TARGET_ENCODE_KFOLD,
        ),
        "shard_assignment_balanced": (
            q_shard_assignment_balanced,
            ORACLE_SHARD_ASSIGNMENT_BALANCED,
        ),
        "span_corruption_mask": (
            q_span_corruption_mask,
            ORACLE_SPAN_CORRUPTION_MASK,
        ),
    }
