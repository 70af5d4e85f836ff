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
    """Stratified sample: per-language keep fractions (the data-mixing
    knob — e.g. downweight the dominant language), then per-stratum
    counts.

    The per-row draw is a pure function of the row key (md5 hex chars
    17-24 — disjoint from the split's chars 1-8 and the weighted
    sample's 9-16, so all three memberships stay independent), compared
    against the stratum's fraction — a map-side filter fused into the
    scan, no shuffle until the summarizing groupBy, and reproducible
    across runs, partitionings, and engines. RNG ``sampleBy`` gives the
    same statistics but its membership is engine-internal (seeded
    partition-order Bernoulli), which made this entry rows-only through
    round 5; the key-hash draw is the same sampling design a 100 TB
    pipeline wants anyway (membership survives recomputation and
    repartitioning) and lets DuckDB recompute the exact counts.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    fmap = F.create_map(
        *[
            x
            for lang, frac in sorted(STRATA_FRACTIONS.items())
            for x in (F.lit(lang), F.lit(frac))
        ]
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 17, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    sampled = docs.filter(u < fmap[F.col("lang")])
    return (
        sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


def _strata_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {frac}"
        for lang, frac in sorted(STRATA_FRACTIONS.items())
    )
    return f"CASE lang {whens} END"


ORACLE_SAMPLE_STRATIFIED = f"""
WITH s AS (
    SELECT lang,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 17, 8))::BIGINT
               / 4294967296.0 AS u
    FROM documents
)
SELECT lang, COUNT(*) AS n_sampled
FROM s
WHERE u < {_strata_case_sql()}
GROUP BY lang
ORDER BY lang
"""


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sample: each document is kept with
    probability proportional to its length (``n_chars / max(n_chars)``) —
    the token-budget-proportional downsampling a corpus mixer uses. The
    uniform draw is a pure function of the row key (md5 hex chars 9-16,
    disjoint from the split's chars 1-8, so sample and split membership
    stay independent), making the sample reproducible across runs,
    partitionings, and engines — oracle-checked exactly, unlike RNG
    ``sampleBy``.

    Scale: max(n_chars) is one scalar broadcast back; the keep test is a
    map-side filter fused into the scan — no shuffle at any size. The
    boundary compare uses the RAW draw (exact dyadic rational, identical
    IEEE arithmetic on both engines) so membership can never flip; the
    reported ``u`` is rounded only for display.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    wmax = docs.agg(F.max("n_chars").alias("wmax"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.crossJoin(F.broadcast(wmax))
        .withColumn("_u", u)
        .filter(F.col("_u") * F.col("wmax") < F.col("n_chars"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round("_u", 6).alias("u"),
        )
        .orderBy("doc_id")
    )


ORACLE_SAMPLE_WEIGHTED = """
WITH w AS (SELECT MAX(n_chars) AS wmax FROM documents),
s AS (
    SELECT doc_id, lang, n_chars, wmax,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
               / 4294967296.0 AS u
    FROM documents CROSS JOIN w
)
SELECT doc_id, lang, n_chars, ROUND(u, 6) AS u
FROM s
WHERE u * wmax < n_chars
ORDER BY doc_id
"""


AQP_RATE_BITS = 4  # must be a multiple of 4: the predicate tests whole hex nibbles
AQP_NIBBLES = AQP_RATE_BITS // 4
AQP_PREFIX = "0" * AQP_NIBBLES  # rows whose hash starts with this -> 1/2**bits rate
assert AQP_RATE_BITS % 4 == 0


def q_approx_counts_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing by deterministic uniform sampling:
    per-returnflag lineitem counts estimated from a 1/16 hash sample and
    scaled by the inverse rate, reported next to the sample size.

    The AQP pattern at 100 TB: the sample predicate is a pure function of
    the key (md5 nibble == '0'), so it fuses into the scan as a map-side
    filter — the aggregation touches 1/16th of the data, no RNG, no
    sample materialization, reproducible across engines/partitionings
    (which is what makes the estimate EXACTLY oracle-checkable, unlike
    TABLESAMPLE). Estimator: count_est = 16·n_sampled, unbiased for a
    hash independent of the group key. tests/test_sampling.py bounds the
    relative error vs the exact counts.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    key = F.concat_ws(
        "|", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    sampled = li.filter(
        F.substring(F.md5(key), 1, AQP_NIBBLES) == AQP_PREFIX
    )
    return (
        sampled.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .select(
            "l_returnflag",
            "n_sampled",
            (F.col("n_sampled") * (2**AQP_RATE_BITS)).alias("count_est"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_APPROX_COUNTS_SAMPLED = f"""
    SELECT l_returnflag,
           COUNT(*) AS n_sampled,
           COUNT(*) * {2**AQP_RATE_BITS} AS count_est
    FROM lineitem
    WHERE substring(md5(l_orderkey || '|' || l_linenumber), 1, {AQP_NIBBLES}) = '{AQP_PREFIX}'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


RESERVOIR_K = 20  # docs kept per source
RESERVOIR_SALTS = 16  # stage-1 shards per source


def q_sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir: the RESERVOIR_K docs with the
    smallest md5(doc_id) within each source — a fixed-size uniform sample
    per group that is reproducible across runs, engines, and partition
    layouts (the classic distributed substitute for stateful reservoir
    sampling: rank by key hash, keep the k smallest).

    Executed in two stages so no single task ever sees a whole group: a
    per-(source, salt) top-k window first cuts each source to at most
    SALTS·K rows, then the per-source window ranks that bounded set. At
    100 TB a hot source streams through its 16 salt shards in parallel
    and the final window input is 320 rows per source regardless of
    corpus size. The single-stage SQL oracle is value-identical because
    each group's true top-k survives stage 1 (every top-k row is also
    top-k within its salt shard).
    """
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir)["documents"]
    salted = docs.select(
        "doc_id",
        "source",
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("_h"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(RESERVOIR_SALTS)).alias("_salt"),
    )
    w1 = W.partitionBy("source", "_salt").orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    pruned = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= RESERVOIR_K)
    )
    w2 = W.partitionBy("source").orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= RESERVOIR_K)
        .select("source", "sample_rank", "doc_id", "lang")
        .orderBy("source", "sample_rank")
    )


ORACLE_SAMPLE_RESERVOIR_PER_GROUP = f"""
    SELECT source, sample_rank, doc_id, lang
    FROM (
        SELECT source, doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
               ) AS sample_rank
        FROM documents
    )
    WHERE sample_rank <= {RESERVOIR_K}
    ORDER BY source, sample_rank
"""


AES_K = 100  # weighted-reservoir size
AES_SALTS = 16


def q_sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis A-ES:
    each document draws key = −ln(u)/w (w = n_chars, u a deterministic
    md5-derived uniform — hex chars 17-24, disjoint from the split's 1-8
    and the Bernoulli sample's 9-16) and the AES_K smallest keys win.
    Inclusion probability is proportional to weight, jointly correct
    without replacement — the property the Bernoulli sampler
    (q_sample_weighted) doesn't give. Deterministic ⇒ exactly
    oracle-checkable, unlike RNG-based weighted reservoirs.

    Scale: same two-stage discipline as the per-group reservoir — keys
    are map-side expressions, a per-salt top-k bounds every shard to
    AES_K rows, and the global window ranks at most SALTS·K survivors.
    u = (h + 0.5)/2³² is an exact dyadic rational (never 0, identical
    IEEE value both engines); only ln's final ulp differs, orders of
    magnitude below inter-key gaps.
    """
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir)["documents"]
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 17, 8), 16, 10)
        .cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        (-F.log(u) / F.col("n_chars")).alias("_k"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(AES_SALTS)).alias("_salt"),
    )
    w1 = W.partitionBy("_salt").orderBy(F.col("_k").asc(), F.col("doc_id").asc())
    pruned = keyed.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= AES_K
    )
    w2 = W.orderBy(F.col("_k").asc(), F.col("doc_id").asc())
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= AES_K)
        .select(
            "sample_rank",
            "doc_id",
            "lang",
            "n_chars",
            F.round("_k", 8).alias("aes_key"),
        )
        .orderBy("sample_rank")
    )


ORACLE_SAMPLE_WEIGHTED_RESERVOIR = f"""
WITH keyed AS (
    SELECT doc_id, lang, n_chars,
           -ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 17, 8))::BIGINT + 0.5)
               / 4294967296.0) / n_chars AS k
    FROM documents
),
ranked AS (
    SELECT doc_id, lang, n_chars, k,
           ROW_NUMBER() OVER (ORDER BY k ASC, doc_id ASC) AS sample_rank
    FROM keyed
)
SELECT sample_rank, doc_id, lang, n_chars, ROUND(k, 8) AS aes_key
FROM ranked
WHERE sample_rank <= {AES_K}
ORDER BY sample_rank
"""


SYSTEMATIC_K = 17  # sampling interval (take every k-th, fixed start)


def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling: every K-th document in a deterministic
    pseudo-random order (md5 of the key — the ordering IS the
    randomization, so the sample is reproducible and auditable), fixed
    start — the survey-sampling workhorse that spreads the sample evenly
    across the ordered frame, completing the family next to Bernoulli
    (`sample_weighted`), stratified, and reservoir.

    Per-row math only after one rank: rn % K == 1 keeps ceil(N/K) rows
    exactly. The rank is the DISTRIBUTED range-partitioned row_number
    (``relational.distributed_row_number``): md5 is uniform, so the first
    two hex chars are an exact pre-computed range bucket (lowercase hex
    sorts lexicographically == numerically — bucket order IS sort order),
    rows are numbered within buckets in parallel, and only the
    n_parts-row offset table crosses partitions. No single-partition
    window anywhere — the plan survives the full corpus.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    from .relational import distributed_row_number

    hashed = docs.select(
        "doc_id", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    n_parts = 16
    # first hex byte (256 uniform values) folded onto n_parts contiguous
    # ranges; monotone in h because md5() emits lowercase hex
    pid = (
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
        * n_parts
        / 256
    ).cast("int")
    ranked = distributed_row_number(hashed, ["h", "doc_id"], pid, n_parts)
    return (
        ranked.filter((F.col("rn") % SYSTEMATIC_K) == 1)
        .select("doc_id", "rn", "n_chars")
        .orderBy("rn")
    )


ORACLE_SAMPLE_SYSTEMATIC = f"""
WITH ranked AS (
    SELECT doc_id, n_chars,
           ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
SELECT doc_id, rn, n_chars
FROM ranked
WHERE rn % {SYSTEMATIC_K} = 1
ORDER BY rn
"""


BOOT_B = 100  # bootstrap replicates
BOOT_CI_LO_RANK = 3  # 2.5th percentile of 100 replicate means (ceil)
BOOT_CI_HI_RANK = 98  # 97.5th percentile


def _poisson1_thresholds() -> list[int]:
    """Integer thresholds t_k = floor(CDF_Poisson(1)(k) · 2^32): a uniform
    32-bit hash h draws w = #{k : h ≥ t_k} ~ Poisson(1) (capped at 8,
    tail mass ~1e-6). Pure-integer comparison — no float boundary can
    diverge between engines."""
    import math

    term = math.exp(-1.0)
    acc = 0.0
    out = []
    for k in range(8):
        acc += term
        out.append(int(acc * 2**32))
        term /= k + 1
    return out


BOOT_THRESH = _poisson1_thresholds()


def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean document
    length via the DETERMINISTIC Poisson bootstrap — the resampling
    scheme that works on data too large to index: instead of drawing n
    rows with replacement (which needs global coordination), every row
    independently receives a Poisson(1) weight per replicate, and the B
    weighted means are the bootstrap distribution (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams"). Weights are a
    pure function of md5(doc_id:replicate) against precomputed INTEGER
    CDF thresholds, so both engines draw identical resamples — the
    seeded-reproducibility contract of `sample_weighted`.

    Shape: one explode by B=100 (map-side; partial aggregation collapses
    it to B rows per partition before the shuffle, so shuffle volume is
    partitions × B, independent of corpus size), one grouped aggregate
    to the B-row replicate frame, order statistics selected from that
    100-row frame (window bounded by the constant B), and the point
    mean from a 1-row aggregate. Replicate means are single IEEE
    divisions of exact integer sums; CI bounds are SELECTED replicate
    means, never recomputed floats.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    base = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x"),
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("b"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = sum(
        ((h >= F.lit(t)).cast("long") for t in BOOT_THRESH), F.lit(0)
    )
    reps = (
        base.select("b", "x", w.alias("w"))
        .groupBy("b")
        .agg(F.sum(F.col("w") * F.col("x")).alias("wx"), F.sum("w").alias("ws"))
        .select(
            "b", (F.col("wx").cast("double") / F.col("ws").cast("double")).alias("m")
        )
    )
    from pyspark.sql import Window as W

    ranked = reps.withColumn(
        "rn", F.row_number().over(W.orderBy("m", "b"))
    )  # 100-row frame: the single partition is bounded by the constant B
    ci = ranked.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.min(F.when(F.col("rn") == BOOT_CI_LO_RANK, F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == BOOT_CI_HI_RANK, F.col("m"))).alias("ci_hi"),
    )
    point = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("sx"),
    ).select(
        "n_docs",
        (F.col("sx").cast("double") / F.col("n_docs").cast("double")).alias(
            "point_mean"
        ),
    )
    return ci.crossJoin(F.broadcast(point)).select(
        "n_docs", "point_mean", "n_replicates", "ci_lo", "ci_hi"
    )


def _oracle_bootstrap_ci_mean() -> str:
    w_expr = " + ".join(
        f"(CASE WHEN h >= {t} THEN 1 ELSE 0 END)" for t in BOOT_THRESH
    )
    return f"""
WITH base AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS x, b
    FROM documents
    CROSS JOIN (SELECT UNNEST(generate_series(0, {BOOT_B - 1})) AS b)
), weighted AS (
    SELECT b, x,
           CAST({w_expr} AS BIGINT) AS w
    FROM (
        SELECT b, x,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
                     || CAST(b AS VARCHAR)), 1, 8))::BIGINT AS BIGINT) AS h
        FROM base
    )
), reps AS (
    SELECT b,
           CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS m
    FROM weighted GROUP BY b
), ranked AS (
    SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM reps
), ci AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
           MIN(CASE WHEN rn = {BOOT_CI_LO_RANK} THEN m END) AS ci_lo,
           MIN(CASE WHEN rn = {BOOT_CI_HI_RANK} THEN m END) AS ci_hi
    FROM ranked
), point AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS point_mean
    FROM documents
)
SELECT n_docs, point_mean, n_replicates, ci_lo, ci_hi
FROM ci, point
"""


GKF_FOLDS = 5


def q_group_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold assignment: every document of a SOURCE lands in
    the same fold (fold = md5(source) % k), so cross-validation never
    trains on one page of a site and validates on another — the group
    leakage that inflates CV scores whenever rows within a group are
    correlated (near-duplicate pages, same author, same session). The
    group-level analog of ``q_hash_split_train``'s row split, and the
    split discipline ``target_encode_kfold`` assumes.

    One grouped aggregate emits the per-fold summary (docs, distinct
    sources, token mass, share); the assignment itself is a pure
    map-side hash of the group key — no fitted state, reproducible on
    any engine. Group-exclusivity is structural (a deterministic
    function of source alone cannot straddle folds) and pytest-pinned.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    fold = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10).cast("long")
        % GKF_FOLDS
    ).cast("int")
    per_fold = (
        docs.select(
            fold.alias("fold"),
            "source",
            F.col("n_chars").cast("long").alias("nc"),
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.sum("nc").alias("n_chars_total"),
        )
    )
    tot = per_fold.agg(F.sum("n_docs").alias("n_total"))
    return (
        per_fold.crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "n_docs",
            "n_sources",
            "n_chars_total",
            (F.col("n_docs").cast("double") / F.col("n_total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy("fold")
    )


ORACLE_GROUP_KFOLD_SPLIT = f"""
WITH assigned AS (
    SELECT CAST(('0x' || substring(md5(source), 1, 8))::BIGINT
                % {GKF_FOLDS} AS INT) AS fold,
           source, CAST(n_chars AS BIGINT) AS nc
    FROM documents
), per_fold AS (
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(nc) AS BIGINT) AS n_chars_total
    FROM assigned GROUP BY fold
), tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM per_fold
)
SELECT fold, n_docs, n_sources, n_chars_total,
       CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
FROM per_fold, tot
ORDER BY fold
"""




KCENTER_K = 8  # coreset size; rounds = K-1 (Gonzalez greedy)


def q_sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez): pick KCENTER_K maximally
    spread embedding vectors — the diversity-sampling primitive of
    data curation (select the most diverse exemplars / dedup a batch
    down to representatives), the 2-approximation of the k-center
    objective.

    Seed = min vec_id; the per-vector nearest-center state
    (d6, rank, id) evolves INCREMENTALLY — each round broadcasts only
    the NEWEST center and folds one distance into the running
    struct-min (least over structs is the lexicographic min, so
    evolving the min one candidate at a time is exactly the batch
    struct-min over all candidates), then takes the argmax as the next
    center via a distributed TakeOrdered (never a global sort). Total
    work O(N·K·dim) map-side — the incremental Gonzalez, not the
    O(N·K²) all-centers recompute — with no per-round groupBy shuffle
    at all; the only driver traffic is one 1-row collect per round. At
    100 TB: K map passes over a checkpointed node-domain state frame,
    zero shuffles, K-1 scalar collects.

    Determinism: distances are the module-shared IEEE fold (index
    order, float32→double exact — bit-identical to DuckDB's
    list_distance) rounded to 6 dp before every argmax/argmin, with
    ties broken on vec_id / center rank. Output: every vector's
    assignment (nearest center, rank, distance) plus the coreset
    radius (max over vectors of nearest-center distance — the
    k-center objective value) as a broadcast scalar column.

    The oracle unrolls the same K-1 greedy steps as chained CTEs
    (argmax inside recursion is not expressible; the unroll is the
    portable formulation, same as graph_pagerank's power iteration).
    """
    from ..cache import track_persist

    # vectors are re-read every round — persist for the loop, tracked
    e = track_persist(
        load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    )

    # r11 NOTE (examined, kept incremental): two shuffle-free rewrites
    # were measured and REJECTED on same-box A/B — (a) folding all
    # chosen centers as literal expression arrays (k·d literal nodes
    # made driver-side analysis/codegen the cost: 3.5 s → 6.3 s) and
    # (b) a 1-row broadcast array<struct> of centers with
    # array_min(transform(...)) (re-evaluating ALL r candidates per
    # round through interpreted higher-order functions beat the saved
    # shuffles: O(N·K²·d) interpreted lambda work vs the incremental
    # form's O(N·K·d)). The incremental checkpointed struct-min below
    # does one candidate of HOF work per round and stays the fastest
    # measured form locally while keeping node-domain-only state.
    from ..session import state_width
    from .similarity import _l2_expr

    seed = int(e.agg(F.min("vec_id")).collect()[0][0])

    def fold_center(state: DataFrame | None, crank: int, cid: int) -> DataFrame:
        """Fold ONE new center into the running (d6, crank, cid)
        struct-min. The checkpointed state is (vec_id, best) ONLY —
        node-domain scalars, the documented iteration exception — while
        the vectors stay in the loop-persisted ``e`` and are re-read
        per round (at cluster scale, co-partition e and the state by
        vec_id once and the per-round join never reshuffles)."""
        cvec = F.broadcast(
            e.filter(F.col("vec_id") == cid).select(
                F.col("embedding").alias("cvec")
            )
        )
        cand_struct = F.struct(
            F.round(_l2_expr("embedding", "cvec"), 6).alias("d6"),
            F.lit(crank).cast("int").alias("crank"),
            F.lit(cid).cast("long").alias("cid"),
        )
        cand = e.crossJoin(cvec).select("vec_id", cand_struct.alias("cand"))
        if state is None:
            new = cand.select("vec_id", F.col("cand").alias("best"))
        else:
            new = state.join(cand, "vec_id").select(
                "vec_id", F.least("best", "cand").alias("best")
            )
        return new.coalesce(state_width(e)).localCheckpoint()

    state = fold_center(None, 1, seed)
    for r in range(2, KCENTER_K + 1):
        nxt = (
            state.orderBy(F.col("best.d6").desc(), F.col("vec_id").asc())
            .select("vec_id")
            .limit(1)
            .collect()[0]
        )
        state = fold_center(state, r, int(nxt["vec_id"]))

    final = state
    radius = final.agg(F.max("best.d6").alias("coreset_radius"))
    return (
        final.crossJoin(F.broadcast(radius))
        .select(
            "vec_id",
            F.col("best.cid").alias("center_id"),
            F.col("best.crank").alias("center_rank"),
            F.col("best.d6").alias("dist"),
            "coreset_radius",
        )
        .orderBy("vec_id")
    )


def _oracle_kcenter() -> str:
    l2 = (
        "ROUND(list_distance(CAST(e.embedding AS DOUBLE[]), "
        "CAST(c.embedding AS DOUBLE[])), 6)"
    )
    # MATERIALIZED (r12): each cc{p} is referenced by BOTH m{p} and
    # cc{r}; DuckDB inlines plain CTEs, so the unhinted unroll re-plans
    # the whole greedy prefix per step (measured 4.6 s -> sub-second at
    # sf0.001, identical rows). Semantics-free: each step computes once,
    # exactly like the Spark fold.
    steps = [
        "cc1 AS MATERIALIZED "
        "(SELECT 1 AS crank, MIN(vec_id) AS cid FROM embeddings)"
    ]
    for r in range(2, KCENTER_K + 1):
        p = r - 1
        steps.append(
            f"""m{p} AS MATERIALIZED (
    SELECT e.vec_id, MIN({l2}) AS dmin
    FROM embeddings e
    JOIN cc{p} x ON TRUE
    JOIN embeddings c ON c.vec_id = x.cid
    GROUP BY e.vec_id
),
n{p} AS MATERIALIZED (SELECT vec_id FROM m{p} ORDER BY dmin DESC, vec_id ASC LIMIT 1),
cc{r} AS MATERIALIZED (SELECT crank, cid FROM cc{p}
          UNION ALL SELECT {r}, vec_id FROM n{p})"""
        )
    k = KCENTER_K
    return f"""
WITH {','.join(steps)},
assign AS (
    SELECT e.vec_id, x.cid, x.crank, {l2} AS d6,
           ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {l2} ASC, x.crank ASC
           ) AS rn
    FROM embeddings e
    JOIN cc{k} x ON TRUE
    JOIN embeddings c ON c.vec_id = x.cid
),
final AS (SELECT vec_id, cid, crank, d6 FROM assign WHERE rn = 1),
rad AS (SELECT MAX(d6) AS coreset_radius FROM final)
SELECT f.vec_id, f.cid AS center_id, f.crank AS center_rank,
       f.d6 AS dist, r.coreset_radius
FROM final f CROSS JOIN rad r
ORDER BY f.vec_id
"""


def oracles() -> dict[str, tuple]:
    return {
        "bootstrap_ci_mean": (q_bootstrap_ci_mean, _oracle_bootstrap_ci_mean()),
        "group_kfold_split": (q_group_kfold_split, ORACLE_GROUP_KFOLD_SPLIT),
        "hash_split_train": (q_hash_split_train, ORACLE_HASH_SPLIT_TRAIN),
        "sample_systematic": (q_sample_systematic, ORACLE_SAMPLE_SYSTEMATIC),
        "sample_reservoir_per_group": (
            q_sample_reservoir_per_group,
            ORACLE_SAMPLE_RESERVOIR_PER_GROUP,
        ),
        "sample_weighted_reservoir": (
            q_sample_weighted_reservoir,
            ORACLE_SAMPLE_WEIGHTED_RESERVOIR,
        ),
        "sample_stratified": (q_sample_stratified, ORACLE_SAMPLE_STRATIFIED),
        "sample_weighted": (q_sample_weighted, ORACLE_SAMPLE_WEIGHTED),
        "approx_counts_sampled": (
            q_approx_counts_sampled,
            ORACLE_APPROX_COUNTS_SAMPLED,
        ),
        "sample_kcenter_coreset": (
            q_sample_kcenter_coreset,
            _oracle_kcenter(),
        ),
    }
