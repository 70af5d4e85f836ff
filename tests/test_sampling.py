"""Statistical/determinism properties of the sampling operators.

The hash split is oracle-checked exactly (test_queries_oracle); these tests
cover what an oracle can't: split disjointness/stability and the RNG
sampler's statistical behavior.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.operators.sampling import (
    SAMPLE_SEED,
    STRATA_FRACTIONS,
    TRAIN_BUCKETS,
    _split_bucket,
    q_hash_split_train,
    q_sample_stratified,
)


def test_hash_split_partitions_whole_corpus(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    n_docs = docs.count()
    buckets = docs.select(_split_bucket(F.col("doc_id")).alias("b"))
    assert buckets.count() == n_docs
    counts = {r["b"]: r["n"] for r in buckets.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(range(10))
    # roughly uniform: every bucket within 3x of the ideal share
    ideal = n_docs / 10
    assert all(n < 3 * ideal for n in counts.values())

    train = q_hash_split_train(spark, sf_dir)
    assert train.count() == sum(counts.get(b, 0) for b in range(TRAIN_BUCKETS))
    # stability: same rows on re-evaluation (pure function of the key)
    assert train.exceptAll(q_hash_split_train(spark, sf_dir)).count() == 0


def test_stratified_sample_respects_fractions(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    pop = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n_sampled"] for r in q_sample_stratified(spark, sf_dir).collect()}
    for lang, n in got.items():
        frac = STRATA_FRACTIONS[lang]
        expected = pop[lang] * frac
        # Bernoulli sampling: allow 4 sigma around the expected count
        sigma = (pop[lang] * frac * (1 - frac)) ** 0.5
        assert abs(n - expected) <= 4 * sigma + 1, (lang, n, expected)


def test_stratified_sample_deterministic_for_seed(spark, sf_dir):
    """Membership is a pure function of the row key (md5 draw), so the
    per-stratum counts must be bit-identical across evaluations AND
    survive an arbitrary repartitioning — the property RNG sampleBy
    cannot give."""
    docs = load_tables(spark, sf_dir)["documents"]
    a = {r["lang"]: r["n_sampled"] for r in q_sample_stratified(spark, sf_dir).collect()}
    b = {r["lang"]: r["n_sampled"] for r in q_sample_stratified(spark, sf_dir).collect()}
    assert a == b and a


def test_approx_counts_sampled_error_bound(spark, sf_dir):
    """The 1/16-hash-sample estimator must land within Bernoulli error of
    the exact per-group counts: |est - exact| <= 4*sqrt(exact*15) (≈4σ of
    Binomial(n, 1/16) scaled by 16), and the total sampled fraction must
    sit near 1/16."""
    import math

    from dbms_query_optimizer_spark.operators.sampling import (
        q_approx_counts_sampled,
    )

    li = load_tables(spark, sf_dir)["lineitem"]
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    est = {
        r["l_returnflag"]: (r["count_est"], r["n_sampled"])
        for r in q_approx_counts_sampled(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    total_exact = sum(exact.values())
    total_sampled = sum(n for _, n in est.values())
    assert total_sampled == pytest.approx(total_exact / 16, rel=0.25)
    for flag, n_exact in exact.items():
        count_est, _ = est[flag]
        bound = 4 * math.sqrt(n_exact * 15)
        assert abs(count_est - n_exact) <= bound, (
            f"{flag}: est={count_est} exact={n_exact} bound={bound:.0f}"
        )
