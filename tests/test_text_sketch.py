"""approx_top_k heavy hitters vs exact counts: at test scale the corpus
vocabulary fits the sketch's tracked-item budget, so every reported count
must be EXACT and the reported set must be a valid top-k under ties."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.operators.text import (
    APPROX_TOPK_TERMS_K,
    _approx_topk_sketch,
    q_approx_topk_terms,
)


def test_approx_topk_audit_contract(spark, sf_dir):
    row = q_approx_topk_terms(spark, sf_dir).collect()[0]
    assert row.k == APPROX_TOPK_TERMS_K
    assert row.counts_exact_ok and row.topset_sound


def test_approx_topk_terms_exact_at_test_scale(spark, sf_dir):
    got = {r["token"]: r["est_count"] for r in _approx_topk_sketch(spark, sf_dir).collect()}
    assert len(got) == APPROX_TOPK_TERMS_K

    docs = load_tables(spark, sf_dir)["documents"]
    exact = {
        r["token"]: r["n"]
        for r in (
            docs.select(F.explode(F.split("text", " ")).alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    # every reported count is the true count
    for tok, cnt in got.items():
        assert exact[tok] == cnt, (tok, cnt, exact[tok])
    # the reported multiset of counts is the true top-k multiset (the
    # sketch may pick either token at a tie boundary; counts cannot differ)
    true_topk = sorted(exact.values(), reverse=True)[:APPROX_TOPK_TERMS_K]
    assert sorted(got.values(), reverse=True) == true_topk
