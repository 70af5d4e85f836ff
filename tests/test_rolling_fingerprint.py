"""Rolling-hash fingerprint: the Column-expression and Arrow/numpy forms
must compute identical integers (and match a hand-computed Horner value)."""

from __future__ import annotations

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.functions.text import ROLL_BASE, ROLL_K, ROLL_PRIME
from dbms_query_optimizer_spark.operators.text import (
    rolling_fingerprint_arrow,
    rolling_fingerprint_expr,
)


def test_expr_and_arrow_forms_identical(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    a = sorted(map(tuple, rolling_fingerprint_expr(docs).collect()))
    b = sorted(map(tuple, rolling_fingerprint_arrow(docs).collect()))
    assert a == b


def test_known_value(spark):
    text = "abcdefgh"  # exactly one window
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = rolling_fingerprint_arrow(df).collect()[0]

    expected = 0
    for ch in text:
        expected = (expected * ROLL_BASE + ord(ch)) % ROLL_PRIME
    assert row.n_windows == 1
    assert row.fp_min == expected
    assert row.n_distinct == 1


def test_short_text_has_no_windows(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    row = rolling_fingerprint_arrow(df).collect()[0]
    assert row.n_windows == 0 and row.fp_min is None and row.n_distinct == 0
    assert ROLL_K > len("tiny")
