"""Multimodal plumbing tests: binary payload schema, Arrow batch decode
path (mapInPandas), determinism, and the decode stub's explicit failure."""

from __future__ import annotations

import pytest

from dbms_query_optimizer_spark.operators.multimodal import (
    FEATURE_BINS,
    decode_image,
    multimodal_table,
    q_multimodal_features,
)


def test_schema_and_payload(spark, sf_dir):
    df = multimodal_table(spark, sf_dir)
    types = dict(df.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<format:string,n_bytes:int")
    row = df.filter("doc_id = 0").collect()[0]
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_features_deterministic_and_complete(spark, sf_dir):
    df = q_multimodal_features(spark, sf_dir)
    rows1 = {r["doc_id"]: tuple(r) for r in df.collect()}
    rows2 = {r["doc_id"]: tuple(r) for r in q_multimodal_features(spark, sf_dir).collect()}
    assert rows1 == rows2  # deterministic across runs
    n_docs = multimodal_table(spark, sf_dir).count()
    assert len(rows1) == n_docs
    # histogram bins sum to payload byte count
    sample = next(iter(rows1.values()))
    assert sum(sample[2 : 2 + FEATURE_BINS]) == sample[1]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
