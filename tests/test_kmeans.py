"""Structural invariants for ``embedding_kmeans_lloyd`` (the DuckDB gate
proves engine parity; these pin the algorithm's shape)."""

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def km(spark):
    from dbms_query_optimizer_spark.operators.similarity import (
        q_embedding_kmeans_lloyd,
    )

    return q_embedding_kmeans_lloyd(spark, SF_DIR).toPandas()


def test_partition_of_corpus(km):
    from dbms_query_optimizer_spark.operators.similarity import (
        EMB_DIM,
        KMEANS_K,
    )

    n_vecs = len(pd.read_parquet(f"{SF_DIR}/embeddings.parquet"))
    per_cluster = km.drop_duplicates("cluster_id")
    assert 1 <= len(per_cluster) <= KMEANS_K
    # every vector is assigned to exactly one surviving cluster
    assert per_cluster["n_members"].sum() == n_vecs
    # each surviving cluster emits one row per dimension
    assert (km.groupby("cluster_id").size() == EMB_DIM).all()


def test_inertia_nonnegative_and_grounded(km):
    per_cluster = km.drop_duplicates("cluster_id")
    assert (per_cluster["inertia"] >= 0).all()
    assert (per_cluster["n_members"] >= 1).all()


def test_centroid_in_quantized_range(km):
    # centroid components are micro-units of the milli-quantized input:
    # |c| is bounded by KMEANS_Q * max|qv| — sanity against scale bugs
    assert km["centroid_micro"].abs().max() < 10_000_000
