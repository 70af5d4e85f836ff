"""Independent numpy oracle for ``t_closeness_audit``.

The DuckDB gate (tests/test_queries_oracle.py) proves engine parity; this
test proves the MATH — the per-class EMD equals the Mallows/W1 distance
computed from scratch in numpy on the raw parquet, so a shared
misreading of the formula in both SQL dialects can't slip through.
"""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def audit(spark):
    from dbms_query_optimizer_spark.operators.governance import (
        q_t_closeness_audit,
    )

    return q_t_closeness_audit(spark, SF_DIR).toPandas()


def _numpy_emd(sf_dir: str) -> pd.DataFrame:
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_nationkey", "c_mktsegment"]
    ]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[
        ["o_custkey", "o_orderpriority"]
    ]
    j = cust.merge(orders, left_on="c_custkey", right_on="o_custkey")
    prios = np.sort(j["o_orderpriority"].unique())
    m = len(prios)
    g = j["o_orderpriority"].value_counts().reindex(prios, fill_value=0).to_numpy()
    q = g / g.sum()
    rows = []
    for (nat, seg), grp in j.groupby(["c_nationkey", "c_mktsegment"]):
        n = (
            grp["o_orderpriority"]
            .value_counts()
            .reindex(prios, fill_value=0)
            .to_numpy()
        )
        p = n / n.sum()
        emd = np.abs(np.cumsum(p - q)).sum() / (m - 1)
        rows.append((nat, seg, int(n.sum()), emd))
    return pd.DataFrame(
        rows, columns=["c_nationkey", "c_mktsegment", "n_orders", "emd"]
    ).sort_values(["c_nationkey", "c_mktsegment"], ignore_index=True)


def test_emd_matches_numpy(audit):
    ref = _numpy_emd(SF_DIR)
    got = audit.sort_values(
        ["c_nationkey", "c_mktsegment"], ignore_index=True
    )
    assert len(got) == len(ref)
    assert (got["n_orders"].to_numpy() == ref["n_orders"].to_numpy()).all()
    # Spark computes the numerators exactly then rounds 6 dp; numpy
    # accumulates float — agree to 1e-6 + float slack.
    assert np.allclose(got["emd"].to_numpy(), ref["emd"].to_numpy(), atol=2e-6)


def test_flag_consistent_with_value(audit):
    from dbms_query_optimizer_spark.operators.governance import T_CLOSENESS

    assert (audit["t_ok"] == (audit["emd"] <= T_CLOSENESS)).all()


def test_emd_bounds(audit):
    # W1 over distributions supported on m ordered points, normalized by
    # (m-1), lies in [0, 1]; zero only if the class matches global exactly.
    assert (audit["emd"] >= 0).all()
    assert (audit["emd"] <= 1).all()
