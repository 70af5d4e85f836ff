"""Independent semantics checks for the round-8 batch-2 operators
(mann_whitney_u, max_drawdown, join_null_aware_anti). The DuckDB gate
proves engine parity; these prove the math/logic from scratch."""

import math

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_mann_whitney_matches_numpy(spark):
    from dbms_query_optimizer_spark.operators.governance import (
        q_mann_whitney_u,
    )

    got = q_mann_whitney_u(spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev[ev["event_type"].isin(["click", "view"])]
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    is1 = (ev["event_type"] == "click").to_numpy()
    n1, n2 = int(is1.sum()), int((~is1).sum())
    # tie-averaged ranks from scratch (scipy-free)
    order = np.argsort(cents, kind="stable")
    sorted_c = cents[order]
    ranks = np.empty(len(cents), dtype=np.float64)
    i = 0
    while i < len(sorted_c):
        j = i
        while j < len(sorted_c) and sorted_c[j] == sorted_c[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # average of ranks i+1..j
        i = j
    r1 = ranks[is1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert int(got["n1"]) == n1 and int(got["n2"]) == n2
    assert int(got["u1_x2"]) == int(round(2 * u1))
    _, t_counts = np.unique(cents, return_counts=True)
    tie = int((t_counts.astype(object) ** 3 - t_counts).sum())
    assert int(got["tie_term"]) == tie
    n = n1 + n2
    sigma2 = n1 * n2 * ((n + 1) * n * (n - 1) - tie) / (12.0 * n * (n - 1))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(sigma2)
    assert abs(float(got["z"]) - z) < 1e-3


def test_max_drawdown_invariants(spark):
    from dbms_query_optimizer_spark.operators.temporal import q_max_drawdown

    dd = q_max_drawdown(spark, SF_DIR).toPandas()
    assert (dd["max_drawdown_cents"] >= 0).all()
    assert (dd["peak_cents"] >= dd["final_cents"]).all()
    # NON-DEGENERACY: the level series fluctuates on every fixture, so a
    # formulation whose drawdown is identically zero (the cumulative-sum
    # bug class this query was rewritten away from) fails here.
    assert (dd["max_drawdown_cents"] > 0).any()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    for et, grp in ev.groupby("event_type"):
        level = grp.groupby("day")["cents"].sum().sort_index()
        peak = level.cummax()
        want = int((peak - level).max())
        row = dd[dd["event_type"] == et].iloc[0]
        assert int(row["max_drawdown_cents"]) == want, et
        assert int(row["max_drawdown_cents"]) > 0, et
        assert int(row["final_cents"]) == int(level.iloc[-1]), et
        assert int(row["peak_cents"]) == int(peak.max()), et


def test_null_aware_anti_three_valued_logic(spark):
    """Runs at sf0.01, NOT the usual sf0.001: the smallest fixture has no
    negative-balance suppliers at all, so the NULL-bearing branch this
    operator exists to pin would never execute (review finding, r8)."""
    from dbms_query_optimizer_spark.operators.relational import (
        q_join_null_aware_anti,
    )

    sf = "/root/testdata/sf0.01"
    out = (
        q_join_null_aware_anti(spark, sf)
        .toPandas()
        .set_index("variant")["n_rows"]
    )
    # the three null-safe formulations always agree
    assert out["anti_join_left"] == out["not_exists"] == out["not_in_guarded"]
    # the fixture must actually exercise the NULL branch at this SF...
    sup = pd.read_parquet(f"{sf}/supplier.parquet")
    neg = sup[sup["s_acctbal"] < 0]
    assert (neg["s_acctbal"] > -100).any(), "fixture lost its NULL trigger"
    # ...and under a NULL-bearing set, NOT IN returns zero rows while the
    # null-safe variants keep a non-vacuous positive count
    assert out["not_in"] == 0
    assert 0 < out["not_exists"] < len(pd.read_parquet(f"{sf}/customer.parquet"))
