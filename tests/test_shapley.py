"""Independent checks for ``shapley_attribution``.

The DuckDB gate proves engine parity; these prove the MATH: the
efficiency axiom (Σφ = v(full) − v(∅)) holds exactly on the integer
numerators, and a from-scratch numpy Shapley over the same coalition
worth function reproduces the values.
"""

import math

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    from dbms_query_optimizer_spark.operators.temporal import (
        q_shapley_attribution,
    )

    return q_shapley_attribution(spark, SF_DIR).toPandas()


def _coalition_v_ppm(sf_dir: str) -> dict[int, int]:
    from dbms_query_optimizer_spark.operators.temporal import (
        SHAPLEY_CHANNELS,
        SHAPLEY_CONV,
    )

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "event_type"]]
    users: dict[int, int] = {}
    convs: dict[int, int] = {}
    for _, grp in ev.groupby("user_id"):
        types = set(grp["event_type"])
        mask = sum(
            1 << i for i, c in enumerate(SHAPLEY_CHANNELS) if c in types
        )
        users[mask] = users.get(mask, 0) + 1
        convs[mask] = convs.get(mask, 0) + (1 if SHAPLEY_CONV in types else 0)
    return {m: (convs[m] * 1_000_000) // users[m] for m in users}


def test_numpy_shapley_matches(result):
    from dbms_query_optimizer_spark.operators.temporal import SHAPLEY_CHANNELS

    n = len(SHAPLEY_CHANNELS)
    v = _coalition_v_ppm(SF_DIR)
    got = result.set_index("channel")
    for i, c in enumerate(SHAPLEY_CHANNELS):
        phi = 0
        for smask in range(2**n):
            if smask & (1 << i):
                continue
            s = bin(smask).count("1")
            w = math.factorial(s) * math.factorial(n - 1 - s)
            phi += w * (v.get(smask | (1 << i), 0) - v.get(smask, 0))
        assert int(got.loc[c, "phi_num"]) == phi, c
        expect = round(phi / (math.factorial(n) * 1_000_000), 6)
        assert abs(float(got.loc[c, "shapley"]) - expect) < 1e-9, c


def test_efficiency_axiom(result):
    """Σφᵢ = v(grand coalition) − v(∅), exact on the integer numerators."""
    from dbms_query_optimizer_spark.operators.temporal import SHAPLEY_CHANNELS

    n = len(SHAPLEY_CHANNELS)
    v = _coalition_v_ppm(SF_DIR)
    full = 2**n - 1
    lhs = int(result["phi_num"].sum())
    rhs = math.factorial(n) * (v.get(full, 0) - v.get(0, 0))
    assert lhs == rhs


def test_touch_counts_positive(result):
    # every channel appears in the fixture, so n_users grounds each row
    assert (result["n_users"] > 0).all()
    assert len(result) == 4
