"""DESCRIBE-only type gate over every catalog oracle: no pandas-lossy
output column (HUGEINT/INT128, or DECIMAL with precision > 15).

DuckDB widens SUM over INTEGER/BIGINT to HUGEINT. The grading driver
canonicalizes oracle results through pandas (``.df()``), where HUGEINT —
and any DECIMAL wider than float64's ~15.95 exact decimal digits —
renders as float64 and the value hash flips against Spark's exact output.
HUGEINT is the class that failed ``tpch_q12`` in round 4 while the local
``fetchall()``-based gate stayed green; DECIMAL(38,0) was the
``table_checksum`` output until round 5. This sweep is plan-only (no
query execution, no Spark), so it runs in milliseconds and catches the
defect at authoring time.

Oracles that read table state a Spark query must materialize first (the
txn/manifest family writes under a temp dir) can't be planned standalone;
those are skipped here and covered by the in-test DESCRIBE check inside
``oracle_utils.compare``, which runs after the Spark side has written.
"""

from __future__ import annotations

import pytest

from dbms_query_optimizer_spark.operators import catalog

from .oracle_utils import duckdb_conn, hugeint_columns

ORACLED = sorted(n for n, (_, sql) in catalog.CATALOG.items() if sql)


@pytest.fixture(scope="module")
def conn(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_has_no_hugeint_columns(name, conn):
    sql = catalog.CATALOG[name][1]
    try:
        huge = hugeint_columns(conn, sql)
    except Exception as exc:  # state-dependent oracle (txn family) — covered
        pytest.skip(f"oracle not plannable standalone: {str(exc)[:120]}")
    assert not huge, (
        f"{name}: oracle emits pandas-lossy columns {huge} — the driver's "
        "canonicalization renders these float64 and the hash flips; "
        "CAST to BIGINT (or publish a modular/narrower value) in the oracle"
    )
