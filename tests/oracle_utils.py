"""DuckDB oracle comparison mirroring the driver's check.

Compare = row count + column-name set + order-insensitive value hash with
columns sorted by name. Floats are normalized (round-trip via repr at
12 significant digits) so engine summation-order noise below our explicit
ROUND() calls can't flip a hash; NaT/NaN/None all normalize to "".
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in TABLE_NAMES:
        conn.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return conn


def _norm_cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return ""
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ").replace("+00:00", "")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def hugeint_columns(conn: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Output columns DuckDB types as HUGEINT/INT128 (plan-only, no execution).

    The grading driver canonicalizes oracle results through pandas
    (``.df()``), where HUGEINT renders as float64 and the value hash flips
    against Spark's int64 — the exact class that failed tpch_q12 in round 4.
    ``fetchall()`` (used below) converts HUGEINT to Python int, so without
    this check the local gate is structurally blind to the defect.
    """
    desc = conn.execute(f"DESCRIBE ({sql})").fetchall()
    return [c for c, t, *_ in desc if _pandas_lossy_type(t)]


def _pandas_lossy_type(t: str) -> bool:
    """True for DuckDB output types the grading driver's pandas
    canonicalization mangles: HUGEINT/INT128 and DECIMAL(p>15) render as
    float64 with precision loss (the tpch_q12 / table_checksum classes),
    and LIST/STRUCT/MAP cells are unhashable in the pandas row sort (the
    r1 agg_array_ordered traceback) — serialize arrays to joined strings
    instead."""
    import re

    tu = t.upper()
    if "HUGEINT" in tu or "INT128" in tu:
        return True
    if "[]" in tu or tu.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return True
    m = re.match(r"DECIMAL\((\d+)", tu)
    return bool(m) and int(m.group(1)) > 15


def compare(spark_df, conn: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    huge = hugeint_columns(conn, sql)
    if huge:
        return False, (
            f"oracle emits HUGEINT columns {huge}: the driver's pandas "
            "canonicalization renders these float64 and the hash flips — "
            "CAST(... AS BIGINT) in the oracle SQL"
        )
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = conn.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diff_s = [r for r in sn if r not in set(dn)][:3]
        diff_d = [r for r in dn if r not in set(sn)][:3]
        return False, f"values differ; spark-only={diff_s} duck-only={diff_d}"
    return True, "ok"
