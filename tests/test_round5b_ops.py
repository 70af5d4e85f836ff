"""Semantics tests for the round-5 continuation operators, independent of
the DuckDB oracles (which tests/test_queries_oracle.py already runs): each
test pins an invariant or re-derives the answer with a pure-Python
reference, so a bug that happened to be mirrored in the oracle SQL would
still be caught here.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbms_query_optimizer_spark.operators import catalog

QS = catalog.queries()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ("orders", "customer", "events", "lineitem", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------- FIFO


def test_fifo_matched_units_identity(spark, sf_dir):
    """Interval-intersection FIFO must match exactly least(supply, demand)
    units per part — the conservation law of lot matching."""
    rows = QS["fifo_allocation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.matched_units == min(r.supply_units, r.demand_units), r
        assert r.unmatched_demand == max(r.demand_units - r.supply_units, 0)
        if r.matched_units > 0:
            assert r.n_pairs >= 1


# ----------------------------------------------------------- Theil-Sen


def test_theil_sen_matches_python_reference(spark, sf_dir):
    con = _duck(sf_dir)
    daily = con.execute(
        """
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               COUNT(*) AS y
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[tuple[int, int]]] = {}
    for et, x, y in daily:
        series.setdefault(et, []).append((x, y))
    expect = {}
    for et, pts in series.items():
        pts.sort()
        slopes = sorted(
            (pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0])
            for i in range(len(pts))
            for j in range(i + 1, len(pts))
        )
        expect[et] = (
            len(pts),
            len(slopes),
            slopes[(len(slopes) + 1) // 2 - 1],  # lower median, 1-based
        )
    got = {
        r.event_type: (r.n_days, r.n_pairs, r.slope_med)
        for r in QS["theil_sen_trend"](spark, sf_dir).collect()
    }
    assert got == expect


# ---------------------------------------------------------------- bloom


def test_bloom_audit_matches_python_reference(spark, sf_dir):
    from dbms_query_optimizer_spark.operators.governance import (
        BLOOM_HASHES,
        BLOOM_M,
        BLOOM_P,
    )

    con = _duck(sf_dir)
    members = {
        k
        for (k,) in con.execute(
            "SELECT DISTINCT o_custkey FROM orders"
            " WHERE o_orderpriority = '1-URGENT'"
        ).fetchall()
    }
    probes = [k for (k,) in con.execute("SELECT c_custkey FROM customer").fetchall()]

    def bits(key):
        return {((a * key + b) % BLOOM_P) % BLOOM_M for a, b in BLOOM_HASHES}

    bitset = set()
    for k in members:
        bitset |= bits(k)
    hits = [k for k in probes if bits(k) <= bitset]
    fp = [k for k in hits if k not in members]

    row = QS["bloom_membership_audit"](spark, sf_dir).collect()[0]
    assert row.n_probes == len(probes)
    assert row.n_members == len(members)
    assert row.bits_set == len(bitset)
    assert row.n_hits == len(hits)
    assert row.n_false_pos == len(fp)


# --------------------------------------------- prefix-filter losslessness


@settings(max_examples=200, deadline=None)
@given(
    a=st.sets(st.integers(0, 40), min_size=1, max_size=25),
    b=st.sets(st.integers(0, 40), min_size=1, max_size=25),
    tau_den=st.sampled_from([2, 3, 4]),
    tau_num_off=st.integers(0, 2),
)
def test_prefix_filter_lemma(a, b, tau_den, tau_num_off):
    """The lemma q_dedup_set_similarity_prefix rests on: under ANY fixed
    global total order, two sets with Jaccard >= tau share an element
    within their first L = n - ceil(tau*n) + 1 elements. Checked for
    arbitrary random sets and several tau, so the production constant
    is not a special case."""
    tau_num = min(tau_num_off + 1, tau_den)  # 1/den .. up to 1
    inter = len(a & b)
    union = len(a | b)
    if inter * tau_den < union * tau_num:  # below threshold: lemma silent
        return

    def prefix(s):
        n = len(s)
        ceil_tn = -(-tau_num * n // tau_den)
        L = n - ceil_tn + 1
        return set(sorted(s)[:L])  # "global order" = integer order

    assert prefix(a) & prefix(b), (sorted(a), sorted(b), tau_num, tau_den)


# ------------------------------------------------------------ KM curve


def test_survival_km_curve_shape(spark, sf_dir):
    rows = QS["survival_km"](spark, sf_dir).collect()
    assert rows
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for seg, curve in by_seg.items():
        last_s, last_risk = 1.0 + 1e-9, None
        for r in curve:  # ordered by dur_days
            assert 0.0 <= r.survival <= last_s + 1e-9, (seg, r)
            assert 0 < r.n_event <= r.n_risk
            if last_risk is not None:
                assert r.n_risk <= last_risk
            last_s, last_risk = r.survival, r.n_risk


# --------------------------------------------------- seasonal decompose


def test_seasonal_decompose_reconstruction(spark, sf_dir):
    """trend + seasonal + residual must reconstruct the observed value
    (in cents/7 units) wherever the full window exists."""
    rows = QS["seasonal_decompose"](spark, sf_dir).collect()
    assert rows
    seen_full = 0
    for r in rows:
        if r.trend is not None:
            seen_full += 1
            assert abs((r.trend + r.seasonal + r.residual) - r.cents) < 1e-6, r
    assert seen_full > 0


# ------------------------------------------------------- gains table


def test_model_gains_table_totals(spark, sf_dir):
    rows = QS["model_gains_table"](spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    # decile sizes differ by at most one (exact NTILE law)
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # cumulative positives are consistent and capture ends at 1.0
    cum = 0
    for r in rows:
        cum += r.n_pos
        assert r.cum_pos == cum
    assert abs(rows[-1].capture - 1.0) < 1e-12


# ------------------------------------------------------- sketch audits


def test_hll_audit_matches_python_reference(spark, sf_dir):
    import hashlib

    from dbms_query_optimizer_spark.operators.governance import (
        HLL_M,
        HLL_RHO_CAP,
    )

    con = _duck(sf_dir)
    keys = [k for (k,) in con.execute("SELECT DISTINCT o_custkey FROM orders").fetchall()]
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        bucket, rest = h % HLL_M, h // HLL_M
        rho = min(HLL_RHO_CAP, 54 - rest.bit_length() + 1) if rest > 0 else HLL_RHO_CAP
        regs[bucket] = max(regs.get(bucket, 0), rho)
    harmonic = sum(2 ** (HLL_RHO_CAP - m) for m in regs.values())
    row = QS["hll_estimate_audit"](spark, sf_dir).collect()[0]
    assert row.n_regs == len(regs)
    assert row.harmonic_scaled == harmonic
    assert row.n_exact == len(keys)
    # raw HLL with m=64 should land within ~3 standard errors (1.04/8)
    assert 0.6 < row.err_ratio < 1.5


def test_cms_audit_never_underestimates(spark, sf_dir):
    rows = QS["count_min_sketch_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.exact  # the CMS one-sided error guarantee
        assert r.overest == r.cms_est - r.exact


def test_fk_audit_edges_and_clean_data(spark, sf_dir):
    from dbms_query_optimizer_spark.operators.governance import FK_EDGES

    rows = QS["fk_integrity_audit"](spark, sf_dir).collect()
    assert len(rows) == len(FK_EDGES)
    for r in rows:
        assert r.n_child_keys <= r.n_child_rows
        assert r.n_orphan_keys <= r.n_child_keys
        assert r.n_orphan_rows <= r.n_child_rows
    # the driver testdata is referentially clean — certify that fact
    assert sum(r.n_orphan_rows for r in rows) == 0


def test_ks_test_matches_python_reference(spark, sf_dir):
    con = _duck(sf_dir)
    rows = con.execute(
        "SELECT n_chars, length(source) <= 4 FROM documents"
    ).fetchall()
    a = sorted(v for v, in_a in rows if in_a)
    b = sorted(v for v, in_a in rows if not in_a)
    support = sorted(set(a) | set(b))
    import bisect

    d_num = max(
        abs(bisect.bisect_right(a, v) * len(b) - bisect.bisect_right(b, v) * len(a))
        for v in support
    )
    row = QS["ks_test_drift"](spark, sf_dir).collect()[0]
    assert (row.n_a, row.n_b, row.d_num) == (len(a), len(b), d_num)
    assert abs(row.d_stat - d_num / (len(a) * len(b))) < 1e-15
