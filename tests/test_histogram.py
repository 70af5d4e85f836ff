"""Pytest ports of the reference histogram + table-stats assertions
(/root/reference/test/unit/optimizer/optimizer_test.cc:146-365).
Same tolerances, same fixture shapes; pure Python — no Spark needed.
"""

from __future__ import annotations

import random

import pytest

from dbms_query_optimizer_spark.plans.stats import IntHistogram, PredicateType, TableStats

from .shape_utils import check_constant, check_linear, check_quadratic

EQ, NE, LT, LE, GT, GE = (
    PredicateType.EQ,
    PredicateType.NE,
    PredicateType.LT,
    PredicateType.LE,
    PredicateType.GT,
    PredicateType.GE,
)


def test_order_of_growth():
    """optimizer_test.cc:146-160 — 33.5M inserts, constant space,
    selectivities sum to ~1. The full insert volume goes through the bulk
    path (identical math to add_value); a 1M-value slice goes through
    add_value itself."""
    hist = IntHistogram(10000, 0, 100)
    n = 33_554_432
    # (c*23) % 101 cycles through 0..100; distribute counts exactly
    base, rem = divmod(n, 101)
    counts: dict[int, int] = {}
    for v in range(101):
        # values (c*23)%101 for c in [0, rem) get one extra
        extra = 1 if (v * pow(23, -1, 101)) % 101 < rem else 0
        b = hist._bucket(v)
        counts[b] = counts.get(b, 0) + base + extra
    hist.set_bucket_counts(counts)
    assert hist.ntups == n
    assert len(hist.counts) == 10000  # constant space

    selectivity = sum(hist.estimate_selectivity(EQ, c) for c in range(101))
    assert selectivity > 0.99

    hist2 = IntHistogram(10000, 0, 100)
    for c in range(1_000_000):
        hist2.add_value((c * 23) % 101)
    sel2 = sum(hist2.estimate_selectivity(EQ, c) for c in range(101))
    assert sel2 > 0.99


def test_negative_range():
    """optimizer_test.cc:165-180."""
    hist = IntHistogram(10, -60, -10)
    for c in range(-60, -9):
        hist.add_value(c)
    assert hist.estimate_selectivity(EQ, -33) < 0.3
    assert hist.estimate_selectivity(EQ, -33) > 0.001


def test_equals():
    """optimizer_test.cc:185-200."""
    hist = IntHistogram(10, 1, 10)
    for _ in range(3):
        hist.add_value(3)
    assert hist.estimate_selectivity(EQ, 3) > 0.9
    assert hist.estimate_selectivity(EQ, 8) < 0.001
    assert hist.estimate_selectivity(NE, 3) < 0.001
    assert hist.estimate_selectivity(NE, 8) > 0.01


def test_lt_gt():
    """optimizer_test.cc:205-226."""
    hist = IntHistogram(10, 1, 10)
    for v in (3, 3, 3, 1, 10):
        hist.add_value(v)
    assert hist.estimate_selectivity(GT, -1) > 0.999
    assert hist.estimate_selectivity(GT, 2) > 0.6
    assert hist.estimate_selectivity(GT, 4) < 0.4
    assert hist.estimate_selectivity(GT, 12) < 0.001
    assert hist.estimate_selectivity(LT, -1) < 0.001
    assert hist.estimate_selectivity(LT, 2) < 0.4
    assert hist.estimate_selectivity(LT, 4) > 0.6
    assert hist.estimate_selectivity(LT, 12) > 0.999


def test_ge_le():
    """optimizer_test.cc:231-253."""
    hist = IntHistogram(10, 1, 10)
    for v in (3, 3, 3, 1, 10):
        hist.add_value(v)
    assert hist.estimate_selectivity(GE, -1) > 0.999
    assert hist.estimate_selectivity(GE, 2) > 0.6
    assert hist.estimate_selectivity(GE, 3) > 0.45
    assert hist.estimate_selectivity(GE, 4) < 0.5
    assert hist.estimate_selectivity(GE, 12) < 0.001
    assert hist.estimate_selectivity(LE, -1) < 0.001
    assert hist.estimate_selectivity(LE, 2) < 0.4
    assert hist.estimate_selectivity(LE, 3) > 0.45
    assert hist.estimate_selectivity(LE, 4) > 0.6
    assert hist.estimate_selectivity(LE, 12) > 0.999


# ---------------------------------------------------------------- TableStats


def make_t1_stats(num_tuples: int = 10200, num_fields: int = 4, seed: int = 7) -> TableStats:
    """The reference's t1 fixture: uniform random ints in [1,31]
    (test/utils/utils.cc:51-60; optimizer_test.cc:629)."""
    rng = random.Random(seed)
    stats = TableStats(num_tuples=num_tuples, num_pages=120, io_cost_per_page=100)
    for col in range(num_fields):
        name = f"c{col}"
        hist = IntHistogram(100, 1, 31)
        for _ in range(num_tuples):
            hist.add_value(rng.randint(1, 31))
        stats.histograms[name] = hist
    return stats


def test_estimate_table_cardinality():
    """Exact values from optimizer_test.cc:311-319."""
    stats = make_t1_stats()
    assert stats.estimate_table_cardinality(0.3) == 3060
    assert stats.estimate_table_cardinality(1.0) == 10200
    assert stats.estimate_table_cardinality(0.0) == 0


def test_estimate_selectivity_grid():
    """The per-predicate tolerance grid (optimizer_test.cc:322-365).

    The reference fixture draws values in [1,31] but the test computes its
    expectations for [0,32]; same loose tolerances here.
    """
    stats = make_t1_stats()
    max_val, min_val = 32, 0
    above, below, mid = max_val + 10, min_val - 10, (min_val + max_val) // 2
    for col in ("c0", "c1", "c2", "c3"):
        est = lambda op, v: stats.estimate_selectivity(col, op, v)  # noqa: E731
        assert est(EQ, above) == pytest.approx(0.0, abs=0.001)
        assert est(EQ, mid) == pytest.approx(1 / 32, abs=0.015)
        assert est(EQ, below) == pytest.approx(0.0, abs=0.001)

        assert est(NE, above) == pytest.approx(1.0, abs=0.001)
        assert est(NE, mid) == pytest.approx(31 / 32, abs=0.015)
        assert est(NE, below) == pytest.approx(1.0, abs=0.015)

        assert est(GT, above) == pytest.approx(0.0, abs=0.001)
        assert est(GT, max_val) == pytest.approx(0.0, abs=0.001)
        assert est(GT, mid) == pytest.approx(0.5, abs=0.1)
        assert est(GT, min_val) == pytest.approx(31 / 32, abs=0.05)
        assert est(GT, below) == pytest.approx(1.0, abs=0.001)

        assert est(LT, above) == pytest.approx(1.0, abs=0.001)
        assert est(LT, max_val) == pytest.approx(1.0, abs=0.015)
        assert est(LT, mid) == pytest.approx(0.5, abs=0.1)
        assert est(LT, min_val) == pytest.approx(0.0, abs=0.001)
        assert est(LT, below) == pytest.approx(0.0, abs=0.001)

        assert est(GE, above) == pytest.approx(0.0, abs=0.001)
        assert est(GE, max_val) == pytest.approx(0.0, abs=0.015)
        assert est(GE, mid) == pytest.approx(0.5, abs=0.1)
        assert est(GE, min_val) == pytest.approx(1.0, abs=0.015)
        assert est(GE, below) == pytest.approx(1.0, abs=0.001)

        assert est(LE, above) == pytest.approx(1.0, abs=0.001)
        assert est(LE, max_val) == pytest.approx(1.0, abs=0.015)
        assert est(LE, mid) == pytest.approx(0.5, abs=0.1)
        assert est(LE, min_val) == pytest.approx(0.0, abs=0.05)
        assert est(LE, below) == pytest.approx(0.0, abs=0.001)


def test_scan_cost_shapes():
    """Scan cost linear in pages / io_cost, quadratic in both
    (optimizer_test.cc:262-304)."""
    # io constant, pages linear
    costs = [
        TableStats(num_tuples=510 * p, num_pages=p, io_cost_per_page=1).estimate_scan_cost()
        for p in (3 * (i + 1) for i in range(10))
    ]
    assert not check_constant(costs)
    assert check_linear(costs)

    # pages constant, io linear
    costs = [
        TableStats(num_tuples=510, num_pages=1, io_cost_per_page=8 * (i + 1)).estimate_scan_cost()
        for i in range(10)
    ]
    assert not check_constant(costs)
    assert check_linear(costs)

    # both linear -> quadratic
    costs = [
        TableStats(
            num_tuples=510 * (i + 1), num_pages=i + 1, io_cost_per_page=3 * (i + 1)
        ).estimate_scan_cost()
        for i in range(10)
    ]
    assert not check_constant(costs)
    assert not check_linear(costs)
    assert check_quadratic(costs)
