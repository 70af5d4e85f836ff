"""Property-based histogram invariants (hypothesis), extending the
reference's tolerance/shape assertions (optimizer_test.cc:146-365) with
laws that must hold for EVERY histogram, not just the sampled fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dbms_query_optimizer_spark.plans.stats import IntHistogram, PredicateType as P

configs = st.tuples(
    st.integers(min_value=1, max_value=64),  # buckets
    st.integers(min_value=-1000, max_value=1000),  # min
    st.integers(min_value=0, max_value=2000),  # extent
)
value_lists = st.lists(st.integers(min_value=-1500, max_value=3500), min_size=1, max_size=200)


def _build(cfg, values):
    buckets, mn, extent = cfg
    h = IntHistogram(buckets, mn, mn + extent)
    for v in values:
        h.add_value(v)
    return h


@settings(max_examples=200, deadline=None)
@given(configs, value_lists, st.integers(min_value=-1600, max_value=3600))
def test_complementarity(cfg, values, probe):
    """NE = 1-EQ and LE = 1-GT hold at EVERY probe (the LE short-circuits
    agree with GT's at both edges). LT = 1-GE holds everywhere EXCEPT
    probe == max: there the reference's saturating branches
    (table_stats.cc:83-136) return LT 1.0 via the v>=max short-circuit
    while GE(max) = GT(max-1) can exceed 0 — an intentional parity quirk
    pinned by test_estimation_accuracy.test_reference_boundary_semantics,
    so only that single probe is excluded from the LT/GE law."""
    h = _build(cfg, values)
    if h.ntups == 0:
        return
    assert abs(h.estimate_selectivity(P.NE, probe) + h.estimate_selectivity(P.EQ, probe) - 1) < 1e-9
    assert abs(h.estimate_selectivity(P.LE, probe) + h.estimate_selectivity(P.GT, probe) - 1) < 1e-9
    if probe != h.max_v:
        assert abs(h.estimate_selectivity(P.LT, probe) + h.estimate_selectivity(P.GE, probe) - 1) < 1e-9


@settings(max_examples=200, deadline=None)
@given(configs, value_lists, st.integers(min_value=-1600, max_value=3600))
def test_bounds_and_extremes(cfg, values, probe):
    """Selectivities live in [0,1]; below-range GT is 1, above-range is 0."""
    h = _build(cfg, values)
    if h.ntups == 0:
        return
    for op in P:
        s = h.estimate_selectivity(op, probe)
        assert -1e-9 <= s <= 1 + 1e-9, (op, s)
    assert h.estimate_selectivity(P.GT, h.min_v - 1) == 1.0
    assert h.estimate_selectivity(P.GT, h.max_v) == 0.0
    assert h.estimate_selectivity(P.LE, h.max_v) == 1.0


@settings(max_examples=100, deadline=None)
@given(configs, value_lists)
def test_gt_monotone_nonincreasing(cfg, values):
    """GT selectivity can only shrink as the probe grows."""
    h = _build(cfg, values)
    if h.ntups == 0:
        return
    probes = range(h.min_v - 1, h.max_v + 2, max(1, (h.max_v - h.min_v) // 17 or 1))
    sels = [h.estimate_selectivity(P.GT, v) for v in probes]
    assert all(a >= b - 1e-9 for a, b in zip(sels, sels[1:]))


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=32),  # buckets
    st.integers(min_value=1, max_value=8),  # integers per bucket
    st.integers(min_value=-1000, max_value=1000),  # min
    value_lists,
)
def test_eq_sums_to_one_over_domain(buckets, per_bucket, mn, values):
    """Sum of EQ over every in-range integer == 1 (the reference's
    OrderOfGrowthTest invariant). Holds exactly whenever the bucket span
    is a whole number of integers — the reference's own fixtures always
    satisfy this (span == 1); fractional spans over-count by design of
    the h/span equi-width density formula."""
    extent = buckets * per_bucket - 1
    h = IntHistogram(buckets, mn, mn + extent)
    for v in values:
        h.add_value(v)
    if h.ntups == 0:
        return
    total = sum(h.estimate_selectivity(P.EQ, v) for v in range(h.min_v, h.max_v + 1))
    assert abs(total - 1.0) < 1e-6, total
