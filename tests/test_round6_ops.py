"""Semantics tests for the round-6 operators, independent of the DuckDB
oracles (tests/test_queries_oracle.py runs those): each test pins an
invariant or re-derives the answer with a pure-Python reference, so a
bug mirrored into the oracle SQL would still be caught here.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbms_query_optimizer_spark.operators import catalog
from dbms_query_optimizer_spark.operators.geo import (
    EARTH_R_KM,
    GEO_CELL_DEG,
    GEO_LON_CELL_DEG,
    GEO_RADIUS_KM,
)
from dbms_query_optimizer_spark.operators.governance import (
    BH_Q,
    L_DIVERSITY,
)
from dbms_query_optimizer_spark.operators.temporal import (
    ACF_MAX_LAG,
    ATTR_WINDOW_DAYS,
)

QS = catalog.queries()


# ------------------------------------------------------------------ geo

def _haversine(lat1, lon1, lat2, lon2):
    dphi = math.radians(lat2 - lat1) / 2
    dlmb = math.radians(lon2 - lon1) / 2
    a = math.sin(dphi) ** 2 + math.cos(math.radians(lat1)) * math.cos(
        math.radians(lat2)
    ) * math.sin(dlmb) ** 2
    return 2 * EARTH_R_KM * math.asin(math.sqrt(a))


def test_geo_cell_size_covers_radius():
    # the completeness argument of the 3×3 cover, checked numerically:
    # the widest lon span a 400 km great circle reaches on lat∈[−60,60]
    # (at the ±60° extremes) must fit in one lon cell, and the lat span
    # in one lat cell.
    max_dlon = math.degrees(
        2 * math.asin(math.sin(GEO_RADIUS_KM / (2 * EARTH_R_KM)) / math.cos(math.radians(60)))
    )
    max_dlat = math.degrees(GEO_RADIUS_KM / EARTH_R_KM)
    assert max_dlon < GEO_LON_CELL_DEG
    assert max_dlat < GEO_CELL_DEG


def test_geo_nearest_facility_is_true_nearest(spark, sf_dir):
    # brute-force re-derivation in Python for every matched customer
    rows = QS["geo_nearest_facility"](spark, sf_dir).collect()
    from dbms_query_optimizer_spark.engine import load_tables

    t = load_tables(spark, sf_dir)
    custs = [r.c_custkey for r in t["customer"].select("c_custkey").collect()]
    supps = [r.s_suppkey for r in t["supplier"].select("s_suppkey").collect()]

    def lat(k):
        return ((k * 2654435761) % 120000) / 1000.0 - 60.0

    def lon(k):
        return (((k + 7) * 2654435761) % 360000) / 1000.0 - 180.0

    fac = {s: (lat(s * 13), lon(s * 13)) for s in supps}
    best = {}
    for c in custs:
        plat, plon = lat(c), lon(c)
        cands = sorted(
            (round(_haversine(plat, plon, fa, fo), 4), s)
            for s, (fa, fo) in fac.items()
        )
        d, s = cands[0]
        if d <= GEO_RADIUS_KM:
            best[c] = (s, d)
    got = {r.c_custkey: (r.s_suppkey, r.dist_km) for r in rows}
    assert got == best


def test_geo_grid_density_cells_within_bounds(spark, sf_dir):
    rows = QS["geo_grid_density"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert -60 <= r.cell_lat <= 59
        assert -180 <= r.cell_lon <= 179
        assert r.n_users <= r.n_events
    # descending density with the full tiebreak
    keys = [(-r.n_events, r.cell_lat, r.cell_lon) for r in rows]
    assert keys == sorted(keys)


# ------------------------------------------------------- autocorrelation

def test_autocorr_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from dbms_query_optimizer_spark.engine import load_tables

    daily = (
        load_tables(spark, sf_dir)["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r["count"]))
    got = {
        (r.event_type, r.lag): r.acf
        for r in QS["autocorr_lags"](spark, sf_dir).collect()
    }
    for et, pts in series.items():
        x = np.array([v for _, v in sorted(pts)], dtype=float)
        xbar = x.mean()
        den = ((x - xbar) ** 2).sum()
        for k in range(1, ACF_MAX_LAG + 1):
            ref = ((x[k:] - xbar) * (x[:-k] - xbar)).sum() / den
            assert abs(got[(et, k)] - ref) < 1e-5, (et, k)


def test_autocorr_bounded_by_one(spark, sf_dir):
    for r in QS["autocorr_lags"](spark, sf_dir).collect():
        assert -1.0 <= r.acf <= 1.0


# --------------------------------------------------------- gaps/islands

def test_activity_islands_python_reference(spark, sf_dir):
    from dbms_query_optimizer_spark.engine import load_tables

    days = (
        load_tables(spark, sf_dir)["events"]
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    per_user: dict[int, list] = {}
    for r in days:
        per_user.setdefault(r.user_id, []).append(r.day)
    got = {
        r.user_id: (r.n_islands, r.longest_streak, r.active_days)
        for r in QS["activity_islands"](spark, sf_dir).collect()
    }
    for u, ds in per_user.items():
        ds = sorted(ds)
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[u] == (len(streaks), max(streaks), len(ds)), u


# -------------------------------------------------- time-decay weights

def test_time_decay_credit_conservation(spark, sf_dir):
    # Σ credited_micro over channels == Σ over conversions of
    # cents·10⁶ − per-conversion integer-division remainders; bound the
    # defect by (touches-per-conversion · max w) and require the split
    # to never exceed the exact pot.
    from dbms_query_optimizer_spark.engine import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("ts").alias("touch_ts")
    )
    credited_convs = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("touch_ts") < F.col("conv_ts"))
            & (
                F.col("touch_ts")
                >= F.col("conv_ts")
                - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
            )
        )
        .select("conv_id", "cents")
        .distinct()
    )
    pot = credited_convs.agg(
        F.coalesce(F.sum(F.col("cents") * 1000000), F.lit(0)).alias("p")
    ).collect()[0].p
    rows = QS["time_decay_attribution"](spark, sf_dir).collect()
    total = sum(r.credited_micro for r in rows)
    assert total <= pot
    # remainder per conversion < Σw ≤ n_touch·4 micro-units; generous cap
    n_pairs = sum(r.n_touches for r in rows)
    assert pot - total <= 4 * n_pairs


def test_time_decay_weights_partition_by_age(spark, sf_dir):
    # weight_total == Σ over pairs of 2^(W−1−age); re-derive from the
    # raw pair frame
    from dbms_query_optimizer_spark.engine import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("channel"),
    )
    pairs = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("touch_ts") < F.col("conv_ts"))
            & (
                F.col("touch_ts")
                >= F.col("conv_ts")
                - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
            )
        )
        .select(
            "channel",
            F.expr(
                "(unix_timestamp(conv_ts) - unix_timestamp(touch_ts)) DIV 86400"
            ).alias("age_d"),
        )
        .collect()
    )
    ref: dict[str, int] = {}
    for r in pairs:
        # boundary-second touches floor to age_d == ATTR_WINDOW_DAYS;
        # the query clamps them into the oldest bucket
        ref[r.channel] = ref.get(r.channel, 0) + (
            1 << max(0, ATTR_WINDOW_DAYS - 1 - r.age_d)
        )
    got = {
        r.channel: r.weight_total
        for r in QS["time_decay_attribution"](spark, sf_dir).collect()
    }
    assert got == ref


# ------------------------------------------------------------- BH FDR

def test_bh_fdr_stepup_reference(spark, sf_dir):
    rows = QS["bh_fdr_report"](spark, sf_dir).collect()
    m = len(rows)
    assert m > 0
    ps = [r.p_value for r in rows]
    assert ps == sorted(ps)  # ranked ascending
    # re-run the step-up in Python on the reported p's
    # use the query's own HALF_UP-rounded threshold column — Python
    # round() is half-to-even and could disagree on an exact boundary
    k_star = 0
    for r in rows:
        if r.p_value <= r.bh_threshold:
            k_star = r.p_rank
    for r in rows:
        assert r.rejected == (r.p_rank <= k_star), r.p_rank
    # rejection set is a prefix of the p-ordering (BH's defining shape)
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)


def test_bh_fdr_rejects_superset_of_bonferroni(spark, sf_dir):
    # BH is never more conservative than Bonferroni at the same q
    rows = QS["bh_fdr_report"](spark, sf_dir).collect()
    m = len(rows)
    bonferroni = {r.user_id for r in rows if r.p_value <= BH_Q / m}
    bh = {r.user_id for r in rows if r.rejected}
    assert bonferroni <= bh


# -------------------------------------------------------- l-diversity

def test_l_diversity_python_reference(spark, sf_dir):
    from dbms_query_optimizer_spark.engine import load_tables

    t = load_tables(spark, sf_dir)
    joined = (
        t["customer"]
        .select("c_custkey", "c_nationkey", "c_mktsegment")
        .join(
            t["orders"].select("o_custkey", "o_orderpriority"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select("c_nationkey", "c_mktsegment", "o_orderpriority")
        .collect()
    )
    classes: dict[tuple, dict[str, int]] = {}
    for r in joined:
        d = classes.setdefault((r.c_nationkey, r.c_mktsegment), {})
        d[r.o_orderpriority] = d.get(r.o_orderpriority, 0) + 1
    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in QS["l_diversity_audit"](spark, sf_dir).collect()
    }
    assert set(got) == set(classes)
    for key, dist in classes.items():
        n = sum(dist.values())
        ent = -sum(c / n * math.log(c / n) for c in dist.values())
        r = got[key]
        assert r.n_orders == n
        assert r.l_distinct == len(dist)
        assert abs(r.entropy - ent) < 1e-5
        assert r.distinct_l_ok == (len(dist) >= L_DIVERSITY)
        assert r.entropy_l_ok == (r.entropy >= math.log(L_DIVERSITY))


# ------------------------------------------------- trigram mining

def test_event_trigrams_python_reference(spark, sf_dir):
    from dbms_query_optimizer_spark.engine import load_tables
    from dbms_query_optimizer_spark.operators.temporal import TRIGRAM_TOPK

    ev = (
        load_tables(spark, sf_dir)["events"]
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    support: dict[tuple, int] = {}
    users: dict[tuple, set] = {}
    for u, rows in per_user.items():
        seq = [t for _, _, t in sorted(rows, key=lambda x: (x[0], x[1]))]
        for i in range(len(seq) - 2):
            k = (seq[i], seq[i + 1], seq[i + 2])
            support[k] = support.get(k, 0) + 1
            users.setdefault(k, set()).add(u)
    expected = sorted(
        ((-n, *k, n, len(users[k])) for k, n in support.items())
    )[:TRIGRAM_TOPK]
    expected = [(e1, e2, e3, n, nu) for _, e1, e2, e3, n, nu in expected]
    got = [
        (r.e1, r.e2, r.e3, r.support, r.n_users)
        for r in QS["event_trigram_mining"](spark, sf_dir).collect()
    ]
    assert got == expected


# ---------------------------------------------------- trajectory length

def test_geo_trajectory_python_reference(spark, sf_dir):
    from dbms_query_optimizer_spark.engine import load_tables

    ev = (
        load_tables(spark, sf_dir)["events"]
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per_user: dict[int, list] = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append((r.ts, r.event_id))

    def lat(k):
        return ((k * 2654435761) % 120000) / 1000.0 - 60.0

    def lon(k):
        return (((k + 7) * 2654435761) % 360000) / 1000.0 - 180.0

    got = {
        r.user_id: (r.n_hops, r.total_m, r.max_hop_m)
        for r in QS["geo_trajectory_length"](spark, sf_dir).collect()
    }
    for u, rows in per_user.items():
        seq = [e for _, e in sorted(rows)]
        hops = [
            int(round(_haversine(lat(a), lon(a), lat(b), lon(b)) * 1000))
            for a, b in zip(seq, seq[1:])
        ]
        if not hops:
            assert u not in got
            continue
        assert got[u] == (len(hops), sum(hops), max(hops)), u
