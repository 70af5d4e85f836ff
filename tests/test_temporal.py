"""Semantic checks for the temporal join operators (oracle parity is
covered by test_queries_oracle; these pin the join semantics themselves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.operators.temporal import (
    ASOF_BUILD_TYPE,
    RANGE_WINDOW_MIN,
    asof_backward_frame,
    asof_forward_frame,
    asof_salted_frame,
    q_asof_join,
    q_asof_join_forward,
    q_asof_join_salted,
    q_range_join_bucketed,
)


def test_asof_purchase_matches_itself(spark, sf_dir):
    """<= semantics: a purchase's most recent purchase at-or-before itself
    is itself, at gap 0."""
    out = q_asof_join(spark, sf_dir).filter(F.col("event_type") == ASOF_BUILD_TYPE)
    rows = out.collect()
    assert rows, "no purchase rows matched"
    assert all(r.purchase_id == r.event_id and r.gap_us == 0 for r in rows)


def test_asof_left_keeps_unmatched_probes(spark, sf_dir):
    """LEFT variant: matched rows identical to the inner join; unmatched
    rows are exactly the events strictly before their user's first
    purchase (or of users with no purchases), with NULL match columns."""
    from dbms_query_optimizer_spark.operators.temporal import q_asof_join_left

    ev = load_tables(spark, sf_dir)["events"]
    inner = {r.event_id: r for r in q_asof_join(spark, sf_dir).collect()}
    left = q_asof_join_left(spark, sf_dir).collect()
    assert len(left) == ev.count()
    first_purchase = {
        r.user_id: r.us
        for r in ev.filter(F.col("event_type") == ASOF_BUILD_TYPE)
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("us"))
        .collect()
    }
    ev_us = {
        r.event_id: (r.user_id, r.us)
        for r in ev.select(
            "event_id", "user_id", F.unix_micros("ts").alias("us")
        ).collect()
    }
    for r in left:
        if r.purchase_id is None:
            assert r.gap_us is None
            user, us = ev_us[r.event_id]
            assert user not in first_purchase or us < first_purchase[user]
            assert r.event_id not in inner
        else:
            i = inner[r.event_id]
            assert (r.purchase_id, r.gap_us) == (i.purchase_id, i.gap_us)


def test_asof_match_is_latest_at_or_before(spark, sf_dir):
    """Every output row must name the brute-force argmax purchase."""
    ev = load_tables(spark, sf_dir)["events"]
    purchases = (
        ev.filter(F.col("event_type") == ASOF_BUILD_TYPE)
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    by_user: dict[int, list[tuple[int, int]]] = {}
    for r in purchases:
        by_user.setdefault(r.user_id, []).append((r.us, r.event_id))
    probe_us = {
        r.event_id: r.us
        for r in ev.select("event_id", F.unix_micros("ts").alias("us")).collect()
    }
    for r in q_asof_join(spark, sf_dir).collect():
        best = max(x for x in by_user[r.user_id] if x[0] <= probe_us[r.event_id])
        assert best[1] == r.purchase_id, (r.event_id, best, r.purchase_id)


def test_asof_forward_purchase_matches_itself(spark, sf_dir):
    """At-or-after semantics: a purchase's NEXT purchase at-or-after
    itself is itself, at gap 0 (regression: the FOLLOWING frame used to
    sort builds before probes at equal ts, excluding the self-match)."""
    out = q_asof_join_forward(spark, sf_dir).filter(
        F.col("event_type") == ASOF_BUILD_TYPE
    )
    rows = out.collect()
    assert rows, "no purchase rows matched"
    assert all(r.purchase_id == r.event_id and r.gap_us == 0 for r in rows)


def test_asof_forward_equal_ts_probe_and_build(spark):
    """A non-purchase probe sharing a timestamp with a purchase must match
    that purchase at gap_us=0 (at-or-after, not strictly-after)."""
    ev = spark.createDataFrame(
        [
            (1, 7, "view", "2024-01-01 10:00:00"),   # same instant as purchase 2
            (2, 7, "purchase", "2024-01-01 10:00:00"),
            (3, 7, "view", "2024-01-01 11:00:00"),   # after last purchase → drops
            (4, 8, "view", "2024-01-01 09:00:00"),   # strictly-before case
            (5, 8, "purchase", "2024-01-01 09:30:00"),
        ],
        "event_id long, user_id long, event_type string, ts_s string",
    ).select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {r.event_id: (r.purchase_id, r.gap_us) for r in asof_forward_frame(ev).collect()}
    assert got[1] == (2, 0), got          # equal-ts view matches the purchase
    assert got[2] == (2, 0), got          # purchase self-match
    assert 3 not in got                   # no later purchase → inner-drop
    assert got[4] == (5, 30 * 60 * 1_000_000), got
    assert got[5] == (5, 0), got


def test_asof_salted_equals_unsalted(spark, sf_dir):
    """The two-phase salted plan must be row-for-row identical to the
    single-partition-per-key plan on real data."""
    plain = {r.event_id: (r.purchase_id, r.gap_us) for r in q_asof_join(spark, sf_dir).collect()}
    salted = {
        r.event_id: (r.purchase_id, r.gap_us)
        for r in q_asof_join_salted(spark, sf_dir).collect()
    }
    assert salted == plain


def test_asof_salted_hot_key_fixture(spark):
    """One user owns 96% of the rows (the serializing case) with sparse
    purchases, so most time buckets have probes but no build and the
    carry-in must propagate across multiple empty buckets. Cold users
    interleave to check carry isolation between keys."""
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000  # µs epoch
    for _ in range(4000):  # hot user 1: purchases only in the first 5% of time
        eid += 1
        us = base + rng.randrange(0, 10**9)
        etype = "purchase" if us < base + 5 * 10**7 and rng.random() < 0.02 else "view"
        rows.append((eid, 1, etype, us))
    for uid in range(2, 40):  # cold users, some with zero purchases
        for _ in range(rng.randrange(1, 8)):
            eid += 1
            us = base + rng.randrange(0, 10**9)
            etype = "purchase" if uid % 3 and rng.random() < 0.3 else "view"
            rows.append((eid, uid, etype, us))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, us long"
    ).select("event_id", "user_id", "event_type", F.timestamp_micros("us").alias("ts"))

    plain = {r.event_id: (r.purchase_id, r.gap_us) for r in asof_backward_frame(ev).collect()}
    for n_buckets in (3, 16):
        salted = {
            r.event_id: (r.purchase_id, r.gap_us)
            for r in asof_salted_frame(ev, n_buckets=n_buckets).collect()
        }
        assert salted == plain, f"mismatch at n_buckets={n_buckets}"


def test_range_join_equals_naive(spark, sf_dir):
    """The bucketed equi-join plan must reproduce the naive non-equi join."""
    ev = load_tables(spark, sf_dir)["events"]
    win_us = RANGE_WINDOW_MIN * 60 * 1_000_000
    p = ev.filter(F.col("event_type") == ASOF_BUILD_TYPE).select(
        F.col("event_id").alias("purchase_id"), "user_id", F.unix_micros("ts").alias("p_us")
    )
    r = ev.select(F.col("user_id").alias("u2"), F.unix_micros("ts").alias("e_us"))
    naive = (
        p.join(
            r,
            (F.col("user_id") == F.col("u2"))
            & (F.col("e_us") > F.col("p_us"))
            & (F.col("e_us") <= F.col("p_us") + win_us),
            "left",
        )
        .groupBy("purchase_id")
        .agg(F.count("e_us").alias("n_follow"))
    )
    naive_counts = {r.purchase_id: r.n_follow for r in naive.collect()}
    bucketed = q_range_join_bucketed(spark, sf_dir).collect()
    assert {r.purchase_id: r.n_follow for r in bucketed} == naive_counts


def test_overlap_census_matches_bruteforce(spark):
    """Sweep-line census vs O(n²) brute force on adversarial synthetic
    intervals: shared endpoints (ties), point intervals, nested, disjoint,
    band-boundary-straddling, multi-day — three seeded random sets."""
    import random

    from dbms_query_optimizer_spark.operators.temporal import (
        OVERLAP_BAND_US,
        overlap_counts,
    )

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = []
        for uid in range(120):
            day = rng.choice(["2024-01-01", "2024-01-02"])
            # cluster endpoints on a coarse grid so ties and shared
            # endpoints are common; straddle band boundaries on purpose
            lo = rng.randrange(0, 20) * (OVERLAP_BAND_US // 2)
            span = rng.choice([0, 1, 2, 7, 13]) * (OVERLAP_BAND_US // 3)
            rows.append((uid, day, lo, lo + span))
        iv = spark.createDataFrame(rows, "user_id long, day string, s long, e long")

        got = {
            (r["user_a"], r["day"]): r["n_overlap"]
            for r in overlap_counts(iv).collect()
        }
        for uid, day, s, e in rows:
            want = sum(
                1
                for (uid2, day2, s2, e2) in rows
                if uid2 != uid and day2 == day and s2 <= e and s <= e2
            )
            assert got[(uid, day)] == want, (seed, uid, day, got[(uid, day)], want)
