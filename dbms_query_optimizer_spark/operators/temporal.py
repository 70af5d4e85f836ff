"""Temporal join operators over the ``events`` table: as-of join, range
join, multi-resolution rollup.

The reference has no temporal operators (its only join is the inner
theta-join spec of ``join_optimizer.h:17-48``); these complete the
category with the two join shapes time-series workloads need and Spark
lacks as built-ins:

- **as-of join** — for each probe row, the single most recent build row
  at or before it (per key). Implemented WITHOUT a join: both sides are
  unioned, shuffled once on the key, sorted by time, and the build
  payload is carried forward with ``last(..., ignorenulls)``. That is
  the scale-correct plan: one shuffle, sort-merge-friendly, no
  per-probe candidate explosion, and skew only matters if one key holds
  a material fraction of all rows.
- **range join** — all build rows inside a time window after each probe
  row. Implemented as an EQUI-join on (key, time-bucket) with the probe
  side exploded over the (window/bucket + 1) buckets its window spans,
  then the exact range predicate applied inside the bucket. A plain
  non-equi join would be a broadcast nested loop; bucketing turns it
  into a hash join whose fan-out is bounded by the window/bucket ratio.
- **multi-resolution rollup** — the hypertable "continuous aggregate"
  pattern: the fine (hourly) aggregate is computed once and the coarse
  (daily) resolution re-aggregates those partials instead of rescanning
  raw data.

Timestamps are compared in whole microseconds on both engines (Spark
session reads parquet TIMESTAMP(NANOS) as microsecond-truncated; the
oracles ``date_trunc('microseconds', ts)`` to match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..engine import load_tables
from ..functions.numeric import dec, dsum_double

ASOF_BUILD_TYPE = "purchase"
RANGE_WINDOW_MIN = 10  # range-join window length == bucket size


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event matched to the user's most recent purchase at-or-before
    its timestamp (events that precede every purchase drop out — inner
    as-of semantics, like DuckDB's ASOF JOIN)."""
    return asof_backward_frame(load_tables(spark, sf_dir)["events"])


def _asof_union(ev: DataFrame) -> DataFrame:
    """Probe/build union shared by the as-of variants: every event is a
    probe; purchases are additionally build rows carrying their payload in
    a struct so one ignorenulls window fill resolves the match."""
    probes = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lit(None).cast("struct<purchase_ts:timestamp,purchase_id:bigint>").alias("build"),
        F.lit(1).alias("is_probe"),
    )
    builds = ev.filter(F.col("event_type") == ASOF_BUILD_TYPE).select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.struct(
            F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_id")
        ).alias("build"),
        F.lit(0).alias("is_probe"),
    )
    return probes.unionByName(builds)


def _asof_project(
    filled: DataFrame, match_col: str = "m", keep_unmatched: bool = False
) -> DataFrame:
    """Project the filled union back to the as-of join result schema."""
    m = F.col(match_col)
    probes = F.col("is_probe") == 1
    return (
        filled.filter(probes if keep_unmatched else (probes & m.isNotNull()))
        .select(
            "event_id",
            "user_id",
            "event_type",
            m.getField("purchase_id").alias("purchase_id"),
            m.getField("purchase_ts").alias("purchase_ts"),
            (F.unix_micros("ts") - F.unix_micros(m.getField("purchase_ts"))).alias(
                "gap_us"
            ),
        )
        .orderBy("event_id")
    )


def asof_backward_frame(ev: DataFrame) -> DataFrame:
    """Frame-level backward as-of core (see q_asof_join)."""
    # builds sort before probes at equal ts (is_probe asc), making the
    # match inclusive: a purchase matches itself with gap 0.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = _asof_union(ev).withColumn("m", F.last("build", ignorenulls=True).over(w))
    return _asof_project(filled)


ORACLE_ASOF_JOIN = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
        FROM events
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM ev WHERE event_type = '{ASOF_BUILD_TYPE}'
    )
    SELECT l.event_id, l.user_id, l.event_type,
           r.purchase_id, r.purchase_ts,
           epoch_us(l.ts) - epoch_us(r.purchase_ts) AS gap_us
    FROM ev l ASOF JOIN p r
      ON l.user_id = r.user_id AND r.purchase_ts <= l.ts
    ORDER BY event_id
"""


def q_asof_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT as-of join: like ``q_asof_join`` but probes with NO purchase
    at-or-before them survive with NULL match columns — the outer-join
    member of the as-of family (a user's events before their first
    purchase keep their row, which the inner form drops). Identical
    one-shuffle union-sort-window plan; keeping unmatched probes is just
    not filtering them, so the variant costs nothing extra. The oracle is
    DuckDB's native ASOF LEFT JOIN — an independent engine's definition
    of the same semantics.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = _asof_union(ev).withColumn(
        "m", F.last("build", ignorenulls=True).over(w)
    )
    return _asof_project(filled, keep_unmatched=True)


ORACLE_ASOF_JOIN_LEFT = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
        FROM events
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM ev WHERE event_type = '{ASOF_BUILD_TYPE}'
    )
    SELECT l.event_id, l.user_id, l.event_type,
           r.purchase_id, r.purchase_ts,
           epoch_us(l.ts) - epoch_us(r.purchase_ts) AS gap_us
    FROM ev l ASOF LEFT JOIN p r
      ON l.user_id = r.user_id AND r.purchase_ts <= l.ts
    ORDER BY event_id
"""


def q_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: count + value-sum of the user's events in the
    following RANGE_WINDOW_MIN minutes (exclusive of the purchase
    instant, inclusive of the window end)."""
    ev = load_tables(spark, sf_dir)["events"]
    bucket_us = RANGE_WINDOW_MIN * 60 * 1_000_000

    purchases = ev.filter(F.col("event_type") == ASOF_BUILD_TYPE).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.unix_micros("ts").alias("p_us"),
    )
    right = ev.select(
        "user_id",
        F.unix_micros("ts").alias("e_us"),
        "value",
        (F.unix_micros("ts") / bucket_us).cast("long").alias("bucket"),
    )
    # a (p_ts, p_ts + W] window spans at most 2 W-sized buckets
    probes = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("p_us") / bucket_us).cast("long"),
                (F.col("p_us") / bucket_us).cast("long") + 1,
            )
        ),
    )
    matched = probes.join(right, ["user_id", "bucket"]).filter(
        (F.col("e_us") > F.col("p_us")) & (F.col("e_us") <= F.col("p_us") + bucket_us)
    )
    counts = matched.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_follow"),
        dsum_double(dec("value"), 2).alias("sum_value"),
    )
    return (
        purchases.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.col("p_ts").alias("purchase_ts"),
            F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("purchase_id")
    )


ORACLE_RANGE_JOIN = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, value,
               CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
        FROM events
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM ev WHERE event_type = '{ASOF_BUILD_TYPE}'
    )
    SELECT p.purchase_id, p.user_id, p.purchase_ts,
           COUNT(e.ts) AS n_follow,
           COALESCE(ROUND(CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE), 2), 0.0)
               AS sum_value
    FROM p LEFT JOIN ev e
      ON e.user_id = p.user_id
     AND e.ts > p.purchase_ts
     AND e.ts <= p.purchase_ts + INTERVAL {RANGE_WINDOW_MIN} MINUTE
    GROUP BY p.purchase_id, p.user_id, p.purchase_ts
    ORDER BY purchase_id
"""


def q_events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour + day resolutions from ONE raw scan: daily rows re-aggregate
    the hourly partials (counts add; sums add exactly in decimal)."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).alias("dsum"),
        )
    )
    daily = (
        hourly.groupBy(
            F.date_trunc("day", "window_start").alias("window_start"), "event_type"
        ).agg(F.sum("n_events").alias("n_events"), F.sum("dsum").alias("dsum"))
    )
    out_cols = [
        "resolution",
        "window_start",
        "event_type",
        "n_events",
        F.round(F.col("dsum").cast("double"), 2).alias("sum_value"),
    ]
    return (
        hourly.withColumn("resolution", F.lit("1h"))
        .select(*out_cols)
        .unionByName(daily.withColumn("resolution", F.lit("1d")).select(*out_cols))
        .orderBy("resolution", "window_start", "event_type")
    )


ORACLE_ROLLUP_MULTIRES = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               SUM(CAST(value AS DECIMAL(12,2))) AS dsum
        FROM events GROUP BY 1, 2
    ),
    daily AS (
        SELECT date_trunc('day', window_start) AS window_start, event_type,
               CAST(SUM(n_events) AS BIGINT) AS n_events, SUM(dsum) AS dsum
        FROM hourly GROUP BY 1, 2
    )
    SELECT '1h' AS resolution, window_start, event_type,
           n_events, ROUND(CAST(dsum AS DOUBLE), 2) AS sum_value
    FROM hourly
    UNION ALL
    SELECT '1d', window_start, event_type, n_events, ROUND(CAST(dsum AS DOUBLE), 2)
    FROM daily
    ORDER BY resolution, window_start, event_type
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: view → click-after-view →
    purchase-after-click, counting users surviving each stage.

    Each stage is a per-user MIN(ts) aggregate joined to the previous
    stage with a strictly-later residual — three small shuffles on
    user_id, each input already reduced to one row per surviving user.
    At scale every stage's output is ≤ distinct-user cardinality, so
    stages 2 and 3 broadcast under AQE regardless of raw event volume.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = lambda name, df: df.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit(name).alias("stage"), "n_users"
    )
    return (
        stage("1_view", views)
        .unionAll(stage("2_click_after_view", clicks))
        .unionAll(stage("3_purchase_after_click", purchases))
        .orderBy("stage")
    )


ORACLE_EVENTS_FUNNEL = """
WITH v AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
    JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
    JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL
SELECT '2_click_after_view', COUNT(*) FROM c
UNION ALL
SELECT '3_purchase_after_click', COUNT(*) FROM p
ORDER BY stage
"""


EVENT_PATTERN = "v[^e]*c[^e]*p"  # view → click → purchase, no error between


def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over per-user event histories — the
    MATCH_RECOGNIZE query class (neither Spark nor DuckDB has the SQL
    clause): which users performed view → later click → later purchase
    with NO error anywhere between the view and the purchase.

    Each user's history is canonicalized to a string (first letter of
    each event type — distinct across this corpus's five types — in
    (ts, event_id) order, the tie-break making both engines' orderings
    identical), then ONE codegen regexp evaluates the pattern: the
    NFA-over-sequence semantics of MATCH_RECOGNIZE reduced to the
    regex engine both systems already share. No joins, no windows — one
    aggregate + one map-side expression.

    Scale: the sequence aggregate is a map-side-combined collect per
    user; state is bounded by events-per-user (the same per-key-history
    bound every MATCH_RECOGNIZE engine carries), and the regex is a
    linear scan of that history. A pathological hot user concentrates
    in one task — the standard mitigation (split the history at
    guaranteed non-match boundaries, e.g. 'e', and match piecewise)
    composes on top without changing the aggregate shape."""
    ev = load_tables(spark, sf_dir)["events"]
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("ch"),
                        )
                    )
                ),
                lambda s: s["ch"],
            ),
        ).alias("seq")
    )
    return seq.select(
        "user_id",
        F.length("seq").alias("n_events"),
        F.regexp_like("seq", F.lit(EVENT_PATTERN)).alias("matched"),
    ).orderBy("user_id")


ORACLE_EVENT_PATTERN_MATCH = f"""
    WITH seq AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id, length(seq) AS n_events,
           regexp_matches(seq, '{EVENT_PATTERN}') AS matched
    FROM seq
    ORDER BY user_id
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users active N days after their first activity
    day, per cohort day (classic DAU-retention triangle, offsets 0-7).

    Two aggregates over the same scan (first-day per user, distinct
    active days per user) joined on user_id. The distinct() collapses
    per-day event multiplicity before the join, so the join input is
    bounded by users × days, not raw events.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    first_day = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        active.join(first_day, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_day"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


ORACLE_EVENTS_RETENTION = """
WITH firstd AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
), act AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT cohort_day, datediff('day', cohort_day, d) AS day_offset, COUNT(*) AS n_users
FROM act JOIN firstd USING (user_id)
WHERE datediff('day', cohort_day, d) <= 7
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection: per event type, z-score of each
    day's event count against that type's own daily distribution.

    The monitoring query every event pipeline runs. Counts aggregate
    map-side to (type, day) partials; the mean/stddev are unbounded
    windows over ≤ types x days rows — trivially small after the first
    aggregate no matter the raw volume. The anomaly flag tests the
    ROUNDED z on both engines so a last-ulp stddev difference cannot
    flip the boolean at the threshold.
    """
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        "n",
        F.round(
            (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w), 4
        ).alias("z"),
    )
    return scored.withColumn("is_anomaly", F.abs(F.col("z")) > 2).orderBy(
        "event_type", "day"
    )


def q_events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + LOCF: the hypertable ``time_bucket_gapfill``
    + ``locf()`` pattern. A dense user x day calendar grid is generated
    (sequence + explode — no input scan), the sparse per-user-day purchase
    aggregate is left-joined onto it, counts/revenue fill with zero, and
    the average purchase value carries forward per user with an
    ignore-nulls window (NULL until the user's first purchase).

    Scale: the raw scan collapses to (users x active days) partials before
    any wide operation; the grid is users x calendar-days — both tiny
    relative to raw events no matter the volume. One shuffle for the agg,
    one for the grid join (the 1-row bounds cross-join is a broadcast).
    Aggregates are rounded BEFORE the LOCF window on both engines so the
    carried value is bit-identical.
    """
    ev = load_tables(spark, sf_dir)["events"]
    partials = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("rev"),
            F.round(F.avg("value"), 4).alias("av"),
        )
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(partials, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n", F.lit(0)).alias("n_purchases"),
            F.coalesce("rev", F.lit(0.0)).alias("day_rev"),
            F.last("av", ignorenulls=True).over(w).alias("locf_avg"),
        )
        .orderBy("user_id", "day")
    )


ORACLE_EVENTS_GAPFILL_LOCF = """
WITH p AS (
    SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
           ROUND(SUM(value), 2) AS rev, ROUND(AVG(value), 4) AS av
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, day
), bounds AS (
    SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events
), days AS (
    SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
), grid AS (
    SELECT u.user_id, d.day
    FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN days d
)
SELECT g.user_id, g.day,
       COALESCE(p.n, 0) AS n_purchases,
       COALESCE(p.rev, 0.0) AS day_rev,
       LAST_VALUE(p.av IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_avg
FROM grid g LEFT JOIN p ON p.user_id = g.user_id AND p.day = g.day
ORDER BY g.user_id, g.day
"""


ORACLE_EVENTS_ANOMALY_ZSCORE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
    FROM events GROUP BY event_type, day
), scored AS (
    SELECT event_type, day, n,
           ROUND((n - AVG(n) OVER w) / STDDEV_SAMP(n) OVER w, 4) AS z
    FROM daily WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, day, n, z, (ABS(z) > 2) AS is_anomaly
FROM scored
ORDER BY event_type, day
"""


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each event matched to the user's NEXT purchase
    at-or-after its timestamp — the time-to-conversion / next-treatment
    lookup, the mirror the backward operator (q_asof_join) can't express.
    Same one-shuffle union-sort-window plan, with the carry direction
    reversed: ``first(build, ignorenulls)`` over the FOLLOWING frame
    (current row → unbounded following). Because the frame looks FORWARD,
    probes must sort BEFORE builds at equal ts (``is_probe`` DESC — the
    mirror of the backward join's ASC) so an at-the-same-instant build is
    inside the frame and a purchase matches itself at gap 0; equal-ts
    builds tie-break on purchase_id so both engines pick the same one.
    DuckDB's ASOF JOIN
    is backward-only, so the oracle decorrelates the forward lookup as a
    window over the identical union — same shape, independent engine.
    """
    return asof_forward_frame(load_tables(spark, sf_dir)["events"])


def asof_forward_frame(ev: DataFrame) -> DataFrame:
    """Frame-level forward as-of core (see q_asof_join_forward)."""
    w = (
        W.partitionBy("user_id")
        .orderBy(
            "ts",
            F.col("is_probe").desc(),
            F.coalesce(F.col("build.purchase_id"), F.lit(-1)),
        )
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    filled = _asof_union(ev).withColumn("m", F.first("build", ignorenulls=True).over(w))
    return (
        filled.filter((F.col("is_probe") == 1) & F.col("m").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("m.purchase_id").alias("purchase_id"),
            F.col("m.purchase_ts").alias("purchase_ts"),
            (F.unix_micros("m.purchase_ts") - F.unix_micros("ts")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


ORACLE_ASOF_JOIN_FORWARD = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
        FROM events
    ),
    pts AS (
        SELECT user_id, ts, event_id, event_type, NULL::BIGINT AS purchase_id,
               NULL::TIMESTAMP AS purchase_ts, 1 AS is_probe
        FROM ev
        UNION ALL
        SELECT user_id, ts, NULL, NULL, event_id, ts, 0
        FROM ev WHERE event_type = '{ASOF_BUILD_TYPE}'
    ),
    filled AS (
        SELECT *,
               FIRST_VALUE(purchase_id IGNORE NULLS) OVER w AS m_id,
               FIRST_VALUE(purchase_ts IGNORE NULLS) OVER w AS m_ts
        FROM pts
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY ts, is_probe DESC, COALESCE(purchase_id, -1)
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
        )
    )
    SELECT event_id, user_id, event_type,
           m_id AS purchase_id, m_ts AS purchase_ts,
           epoch_us(m_ts) - epoch_us(ts) AS gap_us
    FROM filled
    WHERE is_probe = 1 AND m_id IS NOT NULL
    ORDER BY event_id
"""


def q_conversion_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for each non-purchase event type,
    the conversion rate (did a purchase follow at all?) and the EXACT
    p50/p90 of the lag to the next purchase — the funnel-latency metric
    behind every "how long until users convert" dashboard, composed on
    the forward as-of join (one shuffle resolves every event's next
    purchase; no per-event search).

    Percentiles are rank order-statistic SELECTIONS over integer
    microsecond gaps (rank = ceil(q·n), tie-broken on event_id), so the
    whole result is exact integer/selection math — no float contract
    beyond the conversion-rate ratio. The oracle decorrelates the same
    forward lookup (DuckDB ASOF is backward-only) and selects the same
    ranks independently.
    """
    ev = load_tables(spark, sf_dir)["events"]
    converted = asof_forward_frame(ev).filter(
        F.col("event_type") != ASOF_BUILD_TYPE
    )
    counts = converted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_converted")
    )
    ranked = (
        converted.join(F.broadcast(counts), "event_type")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("event_type").orderBy("gap_us", "event_id")
            ),
        )
    )
    totals = (
        ev.filter(F.col("event_type") != ASOF_BUILD_TYPE)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    p50r = F.ceil(F.lit(0.5) * F.col("n_converted"))
    p90r = F.ceil(F.lit(0.9) * F.col("n_converted"))
    return (
        ranked.groupBy("event_type", "n_converted")
        .agg(
            F.max(F.when(F.col("rn") == p50r, F.col("gap_us"))).alias(
                "p50_gap_us"
            ),
            F.max(F.when(F.col("rn") == p90r, F.col("gap_us"))).alias(
                "p90_gap_us"
            ),
        )
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "n_total",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_total").cast("double"),
                6,
            ).alias("conv_rate"),
            "p50_gap_us",
            "p90_gap_us",
        )
        .orderBy("event_type")
    )


ORACLE_CONVERSION_LAG_PERCENTILES = f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
        FROM events
    ),
    pts AS (
        SELECT user_id, ts, event_id, event_type, NULL::BIGINT AS purchase_id,
               NULL::TIMESTAMP AS purchase_ts, 1 AS is_probe
        FROM ev
        UNION ALL
        SELECT user_id, ts, NULL, NULL, event_id, ts, 0
        FROM ev WHERE event_type = '{ASOF_BUILD_TYPE}'
    ),
    filled AS (
        SELECT *,
               FIRST_VALUE(purchase_id IGNORE NULLS) OVER w AS m_id,
               FIRST_VALUE(purchase_ts IGNORE NULLS) OVER w AS m_ts
        FROM pts
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY ts, is_probe DESC, COALESCE(purchase_id, -1)
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
        )
    ),
    conv AS (
        SELECT event_type, event_id,
               epoch_us(m_ts) - epoch_us(ts) AS gap_us
        FROM filled
        WHERE is_probe = 1 AND m_id IS NOT NULL
          AND event_type <> '{ASOF_BUILD_TYPE}'
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY gap_us, event_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_converted
        FROM conv
    ),
    tot AS (
        SELECT event_type, COUNT(*) AS n_total FROM events
        WHERE event_type <> '{ASOF_BUILD_TYPE}'
        GROUP BY event_type
    )
    SELECT r.event_type, t.n_total,
           MAX(r.n_converted) AS n_converted,
           ROUND(CAST(MAX(r.n_converted) AS DOUBLE)
                 / CAST(t.n_total AS DOUBLE), 6) AS conv_rate,
           MAX(CASE WHEN r.rn = CAST(CEIL(CAST(0.5 AS DOUBLE) * r.n_converted)
                                     AS BIGINT)
                    THEN r.gap_us END) AS p50_gap_us,
           MAX(CASE WHEN r.rn = CAST(CEIL(CAST(0.9 AS DOUBLE) * r.n_converted)
                                     AS BIGINT)
                    THEN r.gap_us END) AS p90_gap_us
    FROM ranked r JOIN tot t USING (event_type)
    GROUP BY r.event_type, t.n_total
    ORDER BY r.event_type
"""


ASOF_SALT_BUCKETS = 16


def q_asof_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened backward as-of join: identical semantics (and oracle)
    to q_asof_join, but a hot user no longer serializes into one task.

    q_asof_join partitions the probe/build union by user_id alone, so a
    user with 10^8 events lands in a single sort task. Here each user's
    timeline is range-split into ASOF_SALT_BUCKETS contiguous time
    buckets and the fill runs in two phases, the classic distributed
    prefix-scan shape:

    1. *Local fill* per (user_id, bucket) — the same ignorenulls window,
       now over at most 1/B of the hot key's rows per task.
    2. *Carry* — per (user_id, bucket) take the latest build, then a
       window over the tiny per-user bucket list (≤ B rows per user, no
       skew possible) computes each bucket's carry-in: the last build of
       any earlier bucket. A probe whose bucket-local fill found nothing
       coalesces to the carry-in.

    At 100 TB the bucket count is a knob: B ≈ (hot-key rows) /
    (target task rows). Keys too small to matter pay one extra tiny
    join, no extra shuffle of the wide data (local fill and final join
    share the (user_id, bucket) partitioning)."""
    return asof_salted_frame(
        load_tables(spark, sf_dir)["events"], n_buckets=ASOF_SALT_BUCKETS
    )


def asof_salted_frame(ev: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Frame-level salted backward as-of core (see q_asof_join_salted)."""
    u = _asof_union(ev)
    lo_hi = u.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).first()
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None:
        return _asof_project(u.withColumn("m", F.col("build")))
    width = max(1, (hi - lo) // n_buckets + 1)
    u = u.withColumn(
        "bkt", ((F.unix_micros("ts") - F.lit(lo)) / F.lit(width)).cast("long")
    )

    # Phase 1: bucket-local fill — same window as the unsalted plan but
    # partitioned by (user_id, bkt) so hot users parallelize B-ways.
    w_local = (
        W.partitionBy("user_id", "bkt")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = u.withColumn("m_local", F.last("build", ignorenulls=True).over(w_local))

    # Phase 2: per-bucket last build → carry-in per bucket. The carry
    # table has ≤ n_buckets rows per user, so its per-user window can't
    # skew regardless of how hot the key is.
    last_per_bucket = (
        u.filter(F.col("is_probe") == 0)
        .groupBy("user_id", "bkt")
        .agg(F.max(F.struct("ts", "build")).alias("mx"))
        .select("user_id", "bkt", F.col("mx.build").alias("last_build"))
    )
    buckets = u.select("user_id", "bkt").distinct()
    w_carry = (
        W.partitionBy("user_id").orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    )
    # MERGE hints (r12): both joins are keyed (user_id, bkt) and both
    # left legs arrive ALREADY hash-partitioned (and, for `local`,
    # sorted) on exactly that key from their window/groupBy — a
    # sort-merge join here plans ZERO new exchanges on the wide side.
    # Unhinted, the planner broadcast-joins instead (the small sides fit
    # its estimate), paying a single-threaded driver build per join for
    # partitioning the wide side already has. Local A/B is a wash
    # (1.52 s hinted vs 1.58 s broadcast, within noise) — kept for the
    # scale shape: the driver-built broadcast grows with |users|·B while
    # the merge path stays executor-side, and the salted bucket
    # exchange stays visible in the plan (the demo's contract).
    carry = (
        buckets.join(last_per_bucket.hint("merge"), ["user_id", "bkt"], "left")
        .withColumn("carry_in", F.last("last_build", ignorenulls=True).over(w_carry))
        .select("user_id", "bkt", "carry_in")
    )

    filled = local.join(carry.hint("merge"), ["user_id", "bkt"], "left").withColumn(
        "m", F.coalesce("m_local", "carry_in")
    )
    return _asof_project(filled)


OVERLAP_BAND_US = 3600 * 1_000_000  # sweep-line band width: 1 hour


def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: for each user's daily active interval
    [min ts, max ts], count the OTHER users whose same-day interval
    overlaps it — the concurrency/co-presence query shape (meeting
    detection, resource contention, ad co-viewership) that needs an
    interval ⋈ interval predicate, the one temporal join neither the
    as-of nor the trailing-range operator covers.

    Enumerating overlap pairs is intrinsically quadratic when intervals
    are long relative to the bucket (this corpus averages 8-active-hours
    per day: ~34 M true pairs at sf0.1), so the operator never
    materializes a pair. It counts by the sweep-line identity

        n_overlap(a) = #{s_b <= e_a} − #{e_b < s_a} − 1

    (everything that started by a's end, minus everything already over
    when a started, minus a itself). Each census is a distributed rank:
    marker and probe rows union, hash-partition on (day, hour-band),
    and a running marker count inside the band adds to a per-band
    prefix offset — the offset frame is one row per (day, band),
    cumulated with a window over the ≤24 bands of a day. No task ever
    holds a whole day (only one band's occupancy), no window spans an
    unbounded frame, shuffle volume is 2×2 rows per interval, and the
    output is one row per interval — linearithmic where the pair join
    the DuckDB oracle runs (fine at sf0.01) is quadratic.

    Tie discipline: markers sort before probes at equal timestamp for
    the <= census and after them for the strict < census, so boundary
    touches (e_a == s_b) count as overlap on both engines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    iv = (
        ev.groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.unix_micros(F.min("ts")).alias("s"), F.unix_micros(F.max("ts")).alias("e"))
    )
    return overlap_counts(iv)


def overlap_counts(iv: DataFrame) -> DataFrame:
    """Sweep-line overlap census over an intervals frame
    ``(user_id, day, s, e)`` (s/e integral, s <= e): one row per
    interval with ``n_overlap`` = # other same-day intervals it
    overlaps. See q_interval_overlap_join for the algorithm; factored
    out so tests can drive it with synthetic interval sets against a
    brute-force oracle."""

    def census(marker_col: str, probe_col: str, markers_first: bool) -> DataFrame:
        """#markers with t_marker <= t_probe (markers_first=True) or
        t_marker < t_probe (False), per probe row, keyed (user_a, day)."""
        markers = iv.select(
            "day", F.col(marker_col).alias("t"), F.lit(1).alias("is_marker"),
            F.lit(None).cast("long").alias("user_a"),
        )
        probes = iv.select(
            "day", F.col(probe_col).alias("t"), F.lit(0).alias("is_marker"),
            F.col("user_id").alias("user_a"),
        )
        pts = markers.unionAll(probes).withColumn(
            "band", F.floor(F.col("t") / OVERLAP_BAND_US)
        )
        # per-(day, band) marker totals over EVERY occupied band (marker or
        # probe — a probe band with no markers still needs the prefix of
        # the bands before it) -> exclusive prefix over the day's bands
        # (a window over <= 24 rows per day, the bounded-frame kind)
        per_band = pts.groupBy("day", "band").agg(F.sum("is_marker").alias("n_m"))
        w_day = (
            W.partitionBy("day")
            .orderBy("band")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        offsets = per_band.withColumn(
            "prev", F.coalesce(F.sum("n_m").over(w_day), F.lit(0))
        ).select("day", "band", "prev")
        # within-band running marker count; tie order encodes <= vs <
        tie = F.col("is_marker").desc() if markers_first else F.col("is_marker").asc()
        w_band = (
            W.partitionBy("day", "band")
            .orderBy(F.col("t").asc(), tie)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return (
            pts.withColumn("run", F.sum("is_marker").over(w_band))
            .filter(F.col("is_marker") == 0)
            .join(offsets, ["day", "band"], "left")
            .select(
                "user_a",
                "day",
                (F.col("run") + F.coalesce(F.col("prev"), F.lit(0))).alias("n"),
            )
        )

    started_by_end = census("s", "e", markers_first=True)  # s_b <= e_a
    ended_before_start = census("e", "s", markers_first=False)  # e_b < s_a
    return (
        started_by_end.withColumnRenamed("n", "c1")
        .join(ended_before_start.withColumnRenamed("n", "c2"), ["user_a", "day"])
        .select(
            "user_a",
            "day",
            (F.col("c1") - F.col("c2") - F.lit(1)).alias("n_overlap"),
        )
        .orderBy("user_a", "day")
    )


ORACLE_INTERVAL_OVERLAP_JOIN = """
    WITH iv AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               MIN(CAST(date_trunc('microseconds', ts) AS TIMESTAMP)) AS s,
               MAX(CAST(date_trunc('microseconds', ts) AS TIMESTAMP)) AS e
        FROM events GROUP BY user_id, day
    )
    SELECT a.user_id AS user_a, a.day AS day,
           COUNT(b.user_id) AS n_overlap
    FROM iv a LEFT JOIN iv b
      ON a.day = b.day AND a.user_id <> b.user_id
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.user_id, a.day
    ORDER BY user_a, day
"""


EWMA_SPAN = 20  # trailing window length for the half-life EWMA


def q_events_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + LINEAR interpolation: the hypertable
    ``time_bucket_gapfill`` + ``interpolate()`` pattern — the companion of
    ``q_events_gapfill_locf`` (which carries the PREVIOUS value forward,
    this one draws the line between the surrounding observations).

    A dense user x day grid is generated (sequence + explode), sparse
    per-user-day purchase averages are left-joined on, and each gap day
    gets ``prev + (next - prev) * elapsed/spanned`` from two ignore-nulls
    windows (LOCF forward for the previous observation, its mirror
    backward for the next). Days before a user's first or after their
    last observation stay NULL — interpolation only, no extrapolation.

    Scale: identical shape to the LOCF gap-fill — the raw scan collapses
    to (user x active-day) partials before anything wide; the grid is
    users x calendar-days. One shuffle for the aggregate, one for the
    grid join, one partitioned sort serving all four windows.

    Cross-engine determinism: decimal-scale ROUND(x, 4) is UNSAFE on a
    computed double (Spark's BigDecimal HALF_UP and DuckDB's scaled
    nearbyint disagree when the binary value sits a few ulp from a
    decimal midpoint — observed live at sf0.001). So the whole
    interpolation runs in an exact integer domain: observations quantize
    to e4 units (x10000), the interpolant is integer + integer * (day
    ratio) with the identical operation order on both engines, and the
    only ROUND is at scale 0 — where both engines round the exact binary
    value and cannot disagree. The final /10000.0 is one deterministic
    IEEE division.

    Reference has no temporal operators (join spec only,
    ``src/include/optimizer/join_optimizer.h:17-48``); completes SURVEY
    §2.2 temporal family.
    """
    ev = load_tables(spark, sf_dir)["events"]
    partials = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.round(F.avg("value") * 10000).cast("long").alias("av"))
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    wb = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("av").isNotNull(), F.col("day"))
    j = grid.join(partials, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "av",
        F.last("av", ignorenulls=True).over(wb).alias("prev_av"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("prev_day"),
        F.first("av", ignorenulls=True).over(wf).alias("next_av"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("next_day"),
    )
    frac = F.datediff("day", "prev_day").cast("double") / F.datediff(
        "next_day", "prev_day"
    ).cast("double")
    interp_e4 = F.when(F.col("av").isNotNull(), F.col("av")).when(
        F.col("prev_av").isNotNull() & F.col("next_av").isNotNull(),
        F.round(
            F.col("prev_av")
            + (F.col("next_av") - F.col("prev_av")).cast("double") * frac
        ).cast("long"),
    )
    return j.select(
        "user_id",
        "day",
        F.col("av").isNotNull().alias("is_observed"),
        (interp_e4.cast("double") / F.lit(10000.0)).alias("interp_av"),
    ).orderBy("user_id", "day")


ORACLE_EVENTS_RESAMPLE_INTERP = """
WITH p AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(ROUND(AVG(value) * 10000) AS BIGINT) AS av
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, day
), bounds AS (
    SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events
), days AS (
    SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
), grid AS (
    SELECT u.user_id, d.day
    FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN days d
), filled AS (
    SELECT g.user_id, g.day, p.av,
           LAST_VALUE(p.av IGNORE NULLS) OVER wb AS prev_av,
           LAST_VALUE(CASE WHEN p.av IS NOT NULL THEN g.day END IGNORE NULLS)
               OVER wb AS prev_day,
           FIRST_VALUE(p.av IGNORE NULLS) OVER wf AS next_av,
           FIRST_VALUE(CASE WHEN p.av IS NOT NULL THEN g.day END IGNORE NULLS)
               OVER wf AS next_day
    FROM grid g LEFT JOIN p ON p.user_id = g.user_id AND p.day = g.day
    WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY g.user_id ORDER BY g.day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       (av IS NOT NULL) AS is_observed,
       CAST(CASE WHEN av IS NOT NULL THEN av
            WHEN prev_av IS NOT NULL AND next_av IS NOT NULL THEN
                CAST(ROUND(prev_av + CAST(next_av - prev_av AS DOUBLE)
                      * (CAST(datediff('day', prev_day, day) AS DOUBLE)
                         / CAST(datediff('day', prev_day, next_day) AS DOUBLE)))
                     AS BIGINT)
       END AS DOUBLE) / 10000.0 AS interp_av
FROM filled
ORDER BY user_id, day
"""


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (half-life decay, trailing
    ``EWMA_SPAN`` events) of each user's purchase values — the standard
    time-series smoother (pandas ``ewm(halflife=1)``) as a distributed
    window operator.

    Plan: one shuffle on user_id, ONE partitioned sort, ONE Window
    operator — row_number and the trailing collect_list share the same
    partition+order spec so Catalyst fuses them into a single window
    pass, and the collected array is materialized into a column ONCE
    before the fold (inlining it would plan a separate collect_list
    buffer per reference — the 4×-buffer shape this round's profile
    caught). Each row then folds its trailing window with JVM
    higher-order functions (array_sort → transform → aggregate) — no
    self-join (the naive SQL is an O(span) fan-out join, which is
    exactly what the oracle does on DuckDB's side), no Python.

    Cross-engine float determinism is engineered, not hoped for: values
    quantize to integer cents and the decay is a power of TWO, so every
    term ``cents * 2^-k`` (k ≤ span-1 = 19) is an integer multiple of
    2^-19 — partial sums stay exactly representable in a double, making
    the numerator EXACT under any summation order on any engine. The
    denominator ``100 * (2 - 2^(1-n))`` is likewise exact, so est agrees
    bit-for-bit before the final ROUND.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # Both window expressions share (partitionBy user_id, orderBy ts,
    # event_id) so they land in ONE Window operator over ONE sort.
    wspec = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wspec.rowsBetween(-(EWMA_SPAN - 1), W.currentRow)
    # array_sort on (ts, event_id, cents) structs pins the fold order by
    # contract — no reliance on collect_list's frame-order behavior; the
    # array is materialized into a column ONCE so the fold below reads
    # one buffer (each inline reference would otherwise plan its own
    # collect_list + array_sort)
    windowed = base.select(
        "user_id",
        "event_id",
        F.row_number().over(wspec).alias("rn"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "cents")).over(wf)
        ).alias("_arr"),
    )
    n = F.size(F.col("_arr"))
    terms = F.transform(
        F.col("_arr"),
        lambda x, i: x["cents"].cast("double")
        * F.pow(F.lit(2.0), (i - (n - F.lit(1))).cast("double")),
    )
    num = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    den = F.lit(100.0) * (
        F.lit(2.0) - F.pow(F.lit(2.0), (F.lit(1) - n).cast("double"))
    )
    return (
        windowed.select(
            "user_id",
            "event_id",
            "rn",
            n.alias("n_window"),
            F.round(num / den, 4).alias("ewma"),
        )
        .orderBy("user_id", "rn")
    )


def q_running_balance_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped-at-zero running balance (Lindley recurrence): each user's
    credit meter — purchases grant +5, views consume −1, and the balance
    never goes below zero: ``y_i = max(0, y_{i-1} + x_i)``. The
    inventory / rate-limiter / queue-depth recurrence that LOOKS
    iterative (each row depends on the clamped previous row) and is
    usually shipped off to a per-key UDF loop.

    It isn't iterative: by the Skorokhod reflection identity,
    ``y_i = cumsum_i − min(0, running_min(cumsum_i))`` — so the whole
    operator is TWO stacked window functions over one user-partitioned
    sort: a running sum, then a running min of that sum. Pure JVM
    codegen, one shuffle, no Python, no recursion — the 100 TB plan is
    identical to the 100-row plan. Integer deltas make every value exact
    on both engines with no rounding contract.

    The oracle is DuckDB's RECURSIVE CTE stepping the textbook recurrence
    row by row — a genuinely independent formulation, so a mistake in
    the reflection identity cannot cancel out.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.when(F.col("event_type") == "purchase", F.lit(5))
            .otherwise(F.lit(-1))
            .alias("delta"),
        )
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id")),
        )
    )
    wc = (
        W.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_sum = base.withColumn("cs", F.sum("delta").over(wc))
    return (
        with_sum.withColumn(
            "balance",
            F.col("cs") - F.least(F.lit(0), F.min("cs").over(wc)),
        )
        .select("user_id", "event_id", "rn", "delta", "balance")
        .orderBy("user_id", "rn")
    )


ORACLE_RUNNING_BALANCE_CLAMPED = """
WITH RECURSIVE seq AS (
    SELECT user_id, event_id,
           CASE WHEN event_type = 'purchase' THEN 5 ELSE -1 END AS delta,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type IN ('view', 'purchase')
), bal AS (
    SELECT user_id, event_id, rn, delta,
           GREATEST(0, delta) AS balance
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.event_id, s.rn, s.delta,
           GREATEST(0, b.balance + s.delta)
    FROM bal b JOIN seq s ON s.user_id = b.user_id AND s.rn = b.rn + 1
)
SELECT user_id, event_id, rn, delta, balance FROM bal
ORDER BY user_id, rn
"""


ROLLMED_SPAN = 15  # trailing window length for the rolling median


def q_feature_assembly_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store-style POINT-IN-TIME feature assembly: for every
    training label (a purchase), the feature vector AS OF the label's
    own timestamp — trailing 7-day view count, trailing 24-hour click
    count, and the last event type strictly before the label. Computing
    features at label time (never after) is what prevents the
    train/serve leakage every feature store exists to rule out.

    Three different temporal primitives, each in its scale-correct
    plan: BOTH trailing-window counts come from ONE bucketed range join
    (the label explodes over the wider window's day buckets once,
    candidates come from an equi-join — bounded fan-out, no theta join —
    and the two window spans are conditional aggregates over the same
    joined frame; the first shipped form ran a separate range join per
    feature, a 2× corpus-join tax the round-6 profile caught); the
    last-event-before lookup is the one-shuffle union-sort-window as-of
    carry with labels sorted before same-instant events so "strictly
    earlier ts" holds exactly. The oracle decorrelates all three as
    per-label subqueries — an independent formulation of each.
    """
    ev = load_tables(spark, sf_dir)["events"]
    labels = ev.filter(F.col("event_type") == ASOF_BUILD_TYPE).select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.col("ts").alias("l_ts"),
        F.unix_micros("ts").alias("l_us"),
    )
    feats = ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("e_ts"),
        F.unix_micros("ts").alias("e_us"),
        F.to_date("ts").alias("e_day"),
    )

    # ONE bucketed range join serves both trailing features: explode
    # each label over the WIDER (7-day) bucket span, equi-join events of
    # either type, and split the two window spans as conditional counts.
    day_us = 86_400 * 1_000_000
    probes7 = labels.select(
        "label_id",
        "user_id",
        "l_us",
        F.explode(
            F.sequence(F.date_sub(F.to_date("l_ts"), 7), F.to_date("l_ts"))
        ).alias("e_day"),
    )
    counts = (
        probes7.join(
            feats.filter(F.col("event_type").isin("view", "click")),
            ["user_id", "e_day"],
        )
        .filter(
            (F.col("e_us") >= F.col("l_us") - 7 * day_us)
            & (F.col("e_us") < F.col("l_us"))
        )
        .groupBy("label_id")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias(
                "n_views_7d"
            ),
            F.count(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("e_us") >= F.col("l_us") - day_us),
                    1,
                )
            ).alias("n_clicks_24h"),
        )
    )

    # last event strictly before the label: probes sort BEFORE feeds at
    # equal ts so same-instant events are excluded; feed tie-break is
    # (ts, event_id) so the carried value is the lexicographic latest
    feed = ev.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("label_id"),
        F.struct(F.col("ts").alias("fts"), "event_id", "event_type").alias("f"),
    )
    probes = labels.select(
        "user_id",
        F.col("l_ts").alias("ts"),
        F.lit(1).alias("is_probe"),
        "label_id",
        F.lit(None)
        .cast("struct<fts:timestamp,event_id:long,event_type:string>")
        .alias("f"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("is_probe").desc(), F.col("f.event_id").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_ev = (
        feed.unionByName(probes)
        .withColumn("m", F.last("f", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("label_id", F.col("m.event_type").alias("last_event_type"))
    )

    return (
        labels.select("label_id", "user_id", "l_ts")
        .join(counts, "label_id", "left")
        .join(last_ev, "label_id", "left")
        .select(
            "label_id",
            "user_id",
            F.coalesce("n_views_7d", F.lit(0)).alias("n_views_7d"),
            F.coalesce("n_clicks_24h", F.lit(0)).alias("n_clicks_24h"),
            "last_event_type",
        )
        .orderBy("label_id")
    )


ORACLE_FEATURE_ASSEMBLY_PIT = f"""
WITH ev AS (
    SELECT event_id, user_id, event_type,
           CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
    FROM events
), labels AS (
    SELECT event_id AS label_id, user_id, ts AS l_ts
    FROM ev WHERE event_type = '{ASOF_BUILD_TYPE}'
)
SELECT l.label_id, l.user_id,
       (SELECT COUNT(*) FROM ev e
        WHERE e.user_id = l.user_id AND e.event_type = 'view'
          AND e.ts >= l.l_ts - INTERVAL 7 DAY AND e.ts < l.l_ts)
           AS n_views_7d,
       (SELECT COUNT(*) FROM ev e
        WHERE e.user_id = l.user_id AND e.event_type = 'click'
          AND e.ts >= l.l_ts - INTERVAL 1 DAY AND e.ts < l.l_ts)
           AS n_clicks_24h,
       (SELECT e.event_type FROM ev e
        WHERE e.user_id = l.user_id AND e.ts < l.l_ts
        ORDER BY e.ts DESC, e.event_id DESC LIMIT 1)
           AS last_event_type
FROM labels l
ORDER BY l.label_id
"""


HEARTBEAT_TOP_K = 5  # largest silences reported per event type


def q_heartbeat_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outage / silence detection: the TOP-K largest inter-arrival gaps
    per event type across the whole timeline — the "was the pipeline
    down?" query every ingestion SLO monitor runs (a gap an order of
    magnitude above the median inter-arrival IS the incident report).

    One shuffle on type, lag() for the previous arrival, rank-limit for
    the top-k — WindowGroupLimit keeps the per-type sort from
    materializing beyond k rows. Gaps are integer microseconds
    (exact); each row carries the silence's start/end so the report is
    directly actionable.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.lag("ts").over(w).alias("prev_ts"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    wr = W.partitionBy("event_type").orderBy(
        F.col("gap_us").desc(), F.col("event_id")
    )
    return (
        gaps.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= HEARTBEAT_TOP_K)
        .select(
            "event_type",
            "rk",
            F.col("prev_ts").alias("silence_start"),
            F.col("ts").alias("silence_end"),
            "gap_us",
        )
        .orderBy("event_type", "rk")
    )


ORACLE_HEARTBEAT_GAPS = f"""
WITH ev AS (
    SELECT event_type, event_id,
           CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
    FROM events
), gaps AS (
    SELECT event_type, ts, event_id,
           LAG(ts) OVER w AS prev_ts,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
    FROM ev
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY gap_us DESC, event_id
       ) AS rk,
       prev_ts AS silence_start,
       ts AS silence_end,
       gap_us
FROM gaps
WHERE gap_us IS NOT NULL
QUALIFY rk <= {HEARTBEAT_TOP_K}
ORDER BY event_type, rk
"""


def q_events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality fingerprint: the day-of-week × hour activity grid per
    event type, each cell with its share of the type's total and a flag
    on the type's single busiest cell — the load-shape profile behind
    capacity planning and anomaly baselines ("is Tuesday 9am ALWAYS the
    peak?").

    One grouped count (map-side combined; the grid is ≤ 7×24×types rows
    after the first aggregate regardless of volume), shares against a
    window total, peak via a count-desc rank with (dow, hour)
    tie-break. Spark's dayofweek is Sunday=1; the oracle shifts DuckDB's
    Sunday=0 to match (the q_functions_datetime convention).
    """
    ev = load_tables(spark, sf_dir)["events"]
    cells = ev.groupBy(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = W.partitionBy("event_type")
    wr = W.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("dow"), F.col("hour")
    )
    return (
        cells.withColumn(
            "share",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(wt).cast("double"),
                6,
            ),
        )
        .withColumn("is_peak", F.row_number().over(wr) == 1)
        .orderBy("event_type", "dow", "hour")
    )


ORACLE_EVENTS_DOW_HOUR_PROFILE = """
WITH cells AS (
    SELECT event_type,
           CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type, dow, hour
)
SELECT event_type, dow, hour, n,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE), 6)
           AS share,
       (ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY n DESC, dow, hour
        ) = 1) AS is_peak
FROM cells
ORDER BY event_type, dow, hour
"""


def q_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day) — the TWAP/TVWAP
    pattern for IRREGULARLY sampled series (finance bars, IoT sensor
    states): each observation holds until the next one, so its weight is
    its holding duration, not 1. A plain AVG over-weights bursts; the
    time weighting is what makes state-style series (prices, sensor
    readings) aggregate correctly.

    One shuffle on user, lead() for the holding duration, map-side
    grouped sums. Exactness engineered end to end: cents x whole-second
    durations are integer products ≤ 2^53, so numerator and denominator
    are EXACT on both engines and the final quotient is a bit-identical
    double — emitted unrounded (no rounding contract needed at all; a
    decimal ROUND here would reintroduce the midpoint-flip risk the e4
    lesson documents). The last observation of a day has no successor
    and carries zero weight on both engines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    base = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_timestamp("ts").alias("sec"),
    ).withColumn("dur_s", F.lead("sec").over(w) - F.col("sec"))
    return (
        base.filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("dur_s").alias("span_s"),
            F.sum(F.col("cents") * F.col("dur_s")).alias("wsum"),
        )
        .select(
            "user_id",
            "day",
            "n_obs",
            "span_s",
            (
                F.col("wsum").cast("double")
                / (F.lit(100.0) * F.col("span_s").cast("double"))
            ).alias("twap"),
        )
        .orderBy("user_id", "day")
    )


ORACLE_TWAP_DAILY = """
WITH base AS (
    SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS sec
    FROM events
), with_dur AS (
    SELECT *, LEAD(sec) OVER (
        PARTITION BY user_id, day ORDER BY ts, event_id
    ) - sec AS dur_s
    FROM base
)
SELECT user_id, day,
       COUNT(*) AS n_obs,
       CAST(SUM(dur_s) AS BIGINT) AS span_s,
       CAST(SUM(cents * dur_s) AS DOUBLE)
           / (100.0 * CAST(SUM(dur_s) AS DOUBLE)) AS twap
FROM with_dur
WHERE dur_s IS NOT NULL AND dur_s > 0
GROUP BY user_id, day
ORDER BY user_id, day
"""


NEYMAN_BUDGET = 1000  # total sample budget to allocate


def q_stratified_neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation for stratified sampling: given a total
    budget of NEYMAN_BUDGET samples over the event-type strata, allocate
    n_h ∝ N_h·S_h (stratum size x stratum standard deviation) — the
    variance-minimizing design, and the principled version of the flat
    per-stratum quotas ad-hoc samplers use. Emits each stratum's share
    and floor allocation; the companion of `sample_stratified` (which
    executes a design) — this computes the design.

    One pass: per-stratum (N_h, S_h) are mergeable moment aggregates;
    the normalizer is a broadcast 1-row sum. S_h rounds to 6 dp before
    the ratio so both engines normalize identical values.
    """
    ev = load_tables(spark, sf_dir)["events"]
    strata = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.round(F.stddev_samp("value"), 6).alias("s_h"),
    )
    weighted = strata.withColumn(
        "w_h", F.col("n_h").cast("double") * F.col("s_h")
    )
    total = weighted.agg(F.sum("w_h").alias("w_tot"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n_h",
            "s_h",
            F.round(F.col("w_h") / F.col("w_tot"), 6).alias("share"),
            F.floor(
                F.lit(float(NEYMAN_BUDGET)) * F.col("w_h") / F.col("w_tot")
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy("event_type")
    )


ORACLE_STRATIFIED_NEYMAN_ALLOC = f"""
WITH strata AS (
    SELECT event_type, COUNT(*) AS n_h,
           ROUND(STDDEV_SAMP(value), 6) AS s_h
    FROM events GROUP BY event_type
), weighted AS (
    SELECT *, CAST(n_h AS DOUBLE) * s_h AS w_h FROM strata
), total AS (
    SELECT SUM(w_h) AS w_tot FROM weighted
)
SELECT event_type, n_h, s_h,
       ROUND(w_h / w_tot, 6) AS share,
       CAST(FLOOR(CAST({NEYMAN_BUDGET} AS DOUBLE) * w_h / w_tot) AS BIGINT)
           AS alloc
FROM weighted, total
ORDER BY event_type
"""


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per user, Recency (days since last
    purchase, vs the corpus max day), Frequency (purchase count) and
    Monetary (exact cents), each scored into quintiles, concatenated
    into the classic 3-digit segment code — the standard marketing /
    churn-risk segmentation.

    Scale shape: the event scan collapses to one row per user before
    anything wide; each quintile is an EXACT NTILE(5) computed WITHOUT a
    single-partition window — a distributed range-partitioned row_number
    per axis (``relational.distributed_row_number``: driver quantile
    cuts → parallel partition-local numbering + an n_parts-row broadcast
    offset table) followed by ``exact_ntile``'s closed-form integer
    bucket arithmetic on (rank, N). Users is unbounded at 100 TB, so the
    per-user frame never funnels through one task. Ties break on user_id
    so quintile boundaries are deterministic; monetary sums integer
    cents, so no float noise reaches the ordering.
    """
    from .relational import distributed_row_number, exact_ntile, range_bucket

    ev = load_tables(spark, sf_dir)["events"]
    maxd = ev.agg(F.max(F.to_date("ts")).alias("maxd"))
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "user_id",
            F.datediff("maxd", "last_day").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        # localCheckpoint, not persist: eagerly materialized once for the
        # three rank branches, and reclaimed by the ContextCleaner when
        # the frame goes out of scope (persist would pin executor storage
        # for the rest of the session)
        .localCheckpoint()
    )
    n_parts = 8
    # quintile 1 = best on every axis (most recent / most frequent / biggest)
    axes = [
        ("r_q", "recency_days", False),
        ("f_q", "frequency", True),
        ("m_q", "monetary_cents", True),
    ]
    out = per_user
    for q_col, key, desc in axes:
        order = [F.col(key).desc() if desc else F.col(key).asc(), F.col("user_id")]
        ranked, n = distributed_row_number(
            per_user.select("user_id", key),
            order,
            range_bucket(per_user, key, n_parts, descending=desc),
            n_parts,
            rn_col="_rn",
            return_total=True,
        )
        quint = ranked.select(
            "user_id", exact_ntile("_rn", n, 5).alias(q_col)
        )
        out = out.join(quint, "user_id")
    return (
        out.select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary_cents",
            "r_q",
            "f_q",
            "m_q",
            F.concat_ws("", "r_q", "f_q", "m_q").alias("segment"),
        )
        .orderBy("user_id")
    )


ORACLE_RFM_SEGMENTATION = """
WITH per_user AS (
    SELECT user_id,
           datediff('day', MAX(CAST(ts AS DATE)),
                    (SELECT MAX(CAST(ts AS DATE)) FROM events)) AS recency_days,
           COUNT(*) AS frequency,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary_cents,
       NTILE(5) OVER (ORDER BY recency_days ASC, user_id) AS r_q,
       NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_q,
       NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m_q,
       CONCAT(NTILE(5) OVER (ORDER BY recency_days ASC, user_id),
              NTILE(5) OVER (ORDER BY frequency DESC, user_id),
              NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id)) AS segment
FROM per_user
ORDER BY user_id
"""


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: users cohorted by first-seen day,
    cumulative per-user purchase revenue by day offset — the
    money-denominated companion of ``q_events_retention`` (which counts
    active users). Revenue accumulates in integer cents so the running
    sums are exact; the cumulative window runs over the (cohorts x
    offsets) aggregate, never raw events.
    """
    ev = load_tables(spark, sf_dir)["events"]
    first_day = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .join(first_day, "user_id")
        .filter(F.datediff("day", "cohort_day") <= 7)
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(
            F.sum("cents").alias("day_cents"),
            F.count_distinct("user_id").alias("n_buyers"),
        )
    )
    wc = (
        W.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cohort_size = first_day.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    return (
        rev.withColumn("cum_cents", F.sum("day_cents").over(wc))
        .join(F.broadcast(cohort_size), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_buyers",
            "day_cents",
            "cum_cents",
            F.round(
                F.col("cum_cents").cast("double")
                / F.lit(100.0)
                / F.col("cohort_users").cast("double"),
                6,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_day", "day_offset")
    )


ORACLE_COHORT_LTV = """
WITH firstd AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
    GROUP BY user_id
), sizes AS (
    SELECT cohort_day, COUNT(*) AS cohort_users FROM firstd GROUP BY cohort_day
), rev AS (
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS day_cents,
           COUNT(DISTINCT e.user_id) AS n_buyers
    FROM events e JOIN firstd f USING (user_id)
    WHERE e.event_type = 'purchase'
      AND datediff('day', f.cohort_day, CAST(e.ts AS DATE)) <= 7
    GROUP BY f.cohort_day, day_offset
)
SELECT r.cohort_day, r.day_offset, r.n_buyers, r.day_cents,
       CAST(SUM(r.day_cents) OVER (
           PARTITION BY r.cohort_day ORDER BY r.day_offset
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_cents,
       ROUND(CAST(SUM(r.day_cents) OVER (
                 PARTITION BY r.cohort_day ORDER BY r.day_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE) / 100.0 / CAST(s.cohort_users AS DOUBLE), 6)
           AS ltv_per_user
FROM rev r JOIN sizes s USING (cohort_day)
ORDER BY r.cohort_day, r.day_offset
"""


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median (trailing ``ROLLMED_SPAN`` events) of each
    user's purchase values — the robust companion of ``q_ewma_smooth``
    (a median shrugs off the outlier spike that drags a mean).

    Spark has no percentile-over-window builtin; the operator collects
    the trailing frame into an array and SELECTS the middle element
    (array_sort + element_at — discrete median, rank ceil(n/2)), all JVM
    higher-order functions. Selection is arithmetic-free: the answer is
    an input VALUE, not a computed float, so cross-engine agreement is
    exact with no rounding contract at all. Same one-shuffle plan as the
    EWMA: partition by user, one sort, per-row O(span log span) work.

    The oracle decorrelates via a fan-out self-join + per-group discrete
    quantile — an independent formulation of the same selection.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id")),
        )
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(-(ROLLMED_SPAN - 1), W.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(wf))
    n = F.size(arr)
    # element_at is 1-based; discrete median = rank ceil(n/2)
    med = F.element_at(arr, ((n + F.lit(1)) / F.lit(2)).cast("int"))
    return (
        base.select(
            "user_id",
            "event_id",
            "rn",
            n.alias("n_window"),
            med.alias("rolling_median"),
        )
        .orderBy("user_id", "rn")
    )


ORACLE_ROLLING_MEDIAN = f"""
WITH seq AS (
    SELECT user_id, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'purchase'
)
SELECT a.user_id, a.event_id, a.rn,
       CAST(COUNT(*) AS INT) AS n_window,
       quantile_disc(b.value, 0.5) AS rolling_median
FROM seq a JOIN seq b
  ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - {ROLLMED_SPAN - 1} AND a.rn
GROUP BY a.user_id, a.event_id, a.rn
ORDER BY a.user_id, a.rn
"""


ORACLE_EWMA_SMOOTH = f"""
WITH seq AS (
    SELECT user_id, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = 'purchase'
)
SELECT a.user_id, a.event_id, a.rn,
       CAST(LEAST(a.rn, {EWMA_SPAN}) AS INT) AS n_window,
       ROUND(SUM(CAST(b.cents AS DOUBLE) * POW(2.0, CAST(b.rn - a.rn AS DOUBLE)))
             / (100.0 * (2.0 - POW(2.0,
                    CAST(1 - LEAST(a.rn, {EWMA_SPAN}) AS DOUBLE)))), 4) AS ewma
FROM seq a JOIN seq b
  ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - {EWMA_SPAN - 1} AND a.rn
GROUP BY a.user_id, a.event_id, a.rn
ORDER BY a.user_id, a.rn
"""


COVERAGE_SPAN_US = 300 * 1_000_000  # each event covers [ts, ts+5min)


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals coverage per user: every event covers a 5-minute
    window; overlapping windows MERGE, and the answer is each user's
    total covered time and number of disjoint activity islands — the
    billing/uptime/exposure quantity (machine-on time, ad exposure,
    on-call coverage) that naive SUM(span) double-counts whenever
    activity bursts overlap. Complements ``q_interval_overlap_join``
    (who overlaps whom) with how-much-is-covered.

    Gaps-and-islands, all JVM: a new island starts where the event's
    start exceeds the running max of prior ends (one user-partitioned
    window — bounded by a user's history, never corpus-global); the
    island id is the running sum of those flags; two aggregates collapse
    islands to (start, max end) and users to totals. Arithmetic is
    exact integer microseconds end to end (unix_micros ↔ epoch_us), so
    the hashes cannot drift.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(COVERAGE_SPAN_US)).alias("e"),
    )
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    flagged = base.withColumn(
        "new_isl",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    ).withColumn(
        "isl", F.sum("new_isl").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    islands = flagged.groupBy("user_id", "isl").agg(
        F.min("s").alias("st"),
        F.max("e").alias("en"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("n_ev").alias("n_events"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("en") - F.col("st")).alias("covered_us"),
        )
        .orderBy("user_id")
    )


ORACLE_INTERVAL_COVERAGE = f"""
WITH base AS (
    SELECT user_id, event_id, epoch_us(ts) AS s,
           epoch_us(ts) + {COVERAGE_SPAN_US} AS e
    FROM events
), flagged AS (
    SELECT user_id, event_id, s, e,
           CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), -1) THEN 1 ELSE 0 END AS new_isl
    FROM base
), islanded AS (
    SELECT user_id, s, e,
           SUM(new_isl) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS isl
    FROM flagged
), islands AS (
    SELECT user_id, isl, MIN(s) AS st, MAX(e) AS en,
           CAST(COUNT(*) AS BIGINT) AS n_ev
    FROM islanded GROUP BY user_id, isl
)
SELECT user_id,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(en - st) AS BIGINT) AS covered_us
FROM islands
GROUP BY user_id
ORDER BY user_id
"""


CUSUM_BASELINE_DAYS = 14  # reference window the shift is measured against
CUSUM_H_NUM = 2  # alarm threshold = H_NUM x baseline-day sum (scaled units)


def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM mean-shift detector over each event type's daily
    volume — the sequential monitoring statistic (Page's test) behind
    data-drift pagers: s_i = max(0, s_{i-1} + (x_i − target − slack)),
    alarm when s crosses h. The per-series report gives the max
    statistic, alarm-day count, and FIRST alarm day (the detection
    latency a monitoring SLA cares about).

    Exact integer arithmetic throughout: work in day-count × BASELINE
    units (x'_i = B·count_i − base_sum − slack), so the clamped
    recurrence needs no floats. The recurrence itself is NOT iterated:
    by the same Skorokhod reflection identity as
    ``q_running_balance_clamped``, s_i = cum_i − min(0, runmin(cum_i))
    — two stacked windows over the per-(type, day) aggregate, which is
    |types|×|days| rows, never raw events. The oracle steps the textbook
    recurrence row by row in a RECURSIVE CTE — an independent
    formulation, so a mistake in the reflection identity cannot cancel.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_ord = W.partitionBy("event_type").orderBy("day")
    rn = F.row_number().over(w_ord)
    daily = daily.withColumn("rn", rn)
    base = (
        daily.filter(F.col("rn") <= CUSUM_BASELINE_DAYS)
        .groupBy("event_type")
        .agg(F.sum("n").alias("base_sum"))
    )
    d = daily.join(base, "event_type").withColumn(
        "delta",
        F.lit(CUSUM_BASELINE_DAYS) * F.col("n")
        - F.col("base_sum")
        - F.expr("base_sum DIV 28"),  # integer floor div, never a double
    )
    cum = F.sum("delta").over(
        w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runmin = F.min("cum").over(
        w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    scored = (
        d.withColumn("cum", cum)
        .withColumn("s", F.col("cum") - F.least(F.lit(0), runmin))
        .withColumn(
            "alarm", F.col("s") > F.lit(CUSUM_H_NUM) * F.col("base_sum")
        )
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.max("s").alias("max_stat"),
            F.sum(F.col("alarm").cast("long")).alias("n_alarm_days"),
            F.min(F.when(F.col("alarm"), F.col("day"))).alias(
                "first_alarm_day"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_CUSUM_CHANGEPOINT = f"""
WITH RECURSIVE daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY CAST(ts AS DATE)
           ) AS rn
    FROM events GROUP BY event_type, CAST(ts AS DATE)
), base AS (
    SELECT event_type, CAST(SUM(n) AS BIGINT) AS base_sum
    FROM daily WHERE rn <= {CUSUM_BASELINE_DAYS} GROUP BY event_type
), d AS (
    SELECT daily.event_type, day, rn,
           {CUSUM_BASELINE_DAYS} * n - base_sum
               - CAST(base_sum // 28 AS BIGINT) AS delta,
           base_sum
    FROM daily JOIN base ON daily.event_type = base.event_type
), walk(event_type, rn, day, s, base_sum) AS (
    SELECT event_type, rn, day, GREATEST(0, delta), base_sum
    FROM d WHERE rn = 1
    UNION ALL
    SELECT d.event_type, d.rn, d.day, GREATEST(0, w.s + d.delta), d.base_sum
    FROM walk w JOIN d
      ON d.event_type = w.event_type AND d.rn = w.rn + 1
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(s) AS BIGINT) AS max_stat,
       CAST(SUM(CASE WHEN s > {CUSUM_H_NUM} * base_sum THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarm_days,
       MIN(CASE WHEN s > {CUSUM_H_NUM} * base_sum THEN day END)
           AS first_alarm_day
FROM walk
GROUP BY event_type
ORDER BY event_type
"""


SNAIVE_SEASON = 7  # seasonal-naive lag (weekly)


def q_forecast_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the seasonal-naive forecaster
    (ŷ_t = y_{t−7}) over each event type's daily volume — the baseline
    every forecasting pipeline must beat, and the evaluation harness
    that proves it: per series, MAE and bias in exact event counts and
    sMAPE as the scale-free score. Companion of ``q_trend_per_group``
    (fit) and ``q_cusum_changepoint`` (drift): fit / monitor / backtest
    is the full forecasting loop.

    Scale shape: the event scan collapses to (type, day) counts first;
    the lag-7 forecast is one window over that tiny frame (partitioned
    by type — bounded by series length); errors aggregate map-side.
    |y−ŷ| sums are exact integers; sMAPE terms are single IEEE
    divisions of exact ints summed per series then divided by the
    horizon count — deterministic to the last bit given identical
    addition order, so the oracle mirrors the same per-day term list
    and both engines sum in day order via list aggregation… avoided
    entirely: sMAPE is emitted as the SUM of 6-dp-ROUNDED per-day terms
    scaled to integer micro-units, so the cross-engine sum is an exact
    integer no matter the order.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w = W.partitionBy("event_type").orderBy("day")
    scored = (
        daily.withColumn("yhat", F.lag("y", SNAIVE_SEASON).over(w))
        .filter(F.col("yhat").isNotNull())
        .withColumn("abs_err", F.abs(F.col("y") - F.col("yhat")))
        .withColumn(
            # 2|y-ŷ|/(y+ŷ) rounded to 6dp then scaled to exact micro-units
            "smape_micro",
            F.round(
                F.round(
                    F.lit(2.0) * F.col("abs_err").cast("double")
                    / (F.col("y") + F.col("yhat")).cast("double"),
                    6,
                )
                * F.lit(1000000.0)
            ).cast("long"),
        )
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_forecasts"),
            F.sum("abs_err").alias("sum_abs_err"),
            F.sum(F.col("y") - F.col("yhat")).alias("sum_bias"),
            F.sum("smape_micro").alias("sum_smape_micro"),
        )
        .orderBy("event_type")
    )


ORACLE_FORECAST_BACKTEST_SNAIVE = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY event_type, CAST(ts AS DATE)
), scored AS (
    SELECT event_type, y,
           LAG(y, {SNAIVE_SEASON}) OVER (
               PARTITION BY event_type ORDER BY day
           ) AS yhat
    FROM daily
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_forecasts,
       CAST(SUM(ABS(y - yhat)) AS BIGINT) AS sum_abs_err,
       CAST(SUM(y - yhat) AS BIGINT) AS sum_bias,
       CAST(SUM(CAST(ROUND(ROUND(2.0 * CAST(ABS(y - yhat) AS DOUBLE)
                                 / CAST(y + yhat AS DOUBLE), 6)
                           * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sum_smape_micro
FROM scored
WHERE yhat IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


DECOMP_PERIOD = 7  # weekly seasonality for the additive decomposition


def _seasonal_frame(ev: DataFrame) -> DataFrame:
    """Shared exact-integer decomposition frame: per (event_type, day) the
    daily cents, the centered 7-day window sum (NULL unless the window is
    full), the ×7 deviation, and the day-of-week seasonal numerator/
    denominator joined back by broadcast. All columns exact integers;
    consumers derive trend/seasonal/residual as IEEE divisions."""
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("amt"))
        .withColumn("cents", (F.col("amt") * 100).cast("long"))
        .drop("amt")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(DECOMP_PERIOD // 2), DECOMP_PERIOD // 2)
    )
    trended = (
        daily.withColumn("sum7", F.sum("cents").over(w))
        .withColumn("n7", F.count(F.lit(1)).over(w))
        .withColumn(
            "sum7",
            F.when(F.col("n7") == DECOMP_PERIOD, F.col("sum7")),
        )
        .withColumn(
            "dev7", F.lit(DECOMP_PERIOD) * F.col("cents") - F.col("sum7")
        )
        .withColumn("dow", F.dayofweek("day"))
    )
    seasonal = (
        trended.filter(F.col("dev7").isNotNull())
        .groupBy("event_type", "dow")
        .agg(
            F.sum("dev7").alias("sdev7"),
            F.count(F.lit(1)).alias("ndev"),
        )
    )
    return trended.join(F.broadcast(seasonal), ["event_type", "dow"], "left")


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (trend + seasonal +
    residual) of each event type's daily spend series — the moving-
    average method of Kendall/Stuart that STL generalizes. Trend is the
    centered 7-day moving average (emitted only where the full window
    exists), seasonal is the day-of-week mean deviation from trend, and
    the residual is what's left. Companion of
    ``q_forecast_backtest_snaive`` (which assumes the weekly season this
    query extracts) and ``q_events_dow_hour_profile`` (the finer grid).

    Cross-engine determinism with NO rounding: the daily series is
    exact integer cents (DECIMAL sum of ``value``); the trend numerator
    is an exact 7-day integer sum; deviations are computed ×7 so they
    stay integers (dev7 = 7·cents − sum7); the day-of-week seasonal
    numerator/denominator are exact integer sums. Every emitted double
    is a single IEEE division (or subtraction of two such divisions) of
    exact integers — bit-identical on both engines.

    Scale shape: the raw scan collapses to (type, day) partial-agg
    cells first, so every window below is partitioned by event_type and
    bounded by the series length (calendar days), never by table rows;
    the 7×types seasonal-index frame joins back via broadcast.
    """
    out = _seasonal_frame(load_tables(spark, sf_dir)["events"])
    seas = F.col("sdev7").cast("double") / (
        F.lit(float(DECOMP_PERIOD)) * F.col("ndev").cast("double")
    )
    trend = F.col("sum7").cast("double") / F.lit(float(DECOMP_PERIOD))
    resid = F.col("dev7").cast("double") / F.lit(float(DECOMP_PERIOD)) - seas
    return out.select(
        "event_type",
        "day",
        "cents",
        trend.alias("trend"),
        seas.alias("seasonal"),
        resid.alias("residual"),
    ).orderBy("event_type", "day")


ORACLE_SEASONAL_DECOMPOSE = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
    FROM events GROUP BY event_type, CAST(ts AS DATE)
), trended AS (
    SELECT event_type, day, cents,
           CASE WHEN COUNT(*) OVER w = {DECOMP_PERIOD}
                THEN CAST(SUM(cents) OVER w AS BIGINT) END AS sum7,
           CAST(dayofweek(day) + 1 AS INT) AS dow
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN {DECOMP_PERIOD // 2} PRECEDING
                          AND {DECOMP_PERIOD // 2} FOLLOWING)
), devs AS (
    SELECT *, {DECOMP_PERIOD} * cents - sum7 AS dev7 FROM trended
), seasonal AS (
    SELECT event_type, dow,
           CAST(SUM(dev7) AS BIGINT) AS sdev7,
           CAST(COUNT(*) AS BIGINT) AS ndev
    FROM devs WHERE dev7 IS NOT NULL
    GROUP BY event_type, dow
)
SELECT d.event_type, d.day, d.cents,
       CAST(d.sum7 AS DOUBLE) / {float(DECOMP_PERIOD)} AS trend,
       CAST(s.sdev7 AS DOUBLE)
           / ({float(DECOMP_PERIOD)} * CAST(s.ndev AS DOUBLE)) AS seasonal,
       CAST(d.dev7 AS DOUBLE) / {float(DECOMP_PERIOD)}
           - CAST(s.sdev7 AS DOUBLE)
             / ({float(DECOMP_PERIOD)} * CAST(s.ndev AS DOUBLE)) AS residual
FROM devs d LEFT JOIN seasonal s
  ON d.event_type = s.event_type AND d.dow = s.dow
ORDER BY d.event_type, d.day
"""


ANOM_K = 3  # MAD multiplier for the anomaly threshold


def q_seasonal_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: days whose DECOMPOSITION
    RESIDUAL (observed − trend − day-of-week seasonal, from
    ``_seasonal_frame``) deviates from the series' median residual by
    more than 3× the residual MAD — the robust upgrade of
    ``q_events_anomaly_zscore`` that stops flagging every Saturday just
    for being a Saturday. Composition proof for the decomposition: the
    same exact-integer frame feeds both queries.

    Determinism: residuals are IEEE expressions of exact integers
    (bit-identical both engines); median and MAD are SELECTED (lower
    median) from the per-series sorted residual array, never averaged;
    the flag compares those identical doubles. Emits only flagged rows.

    Scale shape: everything after the (type, day) aggregate runs on
    one row per series via JVM array lambdas (bounded by calendar
    days); windows partition by event_type. No Python, no global sort.
    """
    frame = _seasonal_frame(load_tables(spark, sf_dir)["events"])
    resid = (
        F.col("dev7").cast("double") / F.lit(float(DECOMP_PERIOD))
        - F.col("sdev7").cast("double")
        / (F.lit(float(DECOMP_PERIOD)) * F.col("ndev").cast("double"))
    )
    scored = frame.filter(F.col("sum7").isNotNull()).select(
        "event_type", "day", "cents", resid.alias("resid")
    )
    per_series = scored.groupBy("event_type").agg(
        F.array_sort(F.collect_list("resid")).alias("rs")
    )
    lower_med = F.element_at(
        "rs", F.expr("CAST((size(rs) + 1) DIV 2 AS INT)")
    )
    meds = per_series.withColumn("med", lower_med).select(
        "event_type", "med", "rs"
    )
    mad = meds.withColumn(
        "ads", F.array_sort(F.transform("rs", lambda r: F.abs(r - F.col("med"))))
    ).select(
        "event_type",
        "med",
        F.element_at(
            "ads", F.expr("CAST((size(ads) + 1) DIV 2 AS INT)")
        ).alias("mad"),
    )
    return (
        scored.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("resid") - F.col("med")) > F.lit(float(ANOM_K)) * F.col("mad"))
        .select("event_type", "day", "cents", "resid", "med", "mad")
        .orderBy("event_type", "day")
    )


ORACLE_SEASONAL_ANOMALY_FLAGS = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
    FROM events GROUP BY event_type, CAST(ts AS DATE)
), trended AS (
    SELECT event_type, day, cents,
           CASE WHEN COUNT(*) OVER w = {DECOMP_PERIOD}
                THEN CAST(SUM(cents) OVER w AS BIGINT) END AS sum7,
           CAST(dayofweek(day) + 1 AS INT) AS dow
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN {DECOMP_PERIOD // 2} PRECEDING
                          AND {DECOMP_PERIOD // 2} FOLLOWING)
), devs AS (
    SELECT *, {DECOMP_PERIOD} * cents - sum7 AS dev7 FROM trended
), seasonal AS (
    SELECT event_type, dow,
           CAST(SUM(dev7) AS BIGINT) AS sdev7,
           CAST(COUNT(*) AS BIGINT) AS ndev
    FROM devs WHERE dev7 IS NOT NULL
    GROUP BY event_type, dow
), scored AS (
    SELECT d.event_type, d.day, d.cents,
           CAST(d.dev7 AS DOUBLE) / {float(DECOMP_PERIOD)}
               - CAST(s.sdev7 AS DOUBLE)
                 / ({float(DECOMP_PERIOD)} * CAST(s.ndev AS DOUBLE)) AS resid
    FROM devs d JOIN seasonal s
      ON d.event_type = s.event_type AND d.dow = s.dow
    WHERE d.sum7 IS NOT NULL
), stats AS (
    SELECT event_type,
           rs[CAST((len(rs) + 1) // 2 AS INT)] AS med,
           rs
    FROM (SELECT event_type, list_sort(list(resid)) AS rs
          FROM scored GROUP BY event_type)
), mads AS (
    SELECT event_type, med,
           ads[CAST((len(ads) + 1) // 2 AS INT)] AS mad
    FROM (SELECT event_type, med,
                 list_sort(list_transform(rs, r -> abs(r - med))) AS ads
          FROM stats)
)
SELECT sc.event_type, sc.day, sc.cents, sc.resid, m.med, m.mad
FROM scored sc JOIN mads m ON sc.event_type = m.event_type
WHERE abs(sc.resid - m.med) > {float(ANOM_K)} * m.mad
ORDER BY sc.event_type, sc.day
"""


def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier repeat-purchase survival curve per market segment:
    for each customer, the duration from first to second order (event)
    or to the dataset's last order date (right-censored); the KM
    estimator S(t) = Π_{{t'≤t}} (1 − d_t'/n_t') over event times, with
    the at-risk count n and event count d emitted exactly. The workhorse
    of churn/time-to-conversion analysis, absent from both engines as a
    built-in.

    Determinism: n_risk and n_event are exact integers (at-risk via
    total − cumulative-exits window, no self-join). The survival value
    is exp(Σ ln((n−d)/n)) — transcendental, so it is ROUNDed to 6dp on
    both sides; the exact-integer columns carry the hash-strength
    evidence while the rounded curve is the human-facing output.

    Scale shape: orders collapse to one row per customer (first/second
    order dates) in one grouped agg, then to one row per (segment,
    duration) — the window frames below are bounded by the calendar
    span in days per segment, not by customer count; the curve is
    partitioned per segment (no global single-partition window).
    """
    t = load_tables(spark, sf_dir)
    # Second-order date WITHOUT a per-customer collect_list (unbounded
    # at scale): min order date per customer, broadcast back, then the
    # conditional min of dates strictly after it.
    second = (
        t["orders"]
        .alias("o")
        .join(
            F.broadcast(
                t["orders"].groupBy("o_custkey").agg(F.min("o_orderdate").alias("t0"))
            ).alias("f"),
            "o_custkey",
        )
        .groupBy("o_custkey", "t0")
        .agg(
            F.min(
                F.when(F.col("o_orderdate") > F.col("t0"), F.col("o_orderdate"))
            ).alias("t1")
        )
    )
    tmax = t["orders"].agg(F.max("o_orderdate").alias("tmax"))
    subjects = (
        second.crossJoin(F.broadcast(tmax))
        .join(
            F.broadcast(
                t["customer"].select("c_custkey", "c_mktsegment")
            ),
            second.o_custkey == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            F.when(
                F.col("t1").isNotNull(), F.datediff("t1", "t0")
            ).otherwise(F.datediff("tmax", "t0")).alias("dur"),
            F.col("t1").isNotNull().cast("long").alias("event"),
        )
    )
    by_t = subjects.groupBy("c_mktsegment", "dur").agg(
        F.count(F.lit(1)).alias("n_exit"),
        F.sum("event").alias("n_event"),
    )
    wseg = W.partitionBy("c_mktsegment").orderBy("dur")
    curve = (
        by_t.withColumn(
            "n_risk",
            F.sum("n_exit").over(
                W.partitionBy("c_mktsegment")
            )
            - F.coalesce(
                F.sum("n_exit").over(wseg.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "lnterm",
            F.when(
                (F.col("n_event") > 0) & (F.col("n_event") < F.col("n_risk")),
                F.log(
                    (F.col("n_risk") - F.col("n_event")).cast("double")
                    / F.col("n_risk").cast("double")
                ),
            ).otherwise(F.lit(0.0)),
        )
        # once n_event == n_risk the curve is exactly 0 from that t on;
        # carried as a cumulative flag so no engine takes ln(0).
        .withColumn(
            "hit_zero",
            F.max((F.col("n_event") == F.col("n_risk")).cast("int")).over(
                wseg.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "survival",
            F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
                F.round(
                    F.exp(
                        F.sum("lnterm").over(
                            wseg.rowsBetween(W.unboundedPreceding, 0)
                        )
                    ),
                    6,
                )
            ),
        )
    )
    return (
        curve.filter(F.col("n_event") > 0)
        .select(
            "c_mktsegment",
            F.col("dur").cast("int").alias("dur_days"),
            "n_risk",
            "n_event",
            "survival",
        )
        .orderBy("c_mktsegment", "dur_days")
    )


ORACLE_SURVIVAL_KM = """
WITH firsts AS (
    SELECT o_custkey, MIN(o_orderdate) AS t0 FROM orders GROUP BY o_custkey
), seconds AS (
    SELECT o.o_custkey, f.t0,
           MIN(CASE WHEN o.o_orderdate > f.t0 THEN o.o_orderdate END) AS t1
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY o.o_custkey, f.t0
), subjects AS (
    SELECT c.c_mktsegment,
           CASE WHEN s.t1 IS NOT NULL
                THEN date_diff('day', s.t0, s.t1)
                ELSE date_diff('day', s.t0, (SELECT MAX(o_orderdate) FROM orders))
           END AS dur,
           CAST(s.t1 IS NOT NULL AS BIGINT) AS event
    FROM seconds s JOIN customer c ON s.o_custkey = c.c_custkey
), by_t AS (
    SELECT c_mktsegment, dur,
           CAST(COUNT(*) AS BIGINT) AS n_exit,
           CAST(SUM(event) AS BIGINT) AS n_event
    FROM subjects GROUP BY c_mktsegment, dur
), curve AS (
    SELECT c_mktsegment, dur, n_event,
           CAST(SUM(n_exit) OVER (PARTITION BY c_mktsegment)
                - COALESCE(SUM(n_exit) OVER (
                      PARTITION BY c_mktsegment ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS n_risk
    FROM by_t
), lnterms AS (
    SELECT *,
           CASE WHEN n_event > 0 AND n_event < n_risk
                THEN ln(CAST(n_risk - n_event AS DOUBLE)
                        / CAST(n_risk AS DOUBLE))
                ELSE 0.0 END AS lnterm,
           MAX(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END) OVER (
               PARTITION BY c_mktsegment ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
    FROM curve
)
SELECT c_mktsegment, CAST(dur AS INT) AS dur_days, n_risk, n_event,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE ROUND(exp(SUM(lnterm) OVER (
                PARTITION BY c_mktsegment ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
       END AS survival
FROM lnterms
QUALIFY n_event > 0
ORDER BY c_mktsegment, dur_days
"""


ROLLCORR_WIN = 7  # trailing days in the rolling-correlation window


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation of each event type's daily
    volume against TOTAL daily traffic — the co-movement monitor that
    flags when one stream decouples from the site-wide load (a
    deploy-broke-one-funnel signal). Correlation over a trailing count
    window, computed closed-form from exact integer window sums:
    r = (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² − (Σy)²)).

    Determinism with NO rounding: x and y are exact daily counts, all
    five window sums are exact BIGINTs, the numerator and the two
    variance terms are exact BIGINT expressions, and r is one IEEE
    division by one IEEE sqrt of a product of two exactly-representable
    integers — bit-identical across engines. (At 100 TB daily counts,
    the Σxy terms approach 2^63; the one-token swap is DECIMAL(38,0)
    sums, noted here rather than silently applied.)

    Scale shape: raw events collapse to a (type, day) count grid first;
    the total-traffic series is a second tiny agg broadcast back; the
    rolling window is partitioned by event_type and bounded by calendar
    days. No global window, no Python.
    """
    ev = load_tables(spark, sf_dir)["events"]
    per_type = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    totals = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    grid = per_type.join(F.broadcast(totals), "day")
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(ROLLCORR_WIN - 1), 0)
    )
    n = F.lit(ROLLCORR_WIN)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    num = n * sxy - sx * sy
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    return (
        grid.withColumn("nwin", F.count(F.lit(1)).over(w))
        .withColumn("cov_num", num)
        .withColumn("d1", d1)
        .withColumn("d2", d2)
        .filter(F.col("nwin") == ROLLCORR_WIN)
        .select(
            "event_type",
            "day",
            "x",
            "y",
            F.col("cov_num").cast("long").alias("cov_num"),
            F.when(
                (F.col("d1") > 0) & (F.col("d2") > 0),
                F.col("cov_num").cast("double")
                / F.sqrt(
                    F.col("d1").cast("double") * F.col("d2").cast("double")
                ),
            ).alias("r"),
        )
        .orderBy("event_type", "day")
    )


ORACLE_ROLLING_CORR = f"""
WITH per_type AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY event_type, CAST(ts AS DATE)
), totals AS (
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY CAST(ts AS DATE)
), grid AS (
    SELECT p.event_type, p.day, p.x, t.y FROM per_type p
    JOIN totals t ON p.day = t.day
), sums AS (
    SELECT event_type, day, x, y,
           COUNT(*) OVER w AS nwin,
           CAST({ROLLCORR_WIN} * SUM(x * y) OVER w
                - SUM(x) OVER w * SUM(y) OVER w AS BIGINT) AS cov_num,
           CAST({ROLLCORR_WIN} * SUM(x * x) OVER w
                - SUM(x) OVER w * SUM(x) OVER w AS BIGINT) AS d1,
           CAST({ROLLCORR_WIN} * SUM(y * y) OVER w
                - SUM(y) OVER w * SUM(y) OVER w AS BIGINT) AS d2
    FROM grid
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN {ROLLCORR_WIN - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, x, y, cov_num,
       CASE WHEN d1 > 0 AND d2 > 0
            THEN CAST(cov_num AS DOUBLE)
                 / sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)) END AS r
FROM sums
WHERE nwin = {ROLLCORR_WIN}
ORDER BY event_type, day
"""


def q_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — returns matched against shipments per part in
    ship-date order — via the interval-intersection trick: each side's
    running-quantity prefix sums turn every row into a half-open unit
    interval [cum−qty, cum), and a FIFO match between supply row s and
    demand row d is exactly a nonempty overlap of their intervals, with
    matched units = the overlap length. The classic imperative
    match-loop becomes two partitioned windows and one bounded range
    join — no iteration, no UDF. (Inventory costing, broker lot
    assignment, and queue attribution are all this operator.)

    Determinism: quantities are whole units cast to BIGINT; prefix
    sums, overlaps, and all emitted columns are exact integers.

    Scale shape: both windows partition by l_partkey (per-part series,
    parallel across parts); the overlap join is an equi-join on
    l_partkey with the range predicate applied inside the partition —
    per-part candidate fan-out is bounded because FIFO intervals are
    non-overlapping within a side (each supply interval meets O(1 +
    its-span/avg-demand-size) demand intervals, so the join output is
    linear in rows, not quadratic). A time-bucketed variant
    (``q_range_join_bucketed``) applies unchanged if one part's history
    is itself huge.
    """
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_partkey",
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = W.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    def side(df):
        return df.withColumn("hi", F.sum("qty").over(w)).withColumn(
            "lo", F.col("hi") - F.col("qty")
        )

    supply = side(li.filter(F.col("l_returnflag") != "R")).select(
        "l_partkey", F.col("lo").alias("s_lo"), F.col("hi").alias("s_hi")
    )
    demand = side(li.filter(F.col("l_returnflag") == "R")).select(
        "l_partkey", F.col("lo").alias("d_lo"), F.col("hi").alias("d_hi")
    )
    pairs = supply.join(demand, "l_partkey").filter(
        (F.col("s_lo") < F.col("d_hi")) & (F.col("d_lo") < F.col("s_hi"))
    )
    totals = li.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("l_returnflag") != "R", F.col("qty")).otherwise(0)).alias(
            "supply_units"
        ),
        F.sum(F.when(F.col("l_returnflag") == "R", F.col("qty")).otherwise(0)).alias(
            "demand_units"
        ),
    )
    matched = pairs.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")
        ).alias("matched_units"),
    )
    return (
        totals.join(matched, "l_partkey", "left")
        .select(
            "l_partkey",
            "supply_units",
            "demand_units",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("matched_units", F.lit(0)).alias("matched_units"),
            F.greatest(
                F.col("demand_units") - F.col("supply_units"), F.lit(0)
            ).alias("unmatched_demand"),
        )
        .orderBy("l_partkey")
    )


ORACLE_FIFO_ALLOCATION = """
WITH li AS (
    SELECT l_partkey, l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
           l_shipdate, l_orderkey, l_linenumber
    FROM lineitem
), supply AS (
    SELECT l_partkey,
           CAST(SUM(qty) OVER w - qty AS BIGINT) AS s_lo,
           CAST(SUM(qty) OVER w AS BIGINT) AS s_hi
    FROM li WHERE l_returnflag <> 'R'
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber)
), demand AS (
    SELECT l_partkey,
           CAST(SUM(qty) OVER w - qty AS BIGINT) AS d_lo,
           CAST(SUM(qty) OVER w AS BIGINT) AS d_hi
    FROM li WHERE l_returnflag = 'R'
    WINDOW w AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber)
), totals AS (
    SELECT l_partkey,
           CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN qty ELSE 0 END)
                AS BIGINT) AS supply_units,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN qty ELSE 0 END)
                AS BIGINT) AS demand_units
    FROM li GROUP BY l_partkey
), matched AS (
    SELECT s.l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(LEAST(s.s_hi, d.d_hi) - GREATEST(s.s_lo, d.d_lo))
                AS BIGINT) AS matched_units
    FROM supply s JOIN demand d
      ON s.l_partkey = d.l_partkey
     AND s.s_lo < d.d_hi AND d.d_lo < s.s_hi
    GROUP BY s.l_partkey
)
SELECT t.l_partkey, t.supply_units, t.demand_units,
       COALESCE(m.n_pairs, 0) AS n_pairs,
       COALESCE(m.matched_units, 0) AS matched_units,
       GREATEST(t.demand_units - t.supply_units, 0) AS unmatched_demand
FROM totals t LEFT JOIN matched m ON t.l_partkey = m.l_partkey
ORDER BY t.l_partkey
"""


ATTR_WINDOW_DAYS = 3  # lookback from conversion to creditable touches


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (even-split) multi-touch attribution: every purchase's
    value is split equally across the user's click/view touches in the
    trailing 3-day window, then credited per channel — the standard
    middle ground between ``q_first_touch_attribution`` (all credit to
    one touch) and data-driven models. Emits per channel the touch
    count, distinct credited conversions, and total credit.

    Determinism: conversion value becomes exact integer cents; each
    touch's credit is integer micro-cents via integer DIV (cents·10⁶
    DIV n_touch) so the per-channel sums are exact integers in any
    order — the remainder of the division is dropped identically on
    both engines, never re-distributed by float arithmetic.

    Scale shape: the touch↔conversion pairing is an EQUI-join on
    user_id with the time predicate applied inside (per-user event
    history is bounded; an unbounded per-user stream would use
    ``q_range_join_bucketed``'s day-bucket explode unchanged); the
    touch count per conversion is a window partitioned by conversion
    id. One final per-channel aggregate, map-side combined.
    """
    ev = load_tables(spark, sf_dir)["events"]
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("channel"),
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        )
    )
    w_conv = W.partitionBy("conv_id")
    credited = pairs.withColumn("n_touch", F.count(F.lit(1)).over(w_conv)).withColumn(
        "credit_micro",
        F.expr("(cents * 1000000) DIV n_touch"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("conv_id").alias("n_conversions"),
            F.sum("credit_micro").alias("credited_micro"),
        )
        .orderBy("channel")
    )


ORACLE_LINEAR_ATTRIBUTION = f"""
WITH conv AS (
    SELECT event_id AS conv_id, user_id, ts AS conv_ts,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
), touch AS (
    SELECT user_id, ts AS touch_ts, event_type AS channel
    FROM events WHERE event_type IN ('click', 'view')
), pairs AS (
    SELECT c.conv_id, c.cents, t.channel
    FROM conv c JOIN touch t
      ON c.user_id = t.user_id
     AND t.touch_ts < c.conv_ts
     AND t.touch_ts >= c.conv_ts - INTERVAL {ATTR_WINDOW_DAYS} DAYS
), credited AS (
    SELECT channel, conv_id,
           (cents * 1000000) // COUNT(*) OVER (PARTITION BY conv_id)
               AS credit_micro
    FROM pairs
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
       CAST(SUM(credit_micro) AS BIGINT) AS credited_micro
FROM credited
GROUP BY channel
ORDER BY channel
"""


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the median of all pairwise
    slopes of the daily-count series — the estimator that shrugs off
    the outlier days OLS (``q_trend_per_group``) gets dragged by; the
    robust-statistics sibling of ``q_robust_stats_mad``.

    Determinism: x is the day offset from a fixed epoch and y the exact
    daily count, so every pairwise slope is ONE IEEE division of exact
    integers; the median is SELECTED (lower median — element
    (n+1) DIV 2 of the sorted slope list), never averaged, so the
    emitted double is one of the exact quotients, bit-identical across
    engines.

    Scale shape: the corpus collapses to (type, day) counts first; the
    O(d²) pairwise-slope enumeration runs as JVM array lambdas on ONE
    row per series, d bounded by the calendar span — at 10 years of
    daily data that is ~6.7M slopes per series, still a single in-task
    array job, parallel across series. No window, no self-join.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    pts_df = daily.select(
        "event_type",
        F.struct(
            F.datediff("day", F.lit("2024-01-01").cast("date")).alias("x"),
            F.col("y").alias("y"),
        ).alias("pt"),
    ).groupBy("event_type").agg(F.array_sort(F.collect_list("pt")).alias("pts"))
    n = F.size("pts")
    slopes = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: (
                    F.element_at("pts", j).y - F.element_at("pts", i).y
                ).cast("double")
                / (
                    F.element_at("pts", j).x - F.element_at("pts", i).x
                ).cast("double"),
            ),
        )
    )
    return (
        pts_df.withColumn("slopes", F.array_sort(slopes))
        .select(
            "event_type",
            n.alias("n_days"),
            F.size("slopes").cast("long").alias("n_pairs"),
            F.element_at(
                "slopes", F.expr("CAST((size(slopes) + 1) DIV 2 AS INT)")
            ).alias("slope_med"),
        )
        .orderBy("event_type")
    )


ORACLE_THEIL_SEN_TREND = """
WITH daily AS (
    SELECT event_type,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY event_type, CAST(ts AS DATE)
), series AS (
    SELECT event_type,
           list(struct_pack(x := x, y := y) ORDER BY x) AS pts
    FROM daily GROUP BY event_type
), sl AS (
    SELECT event_type, len(pts) AS n_days,
           list_sort(flatten(list_transform(
               generate_series(1, len(pts) - 1),
               i -> list_transform(
                   generate_series(i + 1, len(pts)),
                   j -> CAST(pts[CAST(j AS INT)]['y']
                             - pts[CAST(i AS INT)]['y'] AS DOUBLE)
                        / CAST(pts[CAST(j AS INT)]['x']
                               - pts[CAST(i AS INT)]['x'] AS DOUBLE)))))
               AS slopes
    FROM series
)
SELECT event_type,
       CAST(n_days AS INT) AS n_days,
       CAST(len(slopes) AS BIGINT) AS n_pairs,
       slopes[CAST((len(slopes) + 1) // 2 AS INT)] AS slope_med
FROM sl
ORDER BY event_type
"""


def q_events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick resampling: per (event_type, day) bar with
    open / high / low / close / trade count / turnover — the canonical
    irregular-series → bar conversion every market-data and metrics
    store runs (the value-weighted sibling of ``q_twap_daily``: TWAP
    weights by holding time, a bar summarizes the day's path).

    Open and close are lexicographic struct MIN/MAX over
    (ts, event_id, cents) — argmin/argmax as ORDINARY mergeable
    aggregates with map-side combine, never a rank-1 window that would
    sort whole partitions (``q_argmax_per_group``'s lesson applied to a
    time series). One grouped aggregate over one scan; every output
    column is an exact integer — no float contract at all. The oracle
    states the window formulation (ROW_NUMBER ASC/DESC = 1), proving
    the struct-extreme and window forms equivalent.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        base.groupBy("event_type", "day")
        .agg(
            F.min(F.struct("ts", "event_id", "cents")).alias("_o"),
            F.max(F.struct("ts", "event_id", "cents")).alias("_c"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("turnover_cents"),
        )
        .select(
            "event_type",
            "day",
            F.col("_o.cents").alias("open_cents"),
            "high_cents",
            "low_cents",
            F.col("_c.cents").alias("close_cents"),
            "n_events",
            "turnover_cents",
        )
        .orderBy("event_type", "day")
    )


ORACLE_EVENTS_OHLC_BARS = """
WITH base AS (
    SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
), ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY event_type, day
                              ORDER BY ts, event_id) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY event_type, day
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM base
)
SELECT event_type, day,
       CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(MAX(cents) AS BIGINT) AS high_cents,
       CAST(MIN(cents) AS BIGINT) AS low_cents,
       CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS turnover_cents
FROM ranked
GROUP BY event_type, day
ORDER BY event_type, day
"""


# ------------------------------------------- M4 series downsampling


def q_events_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    (series, time bucket) keep only the ORIGINAL rows that realize the
    four extremes — first ts, last ts, min value, max value — the
    provably error-free point set for line-chart rendering at a fixed
    pixel width. Unlike ``q_events_ohlc_bars`` (which emits one
    SUMMARY row per bar) this returns actual source rows, ≤ 4 per
    bucket after dedup, so downstream consumers keep event identity.

    The four argext selections are lexicographic struct MIN/MAX —
    ordinary mergeable aggregates with map-side combine, never a
    rank-1 window over raw partitions. The corpus collapses to
    |series|·|buckets| rows in one shuffle; the explode + distinct
    that flattens the ≤4 candidate structs runs on that already-tiny
    frame. Output size is bounded by 4·buckets regardless of input
    row count — the property that makes M4 the standard first pass
    before shipping series to a renderer at 100 TB.

    Determinism: value ties break on (ts, event_id) inside the struct
    ordering; event_id is unique so every extreme is a single row.
    Values are exact integer cents (the events-family contract).
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    agg = base.groupBy("event_type", "bucket").agg(
        F.min(F.struct("ts", "event_id", "cents")).alias("_first"),
        F.max(F.struct("ts", "event_id", "cents")).alias("_last"),
        F.min(F.struct("cents", "ts", "event_id")).alias("_vmin"),
        F.max(F.struct("cents", "ts", "event_id")).alias("_vmax"),
    )

    def _pt(src: str) -> F.Column:
        return F.struct(
            F.col(f"{src}.ts").alias("ts"),
            F.col(f"{src}.event_id").alias("event_id"),
            F.col(f"{src}.cents").alias("cents"),
        )

    return (
        agg.select(
            "event_type",
            "bucket",
            F.explode(
                F.array(_pt("_first"), _pt("_last"), _pt("_vmin"), _pt("_vmax"))
            ).alias("p"),
        )
        .select(
            "event_type",
            "bucket",
            F.col("p.ts").alias("ts"),
            F.col("p.event_id").alias("event_id"),
            F.col("p.cents").alias("cents"),
        )
        .distinct()
        .orderBy("event_type", "bucket", "ts", "event_id")
    )


ORACLE_EVENTS_DOWNSAMPLE_M4 = """
WITH base AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
), ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                              ORDER BY ts, event_id, cents) AS rn_first,
           ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                              ORDER BY ts DESC, event_id DESC, cents DESC
                             ) AS rn_last,
           ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                              ORDER BY cents, ts, event_id) AS rn_vmin,
           ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                              ORDER BY cents DESC, ts DESC, event_id DESC
                             ) AS rn_vmax
    FROM base
)
SELECT DISTINCT event_type, bucket, ts, event_id, cents
FROM ranked
WHERE 1 IN (rn_first, rn_last, rn_vmin, rn_vmax)
ORDER BY event_type, bucket, ts, event_id
"""


# ------------------------------------------- time-decay attribution

def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution — the half-life-weighted
    member of the attribution family (first-touch / linear / Markov
    already shipped): a touch ``d`` whole days before its conversion
    earns weight 2^(ATTR_WINDOW_DAYS−1−d), so yesterday's click counts
    double a two-day-old one.

    Determinism (the family's integer discipline): with the 3-day
    window the weights are the INTEGERS {4, 2, 1}; each touch's credit
    is ``cents·10⁶·w DIV Σw`` — exact integer division per conversion,
    no float path anywhere, so per-channel sums are order-independent.
    Day age is whole-day ``(conv_sec − touch_sec) DIV 86400`` on epoch
    seconds, identical on both engines.

    Scale shape is q_linear_attribution's unchanged: equi-join on
    user_id with the time predicate inside, one window partitioned by
    conversion id for Σw, one map-side-combined channel aggregate.
    """
    ev = load_tables(spark, sf_dir)["events"]
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
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
        .withColumn(
            "age_d",
            F.expr(
                "(unix_timestamp(conv_ts) - unix_timestamp(touch_ts)) DIV 86400"
            ),
        )
        .withColumn(
            # age_d can reach ATTR_WINDOW_DAYS on the boundary SECOND:
            # the window predicate compares microseconds but age_d is
            # whole truncated seconds, so a touch inside the same second
            # as the 3-day boundary floors to day 3 — clamp it into the
            # oldest bucket (weight 1), never a negative shift
            "w",
            F.expr(
                f"CAST(shiftleft(1, greatest(0, CAST({ATTR_WINDOW_DAYS - 1}"
                " - age_d AS INT))) AS BIGINT)"
            ),
        )
    )
    w_conv = W.partitionBy("conv_id")
    credited = pairs.withColumn("w_tot", F.sum("w").over(w_conv)).withColumn(
        "credit_micro", F.expr("(cents * 1000000 * w) DIV w_tot")
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("w").alias("weight_total"),
            F.sum("credit_micro").alias("credited_micro"),
        )
        .orderBy("channel")
    )


ORACLE_TIME_DECAY_ATTRIBUTION = f"""
WITH conv AS (
    SELECT event_id AS conv_id, user_id, ts AS conv_ts,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
), touch AS (
    SELECT user_id, ts AS touch_ts, event_type AS channel
    FROM events WHERE event_type IN ('click', 'view')
), pairs AS (
    -- epoch() on a fractional timestamp returns DOUBLE and CAST would
    -- ROUND where Spark's unix_timestamp TRUNCATES — truncate to the
    -- second first (the twap_daily contract); GREATEST clamps the
    -- boundary-second age into the oldest bucket, mirroring the Spark
    -- side
    SELECT c.conv_id, c.cents, t.channel,
           CAST(1 AS BIGINT) << GREATEST(0, CAST(
               ({ATTR_WINDOW_DAYS} - 1)
               - (CAST(epoch(date_trunc('second', c.conv_ts)) AS BIGINT)
                  - CAST(epoch(date_trunc('second', t.touch_ts)) AS BIGINT))
                 // 86400
               AS INTEGER)) AS w
    FROM conv c JOIN touch t
      ON c.user_id = t.user_id
     AND t.touch_ts < c.conv_ts
     AND t.touch_ts >= c.conv_ts - INTERVAL {ATTR_WINDOW_DAYS} DAYS
), credited AS (
    SELECT channel, w,
           (cents * 1000000 * w) // SUM(w) OVER (PARTITION BY conv_id)
               AS credit_micro
    FROM pairs
)
SELECT channel,
       COUNT(*) AS n_touches,
       CAST(SUM(w) AS BIGINT) AS weight_total,
       CAST(SUM(credit_micro) AS BIGINT) AS credited_micro
FROM credited
GROUP BY channel
ORDER BY channel
"""


# --------------------------------------------------- max drawdown


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per event type — the canonical path-dependent
    risk statistic: the largest drop of the daily-turnover LEVEL series
    from its running peak. The sibling of ``q_twap_daily``/
    ``q_events_ohlc_bars``: those summarize levels, drawdown summarizes
    the worst decline a dashboard reader actually lived through.

    Drawdown is taken on the daily-total LEVEL, not a cumulative sum —
    event values are non-negative, so a cumulative series is monotone
    and its drawdown is identically zero at every scale: a formulation
    no gate could falsify (review finding, round 8). On the level
    series every below-peak day produces a strictly positive drawdown,
    which the tests pin (the statistic must be non-degenerate on the
    fixture).

    Exact integers end to end: daily cents (one map-side-combined
    aggregate — the only corpus-scale shuffle), then running max /
    drawdown as windows PARTITIONED BY event_type over the day
    calendar — bounded by the date range, not row count, the
    ``cumulative_distinct_users`` day-domain discipline. Final value is
    a struct-MAX argext on (day, level), not a rank window.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("level"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    series = daily.withColumn("peak", F.max("level").over(w)).withColumn(
        "dd", F.col("peak") - F.col("level")
    )
    return (
        series.groupBy("event_type")
        .agg(
            F.max("peak").alias("peak_cents"),
            F.max(
                F.struct(F.col("day").alias("d"), F.col("level").alias("c"))
            ).alias("_last"),
            F.max("dd").alias("max_drawdown_cents"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select(
            "event_type",
            "n_days",
            "peak_cents",
            F.col("_last.c").alias("final_cents"),
            "max_drawdown_cents",
        )
        .orderBy("event_type")
    )


ORACLE_MAX_DRAWDOWN = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS level
    FROM events GROUP BY 1, 2
), peaks AS (
    SELECT event_type, day, level,
           CAST(MAX(level) OVER w AS BIGINT) AS peak,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY day DESC) AS rn_d
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(peak) AS BIGINT) AS peak_cents,
       CAST(MAX(CASE WHEN rn_d = 1 THEN level END) AS BIGINT) AS final_cents,
       CAST(MAX(peak - level) AS BIGINT) AS max_drawdown_cents
FROM peaks
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------- Shapley attribution

# Fixed channel order defines the coalition bitmask (bit i = channel i
# touched); conversion = purchase, as in the rest of the family.
SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]
SHAPLEY_CONV = "purchase"


def _shapley_grid_rows() -> list[tuple[str, int, int, int]]:
    """(channel, mask_without, mask_with, weight·n!) for every channel i
    and coalition S ⊆ U∖{i}: weight = |S|!·(n−1−|S|)! — the exact
    INTEGER numerator of the Shapley kernel (denominator n! applied
    once at the end). 2ⁿ⁻¹ rows per channel; n=4 → 32 rows total."""
    import math as _m

    n = len(SHAPLEY_CHANNELS)
    rows = []
    for i, c in enumerate(SHAPLEY_CHANNELS):
        for smask in range(2**n):
            if smask & (1 << i):
                continue
            s = bin(smask).count("1")
            rows.append(
                (c, smask, smask | (1 << i), _m.factorial(s) * _m.factorial(n - 1 - s))
            )
    return rows


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value attribution — the game-theoretic member of the
    family (first-touch / linear / time-decay / Markov removal-effect
    already shipped; Shapley is the other standard data-driven model,
    Zhao et al. 2018): each channel's credit is its average marginal
    contribution to the conversion rate across all orderings of the
    channel coalition. Worth function v(S) = conversion rate of users
    whose touched-channel set is exactly S (0 for unobserved sets).

    Exact-integer core: v is integer parts-per-million via DIV, the
    Shapley kernel weight is the integer |S|!·(n−1−|S|)!, so φ's
    numerator is an exact integer sum — summation order can't move it —
    and the single n!·10⁶ division happens once, rounded 6 dp on
    identical operands (ties round away from zero in BOTH engines, so
    even an exactly-representable boundary agrees).

    Scale shape: the corpus collapses to ≤ 2ⁿ coalition rows in ONE
    map-side-combined per-user aggregate + one tiny regroup; the
    2ⁿ⁻¹·n subset/weight grid is driver-enumerated metadata (n = 4
    channels → 32 rows, the ``markov_attribution`` precedent) and every
    join after the first shuffle is broadcast-tiny. Growing n keeps the
    corpus pass unchanged; only the metadata grid doubles per channel.
    """
    import math as _m

    ev = load_tables(spark, sf_dir)["events"]
    n = len(SHAPLEY_CHANNELS)
    per_user = ev.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("event_type") == c, 1).otherwise(0)).alias(f"has_{i}")
            for i, c in enumerate(SHAPLEY_CHANNELS)
        ],
        F.max(
            F.when(F.col("event_type") == SHAPLEY_CONV, 1).otherwise(0)
        ).alias("converted"),
    )
    mask = sum(
        (F.col(f"has_{i}") * F.lit(2**i) for i in range(n)), F.lit(0)
    ).cast("long")
    coal = (
        per_user.withColumn("mask", mask)
        .groupBy("mask")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("long").alias("n_conv"),
        )
        .withColumn("v_ppm", F.expr("(n_conv * 1000000) DIV n_users"))
    )
    grid = spark.createDataFrame(
        _shapley_grid_rows(),
        "channel string, mask_without long, mask_with long, w long",
    )
    joined = (
        grid.join(
            F.broadcast(
                coal.select(F.col("mask").alias("mask_with"), F.col("v_ppm").alias("v_with"))
            ),
            "mask_with",
            "left",
        )
        .join(
            F.broadcast(
                coal.select(
                    F.col("mask").alias("mask_without"),
                    F.col("v_ppm").alias("v_without"),
                )
            ),
            "mask_without",
            "left",
        )
        .fillna(0, ["v_with", "v_without"])
    )
    phi = joined.groupBy("channel").agg(
        F.sum(F.col("w") * (F.col("v_with") - F.col("v_without"))).alias("phi_num")
    )
    chan_bits = spark.createDataFrame(
        [(c, 1 << i) for i, c in enumerate(SHAPLEY_CHANNELS)],
        "channel string, bit long",
    )
    touched = (
        chan_bits.join(F.broadcast(coal), F.expr("(mask & bit) <> 0"))
        .groupBy("channel")
        .agg(F.sum("n_users").alias("n_users"))
    )
    denom = float(_m.factorial(n) * 1_000_000)
    return (
        phi.join(touched, "channel", "left")
        .fillna(0, ["n_users"])
        .select(
            "channel",
            "n_users",
            "phi_num",
            F.round(F.col("phi_num").cast("double") / F.lit(denom), 6).alias(
                "shapley"
            ),
        )
        .orderBy("channel")
    )


def _shapley_oracle() -> str:
    import math as _m

    n = len(SHAPLEY_CHANNELS)
    has_cols = ",\n           ".join(
        f"MAX(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) AS has_{i}"
        for i, c in enumerate(SHAPLEY_CHANNELS)
    )
    mask_expr = " + ".join(f"has_{i} * {2**i}" for i in range(n))
    grid_vals = ",\n           ".join(
        f"('{c}', {mw}, {mwi}, {w})" for c, mw, mwi, w in _shapley_grid_rows()
    )
    bit_vals = ", ".join(
        f"('{c}', {1 << i})" for i, c in enumerate(SHAPLEY_CHANNELS)
    )
    denom = _m.factorial(n) * 1_000_000
    return f"""
WITH per_user AS (
    SELECT user_id,
           {has_cols},
           MAX(CASE WHEN event_type = '{SHAPLEY_CONV}' THEN 1 ELSE 0 END)
               AS converted
    FROM events GROUP BY user_id
), coal AS (
    SELECT CAST({mask_expr} AS BIGINT) AS mask,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_conv
    FROM per_user GROUP BY 1
), vppm AS (
    SELECT mask, n_users, (n_conv * 1000000) // n_users AS v_ppm FROM coal
), grid(channel, mask_without, mask_with, w) AS (
    VALUES {grid_vals}
), joined AS (
    SELECT g.channel, g.w,
           COALESCE(a.v_ppm, 0) AS v_with,
           COALESCE(b.v_ppm, 0) AS v_without
    FROM grid g
    LEFT JOIN vppm a ON a.mask = g.mask_with
    LEFT JOIN vppm b ON b.mask = g.mask_without
), phi AS (
    SELECT channel,
           CAST(SUM(w * (v_with - v_without)) AS BIGINT) AS phi_num
    FROM joined GROUP BY channel
), bits(channel, bit) AS (
    VALUES {bit_vals}
), touched AS (
    SELECT c.channel, CAST(SUM(v.n_users) AS BIGINT) AS n_users
    FROM bits c JOIN vppm v ON (v.mask & c.bit) <> 0
    GROUP BY c.channel
)
SELECT p.channel,
       COALESCE(t.n_users, 0) AS n_users,
       p.phi_num,
       ROUND(CAST(p.phi_num AS DOUBLE) / {denom}, 6) AS shapley
FROM phi p LEFT JOIN touched t ON p.channel = t.channel
ORDER BY p.channel
"""


ORACLE_SHAPLEY_ATTRIBUTION = _shapley_oracle()


# ------------------------------------------------- autocorrelation

ACF_MAX_LAG = 7


def q_autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the per-type daily event-count series
    at lags 1..ACF_MAX_LAG — the "is there weekly seasonality?" scan
    that precedes any forecasting work (companions:
    ``seasonal_decompose`` assumes the period; this measures it).

    Plan: the corpus collapses to (event_type, day, count) in ONE
    map-side-combined aggregate — everything after runs on the
    days-sized frame (|types|·|days| rows, ~thousands at any corpus
    size, the same collapse discipline as ``model_auc_roc``'s score
    domain). Lagged pairs come from a window ``lag`` per type ordered
    by day (gap days don't exist in this fixture; a gapped series
    would LOCF-fill first via ``events_gapfill_locf``), and r_k uses
    the standard biased-denominator estimator
    Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² with the per-type mean over all
    days. Rounded 6 dp on identical double pipelines.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.avg("x").alias("xbar"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
        F.count(F.lit(1)).alias("n_days"),
    )
    w = W.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "x",
        *[
            F.lag("x", k).over(w).alias(f"x_l{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    num = lagged.join(F.broadcast(stats), "event_type").groupBy(
        "event_type"
    ).agg(
        *[
            F.sum(
                (F.col("x") - F.col("xbar"))
                * (F.col(f"x_l{k}") - F.col("xbar"))
            ).alias(f"num_{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
        F.first("xbar").alias("xbar"),
        F.first("sxx").alias("sxx"),
        F.first("sx").alias("sx"),
        F.first("n_days").alias("n_days"),
    )
    # denominator Σ(x−x̄)² = Σx² − 2x̄Σx + n·x̄² — exact from the moments
    den = (
        F.col("sxx")
        - 2.0 * F.col("xbar") * F.col("sx")
        + F.col("n_days") * F.col("xbar") * F.col("xbar")
    )
    acf_cols = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.round(F.col(f"num_{k}") / den, 6).alias("acf"),
            )
            for k in range(1, ACF_MAX_LAG + 1)
        ]
    )
    return (
        num.select(
            "event_type", "n_days", F.explode(acf_cols).alias("a")
        )
        .select(
            "event_type",
            F.col("a.lag").alias("lag"),
            F.col("a.acf").alias("acf"),
            "n_days",
        )
        .orderBy("event_type", "lag")
    )


ORACLE_AUTOCORR_LAGS = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS x
    FROM events GROUP BY 1, 2
), stats AS (
    SELECT event_type, AVG(x) AS xbar,
           SUM(x * x) AS sxx, SUM(x) AS sx, COUNT(*) AS n_days
    FROM daily GROUP BY event_type
), lagged AS (
    SELECT event_type, x,
           {", ".join(
               f"LAG(x, {k}) OVER (PARTITION BY event_type ORDER BY day)"
               f" AS x_l{k}"
               for k in range(1, ACF_MAX_LAG + 1)
           )}
    FROM daily
), num AS (
    SELECT l.event_type,
           {", ".join(
               f"SUM((l.x - s.xbar) * (l.x_l{k} - s.xbar)) AS num_{k}"
               for k in range(1, ACF_MAX_LAG + 1)
           )},
           ANY_VALUE(s.sxx) AS sxx, ANY_VALUE(s.sx) AS sx,
           ANY_VALUE(s.xbar) AS xbar, ANY_VALUE(s.n_days) AS n_days
    FROM lagged l JOIN stats s USING (event_type)
    GROUP BY l.event_type
)
SELECT event_type, lag, acf, n_days
FROM num, LATERAL (
    {" UNION ALL ".join(
        f"SELECT {k} AS lag, ROUND(num_{k} / "
        "(sxx - 2.0 * xbar * sx + n_days * xbar * xbar), 6) AS acf"
        for k in range(1, ACF_MAX_LAG + 1)
    )}
) t
ORDER BY event_type, lag
"""


# ------------------------------------------------ sequence mining

TRIGRAM_TOPK = 25


def q_event_trigram_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, n-gram form: the TRIGRAM_TOPK most
    frequent consecutive event-type TRIGRAMS across user timelines,
    with support (occurrence count) and the number of distinct users
    exhibiting each — the "what do users actually do next" complement
    of ``session_paths`` (whole journeys) and
    ``event_transition_matrix`` (first-order bigrams): third-order
    context is where funnels start to look like intent.

    Plan: two ``lead`` windows per user (bounded by per-user history —
    never a global window), one map-side-combined count over the
    trigram key, and a distributed top-k (TakeOrdered) with full
    lexicographic tie-break. All-integer outputs — exact hash parity.
    At 100 TB the shuffle after the windows carries |distinct
    trigrams| ≤ |event types|³ partials per partition, corpus-size
    independent.
    """
    ev = load_tables(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
    )
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(
            F.col("support").desc(), F.col("e1"), F.col("e2"), F.col("e3")
        )
        .limit(TRIGRAM_TOPK)
    )


ORACLE_EVENT_TRIGRAM_MINING = f"""
WITH tri AS (
    SELECT user_id, event_type AS e1,
           LEAD(event_type, 1) OVER w AS e2,
           LEAD(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, COUNT(*) AS support,
       COUNT(DISTINCT user_id) AS n_users
FROM tri WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY support DESC, e1, e2, e3
LIMIT {TRIGRAM_TOPK}
"""


# --------------------------------------------------- gaps and islands

def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks — the
    classic sessionization-at-day-granularity shape (streak features
    feed retention models; ``heartbeat_gaps`` finds the gaps, this
    groups the islands).

    The island id is the row_number-difference trick: within a user,
    ``day − INTERVAL rn DAYS`` is constant exactly across consecutive
    days, so islands fall out of ONE distinct + ONE window + ONE
    aggregate — no self-join, no iteration. All-integer outputs (exact
    hash parity, no rounding contract needed).

    Scale: the corpus collapses to distinct (user, day) first —
    map-side-combined, the frame is bounded by users×days — and the
    row_number window partitions BY USER (no global window anywhere).
    Per-user output: streak count, longest/mean streak, active days.
    """
    ev = load_tables(spark, sf_dir)["events"]
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "anchor",
        F.date_sub(F.col("day"), F.row_number().over(w)),
    )
    islands = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("len").alias("longest_streak"),
            F.sum("len").alias("active_days"),
            F.min("start_day").alias("first_day"),
        )
        .orderBy("user_id")
    )


ORACLE_ACTIVITY_ISLANDS = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), grp AS (
    SELECT user_id, day,
           day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day
           ) AS INTEGER) AS anchor
    FROM days
), islands AS (
    SELECT user_id, anchor, COUNT(*) AS len, MIN(day) AS start_day
    FROM grp GROUP BY user_id, anchor
)
SELECT user_id,
       COUNT(*) AS n_islands,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS active_days,
       MIN(start_day) AS first_day
FROM islands
GROUP BY user_id
ORDER BY user_id
"""


def oracles() -> dict[str, tuple]:
    return {
        "events_ohlc_bars": (q_events_ohlc_bars, ORACLE_EVENTS_OHLC_BARS),
        "events_downsample_m4": (
            q_events_downsample_m4,
            ORACLE_EVENTS_DOWNSAMPLE_M4,
        ),
        "shapley_attribution": (
            q_shapley_attribution,
            ORACLE_SHAPLEY_ATTRIBUTION,
        ),
        "max_drawdown": (q_max_drawdown, ORACLE_MAX_DRAWDOWN),
        "theil_sen_trend": (q_theil_sen_trend, ORACLE_THEIL_SEN_TREND),
        "seasonal_anomaly_flags": (
            q_seasonal_anomaly_flags,
            ORACLE_SEASONAL_ANOMALY_FLAGS,
        ),
        "linear_attribution": (q_linear_attribution, ORACLE_LINEAR_ATTRIBUTION),
        "time_decay_attribution": (
            q_time_decay_attribution,
            ORACLE_TIME_DECAY_ATTRIBUTION,
        ),
        "autocorr_lags": (q_autocorr_lags, ORACLE_AUTOCORR_LAGS),
        "event_trigram_mining": (
            q_event_trigram_mining,
            ORACLE_EVENT_TRIGRAM_MINING,
        ),
        "activity_islands": (q_activity_islands, ORACLE_ACTIVITY_ISLANDS),
        "fifo_allocation": (q_fifo_allocation, ORACLE_FIFO_ALLOCATION),
        "seasonal_decompose": (q_seasonal_decompose, ORACLE_SEASONAL_DECOMPOSE),
        "survival_km": (q_survival_km, ORACLE_SURVIVAL_KM),
        "rolling_corr": (q_rolling_corr, ORACLE_ROLLING_CORR),
        "forecast_backtest_snaive": (
            q_forecast_backtest_snaive,
            ORACLE_FORECAST_BACKTEST_SNAIVE,
        ),
        "cusum_changepoint": (q_cusum_changepoint, ORACLE_CUSUM_CHANGEPOINT),
        "interval_coverage": (q_interval_coverage, ORACLE_INTERVAL_COVERAGE),
        "interval_overlap_join": (q_interval_overlap_join, ORACLE_INTERVAL_OVERLAP_JOIN),
        "asof_join": (q_asof_join, ORACLE_ASOF_JOIN),
        "asof_join_left": (q_asof_join_left, ORACLE_ASOF_JOIN_LEFT),
        "asof_join_salted": (q_asof_join_salted, ORACLE_ASOF_JOIN),
        "asof_join_forward": (q_asof_join_forward, ORACLE_ASOF_JOIN_FORWARD),
        "conversion_lag_percentiles": (
            q_conversion_lag_percentiles,
            ORACLE_CONVERSION_LAG_PERCENTILES,
        ),
        "events_funnel": (q_events_funnel, ORACLE_EVENTS_FUNNEL),
        "event_pattern_match": (q_event_pattern_match, ORACLE_EVENT_PATTERN_MATCH),
        "events_retention": (q_events_retention, ORACLE_EVENTS_RETENTION),
        "events_anomaly_zscore": (q_events_anomaly_zscore, ORACLE_EVENTS_ANOMALY_ZSCORE),
        "events_gapfill_locf": (q_events_gapfill_locf, ORACLE_EVENTS_GAPFILL_LOCF),
        "events_resample_interp": (
            q_events_resample_interp,
            ORACLE_EVENTS_RESAMPLE_INTERP,
        ),
        "ewma_smooth": (q_ewma_smooth, ORACLE_EWMA_SMOOTH),
        "rolling_median": (q_rolling_median, ORACLE_ROLLING_MEDIAN),
        "running_balance_clamped": (
            q_running_balance_clamped,
            ORACLE_RUNNING_BALANCE_CLAMPED,
        ),
        "rfm_segmentation": (q_rfm_segmentation, ORACLE_RFM_SEGMENTATION),
        "twap_daily": (q_twap_daily, ORACLE_TWAP_DAILY),
        "events_dow_hour_profile": (
            q_events_dow_hour_profile,
            ORACLE_EVENTS_DOW_HOUR_PROFILE,
        ),
        "heartbeat_gaps": (q_heartbeat_gaps, ORACLE_HEARTBEAT_GAPS),
        "feature_assembly_pit": (
            q_feature_assembly_pit,
            ORACLE_FEATURE_ASSEMBLY_PIT,
        ),
        "stratified_neyman_alloc": (
            q_stratified_neyman_alloc,
            ORACLE_STRATIFIED_NEYMAN_ALLOC,
        ),
        "cohort_ltv": (q_cohort_ltv, ORACLE_COHORT_LTV),
        "range_join_bucketed": (q_range_join_bucketed, ORACLE_RANGE_JOIN),
        "events_rollup_multires": (q_events_rollup_multires, ORACLE_ROLLUP_MULTIRES),
    }
