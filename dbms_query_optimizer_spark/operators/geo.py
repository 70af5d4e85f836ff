"""Geospatial operators — grid-blocked distance join and spatial binning.

The reference engine has no spatial operators (its surface is the
relational core, ``/root/reference/src``); this family is part of the
repo's beyond-the-reference pipeline coverage: location joins and
density maps are stock analytics asks the moment a table carries
coordinates, and the naive forms (point×facility cross join, global
sort by distance) are exactly the shapes that die at 100 TB.

The testdata carries no coordinate columns, so coordinates are DERIVED
deterministically from integer keys with a multiplicative-congruential
map (the repo's standard trick for exercising machinery the fixture
lacks — same discipline as text.py's mixed-language salting): both
engines compute byte-identical doubles from the same integer
arithmetic, so oracle parity is exact.

Scale design, per operator:

- ``geo_nearest_facility``: the classic k=1 spatial join. Never the
  cross join — facilities are exploded into their 3×3 grid-cell
  neighborhood (9× blow-up ON THE SMALL SIDE only) and the join is an
  equi-join on cell id, so candidate pairs are bounded by cell
  occupancy, not |points|×|facilities|. Cell size ≥ the search radius
  (in worst-case degrees) makes the 3×3 neighborhood a complete cover:
  no true neighbor within the radius is ever missed — the blocking is
  lossless, same contract as dedup.py's LSH band join. Argmin per
  point is a struct-min AGGREGATE (map-side combinable), not a global
  rank window.
- ``geo_grid_density``: spatial binning is one hash aggregate over
  integer cell ids — map-side combined, then a distributed top-k
  (TakeOrdered), never a full sort of the cell table. Its per-cell
  mean is exact integer-cents arithmetic (no float aggregation): see
  the function docstring and SCALING.md's round-7 addendum.

Cross-engine determinism contract: the trig queries' oracle parity
assumes the JVM's and DuckDB's libm sin/cos/asin/sqrt chains agree to
within a few ulps, and the explicit ROUND()s absorb exactly that noise
— PROVIDED no pre-rounding value sits within ~a-few-ulps of a rounding
half-boundary. That proviso is measured, not assumed:
tests/test_geo_rounding.py audits the full candidate population and
pins the min boundary margin at > 256 ulps (observed: 1.07e6 at
sf0.01, 2341 at sf0.1 for the 4-dp distances; 7.7e4 / 1502 for the
integer-metre hops). If the fixture ever scales to where the gate
trips, quantize the trig INPUTS to a shared integer micro-degree
domain rather than loosening the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import load_tables

# Multiplicative-congruential coordinate derivation: Knuth's 2654435761
# spreads consecutive keys; lat confined to [-60, 60] so the worst-case
# metres-per-degree-longitude shrink is bounded by cos(60°) = 0.5 and a
# single conservative cell size covers every latitude in range.
_MCG = 2654435761

def _lat_expr(key):  # [-60, 60)
    return (((key * _MCG) % 120000) / 1000.0 - 60.0)

def _lon_expr(key):  # [-180, 180)
    return ((((key + 7) * _MCG) % 360000) / 1000.0 - 180.0)

def _sql_lat(key: str) -> str:
    return f"((({key} * {_MCG}) % 120000) / 1000.0 - 60.0)"

def _sql_lon(key: str) -> str:
    return f"(((({key} + 7) * {_MCG}) % 360000) / 1000.0 - 180.0)"


GEO_RADIUS_KM = 400.0
# Completeness bound for the 3×3 cover: the longest lon span a 400 km
# great circle can have on this map is at lat ±60° (cos = 0.5), where
# haversine with Δφ=0 gives Δλ = 2·asin(sin(r/2R)/cos 60°) = 7.199°;
# the lat span is r/111.195 = 3.60°. Dividing by (110 · cos 60°) —
# 110 < 111.195 km per great-circle degree — over-estimates both, so
# any facility within GEO_RADIUS_KM is at most one cell away per axis
# and the 3×3 neighborhood is a complete candidate cover (cell edge
# 7.273° > 7.199° worst case; proven lossless by the unblocked oracle).
GEO_CELL_DEG = GEO_RADIUS_KM / (110.0 * 0.5)
# Longitude wraps at the antimeridian (haversine sees +179.9° and
# −179.9° as 0.2° apart; a plain floor grid puts them 49 cells apart),
# so lon cells are EXACT-width 360°/49 = 7.347° ≥ the 7.199° worst
# case, indexed 0..48, and the neighborhood expansion wraps modulo 49.
GEO_LON_CELLS = 49
GEO_LON_CELL_DEG = 360.0 / GEO_LON_CELLS
EARTH_R_KM = 6371.0088


def _haversine_expr(lat1, lon1, lat2, lon2):
    """Great-circle distance in km — written as ONE canonical operation
    order shared with the SQL oracle so both engines fold the same IEEE
    double sequence."""
    dphi = F.radians(lat2 - lat1) / 2.0
    dlmb = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlmb) * F.sin(dlmb)
    )
    return 2.0 * EARTH_R_KM * F.asin(F.sqrt(a))


def _sql_haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2.0 * {EARTH_R_KM} * asin(sqrt("
        f"sin(radians({lat2} - {lat1}) / 2.0) * sin(radians({lat2} - {lat1}) / 2.0)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians({lon2} - {lon1}) / 2.0) * sin(radians({lon2} - {lon1}) / 2.0)"
        f"))"
    )


def q_geo_nearest_facility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest facility within GEO_RADIUS_KM for every customer point —
    the k=1 spatial join, grid-blocked.

    Plan shape: facilities (suppliers — the SMALL side) explode into
    their 3×3 cell neighborhood (9 rows each), points compute one cell
    id, and candidates come from an equi-join on the cell id — hash
    join, no CartesianProduct anywhere. The per-point argmin is
    ``min_by``-style struct-min aggregation on (dist, s_suppkey): a
    map-side-combinable AGGREGATE, so no per-point rank window and no
    skew pivot on a hot cell. Distance is rounded to 4 dp BEFORE the
    argmin on both engines, so near-ties break on the facility key
    identically regardless of libm's last ulp.

    At 100 TB: cell occupancy (not corpus size) bounds the pair work.
    The facility side here is dimension-sized (9×|facilities|), so the
    explicit ``broadcast`` hint pins the map-side join; for a facility
    table too big to broadcast (say 10⁷ stores → ~90M exploded rows)
    the ONE-TOKEN scale swap is dropping the hint — the same equi-join
    then shuffles BOTH sides by (cy, cx), still never a theta join, and
    the points side needs no explode at all (the 9× stays on the
    facility side). Hot cells (urban cores) shard like any skewed join
    key: AQE skew splitting or a salt on the point side inside the
    cell.
    """
    t = load_tables(spark, sf_dir)
    pts = t["customer"].select(
        "c_custkey",
        _lat_expr(F.col("c_custkey")).alias("lat"),
        _lon_expr(F.col("c_custkey")).alias("lon"),
    )
    fac = t["supplier"].select(
        "s_suppkey",
        _lat_expr(F.col("s_suppkey") * 13).alias("flat"),
        _lon_expr(F.col("s_suppkey") * 13).alias("flon"),
    )
    cell_lat = lambda c: F.floor(c / GEO_CELL_DEG).cast("long")  # noqa: E731
    cell_lon = lambda c: F.floor(  # noqa: E731
        (c + 180.0) / GEO_LON_CELL_DEG
    ).cast("long")
    off = spark.range(-1, 2).select(F.col("id").alias("dx")).crossJoin(
        spark.range(-1, 2).select(F.col("id").alias("dy"))
    )
    fac9 = fac.crossJoin(F.broadcast(off)).select(
        "s_suppkey",
        "flat",
        "flon",
        (cell_lat(F.col("flat")) + F.col("dy")).alias("cy"),
        (
            (cell_lon(F.col("flon")) + F.col("dx") + GEO_LON_CELLS)
            % GEO_LON_CELLS
        ).alias("cx"),
    )
    cand = pts.withColumn("cy", cell_lat(F.col("lat"))).withColumn(
        "cx", cell_lon(F.col("lon"))
    ).join(F.broadcast(fac9), ["cy", "cx"])
    scored = cand.select(
        "c_custkey",
        "s_suppkey",
        F.round(
            _haversine_expr(F.col("lat"), F.col("lon"), F.col("flat"), F.col("flon")),
            4,
        ).alias("dist_km"),
    ).filter(F.col("dist_km") <= GEO_RADIUS_KM)
    return (
        scored.groupBy("c_custkey")
        .agg(F.min(F.struct("dist_km", "s_suppkey")).alias("best"))
        .select(
            "c_custkey",
            F.col("best.s_suppkey").alias("s_suppkey"),
            F.col("best.dist_km").alias("dist_km"),
        )
        .orderBy("c_custkey")
    )


_PT_LAT = _sql_lat("c_custkey")
_PT_LON = _sql_lon("c_custkey")
_FC_LAT = _sql_lat("(s_suppkey * 13)")
_FC_LON = _sql_lon("(s_suppkey * 13)")

# The oracle is the UNBLOCKED form — full point×facility argmin — so a
# hash match proves the grid blocking lossless (the dedup.py
# prefix-filter discipline): every in-radius neighbor the naive join
# finds, the 3×3 cover finds too.
ORACLE_GEO_NEAREST_FACILITY = f"""
WITH pts AS (
    SELECT c_custkey, {_PT_LAT} AS lat, {_PT_LON} AS lon FROM customer
),
fac AS (
    SELECT s_suppkey, {_FC_LAT} AS flat, {_FC_LON} AS flon FROM supplier
),
scored AS (
    SELECT c_custkey, s_suppkey,
           ROUND({_sql_haversine("lat", "lon", "flat", "flon")}, 4) AS dist_km
    FROM pts CROSS JOIN fac
),
ranked AS (
    SELECT c_custkey, s_suppkey, dist_km,
           ROW_NUMBER() OVER (
               PARTITION BY c_custkey ORDER BY dist_km, s_suppkey
           ) AS rn
    FROM scored
    WHERE dist_km <= {GEO_RADIUS_KM}
)
SELECT c_custkey, s_suppkey, dist_km FROM ranked WHERE rn = 1
ORDER BY c_custkey
"""


GRID_DENSITY_TOPK = 50


def q_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density map: bin event actors into 1°×1° grid cells and
    report the GRID_DENSITY_TOPK hottest cells — the heatmap backing
    query.

    One hash aggregate over integer cell ids (map-side combined: the
    shuffle carries cells, not events) then a distributed top-k
    (TakeOrdered — never a global sort of the cell table). Event count,
    distinct actors, and mean value per cell. At 100 TB the shuffle
    volume is |occupied cells| × partitions, independent of row count.

    The per-cell mean follows the repo's exact-decimal aggregate policy
    (functions/numeric.py): ``value`` carries exactly 2 decimals, so the
    sum is an EXACT integer in cents and the published mean is the exact
    integer floor of avg·10⁴, converted back to a double (integer ≤ 2⁵³
    → exact conversion, /10⁴ correctly rounded — bit-identical on any
    engine). ``ROUND(AVG(double), 4)`` is NOT safe here: a 2-dp column
    averaged over n rows lands EXACTLY on the 4-dp half-boundary
    whenever n divides the cents sum into ...X5·10⁻⁴ (measured at
    sf0.1: cell (57,-172), n=80, avg·10⁴ = 456352.5 exactly), where the
    float summation order — which differs per engine AND per partition
    layout — decides the 4th decimal.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "value", "event_id"
    )
    binned = ev.select(
        F.floor(_lat_expr(F.col("user_id"))).cast("long").alias("cell_lat"),
        F.floor(_lon_expr(F.col("user_id"))).cast("long").alias("cell_lon"),
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        binned.groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "cell_lat",
            "cell_lon",
            "n_events",
            "n_users",
            # exact truncating integer division of avg·1e4 (Spark DIV
            # and DuckDB // both truncate toward zero; == floor here
            # because value, hence sum_cents, is non-negative in the
            # events fixture), then an exact int→double conversion and
            # one correctly-rounded division — no float summation
            # anywhere
            (
                F.expr("(sum_cents * 100) DIV n_events").cast("double")
                / 10000.0
            ).alias("avg_value"),
        )
        .orderBy(
            F.col("n_events").desc(), F.col("cell_lat"), F.col("cell_lon")
        )
        .limit(GRID_DENSITY_TOPK)
    )


ORACLE_GEO_GRID_DENSITY = f"""
WITH cells AS (
    SELECT CAST(FLOOR({_sql_lat("user_id")}) AS BIGINT) AS cell_lat,
           CAST(FLOOR({_sql_lon("user_id")}) AS BIGINT) AS cell_lon,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_cents
    FROM events
    GROUP BY 1, 2
)
SELECT cell_lat, cell_lon, n_events, n_users,
       CAST((sum_cents * 100) // n_events AS DOUBLE) / 10000.0 AS avg_value
FROM cells
ORDER BY n_events DESC, cell_lat, cell_lon
LIMIT {GRID_DENSITY_TOPK}
"""


def q_geo_trajectory_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory statistics — hop count, total and maximum
    great-circle hop — the movement-summary pass of any
    location-events pipeline (fraud velocity checks, delivery-route
    audits). Event positions derive from event_id via the module's
    deterministic key→coordinate map.

    Plan: ONE lag window per user (ordered by ts, event_id — bounded
    by per-user history, no global window), haversine on the
    consecutive pair, then a map-side-combined per-user aggregate.
    Determinism: each hop is rounded to INTEGER METERS before any
    aggregation, so the per-user totals are exact integer sums under
    any summation order — no float rounding contract on the
    aggregates at all.
    """
    from pyspark.sql import Window as W

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pts = ev.select(
        "user_id",
        "ts",
        "event_id",
        _lat_expr(F.col("event_id")).alias("lat"),
        _lon_expr(F.col("event_id")).alias("lon"),
    ).select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )
    hops = pts.filter(F.col("plat").isNotNull()).select(
        "user_id",
        F.round(
            _haversine_expr(
                F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")
            )
            * 1000.0
        )
        .cast("long")
        .alias("hop_m"),
    )
    return (
        hops.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hops"),
            F.sum("hop_m").alias("total_m"),
            F.max("hop_m").alias("max_hop_m"),
        )
        .orderBy("user_id")
    )


_EV_LAT = _sql_lat("event_id")
_EV_LON = _sql_lon("event_id")

ORACLE_GEO_TRAJECTORY_LENGTH = f"""
WITH pts AS (
    SELECT user_id, {_EV_LAT} AS lat, {_EV_LON} AS lon,
           LAG({_EV_LAT}) OVER w AS plat,
           LAG({_EV_LON}) OVER w AS plon
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), hops AS (
    SELECT user_id,
           CAST(ROUND({_sql_haversine("plat", "plon", "lat", "lon")} * 1000.0)
                AS BIGINT) AS hop_m
    FROM pts WHERE plat IS NOT NULL
)
SELECT user_id, COUNT(*) AS n_hops,
       CAST(SUM(hop_m) AS BIGINT) AS total_m,
       CAST(MAX(hop_m) AS BIGINT) AS max_hop_m
FROM hops
GROUP BY user_id
ORDER BY user_id
"""


def q_geo_position_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last known position at the time of each purchase — the trajectory
    as-of join (fraud geo-velocity checks, delivery ETA baselines:
    "where was this user when they bought?").

    Composition of this module's key→coordinate map with temporal.py's
    as-of machinery: position FIXES are the user's non-purchase events
    (coordinates derived from the fix's event_id), PROBES are purchases,
    and the match is the one-shuffle union-sort-window backward as-of —
    every row shuffles once on user_id, one ignorenulls last() fill
    resolves each probe, no range join and no per-probe subquery. Inner
    semantics: a purchase before the user's first fix drops out.

    Determinism: fixes are first made UNIQUE per (user, ts) (max
    event_id — both engines agree), so equal-timestamp ties can't pick
    different fixes per engine; coordinates are the module's exact
    integer-derived doubles (no trig), and staleness is an exact integer
    microsecond difference. Nothing in the output has a rounding
    contract at all.

    At 100 TB: identical scale story to q_asof_join — one hash shuffle
    by user, per-user sorted windows, payload carried as a struct; a
    hot user salts like any skewed window key.
    """
    from pyspark.sql import Window as W

    ev = load_tables(spark, sf_dir)["events"]
    fixes = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("fix_id"))
    )
    build_t = "struct<fix_ts:timestamp,fix_id:bigint>"
    builds = fixes.select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.struct(
            F.col("ts").alias("fix_ts"), F.col("fix_id").alias("fix_id")
        ).alias("build"),
        F.lit(0).alias("is_probe"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast(build_t).alias("build"),
        F.lit(1).alias("is_probe"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe")  # builds first at equal ts: inclusive
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = probes.unionByName(builds).withColumn(
        "m", F.last("build", ignorenulls=True).over(w)
    )
    m = F.col("m")
    return (
        filled.filter((F.col("is_probe") == 1) & m.isNotNull())
        .select(
            "event_id",
            "user_id",
            m.getField("fix_id").alias("fix_id"),
            _lat_expr(m.getField("fix_id")).alias("lat"),
            _lon_expr(m.getField("fix_id")).alias("lon"),
            (
                F.unix_micros("ts") - F.unix_micros(m.getField("fix_ts"))
            ).alias("staleness_us"),
        )
        .orderBy("event_id")
    )


ORACLE_GEO_POSITION_ASOF = f"""
WITH ev AS (
    SELECT event_id, user_id, event_type,
           CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts
    FROM events
),
fixes AS (
    SELECT user_id, ts, MAX(event_id) AS fix_id
    FROM ev WHERE event_type <> 'purchase'
    GROUP BY user_id, ts
),
p AS (
    SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, f.fix_id,
       {_sql_lat("f.fix_id")} AS lat,
       {_sql_lon("f.fix_id")} AS lon,
       epoch_us(p.ts) - epoch_us(f.ts) AS staleness_us
FROM p ASOF JOIN fixes f
  ON p.user_id = f.user_id AND f.ts <= p.ts
ORDER BY p.event_id
"""


def oracles() -> dict[str, tuple]:
    return {
        "geo_nearest_facility": (
            q_geo_nearest_facility,
            ORACLE_GEO_NEAREST_FACILITY,
        ),
        "geo_grid_density": (q_geo_grid_density, ORACLE_GEO_GRID_DENSITY),
        "geo_trajectory_length": (
            q_geo_trajectory_length,
            ORACLE_GEO_TRAJECTORY_LENGTH,
        ),
        "geo_position_asof": (q_geo_position_asof, ORACLE_GEO_POSITION_ASOF),
    }
