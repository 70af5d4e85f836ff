"""Rounding-boundary audit for the geo family (r6 verdict task 3).

The two trig-based geo queries publish ``ROUND(haversine, 4)`` /
``ROUND(haversine·1000)`` values and rely on the JVM's and DuckDB's libm
producing sin/cos/asin/sqrt chains that agree to within a few ulps. The
rounding absorbs that divergence ONLY away from half-boundaries: a pair
whose pre-rounding distance sits within ~1 ulp of a ``.xxxx5`` (or
half-metre) boundary could round differently per engine and flip the
driver hash — set membership at the 400 km radius edge, or an argmin
tie.

This gate measures the actual margin: for every candidate value, the
distance from the rounding half-boundary in units of the value's own ulp
(2⁻⁵² relative). libm implementations disagree by ~1-2 ulps per call and
the haversine chain is 8 calls deep, so a margin above ``MIN_ULPS = 256``
makes a cross-engine flip impossible with two orders of magnitude to
spare. Measured margins (2026-08-15, the full pair/hop population):

====================  =========  =========
query                 sf0.01     sf0.1
====================  =========  =========
geo_nearest_facility  1.07e6     2341
geo_trajectory_length 7.7e4      1502
====================  =========  =========

The min margin shrinks roughly as 1/|pairs| (more pairs sample the
boundary neighborhood), so at sf10 the expected floor is ~20 ulps —
if the fixture ever scales past sf1, quantize the trig INPUTS to a
shared integer micro-degree domain instead (the corpus_mix_build
IEEE-pinning trick) rather than loosening MIN_ULPS.

``geo_grid_density`` is absent by design: its mean is computed entirely
in exact integer cents (no float summation, no libm), after the audit
found its former ``ROUND(AVG(value), 4)`` sitting EXACTLY on the 4-dp
half-boundary at sf0.1 (cell (57,-172): n=80, avg·10⁴ = 456352.5).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.operators import geo

MIN_ULPS = 256.0


def _min_margin_ulps(df, xcol: str) -> float:
    """Min distance of x from its round-half boundary, in ulps of x.

    ``round(x)`` / ``round(x, k)`` flips when frac(x·10ᵏ) crosses 0.5;
    the caller passes x already scaled so the boundary is at frac = 0.5.
    """
    x = F.col(xcol)
    frac = x - F.floor(x)
    margin = F.abs(frac - F.lit(0.5))
    ulp = x * F.lit(2.0**-52)
    row = (
        df.filter(x > 0)
        .select((margin / ulp).alias("m_ulps"))
        .agg(F.min("m_ulps").alias("m"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert row["n"] > 0, "margin audit saw zero candidates"
    return row["m"]


def test_nearest_facility_round4_margin(spark, sf_dir):
    """Every point×facility pair inside (radius + 1 km) keeps its
    pre-rounding distance ≥ MIN_ULPS away from a 4-dp half-boundary, so
    a few-ulp libm divergence can never flip the rounded distance — and
    with it the ≤400.0 membership test or a rounded-tie argmin."""
    t = load_tables(spark, sf_dir)
    pts = t["customer"].select(
        geo._lat_expr(F.col("c_custkey")).alias("lat"),
        geo._lon_expr(F.col("c_custkey")).alias("lon"),
    )
    fac = t["supplier"].select(
        geo._lat_expr(F.col("s_suppkey") * 13).alias("flat"),
        geo._lon_expr(F.col("s_suppkey") * 13).alias("flon"),
    )
    # the UNBLOCKED pair population (the oracle's view): every pair that
    # could appear on either side of the radius edge or in an argmin
    pairs = (
        pts.crossJoin(fac)
        .select(
            geo._haversine_expr(
                F.col("lat"), F.col("lon"), F.col("flat"), F.col("flon")
            ).alias("d")
        )
        .filter(F.col("d") <= geo.GEO_RADIUS_KM + 1.0)
        .select((F.col("d") * 1e4).alias("x"))
    )
    m = _min_margin_ulps(pairs, "x")
    assert m > MIN_ULPS, (
        f"nearest-facility ROUND(dist,4) margin {m:.1f} ulps < {MIN_ULPS}: "
        "a libm divergence could flip a rounded distance — quantize the "
        "trig inputs (integer micro-degrees) before loosening this gate"
    )


def test_trajectory_integer_metre_margin(spark, sf_dir):
    """Every consecutive-event hop keeps its metre value ≥ MIN_ULPS away
    from a half-metre boundary, so ROUND(d·1000) is engine-independent
    and the integer per-user sums stay exact."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lat = geo._lat_expr(F.col("event_id"))
    lon = geo._lon_expr(F.col("event_id"))
    p = ev.select(
        lat.alias("lat"),
        lon.alias("lon"),
        F.lag(lat).over(w).alias("plat"),
        F.lag(lon).over(w).alias("plon"),
    ).filter(F.col("plat").isNotNull())
    hops = p.select(
        (
            geo._haversine_expr(
                F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")
            )
            * 1000.0
        ).alias("x")
    )
    m = _min_margin_ulps(hops, "x")
    assert m > MIN_ULPS, (
        f"trajectory ROUND(d*1000) margin {m:.1f} ulps < {MIN_ULPS}: "
        "a libm divergence could flip an integer-metre hop — quantize "
        "the trig inputs before loosening this gate"
    )


def test_grid_density_mean_is_exact_integer_arithmetic(spark, sf_dir):
    """The published per-cell mean must be reproducible from exact
    integer cents with NO float aggregation: avg_value·10⁴ is an integer
    and equals (sum_cents·100) DIV n_events for every output cell."""
    rows = geo.q_geo_grid_density(spark, sf_dir).collect()
    assert rows, "grid density returned no cells"
    for r in rows:
        # recover the integer: k/1e4 round-trips through float with error
        # far below 0.5, so round() identifies k uniquely
        k = round(r["avg_value"] * 10000.0)
        assert r["avg_value"] == float(k) / 1e4, (
            f"cell ({r['cell_lat']},{r['cell_lon']}): avg_value "
            f"{r['avg_value']!r} is not an exact int/10⁴ — the exact-cents "
            "path was replaced by a float aggregate"
        )
