"""Z-order clustering: every file covers a bounded min/max band on ALL
z-ordered columns, enabling footer-level skipping for filters on any of
them — unlike a single-column sort, which leaves every other column
spanning the full range in every file.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from dbms_query_optimizer_spark.engine import load_tables
from dbms_query_optimizer_spark.sources import (
    write_sorted_parquet,
    write_zorder_parquet,
)

N_FILES = 8


def _file_bands(path: str, col: str) -> list[tuple]:
    """(min, max) of col per parquet file, from footer stats only."""
    bands = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = next(
                md.row_group(rg).column(i).statistics
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(stats.min)
            maxs.append(stats.max)
        bands.append((min(mins), max(maxs)))
    return bands


def _mean_band_frac(bands, lo, hi) -> float:
    rng = hi - lo
    return sum((b_hi - b_lo) / rng for b_lo, b_hi in bands) / len(bands)


def test_zorder_bounds_both_dimensions(spark, sf_dir, tmp_path):
    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo_k, hi_k, lo_p, hi_p = orders.agg(
        *[f("o_custkey") for f in (_min, _max)],
        *[f("o_totalprice") for f in (_min, _max)],
    ).first()

    zpath = str(tmp_path / "orders_z")
    write_zorder_parquet(orders, zpath, ["o_custkey", "o_totalprice"], N_FILES)
    spath = str(tmp_path / "orders_sorted")
    write_sorted_parquet(orders, spath, ["o_custkey"], N_FILES)

    # z-order: both dims materially narrower than full range per file
    z_key = _mean_band_frac(_file_bands(zpath, "o_custkey"), lo_k, hi_k)
    z_price = _mean_band_frac(_file_bands(zpath, "o_totalprice"), lo_p, hi_p)
    assert z_key < 0.7, f"o_custkey mean band {z_key:.2f} not bounded"
    assert z_price < 0.7, f"o_totalprice mean band {z_price:.2f} not bounded"

    # single-key sort: sort key tight, but the OTHER dim spans ~everything
    s_key = _mean_band_frac(_file_bands(spath, "o_custkey"), lo_k, hi_k)
    s_price = _mean_band_frac(_file_bands(spath, "o_totalprice"), lo_p, hi_p)
    assert s_key < 0.3
    assert s_price > 0.9, "single-key sort should NOT bound the second dim"

    # clustering is a layout change only: content round-trips exactly
    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)


def _min(c):
    from pyspark.sql import functions as F

    return F.min(c)


def _max(c):
    from pyspark.sql import functions as F

    return F.max(c)
