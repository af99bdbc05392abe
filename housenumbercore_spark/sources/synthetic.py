"""Deterministic synthetic geo world, derived from the driver's parquet tables.

The sandbox provides only TPC-H-ish tables (TESTDATA.md); the engine's
domain is points vs admin polygons (reference domain: OSM address objects vs
`gebiete` boundary rows, /root/reference/scripts/dbinstallation/
dbstructure.sql:65-78). This module derives that world *deterministically and
SQL-expressibly* from the driver tables, so the DuckDB oracle can recompute
the identical inputs from the same views and the correctness gate covers the
whole spatial pipeline end to end:

- ``points``  — one point per ``orders`` row; lon/lat from integer-arithmetic
  mixing of ``o_orderkey`` (float64 ops written identically on both engines).
  ~30% of points land in a deliberately hot micro-region (skew, mirroring the
  urban hot cells that trip the reference's 60 s slow-query warning,
  MunicipalityJobs.java:314-318).
- ``areas``   — a nested admin hierarchy like ``gebiete``: 25 municipalities
  (admin_level 8, from ``nation``) in a 5×5 grid and 5 districts
  (admin_level 6, from ``region``) as grid rows; overlapping by design —
  every point belongs to one level-8 AND one level-6 area, as in the
  reference (a point falls in multiple admin levels, SURVEY.md §7.3).

The engine consumes areas as real WKB polygons through the generic
cover+refine machinery; the oracle uses the rectangle arithmetic directly.

Offsets include +0.5 so derived coordinates never land exactly on a cell or
area boundary (keeps Spark/DuckDB float64 comparisons bit-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import geometry as G

# world bbox (Aachen-ish)
LON0, LAT0 = 6.0, 50.0
LON_SPAN, LAT_SPAN = 1.6, 1.0
GRID = 5  # 5x5 municipalities
CELL_W = LON_SPAN / GRID  # 0.32
CELL_H = LAT_SPAN / GRID  # 0.2

# hot micro-region: ~30% of points inside one ~2km box (skew driver)
HOT_LON0, HOT_LAT0, HOT_SPAN = 6.40, 50.50, 0.02

_MIX_A = 9973
_MIX_B = 7919
_MOD = 100000


def points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic points: (point_id, lon, lat, hot) from orders."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    u = ((k * _MIX_A) % _MOD + 0.5) / float(_MOD)
    v = ((k * _MIX_B) % _MOD + 0.5) / float(_MOD)
    hot = (k % 10) < 3
    lon = F.when(hot, u * HOT_SPAN + HOT_LON0).otherwise(u * LON_SPAN + LON0)
    lat = F.when(hot, v * HOT_SPAN + HOT_LAT0).otherwise(v * LAT_SPAN + LAT0)
    return orders.select(
        k.alias("point_id"),
        lon.alias("lon"),
        lat.alias("lat"),
        hot.cast("boolean").alias("hot"),
    )


def points_sql() -> str:
    """DuckDB subquery computing the identical points from the orders view."""
    u = f"(((o_orderkey * {_MIX_A}) % {_MOD}) + 0.5) / {_MOD}.0"
    v = f"(((o_orderkey * {_MIX_B}) % {_MOD}) + 0.5) / {_MOD}.0"
    hot = "(o_orderkey % 10) < 3"
    lon = f"CASE WHEN {hot} THEN ({u}) * {HOT_SPAN!r} + {HOT_LON0!r} ELSE ({u}) * {LON_SPAN!r} + {LON0!r} END"
    lat = f"CASE WHEN {hot} THEN ({v}) * {HOT_SPAN!r} + {HOT_LAT0!r} ELSE ({v}) * {LAT_SPAN!r} + {LAT0!r} END"
    return (
        f"(SELECT o_orderkey AS point_id, {lon} AS lon, {lat} AS lat, "
        f"CAST({hot} AS BOOLEAN) AS hot FROM orders)"
    )


def areas_df(spark: SparkSession, sf_dir: str, with_wkb: bool = True) -> DataFrame:
    """Admin areas: 25 municipalities (level 8) + 5 districts (level 6).

    Columns: area_id, name, admin_level, xmin, ymin, xmax, ymax
    [, polygon WKB]. Rectangles in the arithmetic columns are authoritative;
    the WKB payload is the same rectangle as a closed ring for the generic
    polygon path.
    """
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    muni = nation.select(
        (F.col("n_nationkey") + 100).alias("area_id"),
        F.col("n_name").alias("name"),
        F.lit(8).alias("admin_level"),
        (F.lit(LON0) + (F.col("n_nationkey") % GRID) * CELL_W).alias("xmin"),
        (F.lit(LAT0) + F.floor(F.col("n_nationkey") / GRID) * CELL_H).alias("ymin"),
    ).withColumns(
        {"xmax": F.col("xmin") + CELL_W, "ymax": F.col("ymin") + CELL_H}
    )
    dist = region.select(
        (F.col("r_regionkey") + 10).alias("area_id"),
        F.col("r_name").alias("name"),
        F.lit(6).alias("admin_level"),
        F.lit(LON0).alias("xmin"),
        (F.lit(LAT0) + F.col("r_regionkey") * CELL_H).alias("ymin"),
        F.lit(LON0 + LON_SPAN).alias("xmax"),
        (F.lit(LAT0) + (F.col("r_regionkey") + 1) * CELL_H).alias("ymax"),
    )
    out = muni.unionByName(dist)
    if with_wkb:
        out = out.withColumn(
            "polygon", box_wkb_udf()("xmin", "ymin", "xmax", "ymax")
        )  # dimension-side only: 30 rows, never on the fact path
    return out


def box_wkb_udf():
    """Arrow-batched rectangle→WKB constructor (keeps even dim-side plans
    free of row-at-a-time BatchEvalPython)."""
    import pandas as pd

    def _box(xmin, ymin, xmax, ymax):
        return pd.Series(
            [
                G.box_wkb(a, b, c, d)
                for a, b, c, d in zip(xmin, ymin, xmax, ymax)
            ]
        )

    return F.pandas_udf(_box, "binary")


def areas_sql() -> str:
    """DuckDB subquery for the identical areas (arithmetic columns only).

    Every float literal is CAST to DOUBLE: a bare ``0.32`` parses as
    DECIMAL in DuckDB and the whole expression then evaluates in EXACT
    decimal arithmetic, diverging from Spark's float64 by 1 ulp on 10 of
    the 30 xmax/ymax bounds (e.g. DECIMAL 6.64 vs float64
    6.640000000000001) — a point whose lon lands in that window would be
    inside for one engine and outside for the other. The casts force the
    same left-associated float64 operations Spark performs."""
    def D(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    muni = (
        f"SELECT n_nationkey + 100 AS area_id, n_name AS name, 8 AS admin_level, "
        f"{D(LON0)} + (n_nationkey % {GRID}) * {D(CELL_W)} AS xmin, "
        f"{D(LAT0)} + FLOOR(n_nationkey / {GRID}) * {D(CELL_H)} AS ymin, "
        f"{D(LON0)} + (n_nationkey % {GRID}) * {D(CELL_W)} + {D(CELL_W)} AS xmax, "
        f"{D(LAT0)} + FLOOR(n_nationkey / {GRID}) * {D(CELL_H)} + {D(CELL_H)} AS ymax "
        f"FROM nation"
    )
    dist = (
        f"SELECT r_regionkey + 10 AS area_id, r_name AS name, 6 AS admin_level, "
        f"{D(LON0)} AS xmin, {D(LAT0)} + r_regionkey * {D(CELL_H)} AS ymin, "
        f"{D(LON0 + LON_SPAN)} AS xmax, "
        f"{D(LAT0)} + (r_regionkey + 1) * {D(CELL_H)} AS ymax FROM region"
    )
    return f"(({muni}) UNION ALL ({dist}))"
