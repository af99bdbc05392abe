"""Point-in-polygon spatial join via cell equi-join + exact refine.

This operator replaces the reference's per-municipality PostGIS queries —
``ST_Covers(polygon, point)`` over planet tables, one JDBC round-trip per
area (/root/reference/src/de/regioosm/theoreticalhousenumbercore/
TheoreticalHousenumbers.java:879-883, 1062-1065, 1195-1199) — with ONE
set-based plan over all areas at once:

1. **Cover** every admin polygon with grid cells at a join resolution
   (superset cover from the polygon's bbox, pruned to cells whose rectangle
   actually intersects the polygon). Distributed ``mapInPandas`` over the
   dimension; output is the narrow ``(cell, area_id)`` build side.
2. **Encode** every point's cell as pure column arithmetic (whole-stage
   codegen — zero Python on the fact path).
3. **Equi-join** fact.cell == dim.cell. The dimension side is broadcast by
   default (a 10⁵-polygon dim covers to a few million narrow rows ≪ the
   64 MB broadcast threshold), so the 10¹²-row fact side is *never
   shuffled*. For dims too large to broadcast, :func:`salted_cell_join`
   provides a shuffle join with hot-cell salting.
4. **Refine** candidates with the exact vectorized predicate
   (covers/contains, geo.geometry) inside an Arrow-batched ``mapInPandas``;
   polygons reach executors once via an explicit SparkContext broadcast,
   not per-row payload duplication.

Scale notes (100 TB / 1000 executors): the only wide operation in the whole
plan is whatever aggregation the caller adds afterwards; candidates stream
map-side through the broadcast join + refine. Cell-boundary correctness:
cover is a superset (bbox cells ∩ polygon-intersecting), so no candidate is
missed; the refine is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells as C
from ..geo import geometry as G

COVER_MAX_CELLS_PER_AREA = 256


def pick_join_res(areas: DataFrame, bbox_cols=("xmin", "ymin", "xmax", "ymax"),
                  max_cells: int = COVER_MAX_CELLS_PER_AREA, finest: int = 13) -> int:
    """One fixed join resolution for the whole dim: the finest res whose
    cover of the *median-sized* area stays under ``max_cells``. Single tiny
    aggregate on the dimension — not the fact table."""
    xmin, ymin, xmax, ymax = bbox_cols
    row = areas.select(
        F.expr(f"percentile({xmax} - {xmin}, 0.5)").alias("w"),
        F.expr(f"percentile({ymax} - {ymin}, 0.5)").alias("h"),
        F.min(xmin).alias("x0"), F.min(ymin).alias("y0"),
    ).collect()[0]
    return C.pick_cover_res(
        row.x0, row.y0, row.x0 + max(row.w, 1e-9), row.y0 + max(row.h, 1e-9),
        max_cells=max_cells, finest=finest,
    )


def cover_cells(
    areas: DataFrame,
    res: int,
    id_col: str = "area_id",
    wkb_col: str = "polygon",
) -> DataFrame:
    """Explode the polygon dimension into (cell, area_id) cover rows.

    Superset guarantee: every cell whose rectangle intersects the polygon's
    bbox is emitted unless the cell rectangle provably misses the polygon
    (all four corners outside AND no polygon vertex inside AND no edge
    crossing — tested via the exact kernel on the cell's corner ring).
    """
    out_schema = T.StructType(
        [
            T.StructField("cell", T.LongType(), False),
            T.StructField(id_col, areas.schema[id_col].dataType, False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out_cells: list[np.ndarray] = []
            out_ids: list[np.ndarray] = []
            for aid, wkb in zip(pdf[id_col].values, pdf[wkb_col].values):
                poly = G.parse_wkb(bytes(wkb))
                bx = poly.bbox()
                cand = C.cover_bbox(bx[0], bx[1], bx[2], bx[3], res)
                if len(cand) > 4:  # prune only when it pays
                    lo, la, hi, ha = C.cell_bounds(cand)
                    keep = np.zeros(len(cand), dtype=bool)
                    # corner-covered test (vectorized over 4 corners)
                    for cx, cy in ((lo, la), (hi, la), (hi, ha), (lo, ha),
                                   ((lo + hi) / 2, (la + ha) / 2)):
                        keep |= G.covers(poly, cx, cy)
                    # cells containing polygon vertices / crossed by edges
                    for p in G.to_polygons(poly):
                        for ring in p.rings:
                            vc = C.encode_cells(ring[:, 0], ring[:, 1], res)
                            keep |= np.isin(cand, vc)
                            # conservative: pad cells adjacent to ring cells
                            ring_cells = np.unique(vc)
                            if len(ring_cells):
                                padded = C.k_ring(ring_cells, 1).ravel()
                                keep |= np.isin(cand, padded)
                    cand = cand[keep]
                out_cells.append(cand)
                out_ids.append(np.full(len(cand), aid))
            if out_cells:
                yield pd.DataFrame(
                    {"cell": np.concatenate(out_cells), id_col: np.concatenate(out_ids)}
                )

    return areas.select(id_col, wkb_col).mapInPandas(gen, out_schema)


def refine_covers(
    cand: DataFrame,
    polygons: dict[int, bytes],
    spark,
    id_col: str = "area_id",
    lon: str = "lon",
    lat: str = "lat",
    predicate: str = "covers",
) -> DataFrame:
    """Exact point-in-polygon filter on cell-join candidates.

    ``polygons`` (area_id → WKB) is broadcast once per executor via
    SparkContext.broadcast; parsed geometries are cached per Python worker.
    """
    pred_fn = {"covers": G.covers, "contains": G.contains_point}[predicate]
    bc = spark.sparkContext.broadcast(polygons)
    schema = cand.schema

    def gen(batches):
        parsed: dict = {}
        pmap = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[lon].to_numpy(dtype=np.float64)
            py = pdf[lat].to_numpy(dtype=np.float64)
            for aid, idx in pdf.groupby(id_col, sort=False).indices.items():
                poly = parsed.get(aid)
                if poly is None:
                    poly = parsed[aid] = G.parse_wkb(bytes(pmap[aid]))
                keep[idx] = pred_fn(poly, px[idx], py[idx])
            yield pdf[keep]

    return cand.mapInPandas(gen, schema)


def assign_points_to_areas(
    spark,
    points: DataFrame,
    areas: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "area_id",
    wkb_col: str = "polygon",
    res: int | None = None,
    predicate: str = "covers",
    exact: bool = True,
) -> DataFrame:
    """points × areas spatial join: one output row per (point, covering area).

    Overlapping admin levels produce multiple rows per point by design
    (reference evaluates each area independently; SURVEY.md §7.3).
    """
    if res is None:
        res = pick_join_res(areas)
    dim = cover_cells(areas, res, id_col=id_col, wkb_col=wkb_col)
    pts = points.withColumn("__cell", C.cell_col(lon, lat, res))
    cand = pts.join(F.broadcast(dim), pts["__cell"] == dim["cell"], "inner").drop(
        "cell", "__cell"
    )
    if not exact:
        return cand
    polygons = {
        r[0]: bytes(r[1]) for r in areas.select(id_col, wkb_col).collect()
    }
    return refine_covers(cand, polygons, spark, id_col=id_col, lon=lon, lat=lat,
                         predicate=predicate)


def salted_cell_join(
    points: DataFrame,
    dim_cells: DataFrame,
    n_salt: int = 8,
    cell_col_name: str = "__cell",
) -> DataFrame:
    """Shuffle cell join with salting, for dimension sides too large to
    broadcast: fact rows pick ``salt = pmod(hash(point_id-ish cols), n_salt)``
    and the dim side is replicated n_salt times, so one hot urban cell
    spreads over ``n_salt`` reducers. AQE skew-join handles residual skew.
    """
    pts = points.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), n_salt))
    dim = dim_cells.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = pts.join(
        dim,
        (pts[cell_col_name] == dim["cell"]) & (pts["__salt"] == dim["__salt"]),
        "inner",
    )
    return joined.drop("__salt", "cell")


def tile_assign(points: DataFrame, res: int, lon: str = "lon", lat: str = "lat",
                out: str = "tile_id") -> DataFrame:
    """Raster-tile assignment: tile id = grid cell id at ``res`` (pure
    codegen). The raster↔vector association of the north rule is then a
    plain equi-join on tile_id."""
    return points.withColumn(out, C.cell_col(lon, lat, res))
