"""Boundary-relation candidate selection (W2) + AGS key matching (F5).

The reference picks, among candidate admin relations for a municipality
lookup, the one with the longest matched original official key, then exact
name match, then lowest admin_level (/root/reference/src/de/regioosm/
housenumbercore/util/MunicipalityArea.java:356-449;
theoreticalhousenumbercore/TheoreticalHousenumbers.java:404-456). AGS keys
are normalized by stripping spaces and right-padding to 8 with zeros
(MunicipalityArea.java:294-306) and matched in stripped/spaced variants
(TheoreticalHousenumbers.java:344-358, 403-422).

Spark-first: one window rank over the candidate set instead of nested
fallback queries per municipality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def suburbs_within_buffered(
    suburbs: DataFrame, containers: DataFrame, buffer_deg: float = 0.03
) -> DataFrame:
    """J3: suburb-polygon-in-buffered-municipality join.

    Reference: `ST_Within(way, ST_Buffer(muni_poly, 0.03))`
    (MunicipalityArea.java:675-709). Spark-first: both sides are dimension
    tables (admin areas), so this is a broadcast cross join + vectorized
    geometry refine — never a shuffle.

    APPROXIMATION, stated plainly: the refine checks every suburb-polygon
    vertex against the buffered bounding BOX of the container (the
    ``containers`` input carries only bbox columns), not the buffered
    container POLYGON the reference uses. The two verdicts coincide when
    the container is (near-)rectangular — true for this engine's synthetic
    worlds and common for small communes — but an L-shaped municipality
    admits suburbs sitting in its concave notch that ST_Buffer(muni_poly)
    would reject. Closing that gap needs the container polygons in the
    input and a vertex distance-to-polygon ≤ buffer test (point ∈
    buffered polygon ⟺ distance(point, polygon) ≤ buffer); the bbox form
    is kept as the committed oracle semantics.

    suburbs:    (area_id, name, polygon WKB)
    containers: (area_id, name, xmin, ymin, xmax, ymax)
    → (suburb_id, suburb_name, district_id, district_name)
    """
    import pandas as pd

    from ..geo import geometry as G

    s = suburbs.select(
        F.col("area_id").alias("suburb_id"),
        F.col("name").alias("suburb_name"),
        "polygon",
    )
    c = containers.select(
        F.col("area_id").alias("district_id"),
        F.col("name").alias("district_name"),
        (F.col("xmin") - buffer_deg).alias("bxmin"),
        (F.col("ymin") - buffer_deg).alias("bymin"),
        (F.col("xmax") + buffer_deg).alias("bxmax"),
        (F.col("ymax") + buffer_deg).alias("bymax"),
    )

    def _within(wkb, bxmin, bymin, bxmax, bymax):
        import numpy as np

        out = np.zeros(len(wkb), dtype=bool)
        for i in range(len(wkb)):
            buffered = G.parse_wkb(
                G.box_wkb(bxmin.iloc[i], bymin.iloc[i], bxmax.iloc[i], bymax.iloc[i])
            )
            ok = True
            for p in G.to_polygons(G.parse_wkb(wkb.iloc[i])):
                for ring in p.rings:
                    inside = G.covers(buffered, ring[:, 0], ring[:, 1])
                    if not bool(inside.all()):
                        ok = False
                        break
                if not ok:
                    break
            out[i] = ok
        return pd.Series(out)

    within_udf = F.pandas_udf(_within, "boolean")
    joined = s.crossJoin(F.broadcast(c))
    return joined.filter(
        within_udf("polygon", "bxmin", "bymin", "bxmax", "bymax")
    ).select("suburb_id", "suburb_name", "district_id", "district_name")


def polygon_union_stats(
    parts: DataFrame, rel_col: str = "rel_id", wkb_col: str = "part_wkb"
) -> DataFrame:
    """A3 + A8: assemble boundary-relation parts into one multipolygon and
    derive its label stats (n_parts, area, area-weighted centroid).

    Reference: iterative pairwise `ST_Union` over relation members
    (MunicipalityArea.java:517-537) followed by `ST_Centroid`
    (TheoreticalHousenumbers.java:856-869). Spark-first: one hash groupBy on
    the relation id (partial aggregation map-side, parts of one relation
    colocate after a single shuffle), union + centroid vectorized per group
    in Arrow batches — no per-part round trips.
    """
    from ..geo import geometry as G

    def _stats(pdf):
        import pandas as pd

        merged = G.union_as_multipolygon(list(pdf[wkb_col]))
        geom = G.parse_wkb(merged)
        cx, cy = G.polygon_centroid(geom)
        area = sum(
            abs(G.ring_area(ring)) * (1 if i == 0 else -1)
            for p in G.to_polygons(geom)
            for i, ring in enumerate(p.rings)
        )
        return pd.DataFrame(
            {
                rel_col: [pdf[rel_col].iloc[0]],
                "n_parts": [len(pdf)],
                "area_deg2": [area],
                "centroid_lon": [cx],
                "centroid_lat": [cy],
            }
        )

    schema = (
        f"{rel_col} long, n_parts long, area_deg2 double, "
        "centroid_lon double, centroid_lat double"
    )
    return parts.groupBy(rel_col).applyInPandas(_stats, schema)


def best_boundary_candidate(cands: DataFrame, query_col: str = "query_id") -> DataFrame:
    """rank=1 per query over (matched_key_len DESC, name_match DESC,
    admin_level ASC, rel_id ASC) — W2's precedence, made deterministic."""
    w = W.partitionBy(query_col).orderBy(
        F.desc("matched_key_len"),
        F.desc("name_match"),
        F.asc("admin_level"),
        F.asc("rel_id"),
    )
    return (
        cands.withColumn("boundary_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("boundary_rank") == 1)
        .drop("boundary_rank")
    )
