"""Deterministic synthetic street network, derived from ``supplier``.

Mirrors the reference's street inputs (`planet_line` named-highway scan,
/root/reference/src/de/regioosm/housenumbercore/MunicipalityJobs.java:282-304;
`jobs_strassen` dbstructure.sql:110-123):

- one or two horizontal segments per supplier key (second segment shares an
  endpoint when k % 3 == 0, exercising linemerge);
- street *name* shared across suppliers (``Street k%40`` — ties into the
  synthetic address world) so name-grouping (A1) has real work;
- highway type cycles through whitelist and non-whitelist values (P4);
- blacklist = osm_id divisible by 97 (P5).

All arithmetic is reproducible in DuckDB SQL; segment geometry is exposed
both as flat coordinates (x0, y0, x1, y1 — oracle-friendly) and WKB
linestrings (engine path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import geometry as G
from . import synthetic as S

N_STREET_NAMES = 40
SEG_HALF = 0.005  # half-length in lon degrees

# sub-grid-step epsilon per 1000-block of s_suppkey (see the injectivity
# note in street_segments_df); exact powers of two in the divisor keep the
# product representable identically on both engines
_EPS_X = S.LON_SPAN / 1000.0 / 1048576.0
_EPS_Y = S.LAT_SPAN / 1000.0 / 1048576.0

# OSMStreet.java:89-101 / :203-217
HIGHWAY_WHITELIST = [
    "primary", "secondary", "tertiary", "unclassified", "residential",
    "living_street", "pedestrian", "service", "track",
]
_HIGHWAY_CYCLE = [
    "residential", "service", "track", "footway", "motorway",
    "primary", "secondary", "tertiary", "living_street", "pedestrian",
]


def street_segments_df(spark: SparkSession, sf_dir: str, with_wkb: bool = False) -> DataFrame:
    """(osm_id, street_key, name, highway, x0, y0, x1, y1 [, linestring])."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey")
    # The grid residues (k*31 % 1000, k*57 % 1000) repeat with period 1000
    # in s_suppkey, so above 1000 suppliers (sf > 0.1) two different
    # street_keys would produce byte-identical coordinates and the engine's
    # linemerge would stitch chains ACROSS street_keys while the oracle's
    # per-street_key chain CTE would not. The epsilon term — a sub-grid-
    # step offset proportional to floor(k/1000) — makes each coordinate
    # injective in k (for k < ~10⁹) while being EXACTLY 0.0 for k < 1000,
    # leaving every value at the tested scales bit-identical. Both engines
    # evaluate the same literal expression shape, so the doubles agree.
    eps_f = F.floor(k / F.lit(1000.0))
    cx = (
        F.lit(S.LON0) + ((k * 31) % 1000 + 0.5) / 1000.0 * S.LON_SPAN
        + eps_f * F.lit(_EPS_X)
    )
    cy = (
        F.lit(S.LAT0) + ((k * 57) % 1000 + 0.5) / 1000.0 * S.LAT_SPAN
        + eps_f * F.lit(_EPS_Y)
    )
    base = sup.select(
        k.alias("street_key"),
        F.concat(F.lit("Street "), (k % N_STREET_NAMES).cast("string")).alias("name"),
        F.element_at(
            F.array(*[F.lit(h) for h in _HIGHWAY_CYCLE]), (k % 10 + 1).cast("int")
        ).alias("highway"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    seg1 = base.select(
        (F.col("street_key") * 10).alias("osm_id"),
        "street_key", "name", "highway",
        (F.col("cx") - SEG_HALF).alias("x0"), F.col("cy").alias("y0"),
        (F.col("cx") + SEG_HALF).alias("x1"), F.col("cy").alias("y1"),
    )
    seg2 = base.filter(F.col("street_key") % 3 == 0).select(
        (F.col("street_key") * 10 + 1).alias("osm_id"),
        "street_key", "name", "highway",
        (F.col("cx") + SEG_HALF).alias("x0"), F.col("cy").alias("y0"),
        (F.col("cx") + 2 * SEG_HALF).alias("x1"), F.col("cy").alias("y1"),
    )
    out = seg1.unionByName(seg2)
    if with_wkb:
        import pandas as pd

        def _mk(x0, y0, x1, y1):
            return pd.Series(
                [
                    G.linestring_wkb([[a, b], [c, d]])
                    for a, b, c, d in zip(x0, y0, x1, y1)
                ]
            )

        mk = F.pandas_udf(_mk, "binary")  # dimension-scale table only
        out = out.withColumn("linestring", mk("x0", "y0", "x1", "y1"))
    return out


def street_segments_sql() -> str:
    k = "s_suppkey"
    eps = f"FLOOR({k} / 1000.0)"
    cx = (
        f"({S.LON0!r} + ((({k} * 31) % 1000) + 0.5) / 1000.0 * {S.LON_SPAN!r}"
        f" + {eps} * {_EPS_X!r})"
    )
    cy = (
        f"({S.LAT0!r} + ((({k} * 57) % 1000) + 0.5) / 1000.0 * {S.LAT_SPAN!r}"
        f" + {eps} * {_EPS_Y!r})"
    )
    hw = (
        "CASE " + " ".join(
            f"WHEN {k} % 10 = {i} THEN '{h}'" for i, h in enumerate(_HIGHWAY_CYCLE)
        ) + " END"
    )
    name = f"'Street ' || CAST({k} % {N_STREET_NAMES} AS VARCHAR)"
    seg1 = (
        f"SELECT CAST({k} * 10 AS BIGINT) AS osm_id, {k} AS street_key, "
        f"{name} AS name, {hw} AS highway, "
        f"{cx} - {SEG_HALF!r} AS x0, {cy} AS y0, "
        f"{cx} + {SEG_HALF!r} AS x1, {cy} AS y1 FROM supplier"
    )
    seg2 = (
        f"SELECT CAST({k} * 10 + 1 AS BIGINT) AS osm_id, {k} AS street_key, "
        f"{name} AS name, {hw} AS highway, "
        f"{cx} + {SEG_HALF!r} AS x0, {cy} AS y0, "
        f"{cx} + 2 * {SEG_HALF!r} AS x1, {cy} AS y1 FROM supplier "
        f"WHERE {k} % 3 = 0"
    )
    return f"(({seg1}) UNION ALL ({seg2}))"


def street_points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One representative point per street_key (segment-1 midpoint) — the
    kNN target set."""
    segs = street_segments_df(spark, sf_dir)
    return (
        segs.filter(F.col("osm_id") % 10 == 0)
        .select(
            "street_key",
            "name",
            ((F.col("x0") + F.col("x1")) / 2).alias("slon"),
            F.col("y0").alias("slat"),
        )
    )


def street_points_sql() -> str:
    return (
        f"(SELECT street_key, name, (x0 + x1) / 2 AS slon, y0 AS slat "
        f"FROM {street_segments_sql()} t WHERE osm_id % 10 = 0)"
    )
