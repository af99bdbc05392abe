"""Deterministic synthetic address world (official list + OSM side), derived
from the driver tables with identical arithmetic in Spark and DuckDB SQL —
so the whole match-evaluation pipeline is value-checked by the oracle.

Shape mirrors the reference's fact tables: `stadt_hausnummern` (official,
dbstructure.sql:142-160) and the planet_* address scans
(TheoreticalHousenumbers.java:874-1323):

- 25 jobs (municipalities), 40 street names shared by both sides;
- housenumbers with case-varying suffixes ('a' vs 'A') to exercise the
  per-municipality case-exactness flag (dbstructure.sql:46; even job_id →
  exact 'y', odd → 'n');
- OSM side carries building/entrance/amenity columns for the tag-priority
  ladder (kept as flat columns so the oracle can reproduce the priority in
  SQL; the engine ALSO assembles them into a MapType tags column and derives
  the priority through the hstore path to exercise P1/P2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_JOBS = 25
N_STREETS = 40
N_HNR = 150


def official_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Official list rows from ``customer`` (duplicates present on purpose —
    dedup is part of the pipeline)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    base = (k % N_HNR + 1).cast("string")
    suffix = (
        F.when(k % 9 == 0, "a").when(k % 9 == 1, "A").when(k % 9 == 2, "b").otherwise("")
    )
    return c.select(
        k.alias("source_id"),
        (k % N_JOBS).cast("long").alias("job_id"),
        F.concat(F.lit("Street "), (k % N_STREETS).cast("string")).alias("street"),
        F.concat(base, suffix).alias("housenumber"),
    )


def official_sql() -> str:
    k = "c_custkey"
    base = f"CAST({k} % {N_HNR} + 1 AS VARCHAR)"
    suffix = (
        f"CASE WHEN {k} % 9 = 0 THEN 'a' WHEN {k} % 9 = 1 THEN 'A' "
        f"WHEN {k} % 9 = 2 THEN 'b' ELSE '' END"
    )
    return (
        f"(SELECT {k} AS source_id, CAST({k} % {N_JOBS} AS BIGINT) AS job_id, "
        f"'Street ' || CAST({k} % {N_STREETS} AS VARCHAR) AS street, "
        f"{base} || {suffix} AS housenumber FROM customer)"
    )


def osm_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OSM-side address objects from ``lineitem`` (larger, with tag columns)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok = F.col("l_orderkey")
    oid = (ok * 10 + F.col("l_linenumber")).cast("long")
    base = (ok % N_HNR + 1).cast("string")
    suffix = (
        F.when(ok % 9 == 0, "a").when(ok % 9 == 1, "a").when(ok % 9 == 2, "B").otherwise("")
    )
    building = (
        F.when(F.col("l_linenumber") % 5 == 0, "yes")
        .when(F.col("l_linenumber") % 5 == 1, "apartments")
        .when(F.col("l_linenumber") % 5 == 2, "shed")
        .otherwise(F.lit(None).cast("string"))
    )
    entrance = F.when(ok % 7 == 0, "main").otherwise(F.lit(None).cast("string"))
    amenity = F.when(ok % 11 == 0, "school").otherwise(F.lit(None).cast("string"))
    return li.select(
        oid.alias("osm_id"),
        (F.col("l_partkey") % N_JOBS).cast("long").alias("job_id"),
        F.concat(F.lit("Street "), (F.col("l_suppkey") % N_STREETS).cast("string")).alias(
            "street"
        ),
        F.concat(base, suffix).alias("housenumber"),
        building.alias("building"),
        entrance.alias("entrance"),
        amenity.alias("amenity"),
    )


def osm_sql() -> str:
    ok = "l_orderkey"
    base = f"CAST({ok} % {N_HNR} + 1 AS VARCHAR)"
    suffix = (
        f"CASE WHEN {ok} % 9 = 0 THEN 'a' WHEN {ok} % 9 = 1 THEN 'a' "
        f"WHEN {ok} % 9 = 2 THEN 'B' ELSE '' END"
    )
    building = (
        "CASE WHEN l_linenumber % 5 = 0 THEN 'yes' "
        "WHEN l_linenumber % 5 = 1 THEN 'apartments' "
        "WHEN l_linenumber % 5 = 2 THEN 'shed' ELSE NULL END"
    )
    entrance = f"CASE WHEN {ok} % 7 = 0 THEN 'main' ELSE NULL END"
    amenity = f"CASE WHEN {ok} % 11 = 0 THEN 'school' ELSE NULL END"
    return (
        f"(SELECT CAST({ok} * 10 + l_linenumber AS BIGINT) AS osm_id, "
        f"CAST(l_partkey % {N_JOBS} AS BIGINT) AS job_id, "
        f"'Street ' || CAST(l_suppkey % {N_STREETS} AS VARCHAR) AS street, "
        f"{base} || {suffix} AS housenumber, "
        f"{building} AS building, {entrance} AS entrance, {amenity} AS amenity "
        f"FROM lineitem)"
    )


def raw_housenumbers_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw official-list housenumber texts exercising every normalization
    path: ranges ("2-8"), multi-values ("1,3;5"), fraction additions
    ("47 1/2"), suffixes, reversed/unparseable ranges (expand to nothing —
    TheoreticalHousenumbers.Hausnummernbereich_aufloesen:292-316)."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey")
    s = (k % 40 + 2).cast("long")
    ss = s.cast("string")
    m = k % 7
    hnr = (
        F.when(m == 0, F.concat(ss, F.lit("-"), (s + 6).cast("string")))
        .when(m == 1, F.concat(ss, F.lit(","), (s + 2).cast("string"),
                               F.lit(";"), (s + 4).cast("string")))
        .when(m == 2, F.concat(ss, F.lit(" 1/2")))
        .when(m == 3, ss)
        .when(m == 4, F.concat(ss, F.lit("a")))
        .when(m == 5, F.concat((s + 6).cast("string"), F.lit("-"), ss))
        .otherwise(F.concat(ss, F.lit("-"), (s + 3).cast("string"), F.lit("x")))
    )
    return p.select(k.alias("rec_id"), hnr.alias("housenumber"))


def raw_housenumbers_sql() -> str:
    k, s = "p_partkey", "(p_partkey % 40 + 2)"
    ss = f"CAST({s} AS VARCHAR)"
    hnr = (
        f"CASE {k} % 7 "
        f"WHEN 0 THEN {ss} || '-' || CAST({s} + 6 AS VARCHAR) "
        f"WHEN 1 THEN {ss} || ',' || CAST({s} + 2 AS VARCHAR) || ';' || CAST({s} + 4 AS VARCHAR) "
        f"WHEN 2 THEN {ss} || ' 1/2' "
        f"WHEN 3 THEN {ss} "
        f"WHEN 4 THEN {ss} || 'a' "
        f"WHEN 5 THEN CAST({s} + 6 AS VARCHAR) || '-' || {ss} "
        f"ELSE {ss} || '-' || CAST({s} + 3 AS VARCHAR) || 'x' END"
    )
    return f"(SELECT {k} AS rec_id, {hnr} AS housenumber FROM part)"


def job_flags_df(spark: SparkSession) -> DataFrame:
    """Per-job housenumberaddition_exactly flag: even job → exact."""
    return spark.range(N_JOBS).select(
        F.col("id").alias("job_id"), (F.col("id") % 2 == 0).alias("exact")
    )


def job_flags_sql() -> str:
    return (
        f"(SELECT CAST(range AS BIGINT) AS job_id, (range % 2 = 0) AS exact "
        f"FROM range({N_JOBS}))"
    )
