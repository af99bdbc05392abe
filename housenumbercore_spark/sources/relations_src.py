"""Synthetic associatedStreet relations (planet_rels shape), derived from
``supplier`` with identical arithmetic in Spark and DuckDB SQL.

Mirrors the reference's flat member arrays
(/root/reference/src/de/regioosm/theoreticalhousenumbercore/
TheoreticalHousenumbers.java:200-248): each relation carries 5 member ids
shaped like osm_df object ids (l_orderkey*10 + linenumber), so some members
resolve and some miss — both join paths are exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MEMBERS = 5


def relations_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    k = F.col("s_suppkey")
    members = F.expr(
        f"transform(sequence(0, {N_MEMBERS - 1}), "
        "i -> cast((s_suppkey * 3 + i) * 10 + i + 1 as bigint))"
    )
    return s.select(
        k.cast("long").alias("rel_id"),
        F.concat(F.lit("Street "), (k % 40).cast("string")).alias("name"),
        members.alias("members"),
    )


def relations_sql() -> str:
    members = (
        f"list_transform(generate_series(0, {N_MEMBERS - 1}), "
        "i -> CAST((s_suppkey * 3 + i) * 10 + i + 1 AS BIGINT))"
    )
    return (
        f"(SELECT CAST(s_suppkey AS BIGINT) AS rel_id, "
        f"'Street ' || CAST(s_suppkey % 40 AS VARCHAR) AS name, "
        f"{members} AS members FROM supplier)"
    )
