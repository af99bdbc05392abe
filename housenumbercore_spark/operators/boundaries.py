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
