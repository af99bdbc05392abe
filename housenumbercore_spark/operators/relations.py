"""associatedStreet relation resolution (J8).

The reference finds, per address object, the OSM relation whose flat
``members`` array contains the object id and takes the relation's ``name``
as the street (memoized per-object scans of planet_rels,
/root/reference/src/de/regioosm/theoreticalhousenumbercore/
TheoreticalHousenumbers.java:184-289; batch variant
OSMRelationAssociatedStreetWorkaround.java:130-415).

Spark-first: explode the members array once into a narrow (member_id →
rel) table, equi-join on object id, deterministic pick (lowest rel_id)
via keep_min_row's window strategy (an object belongs to ~one relation,
so there is no per-partition duplication for the agg strategy's map-side
combine to exploit) — the whole planet_rels scan becomes one shuffle
instead of a per-object array scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .argmin import keep_min_row


def resolve_associated_street(
    objects: DataFrame,
    relations: DataFrame,
    object_id: str = "osm_id",
    street_col: str = "street",
) -> DataFrame:
    """Attach ``assoc_street`` (name of the lowest-rel_id relation whose
    members contain the object) and ``effective_street`` =
    coalesce(assoc_street, street) to every object row."""
    members = relations.select(
        "rel_id",
        F.col("name").alias("assoc_street"),
        F.explode("members").alias("member_id"),
    )
    # rel_id is unique per relation, so lowest-rel_id-wins is an exact
    # keep_min_row (operators/argmin.py). Window strategy: an address
    # object is typically a member of ONE relation, so there is no
    # per-partition group duplication for the agg strategy's map-side
    # combine to exploit (measured equal-at-best — argmin module note)
    best = keep_min_row(
        members.select("member_id", "rel_id", "assoc_street"),
        ["member_id"],
        ["rel_id"],
    )
    out = objects.join(
        best, objects[object_id] == best["member_id"], "left"
    ).drop("member_id")
    return out.withColumn(
        "effective_street", F.coalesce(F.col("assoc_street"), F.col(street_col))
    )
