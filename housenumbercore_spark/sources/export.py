"""Export sinks: JOSM ``.osm`` XML nodes (S11) and TSV (S12).

The reference writes one XML node per address with escaped tag values
(Address.printosm, /root/reference/src/de/regioosm/housenumbercore/util/
Address.java:74-102; escaping :77-97) and a TSV variant (printtxt,
:104-116). Here both are column expressions — the distributed write is then
a plain ``df.write.text`` / ``df.write.csv(sep='\\t')``.

Coordinates are formatted with printf-style ``%.7f`` so the string output
is bit-identical across engines (CAST(double AS VARCHAR) is not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def xml_escape(col: Column) -> Column:
    """&, <, >, ", ' → entities (reference escapes quotes in printosm)."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    c = F.regexp_replace(c, '"', "&quot;")
    return F.regexp_replace(c, "'", "&apos;")


def josm_node_col(
    node_id: Column,
    lon: Column,
    lat: Column,
    tags: list[tuple[str, Column]],
) -> Column:
    """One JOSM XML node string per row.

    NULL tag values OMIT that tag (like the reference's printosm, which
    only writes tags it has — Address.java:74-102); a bare F.concat would
    instead NULL-propagate through the whole node string and silently drop
    the address from the export. Rows with NULL id/lon/lat still yield
    xml=NULL: a node without identity or position is unwritable, and the
    caller decides whether that is a reject-row or an error.
    """
    tag_parts = [
        F.when(
            v.isNotNull(),
            F.concat(
                F.lit(f"<tag k='{k}' v='"),
                xml_escape(v.cast("string")),
                F.lit("'/>"),
            ),
        ).otherwise(F.lit(""))
        for k, v in tags
    ]
    return F.concat(
        F.lit("<node id='-"),
        node_id.cast("string"),
        F.lit("' visible='true' lat='"),
        F.format_string("%.7f", lat),
        F.lit("' lon='"),
        F.format_string("%.7f", lon),
        F.lit("'>"),
        *tag_parts,
        F.lit("</node>"),
    )


def josm_export(df: DataFrame) -> DataFrame:
    """Addresses (source_id, street, housenumber, postcode, lon, lat) →
    (source_id, xml) export rows."""
    return df.select(
        "source_id",
        josm_node_col(
            F.col("source_id"),
            F.col("lon"),
            F.col("lat"),
            [
                ("addr:street", F.col("street")),
                ("addr:housenumber", F.col("housenumber")),
                ("addr:postcode", F.col("postcode")),
            ],
        ).alias("xml"),
    )


def write_tsv(df: DataFrame, path: str) -> None:
    """S12: tab-separated export."""
    df.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(path)
