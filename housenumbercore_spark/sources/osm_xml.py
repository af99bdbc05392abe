"""OSM XML on-ramp: distributed .osm parsing → element DataFrame.

The reference consumes raw OSM XML through a SAX-style reader
(util/OsmReader.java:45-468, fed by Overpass downloads) into node/way/
relation objects with tag maps. Spark-native equivalent:

- every ``.osm`` file is one ``binaryFile`` row, parsed executor-side with
  ``xml.etree.iterparse`` (streaming — element subtrees are freed as they
  complete, so a large file holds only one element in memory at a time);
- output is ONE unified element table: ``(kind, osm_id, lon, lat, refs,
  members, tags)`` — nodes carry lon/lat, ways carry ordered node refs,
  relations carry typed members. Downstream helpers materialize the views
  the engine's operators expect:
  - :func:`osm_nodes` / :func:`osm_ways` / :func:`osm_relations`
  - :func:`way_centroids` — way anchor points via a node-location join
    (the reference resolves way positions through PostGIS; here it is one
    equi-join on node id);
  - :func:`addresses_from_osm` — addr:* tags → the engine's OSM address
    schema, for nodes directly and for ways through their centroid.

Planet-scale note: a single planet ``.osm`` is one giant file and should be
pre-split (osmium/osmconvert emit bounded chunks) so the file-level
parallelism applies; the parser here is the per-chunk kernel.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MEMBER_T = T.StructType(
    [
        T.StructField("mtype", T.StringType(), True),
        T.StructField("ref", T.LongType(), True),
        T.StructField("role", T.StringType(), True),
    ]
)

SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("osm_id", T.LongType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("refs", T.ArrayType(T.LongType()), True),
        T.StructField("members", T.ArrayType(_MEMBER_T), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def parse_osm_bytes(buf: bytes) -> list[tuple]:
    """OSM XML bytes → [(kind, osm_id, lon, lat, refs, members, tags)]."""
    rows = []
    for _, el in ET.iterparse(io.BytesIO(buf), events=("end",)):
        if el.tag not in ("node", "way", "relation"):
            continue
        tags = {t.get("k"): t.get("v") for t in el.findall("tag")} or None
        if el.tag == "node":
            rows.append(
                ("node", int(el.get("id")), float(el.get("lon")),
                 float(el.get("lat")), None, None, tags)
            )
        elif el.tag == "way":
            refs = [int(nd.get("ref")) for nd in el.findall("nd")]
            rows.append(("way", int(el.get("id")), None, None, refs, None, tags))
        else:
            members = [
                (m.get("type"), int(m.get("ref")), m.get("role"))
                for m in el.findall("member")
            ]
            rows.append(
                ("relation", int(el.get("id")), None, None, None, members, tags)
            )
        el.clear()  # streaming: drop the finished subtree
    return rows


def read_osm_xml(
    spark: SparkSession, path_glob: str, on_error: str = "fail"
) -> DataFrame:
    """All ``.osm`` files under ``path_glob`` → the unified element table.

    ``on_error='quarantine'`` emits one ``kind='__error__'`` marker row per
    malformed file (message in tags) instead of failing the ingest job."""
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine, got {on_error}")
    files = spark.read.format("binaryFile").load(path_glob).select("content")

    def gen(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                try:
                    rows.extend(parse_osm_bytes(bytes(content)))
                except Exception as exc:
                    if on_error == "fail":
                        raise
                    rows.append(
                        ("__error__", -1, None, None, None, None,
                         {"error": f"{type(exc).__name__}: {exc}"})
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in SCHEMA.fields]
                )

    return files.mapInPandas(gen, SCHEMA)


def osm_nodes(osm: DataFrame) -> DataFrame:
    return osm.filter(F.col("kind") == "node").select("osm_id", "lon", "lat", "tags")


def osm_ways(osm: DataFrame) -> DataFrame:
    return osm.filter(F.col("kind") == "way").select("osm_id", "refs", "tags")


def osm_relations(osm: DataFrame) -> DataFrame:
    return osm.filter(F.col("kind") == "relation").select(
        "osm_id", "members", "tags"
    )


def way_centroids(osm: DataFrame) -> DataFrame:
    """(way osm_id, lon, lat): mean of member node positions — the anchor
    point the reference obtains per way via ST_Centroid round-trips
    (TheoreticalHousenumbers.java:856-869). One explode + one equi-join on
    node id + one aggregate; all set-based."""
    nodes = osm_nodes(osm).select(
        F.col("osm_id").alias("__nid"), "lon", "lat"
    )
    # closed ways (building outlines — the dominant addr ways) repeat the
    # first node as the last ref; averaging over raw refs double-counts it
    # and biases the anchor toward that corner
    derefd = F.expr(
        "CASE WHEN size(refs) > 1 AND refs[0] = refs[size(refs) - 1] "
        "THEN slice(refs, 1, size(refs) - 1) ELSE refs END"
    )
    refs = osm_ways(osm).select(
        "osm_id", F.explode(derefd).alias("__nid")
    )
    return (
        refs.join(nodes, "__nid")
        .groupBy("osm_id")
        .agg(F.avg("lon").alias("lon"), F.avg("lat").alias("lat"))
    )


def addresses_from_osm(osm: DataFrame) -> DataFrame:
    """addr:*-tagged nodes and ways → the engine's OSM address shape:
    (osm_id, kind, lon, lat, street, housenumber, city, postcode).

    Ways get their centroid as position (node join); tag extraction is the
    hstore-path parity (P1–P3) the engine already evaluates elsewhere."""
    def addr_cols(df: DataFrame) -> list:
        return [
            F.col("tags").getItem("addr:street").alias("street"),
            F.col("tags").getItem("addr:housenumber").alias("housenumber"),
            F.col("tags").getItem("addr:city").alias("city"),
            F.col("tags").getItem("addr:postcode").alias("postcode"),
        ]

    has_addr = F.col("tags").getItem("addr:housenumber").isNotNull()
    nodes = osm_nodes(osm).filter(has_addr).select(
        "osm_id", F.lit("node").alias("kind"), "lon", "lat", *addr_cols(osm)
    )
    ways = (
        osm_ways(osm)
        .filter(has_addr)
        .select("osm_id", "tags")
        .join(way_centroids(osm), "osm_id")
        .select(
            "osm_id", F.lit("way").alias("kind"), "lon", "lat", *addr_cols(osm)
        )
    )
    return nodes.unionByName(ways)
