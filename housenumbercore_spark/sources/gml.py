"""GML on-ramp: distributed, config-driven feature extraction.

The reference's GML importer (imports/import_stadtstrassenGENERICGml.java:
147-560) walks a municipality street-list GML with CONFIGURED XPaths —
one expression selects the feature elements, relative expressions pull the
id / name / hierarchy fields out of each. The Spark-native equivalent
keeps that config-driven shape without an XPath engine: features are
selected by element local-name, fields by child local-name (namespace
prefixes in GML vary per producer and carry no information here), and
geometry comes from the standard ``gml:pos`` / ``gml:posList`` /
``gml:coordinates`` encodings.

Per-file parse runs executor-side over the ``binaryFile`` source exactly
like sources/shapefile.py and sources/osm_xml.py — a directory of
per-municipality GML files is the reference's real layout and fans out
across the cluster.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import geometry as G

SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.StringType(), True),
        T.StructField("feature", T.StringType(), False),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.DoubleType(), True),
        T.StructField("wkb", T.BinaryType(), True),
    ]
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_coords(el) -> np.ndarray | None:
    """gml:pos (one point), gml:posList (flat x y pairs) or the legacy
    gml:coordinates ("x,y x,y") anywhere under ``el`` → (n, 2) array."""
    for node in el.iter():
        name = _local(node.tag)
        if name in ("pos", "posList") and node.text and node.text.strip():
            vals = np.array(node.text.split(), dtype=np.float64)
            if len(vals) >= 2:
                return vals[: len(vals) // 2 * 2].reshape(-1, 2)
        if name == "coordinates" and node.text and node.text.strip():
            pts = [p.split(",")[:2] for p in node.text.split()]
            return np.array(pts, dtype=np.float64)
    return None


def parse_gml_bytes(buf: bytes, feature_localname: str) -> list[tuple]:
    """GML bytes → [(feature_id, feature, attrs, x, y, wkb)].

    ``attrs`` maps each simple child element's local-name to its text (the
    configured-field extraction of the reference, generalized); geometry
    becomes a point (x, y + point WKB) or a linestring/polygon WKB with
    its first vertex as the (x, y) anchor.
    """
    rows = []
    for _, el in ET.iterparse(io.BytesIO(buf), events=("end",)):
        if _local(el.tag) != feature_localname:
            continue
        fid = None
        for k, v in el.attrib.items():
            if _local(k) == "id":
                fid = v.strip()
        attrs = {}
        for child in el:
            if len(child) == 0 and child.text and child.text.strip():
                attrs[_local(child.tag)] = child.text.strip()
        coords = _parse_coords(el)
        if coords is None:
            rows.append((fid, feature_localname, attrs or None,
                         None, None, None))
        elif len(coords) == 1:
            x, y = float(coords[0, 0]), float(coords[0, 1])
            rows.append((fid, feature_localname, attrs or None,
                         x, y, G.point_wkb(x, y)))
        else:
            closed = bool(np.array_equal(coords[0], coords[-1]))
            wkb = (
                G.polygon_wkb([coords]) if closed and len(coords) >= 4
                else G.linestring_wkb(coords)
            )
            rows.append((fid, feature_localname, attrs or None,
                         float(coords[0, 0]), float(coords[0, 1]), wkb))
        el.clear()
    return rows


def read_gml(
    spark: SparkSession,
    path_glob: str,
    feature_localname: str,
    on_error: str = "fail",
) -> DataFrame:
    """All GML files under ``path_glob`` → one row per feature element.

    ``on_error='quarantine'`` emits one ``feature='__error__'`` marker row
    per malformed file (message in attrs) instead of failing the job."""
    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine, got {on_error}")
    files = spark.read.format("binaryFile").load(path_glob).select("content")

    def gen(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                try:
                    rows.extend(
                        parse_gml_bytes(bytes(content), feature_localname)
                    )
                except Exception as exc:
                    if on_error == "fail":
                        raise
                    rows.append(
                        (None, "__error__",
                         {"error": f"{type(exc).__name__}: {exc}"},
                         None, None, None)
                    )
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in SCHEMA.fields])

    return files.mapInPandas(gen, SCHEMA)


def streets_from_gml(
    gml: DataFrame,
    name_field: str,
    id_field: str | None = None,
    hierarchy_field: str | None = None,
    municipality_level: str = "4",
) -> DataFrame:
    """The reference's municipality-street extraction: keep features whose
    hierarchy field starts with the municipality level ('4' = municipality,
    import_stadtstrassenGENERICGml.java:228-236), project (id, name)."""
    out = gml
    if hierarchy_field is not None:
        out = out.filter(
            F.col("attrs").getItem(hierarchy_field).startswith(municipality_level)
        )
    return out.select(
        F.coalesce(
            F.col("attrs").getItem(id_field) if id_field else F.lit(None),
            F.col("feature_id"),
        ).alias("street_id"),
        F.col("attrs").getItem(name_field).alias("name"),
        "x", "y", "wkb",
    )
