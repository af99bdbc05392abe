"""Ingestion on-ramps: Shapefile and OSM XML round-trips into the engine's
address schema (ref util/ShapeReader.java:155-372, util/OsmReader.java:45-468)."""

from __future__ import annotations

import textwrap

from pyspark.sql import functions as F

from housenumbercore_spark.sources import osm_xml as OX
from housenumbercore_spark.sources import shapefile as SH


def test_shapefile_roundtrip_to_addresses(spark, tmp_path):
    pts = [(6.08, 50.77), (6.09, 50.78), (6.10, 50.79)]
    attrs = [
        {"STREET": "Jakobstraße", "HOUSENUM": "12", "CITY": "Aachen"},
        {"STREET": "Pontstraße", "HOUSENUM": "1-3", "CITY": "Aachen"},
        {"STREET": "Via Roma", "HOUSENUM": "7b", "CITY": "Aosta"},
    ]
    base = str(tmp_path / "list_region1")
    SH.write_shapefile_pair(base, pts, attrs)

    shapes = SH.read_shapefiles(spark, str(tmp_path / "*.shp"))
    got = shapes.orderBy("rec_no").collect()
    assert [r.shape_type for r in got] == ["point"] * 3
    assert got[0].attrs["STREET"] == "Jakobstraße"
    assert abs(got[2].x - 6.10) < 1e-12 and abs(got[2].y - 50.79) < 1e-12

    addr = SH.addresses_from_shapefile(shapes).orderBy("rec_no").collect()
    assert [(r.street, r.housenumber, r.city) for r in addr] == [
        ("Jakobstraße", "12", "Aachen"),
        ("Pontstraße", "1-3", "Aachen"),
        ("Via Roma", "7b", "Aosta"),
    ]
    # the on-ramp output feeds the normal engine path (hnr explode)
    from housenumbercore_spark.norm import housenumbers as HN

    exploded = HN.explode_housenumbers(
        spark.createDataFrame(
            [(r.rec_no, r.housenumber) for r in addr],
            "rec_id long, housenumber string",
        )
    )
    got_h = sorted((r.rec_id, r.housenumber) for r in exploded.collect())
    assert got_h == [(1, "12"), (2, "1"), (2, "3"), (3, "7b")]


def test_shapefile_polygon_and_polyline_wkb(spark, tmp_path):
    import struct

    import numpy as np

    from housenumbercore_spark.geo import geometry as G

    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    content = struct.pack("<I", SH.SHAPE_POLYGON)
    content += struct.pack("<4d", 0, 0, 4, 4)
    content += struct.pack("<ii", 1, len(ring))
    content += struct.pack("<i", 0)
    content += ring.astype("<f8").tobytes()
    rec = struct.pack(">II", 1, len(content) // 2) + content
    header = struct.pack(">7I", 9994, 0, 0, 0, 0, 0, (100 + len(rec)) // 2)
    header += struct.pack("<II", 1000, SH.SHAPE_POLYGON)
    header += struct.pack("<8d", 0, 0, 4, 4, 0, 0, 0, 0)
    shp = tmp_path / "poly.shp"
    shp.write_bytes(header + rec)

    rows = SH.read_shapefiles(spark, str(shp)).collect()
    assert len(rows) == 1 and rows[0].shape_type == "polygon"
    poly = G.parse_wkb(bytes(rows[0].wkb))
    assert G.covers(poly, np.array([2.0]), np.array([2.0]))[0]
    assert not G.covers(poly, np.array([5.0]), np.array([2.0]))[0]


OSM_FIXTURE = textwrap.dedent("""\
    <?xml version="1.0" encoding="UTF-8"?>
    <osm version="0.6">
      <node id="1" lat="50.77" lon="6.08">
        <tag k="addr:street" v="Jakobstraße"/>
        <tag k="addr:housenumber" v="12"/>
        <tag k="addr:city" v="Aachen"/>
      </node>
      <node id="2" lat="50.78" lon="6.10"/>
      <node id="3" lat="50.80" lon="6.12"/>
      <node id="4" lat="50.90" lon="6.20">
        <tag k="highway" v="bus_stop"/>
      </node>
      <way id="10">
        <nd ref="2"/>
        <nd ref="3"/>
        <tag k="addr:street" v="Pontstraße"/>
        <tag k="addr:housenumber" v="5"/>
      </way>
      <way id="11">
        <nd ref="2"/>
        <nd ref="4"/>
        <tag k="highway" v="residential"/>
        <tag k="name" v="Pontstraße"/>
      </way>
      <relation id="100">
        <member type="way" ref="11" role="street"/>
        <member type="node" ref="1" role="house"/>
        <tag k="type" v="associatedStreet"/>
        <tag k="name" v="Pontstraße"/>
      </relation>
    </osm>
""")


def test_osm_xml_elements_and_addresses(spark, tmp_path):
    p = tmp_path / "fixture.osm"
    p.write_text(OSM_FIXTURE, encoding="utf-8")
    osm = OX.read_osm_xml(spark, str(p))

    kinds = {r.kind: r["count"] for r in osm.groupBy("kind").count().collect()}
    assert kinds == {"node": 4, "way": 2, "relation": 1}

    ways = {r.osm_id: r.refs for r in OX.osm_ways(osm).collect()}
    assert ways[10] == [2, 3] and ways[11] == [2, 4]

    rel = OX.osm_relations(osm).collect()[0]
    assert rel.tags["type"] == "associatedStreet"
    assert [(m.mtype, m.ref, m.role) for m in rel.members] == [
        ("way", 11, "street"),
        ("node", 1, "house"),
    ]

    cent = {r.osm_id: (r.lon, r.lat) for r in OX.way_centroids(osm).collect()}
    assert abs(cent[10][0] - 6.11) < 1e-9 and abs(cent[10][1] - 50.79) < 1e-9

    addr = {r.osm_id: r for r in OX.addresses_from_osm(osm).collect()}
    assert addr[1].kind == "node" and addr[1].street == "Jakobstraße"
    assert addr[1].housenumber == "12" and addr[1].city == "Aachen"
    assert addr[10].kind == "way" and addr[10].housenumber == "5"
    assert abs(addr[10].lon - 6.11) < 1e-9
    assert set(addr) == {1, 10}  # untagged elements excluded


def test_osm_xml_feeds_associated_street_operator(spark, tmp_path):
    """The parsed relation drives the engine's associatedStreet join (J8)."""
    from housenumbercore_spark.operators import relations as R

    p = tmp_path / "fixture.osm"
    p.write_text(OSM_FIXTURE, encoding="utf-8")
    osm = OX.read_osm_xml(spark, str(p))

    rels = OX.osm_relations(osm).select(
        F.col("osm_id").alias("rel_id"),
        F.col("tags").getItem("name").alias("name"),
        F.expr("transform(members, m -> m.ref)").alias("members"),
    )
    objs = spark.createDataFrame(
        [(1, None, "12"), (11, None, None)],
        "osm_id long, street string, housenumber string",
    )
    out = {r.osm_id: r for r in
           R.resolve_associated_street(objs, rels).collect()}
    assert out[1].effective_street == "Pontstraße"
    assert out[1].rel_id == 100


def test_quarantine_mode_isolates_corrupt_files(spark, tmp_path):
    """A malformed file among good ones must not fail the job in
    quarantine mode; strict mode still raises."""
    import pytest

    good = tmp_path / "good.osm"
    good.write_text(OSM_FIXTURE, encoding="utf-8")
    bad = tmp_path / "bad.osm"
    bad.write_text("<osm><node id='1' lat='x", encoding="utf-8")

    out = OX.read_osm_xml(spark, str(tmp_path / "*.osm"), on_error="quarantine")
    kinds = {r.kind: r["count"] for r in out.groupBy("kind").count().collect()}
    assert kinds["__error__"] == 1 and kinds["node"] == 4

    with pytest.raises(Exception):
        OX.read_osm_xml(spark, str(tmp_path / "*.osm")).count()

    # shapefile: truncated magic
    (tmp_path / "bad.shp").write_bytes(b"\x00\x01\x02")
    pts = [(6.0, 50.0)]
    SH.write_shapefile_pair(str(tmp_path / "ok"), pts, [{"STREET": "A"}])
    sh = SH.read_shapefiles(
        spark, str(tmp_path / "*.shp"), on_error="quarantine"
    ).collect()
    types = sorted(r.shape_type for r in sh)
    assert types == ["__error__", "point"]
    err = [r for r in sh if r.shape_type == "__error__"][0]
    assert "error" in err.attrs and err.source_file == "bad"


def test_shapefile_multipart_polygon_and_polyline(spark, tmp_path):
    """Two-exterior polygon records must become a MultiPolygon (ring
    winding: CW = exterior), not exterior+hole; multi-part polylines emit
    one row per part instead of dropping parts 1..n-1."""
    import struct

    import numpy as np

    from housenumbercore_spark.geo import geometry as G

    # two disjoint CW squares (shapefile exteriors are clockwise)
    sq1 = np.array([[0.0, 0.0], [0.0, 2.0], [2.0, 2.0], [2.0, 0.0], [0.0, 0.0]])
    sq2 = sq1 + 10.0
    pts = np.vstack([sq1, sq2])
    content = struct.pack("<I", SH.SHAPE_POLYGON)
    content += struct.pack("<4d", 0, 0, 12, 12)
    content += struct.pack("<ii", 2, len(pts))
    content += struct.pack("<ii", 0, len(sq1))
    content += pts.astype("<f8").tobytes()
    rec = struct.pack(">II", 1, len(content) // 2) + content

    line = np.array([[0.0, 0.0], [1.0, 1.0], [5.0, 5.0], [6.0, 5.0]])
    c2 = struct.pack("<I", SH.SHAPE_POLYLINE)
    c2 += struct.pack("<4d", 0, 0, 6, 5)
    c2 += struct.pack("<ii", 2, len(line))
    c2 += struct.pack("<ii", 0, 2)
    c2 += line.astype("<f8").tobytes()
    rec2 = struct.pack(">II", 2, len(c2) // 2) + c2

    body = rec + rec2
    header = struct.pack(">7I", 9994, 0, 0, 0, 0, 0, (100 + len(body)) // 2)
    header += struct.pack("<II", 1000, SH.SHAPE_POLYGON)
    header += struct.pack("<8d", 0, 0, 12, 12, 0, 0, 0, 0)
    shp = tmp_path / "multi.shp"
    shp.write_bytes(header + body)

    rows = SH.read_shapefiles(spark, str(shp)).collect()
    polys = [r for r in rows if r.shape_type == "polygon"]
    lines = [r for r in rows if r.shape_type == "polyline"]
    assert len(polys) == 1 and len(lines) == 2  # 2 rows for the 2 parts
    g = G.parse_wkb(bytes(polys[0].wkb))
    assert G.covers(g, np.array([1.0]), np.array([1.0]))[0]   # part 1
    assert G.covers(g, np.array([11.0]), np.array([11.0]))[0]  # part 2 (island)
    assert not G.covers(g, np.array([5.0]), np.array([5.0]))[0]
