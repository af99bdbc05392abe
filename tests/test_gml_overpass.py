"""GML on-ramp (S4) and Overpass query/parse surface (S6/S7), offline."""

from __future__ import annotations

import textwrap

from housenumbercore_spark.sources import gml as GM
from housenumbercore_spark.sources import overpass as OP

GML_FIXTURE = textwrap.dedent("""\
    <?xml version="1.0" encoding="UTF-8"?>
    <wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
        xmlns:gml="http://www.opengis.net/gml" xmlns:ms="http://mapserver.gis">
      <gml:featureMember>
        <ms:strassen gml:id="str.1">
          <ms:nazwa>Via Roma</ms:nazwa>
          <ms:ident>SR001</ms:ident>
          <ms:poziom>4poziom</ms:poziom>
          <ms:geom>
            <gml:LineString>
              <gml:posList>6.10 50.70 6.11 50.70 6.12 50.71</gml:posList>
            </gml:LineString>
          </ms:geom>
        </ms:strassen>
      </gml:featureMember>
      <gml:featureMember>
        <ms:strassen gml:id="str.2">
          <ms:nazwa>Bezirk Nord</ms:nazwa>
          <ms:ident>BZ900</ms:ident>
          <ms:poziom>2poziom</ms:poziom>
          <ms:geom>
            <gml:Point><gml:pos>6.20 50.80</gml:pos></gml:Point>
          </ms:geom>
        </ms:strassen>
      </gml:featureMember>
      <gml:featureMember>
        <ms:strassen gml:id="str.3">
          <ms:nazwa>Am Markt</ms:nazwa>
          <ms:ident>SR002</ms:ident>
          <ms:poziom>4poziom</ms:poziom>
          <ms:geom>
            <gml:Point><gml:coordinates>6.30,50.90</gml:coordinates></gml:Point>
          </ms:geom>
        </ms:strassen>
      </gml:featureMember>
    </wfs:FeatureCollection>
""")


def test_gml_feature_extraction_and_street_filter(spark, tmp_path):
    p = tmp_path / "muni.gml"
    p.write_text(GML_FIXTURE, encoding="utf-8")
    feats = GM.read_gml(spark, str(p), "strassen")
    rows = {r.feature_id: r for r in feats.collect()}
    assert set(rows) == {"str.1", "str.2", "str.3"}
    assert rows["str.1"].attrs["nazwa"] == "Via Roma"
    assert abs(rows["str.1"].x - 6.10) < 1e-12  # first vertex anchor
    assert rows["str.2"].attrs["poziom"] == "2poziom"
    assert abs(rows["str.3"].x - 6.30) < 1e-12  # legacy coordinates syntax

    # hierarchy '4' keeps municipalities only (ref import_stadtstrassen
    # GENERICGml.java:228-236)
    streets = GM.streets_from_gml(
        feats, name_field="nazwa", id_field="ident", hierarchy_field="poziom"
    )
    got = sorted((r.street_id, r.name) for r in streets.collect())
    assert got == [("SR001", "Via Roma"), ("SR002", "Am Markt")]

    # line geometry round-trips through the engine WKB
    import numpy as np

    from housenumbercore_spark.geo import geometry as G

    kind, arr = G.parse_wkb(bytes(rows["str.1"].wkb))
    assert kind == "linestring" and arr.shape == (3, 2)
    assert np.allclose(arr[2], [6.12, 50.71])


def test_overpass_query_builders_match_reference_shape():
    q = OP.build_street_query(162069, out="xml")
    # reference constants and structure (MunicipalityJobs.java:404-411)
    assert q.startswith("[timeout:3600][maxsize:1073741824]")
    assert "[out:xml];" in q
    assert "area(3600162069)->.boundaryarea;" in q
    assert 'way(area.boundaryarea)["highway"]["name"];>;' in q
    assert q.rstrip().endswith("out meta;")
    # negative relation ids normalize like the reference's -1* flip
    assert "area(3600162069)" in OP.build_street_query(-162069)
    aq = OP.build_address_query(42)
    assert 'node(area.boundaryarea)["addr:housenumber"];' in aq


OVERPASS_JSON = """{
  "version": 0.6, "elements": [
    {"type": "node", "id": 2, "lat": 50.78, "lon": 6.10},
    {"type": "node", "id": 3, "lat": 50.80, "lon": 6.12},
    {"type": "way", "id": 11, "nodes": [2, 3],
     "tags": {"highway": "residential", "name": "Pontstra\\u00dfe"}},
    {"type": "relation", "id": 100,
     "members": [{"type": "way", "ref": 11, "role": "street"}],
     "tags": {"type": "associatedStreet", "name": "Pontstra\\u00dfe"}}
  ]}"""


def test_overpass_json_parses_into_element_table(spark):
    osm = OP.elements_df(spark, OVERPASS_JSON.encode())
    from housenumbercore_spark.sources import osm_xml as OX

    kinds = {r.kind: r["count"] for r in osm.groupBy("kind").count().collect()}
    assert kinds == {"node": 2, "way": 1, "relation": 1}
    cent = OX.way_centroids(osm).collect()[0]
    assert cent.osm_id == 11 and abs(cent.lon - 6.11) < 1e-9
    way = OX.osm_ways(osm).collect()[0]
    assert way.tags["name"] == "Pontstraße"


def test_overpass_xml_format_bridges_to_element_table(spark):
    """fmt='xml' routes a raw OSM XML Overpass response through the same
    element bridge as JSON."""
    xml = (
        '<?xml version="1.0"?><osm version="0.6">'
        '<node id="2" lat="50.78" lon="6.10"/>'
        '<node id="3" lat="50.80" lon="6.12"/>'
        '<way id="11"><nd ref="2"/><nd ref="3"/>'
        '<tag k="highway" v="residential"/><tag k="name" v="A"/></way></osm>'
    )
    osm = OP.elements_df(spark, xml.encode(), fmt="xml")
    from housenumbercore_spark.sources import osm_xml as OX

    cent = OX.way_centroids(osm).collect()[0]
    assert cent.osm_id == 11 and abs(cent.lon - 6.11) < 1e-9


def test_http_get_retries_with_reference_backoff():
    """Transport resilience (MunicipalityJobs.java:430-480): two failures
    then success — retried with the reference's 2×n-second wait ladder;
    a permanently failing endpoint raises after MAXOVERPASSTRIES extra
    attempts."""
    import gzip
    import io

    import pytest

    from housenumbercore_spark.sources import overpass as OV

    class FakeResp:
        def __init__(self, payload):
            self.payload = payload
            self.headers = {"Content-Encoding": "gzip"}

        def read(self):
            return self.payload

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    calls, sleeps = [], []

    def flaky(req, timeout=None):
        calls.append(req.full_url)
        if len(calls) <= 2:
            raise OSError("connection reset")
        return FakeResp(gzip.compress(b"<osm/>"))

    out = OV.http_get(
        "http://example.invalid/api", _urlopen=flaky, _sleep=sleeps.append
    )
    assert out == b"<osm/>"
    assert len(calls) == 3
    assert sleeps == [2, 4], "reference wait ladder is 2*n seconds"

    calls.clear()
    sleeps.clear()

    def dead(req, timeout=None):
        calls.append(1)
        raise OSError("down")

    with pytest.raises(OSError):
        OV.http_get("http://example.invalid/api", _urlopen=dead,
                    _sleep=sleeps.append)
    assert len(calls) == 1 + OV.MAX_TRIES
    assert sleeps == [2, 4, 6]
