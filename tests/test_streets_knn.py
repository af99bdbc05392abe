"""Street catalog + kNN operator tests (oracle comparisons at sf0.001)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from housenumbercore_spark import oracles as O
from housenumbercore_spark import pipelines as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("supplier", "nation", "region", "customer", "orders"):
        c.execute(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(got, want, cols):
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w), (len(g), len(w))
    for c in cols:
        eq = (g[c].isna() & w[c].isna()) | (g[c] == w[c])
        assert eq.all(), (c, g[~eq].head(), w[~eq].head())


def test_street_catalog_vs_oracle(spark, con):
    got = P.street_catalog(spark, SF).toPandas()
    want = con.execute(O.street_catalog_sql()).df()
    _cmp(got, want, sorted(got.columns))
    # both sources present
    assert set(got["source"]) == {"osm", "official_only"}


def test_knn_vs_oracle(spark, con):
    got = P.knn_nearest_street(spark, SF, k=1).toPandas()
    want = con.execute(O.knn_nearest_street_sql(1)).df()
    _cmp(got, want, sorted(got.columns))
    assert got.point_id.is_unique


def test_linemerge_in_catalog(spark):
    m = P.street_merged_geometries(spark, SF).toPandas()
    multi = m[(m.n_segments > 1)]
    # every street_key%3==0 street contributes 2 contiguous segments → 1 line
    assert (multi.n_merged <= multi.n_segments).all()
    assert m.merged_wkt.str.startswith(("LINESTRING", "MULTILINESTRING")).all()


def test_whitelist_and_blacklist_applied(spark):
    from housenumbercore_spark.operators import street_catalog as SC
    from housenumbercore_spark.sources import streets as ST

    segs = ST.street_segments_df(spark, SF)
    wl = SC.apply_whitelist(segs)
    assert wl.filter(F.col("highway").isin("footway", "motorway")).count() == 0
    bl = segs.filter(F.col("osm_id") % 97 == 0)
    if bl.count() > 0:
        after = SC.apply_blacklist(wl, bl)
        assert after.join(bl, "osm_id", "inner").count() == 0


def test_knn_ring_expansion_covers_targets(spark):
    """A point in an empty cell still finds its neighbour via the ring."""
    from housenumbercore_spark.operators import knn as KN

    pts = spark.createDataFrame([(1, 6.01, 50.01)], "point_id long, lon double, lat double")
    targets = spark.createDataFrame(
        [(7, "T", 7.5, 50.9)], "street_key long, name string, slon double, slat double"
    )
    out = KN.knn_nearest(pts, targets, res=8, k_ring=1).collect()
    assert len(out) == 1 and out[0].street_key == 7
