"""Match evaluation operator tests — semantics pinned to Workcache."""

from __future__ import annotations

from pyspark.sql import functions as F

from housenumbercore_spark.operators import match_eval as ME


def test_tag_priority_ladder(spark):
    rows = [
        ({"entrance": "main"}, 1),
        ({"building": "entrance"}, 1),
        ({"building": "yes"}, 2),
        ({"building": "apartments"}, 2),
        ({"building": "shed"}, 9),
        ({"amenity": "school"}, 20),
        ({"name": "x"}, 99),
        ({}, 99),
        ({"building": "shed", "entrance": "yes"}, 1),  # min wins
        ({"building": "yes", "amenity": "school"}, 2),
    ]
    df = spark.createDataFrame(
        [(t,) for t, _ in rows], "tags map<string,string>"
    ).withColumn("prio", ME.osm_tag_priority("tags"))
    assert [r.prio for r in df.collect()] == [p for _, p in rows]


def test_match_key_case_flag(spark):
    df = spark.createDataFrame(
        [("13A", True), ("13A", False)], "hnr string, exact boolean"
    )
    got = [r.k for r in df.select(ME.match_key("hnr", "exact").alias("k")).collect()]
    assert got == ["13A", "13a"]


def test_best_object_tiebreak_lowest_osm_id(spark):
    osm = spark.createDataFrame(
        [
            (1, "S", "5", 100, 2),
            (1, "S", "5", 50, 2),   # same prio, lower id wins
            (1, "S", "5", 10, 9),   # worse prio loses despite lowest id
            (1, "S", "7", 77, 99),
        ],
        "job_id long, street string, hnr_key string, osm_id long, prio int",
    )
    best = ME.best_osm_object(osm).orderBy("hnr_key").collect()
    assert [(r.hnr_key, r.osm_id) for r in best] == [("5", 50), ("7", 77)]


def test_match_evaluation_treffertyp_and_counters(spark):
    off = spark.createDataFrame(
        [(1, "S", "1"), (1, "S", "2"), (2, "S", "9")],
        "job_id long, street string, hnr_key string",
    )
    osm = spark.createDataFrame(
        [(1, "S", "1", 11), (1, "S", "3", 12)],
        "job_id long, street string, hnr_key string, osm_id long",
    )
    m = ME.match_evaluation(off, osm)
    got = {(r.job_id, r.hnr_key): r.treffertyp for r in m.collect()}
    assert got == {(1, "1"): "i", (1, "2"): "l", (1, "3"): "o", (2, "9"): "l"}
    c = {r.job_id: r for r in ME.evaluation_counters(m).collect()}
    assert (c[1].number_target, c[1].number_identical, c[1].number_osmonly) == (2, 1, 1)
    assert (c[2].number_target, c[2].number_identical, c[2].number_osmonly) == (1, 0, 0)


def test_pipeline_matches_duckdb_oracle_sf0001(spark):
    """End-to-end vs the oracle at the smallest SF (fast guard; the driver
    re-checks at sf0.01)."""
    import duckdb

    from housenumbercore_spark import oracles as O
    from housenumbercore_spark import pipelines as P

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "lineitem"):
        con.execute(
            f"create view {t} as select * from read_parquet('{sf}/{t}.parquet')"
        )
    got = (
        P.evaluation_matched(spark, sf)
        .toPandas()
        .sort_values(["job_id", "street", "hnr_key"])
        .reset_index(drop=True)
    )
    want = (
        con.execute(O.matched_sql())
        .df()
        .sort_values(["job_id", "street", "hnr_key"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.treffertyp.values == want.treffertyp.values).all()
    for c in ("source_id", "osm_id", "prio"):
        a, b = got[c], want[c]
        assert ((a.isna() & b.isna()) | (a == b)).all(), c


def test_keep_min_row_strategies_are_equivalent(spark):
    """keep_min_row's agg strategy (argmin struct aggregate) must be
    bit-identical to the window strategy — including NULLs in carried
    columns (struct comparison never reads past the unique osm_id, so
    NULL payloads can't perturb the pick). A MapType column must force
    the agg strategy back to the window plan."""
    from housenumbercore_spark.operators.argmin import keep_min_row

    rows = [
        (1, "S", "5", 100, 2, "a"),
        (1, "S", "5", 50, 2, None),   # winner carries a NULL payload
        (1, "S", "5", 10, 9, "c"),
        (1, "T", "5", 7, 99, None),
        (2, "S", "5", 3, 1, "d"),
        (2, "S", "6", 4, 1, "e"),
    ]
    osm = spark.createDataFrame(
        rows,
        "job_id long, street string, hnr_key string, osm_id long,"
        " prio int, note string",
    )
    group, order = ["job_id", "street", "hnr_key"], ["prio", "osm_id"]
    agg = keep_min_row(osm, group, order, strategy="agg")
    assert "Window" not in agg._jdf.queryExecution().executedPlan().toString()
    win = keep_min_row(osm, group, order, strategy="window")
    assert "Window" in win._jdf.queryExecution().executedPlan().toString()
    assert agg.exceptAll(win).count() == 0
    assert win.exceptAll(agg).count() == 0
    assert agg.columns == osm.columns
    # an unorderable column forces the agg strategy back to the window plan
    mapped = keep_min_row(
        osm.withColumn("m", F.create_map(F.lit("k"), F.col("note"))),
        group, order, strategy="agg",
    )
    assert "Window" in mapped._jdf.queryExecution().executedPlan().toString()
    assert mapped.drop("m").exceptAll(win).count() == 0
    assert win.exceptAll(mapped.drop("m")).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        keep_min_row(osm, group, order, strategy="bogus")


def test_keep_min_row_edge_contracts(spark):
    """Overlapping group/order columns, dotted column names, reserved
    helper names, and empty effective order — the generic-helper edges a
    strategy flip must not change."""
    from housenumbercore_spark.operators.argmin import keep_min_row

    df = spark.createDataFrame(
        [(1, 2, "x"), (1, 1, "y"), (2, 5, "z")],
        "g long, o long, `v.w` string",
    )
    # a group column inside order is constant per group: both strategies
    # drop it and agree, and the dotted payload column survives intact
    a = keep_min_row(df, ["g"], ["g", "o"], strategy="agg")
    w = keep_min_row(df, ["g"], ["g", "o"], strategy="window")
    assert a.columns == df.columns and w.columns == df.columns
    assert sorted((r.g, r.o, r["v.w"]) for r in a.collect()) == [
        (1, 1, "y"), (2, 5, "z"),
    ]
    assert a.exceptAll(w).count() == 0 and w.exceptAll(a).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        keep_min_row(df, ["g"], ["g"])  # no non-group order column
    with _pytest.raises(ValueError):
        keep_min_row(
            df.withColumnRenamed("o", "__argmin_best"), ["g"], ["__argmin_best"]
        )
