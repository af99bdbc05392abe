"""Reference-parity operator batch vs DuckDB oracle: housenumber explode,
associatedStreet, merge diff, boundary selection, JOSM export, census,
streaming windows/sessions."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

QUERIES = [
    "hnr_explode",
    "associated_street",
    "merge_diff",
    "merge_action_counters",
    "boundary_select",
    "josm_export",
    "census_counters",
    "stream_windowed_counts",
    "stream_sessions",
    "suburb_assignment",
    "boundary_union_centroid",
    "crs_transform",
    "import_rejects",
    "resume_pending",
    "sorted_street_list",
    "lu_commune_lookup",
    "video_frame_sample",
    "street_merge_stats",
    "title_case_streets",
    "stream_user_state",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("part", "supplier", "customer", "lineitem", "nation", "region",
              "orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as E

    got = _normalize(E.queries()[name](spark, SF).toPandas())
    want = _normalize(duck.execute(E.oracle_sql()[name]).df())
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert list(got.columns) == list(want.columns), name
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            ok = (a.isna() & b.isna()) | (a.astype(float) == b.astype(float))
        else:
            ok = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
        assert ok.all(), (
            f"{name}.{c}: {a[~ok].head(3).tolist()} vs {b[~ok].head(3).tolist()}"
        )


def test_merge_has_all_actions(spark):
    import __spark_entry__ as E

    counts = {
        r.action: r.n_rows
        for r in E.queries()["merge_action_counters"](spark, SF).collect()
    }
    assert set(counts) == {"insert", "update", "unchanged", "delete"}
    assert all(v > 0 for v in counts.values())


def test_hnr_explode_semantics(spark):
    from housenumbercore_spark.norm import housenumbers as HN

    df = spark.createDataFrame(
        [(1, "2-8"), (2, "1,3;5"), (3, "8-2"), (4, "2-8a"), (5, "13b")],
        "rec_id long, housenumber string",
    )
    out = HN.explode_housenumbers(df)
    got = sorted((r.rec_id, r.housenumber) for r in out.collect())
    assert got == [
        (1, "2"), (1, "4"), (1, "6"), (1, "8"),
        (2, "1"), (2, "3"), (2, "5"),
        (5, "13b"),
    ]
