"""Image-payload dedup: exact byte groups, caption groups, phash LSH
pairs — unit semantics on crafted tables plus DuckDB oracle parity on the
driver queries (these live in the rotation block, so this file is their
every-round value gate)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from housenumbercore_spark.images import dedup as D

SF = "/root/testdata/sf0.001"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_exact_dedup_groups_identical_bytes_only(spark):
    rows = [
        ("a1", bytearray(b"\x01\x02\x03")),
        ("a2", bytearray(b"\x01\x02\x03")),  # dup of a1
        ("b1", bytearray(b"\x01\x02\x04")),  # 1 byte off: distinct
        ("c1", bytearray(b"")),              # empty payload is a valid group
        ("c2", bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {
        r.canonical_image_id: r.n_copies for r in D.exact_dedup(df).collect()
    }
    assert got == {"a1": 2, "b1": 1, "c1": 2}


def test_caption_dedup_normalization_and_min_size(spark):
    rows = [
        ("i1", "photo 001: a dog"),
        ("i2", "photo 002: a dog"),   # same after stripping the prefix
        ("i3", "photo 003: a cat"),   # singleton: filtered out
    ]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    norm = F.regexp_replace("caption", r"^photo \d+: ", "")
    got = D.caption_dedup(df, caption_col=norm).collect()
    assert [(r.caption_norm, r.canonical_image_id, r.n_copies) for r in got] == [
        ("a dog", "i1", 2)
    ]


def test_phash_neardup_finds_banded_pairs_and_refines(spark):
    # x and y differ in 2 bits of band 0 -> no shared band 0, but bands
    # 1-3 identical -> candidate, hamming 2 <= max. z differs from x in
    # 3 bits spread over ALL four bands -> never a candidate (the
    # documented LSH recall trade), even though hamming 4 <= max.
    x = 0x1111_2222_3333_4444
    y = x ^ 0x3  # 2 low bits (band 0)
    z = x ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))
    w = 0x7FFF_FFFF_FFFF_0000  # far from everything
    df = spark.createDataFrame(
        [("x", x), ("y", y), ("z", z), ("w", w)],
        "image_id string, phash long",
    )
    got = [
        (r.img_a, r.img_b, r.hamming)
        for r in D.phash_neardup_pairs(df, max_hamming=10).collect()
    ]
    assert got == [("x", "y", 2)]


def test_phash_neardup_negative_phash_band_extraction(spark):
    # sign bit set: arithmetic >> sign-extends, the & mask must still
    # recover the true top band; pair differs only in bit 1.
    a = -(1 << 63) + 5  # 0x8000...0005
    b = a ^ 0x2
    df = spark.createDataFrame(
        [("a", a), ("b", b)], "image_id string, phash long"
    )
    got = D.phash_neardup_pairs(df, max_hamming=4).collect()
    assert [(r.img_a, r.img_b, r.hamming) for r in got] == [("a", "b", 1)]


def test_phash_for_matches_stored_column(spark):
    from housenumbercore_spark.sources import images as IMG

    stored = {
        r.image_id: r.phash
        for r in IMG.images_table(spark, 64).select("image_id", "phash").collect()
    }
    for i in (0, 1, 7, 40, 63):
        assert stored[f"img{i:010d}"] == IMG.phash_for(i)


def test_prepare_image_corpus_stages(spark):
    """Crafted 6-row table: the gate drops the short caption, exact dedup
    drops the byte-identical re-crawl, near-dup clustering keeps only the
    canonical of the phash-near pair."""
    x = 0x1111_2222_3333_4444
    rows = [
        ("a", b"\x01", 16, 16, "long caption here", x),
        ("a~re", b"\x01", 16, 16, "long caption here", x),   # exact dup of a
        ("b", b"\x02", 16, 16, "long caption here", x ^ 0x3),  # near-dup of a
        ("c", b"\x03", 16, 16, "short", 0x7FFF000012340000),   # gated out
        ("d", b"\x04", 16, 16, "another long caption", -42),   # survivor
    ]
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, caption string, phash long",
    )
    kept = sorted(
        r.image_id
        for r in D.prepare_image_corpus(df, min_caption_chars=10).collect()
    )
    assert kept == ["a", "d"]


@pytest.mark.parametrize(
    "name",
    [
        "image_dedup_exact",
        "image_caption_dedup",
        "image_phash_neardup",
        "image_corpus_kept",
    ],
)
def test_driver_query_matches_oracle(spark, name):
    import __spark_entry__ as E

    got = _normalize(E.queries()[name](spark, SF).toPandas())
    con = duckdb.connect()
    try:
        want = _normalize(con.execute(E.oracle_sql()[name]).df())
    finally:
        con.close()
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        a, b = got[c], want[c]
        ok = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
        assert ok.all(), f"{name}.{c}"


def test_exact_dedup_null_payloads_are_singletons(spark):
    """Review regression: NULL payloads (quarantine rows) must not collapse
    into one 'duplicate' content group under groupBy's NULL-keys-equal."""
    from housenumbercore_spark.images import dedup as D

    df = spark.createDataFrame(
        [("a", bytearray(b"xx")), ("b", bytearray(b"xx")),
         ("q1", None), ("q2", None)],
        "image_id string, bytes binary",
    )
    got = {r.canonical_image_id: r.n_copies for r in D.exact_dedup(df).collect()}
    assert got["a"] == 2          # real byte-identical pair
    assert got["q1"] == 1 and got["q2"] == 1  # each NULL row its own group


def test_caption_dedup_null_captions_are_not_a_group(spark):
    """ADVICE r4 regression: NULL captions must not collapse into one
    duplicate group (groupBy NULL-equality) — a downstream keep-one would
    silently drop all but one uncaptioned image. Mirrors exact_dedup's
    NULL-bytes policy: NULLs are excluded from grouping entirely."""
    from housenumbercore_spark.images.dedup import caption_dedup

    df = spark.createDataFrame(
        [("a", None), ("b", None), ("c", "same"), ("d", "same"),
         ("e", "only")],
        "image_id string, caption string",
    )
    got = caption_dedup(df).collect()
    assert len(got) == 1
    assert got[0].caption_norm == "same" and got[0].n_copies == 2
