"""Checkpoint/lineage + resume protocol (SURVEY.md §7 step 8, north rule)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from housenumbercore_spark import checkpoint as CP

SF = "/root/testdata/sf0.001"
FP = "snap-001"


def _builder(spark, key):
    from housenumbercore_spark.operators import pip_join as PJ
    from housenumbercore_spark.sources import synthetic as S

    pts = S.points_df(spark, SF).filter(F.col("point_id") % 4 == int(key))
    areas = S.areas_df(spark, SF)
    return PJ.assign_points_to_areas(spark, pts, areas).select(
        "point_id", "area_id"
    )


KEYS = [0, 1, 2, 3]


def test_crash_resume_no_recompute_and_identical_output(spark, tmp_path):
    out = str(tmp_path / "ckpt")

    # first attempt crashes on partition 2 (sequential → 0,1 committed)
    with pytest.raises(CP.PartitionFailure):
        CP.checkpointed_run(
            spark, _builder, KEYS, out, FP, max_concurrency=1, fail_on={2}
        )
    assert CP.load_manifest(spark, out, 0) is not None
    assert CP.load_manifest(spark, out, 1) is not None
    assert CP.load_manifest(spark, out, 2) is None  # data possibly written, not committed

    mtimes_before = {
        k: os.path.getmtime(os.path.join(out, f"part={k}", CP.MANIFEST_NAME))
        for k in (0, 1)
    }

    # resume: completed partitions skipped, the rest computed
    summary = CP.checkpointed_run(spark, _builder, KEYS, out, FP, max_concurrency=1)
    assert summary["skipped"] == ["0", "1"]
    assert summary["computed"] == ["2", "3"]
    for k in (0, 1):
        assert (
            os.path.getmtime(os.path.join(out, f"part={k}", CP.MANIFEST_NAME))
            == mtimes_before[k]
        ), "completed partition was recomputed"

    # resumed output == single-shot full run
    full = (
        spark.createDataFrame(
            sum((_builder(spark, k).collect() for k in KEYS), []),
            "point_id long, area_id int",
        )
        .toPandas()
        .sort_values(["point_id", "area_id"])
        .reset_index(drop=True)
    )
    got_df = CP.read_checkpointed(spark, out)
    assert "part" in got_df.columns  # partition key survives via basePath
    got_pdf = got_df.toPandas()
    assert (got_pdf["part"].astype(int) == got_pdf["point_id"] % 4).all()
    got = (
        got_pdf[["point_id", "area_id"]]
        .sort_values(["point_id", "area_id"])
        .reset_index(drop=True)
    )
    assert got.equals(full)

    # lineage audit: every manifest digest matches the data on disk
    audit = CP.verify_checkpoints(spark, out).toPandas()
    assert len(audit) == 4 and audit.ok.all()


def test_read_checkpointed_empty_raises(spark, tmp_path):
    out = str(tmp_path / "ckpt_empty")
    os.makedirs(out)
    with pytest.raises(FileNotFoundError, match="no committed partitions"):
        CP.read_checkpointed(spark, out)


def test_fingerprint_change_forces_recompute(spark, tmp_path):
    out = str(tmp_path / "ckpt2")
    s1 = CP.checkpointed_run(spark, _builder, [0, 1], out, "snapA", max_concurrency=2)
    assert s1["computed"] == ["0", "1"]
    s2 = CP.checkpointed_run(spark, _builder, [0, 1], out, "snapA", max_concurrency=2)
    assert s2["skipped"] == ["0", "1"] and s2["computed"] == []
    s3 = CP.checkpointed_run(spark, _builder, [0, 1], out, "snapB", max_concurrency=2)
    assert s3["computed"] == ["0", "1"] and s3["skipped"] == []


def test_digest_is_order_independent(spark):
    df1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "id long, v string")
    n1, d1 = CP.compute_digest(df1.repartition(3))
    n2, d2 = CP.compute_digest(df2.repartition(2))
    assert (n1, d1) == (n2, d2)
    n3, d3 = CP.compute_digest(df1.filter("id < 3"))
    assert d3 != d1


def test_image_lineage_manifest_fields(spark):
    """North-rule lineage: cell range + pixel digest recorded per partition
    and verifiable against an independent local recomputation."""
    import tempfile
    from functools import reduce

    from pyspark.sql import functions as F

    from housenumbercore_spark import checkpoint as CP
    from housenumbercore_spark.operators import pip_join as PJ
    from housenumbercore_spark.sources import images as IMG

    def build(s, key):
        imgs = IMG.images_df(s, 200).filter(F.pmod(F.shiftright("phash", 1), F.lit(2)) == int(key))
        return PJ.tile_assign(imgs, 13).select("image_id", "phash", "tile_id")

    out = tempfile.mkdtemp(prefix="hns_imglin_")
    CP.checkpointed_run(spark, build, [0, 1], out, "snapA", max_concurrency=1)
    mf = {r.partition: r for r in CP.manifest_summary_full(spark, out).collect()}
    assert set(mf) == {"0", "1"}

    for key in (0, 1):
        rows = build(spark, key).collect()
        m = mf[str(key)]
        assert m.row_count == len(rows)
        assert m.cell_min == min(r.tile_id for r in rows)
        assert m.cell_max == max(r.tile_id for r in rows)
        assert m.pixel_digest == reduce(lambda a, r: a ^ r.phash, rows, 0)
        assert m.input_fingerprint == "snapA"


def test_missing_out_dir_raises_explicitly(spark):
    """A never-written out_dir surfaces the module's explicit error, not a
    raw Py4J FileNotFoundException from fs.listStatus."""
    with pytest.raises(FileNotFoundError, match="no committed partitions"):
        CP.read_checkpointed(spark, "/tmp/hns_ckpt_never_written_anywhere")
    # summaries over the same path are empty, not exceptions
    assert CP.manifest_summary(
        spark, "/tmp/hns_ckpt_never_written_anywhere"
    ).count() == 0


def test_even_multiplicity_swap_detected(spark, tmp_path):
    """XOR alone cancels on even row multiplicities ({X,X} and {Y,Y} both
    xor to 0); the masked-sum second stream must catch the swap."""
    out = str(tmp_path / "ckpt_dup")

    def build_dups(s, key):
        return s.createDataFrame([("Y", 1), ("Y", 1)], "v string, k int")

    CP.checkpointed_run(spark, build_dups, [0], out, "snapA", max_concurrency=1)
    ok0 = CP.verify_checkpoints(spark, out).collect()[0]
    assert ok0.ok and ok0.manifest_sum is not None
    # corrupt the data with a DIFFERENT duplicated row (count + xor both
    # unchanged: h(X)^h(X) == h(Y)^h(Y) == 0)
    corrupt = spark.createDataFrame([("X", 2), ("X", 2)], "v string, k int")
    corrupt.write.mode("overwrite").parquet(f"{out}/part=0")
    # the overwrite wiped the manifest inside part=0 — restore it so the
    # partition still reads as committed (simulating in-place corruption)
    import json as _json

    from housenumbercore_spark.checkpoint import (
        PartitionManifest,
        _commit_manifest,
    )

    _commit_manifest(
        spark, out,
        PartitionManifest(
            partition="0", input_fingerprint="snapA", row_count=2,
            value_digest=0, completed_at=0.0, value_sum=ok0.manifest_sum,
        ),
    )
    row = CP.verify_checkpoints(spark, out).collect()[0]
    assert row.manifest_rows == row.actual_rows == 2
    assert row.manifest_digest == row.actual_digest  # xor is blind to this
    assert not row.ok  # the sum stream catches it


def test_old_manifest_without_sum_still_verifies(spark, tmp_path):
    """Manifests written before value_sum existed load with None and
    verify on count+xor alone."""
    out = str(tmp_path / "ckpt_old")

    def build(s, key):
        return s.createDataFrame([("a", 1), ("b", 2)], "v string, k int")

    CP.checkpointed_run(spark, build, [0], out, "snapA", max_concurrency=1)
    import json as _json

    from housenumbercore_spark.sources.snapshots import _write_text_atomic

    p = f"{out}/part=0/_MANIFEST.json"
    with open(p) as f:
        m = _json.load(f)
    del m["value_sum"], m["pixel_sum"]
    # rewrite through the Hadoop FS writer (POSIX would desync the .crc)
    _write_text_atomic(spark, p, _json.dumps(m))
    row = CP.verify_checkpoints(spark, out).collect()[0]
    assert row.ok and row.manifest_sum is None
