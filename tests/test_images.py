"""Image codec + invariant machinery tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from housenumbercore_spark.images import codec
from housenumbercore_spark.images import udfs as IU
from housenumbercore_spark.sources import images as IMG


class TestCodec:
    def test_png_roundtrip_exact(self):
        px = IMG.make_pixels(7)
        buf = codec.encode_png(px)
        out = codec.decode_png(buf)
        assert (out == px).all()
        assert codec.psnr(px, out) == float("inf")

    def test_png_filters_decode(self):
        # hand-build a PNG with Up filter rows to exercise the decoder paths
        import struct
        import zlib

        px = IMG.make_pixels(3)
        h, w, _ = px.shape
        rows = []
        prev = np.zeros(w * 3, dtype=np.int32)
        flat = px.reshape(h, w * 3).astype(np.int32)
        for y in range(h):
            rows.append(bytes([2]) + ((flat[y] - prev) & 0xFF).astype(np.uint8).tobytes())
            prev = flat[y]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        buf = (
            codec.PNG_SIG
            + codec._chunk(b"IHDR", ihdr)
            + codec._chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + codec._chunk(b"IEND", b"")
        )
        assert (codec.decode_png(buf) == px).all()

    def test_jpgq_lossy_psnr_above_40(self):
        for i in (0, 5, 123):
            px = IMG.make_pixels(i)
            out = codec.decode_jpgq(codec.encode_jpgq(px))
            p = codec.psnr(px, out)
            assert p >= 40.0, p
            assert not (out == px).all()  # genuinely lossy

    def test_phash_stable_and_sensitive(self):
        a = codec.phash64(IMG.make_pixels(1))
        a2 = codec.phash64(IMG.make_pixels(1))
        b = codec.phash64(IMG.make_pixels(2))
        assert a == a2
        assert codec.hamming64(a, b) > 4
        # lossy re-encode moves the hash only mildly (tiny 16x16 images put
        # many DCT coefficients near the median, so a handful of bits flip)
        lossy = codec.decode_jpgq(codec.encode_jpgq(IMG.make_pixels(1)))
        assert codec.hamming64(a, codec.phash64(lossy)) <= 16

    def test_decode_dispatch_rejects_garbage(self):
        with pytest.raises(ValueError):
            codec.decode_image(b"garbage-bytes")


class TestImagesTable:
    @pytest.fixture(scope="class")
    def images(self, spark):
        return IMG.images_df(spark, 300, partitions=4).cache()

    def test_schema_and_determinism(self, spark, images):
        assert images.count() == 300
        assert images.schema == IMG.SCHEMA
        # regenerating yields byte-identical rows
        again = IMG.images_df(spark, 300, partitions=2)
        a = images.orderBy("image_id").toPandas()
        b = again.orderBy("image_id").toPandas()
        assert (a.phash.values == b.phash.values).all()
        assert all(bytes(x) == bytes(y) for x, y in zip(a["bytes"], b["bytes"]))

    def test_invariants_pass_through_spatial_join(self, spark, images):
        from housenumbercore_spark.operators import pip_join as PJ
        from housenumbercore_spark.sources import synthetic as S

        areas = S.areas_df(spark, "/root/testdata/sf0.001")
        assigned = PJ.assign_points_to_areas(
            spark, images, areas
        )  # payload (bytes) rides through the broadcast join
        chk = IU.check_invariants(assigned, images)
        summ = IU.invariant_summary(chk).collect()[0]
        assert summ.n_rows == assigned.count()
        assert summ.n_pixel_violations == 0
        assert summ.n_caption_violations == 0
        assert summ.min_psnr_db >= 40.0

    def test_corruption_detected(self, spark, images):
        corrupted = images.withColumn(
            "bytes",
            F.when(
                F.col("image_id") == "img0000000004",
                F.lit(bytearray(codec.encode_png(IMG.make_pixels(999)))),
            ).otherwise(F.col("bytes")),
        ).withColumn(
            "caption",
            F.when(F.col("image_id") == "img0000000007", F.lit("tampered")).otherwise(
                F.col("caption")
            ),
        )
        summ = IU.invariant_summary(IU.check_invariants(corrupted, images)).collect()[0]
        assert summ.n_pixel_violations == 1
        assert summ.n_caption_violations == 1

    def test_decode_stats_phash_matches_column(self, spark, images):
        stats = IU.decode_stats(images)
        joined = stats.join(images.select("image_id", "phash"), "image_id")
        bad = joined.filter(F.col("phash") != F.col("phash_recomputed")).count()
        assert bad == 0
