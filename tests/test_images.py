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

    def test_png_all_filter_types_decode(self):
        # one row per filter type 0..4 (spec-built deltas) — covers the
        # vectorized Sub path and the sequential Average/Paeth scans
        import struct
        import zlib

        rng = np.random.default_rng(11)
        w, h, bpp = 9, 5, 3
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        flat = px.reshape(h, w * 3).astype(np.int32)
        rows = []
        for y, ft in enumerate([0, 1, 2, 3, 4]):
            prev = flat[y - 1] if y > 0 else np.zeros(w * 3, dtype=np.int32)
            line = np.zeros(w * 3, dtype=np.int32)
            for x in range(w * 3):
                a = flat[y, x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (flat[y, x] - pred) & 0xFF
            rows.append(bytes([ft]) + line.astype(np.uint8).tobytes())
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

    def test_real_jpeg_adapter_seam(self, spark):
        """register_codec hosts a REAL codec: a mock PIL-like JPEG (SOI
        magic) plugs in with one call, encode_image/decode_image dispatch
        to it, the built-ins keep working, AND the registration reaches
        Spark Python workers (the engine's mapInPandas closures snapshot
        the registry — a bare module-global mutation would be invisible in
        the workers' fresh imports). So the jpgq→JPEG swap is a one-liner
        wherever PIL/libjpeg exists."""
        import struct

        saved_enc = dict(codec._ENCODERS)
        saved_dec = list(codec._DECODERS)
        MAGIC = b"\xff\xd8MOCK"
        try:
            def enc(px):
                h, w, _ = px.shape
                return MAGIC + struct.pack(">II", w, h) + px.tobytes()

            def dec(b):
                w, h = struct.unpack_from(">II", b, len(MAGIC))
                return (
                    np.frombuffer(b[len(MAGIC) + 8:], dtype=np.uint8)
                    .reshape(h, w, 3)
                )

            codec.register_codec("jpeg", enc, dec, lambda b: b[:6] == MAGIC)
            px = IMG.make_pixels(42)
            buf = codec.encode_image(px, "jpeg")
            assert buf[:6] == MAGIC
            assert (codec.decode_image(buf) == px).all()
            assert codec.sniff_fmt(buf) == "jpeg"
            # built-in formats still dispatch behind the registered codec
            assert (codec.decode_image(codec.encode_image(px, "png")) == px).all()
            assert (
                codec.decode_image(codec.encode_image(px, "jpgq")) != px
            ).any()

            # through a Spark worker: decode_check must decode the mock
            # format there (this is the path a driver-only registry broke)
            from housenumbercore_spark.images import udfs as IU

            px7 = IMG.make_pixels(7)
            df = spark.createDataFrame(
                [("m1", bytearray(enc(px7)), codec.phash64(px7))],
                "image_id string, bytes binary, phash long",
            )
            row = IU.decode_check(df).collect()[0]
            assert (row.w_decoded, row.h_decoded) == (IMG.IMG_W, IMG.IMG_H)
            assert row.fmt_decoded == "jpeg"
            assert row.phash_match
        finally:
            codec._ENCODERS.clear()
            codec._ENCODERS.update(saved_enc)
            codec._DECODERS[:] = saved_dec


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

    def test_null_payload_counted_as_pixel_violation(self, spark, images):
        """A NULL payload must reach the decode path and surface as a pixel
        violation — plain `==` split dropped such rows from the invariant
        check entirely (round-2 ADVICE)."""
        nulled = images.withColumn(
            "bytes",
            F.when(
                F.col("image_id") == "img0000000005",
                F.lit(None).cast("binary"),
            ).otherwise(F.col("bytes")),
        )
        summ = IU.invariant_summary(IU.check_invariants(nulled, images)).collect()[0]
        assert summ.n_rows == 300
        assert summ.n_pixel_violations == 1

    def test_decode_stats_phash_matches_column(self, spark, images):
        stats = IU.decode_stats(images)
        joined = stats.join(images.select("image_id", "phash"), "image_id")
        bad = joined.filter(F.col("phash") != F.col("phash_recomputed")).count()
        assert bad == 0


class TestMultimodalTransforms:
    def test_resize_nearest_exact_downscale(self):
        px = IMG.make_pixels(13)
        rs = codec.resize_nearest(px, 8, 8)
        assert rs.shape == (8, 8, 3)
        assert (rs == px[::2, ::2]).all()

    def test_resize_images_spark(self, spark):
        from housenumbercore_spark.images import transform as TR

        src = IMG.images_df(spark, 20)
        out = TR.resize_images(src, 8, 8).collect()
        assert len(out) == 20
        for r in out:
            dec = codec.decode_image(bytes(r.bytes))
            assert dec.shape == (8, 8, 3)
            i = int(r.image_id[3:])
            if r.fmt == "png":  # lossless: exact nearest-sample parity
                assert (dec == IMG.make_pixels(i)[::2, ::2]).all()
            else:
                assert codec.psnr(dec, IMG.make_pixels(i)[::2, ::2]) >= 40.0
            assert r.caption == IMG.make_caption(i)

    def test_video_pack_unpack(self):
        frames = [codec.encode_png(IMG.make_pixels(i)) for i in range(5)]
        assert codec.unpack_video(codec.pack_video(frames)) == frames

    def test_frame_sample_spark(self, spark):
        from housenumbercore_spark.images import transform as TR

        vids = IMG.videos_df(spark, 6, n_frames=12)
        out = TR.frame_sample(vids, 5).collect()
        assert len(out) == 6 * 3  # frames 0, 5, 10
        for r in out:
            v = int(r.video_id[3:])
            px = codec.decode_image(bytes(r.frame_bytes))
            assert (px == IMG.make_pixels(v * 1000 + r.frame_idx)).all()
            assert (r.w, r.h) == (IMG.IMG_W, IMG.IMG_H)

    def test_audio_features_spark(self, spark):
        from housenumbercore_spark.images import transform as TR

        feats = {r.audio_id: r for r in TR.audio_features(IMG.audio_df(spark, 8)).collect()}
        assert len(feats) == 8
        for i in range(8):
            r = feats[f"aud{i:08d}"]
            amp = 0.2 + (i % 8) / 10
            assert r.sample_rate == IMG.AUDIO_RATE
            assert abs(r.duration_s - (0.5 + (i % 4) / 4)) < 1e-6
            assert abs(r.rms - amp / np.sqrt(2)) < 0.01
            assert 0 < r.zero_cross_rate < 0.2

    def test_audio_external_stub(self):
        with pytest.raises(NotImplementedError):
            codec.decode_audio_external(b"ID3...", "mp3")


class TestQuarantineAndAudioRegistry:
    """Round-4 review-pass fixes: per-row failure seams in the multimodal
    transforms, the audio-decoder registry, and the left-join/zero-row
    hardening of the invariant gate."""

    def test_resize_quarantines_corrupt_payload(self, spark):
        from housenumbercore_spark.images import transform as TR

        src = IMG.images_df(spark, 6)
        poisoned = src.withColumn(
            "bytes",
            F.when(
                F.col("image_id") == "img0000000003",
                F.lit(bytearray(b"not-an-image")),
            ).otherwise(F.col("bytes")),
        )
        out = {r.image_id: r for r in TR.resize_images(poisoned, 8, 8).collect()}
        assert len(out) == 6  # one bad row must not kill the other five
        bad = out["img0000000003"]
        assert bad.bytes is None and (bad.w, bad.h) == (-1, -1)
        assert bad.caption == IMG.make_caption(3)  # caption still rides
        good = out["img0000000001"]
        assert codec.decode_image(bytes(good.bytes)).shape == (8, 8, 3)

    def test_frame_sample_quarantines_container_and_frame(self, spark):
        from housenumbercore_spark.images import transform as TR

        ok = codec.pack_video([codec.encode_png(IMG.make_pixels(i)) for i in range(2)])
        mixed = codec.pack_video([codec.encode_png(IMG.make_pixels(5)), b"garbage"])
        df = spark.createDataFrame(
            [("vidok", bytearray(ok)), ("vidbad", bytearray(b"\x00trash")),
             ("vidmix", bytearray(mixed))],
            "video_id string, bytes binary",
        )
        rows = TR.frame_sample(df, 1).collect()
        by_vid = {}
        for r in rows:
            by_vid.setdefault(r.video_id, []).append(r)
        # corrupt container → one quarantine row, job survives
        (qc,) = by_vid["vidbad"]
        assert qc.frame_idx == -1 and qc.frame_bytes is None
        # corrupt FRAME inside a valid container → that frame flagged w=h=-1
        mix = {r.frame_idx: r for r in by_vid["vidmix"]}
        assert (mix[0].w, mix[0].h) == (IMG.IMG_W, IMG.IMG_H)
        assert (mix[1].w, mix[1].h) == (-1, -1)
        assert bytes(mix[1].frame_bytes) == b"garbage"  # payload kept for triage
        assert len(by_vid["vidok"]) == 2

    def test_audio_features_quarantines_corrupt_pcm(self, spark):
        from housenumbercore_spark.images import transform as TR

        good = IMG.audio_df(spark, 2)
        poisoned = good.withColumn(
            "bytes",
            F.when(
                F.col("audio_id") == "aud00000001", F.lit(bytearray(b"AUD1junk"))
            ).otherwise(F.col("bytes")),
        )
        out = {r.audio_id: r for r in TR.audio_features(poisoned).collect()}
        assert out["aud00000001"].n_samples == -1
        assert out["aud00000000"].sample_rate == IMG.AUDIO_RATE

    def test_registered_audio_decoder_reaches_workers(self, spark):
        """register_audio_decoder is the audio twin of register_codec: the
        registration must travel into Spark Python workers through the
        registry snapshot (a driver-global alone is invisible there)."""
        from housenumbercore_spark.images import transform as TR

        saved = dict(codec._AUDIO_DECODERS)
        try:
            rate = 8000

            def fake_mp3(buf):
                n = int.from_bytes(buf[4:8], "big")
                t = np.arange(n) / rate
                return (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(
                    np.int16
                ), rate

            codec.register_audio_decoder("mp3", fake_mp3)
            # driver-side dispatch
            s, r = codec.decode_audio_external(b"MP3F" + (160).to_bytes(4, "big"), "MP3")
            assert r == rate and len(s) == 160
            # worker-side dispatch through audio_features
            df = spark.createDataFrame(
                [("a0", bytearray(b"MP3F" + (4000).to_bytes(4, "big")), "mp3", "c")],
                "audio_id string, bytes binary, fmt string, caption string",
            )
            row = TR.audio_features(df).collect()[0]
            assert row.sample_rate == rate
            assert row.n_samples == 4000
            assert abs(row.duration_s - 0.5) < 1e-9
            assert abs(row.rms - 0.5 / np.sqrt(2)) < 0.01
        finally:
            codec._AUDIO_DECODERS.clear()
            codec._AUDIO_DECODERS.update(saved)

    def test_unregistered_format_still_raises_loudly(self, spark):
        """NotImplementedError is a configuration error, not dirty data —
        it must abort the job, not quarantine."""
        from pyspark.errors.exceptions.captured import PythonException

        from housenumbercore_spark.images import transform as TR

        df = spark.createDataFrame(
            [("a0", bytearray(b"ID3xxxx"), "opus", "c")],
            "audio_id string, bytes binary, fmt string, caption string",
        )
        with pytest.raises(PythonException, match="NotImplementedError"):
            TR.audio_features(df).collect()

    def test_unknown_output_id_is_a_violation(self, spark):
        """check_invariants joins output LEFT: an output row whose id
        matches no source row (corrupted/renamed id) must surface as a
        pixel AND caption violation, not silently vanish (the inner join
        dropped exactly the corruption class the gate exists to catch)."""
        src = IMG.images_df(spark, 10)
        renamed = src.withColumn(
            "image_id",
            F.when(
                F.col("image_id") == "img0000000002", F.lit("imgCORRUPTED")
            ).otherwise(F.col("image_id")),
        )
        summ = IU.invariant_summary(IU.check_invariants(renamed, src)).collect()[0]
        assert summ.n_rows == 10  # every OUTPUT row is checked
        assert summ.n_pixel_violations == 1
        assert summ.n_caption_violations == 1

    def test_summaries_over_zero_rows(self, spark):
        """An empty check (zero output rows) must read as zero violations
        and a vacuously-true PSNR gate, not NULLs."""
        src = IMG.images_df(spark, 3)
        empty = src.filter(F.lit(False))
        chk = IU.check_invariants(empty, src)
        summ = IU.invariant_summary(chk).collect()[0]
        assert (summ.n_rows, summ.n_pixel_violations, summ.n_caption_violations) == (
            0, 0, 0,
        )
        gate = IU.invariant_gate_summary(chk).collect()[0]
        assert gate.n_rows == 0 and gate.psnr_gate_ok is True
