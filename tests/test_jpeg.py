"""Real baseline JPEG codec (images/jpeg.py) — round-trip, golden real-world
fixtures produced by libjpeg, and the register_codec production swap.

Closes the round-3 verdict's "real JPEG codec behind the seam" ask: the
golden fixtures are genuine libjpeg output (CPython/IPython test data —
``golden_libjpeg.jpg`` is 16×16 4:2:0 three-component baseline,
``golden_gray_2x2.jpg`` is single-component grayscale), so the decoder is
proven against an INDEPENDENT encoder, not just its own."""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pytest

from housenumbercore_spark.images import codec
from housenumbercore_spark.images import jpeg as J
from housenumbercore_spark.sources import images as IMG

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _smooth_image(seed: int, h: int = 24, w: int = 40) -> np.ndarray:
    """Natural-statistics test image: low-pass-filtered noise (JPEG's
    design target; uniform noise would be adversarial for ANY DCT codec)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(h, w, 3))
    out = np.zeros((h, w, 3))
    yy = np.minimum(np.arange(h)[:, None], h - np.arange(h)[:, None])
    xx = np.minimum(np.arange(w)[None, :], w - np.arange(w)[None, :])
    mask = np.exp(-(yy**2 + xx**2) / 18.0)
    for c in range(3):
        out[..., c] = np.real(np.fft.ifft2(np.fft.fft2(base[..., c]) * mask))
    out -= out.min()
    return (out / out.max() * 255).astype(np.uint8)


class TestTables:
    def test_annex_k_specs_complete(self):
        """Every symbol the encoder can emit exists in its table: DC sizes
        0-11, AC (run 0-15 × size 1-10) + EOB + ZRL; bit-length counts sum
        to the value counts (canonical Huffman well-formedness)."""
        for spec in (J.DC_LUMA_SPEC, J.DC_CHROMA_SPEC):
            codes = J._huff_codes(*spec)
            assert set(codes) == set(range(12))
        for spec in (J.AC_LUMA_SPEC, J.AC_CHROMA_SPEC):
            codes = J._huff_codes(*spec)
            need = {(r << 4) | s for r in range(16) for s in range(1, 11)}
            need |= {0x00, 0xF0}
            assert need <= set(codes)
        # kraft: canonical assignment never overflows 16 bits
        for spec in (J.DC_LUMA_SPEC, J.DC_CHROMA_SPEC, J.AC_LUMA_SPEC,
                     J.AC_CHROMA_SPEC):
            for code, ln in J._huff_codes(*spec).values():
                assert code < (1 << ln)

    def test_zigzag_is_the_standard_order(self):
        assert J.ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert sorted(J.ZIGZAG.tolist()) == list(range(64))


class TestRoundTrip:
    def test_psnr_above_north_rule_floor_on_engine_images(self):
        """register_real_jpeg's default quality must clear the 40 dB
        per-row invariant on the engine's own image table."""
        for i in (0, 7, 42, 123, 999):
            px = IMG.make_pixels(i)
            dec = J.decode_jpeg(J.encode_jpeg(px, quality=95))
            assert dec.shape == px.shape
            p = codec.psnr(px, dec)
            assert p >= 40.0, (i, p)

    def test_psnr_on_natural_statistics_images(self):
        for seed in (1, 2, 3):
            px = _smooth_image(seed)
            assert codec.psnr(px, J.decode_jpeg(J.encode_jpeg(px, 95))) >= 40.0

    def test_odd_dimensions_and_grayscale_input(self):
        px = _smooth_image(5)[:17, :23]
        dec = J.decode_jpeg(J.encode_jpeg(px, 92))
        assert dec.shape == (17, 23, 3)
        assert codec.psnr(px, dec) >= 35.0
        gray = _smooth_image(6)[..., 0]
        dec = J.decode_jpeg(J.encode_jpeg(gray, 95))
        assert dec.shape == (*gray.shape, 3)

    def test_flat_image_is_lossless(self):
        flat = np.full((8, 8, 3), 128, np.uint8)
        assert (J.decode_jpeg(J.encode_jpeg(flat)) == flat).all()

    def test_quality_monotonicity(self):
        px = _smooth_image(9)
        p = [codec.psnr(px, J.decode_jpeg(J.encode_jpeg(px, q)))
             for q in (50, 75, 90, 97)]
        assert p == sorted(p), p

    def test_restart_interval_roundtrip_bit_identical(self):
        """DRI/RSTn resync: the restart-marker stream decodes to EXACTLY
        the same pixels as the unsegmented stream (same quantized
        coefficients, different entropy framing), and the markers are
        really in the bytes."""
        px = _smooth_image(11, h=32, w=32)  # 16 MCUs at 4:4:4
        plain = J.encode_jpeg(px, 90)
        rst = J.encode_jpeg(px, 90, restart_interval=3)
        assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI
        assert any(bytes([0xFF, 0xD0 + k]) in rst for k in range(8))
        assert (J.decode_jpeg(rst) == J.decode_jpeg(plain)).all()


class TestGoldenLibjpegFixtures:
    """Decode REAL libjpeg output — an independent encoder implementation."""

    def test_color_420_fixture(self):
        buf = open(os.path.join(FIX, "golden_libjpeg.jpg"), "rb").read()
        assert codec.sniff_fmt(buf) is None  # default registry: not ours
        assert J.sniff_jpeg(buf)
        im = J.decode_jpeg(buf)
        assert im.shape == (16, 16, 3) and im.dtype == np.uint8
        # 4:2:0 per the SOF (the subsampled-decode path, replication upsample)
        i = buf.index(b"\xff\xc0")
        _, h, w, nc = struct.unpack_from(">BHHB", buf, i + 4)
        samp = [(buf[i + 11 + 3 * c] >> 4, buf[i + 11 + 3 * c] & 15)
                for c in range(nc)]
        assert (h, w, nc) == (16, 16, 3) and samp == [(2, 2), (1, 1), (1, 1)]
        # real image content, full dynamic range
        assert im.min() == 0 and im.max() == 255
        assert 80 < im.mean() < 105
        # decode is deterministic — regression anchors for decoder changes
        assert codec.phash64(im) == 1072022868231941010
        assert hashlib.sha256(im.tobytes()).hexdigest() == (
            "2a250932a73d84184d7996ac55ab3fb2f8c761ea3e2ce85731437fa0426aaece"
        )
        assert (J.decode_jpeg(buf) == im).all()

    def test_grayscale_fixture(self):
        buf = open(os.path.join(FIX, "golden_gray_2x2.jpg"), "rb").read()
        im = J.decode_jpeg(buf)
        assert im.shape == (2, 2, 3)
        # the IPython fixture is a neutral gray patch
        assert (im == 128).all()

    def test_arithmetic_coding_rejected(self):
        # SOF9 = arithmetic-coded sequential: still out of scope (SOF2
        # progressive is decoded since round 4 — tests/test_jpeg_progressive.py)
        sof9 = b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 11) + bytes(9)
        with pytest.raises(ValueError, match="SOF9"):
            J.decode_jpeg(sof9)

    def test_not_a_jpeg_rejected(self):
        with pytest.raises(ValueError, match="SOI"):
            J.decode_jpeg(b"\x89PNG\r\n\x1a\nnope")


class TestRegistrySwap:
    def test_register_real_jpeg_through_spark_worker(self, spark):
        """The production swap end to end: one register_real_jpeg() call
        routes fmt 'jpeg' through the REAL codec, the registration reaches
        Spark Python workers via the registry snapshot, and decode_check
        verifies real-JPEG payloads (dims, sniffed fmt, recomputed phash)."""
        from housenumbercore_spark.images import udfs as IU

        saved_enc = dict(codec._ENCODERS)
        saved_dec = list(codec._DECODERS)
        try:
            J.register_real_jpeg()
            px = IMG.make_pixels(42)
            buf = codec.encode_image(px, "jpeg")
            assert buf[:3] == b"\xff\xd8\xff"
            assert codec.sniff_fmt(buf) == "jpeg"
            dec = codec.decode_image(buf)
            assert codec.psnr(px, dec) >= 40.0
            # built-ins behind the registered codec still dispatch
            assert codec.sniff_fmt(codec.encode_image(px, "jpgq")) == "jpgq"
            assert (codec.decode_image(codec.encode_image(px, "png")) == px).all()

            # through a Spark worker: stored phash is the ingest-time hash
            # of the decoded payload (what a real table carries), so the
            # recomputed-phash check must agree exactly
            rows = []
            for i in (3, 17):
                b = codec.encode_image(IMG.make_pixels(i), "jpeg")
                rows.append(
                    (f"j{i}", bytearray(b), codec.phash64(codec.decode_image(b)))
                )
            df = spark.createDataFrame(
                rows, "image_id string, bytes binary, phash long"
            )
            out = {r.image_id: r for r in IU.decode_check(df).collect()}
            for r in out.values():
                assert (r.w_decoded, r.h_decoded) == (IMG.IMG_W, IMG.IMG_H)
                assert r.fmt_decoded == "jpeg"
                assert r.phash_match
        finally:
            codec._ENCODERS.clear()
            codec._ENCODERS.update(saved_enc)
            codec._DECODERS[:] = saved_dec

    def test_north_rule_psnr_gate_on_real_jpeg_reencodes(self, spark):
        """The full north-rule chain on REAL JPEG bytes: image rows ride
        the spatial join, then the invariant gate decodes BOTH payloads
        (source PNG vs real-JPEG re-encode — bytes differ, so no
        byte-equal short-circuit) and the per-row PSNR ≥ 40 dB floor
        holds with finite PSNR values, captions byte-equal."""
        from housenumbercore_spark.images import udfs as IU
        from housenumbercore_spark.operators import pip_join as PJ
        from housenumbercore_spark.sources import synthetic as S

        saved_enc = dict(codec._ENCODERS)
        saved_dec = list(codec._DECODERS)
        try:
            J.register_real_jpeg()
            sf = "/root/testdata/sf0.001"
            coords = (
                S.points_df(spark, sf).limit(40).select("lon", "lat").collect()
            )
            src_rows, out_rows = [], []
            for i, c in enumerate(coords):
                px = IMG.make_pixels(i)
                cap = f"caption-{i}"
                src_rows.append(
                    (f"im{i}", bytearray(codec.encode_image(px, "png")), cap)
                )
                out_rows.append(
                    (
                        f"im{i}",
                        bytearray(codec.encode_image(px, "jpeg")),
                        cap,
                        float(c.lon),
                        float(c.lat),
                    )
                )
            src = spark.createDataFrame(
                src_rows, "image_id string, bytes binary, caption string"
            )
            out = spark.createDataFrame(
                out_rows,
                "image_id string, bytes binary, caption string, "
                "lon double, lat double",
            )
            assigned = PJ.assign_points_to_areas(
                spark, out, S.areas_df(spark, sf)
            )
            chk = IU.check_invariants(assigned, src)
            rows = chk.collect()
            assert rows  # every point falls in ≥1 admin area by design
            assert all(r.pixels_ok and r.caption_ok for r in rows)
            # bytes differ → the REAL decode path ran: PSNR finite
            assert all(40.0 <= r.psnr_db < 999.0 for r in rows)
            g = IU.invariant_gate_summary(chk).collect()[0]
            assert (
                g.n_pixel_violations == 0
                and g.n_caption_violations == 0
                and g.psnr_gate_ok
            )
        finally:
            codec._ENCODERS.clear()
            codec._ENCODERS.update(saved_enc)
            codec._DECODERS[:] = saved_dec

    def test_golden_fixture_through_registered_engine(self, spark):
        """A genuine libjpeg file flows through the registered engine path:
        sniffed as jpeg, decoded in a Spark worker, dims verified."""
        from housenumbercore_spark.images import udfs as IU

        saved_enc = dict(codec._ENCODERS)
        saved_dec = list(codec._DECODERS)
        try:
            J.register_real_jpeg()
            buf = open(os.path.join(FIX, "golden_libjpeg.jpg"), "rb").read()
            ph = codec.phash64(codec.decode_image(buf))
            df = spark.createDataFrame(
                [("golden", bytearray(buf), ph)],
                "image_id string, bytes binary, phash long",
            )
            row = IU.decode_check(df).collect()[0]
            assert (row.w_decoded, row.h_decoded) == (16, 16)
            assert row.fmt_decoded == "jpeg"
            assert row.phash_match
        finally:
            codec._ENCODERS.clear()
            codec._ENCODERS.update(saved_enc)
            codec._DECODERS[:] = saved_dec


class TestBombGuards:
    """Review regressions: hostile geometry must raise typed ValueError
    before any unbounded allocation."""

    def test_many_component_sof_rejected(self):
        import struct

        from housenumbercore_spark.images import jpeg as J

        nc = 255
        sof = struct.pack(">BHHB", 8, 5792, 5792, nc) + b"".join(
            struct.pack("BBB", i, 0x11, 0) for i in range(nc)
        )
        buf = (
            b"\xff\xd8"
            + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
            + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="component count"):
            J.decode_jpeg(buf)

    def test_component_scaled_budget_padding_bomb_rejected(self, monkeypatch):
        """ADVICE r4 + r5 review: the cell budget scales by the ACTUAL
        component count (a flat 3x budget rejected spec-legal 4-component
        CMYK near the pixel cap), so what it uniquely catches is padding
        geometry — a thin frame whose 32px MCU rounding multiplies the
        padded plane far beyond h*w. Shrink the cap so the bomb fits the
        pixel guard but blows the padded-cell budget."""
        import struct

        from housenumbercore_spark.images import jpeg as J

        monkeypatch.setattr(J, "MAX_DECODE_PIXELS", 10_000)
        # 1x9999 with 4x4 sampling: h*w = 9999 <= cap, but the plane pads
        # to 32 x 10016 = 320k cells > 1 * 10000 * 9/8
        sof = struct.pack(">BHHB", 8, 1, 9999, 1) + struct.pack("BBB", 0, 0x44, 0)
        buf = (
            b"\xff\xd8"
            + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
            + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="coefficient cells"):
            J.decode_jpeg(buf)

    def test_four_component_cmyk_near_cap_within_budget(self):
        """A 4-component (Adobe CMYK) 4:4:4 frame near the pixel cap is
        spec-legal and previously decodable — the nc-scaled budget must
        NOT reject it (r5 review: the flat 3x budget did)."""
        import struct

        from housenumbercore_spark.images import jpeg as J

        side = int(J.MAX_DECODE_PIXELS ** 0.5) - 8  # h*w under the cap
        nc = 4
        sof = struct.pack(">BHHB", 8, side, side, nc) + b"".join(
            struct.pack("BBB", i, 0x11, 0) for i in range(nc)
        )
        buf = (
            b"\xff\xd8"
            + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
            + b"\xff\xd9"
        )
        try:
            J.decode_jpeg(buf)
        except ValueError as e:
            assert "coefficient cells" not in str(e)
            assert "MAX_DECODE_PIXELS" not in str(e)

    def test_three_component_full_res_within_budget(self):
        """3 full-res components at the pixel cap are exactly the
        documented budget — the guard must NOT reject them (they fail
        later only if the stream is otherwise truncated)."""
        import struct

        from housenumbercore_spark.images import jpeg as J

        side = int(J.MAX_DECODE_PIXELS ** 0.5) - 8
        sof = struct.pack(">BHHB", 8, side, side, 3) + b"".join(
            struct.pack("BBB", i, 0x11, 0) for i in range(3)
        )
        buf = (
            b"\xff\xd8"
            + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
            + b"\xff\xd9"
        )
        try:
            J.decode_jpeg(buf)
        except ValueError as e:
            assert "coefficient cells" not in str(e)
            assert "MAX_DECODE_PIXELS" not in str(e)

    def test_non_integer_sampling_ratio_rejected(self):
        import struct

        from housenumbercore_spark.images import jpeg as J

        # 3x1 luma vs 2x1 chroma: spec-legal, but replication upsampling
        # needs integer ratios — must fail with a diagnosis at SOF parse
        sof = struct.pack(">BHHB", 8, 16, 16, 2) + bytes([1, 0x31, 0, 2, 0x21, 0])
        buf = (
            b"\xff\xd8"
            + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
            + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="sampling ratio"):
            J.decode_jpeg(buf)

    def test_png_zlib_bomb_rejected(self):
        import struct
        import zlib

        import numpy as np

        from housenumbercore_spark.images import codec as C

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data))
            )

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        idat = zlib.compress(b"\x00" * 10_000_000)  # claims 2x2, holds 10MB
        bomb = (
            C.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="exceeds"):
            C.decode_png(bomb)
        # clean round-trip still works through the bounded path
        px = np.zeros((4, 4, 3), np.uint8)
        assert C.decode_png(C.encode_png(px)).shape == (4, 4, 3)

    def test_jpgq_zlib_bomb_rejected(self):
        import struct
        import zlib

        from housenumbercore_spark.images import codec as C

        bomb = (
            C.JPGQ_MAGIC + struct.pack(">IIBB", 2, 2, 3, 4)
            + zlib.compress(b"\x00" * 10_000_000)
        )
        with pytest.raises(ValueError, match="exceeds"):
            C.decode_jpgq(bomb)
