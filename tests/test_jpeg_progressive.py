"""Progressive (SOF2) JPEG decode, proven two independent ways:

1. TRANSCODE EXACTNESS — transcode_progressive re-encodes any baseline
   stream's quantized coefficients as a progressive scan script
   (interleaved DC first/refine with successive approximation, per-band
   AC first, AC refinement). Transcoding is lossless in the coefficient
   domain, so decode(progressive) must equal decode(baseline) BIT FOR
   BIT; the baseline decoder is itself proven against real libjpeg output
   (tests/test_jpeg.py golden fixtures). Covers 4:2:0 subsampling, the
   non-interleaved comp-dims ≠ MCU-padded-dims corner (photo fixture: Y
   is 37×38 blocks in AC scans vs a 38×38 padded array), restart resync
   inside progressive scans, ZRL-in-refinement and correction bits.

2. REAL-ENCODER FIXTURES — three progressive files produced by libjpeg-
   family encoders (from the Apache Spark distribution's mllib test data
   and the Node.js documentation), decoded and pinned by content anchors.
   Their scan scripts use EOB-run batching (EOBn, n>0) in both first and
   refinement AC scans — the one code path the transcoder deliberately
   does not emit — plus Al=2 successive approximation and Ah=2→1→0
   refinement chains.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from housenumbercore_spark.images import codec
from housenumbercore_spark.images import jpeg as J

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _fix(name: str) -> bytes:
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


class TestTranscodeExactness:
    @pytest.mark.parametrize("ri", [0, 3])
    def test_synthetic_roundtrip_bit_exact(self, ri):
        from housenumbercore_spark.sources.images import make_pixels

        for i in (0, 3, 11):
            base = J.encode_jpeg(make_pixels(i), quality=90, restart_interval=ri)
            prog = J.transcode_progressive(base, restart_interval=ri)
            assert np.array_equal(J.decode_jpeg(base), J.decode_jpeg(prog))

    def test_random_odd_sizes_bit_exact(self):
        rng = np.random.default_rng(7)
        for shape in ((17, 23, 3), (64, 48, 3), (8, 8, 3)):
            px = rng.integers(0, 256, shape, dtype=np.uint8)
            base = J.encode_jpeg(px, quality=85)
            prog = J.transcode_progressive(base)
            assert np.array_equal(J.decode_jpeg(base), J.decode_jpeg(prog))

    @pytest.mark.parametrize("ri", [0, 2])
    def test_libjpeg_420_golden_roundtrip(self, ri):
        base = _fix("golden_libjpeg.jpg")
        prog = J.transcode_progressive(base, restart_interval=ri)
        assert np.array_equal(J.decode_jpeg(base), J.decode_jpeg(prog))

    def test_photo_420_block_dim_corner(self):
        """296×300 4:2:0: the luma plane is 37×38 blocks in non-interleaved
        AC scans but 38×38 in the MCU-padded array — the transcode
        roundtrip fails loudly if either side iterates the wrong grid."""
        base = _fix("photo_420_296x300.jpg")
        coefs, meta = J._decode_to_coefficients(base)
        y = meta["comps"][0]
        assert J._comp_block_dims(
            y, meta["w"], meta["h"], meta["max_h"], meta["max_v"]
        ) == (37, 38)
        assert coefs[0].shape[:2] == (38, 38)
        prog = J.transcode_progressive(base)
        assert np.array_equal(J.decode_jpeg(base), J.decode_jpeg(prog))

    def test_transcoded_stream_is_sof2_multiscan(self):
        base = J.encode_jpeg(np.zeros((16, 16, 3), dtype=np.uint8))
        prog = J.transcode_progressive(base)
        assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog[2:]
        assert prog.count(b"\xff\xda") >= 8  # DC×2 + AC bands×(2·3 comps)


class TestCorruptStreams:
    def test_fill_bytes_before_marker_tolerated(self):
        """T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker.
        Insert one before the first DHT — decode must be unaffected."""
        from housenumbercore_spark.sources.images import make_pixels

        base = J.encode_jpeg(make_pixels(7), quality=90)
        i = base.find(b"\xff\xc4")
        padded = base[:i] + b"\xff" + base[i:]
        assert np.array_equal(J.decode_jpeg(padded), J.decode_jpeg(base))

    def test_zero_sampling_factor_raises_valueerror(self):
        from housenumbercore_spark.sources.images import make_pixels

        base = bytearray(J.encode_jpeg(make_pixels(7), quality=90))
        i = bytes(base).find(b"\xff\xc0")
        base[i + 11] = 0x00  # comp 1 hv byte -> 0x00
        with pytest.raises(ValueError, match="sampling factor"):
            J.decode_jpeg(bytes(base))

    def test_decompression_bomb_guard(self):
        from housenumbercore_spark.sources.images import make_pixels

        base = bytearray(J.encode_jpeg(make_pixels(7), quality=90))
        i = bytes(base).find(b"\xff\xc0")
        base[i + 5 : i + 9] = b"\xff\xff\xff\xff"  # h = w = 65535
        with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
            J.decode_jpeg(bytes(base))

    def test_mutation_fuzz_raises_only_valueerror(self):
        """Byte-mutate valid baseline/progressive/real streams: decode must
        either succeed (entropy bits tolerate damage) or raise ValueError —
        never an untyped IndexError/KeyError/OverflowError and never hang
        (the per-row failure contract of a crawl-scale decode stage)."""
        from housenumbercore_spark.sources.images import make_pixels

        rng = np.random.default_rng(42)
        base = J.encode_jpeg(make_pixels(7), quality=90)
        sources = [base, J.transcode_progressive(base), _fix("prog_rgb_58x493.jpg")]
        for src in sources:
            for _ in range(60):
                b = bytearray(src)
                for _ in range(int(rng.integers(1, 6))):
                    b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
                try:
                    J.decode_jpeg(bytes(b))
                except ValueError:
                    pass  # the typed contract
                # anything else propagates and fails the test


class TestSubsampledEncoding:
    @pytest.mark.parametrize("sampling", ["4:2:0", "4:2:2"])
    @pytest.mark.parametrize("shape", [(33, 41, 3), (17, 15, 3), (64, 48, 3)])
    def test_encode_roundtrip_and_progressive(self, sampling, shape):
        """Our own subsampled streams: decoded dims exact, PSNR sane on a
        smooth image, and the progressive transcode stays bit-exact (the
        richest exercise of non-interleaved scans whose component block
        grid differs from the MCU-padded one)."""
        rng = np.random.default_rng(hash((sampling, shape)) % 2**31)
        smooth = rng.integers(0, 256, (6, 7, 3)).astype(np.float64)
        px = np.clip(
            np.repeat(np.repeat(smooth, 8, 0), 8, 1)[: shape[0], : shape[1]],
            0,
            255,
        ).astype(np.uint8)
        buf = J.encode_jpeg(px, quality=92, sampling=sampling)
        dec = J.decode_jpeg(buf)
        assert dec.shape == px.shape
        assert codec.psnr(px, dec) > 30.0
        prog = J.transcode_progressive(buf)
        assert np.array_equal(J.decode_jpeg(prog), dec)

    def test_420_sof_and_size_win(self):
        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        b444 = J.encode_jpeg(px, quality=90, sampling="4:4:4")
        b420 = J.encode_jpeg(px, quality=90, sampling="4:2:0")
        # SOF component 1 sampling byte: 0x22 for 4:2:0
        i = b420.find(b"\xff\xc0")
        assert b420[i + 11] == 0x22
        assert len(b420) < len(b444)

    def test_unknown_sampling_rejected(self):
        with pytest.raises(ValueError, match="sampling"):
            J.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), sampling="4:1:1")


class TestTranscodeFuzz:
    def test_hypothesis_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            w=st.integers(1, 40),
            h=st.integers(1, 40),
            q=st.sampled_from([35, 60, 90, 97]),
            ri=st.sampled_from([0, 1, 5]),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(w, h, q, ri, seed):
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            base = J.encode_jpeg(px, quality=q, restart_interval=ri)
            prog = J.transcode_progressive(base, restart_interval=ri)
            assert np.array_equal(J.decode_jpeg(base), J.decode_jpeg(prog))

        check()


class TestRealProgressiveFixtures:
    # (file, shape, sha256[:16] of decoded RGB, phash64)
    ANCHORS = [
        ("prog_gray_215x300.jpg", (215, 300, 3),
         "ace884f04c9c2be6", -368841306167770310),
        ("prog_rgb_58x493.jpg", (58, 493, 3),
         "73ce8c019a427028", -5450962576819852694),
        ("prog_rgb_312x493.jpg", (312, 493, 3),
         "330fe1cd3ed781f8", 4485234210818113216),
    ]

    @pytest.mark.parametrize("name,shape,sha,ph", ANCHORS)
    def test_decode_anchors(self, name, shape, sha, ph):
        px = J.decode_jpeg(_fix(name))
        assert px.shape == shape
        assert hashlib.sha256(px.tobytes()).hexdigest()[:16] == sha
        assert codec.phash64(px) == ph

    def test_grayscale_decodes_to_equal_channels(self):
        px = J.decode_jpeg(_fix("prog_gray_215x300.jpg"))
        assert np.array_equal(px[..., 0], px[..., 1])
        assert np.array_equal(px[..., 0], px[..., 2])

    def test_white_stripe_is_mostly_white(self):
        # semantic sanity independent of the pinned anchors: the Node.js
        # doc images are a small logo on a white page
        px = J.decode_jpeg(_fix("prog_rgb_312x493.jpg"))
        assert (px > 240).mean() > 0.85

    def test_eobrun_batching_is_exercised(self):
        """The real fixtures must cover the EOBn>0 path the transcoder
        skips — instrument the band decoders and count."""
        seen = {"first": 0, "refine": 0}
        orig_f, orig_r = J._ac_first, J._ac_refine

        def f(*a):
            r = orig_f(*a)
            if r > 0:
                seen["first"] += 1
            return r

        def g(*a):
            r = orig_r(*a)
            if r > 0:
                seen["refine"] += 1
            return r

        J._ac_first, J._ac_refine = f, g
        try:
            J.decode_jpeg(_fix("prog_rgb_312x493.jpg"))
            J.decode_jpeg(_fix("prog_gray_215x300.jpg"))
        finally:
            J._ac_first, J._ac_refine = orig_f, orig_r
        assert seen["first"] > 0 and seen["refine"] > 0

    def test_register_progressive_encoder(self):
        """progressive=True on the registry seam: encode emits SOF2 and the
        round trip is pixel-identical to the baseline registration."""
        from housenumbercore_spark.sources.images import make_pixels

        saved_enc = dict(codec._ENCODERS)
        saved_dec = list(codec._DECODERS)
        try:
            px = make_pixels(5)
            J.register_real_jpeg(progressive=False)
            base_rt = codec.decode_image(codec.encode_image(px, "jpeg"))
            J.register_real_jpeg(progressive=True)
            buf = codec.encode_image(px, "jpeg")
            assert b"\xff\xc2" in buf
            assert np.array_equal(codec.decode_image(buf), base_rt)
        finally:
            codec._ENCODERS.clear()
            codec._ENCODERS.update(saved_enc)
            codec._DECODERS[:] = saved_dec

    def test_registry_routes_progressive_bytes(self):
        """A progressive payload sniffs as JPEG and decodes through the
        production registry seam."""
        saved_enc = dict(codec._ENCODERS)
        saved_dec = list(codec._DECODERS)
        try:
            J.register_real_jpeg()
            buf = _fix("prog_rgb_58x493.jpg")
            assert codec.sniff_fmt(buf) == "jpeg"
            px = codec.decode_image(buf)
            assert px.shape == (58, 493, 3)
        finally:
            codec._ENCODERS.clear()
            codec._ENCODERS.update(saved_enc)
            codec._DECODERS[:] = saved_dec
