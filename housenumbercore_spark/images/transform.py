"""Multimodal column transforms: image resize, video frame sampling, audio
feature extraction — the decode/transform stages of a large-scale training
pipeline over opaque binary columns.

All three follow one shape: binary column in → ``mapInPandas`` (Arrow
batches, no per-row Python) → typed rows out. The fact path never touches
the driver; payload bytes stay inside the partition that read them (narrow
transform, zero shuffle). At the 10¹²-row target the only knob is input
partition size (`spark.sql.files.maxPartitionBytes`) because every stage
here is map-only.

The reference has no multimodal surface (it is a house-number evaluator);
these operators extend the engine per the graft brief, reusing its
from-scratch codecs (images/codec.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from . import codec

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),  # NULL = quarantined
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-resample to (out_w, out_h) → re-encode in the row's
    own fmt. Captions pass through byte-identical (north-rule invariant).

    Per-row failure seam: a corrupt payload yields a quarantine row
    (bytes=NULL, w=h=-1) instead of killing the task — one bad image among
    billions must not abort the job; downstream gates see the dims
    mismatch loudly."""
    snap = codec.registry_snapshot()  # ship registered codecs to workers

    def gen(batches):
        codec.install_registry(snap)
        for pdf in batches:
            rows = []
            for iid, buf, fmt, cap in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["caption"]
            ):
                try:
                    px = codec.decode_image(bytes(buf))
                    rs = codec.resize_nearest(px, out_w, out_h)
                    rows.append(
                        (iid, codec.encode_image(rs, fmt), out_w, out_h, fmt, cap)
                    )
                except Exception:
                    rows.append((iid, None, -1, -1, fmt, cap))
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])

    return df.select("image_id", "bytes", "fmt", "caption").mapInPandas(
        gen, _RESIZE_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),  # NULL = quarantined
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
    ]
)


def frame_sample(df: DataFrame, every_k: int) -> DataFrame:
    """Unpack each VID1 container and keep every k-th frame (decoded to get
    real dimensions) — one input row explodes to ceil(n_frames/k) rows
    inside the same partition.

    Per-row failure seam: a corrupt container or frame yields a quarantine
    row (frame_idx=-1 resp. w=h=-1) instead of killing the task."""
    snap = codec.registry_snapshot()

    def gen(batches):
        codec.install_registry(snap)
        for pdf in batches:
            rows = []
            for vid, buf in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    frames = codec.unpack_video(bytes(buf))
                except Exception:
                    rows.append((vid, -1, None, -1, -1))
                    continue
                for idx in range(0, len(frames), every_k):
                    try:
                        px = codec.decode_image(frames[idx])
                        rows.append(
                            (vid, idx, frames[idx], px.shape[1], px.shape[0])
                        )
                    except Exception:
                        rows.append((vid, idx, frames[idx], -1, -1))
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return df.select("video_id", "bytes").mapInPandas(gen, _FRAME_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_cross_rate", T.DoubleType(), False),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """PCM feature extraction: duration, RMS level, zero-crossing rate.
    Real-world compressed formats route through codec.decode_audio_external
    (register one with codec.register_audio_decoder — the registration
    travels to workers via the same registry snapshot as the image codecs).

    Per-row failure seam: a corrupt payload yields a quarantine row
    (n_samples=-1); an UNSUPPORTED format still raises loudly
    (NotImplementedError is a configuration error, not dirty data)."""
    snap = codec.registry_snapshot()

    def gen(batches):
        codec.install_registry(snap)
        for pdf in batches:
            rows = []
            for aid, buf, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    if fmt == "pcm":
                        samples, rate = codec.decode_pcm(bytes(buf))
                    else:
                        samples, rate = codec.decode_audio_external(bytes(buf), fmt)
                except NotImplementedError:
                    raise
                except Exception:
                    rows.append((aid, -1, -1, 0.0, 0.0, 0.0))
                    continue
                # the feature math is inside the quarantine seam too: a
                # decodable header with rate=0 (ZeroDivisionError) or a
                # rate past int32 (Arrow overflow) is dirty data, not a
                # task-killing condition
                try:
                    if not 0 < rate <= 0x7FFFFFFF:
                        raise ValueError(f"bad sample rate {rate}")
                    x = samples.astype(np.float64) / 32768.0
                    zc = (
                        float(np.mean(np.abs(np.diff(np.signbit(x)))))
                        if len(x) > 1 else 0.0
                    )
                    rows.append(
                        (
                            aid,
                            rate,
                            len(samples),
                            len(samples) / rate,
                            float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                            zc,
                        )
                    )
                except Exception:
                    rows.append((aid, -1, -1, 0.0, 0.0, 0.0))
            yield pd.DataFrame(rows, columns=[f.name for f in _AUDIO_SCHEMA.fields])

    return df.select("audio_id", "bytes", "fmt").mapInPandas(gen, _AUDIO_SCHEMA)
