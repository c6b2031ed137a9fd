"""Audio/video as opaque binary columns with typed metadata.

Extends the image plumbing (functions/images.py) to the other two
modalities a training-data pipeline carries. The SPARK side — schemas,
Arrow batch shapes, mapInPandas signatures, per-row metadata — is real
and tested; the CODEC side follows the repo's deterministic-fake pattern
(codecs.py): real audio/video libraries are absent from this container,
so SAUD (int16 PCM with a magic header) and SVID (a header plus
concatenated SPNG frames — each frame decodable by codecs.decode_image)
stand in, and any OTHER format is gated behind NotImplementedError
exactly where a real decoder would plug in.

Column model (matching the images table's shape):

    audio:  clip_id string, bytes binary, sample_rate int, n_samples int,
            fmt string, caption string
    video:  video_id string, bytes binary, w int, h int, n_frames int,
            fps double, fmt string, caption string

Operators:
- `audio_features`        — pandas UDF: rms / peak / zero-crossing rate
                            per clip (one Arrow batch pass, no per-row
                            Python at the Spark level)
- `sample_frames`         — mapInPandas: explode every k-th frame as its
                            own SPNG row -> feeds the EXISTING image ops
                            (decode, phash, PSNR) unchanged
- `video_frame_features`  — sample_frames piped into the image phash UDF
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.codecs import encode_image

MAGIC_AUD = b"SAUD"
MAGIC_VID = b"SVID"

AUDIO_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
    ]
)

VIDEO_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
    ]
)


# ---------------------------------------------------------------------------
# deterministic fake codecs (the container has no audio/video libs)
# ---------------------------------------------------------------------------


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """SAUD: magic + rate + int16 little-endian PCM."""
    pcm = np.asarray(samples, dtype="<i2")
    return MAGIC_AUD + struct.pack("<II", int(sample_rate), len(pcm)) + pcm.tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if bytes(data[:4]) != MAGIC_AUD:
        raise NotImplementedError(
            "real audio codecs (mp3/flac/wav) are not available in this "
            "container — plug a decoder in here; SAUD is the deterministic "
            "test codec"
        )
    rate, n = struct.unpack("<II", bytes(data[4:12]))
    return np.frombuffer(data, dtype="<i2", offset=12, count=n), rate


def encode_video(frames: list[np.ndarray], fps: float, fmt: str = "png") -> bytes:
    """SVID: magic + fps + frame count, then length-prefixed SPNG frames
    (each one independently decodable by codecs.decode_image)."""
    parts = [MAGIC_VID, struct.pack("<dI", float(fps), len(frames))]
    for fr in frames:
        enc = encode_image(fr, fmt)
        parts.append(struct.pack("<I", len(enc)))
        parts.append(enc)
    return b"".join(parts)


def iter_video_frames(data: bytes) -> Iterator[bytes]:
    """Yield the ENCODED frame payloads without decoding pixels."""
    if bytes(data[:4]) != MAGIC_VID:
        raise NotImplementedError(
            "real video containers (mp4/webm) are not available in this "
            "container — plug a demuxer in here; SVID is the deterministic "
            "test codec"
        )
    (_fps, n) = struct.unpack("<dI", bytes(data[4:16]))
    pos = 16
    for _ in range(n):
        (ln,) = struct.unpack("<I", bytes(data[pos : pos + 4]))
        pos += 4
        yield bytes(data[pos : pos + ln])
        pos += ln


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


_AUDIO_FEATURES_TYPE = StructType(
    [
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_cross_rate", DoubleType()),
    ]
)


@pandas_udf(_AUDIO_FEATURES_TYPE)
def audio_features_udf(data: pd.Series) -> pd.DataFrame:
    """Waveform features per clip, one Arrow batch at a time."""
    rms, peak, zcr = [], [], []
    for b in data:
        if b is None:
            rms.append(None), peak.append(None), zcr.append(None)
            continue
        samples, _rate = decode_audio(b)
        x = samples.astype(np.float64) / 32768.0
        rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
        peak.append(float(np.max(np.abs(x))) if len(x) else 0.0)
        zcr.append(
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if len(x) > 1
            else 0.0
        )
    return pd.DataFrame({"rms": rms, "peak": peak, "zero_cross_rate": zcr})


def audio_features(clips: DataFrame) -> DataFrame:
    f = audio_features_udf(F.col("bytes")).alias("_f")
    return clips.select(
        "clip_id", "sample_rate", "n_samples", f
    ).select("clip_id", "sample_rate", "n_samples", "_f.*")


def sample_frames(videos: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode every k-th frame of each video as its own row — the frame
    bytes are SPNG, so the existing image decode/phash/PSNR operators apply
    unchanged downstream. mapInPandas: one Arrow batch in, a frame batch
    out; frame payloads never touch the driver."""

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in ("video_id", "frame_idx", "frame_bytes", "w", "h")}
            for vid, data, w, h in zip(b["video_id"], b["bytes"], b["w"], b["h"]):
                if data is None:
                    continue
                for i, frame in enumerate(iter_video_frames(data)):
                    if i % every_k:
                        continue
                    out["video_id"].append(vid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(frame)
                    out["w"].append(w)
                    out["h"].append(h)
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes", "w", "h").mapInPandas(
        explode, schema=FRAME_SCHEMA
    )


def video_frame_features(videos: DataFrame, every_k: int = 2) -> DataFrame:
    """(video_id, frame_idx, phash) for every sampled frame — the frames
    are SPNG, so the image module's existing phash UDF applies as-is."""
    from airbyte_spark.functions.images import phash_udf

    return sample_frames(videos, every_k).select(
        "video_id", "frame_idx", phash_udf(F.col("frame_bytes")).alias("phash")
    )
