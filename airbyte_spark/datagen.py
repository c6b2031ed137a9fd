"""Deterministic synthetic image+caption table generator (FIXTURES.md F1/F2).

Fully distributed: `spark.range(n)` -> `mapInPandas` so generation scales
with executors (never materialized on the driver). Every value is a pure
function of (seed, row index), mirroring how the driver generates CAT
"expected_records" golden files (SURVEY.md §5).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.codecs import decode_image, encode_image, phash64

_NS = uuid.UUID("00000000-0000-0000-0000-00000000a1b2")

META_CHANGE = StructType(
    [
        StructField("field", StringType()),
        StructField("change", StringType()),
        StructField("reason", StringType()),
    ]
)
META_STRUCT = StructType(
    [
        StructField("sync_id", LongType()),
        StructField("changes", ArrayType(META_CHANGE)),
    ]
)

# the input_hint shape + Airbyte meta columns (Meta.kt:84-101)
IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
        StructField("_airbyte_raw_id", StringType()),
        StructField("_airbyte_extracted_at", TimestampType()),
        StructField("_airbyte_generation_id", LongType()),
    ]
)

_SIZES = np.array([32, 64, 128])
_WORDS = (
    "aurora basalt cedar dune ember fjord glacier harbor iris juniper kelp "
    "lagoon mesa nebula orchid prairie quartz reef sierra tundra umber vale "
    "willow xenon yarrow zephyr café naïve 東京 москва 🌊 ñandú"
).split()


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 9))
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


def _make_row(i: int, seed: int, sync_id: int, generation_id: int) -> dict:
    rng = np.random.default_rng([seed, i])
    w = int(_SIZES[rng.integers(0, 3)])
    h = int(_SIZES[rng.integers(0, 3)])
    fmt = "png" if rng.random() < 0.5 else "jpeg"
    # low-frequency pattern + noise: compressible and phash-meaningful
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        127
        + 90 * np.sin(xx / (4 + i % 13) + i)
        + 60 * np.cos(yy / (3 + i % 7))
    )
    img = np.stack(
        [
            (base + rng.integers(-20, 20, (h, w))).clip(0, 255),
            (base * 0.8 + rng.integers(-20, 20, (h, w))).clip(0, 255),
            (base * 0.6 + rng.integers(-20, 20, (h, w))).clip(0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    enc = encode_image(img, fmt)
    # phash describes the STORED payload: hash the decoded bytes so the
    # column stays consistent with `bytes` even for the lossy codec
    img = decode_image(enc)
    image_id = f"img-{i:012d}"
    extracted_at = pd.Timestamp("2026-01-01", tz="UTC") + pd.Timedelta(seconds=int(i))
    return {
        "image_id": image_id,
        "bytes": enc,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": _caption(rng),
        "phash": phash64(img),
        "_airbyte_raw_id": str(uuid.uuid5(_NS, f"{image_id}|{extracted_at.isoformat()}|{sync_id}")),
        "_airbyte_extracted_at": extracted_at,
        "_airbyte_generation_id": generation_id,
    }


def generate_images(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    sync_id: int = 1,
    generation_id: int = 0,
    num_partitions: int | None = None,
    id_offset: int = 0,
) -> DataFrame:
    """Distributed deterministic images table of n rows."""
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                _make_row(int(i) + id_offset, seed, sync_id, generation_id)
                for i in b["id"]
            ]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, 1, num_partitions)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


def generate_update_batch(
    spark: SparkSession,
    base_n: int,
    n_updates: int,
    seed: int = 43,
    sync_id: int = 2,
    generation_id: int = 0,
    hot_key_fraction: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """MERGE source batch (FIXTURES.md F2): updates to existing ids, fresh
    inserts, intra-batch duplicates, CDC deletes, and optional hot-key skew.

    Adds `updated_at` (cursor) and nullable `_ab_cdc_deleted_at`.
    """
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)

    schema = StructType(
        IMAGES_SCHEMA.fields
        + [
            StructField("updated_at", TimestampType()),
            StructField("_ab_cdc_deleted_at", TimestampType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for j in b["id"]:
                j = int(j)
                rng = np.random.default_rng([seed, j])
                r = rng.random()
                if hot_key_fraction and rng.random() < hot_key_fraction:
                    target = 0  # every hot row hits image_id img-000000000000
                elif r < 0.55:
                    target = int(rng.integers(0, base_n))  # update existing
                else:
                    target = base_n + j  # fresh insert
                row = _make_row(target, seed + 1000, sync_id, generation_id)
                row["_airbyte_extracted_at"] = pd.Timestamp(
                    "2026-02-01", tz="UTC"
                ) + pd.Timedelta(seconds=j)
                # raw_id is unique PER RECORD (the protocol contract): two
                # updates hitting the same target image in one batch are
                # distinct records and must not share _make_row's
                # target-derived id (a shared id previously let the merge
                # payload fetch pick the wrong twin)
                row["_airbyte_raw_id"] = str(
                    uuid.uuid5(_NS, f"upd|{seed}|{sync_id}|{j}")
                )
                row["updated_at"] = pd.Timestamp("2026-02-01", tz="UTC") + pd.Timedelta(
                    seconds=int(rng.integers(0, 86400))
                )
                row["_ab_cdc_deleted_at"] = (
                    pd.Timestamp("2026-02-02", tz="UTC") if rng.random() < 0.05 else None
                )
                rows.append(row)
            yield pd.DataFrame(rows)

    return spark.range(0, n_updates, 1, num_partitions).mapInPandas(gen, schema=schema)


def with_meta_struct(df: DataFrame, sync_id: int = 1) -> DataFrame:
    """Attach the `_airbyte_meta` struct column (Meta.kt:37 semantics)."""
    return df.withColumn(
        "_airbyte_meta",
        F.struct(
            F.lit(sync_id).cast(LongType()).alias("sync_id"),
            F.array().cast(ArrayType(META_CHANGE)).alias("changes"),
        ),
    )


def generate_audio(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic audio clips (SAUD PCM): sine + noise, value = f(seed, i)."""
    from airbyte_spark.functions.multimodal import AUDIO_SCHEMA, encode_audio

    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.default_rng([seed, 1_000_000 + i])
                rate = int((8000, 16000, 22050)[i % 3])
                n_samp = int(rng.integers(rate // 4, rate))  # 0.25-1 s
                t = np.arange(n_samp) / rate
                freq = 110.0 * (1 + i % 16)
                x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(
                    n_samp
                )
                pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
                rows.append(
                    {
                        "clip_id": f"aud-{i:012d}",
                        "bytes": encode_audio(pcm, rate),
                        "sample_rate": rate,
                        "n_samples": n_samp,
                        "fmt": "saud",
                        "caption": _caption(rng),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, schema=AUDIO_SCHEMA)


def generate_videos(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic short videos (SVID): 4-10 SPNG frames of a drifting
    pattern, so sampled frames feed the image decode/phash ops directly."""
    from airbyte_spark.functions.multimodal import VIDEO_SCHEMA, encode_video

    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.default_rng([seed, 2_000_000 + i])
                w = h = int(_SIZES[rng.integers(0, 2)])  # 32 or 64
                n_frames = int(rng.integers(4, 11))
                yy, xx = np.mgrid[0:h, 0:w]
                frames = []
                for fidx in range(n_frames):
                    base = 127 + 90 * np.sin(xx / 5 + i + fidx * 0.7)
                    frame = np.stack(
                        [base, base * 0.8, base * 0.6], axis=-1
                    ).clip(0, 255).astype(np.uint8)
                    frames.append(frame)
                fps = float((8, 12, 24)[i % 3])
                rows.append(
                    {
                        "video_id": f"vid-{i:012d}",
                        "bytes": encode_video(frames, fps),
                        "w": w,
                        "h": h,
                        "n_frames": n_frames,
                        "fps": fps,
                        "fmt": "svid",
                        "caption": _caption(rng),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, num_partitions).mapInPandas(gen, schema=VIDEO_SCHEMA)
