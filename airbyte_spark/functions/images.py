"""Image-payload functions over binary columns — Arrow-batched UDFs only.
Includes perceptual-hash near-duplicate detection (phash_near_dup_pairs).

The multimodal contract (BASELINE.json input_hint): images travel as an
opaque `bytes: binary` column with typed metadata (w, h, fmt); all decode /
verify / feature-extraction happens inside pandas UDFs (batch of rows per
Python call, Arrow transfer), never per-row Spark Python.

The container has no PIL/libjpeg, so decode supports the deterministic
SPNG/SJPG stub codec (airbyte_spark/codecs.py) and raises
NotImplementedError on real PNG/JPEG magic — the Spark-side plumbing
(schema, batching, UDF signatures) is identical either way.

Fidelity invariant (RecordDiffer.diffRecords analog, RecordDiffer.kt:105):
per image_id, decoded pixels allclose — PSNR >= 40 dB for lossy fmt,
bit-exact for png — plus exact caption equality (SURVEY.md §1.4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from airbyte_spark.codecs import decode_image, phash64, psnr

PSNR_LOSSY_THRESHOLD = 40.0


@pandas_udf(LongType())
def phash_udf(data: pd.Series) -> pd.Series:
    """Recompute the 64-bit DCT perceptual hash from encoded bytes."""
    return data.map(lambda b: phash64(decode_image(bytes(b))))


@pandas_udf(DoubleType())
def psnr_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """PSNR between two encoded payloads (inf -> large sentinel)."""
    out = np.empty(len(a), dtype=np.float64)
    for i, (x, y) in enumerate(zip(a, b)):
        if x is None or y is None:
            out[i] = 0.0
            continue
        v = psnr(decode_image(bytes(x)), decode_image(bytes(y)))
        out[i] = 1e9 if v == float("inf") else v
    return pd.Series(out)


@pandas_udf(BooleanType())
def decodable_udf(data: pd.Series) -> pd.Series:
    def ok(b):
        try:
            decode_image(bytes(b))
            return True
        except Exception:
            return False
    return data.map(ok)


def image_feature_df(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Decode-side feature extraction over mapInPandas: per-image mean/std
    luminance + recomputed dimensions. Demonstrates the batch shape for
    real feature extractors (embedding models etc.)."""
    schema = StructType(
        [
            df.schema[id_col],
            StructField("dec_w", IntegerType()),
            StructField("dec_h", IntegerType()),
            StructField("luma_mean", DoubleType()),
            StructField("luma_std", DoubleType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid, data in zip(b[id_col], b["bytes"]):
                px = decode_image(bytes(data))
                luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                rows.append(
                    {
                        id_col: rid,
                        "dec_w": px.shape[1],
                        "dec_h": px.shape[0],
                        "luma_mean": float(luma.mean()),
                        "luma_std": float(luma.std()),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, "bytes").mapInPandas(extract, schema=schema)


def resize_images(
    df: DataFrame,
    factor: int = 2,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt: str = "png",
) -> DataFrame:
    """Downscale every payload by an integer `factor` using exact AREA
    averaging (each output pixel is the mean of a factor×factor input
    block; trailing rows/cols that do not fill a block are dropped) and
    re-encode — the thumbnail/preprocess stage of a training-data
    pipeline, pure numpy inside one mapInPandas pass (no PIL needed, so
    the op is REAL in this container, not a stubbed codec). Output
    schema matches the input contract: (id, bytes, w, h)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    from airbyte_spark.codecs import encode_image

    schema = StructType(
        [
            df.schema[id_col],
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
        ]
    )

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid, data in zip(b[id_col], b[bytes_col]):
                px = decode_image(bytes(data))
                h, w = px.shape[0], px.shape[1]
                oh, ow = h // factor, w // factor
                if oh == 0 or ow == 0:
                    continue  # smaller than one block: drop (logged sizes
                    # belong upstream; a 0-dim image is not encodable)
                clipped = px[: oh * factor, : ow * factor].astype(np.float64)
                small = clipped.reshape(oh, factor, ow, factor, 3).mean(
                    axis=(1, 3)
                )
                out = np.round(small).astype(np.uint8)
                rows.append(
                    {
                        id_col: rid,
                        "bytes": encode_image(out, fmt),
                        "w": ow,
                        "h": oh,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, bytes_col).mapInPandas(shrink, schema=schema)


def phash_near_dup_pairs(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    max_hamming: int = 4,
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance —
    the image-payload analog of the text SimHash dedup (the incremental-
    dedup sync mode of SURVEY §2.2 applied to re-encoded/contrast-scaled
    image variants, e.g. the same picture re-exported at a different
    contrast or quality setting).

    One Arrow pass decodes each payload and computes the 64-bit DCT
    perceptual hash (`phash_udf` — low-frequency 8x8 DCT block, bits =
    AC coefficients vs their median); candidate generation and the exact
    popcount verify reuse the radius-complete banded self-join
    (`simhash_pairs_from_hashes`): a pair within `max_hamming` must agree
    exactly on one of `max_hamming + 1` disjoint sub-bands, so nothing is
    all-pairs — the shuffle carries only (id, 64-bit hash) rows, never
    pixels. `max_bucket_size` star-expands degenerate buckets (identical
    popular images) exactly like the text paths; pass None for the
    exhaustive oracle-checked variant. Returns (id_a, id_b, hamming)."""
    from airbyte_spark.functions.dedup import simhash_pairs_from_hashes

    hashed = images.select(
        F.col(id_col), phash_udf(F.col(bytes_col)).alias("_ph")
    )
    return simhash_pairs_from_hashes(
        hashed,
        id_col=id_col,
        hash_col="_ph",
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )


def verify_fidelity(
    expected: DataFrame,
    actual: DataFrame,
    id_col: str = "image_id",
) -> DataFrame:
    """Row-level fidelity check between two image tables: join on id and
    compute (caption_equal, psnr, passes). `passes` applies the fmt-aware
    rule: png requires byte-identical payloads; jpeg requires
    PSNR >= 40 dB. Returns the per-row verdict DataFrame (callers assert
    `filter(~passes).isEmpty()`)."""
    e = expected.select(
        F.col(id_col),
        F.col("bytes").alias("e_bytes"),
        F.col("caption").alias("e_caption"),
        F.col("fmt").alias("fmt"),
    )
    a = actual.select(
        F.col(id_col),
        F.col("bytes").alias("a_bytes"),
        F.col("caption").alias("a_caption"),
    )
    j = e.join(a, on=id_col, how="full_outer")
    j = j.withColumn("caption_equal", F.col("e_caption").eqNullSafe(F.col("a_caption")))
    j = j.withColumn(
        "bytes_equal", F.col("e_bytes").isNotNull() & (F.col("e_bytes") == F.col("a_bytes"))
    )
    j = j.withColumn(
        "psnr",
        F.when(F.col("bytes_equal"), F.lit(1e9)).otherwise(
            psnr_udf(F.col("e_bytes"), F.col("a_bytes"))
        ),
    )
    j = j.withColumn(
        "passes",
        F.col("caption_equal")
        & F.when(F.col("fmt") == "png", F.col("bytes_equal")).otherwise(
            F.col("psnr") >= F.lit(PSNR_LOSSY_THRESHOLD)
        ),
    )
    return j.select(id_col, "caption_equal", "bytes_equal", "psnr", "passes")
