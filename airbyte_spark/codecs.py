"""Deterministic image codec, PSNR, and perceptual hash — pure numpy.

The container has no PIL/libjpeg, so the codec is a deterministic stand-in
with the same *semantics* the fixtures need (FIXTURES.md F1):

- ``png``  : lossless — zlib-compressed raw RGB with a tiny header.
- ``jpeg`` : lossy & deterministic — uniform quantization (step Q=4) of RGB
  then zlib. Max per-channel error Q/2 → PSNR ≈ 10*log10(255^2/(Q^2/12))
  ≈ 46.9 dB, comfortably above the 40 dB invariant, and *deterministically*
  reproducible, which a real libjpeg build would not guarantee across
  versions.

The per-row fidelity invariant mirrors Airbyte CAT's exact record equality
(RecordDiffer.diffRecords, airbyte-cdk/bulk/core/load/src/testFixtures/
kotlin/io/airbyte/cdk/load/test/util/RecordDiffer.kt:105): for us it is
decoded-pixel allclose (PSNR >= 40 dB for lossy fmt) + exact caption
equality per image_id (SURVEY.md §1.4).

phash is the classic DCT-based 64-bit perceptual hash: grayscale → mean-pool
to 32x32 → 2D DCT-II (matrix form, numpy) → top-left 8x8 sans DC → sign vs
median. Used both by datagen and by the Z-order clustering key
(SURVEY.md §2.6 O1-extension).

All functions take/return numpy batches; they are called from pandas/Arrow
UDFs only (no Spark-level per-row Python).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_PNG = b"SPNG"
MAGIC_JPG = b"SJPG"
_JPEG_Q = 4  # quantization step for the deterministic lossy codec

# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt in {'png','jpeg'}."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    if fmt == "png":
        payload = zlib.compress(pixels.tobytes(), 6)
        return MAGIC_PNG + struct.pack("<HH", h, w) + payload
    elif fmt == "jpeg":
        q = (pixels.astype(np.int32) // _JPEG_Q * _JPEG_Q + _JPEG_Q // 2).clip(
            0, 255
        ).astype(np.uint8)
        payload = zlib.compress(q.tobytes(), 6)
        return MAGIC_JPG + struct.pack("<HH", h, w) + payload
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Decode back to (h, w, 3) uint8. Raises on unknown magic."""
    magic, (h, w) = data[:4], struct.unpack("<HH", data[4:8])
    if magic not in (MAGIC_PNG, MAGIC_JPG):
        raise NotImplementedError(
            "real PNG/JPEG decode requires PIL/libjpeg (absent in this "
            "container); only the deterministic SPNG/SJPG stub codec is "
            "supported"
        )
    raw = zlib.decompress(data[8:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# fidelity
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ---------------------------------------------------------------------------
# perceptual hash (DCT)
# ---------------------------------------------------------------------------

_DCT_N = 32
_DCT_K = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT_M = _dct_matrix(_DCT_N)


def _mean_pool_to(gray: np.ndarray, n: int) -> np.ndarray:
    """Area-average an (h, w) array down to (n, n); upsamples first if small."""
    h, w = gray.shape
    if h < n:
        gray = np.repeat(gray, -(-n // h), axis=0)
        h = gray.shape[0]
    if w < n:
        gray = np.repeat(gray, -(-n // w), axis=1)
        w = gray.shape[1]
    ys = np.arange(n + 1) * h // n
    xs = np.arange(n + 1) * w // n
    integ = np.zeros((h + 1, w + 1), dtype=np.float64)
    integ[1:, 1:] = np.cumsum(np.cumsum(gray.astype(np.float64), 0), 1)
    out = (
        integ[np.ix_(ys[1:], xs[1:])]
        - integ[np.ix_(ys[:-1], xs[1:])]
        - integ[np.ix_(ys[1:], xs[:-1])]
        + integ[np.ix_(ys[:-1], xs[:-1])]
    )
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return out / area


def phash64(pixels: np.ndarray) -> int:
    """DCT perceptual hash of an (h, w, 3) uint8 image → signed int64."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _mean_pool_to(gray, _DCT_N)
    dct = _DCT_M @ small @ _DCT_M.T
    block = dct[:_DCT_K, :_DCT_K].flatten()
    vals = block[1:]  # drop DC
    med = np.median(vals)
    bits = np.concatenate([[block[0] > 0], vals > med]).astype(np.uint64)
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    return int(h.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
