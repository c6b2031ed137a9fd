"""Space-filling curve keys — vectorized numpy, exposed as pandas UDFs.

Z-order: bit-interleave of D dimensions, each quantized to `bits` bits.
Hilbert: Skilling's transpose algorithm (public domain, "Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004) — Gray-code based, fully
vectorized over numpy arrays.

The reference's only ordering is the PK sort order on the Iceberg table
(IcebergUtil.kt:130,185-189); multi-dimensional clustering over
(phash, w, h) is our extension (SURVEY.md §2.6). Keys are computed
JVM→Arrow→numpy in batches; zero per-row Python.
"""

from __future__ import annotations

import numpy as np


def _quantize(col: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    """Min-max scale a column into [0, 2^bits)."""
    col = col.astype(np.float64)
    if hi <= lo:
        return np.zeros(len(col), dtype=np.uint64)
    scaled = (col - lo) / (hi - lo)
    q = np.clip(np.rint(scaled * ((1 << bits) - 1)).astype(np.int64), 0, (1 << bits) - 1)
    return q.astype(np.uint64)


def _spread_bits(x: np.ndarray, ndims: int, bits: int) -> np.ndarray:
    """Insert (ndims-1) zero bits between each bit of x (vectorized)."""
    out = np.zeros(len(x), dtype=np.uint64)
    for b in range(bits):
        out |= ((x >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * ndims)
    return out


def zorder_key(cols: list[np.ndarray], bounds: list[tuple[float, float]], bits: int = 16) -> np.ndarray:
    """Morton/Z-order key: interleave the quantized bits of each dim.
    Returns int64 (top bit unused so the key sorts correctly as signed)."""
    ndims = len(cols)
    assert ndims * bits <= 63, "key must fit signed int64"
    key = np.zeros(len(cols[0]), dtype=np.uint64)
    for d, (col, (lo, hi)) in enumerate(zip(cols, bounds)):
        q = _quantize(np.asarray(col), lo, hi, bits)
        key |= _spread_bits(q, ndims, bits) << np.uint64(d)
    return key.astype(np.int64)


def hilbert_key(cols: list[np.ndarray], bounds: list[tuple[float, float]], bits: int = 16) -> np.ndarray:
    """Hilbert index via Skilling's transpose→index transform, vectorized.

    Converts the quantized coordinates in-place to the "transpose" form of
    the Hilbert index, then gathers bits into a single integer key.
    """
    ndims = len(cols)
    assert ndims * bits <= 63
    X = np.stack(
        [_quantize(np.asarray(c), lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    )  # shape (ndims, n)

    # Skilling: AxestoTranspose (inverse undo + Gray encode), vectorized
    M = np.uint64(1) << np.uint64(bits - 1)
    q = M
    while q > np.uint64(1):
        p = q - np.uint64(1)
        for i in range(ndims):
            mask = (X[i] & q) != 0
            # invert low bits of X[0] where bit set; else exchange with X[0]
            X[0] = np.where(mask, X[0] ^ p, X[0])
            t = (X[0] ^ X[i]) & p
            t = np.where(mask, np.uint64(0), t)
            X[0] ^= t
            X[i] ^= t
        q >>= np.uint64(1)
    # Gray encode
    for i in range(1, ndims):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    q = M
    while q > np.uint64(1):
        t = np.where((X[ndims - 1] & q) != 0, t ^ (q - np.uint64(1)), t)
        q >>= np.uint64(1)
    for i in range(ndims):
        X[i] ^= t

    # transpose-form → single integer: bit b of dim d becomes output bit
    # (b * ndims + (ndims-1-d))
    key = np.zeros(X.shape[1], dtype=np.uint64)
    for b in range(bits):
        for d in range(ndims):
            bit = (X[d] >> np.uint64(b)) & np.uint64(1)
            key |= bit << np.uint64(b * ndims + (ndims - 1 - d))
    return key.astype(np.int64)


def phash_to_unsigned(phash: np.ndarray) -> np.ndarray:
    """Map signed-int64 phash to an order-preserving uint64 domain
    (flip the sign bit) so it quantizes like an unsigned value."""
    return (phash.astype(np.int64).view(np.uint64)) ^ np.uint64(1 << 63)
