"""Per-file primary-key bloom filters (sidecar files) for tight file
pruning.

Why: manifest min/max PK ranges are the only pruning the merge and the
dirty-scope delete-hit victim test have, and on a Hilbert/Z-order
clustered table the sort key is NOT the PK — every data file spans
nearly the full PK range, so range pruning degenerates to "all files"
(the reason `cluster.max-delete-eras` exists as a debt policy instead of
eager folding). A per-file bloom over the leading PK column restores
tight pruning regardless of the physical sort order: a micro-batch merge
touches only files that (probably) contain one of its keys, and a
delete-hit test only flags files that (probably) contain a deleted key.
False positives cost one extra file read/rewrite (safe); false negatives
are impossible.

This is the role parquet's optional column bloom filters play in Iceberg
(`write.parquet.bloom-filter-enabled.column.*`); here the filter lives in
a SIDECAR next to the data file (`<file>.bloom`) because pyarrow in this
environment can't read parquet bloom pages, and the manifest stays slim —
it carries only `{m,k,col}` metadata + the sidecar's existence, never the
bitmap (a 1M-row file's bitmap is ~1.25 MB; JSON manifests must not grow
with row count).

Hash-consistency contract: every probe and every build uses SPARK's
`xxhash64` (seed 42) over the column cast to the TABLE's PK type, so
bitmaps built at write time, merge-batch probes, and delete-key hash
sidecars all agree bit-for-bit. Python never re-implements the hash —
the only Python-side math is deriving the k bit positions from the
64-bit value (splitmix-style double hashing below).
"""

from __future__ import annotations

import os

import numpy as np

#: Per-KEY false-positive rate compounds across the probe batch: a file
#: is falsely kept with prob 1-(1-p)^K for a K-key batch, so pruning a
#: micro-batch merge needs p·K << 1, not just p << 1. 18 bits/key with
#: the derived k=12 gives p ~ 5e-4: a 64-key batch falsely flags ~3% of
#: innocent files (vs ~54% at the classic 10-bit/4-probe point). Sidecar
#: cost: 2.25 B/row — noise next to multi-KB payload rows.
DEFAULT_BITS_PER_KEY = 18
DEFAULT_K = 4  # fallback for sidecars whose metadata predates optimal_k


def optimal_k(bits_per_key: int) -> int:
    """Probe count minimizing FPR for the bit budget: k = ln2 · m/n."""
    return max(1, int(round(0.6931 * bits_per_key)))
BLOOM_SUFFIX = ".bloom"
HASHES_SUFFIX = ".keyhashes"

_FMIX = np.uint64(0xFF51AFD7ED558CCD)
_SHIFT = np.uint64(33)
_ONE = np.uint64(1)


def bloom_bits(rows: int, bits_per_key: int = DEFAULT_BITS_PER_KEY) -> int:
    """Bitmap size in bits: rows*bits_per_key rounded up to a byte, floor
    1024 bits (tiny files still get a real filter)."""
    return max(1024, ((rows * bits_per_key + 7) // 8) * 8)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k*N,) bit positions via double hashing: pos_i = h1 + i*h2 (mod m).
    h2 is a murmur fmix step of h1 so the k probes decorrelate. All
    arithmetic wraps in uint64 (numpy's native behavior)."""
    h1 = hashes.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        h2 = (h1 ^ (h1 >> _SHIFT)) * _FMIX
        h2 |= _ONE  # odd step -> full-period probing even when h2 == 0
        out = np.empty((k, h1.shape[0]), dtype=np.uint64)
        for i in range(k):
            out[i] = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
    return out.reshape(-1)


def build_bitmap(
    hashes: np.ndarray, m_bits: int, k: int = DEFAULT_K
) -> np.ndarray:
    """uint8 bitmap (little-endian bit order within each byte)."""
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    pos = _positions(hashes, m_bits, k)
    np.bitwise_or.at(
        bitmap, (pos >> np.uint64(3)).astype(np.int64),
        (_ONE << (pos & np.uint64(7))).astype(np.uint8),
    )
    return bitmap


def hits_mask(bitmap: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    """Per-key membership: True where ALL k probe bits are set."""
    m_bits = bitmap.shape[0] * 8
    pos = _positions(hashes, m_bits, k).reshape(k, -1)
    ok = np.ones(hashes.shape[0], dtype=bool)
    for i in range(k):
        p = pos[i]
        bits = bitmap[(p >> np.uint64(3)).astype(np.int64)]
        ok &= (bits >> (p & np.uint64(7)).astype(np.uint8)) & 1 == 1
        if not ok.any():
            break
    return ok


def might_contain_any(
    bitmap: np.ndarray, hashes: np.ndarray, k: int, chunk: int = 4096
) -> bool:
    """ANY-membership with chunked early exit: a saturated probe (big
    batch vs. a file that IS hit — the common merge shape) finds a hit in
    the first chunk and skips the other 99% of the position math; a probe
    that misses everything does the same total work as one full pass."""
    n = hashes.shape[0]
    for i in range(0, n, chunk):
        if hits_mask(bitmap, hashes[i : i + chunk], k).any():
            return True
    return False


def write_bitmap_sidecar(data_path: str, bitmap: np.ndarray) -> str:
    side = data_path + BLOOM_SUFFIX
    tmp = side + ".tmp"
    bitmap.tofile(tmp)
    os.replace(tmp, side)
    return side


def read_bitmap_sidecar(side_path: str) -> np.ndarray:
    return np.fromfile(side_path, dtype=np.uint8)


def write_hashes_sidecar(data_path: str, hashes: np.ndarray) -> str:
    """Raw int64 key hashes for an equality-delete file — lets the cluster
    victim test probe data-file blooms driver-side without re-hashing (no
    Spark job, no Python xxhash reimplementation)."""
    side = data_path + HASHES_SUFFIX
    tmp = side + ".tmp"
    hashes.astype(np.int64, copy=False).tofile(tmp)
    os.replace(tmp, side)
    return side


def read_hashes_sidecar(side_path: str) -> np.ndarray:
    return np.fromfile(side_path, dtype=np.int64).view(np.uint64)
