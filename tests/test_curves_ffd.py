"""Pure-numpy unit tests: space-filling curves + FFD planner."""

import numpy as np

from airbyte_spark.functions.curves import (
    hilbert_key,
    phash_to_unsigned,
    zorder_key,
)
from airbyte_spark.plans.ffd import plan_ffd


def _grid2d(bits):
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return xs.ravel().astype(np.float64), ys.ravel().astype(np.float64), n


def test_zorder_known_values():
    # 2D, 2 bits: morton(x=1,y=0) with x at dim 0 -> bit interleave
    x = np.array([0, 1, 0, 1, 3], dtype=np.float64)
    y = np.array([0, 0, 1, 1, 3], dtype=np.float64)
    k = zorder_key([x, y], [(0, 3), (0, 3)], bits=2)
    # interleave: key = sum_b (x_b << (2b)) | (y_b << (2b+1))
    assert list(k) == [0, 1, 2, 3, 15]


def test_zorder_is_bijective_on_grid():
    x, y, n = _grid2d(4)
    k = zorder_key([x, y], [(0, n - 1), (0, n - 1)], bits=4)
    assert len(set(k.tolist())) == n * n


def test_hilbert_is_bijective_and_local():
    """Defining property: the key is a permutation of 0..4^bits-1 and
    consecutive keys are grid neighbors (Manhattan distance exactly 1)."""
    x, y, n = _grid2d(4)
    k = hilbert_key([x, y], [(0, n - 1), (0, n - 1)], bits=4)
    order = np.argsort(k)
    assert sorted(k.tolist()) == list(range(n * n))
    dx = np.abs(np.diff(x[order]))
    dy = np.abs(np.diff(y[order]))
    assert np.all(dx + dy == 1), "hilbert walk must move one step at a time"


def test_hilbert_3d_bijective():
    n = 1 << 3
    g = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    cols = [a.ravel().astype(np.float64) for a in g]
    k = hilbert_key(cols, [(0, n - 1)] * 3, bits=3)
    assert sorted(k.tolist()) == list(range(n**3))


def test_hilbert_locality_beats_zorder():
    """Standard locality measure (Moon et al., "Clustering properties of
    the Hilbert space-filling curve"): a box query touches fewer contiguous
    key runs ("clusters") under Hilbert than under Z-order, on average."""
    x, y, n = _grid2d(5)
    b = [(0, n - 1), (0, n - 1)]
    kz = zorder_key([x, y], b, bits=5).reshape(n, n)
    kh = hilbert_key([x, y], b, bits=5).reshape(n, n)

    def avg_clusters(km):
        total = 0
        count = 0
        for x0 in range(0, n - 4, 3):
            for y0 in range(0, n - 4, 3):
                keys = np.sort(km[x0 : x0 + 4, y0 : y0 + 4].ravel())
                total += 1 + int(np.sum(np.diff(keys) > 1))
                count += 1
        return total / count

    assert avg_clusters(kh) < avg_clusters(kz)


def test_phash_to_unsigned_order_preserving():
    v = np.array([-(2**63), -5, -1, 0, 1, 2**63 - 1], dtype=np.int64)
    u = phash_to_unsigned(v)
    assert list(u) == sorted(u.tolist())


def test_ffd_packs_to_target():
    files = [(f"f{i}", 10, 100) for i in range(10)]  # 10 x 10B, target 35
    plan = plan_ffd(files, target_bytes=35, small_file_threshold=1.0)
    # FFD packs 3+3+3 files of 10B into 30B bins; the trailing single-file
    # bin is dropped as a no-op rewrite
    assert len(plan.bins) == 3
    assert plan.input_files == 9
    assert plan.skipped_files == 1
    for b in plan.bins:
        assert b.bytes <= 35
        assert len(b.paths) >= 2


def test_ffd_skips_right_sized_and_singletons():
    files = [("big", 100, 1), ("s1", 10, 1), ("s2", 12, 1), ("lonely", 60, 1)]
    plan = plan_ffd(files, target_bytes=100, small_file_threshold=0.5)
    # big (>=50) skipped; s1+s2 packed; lonely(60) >= 50 so skipped too
    packed = {p for b in plan.bins for p in b.paths}
    assert packed == {"s1", "s2"}
    assert plan.skipped_files == 2


def test_ffd_decreasing_order_fills_tightly():
    files = [("a", 70, 1), ("b", 50, 1), ("c", 30, 1), ("d", 20, 1), ("e", 10, 1)]
    plan = plan_ffd(files, target_bytes=100, small_file_threshold=2.0)
    sizes = sorted(b.bytes for b in plan.bins)
    assert sum(sizes) == 180
    assert all(s <= 100 for s in sizes)
    assert len(plan.bins) == 2  # 70+30 / 50+20+10 (FFD optimal here)
