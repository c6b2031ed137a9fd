"""Greedy first-fit-decreasing bin-packing over file-size histograms.

The compaction planner (SURVEY.md §4 "Sampling-based partition sizing"
row): input is the live file-size histogram from table manifests (the
reference's analog is planFiles file sizes, IcebergTableCleaner.kt:50, and
the rolling writer's target-file-size cut, IcebergTableWriterFactory.kt:
77-82); output is a list of bins, each a set of small files whose combined
bytes approach the target file size.

This is pure driver-side metadata math: at 10^12 rows / ~10^6 files the
histogram is a few MB. Row data never touches the driver — each bin becomes
one rewrite task executed by Spark (operators/compact.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Bin:
    bin_id: int
    paths: list[str] = field(default_factory=list)
    bytes: int = 0
    rows: int = 0


@dataclass
class CompactionPlan:
    bins: list[Bin]
    skipped_files: int  # already-right-sized files left untouched

    @property
    def input_files(self) -> int:
        return sum(len(b.paths) for b in self.bins)


def plan_ffd(
    files: list[tuple[str, int, int]],  # (path, bytes, rows)
    target_bytes: int,
    small_file_threshold: float = 0.75,
    min_bin_inputs: int = 2,
) -> CompactionPlan:
    """First-fit-decreasing: sort small files by size descending, place each
    into the first bin with room (capacity = target_bytes). Files already
    >= small_file_threshold * target_bytes are not compaction candidates.
    Bins that would "compact" a single file into itself are dropped (no-op
    rewrites waste cluster time)."""
    threshold = int(target_bytes * small_file_threshold)
    small = [f for f in files if f[1] < threshold]
    skipped = len(files) - len(small)
    small.sort(key=lambda f: (-f[1], f[0]))  # size desc, path as stable tiebreak

    bins: list[Bin] = []
    for path, sz, rows in small:
        placed = False
        for b in bins:
            if b.bytes + sz <= target_bytes:
                b.paths.append(path)
                b.bytes += sz
                b.rows += rows
                placed = True
                break
        if not placed:
            bins.append(Bin(bin_id=len(bins), paths=[path], bytes=sz, rows=rows))

    useful = [b for b in bins if len(b.paths) >= min_bin_inputs]
    skipped += sum(len(b.paths) for b in bins if len(b.paths) < min_bin_inputs)
    for i, b in enumerate(useful):  # re-number densely
        b.bin_id = i
    return CompactionPlan(bins=useful, skipped_files=skipped)
