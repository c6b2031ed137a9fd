"""Metadata-scaling micro-bench: commit cost vs table file count.

Exercises ONLY the driver-side metadata path (no SparkSession, no data
files): fabricated DataFileEntry batches are committed through
LakeTable.commit, which is the code path every append / merge /
maintenance pass takes. Records, as the table grows to `n_commits`
batches:

- per-commit wall time (flat = O(batch); the pre-manifest-reuse design
  rewrote every live entry per commit, i.e. O(table))
- metadata bytes actually written per commit vs the bytes a full-manifest
  rewrite WOULD have written at that table size (the old design's cost,
  computed from the same live entry list — arithmetic, not a guess)
- scan-planning time from manifest-list summaries (manifest-level
  key-range pruning) vs planning forced to open every manifest (the
  legacy no-summaries path), measured on the final table

Usage: python scripts/meta_bench.py [n_commits] [files_per_commit]
Prints one JSON line.
"""

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import (  # noqa: E402
    IntegerType,
    StringType,
    StructField,
    StructType,
)

import airbyte_spark.lake.table as tbl  # noqa: E402
from airbyte_spark.lake.format import DataFileEntry  # noqa: E402
from airbyte_spark.lake.table import LakeTable  # noqa: E402

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("v", IntegerType()),
    ]
)


def fake_entries(root: str, commit_i: int, n: int) -> list[DataFileEntry]:
    d = os.path.join(root, "data", f"{commit_i:08x}-g0")
    return [
        DataFileEntry(
            path=os.path.join(d, f"part-{j:05d}.parquet"),
            rows=1000,
            bytes=1 << 20,
            stats={
                "id": {
                    "min": f"k{commit_i:06d}{j:02d}",
                    "max": f"k{commit_i:06d}{j:02d}~",
                    "null_count": 0,
                }
            },
        )
        for j in range(n)
    ]


def meta_bytes(meta_dir: str) -> dict[str, int]:
    return {
        f: os.path.getsize(os.path.join(meta_dir, f))
        for f in os.listdir(meta_dir)
    }


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    root = tempfile.mkdtemp(prefix="metabench-")
    try:
        t = LakeTable.create(None, root, SCHEMA, primary_key=["id"])
        walls, written, full_equiv = [], [], []
        before = meta_bytes(t.meta_dir)
        live_entry_bytes = 0  # serialized size of ALL live entries
        for i in range(n_commits):
            entries = fake_entries(root, i, per)
            t0 = time.perf_counter()
            t.commit("append", entries)
            walls.append(time.perf_counter() - t0)
            after = meta_bytes(t.meta_dir)
            written.append(
                sum(sz for f, sz in after.items() if f not in before)
                + sum(
                    sz - before[f]
                    for f, sz in after.items()
                    if f in before and sz != before[f]
                )
            )
            before = after
            live_entry_bytes += sum(
                len(json.dumps(e.to_json())) for e in entries
            )
            # what one full-manifest rewrite would write at this size
            full_equiv.append(live_entry_bytes)

        def window(xs, lo, hi):
            return xs[int(len(xs) * lo) : max(int(len(xs) * hi), int(len(xs) * lo) + 1)]

        n_files = len(t.data_files())
        head = t.snapshot()

        # planning A/B on the final table: summaries vs forced-open
        probe = ("id", f"k{(n_commits - 1):06d}00", f"k{(n_commits - 1):06d}99")
        tbl._MANIFEST_CACHE.clear()
        t0 = time.perf_counter()
        pruned = t.all_files(key_range=probe)
        plan_pruned_s = time.perf_counter() - t0
        tbl._MANIFEST_CACHE.clear()
        t0 = time.perf_counter()
        # force the no-summaries path by reading through a snapshot copy
        all_entries = []
        for name in head.manifests:
            all_entries.extend(t._read_entries_of(name))
        plan_full_s = time.perf_counter() - t0

        out = {
            "metric": "metadata commit cost vs table size (driver-only)",
            "n_commits": n_commits,
            "files_per_commit": per,
            "final_data_files": n_files,
            "final_manifests": len(head.manifests),
            "commit_ms_first10pct_median": round(
                statistics.median(window(walls, 0.0, 0.1)) * 1e3, 2
            ),
            "commit_ms_last10pct_median": round(
                statistics.median(window(walls, 0.9, 1.0)) * 1e3, 2
            ),
            "written_bytes_per_commit_last10pct_median": int(
                statistics.median(window(written, 0.9, 1.0))
            ),
            "full_rewrite_equiv_bytes_at_end": full_equiv[-1],
            "metadata_write_amplification_vs_full_rewrite": round(
                full_equiv[-1]
                / max(statistics.median(window(written, 0.9, 1.0)), 1),
                1,
            ),
            "plan_pruned_entries": len(pruned),
            "plan_pruned_ms": round(plan_pruned_s * 1e3, 2),
            "plan_open_all_ms": round(plan_full_s * 1e3, 2),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
