"""One instrumented maintenance run with per-stage wall times — the
Amdahl decomposition behind BENCH.md's scaling numbers (what part of the
pipeline is parallel payload work vs serial orchestration floor).

Usage: python scripts/profile_maintenance.py [n_images] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 96_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from airbyte_spark.datagen import (
        IMAGES_SCHEMA,
        generate_images,
        generate_update_batch,
    )
    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.maintenance import run_maintenance
    from airbyte_spark.session import get_spark

    os.makedirs("/dev/shm/tmp", exist_ok=True)
    spark = get_spark(
        parallelism=cores,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="profile-", dir="/dev/shm/tmp")
    try:
        t = LakeTable.create(
            spark, root, IMAGES_SCHEMA, primary_key=["image_id"],
            properties={"write.target-file-size-bytes": 64 * 1024 * 1024},
        )
        per = n_base // 6
        for i in range(6):
            t.append(generate_images(spark, per, id_offset=i * per,
                                     num_partitions=64))
        src = generate_update_batch(
            spark, n_base, n_base // 3, hot_key_fraction=0.05,
            num_partitions=64,
        ).persist()
        src.count()
        t0 = time.monotonic()
        merge_mode = os.environ.get("SPARK_GRAFT_MERGE_MODE", "mor")
        rep = run_maintenance(t, f"profile-{time.time_ns()}", merge_source=src,
                              merge_mode=merge_mode)
        wall = time.monotonic() - t0
        stages = {
            name: {
                "sec": m.get("sec"),
                **{
                    k: v
                    for k, v in m.items()
                    if k in ("phase_sec", "bins", "files_before", "files_after",
                             "rewritten_files", "added_files", "entries",
                             "orphan_files")
                },
            }
            for name, m in rep.stages.items()
        }
        images = n_base + n_base // 3
        print(json.dumps({
            "cores": cores,
            "images": images,
            "wall_sec": round(wall, 2),
            "images_per_sec": round(images / wall, 1),
            "stages": stages,
        }, indent=2))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
