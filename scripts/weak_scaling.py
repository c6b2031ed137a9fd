"""Weak-scaling proxy for the north rule's N->4N criterion.

No real cluster exists in this sandbox, so the closest honest proxy for
"4x executors, 4x data, same wall time" is: J independent per-partition
maintenance jobs (the exact job shape a 10^12-row table is maintained
with — one bounded compact+cluster+GC per partition), each in its OWN
Spark process pinned to a fixed core count, run solo vs. 4-way
concurrent on identical inputs. Per-job slowdown under 4-way concurrency
is the weak-scaling efficiency: on a real cluster each job would own its
executors outright; here the jobs share one VM's memory bandwidth, so
this measures the box's interference floor (CLAUDE.md gotcha 8), an
upper bound on what multi-tenancy costs the plan itself.

Usage:  python scripts/weak_scaling.py [images_per_table] [cores_per_job]
        (run in background; ~6-10 min)
Worker: python scripts/weak_scaling.py --worker <table_root> <cores>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONCURRENT = 4


def build_table(spark, root: str, n_images: int) -> None:
    from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images
    from airbyte_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, root, IMAGES_SCHEMA, primary_key=["image_id"],
        properties={"write.target-file-size-bytes": 32 * 1024 * 1024},
    )
    chunks = 6
    per = n_images // chunks
    for i in range(chunks):
        t.append(generate_images(spark, per, id_offset=i * per, num_partitions=8))


def worker(root: str, cores: int) -> None:
    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.maintenance import run_maintenance
    from airbyte_spark.session import get_spark

    spark = get_spark(
        parallelism=cores,
        app_name=f"weak-scaling-{os.path.basename(root)}",
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = LakeTable.load(spark, root)
    t0 = time.monotonic()
    run_maintenance(t, f"ws-{time.time_ns()}", merge_source=None, curve="zorder")
    print(json.dumps({"root": root, "sec": round(time.monotonic() - t0, 3)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]))
        return
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from airbyte_spark.session import get_spark

    base = tempfile.mkdtemp(prefix="weak-scaling-")
    roots = [os.path.join(base, f"t{i}") for i in range(N_CONCURRENT + 1)]
    try:
        spark = get_spark(parallelism=16, app_name="weak-scaling-build")
        spark.sparkContext.setLogLevel("ERROR")
        for r in roots:
            build_table(spark, r, n_images)
        spark.stop()

        env = {**os.environ, "SPARK_DRIVER_MEM": "4g"}

        def launch(root):
            return subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker", root,
                 str(cores)],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
                text=True,
            )

        # solo: one job, fixed cores
        t0 = time.monotonic()
        p = launch(roots[N_CONCURRENT])
        out, _ = p.communicate()
        solo = json.loads(out.strip().splitlines()[-1])["sec"]
        solo_wall = time.monotonic() - t0

        # 4-way concurrent: same job on 4 identical tables
        t0 = time.monotonic()
        procs = [launch(r) for r in roots[:N_CONCURRENT]]
        per_job = []
        for p in procs:
            out, _ = p.communicate()
            per_job.append(json.loads(out.strip().splitlines()[-1])["sec"])
        conc_wall = time.monotonic() - t0

        worst = max(per_job)
        eff = solo / worst if worst else 0.0
        print(json.dumps({
            "metric": "weak-scaling proxy: per-partition maintenance jobs, "
                      "solo vs 4-way concurrent, fixed cores per job",
            "images_per_table": n_images,
            "cores_per_job": cores,
            "solo_sec": solo,
            "solo_wall_sec": round(solo_wall, 3),
            "concurrent_per_job_sec": per_job,
            "concurrent_wall_sec": round(conc_wall, 3),
            "per_job_slowdown_worst": round(worst / solo, 3) if solo else None,
            "weak_scaling_efficiency": round(eff, 3),
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
