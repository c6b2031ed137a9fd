"""Scaling-efficiency evidence for the north rule: the same maintenance
job (MERGE + FFD compact + Z-order cluster + manifest rewrite + GC +
decode/phash fidelity verify) on identical input at N and 4N local cores;
reports throughput at both and efficiency = speedup / (n_high/n_low).

Sandbox realization notes (recorded in BENCH.md):
- each level runs in a fresh subprocess (clean JVM, no warm-cache bleed);
  min-of-R runs suppresses neighbor-load noise on the shared box;
- levels are INTERLEAVED low,high,low,high,... and efficiency is
  computed per adjacent pair: co-tenant load on this box drifts on a
  ~tens-of-minutes scale (r3 observed 1.5-1.8x spread between
  invocations an hour apart), so pairing runs minutes apart cancels the
  drift that dominates any low-vs-high comparison from separate
  invocations; the per-pair spread is reported alongside the median;
- the worker pins cluster_scope="full" so every timed run is the SAME
  whole-table cold job (the r4 dirty-scope default would make run 2+
  O(batch) — a different, smaller job — and the north rule's axis is
  whole-table compaction+cluster throughput);
- the synthetic table is generated ONCE by the parent and imported by
  both levels, so generation cost is outside the measured window;
- table + shuffle dirs live on tmpfs: this box has ONE virtual disk
  (~290 MB/s), which a 4N-executor cluster would not share — tmpfs
  emulates per-node disk bandwidth scaling (executors on a real cluster
  bring their own disks).

Usage: python scripts/scaling_bench.py [n_images] [n_low] [n_high] \
           [pairs=1] [runs_per_worker=3]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")

GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
base_dir = sys.argv[1]; n_base = int(sys.argv[2])
from airbyte_spark.session import get_spark
from airbyte_spark.datagen import generate_images, generate_update_batch
spark = get_spark(extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
spark.sparkContext.setLogLevel("ERROR")
per = n_base // 6
for i in range(6):
    generate_images(spark, per, id_offset=i * per, num_partitions=64).write.parquet(
        f"{base_dir}/chunk{i}")
generate_update_batch(spark, n_base, n_base // 3, hot_key_fraction=0.05,
                      num_partitions=64).write.parquet(f"{base_dir}/updates")
print("GENERATED")
"""

WORKER = r"""
import sys, time, tempfile, shutil, json
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1]); base_dir = sys.argv[2]
n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
from pyspark import StorageLevel
from pyspark.sql import functions as F
from airbyte_spark.session import get_spark
from airbyte_spark.datagen import IMAGES_SCHEMA
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.maintenance import run_maintenance
from airbyte_spark.functions.images import phash_udf

# big-shape feasibility settings (CLAUDE.md gotcha 3, same at BOTH core
# levels so the efficiency ratio compares identical configs): >=256k
# images means multi-GB persisted batches + many concurrent 26KB-binary
# scan vectors — 12g heap and 512-row columnar batches keep run 3 of 3
# from OOMing at 32 threads
import os as _os
_os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
spark = get_spark(parallelism=cores,
                  extra_conf={"spark.local.dir": "/dev/shm/spark-local",
                              "spark.sql.parquet.columnarReaderBatchSize": "512"})
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix=f"scale-{cores}-", dir="/dev/shm/tmp")
try:
    t = LakeTable.create(spark, root, IMAGES_SCHEMA, primary_key=["image_id"],
                         properties={"write.target-file-size-bytes": 64 * 1024 * 1024})
    for i in range(6):
        t.append(spark.read.parquet(f"{base_dir}/chunk{i}"))
    # DISK_ONLY on tmpfs: the staged batch is GBs of binary payload at the
    # 256k+ shapes — keeping it in the JVM memory-store alongside 32
    # concurrent binary scan vectors OOMs an 8g heap; serialized-to-tmpfs
    # is still RAM-speed but off-heap
    src = spark.read.parquet(f"{base_dir}/updates").persist(StorageLevel.DISK_ONLY)
    n_src = src.count()
    n_base = sum(e.rows for e in t.data_files())
    best = None
    for r in range(n_runs):
        t0 = time.monotonic()
        try:
            # cluster_scope="full": every timed run is the identical
            # whole-table job (the dirty default would shrink run 2+ to
            # O(batch) — a different workload than the rule measures)
            run_maintenance(t, f"scale-{r}", merge_source=src,
                            merge_mode="mor", cluster_scope="full")
            # fidelity verify: decode every surviving image, recompute phash
            bad = t.scan().select(
                F.sum((phash_udf("bytes") != F.col("phash")).cast("long"))).first()[0]
            assert not bad, f"{bad} corrupted rows"
        except Exception as e:
            print(f"RUN {r} FAILED: {type(e).__name__}: {str(e)[:800]}", flush=True)
            raise
        w = time.monotonic() - t0
        best = w if best is None or w < best else best
    images = n_base + n_src
    print(json.dumps({"cores": cores, "sec": round(best, 2), "images": images,
                      "images_per_sec": round(images / best, 1)}))
finally:
    shutil.rmtree(root, ignore_errors=True)
"""


def _run_worker(cores, base_dir, n_runs, tag):
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), base_dir, str(n_runs)],
        capture_output=True, text=True, timeout=3600,
    )
    with open(f"/tmp/scale_worker_{cores}_{tag}.stderr", "w") as f:
        f.write(out.stderr)
    with open(f"/tmp/scale_worker_{cores}_{tag}.stdout", "w") as f:
        f.write(out.stdout)
    if out.returncode != 0:
        print(f"worker cores={cores} rc={out.returncode}; see "
              f"/tmp/scale_worker_{cores}_{tag}.stderr", file=sys.stderr)
        print(out.stdout[-1000:], file=sys.stderr)
        sys.exit(1)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 96_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    n_runs = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    os.makedirs("/dev/shm/tmp", exist_ok=True)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    base_dir = tempfile.mkdtemp(prefix="scale-base-", dir="/dev/shm/tmp")
    try:
        subprocess.run([sys.executable, "-c", GEN, base_dir, str(n_images)],
                       check=True, capture_output=True, text=True, timeout=1800)
        # interleave levels: each pair runs low then high minutes apart, so
        # the pair-internal efficiency is computed under (nearly) the same
        # co-tenant load — the drift between invocations is what buried the
        # r3 8-vs-32 comparison
        pair_results = []
        for p in range(pairs):
            lo = _run_worker(n_low, base_dir, n_runs, f"p{p}")
            hi = _run_worker(n_high, base_dir, n_runs, f"p{p}")
            speedup = lo["sec"] / hi["sec"]
            eff = speedup / (n_high / n_low)
            pair_results.append(
                {"low": lo, "high": hi, "speedup": round(speedup, 3),
                 "scaling_efficiency": round(eff, 3)})
            print(json.dumps({"pair": p, **pair_results[-1]}), flush=True)
        effs = sorted(r["scaling_efficiency"] for r in pair_results)
        median = effs[len(effs) // 2] if len(effs) % 2 else round(
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
        # best-per-level pairing (the classic min-of-all reading, for
        # comparison with the per-pair medians)
        best_lo = min(r["low"]["sec"] for r in pair_results)
        best_hi = min(r["high"]["sec"] for r in pair_results)
        print(json.dumps({
            "pairs": pair_results,
            "median_pair_efficiency": median,
            "efficiency_spread": [effs[0], effs[-1]],
            "best_of_all_efficiency": round(
                (best_lo / best_hi) / (n_high / n_low), 3),
            "n_low": n_low, "n_high": n_high, "n_images": n_images,
            "runs_per_worker": n_runs,
        }))
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
