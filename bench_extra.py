"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Per-stage breakdown of the maintenance pipeline cold pass (the 90%-of-wall
item in BENCH_r05.json at sf1) plus noop-sink isolation of the headline
queries (guide §1.4). Prints human-readable lines, not the driver JSON.

Usage:
  python bench_extra.py maint [--scale N] [--runs K]   # maintenance stages
  python bench_extra.py queries [--runs K]             # noop-sink queries
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def maint(scale: int, runs: int, merge_mode: str = "mor") -> None:
    from airbyte_spark.datagen import (
        IMAGES_SCHEMA,
        generate_images,
        generate_update_batch,
    )
    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.maintenance import run_maintenance
    from airbyte_spark.session import get_spark

    spark = get_spark(parallelism=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf_from_dir(SF_DIR)
    n_base = max(500, int(60_000 * sf * scale))
    n_updates = max(200, int(20_000 * sf * scale))
    chunks = 6
    per = n_base // chunks
    gen_dir = tempfile.mkdtemp(prefix="benchx-gen-")
    print(f"# maint shape: n_base={n_base} n_updates={n_updates} mode={merge_mode}")
    t0 = time.monotonic()
    for i in range(chunks):
        generate_images(
            spark, per, id_offset=i * per, num_partitions=max(4, CPUS)
        ).write.parquet(f"{gen_dir}/chunk{i}")
    generate_update_batch(
        spark, n_base, n_updates, hot_key_fraction=0.05,
        num_partitions=max(4, CPUS),
    ).write.parquet(f"{gen_dir}/updates")
    print(f"# datagen {time.monotonic()-t0:.1f}s")
    try:
        for run in range(runs):
            root = tempfile.mkdtemp(prefix="benchx-images-")
            try:
                t = LakeTable.create(
                    spark, root, IMAGES_SCHEMA, primary_key=["image_id"],
                    properties={
                        "write.target-file-size-bytes": 32 * 1024 * 1024,
                        "write.pk-bloom.enabled": "true",
                    },
                )
                ta = time.monotonic()
                for i in range(chunks):
                    t.append(spark.read.parquet(f"{gen_dir}/chunk{i}"))
                append_s = time.monotonic() - ta
                src = spark.read.parquet(f"{gen_dir}/updates").persist()
                src.count()
                t1 = time.monotonic()
                rep = run_maintenance(
                    t, f"benchx-{time.time_ns()}", merge_source=src,
                    curve="zorder", merge_mode=merge_mode,
                )
                wall = time.monotonic() - t1
                src.unpersist()
                print(f"run {run}: appends={append_s:.2f}s cold_wall={wall:.3f}s")
                for name, m in rep.stages.items():
                    extras = {
                        k: v for k, v in m.items()
                        if k in ("rows", "rewritten_files", "added_files",
                                 "rewritten_bytes", "phase_sec", "backfilled",
                                 "entries", "expired_snapshots", "orphan_files",
                                 "victim_reasons")
                    }
                    print(f"  {name:20s} {m['sec']:8.3f}s {json.dumps(extras, default=str)}")
            finally:
                shutil.rmtree(root, ignore_errors=True)
    finally:
        shutil.rmtree(gen_dir, ignore_errors=True)


def queries(runs: int) -> None:
    from airbyte_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(parallelism=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = [
        "q1_pricing_summary", "w1_dedup_rank", "j_broadcast_dims",
        "j2_merge_resolution", "sessionization", "dedup_exact",
        "dedup_minhash_lsh", "ann_topk", "text_stats",
    ]
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    from pyspark.sql.functions import col as _col

    from airbyte_spark.functions.dedup import simhash_udf

    spark.range(CPUS * 4, numPartitions=CPUS * 4).select(
        simhash_udf(_col("id").cast("string"))
    ).count()
    _w = spark.range(1000).persist(); _w.count(); _w.unpersist()
    best: dict[str, float] = {}
    for _ in range(runs):
        for cached in entry_mod._LSH_CACHE.values():
            try:
                cached.unpersist()
            except Exception:
                pass
        entry_mod._LSH_CACHE.clear()
        for name in names:
            spark.sparkContext.setJobDescription(f"benchx:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.count()
            el = time.monotonic() - t0
            if name not in best or el < best[name]:
                best[name] = el
        spark.sparkContext.setJobDescription(None)
    for name in names:
        print(f"{name:24s} {best[name]:8.3f}s")
    print(f"{'TOTAL':24s} {sum(best.values()):8.3f}s")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "maint"
    kw = dict(
        scale=int(os.environ.get("SPARK_GRAFT_MAINT_SCALE", "8")),
        runs=2,
    )
    for i, a in enumerate(sys.argv):
        if a == "--scale":
            kw["scale"] = int(sys.argv[i + 1])
        if a == "--runs":
            kw["runs"] = int(sys.argv[i + 1])
        if a == "--mode":
            kw["merge_mode"] = sys.argv[i + 1]
    if cmd == "maint":
        maint(**kw)
    elif cmd == "queries":
        queries(runs=kw["runs"])
    else:
        raise SystemExit(f"unknown command {cmd}")
