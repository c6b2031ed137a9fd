"""Benchmark harness — one JSON line to stdout.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the north-star maintenance pipeline
(MERGE + FFD compact + Z-order cluster + manifest rewrite + expire/GC)
over a deterministic synthetic image+caption lake table sized to the SF.

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "maintenance": {"images": N, "images_per_sec": R}}

The BasicPerformanceTest analog (records/sec + MB/sec per scenario,
BasicPerformanceTest.kt:440-446). Scaling evidence (N vs 4N cores) is
produced by scripts/scaling_bench.py and recorded in BENCH.md.
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
#: repeats per headline query; min is reported (box noise is up to 2.3x
#: run-to-run — single runs are anecdotes, CLAUDE.md gotcha #8)
#: 5 runs: the r4 driver window showed a uniform 10-130% co-tenant
#: inflation across every query; min-of-5 defeats a 2.3x spread with
#: ~+10 s of sub-second queries (r4 verdict item 3)
QUERY_RUNS = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "5"))
#: maintenance input multiplier over the 60k*sf base: the 8k-image r2
#: default was orchestration-floor-bound and under-reported the engine
#: (r3 verdict item); 8x -> 64k images at the driver's sf0.1
MAINT_SCALE = int(os.environ.get("SPARK_GRAFT_MAINT_SCALE", "8"))
MAINT_RUNS = int(os.environ.get("SPARK_GRAFT_MAINT_RUNS", "3"))
#: merge mode for the maintenance pipeline. Default mor: the reference's
#: actual S13 rowDelta path (insert + equality-delete, O(batch) writes);
#: the downstream compact+cluster stages fold the deletes, so the final
#: table state is IDENTICAL to cow (asserted by the CoW-parity tests and
#: a 128k-row full-table diff) while skipping one full payload rewrite —
#: measured 2.5x faster end-to-end at the 128k-image shape
MERGE_MODE = os.environ.get("SPARK_GRAFT_MERGE_MODE", "mor")
#: write.pk-bloom.enabled for the maintenance table (A/B the sidecar
#: write-path cost vs its pruning win; scripts/bloom_ab.py measures the
#: pruning side)
BLOOM = os.environ.get("SPARK_GRAFT_BLOOM", "true")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "w1_dedup_rank",
    "j_broadcast_dims",
    "j2_merge_resolution",
    "sessionization",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk",
    "text_stats",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_maintenance_bench(spark, sf: float) -> dict:
    from airbyte_spark.datagen import (
        IMAGES_SCHEMA,
        generate_images,
        generate_update_batch,
    )
    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.maintenance import run_maintenance

    n_base = max(500, int(60_000 * sf * MAINT_SCALE))
    n_updates = max(200, int(20_000 * sf * MAINT_SCALE))
    chunks = 6
    per = n_base // chunks
    # generate the synthetic input ONCE (outside the measured window and
    # shared across repeat runs — repeats measure the ENGINE, not datagen)
    gen_dir = tempfile.mkdtemp(prefix="bench-gen-")
    for i in range(chunks):
        generate_images(
            spark, per, id_offset=i * per, num_partitions=max(4, CPUS)
        ).write.parquet(f"{gen_dir}/chunk{i}")
    generate_update_batch(
        spark, n_base, n_updates, hot_key_fraction=0.05,
        num_partitions=max(4, CPUS),
    ).write.parquet(f"{gen_dir}/updates")
    # 1% micro-batch for the STEADY-STATE pass (the shape that matters at
    # 10^12 rows: after the cold pass, per-cycle maintenance work must be
    # proportional to the batch, not the table — r3 verdict item 1/8)
    steady_n = max(50, n_base // 100)
    # TWO steady batches: pass 1 additionally absorbs the cold pass's
    # undersized output bins (one-time packing); pass 2 is the true
    # per-cycle cost at 10^12 rows — work proportional to the batch
    for si in (1, 2):
        generate_update_batch(
            spark, n_base, steady_n, seed=77 * si,
            num_partitions=max(2, CPUS // 8),
        ).write.parquet(f"{gen_dir}/steady{si}")
    best = None
    for run in range(max(1, MAINT_RUNS)):
        root = tempfile.mkdtemp(prefix="bench-images-")
        try:
            t = LakeTable.create(
                spark, root, IMAGES_SCHEMA, primary_key=["image_id"],
                properties={"write.target-file-size-bytes": 32 * 1024 * 1024,
                            "write.pk-bloom.enabled": BLOOM},
            )
            # several small commits -> a compactable long tail of files
            for i in range(chunks):
                t.append(spark.read.parquet(f"{gen_dir}/chunk{i}"))
            # persist = the staged batch a real sync reads from object
            # storage
            src = spark.read.parquet(f"{gen_dir}/updates").persist()
            src.count()
            t0 = time.monotonic()
            rep = run_maintenance(
                t, f"bench-{time.time_ns()}", merge_source=src, curve="zorder",
                merge_mode=MERGE_MODE,
            )
            wall = time.monotonic() - t0
            src.unpersist()
            total_rows = sum(e.rows for e in t.data_files())
            table_bytes = sum(e.bytes for e in t.data_files())
            images_processed = n_base + n_updates
            # steady state: dirty-scoped passes over 1% micro-batches.
            # Pass 1 also absorbs the cold pass's undersized bins
            # (one-time packing); pass 2 is the per-cycle number that
            # matters at 10^12 rows
            steady = []
            for si in (1, 2):
                ssrc = spark.read.parquet(f"{gen_dir}/steady{si}").persist()
                ssrc.count()
                t1 = time.monotonic()
                rep2 = run_maintenance(
                    t, f"bench-steady{si}-{time.time_ns()}", merge_source=ssrc,
                    curve="zorder", merge_mode=MERGE_MODE,
                )
                steady.append((time.monotonic() - t1, rep2.stages["cluster"]))
                ssrc.unpersist()
            steady_wall, cl = steady[-1]
            # no-op cycle: unchanged table -> metadata-only
            t2 = time.monotonic()
            rep3 = run_maintenance(
                t, f"bench-noop-{time.time_ns()}", merge_source=None,
                merge_mode=MERGE_MODE,
            )
            noop_wall = time.monotonic() - t2
            res = {
                "sec": round(wall, 3),
                "images": images_processed,
                "table_rows": total_rows,
                "images_per_sec": round(images_processed / wall, 1),
                "runs": max(1, MAINT_RUNS),
                "merge_mode": MERGE_MODE,
                "stages": {
                    k: v.get("resumed", False) for k, v in rep.stages.items()
                },
                "steady": {
                    "sec": round(steady_wall, 3),
                    "batch_rows": steady_n,
                    "rows_per_sec": round(steady_n / steady_wall, 1),
                    "rewritten_files": cl.get("rewritten_files", 0),
                    "rewritten_mb": round(cl.get("rewritten_bytes", 0) / 1e6, 2),
                    "skipped_files": cl.get("skipped_files", 0),
                    "table_mb": round(table_bytes / 1e6, 2),
                    "rewritten_fraction": round(
                        cl.get("rewritten_bytes", 0) / max(1, table_bytes), 4
                    ),
                    "victim_reasons": cl.get("victim_reasons", {}),
                    "absorb_pass": {
                        "sec": round(steady[0][0], 3),
                        "rewritten_mb": round(
                            steady[0][1].get("rewritten_bytes", 0) / 1e6, 2
                        ),
                        "victim_reasons": steady[0][1].get("victim_reasons", {}),
                    },
                },
                "noop": {
                    "sec": round(noop_wall, 3),
                    "rewritten_files": rep3.stages["cluster"].get(
                        "rewritten_files", 0
                    ),
                },
            }
            if best is None or res["sec"] < best["sec"]:
                best = res
        finally:
            shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(gen_dir, ignore_errors=True)
    return best


def run_merge_mode_bench(spark, sf: float) -> dict:
    """Small-batch merge cost, CoW vs MoR: the MoR path must write O(batch)
    (zero candidate rewrites) where CoW rewrites every intersected file."""
    from airbyte_spark.datagen import (
        IMAGES_SCHEMA,
        generate_images,
        generate_update_batch,
    )
    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.merge import merge_into

    n_base = max(500, int(60_000 * sf))
    batch_n = max(50, n_base // 100)  # 1% micro-batches
    out: dict = {}
    for mode in ("cow", "mor"):
        root = tempfile.mkdtemp(prefix=f"bench-merge-{mode}-")
        try:
            t = LakeTable.create(
                spark, root, IMAGES_SCHEMA, primary_key=["image_id"],
                properties={"write.target-file-size-bytes": 32 * 1024 * 1024,
                            "write.pk-bloom.enabled": BLOOM},
            )
            for i in range(4):
                t.append(
                    generate_images(spark, n_base // 4, id_offset=i * (n_base // 4),
                                    num_partitions=max(4, CPUS // 4))
                )
            batches = [
                generate_update_batch(
                    spark, n_base, batch_n, seed=100 + i,
                    num_partitions=max(2, CPUS // 8),
                ).persist()
                for i in range(3)
            ]
            for b in batches:
                b.count()
            t0 = time.monotonic()
            rewritten = added = rw_bytes = add_bytes = 0
            for b in batches:
                r = merge_into(t, b, mode=mode)
                rewritten += r.rewritten_files
                added += r.added_files
                rw_bytes += r.rewritten_bytes
                add_bytes += r.added_bytes
            wall = time.monotonic() - t0
            out[mode] = {
                "sec": round(wall, 3),
                "batches": 3,
                "batch_rows": batch_n,
                "rewritten_files": rewritten,
                "rewritten_mb": round(rw_bytes / 1e6, 2),
                "added_files": added,
                "written_mb": round(add_bytes / 1e6, 2),
                "rows_per_sec": round(3 * batch_n / wall, 1),
            }
            for b in batches:
                b.unpersist()
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return out


def run_streaming_bench(spark, sf: float) -> dict:
    """Native streaming pipeline micro-bench (r5): rows/s through
    readStream(lake_stream) -> writeStream(lake_stream), one pass over a
    table seeded at ~sf-scale. Measures the DataSource path end-to-end
    (executor pyarrow reads, Arrow sink writes, metadata commits)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.sources.lakestream import LakeStreamDataSource

    try:
        spark.dataSource.register(LakeStreamDataSource)
    except Exception:
        pass
    n = int(2_000_000 * max(sf, 0.01))
    schema = StructType(
        [StructField("event_id", LongType(), False), StructField("value", DoubleType())]
    )
    src_root = tempfile.mkdtemp(prefix="bench-stream-src-")
    dst_root = tempfile.mkdtemp(prefix="bench-stream-dst-")
    ckpt = tempfile.mkdtemp(prefix="bench-stream-ckpt-")
    try:
        src = LakeTable.create(spark, src_root, schema, primary_key=["event_id"])
        half = n // 2
        base = spark.range(n, numPartitions=CPUS).select(
            F.col("id").alias("event_id"), (F.col("id") * 1.5).alias("value")
        )
        src.append(base.filter(F.col("event_id") < half))
        src.append(base.filter(F.col("event_id") >= half))
        dst = LakeTable.create(spark, dst_root, schema, primary_key=["event_id"])
        t0 = time.monotonic()
        q = (
            spark.readStream.format("lake_stream")
            .option("path", src_root)
            .load()
            .select("event_id", "value")
            .writeStream.format("lake_stream")
            .option("path", dst_root)
            .option("stream_id", "bench")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        el = time.monotonic() - t0
        rows = dst.scan().count()
        assert rows == n, f"streamed {rows} of {n}"
        return {"rows": n, "sec": round(el, 3), "rows_per_sec": round(n / el, 1)}
    finally:
        shutil.rmtree(src_root, ignore_errors=True)
        shutil.rmtree(dst_root, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    from airbyte_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(parallelism=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sf = _sf_from_dir(SF_DIR)
    qs = entry_mod.queries()

    times: dict[str, float] = {}
    # warm the JVM/scan cache once with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    # warm the Python UDF workers too: one worker per core forks + imports
    # pandas/numpy/pyarrow on first use (~15 s at 32 cores on this box) —
    # a one-time interpreter cost that otherwise lands on whichever query
    # happens to hit Arrow first. Workers are reused afterwards
    # (spark.python.worker.reuse=true), matching steady-state on a cluster.
    from pyspark.sql.functions import col as _col

    from airbyte_spark.functions.dedup import simhash_udf

    spark.range(CPUS * 4, numPartitions=CPUS * 4).select(
        simhash_udf(_col("id").cast("string"))
    ).count()
    # ... and the block-manager/cache machinery: the FIRST persist in a
    # session pays ~2-4 s of memory-store+codegen init on this box
    _warm_cache = spark.range(1000).persist()
    _warm_cache.count()
    _warm_cache.unpersist()
    # min-of-N per query: co-tenant load on this box varies identical runs
    # up to 2.3x — the min is the engine, the rest is the neighborhood
    for run in range(max(1, QUERY_RUNS)):
        # the LSH candidate pipeline memoizes per session — clear it so
        # every repeat pays the full query, not a cache hit
        for cached in entry_mod._LSH_CACHE.values():
            try:
                cached.unpersist()
            except Exception:
                pass
        entry_mod._LSH_CACHE.clear()
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.count()
            el = round(time.monotonic() - t0, 3)
            if name not in times or el < times[name]:
                times[name] = el

    maint = run_maintenance_bench(spark, sf)
    times["maintenance_pipeline"] = maint["sec"]
    merge_modes = run_merge_mode_bench(spark, sf)
    streaming = run_streaming_bench(spark, sf)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline queries + image-table maintenance (merge+compact+zorder+gc) wall time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "query_runs": max(1, QUERY_RUNS),
                "sf": sf,
                "cpus": CPUS,
                "maintenance": {
                    "images": maint["images"],
                    "images_per_sec": maint["images_per_sec"],
                    "table_rows": maint["table_rows"],
                    "runs": maint["runs"],
                    "merge_mode": maint.get("merge_mode", MERGE_MODE),
                    # cold = first-ever pass (everything dirty, full
                    # rewrite); steady = dirty-scoped pass over a 1%
                    # micro-batch; noop = unchanged table, metadata-only
                    "steady": maint.get("steady"),
                    "noop": maint.get("noop"),
                },
                "merge_modes": merge_modes,
                "streaming": streaming,
            }
        )
    )


if __name__ == "__main__":
    main()
