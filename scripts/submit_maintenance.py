"""spark-submit entry point for the maintenance pipeline — the deployment
shape the north rule describes (`spark-submit --py-files airbyte_spark.zip
scripts/submit_maintenance.py ...` on a multi-executor cluster).

In-sandbox the same file runs on local[N]; on a real cluster the ambient
SparkSession (created by spark-submit with the cluster master) is reused
as-is — `get_spark` only applies this repo's conf when it creates the
session itself.

Examples:
  # one full pass: merge a staged batch, compact, cluster, GC
  spark-submit --py-files airbyte_spark.zip scripts/submit_maintenance.py \
      --table s3a://lake/images --job-id nightly-2026-08-17 \
      --merge-batch s3a://staging/batch.parquet --curve hilbert

  # partition-parallel shape (one job per partition, bounded concurrency)
  spark-submit ... --partition-parallel --max-concurrent 8

Build the zip with:  (cd /root/repo && zip -qr airbyte_spark.zip airbyte_spark)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True, help="lake table root")
    p.add_argument("--job-id", required=True,
                   help="checkpoint id — rerunning the same id resumes")
    p.add_argument("--merge-batch", default=None,
                   help="parquet path of a staged batch to MERGE first")
    p.add_argument("--cursor-col", default="updated_at")
    p.add_argument("--merge-mode", choices=("cow", "mor"), default="cow")
    p.add_argument("--curve", choices=("zorder", "hilbert"), default="zorder")
    p.add_argument("--target-file-mb", type=int, default=None)
    p.add_argument("--expire-keep-last", type=int, default=2)
    p.add_argument("--partition-parallel", action="store_true",
                   help="per-partition compact+cluster with bounded "
                        "concurrency instead of one table-wide pass")
    p.add_argument("--max-concurrent", type=int, default=4)
    p.add_argument("--cores", type=int, default=None,
                   help="local[N] parallelism when run OUTSIDE spark-submit")
    args = p.parse_args()

    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.maintenance import (
        run_maintenance,
        run_partitioned_maintenance,
    )
    from airbyte_spark.session import get_spark

    spark = get_spark(parallelism=args.cores)
    table = LakeTable.load(spark, args.table)
    target = args.target_file_mb * 1024 * 1024 if args.target_file_mb else None
    if args.partition_parallel:
        rep = run_partitioned_maintenance(
            table, args.job_id, max_concurrent=args.max_concurrent,
            curve=args.curve, target_file_bytes=target,
            expire_keep_last=args.expire_keep_last,
        )
    else:
        batch = (
            spark.read.parquet(args.merge_batch) if args.merge_batch else None
        )
        rep = run_maintenance(
            table, args.job_id, merge_source=batch,
            cursor_col=args.cursor_col, curve=args.curve,
            target_file_bytes=target, expire_keep_last=args.expire_keep_last,
            merge_mode=args.merge_mode,
        )
    print(json.dumps({
        "job_id": rep.job_id,
        "wall_s": round(rep.wall_s, 2),
        "rows": rep.rows,
        "rows_per_sec": round(rep.rows_per_sec, 1),
        "stages": {
            k: {kk: vv for kk, vv in v.items() if kk in ("sec", "resumed")}
            for k, v in rep.stages.items()
        },
    }))


if __name__ == "__main__":
    main()
