"""A/B evidence for the PK-bloom sidecars (lake/bloom.py): on a
CLUSTERED table every file spans ~the full PK range, so the merge's
candidate selection and the cluster delete-hit victim test degenerate to
"all files" with range stats alone. This script builds a settled
(Hilbert/Z-order) image table, applies one locality-correlated MoR
update batch (keys drawn from a single clustered file — the
recent-uploads shape), and reports, with blooms ON vs OFF:

- merge candidate files (read amplification of the key anti-join scan)
- delete-hit cluster victims + bytes a fold pass would rewrite

Usage: python scripts/bloom_ab.py [n_images]   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_side(spark, enabled: bool, n_images: int) -> dict:
    from pyspark.sql import functions as F

    from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images
    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.cluster import cluster, select_cluster_victims
    from airbyte_spark.operators.maintenance import run_maintenance
    from airbyte_spark.operators.merge import _candidate_entries, merge_into

    root = tempfile.mkdtemp(prefix=f"bloom-ab-{'on' if enabled else 'off'}-")
    try:
        t = LakeTable.create(
            spark, root, IMAGES_SCHEMA, primary_key=["image_id"],
            properties={
                "write.target-file-size-bytes": 16 * 1024 * 1024,
                "write.pk-bloom.enabled": str(enabled).lower(),
            },
        )
        t.append(generate_images(spark, n_images, num_partitions=8))
        # settle: full cluster pass -> every file sorted by the curve key,
        # PK (image_id) ranges of all files now overlap
        run_maintenance(t, "settle", merge_source=None, cluster_scope="full")

        files = sorted(t.data_files(), key=lambda e: e.path)
        one = files[len(files) // 2]
        keys = [
            r["image_id"]
            for r in spark.read.parquet(one.path)
            .select("image_id").limit(64).collect()
        ]
        batch = (
            t.scan().filter(F.col("image_id").isin(keys))
            .withColumn("caption", F.concat(F.col("caption"), F.lit("-v2")))
        )

        # merge-side: candidate files the key scan must read
        keys_df = batch.select("image_id")
        t0 = time.monotonic()
        cands = _candidate_entries(t, keys_df, t.data_files(), "image_id")
        t_cand = time.monotonic() - t0
        merge_into(t, batch, cursor_col=None, mode="mor")

        # cluster-side: what would a delete-fold pass rewrite?
        entries = t.data_files()
        deletes = t.delete_files()
        order_id = max(e.sort_order_id for e in entries)
        victims, reasons = select_cluster_victims(
            t, entries, deletes, order_id,
            16 * 1024 * 1024, fold_deletes=True,
        )
        res = cluster(t, scope="dirty", fold_deletes="always")
        return {
            "bloom": enabled,
            "table_files": len(files),
            "table_mb": round(sum(e.bytes for e in files) / 1e6, 1),
            "batch_keys": len(keys),
            "merge_candidate_files": len(cands),
            "candidate_selection_sec": round(t_cand, 3),
            "delete_hit_victims": reasons.get("delete-hit", 0),
            "fold_rewritten_files": res.rewritten_files,
            "fold_rewritten_mb": round(res.rewritten_bytes / 1e6, 1),
            "dropped_delete_files": res.dropped_delete_files,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
    from airbyte_spark.session import get_spark

    spark = get_spark(parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "on": run_side(spark, True, n_images),
        "off": run_side(spark, False, n_images),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
