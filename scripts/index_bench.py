"""Incremental phash-index scaling micro-bench: batch cost vs corpus size.

The one-shot near-dup pass re-hashes and re-joins the corpus per sync
(O(corpus) per batch). The incremental index (operators/dedup_index.py)
claims O(batch): a fixed-size ingest window should cost the SAME wall
time whether the index already holds N or 4N images, provided the
bucket partition granularity tracks the corpus (rows-per-bucket held
constant — standard Iceberg bucket-count sizing), because

- hashing touches only the batch's payloads,
- the MoR merge writes O(batch) rows + O(touched buckets) metadata,
- the probe opens only the <= 5*batch buckets the batch's band hashes
  land in, each a constant-rows file.

This script measures, at corpus N and 4N (same batch size B, same
rows-per-bucket):
  initial build wall (expected ~linear in corpus) and, per incremental
  batch, min-of-k update wall (expected ~flat) — plus the probe's
  touched-files fraction as direct evidence of bucket pruning.

Usage: python scripts/index_bench.py [n_images] [batch] [k_batches]
(defaults 32000 16 3; the 4N level reuses 4*n_images). Prints one JSON
line. Run on a quiet box (CLAUDE.md gotcha 8); ~6 min at defaults.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import LakeTable  # noqa: E402
from airbyte_spark.operators.dedup_index import (  # noqa: E402
    create_phash_index,
    update_phash_index,
)
from airbyte_spark.session import get_spark  # noqa: E402

SCHEMA = StructType(
    [StructField("image_id", LongType(), False), StructField("bytes", BinaryType())]
)
ROWS_PER_BUCKET = 320  # 64 images/bucket at 5 bands each


def images(ids_df):
    """Deterministic 64x64 PNGs: group = image_id // 4 seeds a noise
    pattern, the 4 members are power-of-2 contrast variants (16<<i%4 —
    float-exact through luma/pool/DCT/median, so a group phash-collides
    while distinct groups hash ~uniformly: realistic bucket load)."""
    import numpy as np
    import pandas as pd

    from airbyte_spark.codecs import encode_image

    def make(batches):
        pats: dict = {}
        for b in batches:
            rows = []
            for i in b["image_id"]:
                i = int(i)
                g = i // 4
                pat = pats.get(g)
                if pat is None:
                    rng = np.random.default_rng(g)
                    pat = rng.integers(0, 2, size=(64, 64)).astype(np.uint8)
                    if len(pats) < 4096:
                        pats[g] = pat
                v = ((16 << (i % 4)) * pat).astype(np.uint8)
                rows.append(
                    {
                        "image_id": i,
                        "bytes": encode_image(np.stack([v] * 3, -1), "png"),
                    }
                )
            yield pd.DataFrame(rows)

    return ids_df.mapInPandas(make, "image_id long, bytes binary")


def run_level(spark, n_images: int, batch: int, k: int) -> dict:
    root = tempfile.mkdtemp(prefix="idx-bench-")
    buckets = max(32, (5 * n_images) // ROWS_PER_BUCKET)
    try:
        src = LakeTable.create(
            spark, root + "/src", SCHEMA, primary_key=["image_id"]
        )
        idx = create_phash_index(
            src, root + "/idx", max_hamming=4, bucket_count=buckets
        )
        base = images(
            spark.range(n_images).select(F.col("id").alias("image_id"))
        )
        src.append(base)
        t0 = time.monotonic()
        r0 = update_phash_index(src, idx, probe=False)
        build_s = time.monotonic() - t0
        assert r0.mode == "initial" and r0.images_upserted == n_images
        upd, fracs, pairs = [], [], 0
        for j in range(k):
            lo = n_images + j * batch
            ids = spark.range(lo, lo + batch).select(
                F.col("id").alias("image_id")
            )
            src.append(images(ids))
            t0 = time.monotonic()
            r = update_phash_index(src, idx)
            upd.append(round(time.monotonic() - t0, 3))
            assert r.mode == "incremental" and r.images_upserted == batch
            fracs.append(round(r.probed_files / max(1, r.total_files), 4))
            pairs += r.pairs.count()
        return {
            "images": n_images,
            "buckets": buckets,
            "build_s": round(build_s, 2),
            "build_img_per_s": round(n_images / build_s, 1),
            "update_s": upd,
            "update_min_s": min(upd),
            "probe_file_fraction": fracs,
            "pairs_emitted": pairs,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm the Python-UDF workers + memory store off the measured path
    spark.range(1000).select(F.sum(F.col("id"))).collect()
    low = run_level(spark, n, batch, k)
    high = run_level(spark, 4 * n, batch, k)
    ratio = high["update_min_s"] / low["update_min_s"]
    print(
        json.dumps(
            {
                "metric": "incremental phash-index batch cost vs corpus size",
                "batch_images": batch,
                "low": low,
                "high": high,
                "update_cost_ratio_4N_over_N": round(ratio, 3),
                "o_batch_claim_holds": ratio < 1.5,
            }
        )
    )


if __name__ == "__main__":
    main()
