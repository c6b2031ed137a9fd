"""Per-file min/max column stats from parquet footers — distributed.

Iceberg writers record per-file lower/upper bounds in manifests
(IcebergTableWriterFactory.kt:108-136); we recompute them by reading ONLY
parquet footers (no data pages), fanned out as a mapInPandas over the file
list so stat collection scales with the cluster, not the driver. At 100 TB
/ ~200k files this is a few MB of footer reads per executor.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from airbyte_spark.lake.format import DataFileEntry


def _footer_stats_batch(paths: list[str], stats_columns: list[str]) -> list[dict]:
    """Read footers for a batch of local parquet paths (runs on executors)."""
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        agg: dict[str, dict] = {}
        for col in stats_columns:
            if col not in col_idx:
                continue
            i = col_idx[col]
            mn = mx = None
            nulls = 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    mn = mx = None
                    break
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    lo, hi = lo.decode("utf-8", "replace"), hi.decode("utf-8", "replace")
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
                nulls += st.null_count or 0
            if mn is not None:
                agg[col] = {"min": mn, "max": mx, "null_count": nulls}
        out.append(
            {
                "path": p,
                "rows": md.num_rows,
                "bytes": os.path.getsize(p),
                "stats": agg,
            }
        )
    return out


def collect_file_entries(
    spark: SparkSession,
    paths: list[str],
    stats_columns: list[str],
    generation_id: int = 0,
    schema_id: int = 0,
) -> list[DataFileEntry]:
    """Distributed footer-stat collection over a list of written files."""
    if not paths:
        return []
    if len(paths) <= 256:
        # driver-side footer reads measure ~2.3 ms/file (local parquet, one
        # row group): up to a few hundred files the loop beats the 1-3 s a
        # python-worker RDD job costs end-to-end (r6 measurement); real
        # at-scale commits (thousands of files) still distribute
        raws = _footer_stats_batch(paths, stats_columns)
    else:
        import json as _json

        sc = spark.sparkContext
        n_slices = min(len(paths), sc.defaultParallelism * 2)
        cols = list(stats_columns)
        raws_json = (
            sc.parallelize(paths, n_slices)
            .mapPartitions(
                # default=str: temporal/decimal footer stats must serialize
                # exactly like the manifest JSON does (atomic_write_json),
                # or every >16-file commit with such stats columns dies on
                # the executors with a TypeError
                lambda it: (
                    _json.dumps(r, default=str)
                    for r in _footer_stats_batch(list(it), cols)
                )
            )
            .collect()
        )
        raws = [_json.loads(r) for r in raws_json]
    return [
        DataFileEntry(
            path=r["path"],
            rows=r["rows"],
            bytes=r["bytes"],
            generation_id=generation_id,
            schema_id=schema_id,
            stats=r["stats"],
        )
        for r in raws
    ]
