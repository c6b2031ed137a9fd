"""Z-order / Hilbert clustering rewrite (SURVEY.md §2.11 row 2).

Extends the reference's PK sort order (IcebergUtil.kt:130,185-189 and
sort-order evolution IcebergTableSynchronizer.kt:314-378) to
multi-dimensional clustering: a space-filling-curve key over e.g.
(phash, w, h) is computed in a vectorized pandas UDF (functions/curves.py),
then the table is `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)`
and rewritten copy-on-write. After the rewrite, per-file [min,max] stats on
each clustered dimension are tight, so manifest pruning (lake/table.py
scan key_range) skips most files for any box query on the clustered dims.

Plan shape at scale: one full-shuffle range-repartition (unavoidable for a
global re-sort — same cost class as Iceberg's sort rewrite action), sized
to target-file-bytes output partitions. Dimension bounds come from the
table manifests (min/max over live files) — a metadata read, not a data
scan. Everything else is codegen'd JVM work except the Arrow-batched key
UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from airbyte_spark.functions.curves import hilbert_key, phash_to_unsigned, zorder_key
from airbyte_spark.lake.format import Snapshot
from airbyte_spark.lake.table import MAIN, LakeTable

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


@dataclass
class ClusterResult:
    snapshot: Snapshot
    curve: str
    dims: list[str]
    files_before: int
    files_after: int


def _dim_bounds_entries(
    entries, table: LakeTable, dims: list[str], branch: str,
    partition_filter: dict | None = None,
) -> list[tuple[float, float]]:
    """[min,max] per clustered dim over the given entries from manifest
    stats (metadata only). Falls back to a 1-job agg scan for dims
    missing stats."""
    bounds: list[tuple[float, float]] = []
    missing: list[str] = []
    for d in dims:
        lo, hi = None, None
        ok = True
        for e in entries:
            st = e.stats.get(d)
            if not st or st.get("min") is None:
                ok = False
                break
            lo = st["min"] if lo is None else min(lo, st["min"])
            hi = st["max"] if hi is None else max(hi, st["max"])
        if ok and lo is not None:
            bounds.append((float(lo), float(hi)))
        else:
            bounds.append((0.0, 0.0))
            missing.append(d)
    if missing:
        row = table.scan(branch=branch, partition_filter=partition_filter).agg(
            *[F.min(d).alias(f"lo_{d}") for d in missing],
            *[F.max(d).alias(f"hi_{d}") for d in missing],
        ).first()
        for i, d in enumerate(dims):
            if d in missing:
                bounds[i] = (float(row[f"lo_{d}"]), float(row[f"hi_{d}"]))
    return bounds


def curve_key_udf(dims: list[str], bounds: list[tuple[float, float]], curve: str, bits: int):
    """Arrow-batched key computation. phash columns get the sign-bit flip
    so the signed hash quantizes in an order-preserving unsigned domain."""
    from pyspark.sql.functions import pandas_udf

    phash_dims = [i for i, d in enumerate(dims) if "phash" in d]
    ub = list(bounds)
    for i in phash_dims:
        lo = float(phash_to_unsigned(np.array([int(bounds[i][0])], dtype=np.int64))[0])
        hi = float(phash_to_unsigned(np.array([int(bounds[i][1])], dtype=np.int64))[0])
        ub[i] = (min(lo, hi), max(lo, hi))

    @pandas_udf(LongType())
    def _key(*cols: pd.Series) -> pd.Series:
        arrays = []
        for i, c in enumerate(cols):
            a = c.to_numpy()
            if i in phash_dims:
                a = phash_to_unsigned(a.astype(np.int64)).astype(np.float64)
            arrays.append(np.nan_to_num(a.astype(np.float64), nan=0.0))
        fn = zorder_key if curve == "zorder" else hilbert_key
        return pd.Series(fn(arrays, ub, bits=bits))

    return _key


def cluster(
    table: LakeTable,
    dims: list[str] | None = None,
    curve: str = "zorder",  # or "hilbert"
    bits: int | None = None,
    target_file_bytes: int | None = None,
    branch: str = MAIN,
    generation_id: int = 0,
    partition_filter: dict | None = None,
) -> ClusterResult:
    """Clustering rewrite along a space-filling curve. With
    `partition_filter` only that partition's files are rewritten — the
    per-partition job shape that keeps rewrites bounded at 10^12 rows
    (partitions cluster independently and in parallel)."""
    if curve not in ("zorder", "hilbert"):
        raise ValueError("curve must be 'zorder' or 'hilbert'")
    dims = dims or ["phash", "w", "h"]
    if bits is None:
        bits = 63 // len(dims)
        bits = min(bits, 21)
    planned_parent = table.current_snapshot_id(branch)
    entries = table.data_files(branch=branch)
    if partition_filter:
        from airbyte_spark.lake.table import partition_matches

        entries = [e for e in entries if partition_matches(e, partition_filter)]
    if not entries:
        raise ValueError("empty table or empty partition")
    bounds = _dim_bounds_entries(entries, table, dims, branch, partition_filter)

    df = table.scan(branch=branch, partition_filter=partition_filter)
    key = curve_key_udf(dims, bounds, curve, bits)
    keyed = df.withColumn("_ck", key(*[F.col(d) for d in dims]))

    target_file_bytes = target_file_bytes or int(
        table.properties.get("write.target-file-size-bytes", DEFAULT_TARGET_FILE_BYTES)
    )
    total_bytes = sum(e.bytes for e in entries)
    n_out = max(1, -(-total_bytes // target_file_bytes))

    # Boundaries from a column-pruned scan of just the clustered dims (the
    # payload column never loads) — then ONE pass over the full table with
    # a range-bucketed partitionBy write. repartitionByRange would instead
    # sample the keyed plan and execute the payload read + key UDF twice.
    from airbyte_spark.operators.rangewrite import numeric_boundaries, range_bucketed

    slim = table.scan(
        branch=branch, columns=list(dims), partition_filter=partition_filter
    )
    # boundary precision only controls file-size balance, so ~200k sampled
    # rows suffice for the quantiles: sample BEFORE the curve-key UDF —
    # at 10^9 rows this is the difference between a full Python UDF pass
    # over the dims and a bounded one (no-op below 200k rows)
    est_rows = sum(e.rows for e in entries)
    frac = min(1.0, 200_000 / max(1, est_rows))
    if frac < 1.0:
        slim = slim.sample(fraction=frac, seed=42)
    slim = slim.withColumn("_ck", key(*[F.col(d) for d in dims]))
    bounds = numeric_boundaries(slim, "_ck", n_out)
    out = range_bucketed(
        keyed,
        F.col("_ck"),
        bounds,
        sort_cols=["_ck"],
        min_tasks=table.spark.sparkContext.defaultParallelism,
    ).drop("_ck")
    new_entries = table.write_dataframe(
        out, generation_id=generation_id, partition_by="_pid"
    )
    remove = {e.path for e in entries}
    if not partition_filter:
        # a full-table cluster rewrites every data file with a new commit
        # sequence, applying live equality-deletes via scan() — the delete
        # files are dead afterwards, drop them in the same commit
        remove |= {d.path for d in table.delete_files(branch=branch)}
    snap = table.commit(
        "cluster",
        new_entries,
        remove_paths=remove,
        branch=branch,
        expected_parent=planned_parent,
        summary={"curve": curve, "dims": dims, "bits": bits},
    )
    return ClusterResult(
        snapshot=snap,
        curve=curve,
        dims=dims,
        files_before=len(entries),
        files_after=len(new_entries),
    )
