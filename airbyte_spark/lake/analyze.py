"""ANALYZE TABLE — column-level NDV/null statistics (the Iceberg Puffin
/ theta-sketch analog: `compute_table_stats` writing
apache-datasketches-theta-v1 blobs referenced from table metadata).

One distributed pass over the snapshot computes per-column
approx-distinct (Spark's HyperLogLog++, `approx_count_distinct`, rsd
configurable) and null counts; the result is written as a JSON stats
file next to the manifests and referenced from refs.json per branch,
stamped with the snapshot it was computed at so readers can tell fresh
from stale.

Why it matters at 100 TB: NDV is the one statistic per-file min/max
manifests cannot give you (ranges compose, cardinalities do not), and
it is what planners need for join-side selection (broadcast the side
whose key NDV fits), dedup cost estimates (candidate-pair counts in
LSH/simhash are ~ n²/NDV per bucket), and choosing clustering dims
(curve keys over a near-constant column are wasted bits). A full
distinct per column is a shuffle per column; HLL++ is one pass, no
shuffle (partial aggregation merges sketches), error ~rsd.

The stats ride table metadata, not the snapshot lineage: ANALYZE is
re-runnable and its output is advisory — losing or ignoring it can
never change query results.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    MapType,
    StructType,
)

from airbyte_spark.lake.format import atomic_write_json, now_ms, read_json
from airbyte_spark.lake.table import MAIN, LakeTable, _refs_lock


def analyze_table(
    table: LakeTable,
    columns: list[str] | None = None,
    branch: str = MAIN,
    rsd: float = 0.01,
) -> dict:
    """Compute and persist column stats for the current snapshot of
    `branch`. Returns the stats document. `columns` defaults to every
    atomic (non-binary, non-nested) column — sketching a multi-KB binary
    payload column would read the whole payload for a cardinality nobody
    plans with; ask for it explicitly if you mean it."""
    schema = table.schema(branch=branch)
    if columns is None:
        columns = [
            f.name
            for f in schema.fields
            if not isinstance(f.dataType, (BinaryType, ArrayType, MapType, StructType))
        ]
    else:
        missing = [c for c in columns if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"analyze_table: columns not in schema: {missing}")
    snapshot_id = table.current_snapshot_id(branch)
    df = table.scan(branch=branch, columns=list(columns) or None)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"__ndv_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
    row = df.agg(*aggs).first()
    doc = {
        "snapshot_id": snapshot_id,
        "computed_at_ms": now_ms(),
        "rsd": rsd,
        "rows": int(row["__rows"]),
        "columns": {
            c: {
                "ndv": int(row[f"__ndv_{c}"]),
                "null_count": int(row[f"__nulls_{c}"] or 0),
            }
            for c in columns
        },
    }
    name = f"colstats-{snapshot_id}-{branch}.json"
    atomic_write_json(os.path.join(table.meta_dir, name), doc)
    with _refs_lock(table.root):
        refs = table._refs()
        stats_refs = refs["table"].setdefault("column_stats", {})
        old = stats_refs.get(branch)
        stats_refs[branch] = name
        atomic_write_json(os.path.join(table.meta_dir, "refs.json"), refs)
    if old and old != name:
        # superseded stats files are advisory-only — drop eagerly rather
        # than leaking one JSON per ANALYZE run
        try:
            os.unlink(os.path.join(table.meta_dir, old))
        except OSError:
            pass
    return doc


def column_stats(table: LakeTable, branch: str = MAIN) -> dict | None:
    """Latest ANALYZE document for `branch`, or None. `stale` is True
    when commits landed after the stats were computed — advisory stats
    are still returned (cardinalities drift slowly; a planner prefers a
    stale NDV to none), the flag lets callers set their own tolerance."""
    name = table._refs()["table"].get("column_stats", {}).get(branch)
    if name is None:
        return None
    path = os.path.join(table.meta_dir, name)
    if not os.path.exists(path):
        return None
    doc = read_json(path)
    doc["stale"] = doc.get("snapshot_id") != table.current_snapshot_id(branch)
    return doc


def column_stats_df(table: LakeTable, branch: str = MAIN):
    """Stats as a DataFrame (inspection/SQL surface, one row per column),
    empty with the right schema when no ANALYZE has run."""
    doc = column_stats(table, branch) or {"columns": {}, "rows": 0, "stale": True}
    rows = [
        (c, int(v["ndv"]), int(v["null_count"]), int(doc.get("rows", 0)),
         bool(doc.get("stale", True)))
        for c, v in sorted(doc["columns"].items())
    ]
    return table.spark.createDataFrame(
        rows, "column string, ndv long, null_count long, rows long, stale boolean"
    )
