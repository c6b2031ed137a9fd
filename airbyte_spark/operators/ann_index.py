"""Incrementally-maintained ANN top-k index over an embedding column.

The one-shot LSH top-k (`functions/similarity.py::lsh_topk_fixed_planes`)
re-buckets the WHOLE corpus on every query call — at 10⁹ vectors that is
a full scan + hash pass per search. This operator keeps the bucket
assignments AS A LAKE TABLE (a covering index: each row carries the
vector, so a search never touches the source) and advances it O(batch)
from the source changelog via the shared window resolution
(`dedup_index.resolve_changelog_window`):

- index rows are `(vec_id, tbl, bucket, vec)` — one row per LSH table
  of fixed ±1 sign planes (`signed_planes(n_tables, nbits, dim, seed)`
  — deterministic from config, so any updater rebuilds the identical
  planes and DuckDB reproduces the buckets from plane literals), PK
  `(vec_id, tbl)`, hidden-partitioned `bucket(N, bucket)`;
- updates hash only the window's surviving vectors (one Arrow pass) and
  land via a MoR merge keyed by the source sequence — idempotent
  replay, removals tombstone through the CDC path;
- `query_ann_index` buckets the query vectors with the same planes,
  reads ONLY the index files whose hash-bucket partitions collide in at
  least one table (manifest-pruned), and exact-cosine re-ranks the
  candidate union — identical result contract to the one-shot function
  over the index's current corpus.

The index table is ordinary: compaction folds per-merge bucket files,
time travel pins a search, expire/GC applies, and it can ride the
`maintenance.derived-tables` registry (kind "ann-index").
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.lake.transforms import fields_by_key
from airbyte_spark.operators.dedup_index import resolve_changelog_window
from airbyte_spark.operators.merge import CDC_DELETED_COL, merge_into

CONF_PROP = "ann-index.config"
WATERMARK_PROP = "ann-index.source-snapshot-watermark"


@dataclass
class AnnIndexResult:
    mode: str  # "initial" | "rebuild" | "incremental" | "noop"
    watermark: str
    vectors_upserted: int = 0
    vectors_removed: int = 0


def _planes(conf: dict):
    from airbyte_spark.functions.similarity import signed_planes

    return signed_planes(
        int(conf["n_tables"]),
        int(conf["nbits"]),
        int(conf["dim"]),
        seed=int(conf["seed"]),
    )


def create_ann_index(
    source: LakeTable,
    root: str,
    vec_col: str,
    id_col: str,
    dim: int,
    n_tables: int = 4,
    nbits: int = 6,
    seed: int = 777,
    bucket_count: int = 32,
    branch: str = MAIN,
) -> LakeTable:
    """Create the (empty) covering index for `source`; the plane family
    is a pure function of (n_tables, nbits, dim, seed) pinned in table
    properties, so every updater and every query hash identically."""
    src = source.schema(branch=branch)
    if id_col not in src.fieldNames():
        raise ValueError(f"unknown id column {id_col!r}")
    if vec_col not in src.fieldNames() or not isinstance(
        src[vec_col].dataType, ArrayType
    ):
        raise ValueError(f"{vec_col!r} must be an array column")
    fields = [
        StructField(id_col, src[id_col].dataType, False),
        StructField("tbl", IntegerType(), False),
        StructField("bucket", LongType(), True),
        StructField("vec", src[vec_col].dataType, True),
        StructField("_idx_seq", LongType(), True),
    ]
    t = LakeTable.create(
        source.spark,
        root,
        StructType(fields),
        primary_key=[id_col, "tbl"],
        partition_by=[f"bucket({bucket_count}, bucket)"],
    )
    t.set_properties(
        {
            CONF_PROP: json.dumps(
                {
                    "id_col": id_col,
                    "vec_col": vec_col,
                    "dim": dim,
                    "n_tables": n_tables,
                    "nbits": nbits,
                    "seed": seed,
                }
            )
        }
    )
    return t


def _index_conf(index: LakeTable) -> dict:
    try:
        return json.loads(index.properties[CONF_PROP])
    except KeyError as e:
        raise ValueError(
            "not an ANN index (create it with create_ann_index)"
        ) from e


def _bucket_rows(vecs: DataFrame, id_col: str, vec_col: str, planes) -> DataFrame:
    """(id, vec) -> one row per LSH table: (id, tbl, bucket, vec)."""
    from airbyte_spark.functions.similarity import fixed_plane_bucket_udf

    out = None
    for t in range(planes.shape[0]):
        b = vecs.select(
            F.col(id_col),
            F.lit(t).cast("int").alias("tbl"),
            fixed_plane_bucket_udf(planes[t])(F.col(vec_col)).alias("bucket"),
            F.col(vec_col).alias("vec"),
        )
        out = b if out is None else out.unionByName(b)
    return out


def update_ann_index(
    source: LakeTable,
    index: LakeTable,
    branch: str = MAIN,
) -> AnnIndexResult:
    """Advance the index to `source`'s head (see module docstring)."""
    conf = _index_conf(index)
    id_col, vec_col = conf["id_col"], conf["vec_col"]
    planes = _planes(conf)
    head = source.snapshot(branch=branch)
    wm = index.properties.get(WATERMARK_PROP)
    if wm == head.snapshot_id:
        return AnnIndexResult("noop", wm)

    if wm is None:
        vecs = source.scan(branch=branch, snapshot_id=head.snapshot_id).select(
            id_col, vec_col
        )
        rows = _bucket_rows(vecs, id_col, vec_col, planes).withColumn(
            "_idx_seq", F.lit(head.sequence)
        )
        mode = "initial"
        if index.data_files(branch):
            # reset on a non-empty index, or a crash between the initial
            # append and the watermark stamp (at-least-once maintenance):
            # re-appending would duplicate every (id, tbl) row — rebuild
            # via an idempotent MoR merge + stale-id tombstones instead
            # (same guard shape as rollup.py / dedup_index.py).
            mode = "rebuild"
            schema = index.schema(branch=branch)
            stale = (
                index.scan(branch=branch)
                .select(id_col)
                .distinct()
                .join(vecs.select(id_col), id_col, "left_anti")
            )
            tomb = stale.select(
                id_col,
                F.explode(
                    F.array(
                        *[
                            F.lit(t).cast("int")
                            for t in range(planes.shape[0])
                        ]
                    )
                ).alias("tbl"),
                F.lit(None).cast("long").alias("bucket"),
                F.lit(None).cast(schema["vec"].dataType).alias("vec"),
                F.lit(head.sequence).alias("_idx_seq"),
                F.current_timestamp().alias(CDC_DELETED_COL),
            )
            merge_into(
                index,
                rows.withColumn(
                    CDC_DELETED_COL, F.lit(None).cast("timestamp")
                ).unionByName(tomb),
                cursor_col="_idx_seq",
                mode="mor",
                branch=branch,
            )
        else:
            index.append(rows)
        index.set_properties({WATERMARK_PROP: head.snapshot_id})
        n = index.scan(branch=branch).select(id_col).distinct().count()
        return AnnIndexResult(mode, head.snapshot_id, vectors_upserted=n)

    ups, removed = resolve_changelog_window(
        source, wm, head, id_col, vec_col, branch=branch
    )
    up_rows = (
        _bucket_rows(ups.select(id_col, vec_col), id_col, vec_col, planes)
        .withColumn("_idx_seq", F.lit(head.sequence))
        .withColumn(CDC_DELETED_COL, F.lit(None).cast("timestamp"))
        .persist()
    )
    try:
        n_up = up_rows.select(id_col).distinct().count()
        schema = index.schema(branch=branch)
        tomb = removed.select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.lit(t).cast("int")
                        for t in range(planes.shape[0])
                    ]
                )
            ).alias("tbl"),
            F.lit(None).cast("long").alias("bucket"),
            F.lit(None).cast(schema["vec"].dataType).alias("vec"),
            F.lit(head.sequence).alias("_idx_seq"),
            F.current_timestamp().alias(CDC_DELETED_COL),
        )
        n_rm = removed.count()
        merge_into(
            index,
            up_rows.unionByName(tomb),
            cursor_col="_idx_seq",
            mode="mor",
            branch=branch,
        )
    finally:
        up_rows.unpersist()
    index.set_properties({WATERMARK_PROP: head.snapshot_id})
    return AnnIndexResult(
        "incremental",
        head.snapshot_id,
        vectors_upserted=n_up,
        vectors_removed=n_rm,
    )


def query_ann_index(
    index: LakeTable,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    branch: str = MAIN,
) -> DataFrame:
    """Top-k per query over the indexed corpus: bucket the query vectors
    with the index's own planes, read ONLY the index files whose
    hash-bucket partitions collide in >= 1 LSH table, exact-cosine
    re-rank the candidate union (the one-shot `lsh_topk_fixed_planes`
    contract, minus the corpus re-hash). Returns
    (query_id, <id_col>, rank). `queries` must carry
    (query_id_col, <vec_col per index config>)."""
    from airbyte_spark.functions.similarity import cosine
    from airbyte_spark.lake.transforms import partition_expr
    from pyspark.sql import Window

    conf = _index_conf(index)
    id_col, vec_col = conf["id_col"], conf["vec_col"]
    planes = _planes(conf)
    # queries are the small broadcast side; the bucket UDF re-runs once
    # for the partition probe and once in the join — cheap by contract
    q = _bucket_rows(queries, query_id_col, vec_col, planes).select(
        F.col(query_id_col),
        "tbl",
        "bucket",
        F.col("vec").alias("_qvec"),
    )
    schema = index.schema(branch=branch)
    fld = fields_by_key(index.partition_fields()).get("bucket_bucket")
    live = index.all_files(branch=branch)
    data = [e for e in live if e.content == "data"]
    deletes = [e for e in live if e.content != "data"]
    kept = data
    if fld is not None:
        parts = {
            r["b"]
            for r in q.select(
                partition_expr(fld, schema["bucket"].dataType).alias("b")
            )
            .distinct()
            .collect()
        }
        kept = [
            e
            for e in data
            if fld.name not in e.partition or e.partition[fld.name] in parts
        ]
    if not kept:
        return index.spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(query_id_col, schema[id_col].dataType),
                    StructField(id_col, schema[id_col].dataType),
                    StructField("rank", IntegerType()),
                ]
            ),
        )
    idx = index.read_entries(kept, schema, deletes=deletes)
    cands = (
        idx.join(F.broadcast(q), on=["tbl", "bucket"])
        .dropDuplicates([query_id_col, id_col])
        .select(
            query_id_col,
            id_col,
            cosine(F.col("vec"), F.col("_qvec")).alias("_cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("_cos"), F.asc(id_col)
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank")
    )
