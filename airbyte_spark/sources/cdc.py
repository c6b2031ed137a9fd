"""S4 — CDC log scan (Debezium envelope) as a bounded Spark source.

The reference consumes a WAL/binlog through Debezium with partially-ordered
offsets and explicit lower/upper bounds per sync
(CdcPartitionsCreator.kt:19-44: the upper bound is pinned once per sync —
cold-start synthesizes one, warm-start resumes from the incumbent state;
CdcPartitionReader.kt reads records in (lower, upper]). The Spark-native
realization reads a directory of Debezium-style JSONL envelopes

    {"op": "c|u|d|r", "lsn": <monotone position>, "ts_ms": <epoch ms>,
     "before": {...row...}, "after": {...row...}}

as a bounded DataFrame shaped exactly like a MERGE source:

- c/u/r (create/update/snapshot-read) -> the `after` image
- d (delete) -> the `before` image with `_ab_cdc_deleted_at` set (P6)
- `_ab_cdc_lsn` carries the offset; it is the MERGE cursor, so the
  partially-ordered log total-orders per key exactly like the reference's
  cursor resolution (J2/T6)
- rows outside (lower_bound, upper_bound] are filtered AT THE SCAN
  (predicate pushdown on the lsn column), which is the engine's version of
  the reader's bounded WAL window.

At scale the log directory is one file per WAL shard; Spark parallelizes
by file splits, and the per-sync `cdc_upper_bound` pin means concurrent
appends to the log never bleed into a running sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

CDC_LSN_COL = "_ab_cdc_lsn"
CDC_DELETED_COL = "_ab_cdc_deleted_at"
EXTRACTED_COL = "_airbyte_extracted_at"


def envelope_schema(value_schema: StructType) -> StructType:
    return StructType(
        [
            StructField("op", StringType()),
            StructField("lsn", LongType()),
            StructField("ts_ms", LongType()),
            StructField("before", value_schema),
            StructField("after", value_schema),
        ]
    )


def read_cdc_log(
    spark: SparkSession,
    path: str,
    value_schema: StructType,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Bounded CDC scan -> MERGE-source rows. `lower_bound` is exclusive
    (the incumbent state's position — warm start), `upper_bound` inclusive
    (the per-sync pin — cold start computes it via `cdc_upper_bound`)."""
    raw = spark.read.schema(envelope_schema(value_schema)).json(path)
    if lower_bound is not None:
        raw = raw.filter(F.col("lsn") > F.lit(int(lower_bound)))
    if upper_bound is not None:
        raw = raw.filter(F.col("lsn") <= F.lit(int(upper_bound)))
    img = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    out = raw.select(
        img.alias("_img"),
        F.col("lsn").alias(CDC_LSN_COL),
        F.when(
            F.col("op") == "d", (F.col("ts_ms") / 1000.0).cast("timestamp")
        ).alias(CDC_DELETED_COL),
        (F.col("ts_ms") / 1000.0).cast("timestamp").alias(EXTRACTED_COL),
    )
    return out.select(
        *[F.col(f"_img.{f.name}").alias(f.name) for f in value_schema.fields],
        CDC_LSN_COL,
        CDC_DELETED_COL,
        EXTRACTED_COL,
    )


def cdc_upper_bound(spark: SparkSession, path: str) -> int | None:
    """Pin this sync's upper WAL position (the `upperBoundReference`
    compute-once of CdcPartitionsCreator.kt:57-59): max lsn currently in
    the log — one column-pruned aggregate."""
    schema = StructType([StructField("lsn", LongType())])
    row = spark.read.schema(schema).json(path).agg(F.max("lsn")).first()
    return int(row[0]) if row[0] is not None else None
