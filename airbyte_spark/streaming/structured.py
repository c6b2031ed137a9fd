"""Structured Streaming front-end for the sync pipeline.

Airbyte's dataflow is micro-batch streaming without event-time watermarks
(SURVEY.md §2.9): records arrive in batches, each batch is merged with
at-least-once + idempotent semantics (T5), checkpoints commit in order
(T4). The Spark-native realization is a file-source `readStream` feeding
`foreachBatch(merge_into)` — Spark's checkpoint dir provides exactly-once
batch tracking (the batch id is the checkpoint id), our snapshot commits
provide the idempotent effects.

`micro_batch_sync` runs the stream until exhausted (availableNow trigger:
process all pending files, then stop — the batch analog of Airbyte's
"sync" run). Late data needs no watermark: the MERGE cursor comparison
decides the winner regardless of arrival order (T6,
SnowflakeDirectLoadSqlGenerator.kt:160-179).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import merge_into


def micro_batch_sync(
    spark: SparkSession,
    table: LakeTable,
    source_dir: str,
    source_schema: StructType,
    checkpoint_dir: str,
    cursor_col: str | None = "updated_at",
    max_files_per_trigger: int | None = None,
) -> None:
    """Stream parquet batch files from `source_dir` into the lake table via
    MERGE, one snapshot per micro-batch. Restarting with the same
    checkpoint_dir skips already-merged batches (Spark tracks file→batch
    assignment; our commits are idempotent per batch anyway)."""
    reader = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
        .parquet(source_dir)
    )

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into(table, batch_df, cursor_col=cursor_col)

    q = (
        reader.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
