"""Structured Streaming micro-batch sync: file-source readStream →
foreachBatch MERGE, availableNow trigger, restart-resume via Spark
checkpoint (T4/T5 semantics on the Spark-native path)."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampType

from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images, generate_update_batch
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.streaming.structured import micro_batch_sync

SRC_SCHEMA = StructType(
    list(IMAGES_SCHEMA.fields)
    + [
        StructField("updated_at", TimestampType()),
        StructField("_ab_cdc_deleted_at", TimestampType()),
    ]
)


def test_streaming_micro_batch_sync(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "tbl"), IMAGES_SCHEMA,
        primary_key=["image_id"],
    )
    t.append(generate_images(spark, 80, num_partitions=2))

    src_dir = os.path.join(tmp_table_dir, "incoming")
    os.makedirs(src_dir)
    batches = [
        generate_update_batch(spark, 80, 30, seed=70 + i, sync_id=20 + i,
                              num_partitions=1)
        for i in range(3)
    ]
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(os.path.join(src_dir, f"batch-{i}"))

    ckpt = os.path.join(tmp_table_dir, "ckpt")
    micro_batch_sync(spark, t, src_dir + "/*", SRC_SCHEMA, ckpt)

    merges = [s for s in t.history() if s.operation == "merge"]
    assert len(merges) >= 1
    n_after = t.scan().count()
    assert n_after > 0

    # restart with same checkpoint: no new batches -> no new merges
    head = t.current_snapshot_id()
    micro_batch_sync(spark, t, src_dir + "/*", SRC_SCHEMA, ckpt)
    assert t.current_snapshot_id() == head

    # new batch arrives -> exactly the delta is processed on restart
    extra = generate_update_batch(spark, 80, 10, seed=99, sync_id=30,
                                  num_partitions=1)
    extra.coalesce(1).write.parquet(os.path.join(src_dir, "batch-3"))
    micro_batch_sync(spark, t, src_dir + "/*", SRC_SCHEMA, ckpt)
    assert t.current_snapshot_id() != head
    assert t.scan().select("image_id").distinct().count() == t.scan().count()
