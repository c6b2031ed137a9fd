"""Multi-stream connection sync (DestinationLifecycle.kt:32-106 analog):
concurrent per-stream pipelines, independent staging branches, atomic
per-stream swaps, failed streams keep staging for resume."""

import os

import pytest
from pyspark.sql import functions as F

from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images, generate_update_batch
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.streaming.connection import ConnectionSync, StreamSpec


def _mk_table(spark, root, n=60):
    t = LakeTable.create(spark, root, IMAGES_SCHEMA, primary_key=["image_id"])
    t.append(generate_images(spark, n, num_partitions=2))
    return t


def test_multi_stream_sync_parallel(spark, tmp_table_dir):
    ta = _mk_table(spark, os.path.join(tmp_table_dir, "a"))
    tb = _mk_table(spark, os.path.join(tmp_table_dir, "b"))
    sync = ConnectionSync(
        "conn-1",
        [
            StreamSpec("images_a", ta),
            StreamSpec("images_b", tb, merge_mode="mor"),
        ],
        max_concurrent=2,
    )
    sync.start()
    pre_a, pre_b = ta.scan().count(), tb.scan().count()
    for ckpt in range(2):
        sync.write(
            {
                "images_a": (
                    generate_update_batch(spark, 60, 20, seed=80 + ckpt,
                                          num_partitions=2),
                    ckpt,
                ),
                "images_b": (
                    generate_update_batch(spark, 60, 20, seed=90 + ckpt,
                                          num_partitions=2),
                    ckpt,
                ),
            }
        )
    # snapshot isolation per stream: main branches unchanged until finish
    assert ta.scan().count() == pre_a and tb.scan().count() == pre_b
    report = sync.finish()
    assert set(report.streams) == {"images_a", "images_b"}
    assert report.streams["images_a"]["steps"] == 2
    # both mains advanced, PKs unique in each
    for t in (ta, tb):
        assert t.scan().count() > 0
        assert t.scan().groupBy("image_id").count().filter("count > 1").isEmpty()


def test_stream_failure_keeps_staging_and_fails_sync(spark, tmp_table_dir):
    ta = _mk_table(spark, os.path.join(tmp_table_dir, "a"))
    tb = _mk_table(spark, os.path.join(tmp_table_dir, "b"))
    sync = ConnectionSync(
        "conn-2", [StreamSpec("good", ta), StreamSpec("bad", tb)]
    )
    sync.start()
    good_batch = generate_update_batch(spark, 60, 10, num_partitions=2)
    # null PK poisons the bad stream's batch
    bad_batch = good_batch.withColumn(
        "image_id", F.lit(None).cast("string")
    )
    out = sync.write({"good": (good_batch, 0), "bad": (bad_batch, 0)})
    assert "error" in out["bad"]
    # a failed stream must not accept LATER checkpoints (resume staging
    # would otherwise hold ckpt 1 above an uncommitted ckpt 0)
    out2 = sync.write({"bad": (good_batch, 1)})
    assert out2["bad"] == {"skipped": "stream already failed"}
    with pytest.raises(KeyError):
        sync.write({"nope": (good_batch, 0)})
    pre_b = tb.scan().count()
    with pytest.raises(RuntimeError, match="bad"):
        sync.finish()
    # good stream swapped; bad stream's main untouched, staging kept
    assert ta.scan().filter(F.col("updated_at").isNotNull()).count() > 0
    assert tb.scan().count() == pre_b
    assert any(b.startswith("staging-conn-2-bad") for b in tb.branches())


def test_conflicting_specs_rejected(spark, tmp_table_dir):
    ta = _mk_table(spark, os.path.join(tmp_table_dir, "a"))
    with pytest.raises(ValueError, match="duplicate"):
        ConnectionSync("c", [StreamSpec("x", ta), StreamSpec("x", ta)])
    with pytest.raises(ValueError, match="share a table root"):
        ConnectionSync("c", [StreamSpec("x", ta), StreamSpec("y", ta)])
