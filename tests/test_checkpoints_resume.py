"""Checkpoint ledger, ordered commit, interrupted-job resume.

Models StateStore ordered-commit (StateStore.kt:69-116), out-of-order
state tests (BasicFunctionalityIntegrationTest.kt:392-503), interrupted
truncate recovery (:2282,2455) and resumability.md:14-34."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airbyte_spark.checkpoints import (
    JobCheckpointer,
    OutOfOrderStepError,
    histogram_metrics,
)
from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images, generate_update_batch
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.maintenance import run_maintenance
from airbyte_spark.streaming.loader import StreamLoader


def test_ordered_commit_and_skip(tmp_table_dir):
    ck = JobCheckpointer(tmp_table_dir, "j1")
    calls = []
    ck.run_step(0, "a", lambda: calls.append("a") or {"rows": 1})
    with pytest.raises(OutOfOrderStepError):
        ck.run_step(2, "c", lambda: {"rows": 1})
    ck.run_step(1, "b", lambda: calls.append("b") or {"rows": 2})
    # replay: fn must NOT run again
    m, ran = ck.run_step(0, "a", lambda: calls.append("a2") or {"rows": 99})
    assert not ran and m == {"rows": 1} and calls == ["a", "b"]
    assert ck.cumulative_stats()["rows"] == 3


def test_partition_histogram(spark):
    df = generate_images(spark, 64, num_partitions=4)
    m = histogram_metrics(df)
    assert m["rows"] == 64
    assert m["partitions"] == 4
    assert sum(m["histogram"].values()) == 64
    assert m["bytes"] > 0


def test_stream_loader_resume_no_dup_no_loss(spark, tmp_table_dir):
    """Kill the sync between checkpoints; re-run all batches; assert the
    final table equals the single-run golden (no duplicate, no loss)."""
    t = LakeTable.create(spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"])
    t.append(generate_images(spark, 100, num_partitions=4))

    batches = [
        generate_update_batch(spark, 100, 40, seed=50 + i, sync_id=10 + i,
                              num_partitions=2)
        for i in range(3)
    ]

    # run 1: crashes after committing batch 0 and 1
    loader = StreamLoader(t, sync_id="sync-A")
    loader.start()
    loader.write(batches[0], 0)
    loader.write(batches[1], 1)
    # -- crash here (no finish) --

    # run 2 (resume): same sync id, replays all checkpoints
    loader2 = StreamLoader(t, sync_id="sync-A")
    loader2.start()
    m0 = loader2.write(batches[0], 0)  # skipped: ledger hit
    m1 = loader2.write(batches[1], 1)
    m2 = loader2.write(batches[2], 2)
    stats = loader2.finish()
    assert stats["steps"] == 3

    # golden: a fresh single run of the same batches on a fresh table
    g = LakeTable.create(spark, tmp_table_dir + "-golden", IMAGES_SCHEMA,
                         primary_key=["image_id"])
    g.append(generate_images(spark, 100, num_partitions=4))
    gl = StreamLoader(g, sync_id="sync-G")
    gl.start()
    for i, b in enumerate(batches):
        gl.write(b, i)
    gl.finish()

    def state(tbl):
        return {
            r["image_id"]: (r["caption"], r["phash"])
            for r in tbl.scan().select("image_id", "caption", "phash").collect()
        }

    assert state(t) == state(g)


def test_truncate_refresh_generation_gc(spark, tmp_table_dir):
    """testTruncateRefresh analog (:2042): after a truncate sync at
    generation 1, only generation-1 files remain visible."""
    t = LakeTable.create(spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"])
    t.append(generate_images(spark, 50, generation_id=0, num_partitions=2))

    loader = StreamLoader(t, sync_id="sync-T", mode="truncate", generation_id=1)
    loader.start()
    fresh = generate_images(spark, 30, seed=99, generation_id=1, num_partitions=2)
    loader.write(fresh, 0)
    loader.finish()

    entries = t.data_files()
    assert all(e.generation_id == 1 for e in entries)
    assert t.scan().count() == 30


def test_maintenance_pipeline_resumes(spark, tmp_table_dir):
    """Full pipeline killed mid-flight: second run skips committed stages
    and converges to the same state."""
    t = LakeTable.create(
        spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"],
        properties={"write.target-file-size-bytes": 2 * 1024 * 1024},
    )
    for i in range(4):
        t.append(generate_images(spark, 40, id_offset=i * 40, num_partitions=2))
    src = generate_update_batch(spark, 160, 60, num_partitions=2)

    rep1 = run_maintenance(t, "job-1", merge_source=src)
    assert {"start", "merge", "compact", "cluster", "rewrite-manifests",
            "swap", "expire-gc"} <= set(rep1.stages)
    assert all(not s.get("resumed") for s in rep1.stages.values())

    chk = t.scan().select(
        F.expr("bit_xor(xxhash64(image_id, caption))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()

    # replay the whole job: every stage must be skipped, state unchanged
    rep2 = run_maintenance(t, "job-1", merge_source=src)
    assert all(s.get("resumed") for s in rep2.stages.values())
    chk2 = t.scan().select(
        F.expr("bit_xor(xxhash64(image_id, caption))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert (chk["n"], chk["h"]) == (chk2["n"], chk2["h"])


def test_stream_loader_mor_matches_cow(spark, tmp_table_dir):
    """A full sync lifecycle in merge_mode='mor' lands the same final main
    state as 'cow' — delete files live on staging until swap, and readers
    of main see them applied only after the atomic branch replace."""
    batches = [
        generate_update_batch(spark, 100, 40, seed=70 + i, sync_id=20 + i,
                              num_partitions=2)
        for i in range(2)
    ]

    def run(mode, root):
        t = LakeTable.create(spark, root, IMAGES_SCHEMA, primary_key=["image_id"])
        t.append(generate_images(spark, 100, num_partitions=4))
        loader = StreamLoader(t, sync_id=f"sync-{mode}", merge_mode=mode)
        loader.start()
        pre_main = t.scan().count()
        for i, b in enumerate(batches):
            loader.write(b, i)
        # snapshot isolation: main unchanged until the swap
        assert t.scan().count() == pre_main
        loader.finish()
        return t

    cow = run("cow", tmp_table_dir + "-cow")
    mor = run("mor", tmp_table_dir + "-mor")
    assert mor.delete_files(), "MoR sync must carry delete files"

    def state(tbl):
        return {
            r["image_id"]: (r["caption"], r["phash"])
            for r in tbl.scan().select("image_id", "caption", "phash").collect()
        }

    assert state(cow) == state(mor)
