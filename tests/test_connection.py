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


def test_global_state_kill_resume_no_dup_no_loss(spark, tmp_table_dir):
    """GLOBAL state (airbyte-protocol.md:516): one ordered checkpoint
    covers all streams. Kill mid-checkpoint (stream a committed its batch,
    stream b failed), resume in a fresh ConnectionSync: the half-finished
    global checkpoint re-runs — a's sub-batch skips via its own ledger,
    b's applies — and committed checkpoints replay as pure no-ops."""

    def specs():
        return [StreamSpec("sa", ta), StreamSpec("sb", tb, merge_mode="mor")]

    ta = _mk_table(spark, os.path.join(tmp_table_dir, "a"))
    tb = _mk_table(spark, os.path.join(tmp_table_dir, "b"))
    sync = ConnectionSync("gc-1", specs(), state_mode="global")
    sync.start()
    b_a0 = generate_update_batch(spark, 60, 15, seed=10, num_partitions=2)
    b_b0 = generate_update_batch(spark, 60, 15, seed=20, num_partitions=2)
    out0 = sync.write_global({"sa": b_a0, "sb": b_b0}, 0)
    assert all("error" not in m for m in out0.values())
    # checkpoint 1: stream b's batch is poisoned -> the WHOLE global
    # checkpoint must not commit, and teardown keeps every staging branch
    b_a1 = generate_update_batch(spark, 60, 15, seed=11, num_partitions=2)
    b_b1_bad = generate_update_batch(spark, 60, 15, seed=21, num_partitions=2)
    b_b1_bad = b_b1_bad.withColumn("image_id", F.lit(None).cast("string"))
    with pytest.raises(RuntimeError, match="global checkpoint 1 incomplete"):
        sync.write_global({"sa": b_a1, "sb": b_b1_bad}, 1)
    with pytest.raises(RuntimeError, match="all staging branches kept"):
        sync.finish()
    assert any(b.startswith("staging-gc-1") for b in ta.branches())
    pre_a, pre_b = ta.scan().count(), tb.scan().count()

    # resume: fresh process (new ConnectionSync, same sync id + ledgers)
    resumed = ConnectionSync("gc-1", specs(), state_mode="global")
    resumed.start()
    # replaying committed checkpoint 0 is a wholesale no-op
    re0 = resumed.write_global({"sa": b_a0, "sb": b_b0}, 0)
    assert all("skipped" in m for m in re0.values())
    # replaying checkpoint 1 with the fixed batch: sa's already-committed
    # sub-batch skips via its stream ledger, sb's applies
    b_b1 = generate_update_batch(spark, 60, 15, seed=21, num_partitions=2)
    out1 = resumed.write_global({"sa": b_a1, "sb": b_b1}, 1)
    assert all("error" not in m for m in out1.values())
    report = resumed.finish()
    assert set(report.streams) == {"sa", "sb"}
    # no dup (unique PKs), no loss (mains advanced past the kill point)
    for t in (ta, tb):
        assert t.scan().groupBy("image_id").count().filter("count > 1").isEmpty()
    assert ta.scan().count() >= pre_a and tb.scan().count() >= pre_b
    # ledgers agree: two committed global checkpoints
    assert resumed._global_ckpt.last_seq() == 1


def test_conflicting_specs_rejected(spark, tmp_table_dir):
    ta = _mk_table(spark, os.path.join(tmp_table_dir, "a"))
    with pytest.raises(ValueError, match="duplicate"):
        ConnectionSync("c", [StreamSpec("x", ta), StreamSpec("x", ta)])
    with pytest.raises(ValueError, match="share a table root"):
        ConnectionSync("c", [StreamSpec("x", ta), StreamSpec("y", ta)])


def test_stream_status_trace_events(spark, tmp_table_dir):
    """STREAM_STATUS lifecycle (StreamStatusUtils.kt): STARTED ->
    RUNNING on first record -> COMPLETE; failed stream -> INCOMPLETE."""
    ta = _mk_table(spark, os.path.join(tmp_table_dir, "a"))
    tb = _mk_table(spark, os.path.join(tmp_table_dir, "b"))
    sync = ConnectionSync("st-1", [StreamSpec("ok", ta), StreamSpec("bad", tb)])
    sync.start()
    good = generate_update_batch(spark, 60, 10, num_partitions=2)
    bad = good.withColumn("image_id", F.lit(None).cast("string"))
    sync.write({"ok": (good, 0), "bad": (bad, 0)})
    sync.write({"ok": (good, 1)})  # RUNNING must not repeat
    with pytest.raises(RuntimeError):
        sync.finish()
    seq = [
        (e["stream"], e["status"])
        for e in sync.status_events
        if e.get("type") == "STREAM_STATUS"  # ERROR traces live alongside
    ]
    assert seq.count(("ok", "RUNNING")) == 1
    assert [s for st, s in seq if st == "ok"] == ["STARTED", "RUNNING", "COMPLETE"]
    assert [s for st, s in seq if st == "bad"] == ["STARTED", "INCOMPLETE"]


def test_sync_applies_field_selection_and_mappers(spark, tmp_table_dir):
    """Catalog transforms run inside the lifecycle: selection prunes,
    mappers hash/filter, PK+cursor are protected."""
    from pyspark.sql import types as T

    from airbyte_spark.functions.mappers import (
        HashingMapper, RowFilteringMapper, equal, not_,
    )

    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("email_hashed", T.StringType()),
        T.StructField("tier", T.StringType()),
        T.StructField("updated_at", T.TimestampType()),
    ])
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "m"), schema, primary_key=["image_id"]
    )
    batch = spark.createDataFrame(
        [("i1", "a@x.io", "free", "junk1"), ("i2", "b@x.io", "paid", "junk2")],
        "image_id string, email string, tier string, secret string",
    ).withColumn("updated_at", F.current_timestamp())

    sync = ConnectionSync(
        "map-1",
        [StreamSpec(
            "users", t, mode="append", cursor_col="updated_at",
            selected_fields=(("image_id",), ("email",), ("tier",), ("updated_at",)),
            mappers=(
                HashingMapper("email", method="SHA-256"),
                RowFilteringMapper(not_(equal("tier", "free"))),
            ),
        )],
    )
    sync.start()
    out = sync.write({"users": (batch, 0)})
    assert "error" not in out["users"]
    sync.finish()
    rows = t.scan().collect()
    assert [r["image_id"] for r in rows] == ["i2"]  # free-tier filtered
    import hashlib
    assert rows[0]["email_hashed"] == hashlib.sha256(b"b@x.io").hexdigest()
    assert "secret" not in t.scan().columns  # de-selected, never written

    # a mapper on the PK fails the stream (protected)
    sync2 = ConnectionSync(
        "map-2",
        [StreamSpec(
            "users", LakeTable.create(
                spark, os.path.join(tmp_table_dir, "m2"), schema,
                primary_key=["image_id"],
            ),
            mode="append",
            mappers=(HashingMapper("image_id", method="MD5"),),
        )],
    )
    sync2.start()
    out2 = sync2.write({"users": (batch, 0)})
    assert "protected" in out2["users"]["error"]


def test_failed_stream_emits_typed_error_trace(spark, tmp_table_dir):
    """Protocol trace section: a stream failure records an ERROR trace
    with a failureType (config/system/transient) alongside the
    INCOMPLETE stream status, so an operator can classify the failure
    from the ledger alone."""
    ta = _mk_table(spark, os.path.join(tmp_table_dir, "a"))
    sync = ConnectionSync("conn-err", [StreamSpec("s", ta)])
    sync.start()
    bad = generate_update_batch(spark, 60, 10, num_partitions=2).withColumn(
        "image_id", F.lit(None).cast("string")
    )
    sync.write({"s": (bad, 0)})
    with pytest.raises(RuntimeError):
        sync.finish()
    errors = [e for e in sync.status_events if e.get("type") == "ERROR"]
    assert len(errors) == 1
    err = errors[0]
    # NullPrimaryKeyError is the user's data/config problem, not a bug
    assert err["failure_type"] == "config_error"
    assert err["exception_class"] == "NullPrimaryKeyError"
    assert err["stream"] == "s" and err["message"]
    assert err["stack_first_line"].startswith("File ")
    statuses = [
        (e["stream"], e["status"])
        for e in sync.status_events
        if e.get("type") == "STREAM_STATUS"
    ]
    assert statuses == [("s", "STARTED"), ("s", "INCOMPLETE")]


def test_failure_classification():
    from airbyte_spark.functions.mappers import MapperError
    from airbyte_spark.lake.table import CommitConflict
    from airbyte_spark.operators.merge import NullPrimaryKeyError
    from airbyte_spark.streaming.traces import classify_failure

    assert classify_failure(CommitConflict("x")) == "transient_error"
    assert classify_failure(TimeoutError()) == "transient_error"
    assert classify_failure(ValueError("bad conf")) == "config_error"
    assert classify_failure(MapperError("bad key")) == "config_error"
    assert classify_failure(NullPrimaryKeyError("nulls")) == "config_error"
    assert classify_failure(RuntimeError("boom")) == "system_error"
    assert classify_failure(ZeroDivisionError()) == "system_error"


def test_check_failure_carries_error_trace(spark, tmp_table_dir):
    from airbyte_spark.lake.check import check_destination

    # an unwritable lake root -> FAILED with a typed trace
    bad_root = os.path.join(tmp_table_dir, "file-not-dir")
    with open(bad_root, "w") as f:
        f.write("x")
    res = check_destination(spark, bad_root)
    assert res["status"] == "FAILED"
    assert res["trace"]["failure_type"] in (
        "config_error", "system_error"
    )
    assert res["trace"]["exception_class"]
