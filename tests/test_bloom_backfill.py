"""Bloom backfill (LakeTable.backfill_pk_blooms): files written outside
a JVM context — the streaming sink's Python DataSource workers can't run
Spark's xxhash64, so their files land without PK bloom sidecars — get
their sidecars stamped by the maintenance `attach-blooms` stage via a
METADATA-ONLY commit (same paths, same original sequence). Safety
invariants pinned here: zero false negatives end-to-end, equality-delete
applicability unchanged, changelog emits nothing, steady-state no-op.
"""

import os

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake import bloom as bl
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import _candidate_entries
from airbyte_spark.sources.lakestream import LakeStreamWriter

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("v", IntegerType()),
    ]
)


def _sink_batch(t, root, ids, batch_id, stream_id="q1"):
    w = LakeStreamWriter(
        root=root, branch="main", stream_id=stream_id,
        stats_columns=["id"], schema_id=t.current_schema_id,
    )
    batch = pa.RecordBatch.from_pydict(
        {"id": list(ids), "v": list(range(len(ids)))}
    )
    w.commit([w.write(iter([batch]))], batchId=batch_id)


def test_backfill_stamps_sink_files_metadata_only(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    _sink_batch(t, tmp_table_dir, [f"e{i}" for i in range(0, 40, 2)], 0)
    _sink_batch(t, tmp_table_dir, [f"o{i}" for i in range(1, 40, 2)], 1)
    before = {e.path: e for e in t.data_files()}
    assert before and all(e.bloom is None for e in before.values())
    pre_rows = {r["id"] for r in t.scan().collect()}
    pre_snap = t.snapshot().snapshot_id

    assert t.backfill_pk_blooms() == len(before)

    after = {e.path: e for e in t.data_files()}
    # same file set, same original sequence (eq-delete applicability),
    # bloom metadata + sidecar now present
    assert set(after) == set(before)
    for p, e in after.items():
        assert e.sequence == before[p].sequence
        assert e.bloom and e.bloom["col"] == "id"
        assert os.path.exists(p + bl.BLOOM_SUFFIX)
    assert {r["id"] for r in t.scan().collect()} == pre_rows
    snap = t.snapshot()
    assert snap.operation == "attach-blooms"
    # row-set-invariant: the changelog emits nothing for the commit
    assert t.scan_changelog(pre_snap).count() == 0
    # steady state: metadata-only no-op, no new snapshot
    assert t.backfill_pk_blooms() == 0
    assert t.snapshot().snapshot_id == snap.snapshot_id


def test_backfilled_blooms_honor_the_hash_contract(spark, tmp_table_dir):
    """Zero false negatives: probing a backfilled bitmap with Spark's
    xxhash64 of the file's own keys must hit every time — and membership
    pruning (the point of the sidecar) works through the merge planner."""
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    _sink_batch(t, tmp_table_dir, [f"e{i}" for i in range(0, 80, 2)], 0)
    _sink_batch(t, tmp_table_dir, [f"o{i}" for i in range(1, 80, 2)], 1)
    t.backfill_pk_blooms()
    entries = t.data_files()
    for e in entries:
        hs = np.array(
            [
                r["h"]
                for r in spark.read.parquet(e.path)
                .select(F.xxhash64("id").alias("h"))
                .collect()
            ],
            dtype=np.int64,
        ).view(np.uint64)
        bm = bl.read_bitmap_sidecar(e.path + bl.BLOOM_SUFFIX)
        assert bl.hits_mask(bm, hs, int(e.bloom["k"])).all()
    # both files span the full lexicographic "id" range poorly enough?
    # No — e*/o* ranges are disjoint, so craft keys hitting only evens
    # and assert the odd file is pruned by MEMBERSHIP where present.
    even = next(
        e for e in entries
        if spark.read.parquet(e.path).filter(F.col("id") == "e2").count()
    )
    src = spark.createDataFrame([("e2",), ("e10",)], "id string")
    cands = _candidate_entries(t, src, entries, "id")
    assert even.path in {c.path for c in cands}


def test_backfill_keeps_delete_applicability(spark, tmp_table_dir):
    """An equality delete sequenced AFTER the sink append must still mask
    the row after backfill (the re-added entry keeps its ORIGINAL
    sequence; a naive re-add with a new sequence would resurrect it)."""
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    _sink_batch(t, tmp_table_dir, ["a", "b", "c"], 0)
    dels = t.write_delete_files(
        spark.createDataFrame([("b",)], "id string")
    )
    t.commit("delete", dels)
    assert {r["id"] for r in t.scan().collect()} == {"a", "c"}
    assert t.backfill_pk_blooms() == 1
    assert {r["id"] for r in t.scan().collect()} == {"a", "c"}


def test_backfill_respects_disable_and_no_pk(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, primary_key=["id"],
        properties={"write.pk-bloom.enabled": "false"},
    )
    _sink_batch(t, tmp_table_dir, ["a", "b"], 0)
    assert t.backfill_pk_blooms() == 0
    assert all(e.bloom is None for e in t.data_files())


def test_backfill_skips_files_predating_the_pk_column(spark, tmp_table_dir):
    """A file written before the (new) PK column existed must be SKIPPED:
    hashing its null-padded column would build a bitmap of the null hash
    only, and a later probe for a real key would falsely prune the file
    (row loss). The guard keys off the entry's recorded schema."""
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    _sink_batch(t, tmp_table_dir, ["a", "b"], 0)
    wide = StructType(
        list(SCHEMA.fields) + [StructField("id2", StringType(), True)]
    )
    t.evolve_schema(wide, new_primary_key=["id2"])
    old_paths = {e.path for e in t.data_files()}
    t.append(
        spark.createDataFrame([("c", 3, "k1"), ("d", 4, "k2")], wide)
    )
    # the post-evolution append attached blooms on its own (JVM path);
    # only the pre-evolution sink file is bloom-less, and its schema
    # lacks id2 -> backfill must refuse it
    assert t.backfill_pk_blooms() == 0
    for e in t.data_files():
        if e.path in old_paths:
            assert e.bloom is None
            assert not os.path.exists(e.path + bl.BLOOM_SUFFIX)


def test_maintenance_runs_backfill_stage(spark, tmp_table_dir):
    from airbyte_spark.operators.maintenance import run_maintenance

    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    _sink_batch(t, tmp_table_dir, [f"r{i}" for i in range(10)], 0)
    rep = run_maintenance(
        t, "mb-1", merge_source=None, cursor_col=None,
        cluster_dims=["v"], curve="zorder", use_staging=False,
    )
    assert "attach-blooms" in rep.stages
    # the cluster stage's first full pass may have rewritten the sink
    # file (JVM write path attaches blooms itself); either way every
    # live file ends the cycle bloom-stamped
    assert all(e.bloom for e in t.data_files())
