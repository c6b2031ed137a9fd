"""Merge-on-read equality-delete path (S13 rowDelta analog,
BaseDeltaTaskWriter.java:86-98, S3DataLakeAggregate.kt:53-58) — MoR scans
must be byte-identical to CoW results on the testDedup matrix, write
O(batch) files, and fold cleanly via rewrite_deletes / compaction."""

import datetime as dt
import glob
import os

import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.compact import compact
from airbyte_spark.operators.deletes import rewrite_deletes
from airbyte_spark.operators.merge import merge_into

UTC = dt.timezone.utc

BASE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("caption", StringType()),
        StructField("v", IntegerType()),
        StructField("_airbyte_raw_id", StringType()),
        StructField("_airbyte_extracted_at", TimestampType()),
    ]
)

SRC_SCHEMA = StructType(
    list(BASE_SCHEMA.fields)
    + [
        StructField("updated_at", TimestampType()),
        StructField("_ab_cdc_deleted_at", TimestampType()),
    ]
)


def ts(day, sec=0):
    return dt.datetime(2026, 1, day, 0, 0, sec, tzinfo=UTC)


MATRIX = [
    ("dup", "v1", 1, "s1", ts(3), ts(3), None),
    ("dup", "v2", 2, "s2", ts(3, 1), ts(4), None),
    ("upd", "new caption", 2, "s3", ts(3), ts(5), None),
    ("stale", "MUST NOT APPEAR", 9, "s4", ts(3), ts(4), None),
    ("gone", None, 0, "s5", ts(3), ts(5), ts(6)),
    ("flash", "born", 1, "s6", ts(3), ts(3), None),
    ("flash", None, 0, "s7", ts(3, 1), ts(4), ts(6)),
    ("ghost", None, 0, "s8", ts(3), ts(4), ts(6)),
    ("new", "hello", 7, "s9", ts(3), ts(3), None),
]

EXPECTED = {
    "keep": ("untouched", 1),
    "upd": ("new caption", 2),
    "stale": ("current", 5),
    "dup": ("v2", 2),
    "new": ("hello", 7),
}


def _target(spark, root, mode):
    t = LakeTable.create(spark, root, BASE_SCHEMA, primary_key=["image_id"])
    rows = [
        ("keep", "untouched", 1, "r1", ts(1)),
        ("upd", "old caption", 1, "r2", ts(1)),
        ("stale", "current", 5, "r3", ts(1)),
        ("gone", "to be deleted", 1, "r4", ts(1)),
    ]
    t.append(spark.createDataFrame(rows, BASE_SCHEMA))
    seed = [
        ("upd", "old caption", 1, "r2b", ts(1), ts(2), None),
        ("stale", "current", 5, "r3b", ts(1), ts(10), None),
        ("gone", "to be deleted", 1, "r4b", ts(1), ts(2), None),
    ]
    merge_into(t, spark.createDataFrame(seed, SRC_SCHEMA), mode=mode)
    return t


def _state(t, **scan_kw):
    return {
        r["image_id"]: (r["caption"], r["v"])
        for r in t.scan(**scan_kw).collect()
    }


def test_mor_matrix_matches_cow(spark, tmp_table_dir):
    """Same source batches, two tables: MoR post-scan state must equal CoW
    state exactly — and the MoR merge must rewrite zero candidate files."""
    cow = _target(spark, os.path.join(tmp_table_dir, "cow"), "cow")
    mor = _target(spark, os.path.join(tmp_table_dir, "mor"), "mor")
    batch = spark.createDataFrame(MATRIX, SRC_SCHEMA)
    res_cow = merge_into(cow, batch, mode="cow")
    files_before = {e.path for e in mor.data_files()}
    res_mor = merge_into(mor, batch, mode="mor")
    assert _state(cow) == EXPECTED
    assert _state(mor) == EXPECTED
    # O(batch): no candidate data file was rewritten or removed
    assert res_mor.rewritten_files == 0
    assert files_before <= {e.path for e in mor.data_files()}
    assert mor.delete_files(), "MoR merge must add an equality-delete file"
    assert res_cow.snapshot.operation == res_mor.snapshot.operation == "merge"


def test_mor_snapshot_isolation(spark, tmp_table_dir):
    t = _target(spark, tmp_table_dir, "mor")
    pre_snap = t.current_snapshot_id()
    pre = _state(t, snapshot_id=pre_snap)
    merge_into(t, spark.createDataFrame(MATRIX, SRC_SCHEMA), mode="mor")
    assert _state(t, snapshot_id=pre_snap) == pre


def test_mor_idempotent_replay(spark, tmp_table_dir):
    t = _target(spark, tmp_table_dir, "mor")
    src = spark.createDataFrame(
        [("upd", "final", 3, "s1", ts(4), ts(8), None)], SRC_SCHEMA
    )
    merge_into(t, src, mode="mor")
    first = _state(t)
    merge_into(t, src, mode="mor")
    assert _state(t) == first


def test_rewrite_deletes_folds_and_gc_cleans(spark, tmp_table_dir):
    """rewrite_deletes: same scan state, zero remaining delete files, and
    expire+GC leaves exactly the reachable set on disk."""
    t = _target(spark, tmp_table_dir, "mor")
    merge_into(t, spark.createDataFrame(MATRIX, SRC_SCHEMA), mode="mor")
    assert t.delete_files()
    before = _state(t)
    res = rewrite_deletes(t)
    assert res.snapshot is not None and res.dropped_delete_files >= 1
    assert not t.delete_files()
    assert _state(t) == before == EXPECTED
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files()
    on_disk = set(
        glob.glob(os.path.join(t.data_dir, "**", "*.parquet"), recursive=True)
    )
    assert on_disk == t.reachable_files()
    assert _state(t) == EXPECTED


def test_rewrite_deletes_noop_without_deletes(spark, tmp_table_dir):
    t = _target(spark, tmp_table_dir, "cow")
    res = rewrite_deletes(t)
    assert res.snapshot is None and res.rewritten_files == 0


def test_compact_folds_deletes(spark, tmp_table_dir):
    """Compaction over a MoR table must not resurrect deleted/updated rows
    (packed files get a new sequence, so deletes are applied in-rewrite)."""
    t = _target(spark, tmp_table_dir, "mor")
    merge_into(t, spark.createDataFrame(MATRIX, SRC_SCHEMA), mode="mor")
    before = _state(t)
    res = compact(t, target_file_bytes=64 * 1024 * 1024)
    assert res.snapshot is not None
    assert _state(t) == before == EXPECTED


def test_mor_then_cow_interleave(spark, tmp_table_dir):
    """A CoW merge over a table with live delete files must apply them when
    rewriting candidates (no resurrection through the CoW path)."""
    t = _target(spark, tmp_table_dir, "mor")
    merge_into(t, spark.createDataFrame(MATRIX, SRC_SCHEMA), mode="mor")
    src = [("upd", "cow pass", 4, "x1", ts(5), ts(11), None)]
    merge_into(t, spark.createDataFrame(src, SRC_SCHEMA), mode="cow")
    got = _state(t)
    assert got["upd"] == ("cow pass", 4)
    assert "gone" not in got and "flash" not in got and "ghost" not in got


def test_mor_on_partitioned_table(spark, tmp_table_dir):
    """MoR over an identity-partitioned table: new data files land in
    partition dirs, delete files stay table-global, and partition-pruned
    scans still apply them."""
    from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images, generate_update_batch

    t = LakeTable.create(
        spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"],
        partition_by=["fmt"],
        properties={"write.target-file-size-bytes": 2 * 1024 * 1024},
    )
    for i in range(2):
        t.append(generate_images(spark, 60, id_offset=i * 60, num_partitions=2))
    full_before = t.scan().count()
    batch = generate_update_batch(spark, 120, 30, num_partitions=2)
    res = merge_into(t, batch, mode="mor")
    assert res.rewritten_files == 0 and t.delete_files()
    # PK uniqueness holds through the delete anti-join
    assert t.scan().groupBy("image_id").count().filter("count > 1").isEmpty()
    # partition-pruned scan: correct per-partition rows, no stale versions
    for fmt in ("png", "jpeg"):
        pruned = t.scan(partition_filter={"fmt": fmt})
        assert pruned.count() == t.scan().filter(f"fmt = '{fmt}'").count()
    assert full_before == 120
    upd_ids = {r["image_id"] for r in batch.select("image_id").distinct().collect()}
    live = t.scan().count()
    import pyspark.sql.functions as F2

    present = {
        r["image_id"]
        for r in t.scan().filter(F2.col("image_id").isin(list(upd_ids)))
        .select("image_id").collect()
    }
    # ids whose newest version is a delete are gone; others present
    from pyspark.sql import Window as W2

    w = W2.partitionBy("image_id").orderBy(
        F2.desc_nulls_last("updated_at"),
        F2.desc("_airbyte_extracted_at"),
        F2.desc("_airbyte_raw_id"),
    )
    newest = (
        batch.withColumn("_rn", F2.row_number().over(w)).filter("_rn = 1")
    )
    newest_deleted = {
        r["image_id"]
        for r in newest.filter(F2.col("_ab_cdc_deleted_at").isNotNull())
        .select("image_id").collect()
    }
    assert present == upd_ids - newest_deleted
    assert live == t.scan().select("image_id").distinct().count()


def test_merge_source_without_raw_id(spark, tmp_table_dir):
    """A source lacking _airbyte_raw_id must still merge (dedup order falls
    back to cursor + extracted_at) — regression for the unconditional
    raw_id tiebreak."""
    no_raw = StructType(
        [f for f in SRC_SCHEMA.fields if f.name != "_airbyte_raw_id"]
    )
    for mode in ("cow", "mor"):
        t = LakeTable.create(
            spark, os.path.join(tmp_table_dir, mode), BASE_SCHEMA,
            primary_key=["image_id"],
        )
        t.append(
            spark.createDataFrame([("a", "old", 1, "r1", ts(1))], BASE_SCHEMA)
        )
        src = [
            ("a", "newer", 2, ts(2), ts(5), None),
            ("a", "older", 3, ts(2), ts(4), None),
            ("b", "fresh", 1, ts(2), ts(2), None),
        ]
        res = merge_into(t, spark.createDataFrame(src, no_raw), mode=mode)
        assert res.deduped_rows == 2
        assert _state(t) == {"a": ("newer", 2), "b": ("fresh", 1)}


def test_numeric_pk_pruning(spark, tmp_table_dir):
    """Numeric PK: manifest pruning must compare numerically — a file with
    key range [1,9] must NOT be rewritten for batch key 10 (the
    lexicographic trap '10' < '9'), and merge must not TypeError."""
    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("caption", StringType()),
            StructField("_airbyte_raw_id", StringType()),
            StructField("_airbyte_extracted_at", TimestampType()),
        ]
    )
    src_schema = StructType(
        list(schema.fields) + [StructField("updated_at", TimestampType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["k"])
    t.append(
        spark.createDataFrame([(i, f"c{i}", f"r{i}", ts(1)) for i in range(1, 10)], schema)
    )
    t.append(
        spark.createDataFrame([(100, "c100", "r100", ts(1))], schema)
    )
    before = {e.path for e in t.data_files()}
    src = [(10, "ten", "s1", ts(2), ts(2)), (100, "hundred", "s2", ts(2), ts(2))]
    res = merge_into(t, spark.createDataFrame(src, src_schema))
    after = {e.path for e in t.data_files()}
    # the [1,9] file range does not contain 10 or 100 -> survives untouched
    assert before & after, "low-range file must not be rewritten"
    assert res.rewritten_files == 1
    got = {r["k"]: r["caption"] for r in t.scan().collect()}
    assert got[10] == "ten" and got[100] == "hundred" and got[1] == "c1"


def test_mor_with_escaped_partition_values(spark, tmp_table_dir):
    """Partition values containing ':' and ' ' are percent-escaped in dir
    names and re-encoded by input_file_name(); the file-tail maps carrying
    _mor_seq/_del_seq must decode before matching or every row's sequence
    is NULL and upserted rows silently vanish (round-2 review repro)."""
    import datetime as dt

    from pyspark.sql.types import TimestampType

    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("batch_ts", StringType()),
            StructField("v", IntegerType()),
            StructField("_airbyte_raw_id", StringType()),
            StructField("_airbyte_extracted_at", TimestampType()),
            StructField("updated_at", TimestampType()),
        ]
    )
    ts0 = dt.datetime(2026, 6, 1)
    t = LakeTable.create(
        spark, tmp_table_dir, schema, primary_key=["id"],
        partition_by=["batch_ts"],
    )
    parts = ["2026-04-01 10:00:00", "2026-04-02 11:30:00"]
    base = [
        (f"k{i}", parts[i % 2], 0, f"r{i}", ts0, ts0) for i in range(20)
    ]
    t.append(spark.createDataFrame(base, schema))
    # two writes -> same basenames under sibling escaped partition dirs ->
    # the tail map needs depth >= 3 and URL-decoded matching
    upd = [
        (f"k{i}", parts[i % 2], 1, f"s{i}", ts0, ts0 + dt.timedelta(days=1))
        for i in range(0, 20, 2)
    ]
    merge_into(t, spark.createDataFrame(upd, schema), mode="mor")
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert len(got) == 20, "upserted rows must not vanish"
    for i in range(20):
        assert got[f"k{i}"] == (1 if i % 2 == 0 else 0)
    # fold works over escaped dirs too
    from airbyte_spark.operators.deletes import rewrite_deletes

    rewrite_deletes(t)
    assert not t.delete_files()
    assert {r["id"]: r["v"] for r in t.scan().collect()} == got


def test_string_typed_source_pk_against_long_table(spark, tmp_table_dir):
    """A source carrying the PK as STRING against a long-keyed table must
    prune in the table's type ('10' < '9' lexicographic trap) and must not
    duplicate PKs (third-review finding)."""
    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("caption", StringType()),
            StructField("_airbyte_raw_id", StringType()),
            StructField("_airbyte_extracted_at", TimestampType()),
        ]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["k"])
    t.append(
        spark.createDataFrame(
            [(i, f"c{i}", f"r{i}", ts(1)) for i in range(1, 13)], schema
        )
    )
    src_schema = StructType(
        [
            StructField("k", StringType(), False),  # string-typed source!
            StructField("caption", StringType()),
            StructField("_airbyte_raw_id", StringType()),
            StructField("_airbyte_extracted_at", TimestampType()),
            StructField("updated_at", TimestampType()),
        ]
    )
    src = [("10", "TEN-updated", "s1", ts(2), ts(2))]
    for mode in ("cow", "mor"):
        merge_into(t, spark.createDataFrame(src, src_schema), mode=mode)
        got = {r["k"]: r["caption"] for r in t.scan().collect()}
        assert len(got) == 12, "string-keyed source must not duplicate PKs"
        assert got[10] == "TEN-updated"


def test_merge_table_without_airbyte_meta(spark, tmp_table_dir):
    """A plain table (no _airbyte_* columns at all) merges on its cursor in
    both modes; equal cursors resolve to the source (third-review finding:
    previously CoW crashed on the unresolved meta column and MoR silently
    kept the target)."""
    schema = StructType(
        [
            StructField("k", StringType(), False),
            StructField("v", IntegerType()),
            StructField("updated_at", TimestampType()),
        ]
    )
    for mode in ("cow", "mor"):
        root = os.path.join(tmp_table_dir, mode)
        t = LakeTable.create(spark, root, schema, primary_key=["k"])
        t.append(
            spark.createDataFrame(
                [("a", 1, ts(1)), ("b", 1, ts(5)), ("c", 1, ts(1))], schema
            )
        )
        src = [
            ("a", 2, ts(2)),  # newer cursor -> wins
            ("b", 9, ts(4)),  # older cursor -> target kept
            ("c", 3, ts(1)),  # EQUAL cursor -> source wins (tie rule)
            ("d", 7, ts(2)),  # insert
        ]
        merge_into(t, spark.createDataFrame(src, schema), mode=mode)
        got = {r["k"]: r["v"] for r in t.scan().collect()}
        assert got == {"a": 2, "b": 1, "c": 3, "d": 7}, mode


def test_mor_delete_debt_auto_fold(spark, tmp_table_dir):
    """Delete-debt policy: past `merge.mor.max-delete-eras` live delete
    eras, the MoR merge folds the debt itself (rewrite_deletes) — an
    unattended micro-batch loop keeps a bounded number of delete eras in
    every scan plan without a manual maintenance call."""
    import datetime as dtm

    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("v", IntegerType()),
            StructField("updated_at", TimestampType()),
        ]
    )
    ts0 = dtm.datetime(2026, 5, 1)
    t = LakeTable.create(
        spark, tmp_table_dir, schema, primary_key=["id"],
        properties={"merge.mor.max-delete-eras": "3"},
    )
    t.append(
        spark.createDataFrame([(f"k{i}", 0, ts0) for i in range(30)], schema)
    )
    for b in range(9):
        src = spark.createDataFrame(
            [(f"k{(b * 5 + j) % 30}", b + 1, ts0 + dtm.timedelta(days=b + 1))
             for j in range(4)],
            schema,
        )
        merge_into(t, src, mode="mor")
        eras = {d.sequence for d in t.delete_files()}
        assert len(eras) <= 3, f"batch {b}: {len(eras)} delete eras live"
    # folds never lost an update: latest version per key
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert len(got) == 30 and max(got.values()) == 9
    # debt was actually folded at least once (9 batches, cap 3)
    assert any(
        s.operation == "rewrite-deletes"
        for s in (t.snapshot(sid) for sid in _ancestry(t))
    )


def _ancestry(t):
    sid = t.current_snapshot_id()
    while sid is not None:
        yield sid
        snap = t.snapshot(sid)
        sid = snap.parent_id


def test_merge_meta_less_source_with_long_cursor(spark, tmp_table_dir):
    """MoR/CoW parity for a meta-less source whose cursor is LONG-typed
    (r2 verdict "What's wrong #2": the MoR missing-column backfill cast
    every absent resolve column to timestamp; the null backfill must take
    the TABLE's column type instead)."""
    schema = StructType(
        [
            StructField("k", StringType(), False),
            StructField("v", IntegerType()),
            StructField("ver", LongType()),  # non-timestamp cursor
        ]
    )
    for mode in ("cow", "mor"):
        root = os.path.join(tmp_table_dir, f"longcur-{mode}")
        t = LakeTable.create(spark, root, schema, primary_key=["k"])
        t.append(
            spark.createDataFrame([("a", 1, 10), ("b", 1, 50), ("c", 1, 10)], schema)
        )
        src = [
            ("a", 2, 20),  # newer cursor -> wins
            ("b", 9, 40),  # older cursor -> target kept
            ("c", 3, 10),  # equal cursor -> source wins (tie rule)
            ("d", 7, 20),  # insert
        ]
        merge_into(t, spark.createDataFrame(src, schema), cursor_col="ver", mode=mode)
        # second MoR batch exercises the live-delete read path on the
        # long-cursor table too
        merge_into(
            t,
            spark.createDataFrame([("d", 8, 30)], schema),
            cursor_col="ver",
            mode=mode,
        )
        got = {r["k"]: r["v"] for r in t.scan().collect()}
        assert got == {"a": 2, "b": 1, "c": 3, "d": 8}, mode


def test_colliding_raw_ids_resolve_to_the_slim_winner(spark, tmp_table_dir):
    """Two DIFFERENT records sharing one _airbyte_raw_id (a source
    violating the raw-id-per-record contract): the payload fetch must
    return exactly the dedup winner's row, not an arbitrary twin —
    regression for the CoW/MoR divergence seen at 96k scale (the stale
    CDC-delete twin's payload could land instead of the newer upsert)."""
    for mode in ("cow", "mor"):
        root = os.path.join(tmp_table_dir, f"collide-{mode}")
        t = LakeTable.create(spark, root, BASE_SCHEMA, primary_key=["image_id"])
        t.append(spark.createDataFrame(
            [("a", "base", 0, "r0", ts(1)), ("b", "base", 0, "r0b", ts(1))],
            BASE_SCHEMA,
        ))
        batch = [
            # key a: delete twin OLDER, upsert twin NEWER -> upsert wins
            ("a", None, 0, "SHARED-a", ts(2), ts(3), ts(9)),
            ("a", "winner", 1, "SHARED-a", ts(2, 1), ts(4), None),
            # key b: upsert twin OLDER, delete twin NEWER -> delete wins
            ("b", "loser", 1, "SHARED-b", ts(2), ts(3), None),
            ("b", None, 0, "SHARED-b", ts(2, 1), ts(4), ts(9)),
        ]
        merge_into(t, spark.createDataFrame(batch, SRC_SCHEMA), mode=mode)
        assert _state(t) == {"a": ("winner", 1)}, f"mode={mode}"


def test_soft_delete_matrix_matches_cow(spark, tmp_table_dir):
    """CdcDeletionMode.SOFT_DELETE (DatabricksSqlGenerator.kt:140; behavior
    pinned by BasicFunctionalityIntegrationTest.kt:260-276,3251-3262): the
    winning deletion record upserts WHOLESALE — nulled payload kept,
    _ab_cdc_deleted_at retained — and a delete for an unseen PK INSERTS
    the tombstone instead of vanishing. CoW and MoR must agree exactly."""
    cow = _target(spark, os.path.join(tmp_table_dir, "cow"), "cow")
    mor = _target(spark, os.path.join(tmp_table_dir, "mor"), "mor")
    batch = spark.createDataFrame(MATRIX, SRC_SCHEMA)
    merge_into(cow, batch, mode="cow", cdc_mode="soft")
    res = merge_into(mor, batch, mode="mor", cdc_mode="soft")
    assert res.rewritten_files == 0
    expected = dict(
        EXPECTED, gone=(None, 0), flash=(None, 0), ghost=(None, 0)
    )
    assert _state(cow) == expected
    assert _state(mor) == expected
    for t in (cow, mor):
        tombstones = {
            r["image_id"]
            for r in t.scan().collect()
            if r["_ab_cdc_deleted_at"] is not None
        }
        assert tombstones == {"gone", "flash", "ghost"}


def test_soft_delete_keeps_stale_tombstone_out(spark, tmp_table_dir):
    """Soft mode still resolves by cursor: a STALE deletion record loses
    to the newer target row — no tombstone, row unchanged."""
    t = _target(spark, tmp_table_dir, "mor")
    stale_del = [("stale", None, 0, "sx", ts(3), ts(4), ts(6))]
    merge_into(
        t, spark.createDataFrame(stale_del, SRC_SCHEMA),
        mode="mor", cdc_mode="soft",
    )
    assert _state(t)["stale"] == ("current", 5)


def test_cdc_mode_validation(spark, tmp_table_dir):
    t = _target(spark, tmp_table_dir, "cow")
    with pytest.raises(ValueError, match="cdc_mode"):
        merge_into(
            t, spark.createDataFrame(MATRIX, SRC_SCHEMA), cdc_mode="nope"
        )
