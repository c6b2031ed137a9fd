"""Row-level changelog scan (Iceberg changelog / Delta CDF analog):
inserts and deletes between two snapshots, with updates appearing as
delete+insert pairs; maintenance snapshots emit nothing (their row-set
invariance is pinned by the maintenance tests)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import merge_into
from airbyte_spark.operators.posdeletes import delete_where

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("grp", StringType()),
        StructField("v", LongType()),
    ]
)


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, primary_key=["id"])
    df = spark.range(0, 30).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
        (F.col("id") * 100).alias("v"),
    )
    for lo in (0, 10, 20):
        t.append(df.filter((F.col("id") >= lo) & (F.col("id") < lo + 10)).coalesce(1))
    return t


def _log(t, frm):
    return sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in t.scan_changelog(frm).collect()
    )


def test_append_changelog(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    frm = t.current_snapshot_id()
    t.append(
        spark.createDataFrame([(100, "even", 1), (101, "odd", 2)], SCHEMA)
    )
    assert _log(t, frm) == [("insert", 100, 1), ("insert", 101, 2)]


def test_mor_merge_changelog_update_is_delete_plus_insert(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    frm = t.current_snapshot_id()
    batch = spark.createDataFrame(
        [(4, "even", 99999, None), (14, "even", 99999, "del"), (500, "odd", 1, None)],
        "id long, grp string, v long, _ab_cdc_deleted_at string",
    )
    merge_into(t, batch, cursor_col="v", cdc_col="_ab_cdc_deleted_at", mode="mor")
    got = _log(t, frm)
    assert got == [
        ("delete", 4, 400),      # pre-image of the update
        ("delete", 14, 1400),    # CDC hard delete
        ("insert", 4, 99999),    # post-image
        ("insert", 500, 1),      # fresh key: insert only
    ]


def test_delete_where_changelog_emits_pre_images(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    delete_where(t, "id = 7")  # older tombstone: 7 is already gone
    frm = t.current_snapshot_id()
    res = delete_where(t, "id in (5, 7, 15) or id >= 20")
    assert res.removed_files == 1  # the whole 20-29 file
    got = _log(t, frm)
    # 7 was not live at `frm` -> only 5, 15 and the dropped file's rows
    assert got == sorted(
        [("delete", 5, 500), ("delete", 15, 1500)]
        + [("delete", i, i * 100) for i in range(20, 30)]
    )


def test_update_where_changelog_is_delete_plus_insert(spark, tmp_table_dir):
    from airbyte_spark.operators.posdeletes import update_where

    t = _mk(spark, tmp_table_dir)
    frm = t.current_snapshot_id()
    update_where(t, "id in (3, 8)", {"v": F.col("v") + 1})
    assert _log(t, frm) == [
        ("delete", 3, 300),
        ("delete", 8, 800),
        ("insert", 3, 301),
        ("insert", 8, 801),
    ]


def test_cherry_pick_and_add_files_changelog_are_inserts(spark, tmp_table_dir):
    from airbyte_spark.lake.import_files import add_files

    t = _mk(spark, tmp_table_dir)
    # stage an append on a WAP branch, move main, cherry-pick it back
    t.create_branch("wap")
    t.append(
        spark.createDataFrame([(200, "even", 7)], SCHEMA), branch="wap"
    )
    staged = t.current_snapshot_id(branch="wap")
    t.append(spark.createDataFrame([(300, "odd", 8)], SCHEMA))
    frm = t.current_snapshot_id()
    t.cherry_pick(staged)
    assert _log(t, frm) == [("insert", 200, 7)]
    # in-place import: external parquet becomes an insert
    frm = t.current_snapshot_id()
    ext = str(tmp_table_dir) + "/external"
    spark.createDataFrame([(400, "even", 9)], SCHEMA).coalesce(1).write.parquet(ext)
    add_files(t, ext)
    assert _log(t, frm) == [("insert", 400, 9)]


def test_snapshot_table_changelog_emits_live_clone_rows(spark, tmp_table_dir):
    from airbyte_spark.lake.import_files import snapshot_table

    src = _mk(spark, tmp_table_dir + "/src")
    delete_where(src, "id in (2, 12)")  # cloned as position tombstones
    clone = snapshot_table(src, tmp_table_dir + "/clone")
    frm = clone.snapshot(clone.snapshot(branch="main").parent_id).snapshot_id
    got = _log(clone, frm)
    # the clone's full LIVE corpus (tombstoned rows excluded), as inserts
    assert got == sorted(
        ("insert", i, i * 100) for i in range(30) if i not in (2, 12)
    )


def test_maintenance_snapshots_emit_nothing(spark, tmp_table_dir):
    from airbyte_spark.operators.cluster import cluster
    from airbyte_spark.operators.posdeletes import retire_equality_deletes

    t = _mk(spark, tmp_table_dir)
    batch = spark.createDataFrame([(4, "even", 99999)], SCHEMA)
    merge_into(t, batch, cursor_col="v", cdc_col=None, mode="mor")
    frm = t.current_snapshot_id()
    retire_equality_deletes(t)
    cluster(t, dims=["id", "v"], curve="zorder")
    assert t.scan_changelog(frm).count() == 0


def test_cow_merge_changelog_refused(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    frm = t.current_snapshot_id()
    merge_into(
        t,
        spark.createDataFrame([(4, "even", 99999)], SCHEMA),
        cursor_col="v",
        cdc_col=None,
        mode="cow",
    )
    with pytest.raises(ValueError, match="CoW"):
        t.scan_changelog(frm).collect()


def test_changelog_spans_multiple_snapshots(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    frm = t.current_snapshot_id()
    t.append(spark.createDataFrame([(100, "even", 1)], SCHEMA))
    delete_where(t, "id = 100")
    got = _log(t, frm)
    # net-zero key still shows both events, stamped with their snapshots
    assert got == [("delete", 100, 1), ("insert", 100, 1)]
    sids = {
        r["_change_snapshot_id"] for r in t.scan_changelog(frm).collect()
    }
    assert len(sids) == 2
