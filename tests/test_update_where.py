"""MoR UPDATE (operators/posdeletes.py::update_where — Iceberg v2
merge-on-read UPDATE: position deletes for old versions + copy-out of
new ones in a single commit)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.posdeletes import delete_where, update_where

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("cat", StringType()),
        StructField("v", IntegerType()),
    ]
)


def _mk(spark, root, n=40, files=2, partition_by=None):
    t = LakeTable.create(
        spark, root, SCHEMA, primary_key=["id"], partition_by=partition_by
    )
    per = n // files
    for i in range(files):
        rows = [
            (j, "ab" if j % 2 else "cd", j)
            for j in range(i * per, (i + 1) * per)
        ]
        t.append(spark.createDataFrame(rows, SCHEMA).coalesce(1))
    return t


def test_update_partial_file(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    res = update_where(t, "id >= 5 AND id < 8", {"v": F.col("v") + 1000})
    assert res.snapshot.operation == "update"
    assert res.matched_rows == 3 and res.delete_rows == 3
    assert res.removed_files == 0
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert len(got) == 40
    assert got[5] == 1005 and got[6] == 1006 and got[7] == 1007
    assert got[4] == 4 and got[8] == 8  # neighbors untouched


def test_update_full_file_is_metadata_swap(spark, tmp_table_dir):
    """A file whose every physical row matches is removed metadata-only
    and replaced by its rewritten copy — no tombstone written."""
    t = _mk(spark, tmp_table_dir, n=40, files=2)
    res = update_where(t, "id < 20", {"v": F.lit(0)})
    assert res.matched_rows == 20
    assert res.removed_files == 1 and res.delete_rows == 0
    assert t.position_delete_files() == []
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert all(got[i] == 0 for i in range(20))
    assert all(got[i] == i for i in range(20, 40))


def test_update_does_not_resurrect_deleted_rows(spark, tmp_table_dir):
    """Rows a live delete hides must not come back as fresh versions."""
    t = _mk(spark, tmp_table_dir)
    delete_where(t, "id = 6")
    assert t.scan().filter("id = 6").count() == 0
    res = update_where(t, "id >= 5 AND id < 8", {"v": F.lit(-1)})
    assert res.matched_rows == 2  # 5 and 7, never the tombstoned 6
    assert t.scan().filter("id = 6").count() == 0
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert got[5] == -1 and got[7] == -1 and len(got) == 39


def test_update_guards(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=10, files=1)
    with pytest.raises(ValueError, match="primary-key"):
        update_where(t, "v > 0", {"id": F.lit(0)})
    with pytest.raises(ValueError, match="not in schema"):
        update_where(t, "v > 0", {"nope": F.lit(0)})
    with pytest.raises(ValueError, match="empty SET"):
        update_where(t, "v > 0", {})
    # no match -> no commit
    before = t.current_snapshot_id()
    res = update_where(t, "v > 10000", {"v": F.lit(0)})
    assert res.snapshot is None and t.current_snapshot_id() == before


def test_update_key_range_scopes_scan(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=40, files=4)
    res = update_where(
        t, "cat = 'ab'", {"v": F.lit(7)}, key_range=("id", 0, 9)
    )
    # only the first file's range intersects
    assert res.scanned_files == 1
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert got[1] == 7 and got[3] == 7  # ab rows in range
    assert got[11] == 11  # ab row outside the range untouched


def test_update_moves_rows_across_partitions(spark, tmp_table_dir):
    """Updating a partition-source column re-derives the layout for the
    new version; the old copy dies by position — no stale twin."""
    t = _mk(spark, tmp_table_dir, partition_by=["cat"])
    update_where(t, "id = 5", {"cat": F.lit("zz")})
    got = t.scan(partition_filter={"cat": "zz"}).collect()
    assert {r["id"] for r in got} == {5}
    assert t.scan(partition_filter={"cat": "ab"}).filter("id = 5").count() == 0
    assert t.scan().count() == 40
    moved = [e for e in t.data_files() if e.partition.get("cat") == "zz"]
    assert moved and all("_p_cat=zz" in e.path for e in moved)


def test_update_string_set_expr_and_sequence(spark, tmp_table_dir):
    """SET accepts SQL strings; updated versions are NOT hidden by older
    equality deletes (they carry the new commit sequence)."""
    from airbyte_spark.operators.merge import merge_into

    sch = StructType(
        [
            StructField("id", LongType(), False),
            StructField("updated_at", LongType()),
            StructField("v", IntegerType()),
        ]
    )
    t = LakeTable.create(spark, tmp_table_dir, sch, primary_key=["id"])
    t.append(spark.createDataFrame([(i, 1, i) for i in range(10)], sch))
    # MoR merge leaves an equality-delete for id=3 at sequence s
    merge_into(
        t, spark.createDataFrame([(3, 2, 300)], sch),
        cursor_col="updated_at", cdc_col=None, mode="mor",
    )
    res = update_where(t, "id = 3", {"v": "v + 1"})
    assert res.matched_rows == 1
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert got[3] == 301 and len(got) == 10
