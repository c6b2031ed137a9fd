"""PK / cursor change between syncs — the reference's
testDedupChangePk (BasicFunctionalityIntegrationTest.kt:3483) and
testDedupChangeCursor (:3401): after the user edits the stream's
identifier fields or cursor, the NEXT sync dedups under the new
configuration; the table's sort order is rebuilt
(IcebergTableSynchronizer.kt:314-378)."""

import datetime as dt

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import merge_into

UTC = dt.timezone.utc

SCHEMA = StructType(
    [
        StructField("id1", StringType(), False),
        StructField("id2", StringType(), False),
        StructField("v", IntegerType()),
        StructField("_airbyte_raw_id", StringType()),
        StructField("_airbyte_extracted_at", TimestampType()),
    ]
)


def ts(day, sec=0):
    return dt.datetime(2026, 2, day, 0, 0, sec, tzinfo=UTC)


def _rows(t):
    return {
        (r["id1"], r["id2"]): r["v"] for r in t.scan().collect()
    }


def test_dedup_change_pk(spark, tmp_table_dir):
    """Sync under pk=id1, switch to pk=id2, sync again: an incoming row
    replaces EVERY existing row sharing its id2 — the old-key-era
    duplicates collapse (testDedupChangePk semantics)."""
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id1"])
    b1 = spark.createDataFrame(
        [
            ("k1", "x", 1, "r1", ts(1)),
            ("k2", "x", 2, "r2", ts(1)),  # distinct under id1, dup under id2
            ("k3", "y", 3, "r3", ts(1)),
        ],
        SCHEMA,
    )
    merge_into(t, b1, cursor_col=None)
    assert len(_rows(t)) == 3

    t.update_primary_key(["id2"])
    assert t.primary_key == ["id2"]

    b2 = spark.createDataFrame([("k9", "x", 9, "r9", ts(2))], SCHEMA)
    merge_into(t, b2, cursor_col=None)
    got = _rows(t)
    # both old x-rows replaced by the single new x-row; y untouched
    assert got == {("k9", "x"): 9, ("k3", "y"): 3}


def test_dedup_change_pk_mor(spark, tmp_table_dir):
    """Same scenario through the merge-on-read path: the equality-delete
    file is keyed on the NEW pk and removes every older matching row."""
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id1"])
    b1 = spark.createDataFrame(
        [
            ("k1", "x", 1, "r1", ts(1)),
            ("k2", "x", 2, "r2", ts(1)),
            ("k3", "y", 3, "r3", ts(1)),
        ],
        SCHEMA,
    )
    merge_into(t, b1, cursor_col=None, mode="mor")
    t.update_primary_key(["id2"])
    b2 = spark.createDataFrame([("k9", "x", 9, "r9", ts(2))], SCHEMA)
    merge_into(t, b2, cursor_col=None, mode="mor")
    assert _rows(t) == {("k9", "x"): 9, ("k3", "y"): 3}


def test_change_pk_invalidates_sort_order_registry(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id1"])
    oid = t.ensure_sort_order(["v"], "zorder", 21)
    assert oid in t.sort_orders()
    t.update_primary_key(["id2"])
    assert t.sort_orders() == {}
    # re-registering the same order yields a FRESH id (old stamps go dirty)
    assert t.ensure_sort_order(["v"], "zorder", 21) != oid


def test_update_primary_key_rejects_unknown_column(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id1"])
    with pytest.raises(ValueError, match="not in schema"):
        t.update_primary_key(["nope"])


CUR_SCHEMA = StructType(
    list(SCHEMA.fields)
    + [
        StructField("cur_a", TimestampType()),
        StructField("cur_b", TimestampType()),
    ]
)


def test_dedup_change_cursor(spark, tmp_table_dir):
    """testDedupChangeCursor: the same incoming row loses under the old
    cursor but wins under the new one — switching the stream's cursor
    column changes the winner on the next sync."""
    t = LakeTable.create(spark, tmp_table_dir, CUR_SCHEMA, primary_key=["id1"])
    seed = spark.createDataFrame(
        [("a", "z", 1, "r1", ts(1), ts(10), ts(1))], CUR_SCHEMA
    )
    merge_into(t, seed, cursor_col="cur_a")

    incoming = spark.createDataFrame(
        [("a", "z", 2, "r2", ts(2), ts(5), ts(2))], CUR_SCHEMA
    )
    # under the OLD cursor (cur_a: 5 < 10) the incoming row is stale
    merge_into(t, incoming, cursor_col="cur_a")
    assert _rows(t) == {("a", "z"): 1}
    # under the NEW cursor (cur_b: 2 > 1) the same row wins
    merge_into(t, incoming, cursor_col="cur_b")
    assert _rows(t) == {("a", "z"): 2}


def test_stream_spec_cursor_change_between_syncs(spark, tmp_table_dir):
    """Connection-level form: two syncs of the same stream, the second
    configured with the new cursor column (StreamSpec is per-sync user
    config, exactly like the reference's configured catalog)."""
    from airbyte_spark.streaming.connection import ConnectionSync, StreamSpec

    t = LakeTable.create(spark, tmp_table_dir, CUR_SCHEMA, primary_key=["id1"])
    s1 = ConnectionSync("sync-1", [StreamSpec("s", t, cursor_col="cur_a")])
    s1.start()
    s1.write({"s": (spark.createDataFrame(
        [("a", "z", 1, "r1", ts(1), ts(10), ts(1))], CUR_SCHEMA), 0)})
    s1.finish()

    s2 = ConnectionSync("sync-2", [StreamSpec("s", t, cursor_col="cur_b")])
    s2.start()
    s2.write({"s": (spark.createDataFrame(
        [("a", "z", 2, "r2", ts(2), ts(5), ts(2))], CUR_SCHEMA), 0)})
    s2.finish()
    assert _rows(t) == {("a", "z"): 2}
