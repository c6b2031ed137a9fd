"""SCD2 materialization operator — end-dating, active_row, W3
disambiguation, incremental equivalence (stream_processor.py:869-997)."""

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.operators.scd2 import (
    ACTIVE_ROW,
    END_AT,
    START_AT,
    UNIQUE_KEY,
    scd2_apply,
    scd2_create,
)

UTC = dt.timezone.utc

SRC = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType()),
        StructField("v", IntegerType()),
        StructField("_airbyte_raw_id", StringType()),
        StructField("_airbyte_extracted_at", TimestampType()),
        StructField("updated_at", TimestampType()),
        StructField("_ab_cdc_deleted_at", TimestampType()),
    ]
)


def ts(day, sec=0):
    # naive = session-local = UTC (session.py pins spark.sql.session.timeZone)
    return dt.datetime(2026, 2, day, 0, 0, sec)


def _versions(t, key):
    rows = (
        t.scan()
        .filter(F.col("id") == key)
        .select("v", START_AT, END_AT, ACTIVE_ROW)
        .collect()
    )
    return sorted(
        ((r["v"], r[START_AT], r[END_AT], r[ACTIVE_ROW]) for r in rows),
        key=lambda x: x[1],
    )


def test_scd2_end_dating_and_active(spark, tmp_table_dir):
    t = scd2_create(spark, tmp_table_dir, SRC, pk=["id"], cursor_col="updated_at")
    b1 = [
        ("a", "a-v1", 1, "r1", ts(1), ts(1), None),
        ("a", "a-v2", 2, "r2", ts(2), ts(2), None),
        ("b", "b-v1", 1, "r3", ts(1), ts(1), None),
    ]
    scd2_apply(t, spark.createDataFrame(b1, SRC))
    assert _versions(t, "a") == [
        (1, ts(1), ts(2), 0),  # closed by v2
        (2, ts(2), None, 1),  # open + active
    ]
    assert _versions(t, "b") == [(1, ts(1), None, 1)]
    # second batch: new version of a (end-dates v2), CDC delete of b
    b2 = [
        ("a", "a-v3", 3, "r4", ts(3), ts(3), None),
        ("b", "b-del", 0, "r5", ts(3), ts(3), ts(3)),
    ]
    scd2_apply(t, spark.createDataFrame(b2, SRC))
    assert _versions(t, "a") == [
        (1, ts(1), ts(2), 0),
        (2, ts(2), ts(3), 0),  # re-end-dated by the incremental recompute
        (3, ts(3), None, 1),
    ]
    # CDC delete: tombstone version recorded, nothing active (:913 cdc_active_row)
    assert _versions(t, "b") == [(1, ts(1), ts(3), 0), (0, ts(3), None, 0)]


def test_scd2_incremental_equals_full_recompute(spark, tmp_table_dir):
    """Applying [b1, b2] incrementally must equal applying b1+b2 at once
    (the dbt incremental branch is an optimization, not a semantic)."""
    b1 = [(f"k{i}", f"n{i}", i, f"r{i}", ts(1), ts(1 + i % 3), None) for i in range(20)]
    b2 = [
        (f"k{i}", f"n{i}b", i + 100, f"s{i}", ts(10), ts(10), None)
        for i in range(0, 20, 4)
    ]
    t_inc = scd2_create(
        spark, os.path.join(tmp_table_dir, "inc"), SRC, ["id"], "updated_at"
    )
    scd2_apply(t_inc, spark.createDataFrame(b1, SRC))
    scd2_apply(t_inc, spark.createDataFrame(b2, SRC))
    t_full = scd2_create(
        spark, os.path.join(tmp_table_dir, "full"), SRC, ["id"], "updated_at"
    )
    scd2_apply(t_full, spark.createDataFrame(b1 + b2, SRC))
    cols = ["id", "v", START_AT, END_AT, ACTIVE_ROW]
    inc = sorted(map(tuple, t_inc.scan().select(*cols).collect()))
    full = sorted(map(tuple, t_full.scan().select(*cols).collect()))
    assert inc == full


def test_scd2_intra_batch_dup_disambiguation(spark, tmp_table_dir):
    """Two rows with identical (pk, cursor, extracted) — the W3 window must
    keep exactly one (raw_id tiebreak, dedup_data CTE :976-995)."""
    t = scd2_create(spark, tmp_table_dir, SRC, ["id"], "updated_at")
    b = [
        ("x", "first", 1, "rA", ts(1), ts(1), None),
        ("x", "second", 2, "rB", ts(1), ts(1), None),
    ]
    scd2_apply(t, spark.createDataFrame(b, SRC))
    rows = t.scan().filter(F.col("id") == "x").collect()
    assert len(rows) == 1
    assert rows[0]["v"] == 1  # ascending raw_id -> rA wins


def test_scd2_idempotent_replay(spark, tmp_table_dir):
    t = scd2_create(spark, tmp_table_dir, SRC, ["id"], "updated_at")
    b = spark.createDataFrame(
        [("a", "v1", 1, "r1", ts(1), ts(1), None)], SRC
    )
    scd2_apply(t, b)
    first = sorted(map(tuple, t.scan().select("id", "v", ACTIVE_ROW).collect()))
    scd2_apply(t, b)
    assert sorted(map(tuple, t.scan().select("id", "v", ACTIVE_ROW).collect())) == first


def test_scd2_unique_key_is_stable_surrogate(spark, tmp_table_dir):
    import hashlib

    t = scd2_create(spark, tmp_table_dir, SRC, ["id"], "updated_at")
    scd2_apply(
        t, spark.createDataFrame([("a", "v", 1, "r1", ts(1), ts(1), None)], SRC)
    )
    row = t.scan().first()
    assert row[UNIQUE_KEY] == hashlib.md5(b"a").hexdigest()


def test_scd2_batch_missing_column_keeps_stored_values(spark, tmp_table_dir):
    """A batch lacking a source column must not null that column on the
    re-end-dated previous-active row; only the batch's own versions carry
    NULL there."""
    t = scd2_create(spark, tmp_table_dir, SRC, ["id"], "updated_at")
    scd2_apply(
        t, spark.createDataFrame([("a", "keep-me", 1, "r1", ts(1), ts(1), None)], SRC)
    )
    no_name = StructType([f for f in SRC.fields if f.name != "name"])
    b2 = spark.createDataFrame([("a", 2, "r2", ts(2), ts(2), None)], no_name)
    scd2_apply(t, b2)
    rows = {r["v"]: r["name"] for r in t.scan().filter("id = 'a'").collect()}
    assert rows[1] == "keep-me"  # incumbent kept its stored column
    assert rows[2] is None  # the new version genuinely lacks it
