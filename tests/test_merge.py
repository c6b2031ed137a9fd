"""MERGE INTO semantics — mirrors Airbyte's testDedup scenario matrix
(BasicFunctionalityIntegrationTest.kt:3110-3338, testDedupNoCursor :3339)
and the null-PK guard (BaseDeltaTaskWriter.java:38-39)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import NullPrimaryKeyError, merge_into

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


def _target(spark, root):
    t = LakeTable.create(spark, root, BASE_SCHEMA, primary_key=["image_id"])
    rows = [
        ("keep", "untouched", 1, "r1", ts(1)),
        ("upd", "old caption", 1, "r2", ts(1)),
        ("stale", "current", 5, "r3", ts(1)),
        ("gone", "to be deleted", 1, "r4", ts(1)),
    ]
    t.append(spark.createDataFrame(rows, BASE_SCHEMA))
    # seed cursor values for existing rows via a first merge
    seed = [
        ("upd", "old caption", 1, "r2b", ts(1), ts(2), None),
        ("stale", "current", 5, "r3b", ts(1), ts(10), None),
        ("gone", "to be deleted", 1, "r4b", ts(1), ts(2), None),
    ]
    merge_into(t, spark.createDataFrame(seed, SRC_SCHEMA))
    return t


def _state(t):
    return {
        r["image_id"]: (r["caption"], r["v"])
        for r in t.scan().collect()
    }


def test_merge_dedup_matrix(spark, tmp_table_dir):
    t = _target(spark, tmp_table_dir)
    src_rows = [
        # two versions of same id in one batch: newer cursor wins
        ("dup", "v1", 1, "s1", ts(3), ts(3), None),
        ("dup", "v2", 2, "s2", ts(3, 1), ts(4), None),
        # update existing, newer cursor -> replaces
        ("upd", "new caption", 2, "s3", ts(3), ts(5), None),
        # stale update (cursor older than target's ts(10)) -> no overwrite
        ("stale", "MUST NOT APPEAR", 9, "s4", ts(3), ts(4), None),
        # CDC delete of existing
        ("gone", None, 0, "s5", ts(3), ts(5), ts(6)),
        # insert+delete same new id in one batch -> must not appear
        ("flash", "born", 1, "s6", ts(3), ts(3), None),
        ("flash", None, 0, "s7", ts(3, 1), ts(4), ts(6)),
        # delete of nonexistent id -> no-op
        ("ghost", None, 0, "s8", ts(3), ts(4), ts(6)),
        # fresh insert
        ("new", "hello", 7, "s9", ts(3), ts(3), None),
    ]
    res = merge_into(t, spark.createDataFrame(src_rows, SRC_SCHEMA))
    assert res.source_rows == 9
    got = _state(t)
    assert got == {
        "keep": ("untouched", 1),
        "upd": ("new caption", 2),
        "stale": ("current", 5),
        "dup": ("v2", 2),
        "new": ("hello", 7),
    }
    assert res.snapshot.operation == "merge"


def test_merge_sort_merge_fallback_matches_broadcast(spark, tmp_table_dir):
    """The oversized-batch sort-merge path must produce the same state as
    the broadcast path (broadcast_threshold_bytes=0 forces the fallback)."""
    t = _target(spark, tmp_table_dir)
    src_rows = [
        ("upd", "v-smj", 9, "s1", ts(4), ts(8), None),
        ("gone", None, 0, "s2", ts(4), ts(8), ts(9)),
        ("fresh", "new", 1, "s3", ts(4), ts(4), None),
    ]
    merge_into(
        t,
        spark.createDataFrame(src_rows, SRC_SCHEMA),
        broadcast_threshold_bytes=0,
    )
    assert _state(t) == {
        "keep": ("untouched", 1),
        "upd": ("v-smj", 9),
        "stale": ("current", 5),
        "fresh": ("new", 1),
    }


def test_merge_equal_cursor_extracted_tiebreak(spark, tmp_table_dir):
    t = _target(spark, tmp_table_dir)
    src = [
        ("tie", "early", 1, "s1", ts(5, 0), ts(7), None),
        ("tie", "late extracted wins", 2, "s2", ts(5, 30), ts(7), None),
    ]
    merge_into(t, spark.createDataFrame(src, SRC_SCHEMA))
    assert _state(t)["tie"] == ("late extracted wins", 2)


def test_merge_no_cursor_falls_back_to_extracted(spark, tmp_table_dir):
    """testDedupNoCursor: extractedAt decides (:3339)."""
    t = LakeTable.create(
        spark, tmp_table_dir, BASE_SCHEMA, primary_key=["image_id"]
    )
    t.append(
        spark.createDataFrame([("a", "old", 1, "r1", ts(1))], BASE_SCHEMA)
    )
    src = [
        ("a", "newer extract", 2, "s1", ts(2)),
        ("a", "older extract", 3, "s2", ts(1, 30)),
    ]
    merge_into(t, spark.createDataFrame(src, BASE_SCHEMA), cursor_col=None)
    assert _state(t)["a"] == ("newer extract", 2)


def test_merge_null_pk_fails(spark, tmp_table_dir):
    t = _target(spark, tmp_table_dir)
    nullable_schema = StructType(
        [StructField(f.name, f.dataType, True) for f in SRC_SCHEMA.fields]
    )
    src = [(None, "bad", 1, "s1", ts(3), ts(3), None)]
    with pytest.raises(NullPrimaryKeyError):
        merge_into(t, spark.createDataFrame(src, nullable_schema))


def test_merge_untouched_files_not_rewritten(spark, tmp_table_dir):
    """Manifest pruning: a merge whose keys fall outside a file's PK range
    must not rewrite that file (CoW scoping)."""
    t = LakeTable.create(spark, tmp_table_dir, BASE_SCHEMA, primary_key=["image_id"])
    t.append(spark.createDataFrame([("aaa", "x", 1, "r1", ts(1))], BASE_SCHEMA))
    t.append(spark.createDataFrame([("zzz", "y", 1, "r2", ts(1))], BASE_SCHEMA))
    before = {e.path for e in t.data_files()}
    src = [("zzz", "y2", 2, "s1", ts(2), ts(2), None)]
    res = merge_into(t, spark.createDataFrame(src, SRC_SCHEMA))
    after = {e.path for e in t.data_files()}
    a_files = {p for p in before if p in after}
    assert a_files, "the aaa file must survive untouched"
    assert res.rewritten_files == 1
    assert _state(t) == {"aaa": ("x", 1), "zzz": ("y2", 2)}


def test_merge_idempotent_replay(spark, tmp_table_dir):
    """At-least-once delivery: replaying the same batch yields the same
    table state (resumability.md:14-34 / T5)."""
    t = _target(spark, tmp_table_dir)
    src = spark.createDataFrame(
        [("upd", "final", 3, "s1", ts(4), ts(8), None)], SRC_SCHEMA
    )
    merge_into(t, src)
    first = _state(t)
    merge_into(t, src)  # replay
    assert _state(t) == first


def test_merge_into_empty_table(spark, tmp_table_dir):
    """Insert-only merge against a table with zero data files."""
    t = LakeTable.create(spark, tmp_table_dir, BASE_SCHEMA, primary_key=["image_id"])
    src = [("a", "first", 1, "s1", ts(1), ts(1), None),
           ("b", None, 0, "s2", ts(1), ts(1), ts(2))]  # delete of nonexistent
    res = merge_into(t, spark.createDataFrame(src, SRC_SCHEMA))
    assert _state(t) == {"a": ("first", 1)}
    assert res.rewritten_files == 0


def test_merge_concurrent_conflict(spark, tmp_table_dir):
    """A branch that moved between merge planning and commit must raise
    CommitConflict, not silently drop the concurrent commit's files."""
    from unittest.mock import patch

    from airbyte_spark.lake.table import CommitConflict, LakeTable as LT

    t = _target(spark, tmp_table_dir)
    src = spark.createDataFrame(
        [("upd", "mine", 7, "s1", ts(4), ts(8), None)], SRC_SCHEMA
    )
    real_commit = LT.commit

    def racing_commit(self, *a, **kw):
        # simulate a concurrent writer landing first
        LT.commit = real_commit
        t.append(spark.createDataFrame([("zz", "other", 1, "rX", ts(1))], BASE_SCHEMA))
        return real_commit(self, *a, **kw)

    with patch.object(LT, "commit", racing_commit):
        with pytest.raises(CommitConflict):
            merge_into(t, src)


def test_merge_hot_key_skew(spark, tmp_table_dir):
    """≥20% of the batch shares one hot image_id (FIXTURES.md F2 skew case):
    exactly one winner row must survive, chosen by the W1 total order."""
    t = _target(spark, tmp_table_dir)
    n = 5000
    hot = [
        ("hotkey", f"c{i}", i, f"s{i:06d}", ts(3, 0), ts(5), None)
        for i in range(n)
    ]
    # winner: strictly newest cursor
    hot.append(("hotkey", "WINNER", -1, "s_win", ts(3, 0), ts(9), None))
    df = spark.createDataFrame(hot, SRC_SCHEMA).repartition(8)
    res = merge_into(t, df, salt_buckets=8)
    assert res.deduped_rows == 1
    assert _state(t)["hotkey"] == ("WINNER", -1)


def test_merge_conflict_retry_succeeds(spark, tmp_table_dir):
    """retry_on_conflict re-plans the merge against the moved branch: the
    concurrent append's file survives AND the merge lands (Iceberg
    commit.retry semantics)."""
    from unittest.mock import patch

    from airbyte_spark.lake.retry import retry_on_conflict
    from airbyte_spark.lake.table import LakeTable as LT

    t = _target(spark, tmp_table_dir)
    src = spark.createDataFrame(
        [("upd", "retry wins", 7, "s1", ts(4), ts(8), None)], SRC_SCHEMA
    )
    real_commit = LT.commit
    raced = {"done": False}

    def racing_commit(self, *a, **kw):
        if not raced["done"]:
            raced["done"] = True
            LT.commit = real_commit
            t.append(
                spark.createDataFrame([("zz", "concurrent", 1, "rX", ts(1))],
                                      BASE_SCHEMA)
            )
            LT.commit = racing_commit  # type: ignore[method-assign]
        return real_commit(self, *a, **kw)

    with patch.object(LT, "commit", racing_commit):
        res = retry_on_conflict(lambda: merge_into(t, src), base_backoff_s=0.01)
    assert res.snapshot is not None
    got = _state(t)
    assert got["upd"] == ("retry wins", 7)
    assert got["zz"] == ("concurrent", 1)  # concurrent commit not dropped


def test_merge_cursor_equal_to_extracted_col(spark, tmp_table_dir):
    """cursor_col == _airbyte_extracted_at is a legal config: the fetch-key
    list must dedup it (ADVICE r3: a repeated column made the payload join
    ambiguous) and the merge must resolve winners on extracted-at alone."""
    t = LakeTable.create(
        spark, tmp_table_dir, BASE_SCHEMA, primary_key=["image_id"]
    )
    t.append(
        spark.createDataFrame([("a", "old", 1, "r1", ts(1))], BASE_SCHEMA)
    )
    src = spark.createDataFrame(
        [
            ("a", "stale", 8, "s1", ts(2)),
            ("a", "new", 2, "s2", ts(3)),
        ],
        BASE_SCHEMA,
    )
    res = merge_into(t, src, cursor_col="_airbyte_extracted_at")
    assert res.snapshot is not None
    assert _state(t) == {"a": ("new", 2)}


def test_merge_cursor_value_colliding_with_null_surrogate(spark, tmp_table_dir):
    """A string cursor whose value is a raw NUL byte must not cross-match a
    NULL-cursor twin in the payload-fetch join (ADVICE r3: the surrogate is
    now tagged, so value-"\\x00" and NULL map to distinct join keys)."""
    schema = StructType(
        [
            StructField("image_id", StringType(), False),
            StructField("caption", StringType()),
            StructField("v", IntegerType()),
            StructField("_airbyte_raw_id", StringType()),
            StructField("_airbyte_extracted_at", TimestampType()),
            StructField("cur", StringType()),
        ]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["image_id"])
    # same pk AND same raw_id; one row's cursor is literally "\x00", the
    # other NULL — nulls-last ordering makes the "\x00" row the winner
    src = spark.createDataFrame(
        [
            ("a", "null-cursor payload", 1, "rX", ts(1), None),
            ("a", "nul-byte payload", 2, "rX", ts(1), "\x00"),
        ],
        schema,
    )
    merge_into(t, src, cursor_col="cur")
    assert _state(t) == {"a": ("nul-byte payload", 2)}
