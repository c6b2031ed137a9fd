"""Incrementally-maintained rollups (operators/rollup.py): the rollup
table advanced O(delta) from scan_changelog must equal a from-scratch
GROUP BY of the source's final state after every mutation mix."""

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import merge_into
from airbyte_spark.operators.posdeletes import delete_where
from airbyte_spark.operators.rollup import (
    create_rollup,
    materialize_rollup,
    reset_rollup,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("cat", StringType()),
        StructField("v", DoubleType()),
        StructField("updated_at", TimestampType()),
    ]
)

TS = datetime.datetime(2026, 1, 1)
AGGS = [("count", "*"), ("sum", "v"), ("min", "v"), ("max", "v")]
OUT = ["count_star", "count_v", "sum_v", "min_v", "max_v"]


def _rows(ids, cat_of=lambda i: "abc"[i % 3], v_of=lambda i: float(i), day=0):
    return [
        (i, cat_of(i), v_of(i), TS + datetime.timedelta(days=day)) for i in ids
    ]


@pytest.fixture()
def source(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir + "/src", SCHEMA, primary_key=["id"]
    )
    t.append(spark.createDataFrame(_rows(range(90)), SCHEMA))
    return t


@pytest.fixture()
def rollup(spark, source, tmp_table_dir):
    return create_rollup(source, tmp_table_dir + "/roll", ["cat"], AGGS)


def _truth(source, group=("cat",)):
    return sorted(
        source.scan()
        .groupBy(*group)
        .agg(
            F.count(F.lit(1)).alias("count_star"),
            F.count("v").alias("count_v"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    )


def _state(rollup, group=("cat",)):
    return sorted(rollup.scan().select(*group, *OUT).collect())


def test_initial_build_then_noop(source, rollup):
    res = materialize_rollup(source, rollup)
    assert res.mode == "initial" and res.groups_updated == 3
    assert _state(rollup) == _truth(source)
    again = materialize_rollup(source, rollup)
    assert again.mode == "noop"


def test_append_only_increment(spark, source, rollup):
    materialize_rollup(source, rollup)
    # extend existing groups AND create a brand-new one
    extra = _rows(range(200, 230)) + [(999, "zz", 5.0, TS)]
    source.append(spark.createDataFrame(extra, SCHEMA))
    res = materialize_rollup(source, rollup)
    assert res.mode == "incremental"
    assert res.groups_recomputed == 0  # inserts never need recompute
    assert res.groups_deleted == 0
    assert _state(rollup) == _truth(source)


def test_update_via_mor_merge(spark, source, rollup):
    materialize_rollup(source, rollup)
    # bump non-extreme values: delete+insert pairs fold arithmetically
    upd = _rows(range(10, 40, 3), v_of=lambda i: float(i) + 0.5, day=1)
    merge_into(source, spark.createDataFrame(upd, SCHEMA), mode="mor")
    res = materialize_rollup(source, rollup)
    assert res.mode == "incremental"
    assert _state(rollup) == _truth(source)


def test_new_group_updated_within_one_window(spark, source, rollup):
    """A group born AND MoR-updated between two materializes: the window
    holds insert(10), delete(10), insert(5) for a group with NO stored
    row. The deleted 10 must not survive as max (regression: the
    recompute trigger compared deletes against the stored extreme only,
    which is NULL for brand-new groups)."""
    materialize_rollup(source, rollup)
    source.append(spark.createDataFrame([(700, "nw", 10.0, TS)], SCHEMA))
    merge_into(
        source,
        spark.createDataFrame(
            [(700, "nw", 5.0, TS + datetime.timedelta(days=1))], SCHEMA
        ),
        mode="mor",
    )
    res = materialize_rollup(source, rollup)
    assert res.mode == "incremental"
    assert _state(rollup) == _truth(source)
    row = rollup.scan().filter("cat = 'nw'").collect()[0]
    assert row["max_v"] == 5.0 and row["min_v"] == 5.0
    # mirror case for min: born at 5, updated to 10 in the same window
    source.append(spark.createDataFrame([(701, "nw2", 5.0, TS)], SCHEMA))
    merge_into(
        source,
        spark.createDataFrame(
            [(701, "nw2", 10.0, TS + datetime.timedelta(days=1))], SCHEMA
        ),
        mode="mor",
    )
    materialize_rollup(source, rollup)
    assert _state(rollup) == _truth(source)


def test_deleted_stored_extreme_beaten_by_insert_folds(spark, source, rollup):
    """Deleting the stored extreme while the same window inserts a more
    extreme value needs NO recompute: the candidate (stored ∪ inserts)
    is held by a surviving row."""
    materialize_rollup(source, rollup)
    # cat 'a' max is v=87.0 (id 87); delete it and insert v=200.0
    delete_where(source, "id = 87")
    source.append(spark.createDataFrame([(800, "a", 200.0, TS)], SCHEMA))
    res = materialize_rollup(source, rollup)
    assert res.groups_recomputed == 0
    assert _state(rollup) == _truth(source)


def test_delete_of_group_minimum_triggers_recompute(spark, source, rollup):
    materialize_rollup(source, rollup)
    # id 0 carries cat 'a' group's min v (0.0)
    delete_where(source, "id = 0")
    res = materialize_rollup(source, rollup)
    assert res.groups_recomputed == 1
    assert _state(rollup) == _truth(source)
    # deleting a non-extreme row folds arithmetically — no recompute
    delete_where(source, "id = 31")
    res2 = materialize_rollup(source, rollup)
    assert res2.groups_recomputed == 0
    assert _state(rollup) == _truth(source)


def test_update_where_commit_advances_the_rollup(spark, source, rollup):
    """A MoR UPDATE commit (op 'update') is changelog-reconstructible:
    the rollup must fold it instead of wedging at its watermark
    (regression: scan_changelog refused op 'update', so every registered
    derived table went permanently stale after one update_where)."""
    from airbyte_spark.operators.posdeletes import update_where

    materialize_rollup(source, rollup)
    update_where(source, "id in (4, 40)", {"v": F.col("v") + 1000.0})
    res = materialize_rollup(source, rollup)
    assert res.mode == "incremental"
    assert _state(rollup) == _truth(source)


def test_group_death_removes_the_row(spark, source, rollup):
    source.append(spark.createDataFrame([(500, "solo", 1.0, TS)], SCHEMA))
    materialize_rollup(source, rollup)
    assert ("solo",) in {(r["cat"],) for r in rollup.scan().collect()}
    delete_where(source, "cat = 'solo'")
    res = materialize_rollup(source, rollup)
    assert res.groups_deleted == 1
    assert _state(rollup) == _truth(source)
    assert ("solo",) not in {(r["cat"],) for r in rollup.scan().collect()}


def test_null_group_key_is_refused(spark, tmp_table_dir):
    src = LakeTable.create(
        spark, tmp_table_dir + "/s2", SCHEMA, primary_key=["id"]
    )
    src.append(
        spark.createDataFrame([(1, None, 1.0, TS), (2, "a", 2.0, TS)], SCHEMA)
    )
    roll = create_rollup(src, tmp_table_dir + "/r2", ["cat"], AGGS)
    with pytest.raises(ValueError, match="NULL group key"):
        materialize_rollup(src, roll)


def test_reset_rebuilds_without_double_count(spark, source, rollup):
    materialize_rollup(source, rollup)
    source.append(spark.createDataFrame(_rows(range(300, 320)), SCHEMA))
    reset_rollup(rollup)
    res = materialize_rollup(source, rollup)
    assert res.mode == "rebuild"
    assert _state(rollup) == _truth(source)


def test_cow_window_raises_unless_rebuild(spark, source, rollup):
    materialize_rollup(source, rollup)
    upd = _rows([5, 6], v_of=lambda i: -100.0, day=1)
    merge_into(source, spark.createDataFrame(upd, SCHEMA), mode="cow")
    with pytest.raises(ValueError):
        materialize_rollup(source, rollup)
    res = materialize_rollup(source, rollup, on_unsupported="rebuild")
    assert res.mode == "rebuild"
    assert _state(rollup) == _truth(source)


def test_composite_group_keys(spark, source, tmp_table_dir):
    roll = create_rollup(
        source, tmp_table_dir + "/r3", ["cat", "id"], [("sum", "v")]
    )
    materialize_rollup(source, roll)
    merge_into(
        source,
        spark.createDataFrame(_rows([3, 4], v_of=lambda i: 7.5, day=1), SCHEMA),
        mode="mor",
    )
    materialize_rollup(source, roll)
    got = sorted(
        source.scan()
        .groupBy("cat", "id")
        .agg(
            F.count(F.lit(1)).alias("count_star"),
            F.count("v").alias("count_v"),
            F.sum("v").alias("sum_v"),
        )
        .collect()
    )
    assert (
        sorted(
            roll.scan().select("cat", "id", "count_star", "count_v", "sum_v").collect()
        )
        == got
    )


def test_rollup_matches_truth_over_random_op_sequences(spark):
    """Model-based: for ANY interleaving of appends, MoR merges,
    DELETE WHERE, MoR UPDATE WHERE, and maintenance, a rollup
    materialized at arbitrary points always equals a from-scratch
    GROUP BY of the source's state — the incremental fold, the min/max
    recompute trigger, and changelog reconstruction of every commit op
    hold under composition, not just in isolation."""
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from airbyte_spark.operators.compact import compact
    from airbyte_spark.operators.posdeletes import update_where

    op = st.one_of(
        st.tuples(st.just("append"), st.integers(0, 10**6)),
        st.tuples(st.just("merge"), st.integers(0, 10**6)),
        st.tuples(st.just("delete"), st.integers(0, 10**6)),
        st.tuples(st.just("update"), st.integers(0, 10**6)),
        st.tuples(st.just("compact"), st.just(0)),
        st.tuples(st.just("materialize"), st.just(0)),
    )

    @settings(
        max_examples=int(os.environ.get("SOAK_EXAMPLES", "4")),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(op, min_size=3, max_size=8))
    def run(ops):
        root = tempfile.mkdtemp(prefix="lake-rollup-prop-")
        try:
            src = LakeTable.create(
                spark, root + "/src", SCHEMA, primary_key=["id"]
            )
            src.append(spark.createDataFrame(_rows(range(12)), SCHEMA))
            roll = create_rollup(src, root + "/roll", ["cat"], AGGS)
            day = 0
            for kind, seed in ops:
                day += 1
                lo = seed % 30
                if kind == "append":
                    src.append(
                        spark.createDataFrame(
                            _rows(
                                range(100 + lo, 104 + lo),
                                v_of=lambda i: float(seed % 50),
                                day=day,
                            ),
                            SCHEMA,
                        )
                    )
                elif kind == "merge":
                    batch = _rows(
                        [lo % 12, 100 + lo],
                        v_of=lambda i: float(i + seed % 7) - 3.0,
                        day=day,
                    )
                    merge_into(
                        src, spark.createDataFrame(batch, SCHEMA), mode="mor"
                    )
                elif kind == "delete":
                    delete_where(src, f"id % 11 = {lo % 11}")
                elif kind == "update":
                    if src.scan().filter(f"id % 7 = {lo % 7}").count():
                        update_where(
                            src,
                            f"id % 7 = {lo % 7}",
                            {"v": F.col("v") + float(seed % 9)},
                        )
                elif kind == "compact":
                    compact(src)
                else:
                    materialize_rollup(src, roll)
                    assert _state(roll) == _truth(src)
            materialize_rollup(src, roll)
            assert _state(roll) == _truth(src)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    run()


def test_rollup_is_a_real_lake_table(source, rollup):
    """Time travel applies: the pre-increment snapshot still reads."""
    materialize_rollup(source, rollup)
    snap = rollup.current_snapshot_id()
    before = _state(rollup)
    delete_where(source, "id < 10")
    materialize_rollup(source, rollup)
    assert _state(rollup) == _truth(source)
    assert (
        sorted(
            rollup.scan(snapshot_id=snap).select("cat", *OUT).collect()
        )
        == before
    )


def test_validation(source, tmp_table_dir):
    with pytest.raises(ValueError, match="unknown group column"):
        create_rollup(source, tmp_table_dir + "/x", ["nope"], AGGS)
    with pytest.raises(ValueError, match="unsupported aggregate"):
        create_rollup(source, tmp_table_dir + "/x", ["cat"], [("avg", "v")])
    with pytest.raises(ValueError, match="numeric"):
        create_rollup(source, tmp_table_dir + "/x", ["cat"], [("sum", "cat")])
    with pytest.raises(ValueError, match="not a rollup table"):
        materialize_rollup(source, source)
