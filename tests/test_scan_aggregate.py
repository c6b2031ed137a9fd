"""Metadata-only aggregate pushdown (operators/aggregate.py): COUNT /
MIN / MAX answered from manifest stats, with a residual scan for
delete-hit / bound-straddling / stat-less files — the hybrid must equal
a full scan + aggregate exactly in every mix."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.aggregate import AggregateReport, scan_aggregate

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("cat", StringType()),
        StructField("v", DoubleType()),
    ]
)

AGGS = [("count", "*"), ("count", "v"), ("min", "id"), ("max", "id"),
        ("min", "v"), ("max", "v")]


def _groundtruth(t, **scan_kw):
    row = (
        t.scan(**scan_kw)
        .agg(
            F.count(F.lit(1)).alias("count_star"),
            F.count("v").alias("count_v"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()[0]
    )
    return row.asDict()


def _got(t, aggs=AGGS, report=None, **kw):
    return scan_aggregate(t, aggs, report=report, **kw).collect()[0].asDict()


@pytest.fixture()
def table(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    rows = [
        (i, "abc"[i % 3], float(i) / 4 if i % 5 else None) for i in range(200)
    ]
    t.append(spark.createDataFrame(rows[:120], SCHEMA))
    t.append(spark.createDataFrame(rows[120:], SCHEMA))
    return t


def test_clean_table_is_pure_metadata(spark, table):
    rep = AggregateReport()
    assert _got(table, report=rep) == _groundtruth(table)
    assert rep.scanned_files == 0
    assert rep.meta_files == len(table.data_files())
    assert rep.meta_rows == 200


def test_count_col_subtracts_nulls_from_metadata(spark, table):
    rep = AggregateReport()
    got = _got(table, aggs=[("count", "v"), ("count", "*")], report=rep)
    assert rep.scanned_files == 0
    assert got["count_v"] == 160  # 40 of 200 ids are %5==0 -> NULL v
    assert got["count_star"] == 200


def test_string_extreme_falls_back_to_scan(spark, table):
    """String min/max may be truncated in footers — must come from the
    residual scan, and still be exact."""
    rep = AggregateReport()
    got = _got(table, aggs=[("min", "cat"), ("max", "cat")], report=rep)
    assert (got["min_cat"], got["max_cat"]) == ("a", "c")
    assert rep.meta_files == 0
    assert rep.scan_reasons.get("missing-stats") == len(table.data_files())


def test_equality_deletes_scan_only_hit_files(spark, table):
    from airbyte_spark.operators.merge import merge_into

    upd = spark.createDataFrame(
        [(i, "z", 999.0) for i in range(0, 40, 2)], SCHEMA
    )
    merge_into(table, upd, mode="mor", cursor_col="v")
    rep = AggregateReport()
    assert _got(table, report=rep) == _groundtruth(table)
    # the delete can only bite pre-merge files; the merge's own inserts
    # (sequence >= delete sequence) must stay metadata-answered
    assert rep.scanned_files >= 1
    assert rep.meta_files >= 1
    assert rep.scan_reasons.get("equality-delete", 0) == rep.scanned_files


def test_position_deletes_scan_only_referenced_files(spark, table):
    from airbyte_spark.operators.posdeletes import delete_where

    res = delete_where(table, "id % 7 = 0 AND id < 120")
    assert res.delete_rows > 0
    rep = AggregateReport()
    assert _got(table, report=rep) == _groundtruth(table)
    assert rep.scan_reasons.get("position-delete", 0) == rep.scanned_files
    assert rep.meta_files >= 1  # un-referenced files stay metadata


def test_key_range_straddle_splits_the_plan(spark, table):
    # second append holds ids 120..199; range [100,150] straddles both
    kw = dict(key_range=("id", 100, 150))
    rep = AggregateReport()
    assert _got(table, report=rep, **kw) == _groundtruth(table, **kw)
    assert rep.scan_reasons.get("key-range-straddle", 0) == rep.scanned_files
    assert rep.scanned_files >= 1


def test_key_range_fully_inside_stays_metadata(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    t.append(
        spark.createDataFrame([(i, "a", float(i)) for i in range(50)], SCHEMA)
    )
    t.append(
        spark.createDataFrame(
            [(i, "b", float(i)) for i in range(1000, 1050)], SCHEMA
        )
    )
    rep = AggregateReport()
    got = _got(t, report=rep, key_range=("id", 0, 500))
    assert got == _groundtruth(t, key_range=("id", 0, 500))
    assert got["count_star"] == 50 and got["max_id"] == 49
    assert rep.scanned_files == 0  # disjoint file pruned, inside file meta


def test_empty_selection_yields_zero_and_nulls(spark, table):
    got = _got(table, key_range=("id", 5000, 6000))
    assert got["count_star"] == 0 and got["count_v"] == 0
    assert got["min_id"] is None and got["max_v"] is None


def test_partitioned_filter_and_evolution_fallback(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, primary_key=["id"], partition_by=["cat"]
    )
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(60)], SCHEMA
        )
    )
    rep = AggregateReport()
    kw = dict(partition_filter={"cat": "a"})
    assert _got(t, report=rep, **kw) == _groundtruth(t, **kw)
    assert rep.scanned_files == 0  # layout answers the filter exactly
    # evolve the partition spec: the old-layout file written AFTER the
    # change on the NEW spec keyed by id bucket cannot be layout-pruned
    t.update_partition_spec([])
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(100, 140)], SCHEMA
        )
    )
    rep2 = AggregateReport()
    got = _got(t, report=rep2, **kw)
    assert got == _groundtruth(t, **kw)
    assert rep2.scan_reasons.get("partition-evolution", 0) >= 1
    assert got["count_star"] == 50  # 30 old + 20 new 'a' rows
    assert rep2.meta_files >= 1  # pre-evolution 'a' files stay metadata


def test_validation_rejects_bad_requests(spark, table):
    with pytest.raises(ValueError):
        scan_aggregate(table, [("avg", "v")])
    with pytest.raises(ValueError):
        scan_aggregate(table, [("min", "*")])
    with pytest.raises(ValueError):
        scan_aggregate(table, [("min", "nope")])


def test_time_travel_aggregates_at_the_old_snapshot(spark, table):
    snap = table.current_snapshot_id()
    table.append(
        spark.createDataFrame([(999, "z", 1.0)], SCHEMA)
    )
    got = _got(table, aggs=[("count", "*"), ("max", "id")],
               snapshot_id=snap)
    assert got == {"count_star": 200, "max_id": 199}


def _mutated(spark, table):
    """eq-delete + pos-delete debt on the shared fixture."""
    from airbyte_spark.operators.merge import merge_into
    from airbyte_spark.operators.posdeletes import delete_where

    upd = spark.createDataFrame(
        [(i, "z", 999.0) for i in range(0, 40, 2)], SCHEMA
    )
    merge_into(table, upd, mode="mor", cursor_col="v")
    delete_where(table, "id % 7 = 0 AND id >= 120")
    return table


def test_distributed_planning_matches_driver(spark, table):
    t = _mutated(spark, table)
    rd, rx = AggregateReport(), AggregateReport()
    a = _got(t, report=rd, planning="driver")
    b = _got(t, report=rx, planning="distributed")
    assert a == b == _groundtruth(t)
    assert rd.planning == "driver" and rx.planning == "distributed"
    assert (rx.meta_files, rx.scanned_files, rx.meta_rows) == (
        rd.meta_files,
        rd.scanned_files,
        rd.meta_rows,
    )
    assert rx.scan_reasons == rd.scan_reasons


def test_distributed_planning_with_key_range(spark, table):
    t = _mutated(spark, table)
    kw = dict(key_range=("id", 30, 170))
    rd, rx = AggregateReport(), AggregateReport()
    a = _got(t, report=rd, planning="driver", **kw)
    b = _got(t, report=rx, planning="distributed", **kw)
    assert a == b == _groundtruth(t, **kw)
    assert rx.scan_reasons == rd.scan_reasons


def test_auto_planning_crosses_the_threshold(spark, table):
    t = _mutated(spark, table)
    rep = AggregateReport()
    baseline = _got(t, report=rep)
    assert rep.planning == "driver"  # tiny table stays driver-side
    t.set_properties({"cluster.planning.distributed-threshold": 1})
    rep2 = AggregateReport()
    assert _got(t, report=rep2) == baseline == _groundtruth(t)
    assert rep2.planning == "distributed"


def test_histogram_buckets_and_edges(spark):
    from airbyte_spark.operators.aggregate import histogram

    df = spark.createDataFrame(
        [(float(i),) for i in range(10)] + [(None,)], "v double"
    )
    got = {r["bucket"]: r for r in histogram(df, "v", bins=3).collect()}
    # lo=0, hi=9, width=3: [0,3)->3, [3,6)->3, [6,9]->4 (max folds in)
    assert {b: got[b]["count"] for b in got} == {0: 3, 1: 3, 2: 4}
    assert got[0]["lo_edge"] == 0.0 and got[0]["hi_edge"] == 3.0
    assert got[2]["hi_edge"] == 9.0

    # degenerate range: all values equal -> single bucket 0
    one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    rows = histogram(one, "v", bins=4).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["count"] == 2

    # all-null column -> empty histogram
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert histogram(nulls, "v").count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError, match="bins"):
        histogram(df, "v", 0)


def test_histogram_excludes_nan(spark):
    from airbyte_spark.operators.aggregate import histogram

    df = spark.createDataFrame(
        [(0.0,), (1.0,), (2.0,), (3.0,), (float("nan"),)], "v double"
    )
    rows = {r["bucket"]: r for r in histogram(df, "v", bins=2).collect()}
    assert {b: rows[b]["count"] for b in rows} == {0: 2, 1: 2}
    assert rows[1]["hi_edge"] == 3.0  # width from nan-free max
