"""ANALYZE TABLE column stats (lake/analyze.py — Iceberg
compute_table_stats / Puffin theta-sketch analog)."""

import os

import pytest
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.analyze import analyze_table, column_stats, column_stats_df
from airbyte_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("cat", StringType()),
        StructField("v", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _mk(spark, root, n=500):
    t = LakeTable.create(spark, root, SCHEMA, primary_key=["id"])
    rows = [
        (i, f"c{i % 7}" if i % 10 else None, i % 23, b"x" * 8) for i in range(n)
    ]
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_analyze_ndv_and_nulls(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    doc = analyze_table(t)
    assert doc["rows"] == 500
    # binary payload excluded by default
    assert set(doc["columns"]) == {"id", "cat", "v"}
    # HLL++ at rsd=0.01 is exact-ish at these cardinalities
    assert doc["columns"]["id"]["ndv"] == pytest.approx(500, rel=0.05)
    assert doc["columns"]["cat"]["ndv"] == pytest.approx(7, abs=1)
    assert doc["columns"]["v"]["ndv"] == pytest.approx(23, abs=2)
    assert doc["columns"]["cat"]["null_count"] == 50
    assert doc["columns"]["id"]["null_count"] == 0
    # persisted + readable, fresh
    got = column_stats(t)
    assert got["columns"] == doc["columns"] and got["stale"] is False
    df = column_stats_df(t)
    assert df.count() == 3 and df.filter("column = 'cat'").first()["ndv"] >= 6


def test_analyze_staleness_and_refresh(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=100)
    analyze_table(t)
    first = t._refs()["table"]["column_stats"]["main"]
    t.append(
        spark.createDataFrame([(1000, "new", 1, b"")], SCHEMA)
    )
    got = column_stats(t)
    assert got["stale"] is True  # advisory but flagged
    analyze_table(t)
    got2 = column_stats(t)
    assert got2["stale"] is False and got2["rows"] == 101
    # superseded stats file dropped, refs point at the new one
    assert not os.path.exists(os.path.join(t.meta_dir, first))


def test_analyze_explicit_columns_and_errors(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, n=50)
    doc = analyze_table(t, columns=["v"])
    assert set(doc["columns"]) == {"v"}
    with pytest.raises(ValueError, match="not in schema"):
        analyze_table(t, columns=["nope"])
    assert column_stats(t, branch="main") is not None
    # no ANALYZE on another branch -> None / empty frame
    t.create_branch("b")
    assert column_stats(t, branch="b") is None
    assert column_stats_df(t, branch="b").count() == 0
