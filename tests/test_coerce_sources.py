"""Type coercion with meta-change capture + incremental scans + format
writers (AirbyteValueCoercer.kt analog; S2/S3/P2/P4; S6-S9)."""

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.functions.coerce import coerce_columns
from airbyte_spark.sources.files import read_csv, read_jsonl, write_csv, write_jsonl
from airbyte_spark.sources.incremental import (
    composite_range_filter,
    cursor_bounded_scan,
    incremental_watermark_filter,
    plan_range_partitions,
    sample_scan,
)

SF = "/root/testdata/sf0.001"


def test_coerce_with_change_capture(spark):
    df = spark.createDataFrame(
        [("1", "2.5", "x"), ("not-a-number", "nan-ish", "y"), ("3", "4.0", None)],
        ["a", "b", "c"],
    )
    target = StructType(
        [
            StructField("a", LongType()),
            StructField("b", DoubleType()),
            StructField("c", StringType()),
        ]
    )
    out = coerce_columns(df, target, sync_id=7)
    rows = out.orderBy("c").collect()
    good = [r for r in rows if r["c"] == "x"][0]
    assert good["a"] == 1 and good["b"] == 2.5
    assert good["_airbyte_meta"]["sync_id"] == 7
    assert list(good["_airbyte_meta"]["changes"]) == []
    bad = [r for r in rows if r["c"] == "y"][0]
    assert bad["a"] is None
    changed = {c["field"] for c in bad["_airbyte_meta"]["changes"]}
    assert changed == {"a", "b"}
    assert all(
        c["change"] == "NULLED" and c["reason"] == "DESTINATION_SERIALIZATION_ERROR"
        for c in bad["_airbyte_meta"]["changes"]
    )


def test_cursor_bounded_scan(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    lo = ev.selectExpr("percentile_approx(ts, 0.5)").first()[0]
    out, hi = cursor_bounded_scan(ev, "ts", lo=lo)
    assert out.count() == ev.filter((F.col("ts") > lo)).count()
    assert out.filter(F.col("ts") > hi).isEmpty()
    # filter is pushed to the parquet scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ts" in plan


def test_composite_range_filter(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    bound = (10, 3)
    got = li.filter(composite_range_filter(["l_orderkey", "l_linenumber"], bound))
    expect = li.filter(
        (F.col("l_orderkey") > 10)
        | ((F.col("l_orderkey") == 10) & (F.col("l_linenumber") > 3))
    )
    assert got.count() == expect.count() > 0


def test_sample_scan_capped(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert sample_scan(ev, fraction=1.0).count() <= 1024


def test_watermark_filter(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    final = ev.filter(F.col("event_id") % 2 == 0)
    wm = final.agg(F.max("ts")).first()[0]
    out = incremental_watermark_filter(ev, final, "ts")
    assert out.count() == ev.filter(F.col("ts") > wm).count()


def test_plan_range_partitions(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    bounds = plan_range_partitions(ev, ["event_id"], target_rows_per_partition=200,
                                   sample_fraction=0.5)
    assert len(bounds) >= 2
    assert bounds == sorted(bounds)


def test_jsonl_csv_roundtrip(spark, tmp_table_dir):
    df = spark.createDataFrame(
        [(1, "a", bytearray(b"\x00\x01")), (2, "b", bytearray(b"\xff"))],
        "id long, s string, payload binary",
    )
    jp = os.path.join(tmp_table_dir, "j")
    write_jsonl(df, jp)
    back = read_jsonl(spark, jp, schema=StructType([
        StructField("id", LongType()), StructField("s", StringType()),
        StructField("payload", StringType()),
    ]))
    rows = {r["id"]: r["payload"] for r in back.collect()}
    assert rows[1] == "AAE="  # base64 of \x00\x01
    cp = os.path.join(tmp_table_dir, "c")
    write_csv(df, cp)
    got = read_csv(spark, cp)
    assert got.count() == 2 and "payload" in got.columns
