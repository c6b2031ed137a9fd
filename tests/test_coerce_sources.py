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


def test_coerce_merges_preexisting_meta_changes(spark):
    """Two-hop lineage (r2 verdict missing #2): a record arriving with
    `_airbyte_meta.changes` already populated (a source-side coercion)
    must keep those entries when destination coercion appends its own
    (IcebergUtil.kt:216-268). sync_id becomes the current hop's."""
    from airbyte_spark.functions.coerce import coerce_airbyte_record

    df = spark.createDataFrame(
        [("k1", "not-a-number"), ("k2", "7")], ["k", "amount"]
    ).withColumn(
        "_airbyte_meta",
        F.struct(
            F.lit(3).cast("long").alias("sync_id"),
            F.array(
                F.struct(
                    F.lit("upstream_col").alias("field"),
                    F.lit("NULLED").alias("change"),
                    F.lit("SOURCE_SERIALIZATION_ERROR").alias("reason"),
                )
            ).alias("changes"),
        ),
    )
    out = {
        r["k"]: r["_airbyte_meta"]
        for r in coerce_airbyte_record(
            df, {"k": "string", "amount": "integer"}, sync_id=9
        ).collect()
    }
    # both hops' changes survive, source hop first
    assert [c["field"] for c in out["k1"]["changes"]] == ["upstream_col", "amount"]
    assert [c["reason"] for c in out["k1"]["changes"]] == [
        "SOURCE_SERIALIZATION_ERROR",
        "DESTINATION_SERIALIZATION_ERROR",
    ]
    assert out["k1"]["sync_id"] == 9
    # clean row keeps only the inherited change
    assert [c["field"] for c in out["k2"]["changes"]] == ["upstream_col"]
    # coerce_columns path merges identically
    target = StructType(
        [StructField("k", StringType()), StructField("amount", LongType())]
    )
    out2 = {
        r["k"]: [c["field"] for c in r["_airbyte_meta"]["changes"]]
        for r in coerce_columns(df, target, sync_id=9).collect()
    }
    assert out2 == {"k1": ["upstream_col", "amount"], "k2": ["upstream_col"]}


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


def test_coerce_type_matrix(spark):
    """Full Airbyte lattice matrix (AirbyteValueCoercer.kt:82-255;
    testBasicTypes/testNumericTypes/testContainerTypes/testUnions analogs,
    BasicFunctionalityIntegrationTest.kt:3615-4544): each row = one source
    value class through one declared type, asserting the coerced value and
    whether a NULLED change record is captured."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from airbyte_spark.functions.coerce import (
        AIRBYTE_SPARK_TYPES,
        coerce_airbyte_record,
        coerce_airbyte_value,
    )

    df = spark.createDataFrame(
        [
            Row(
                s_int="42",
                s_big="99999999999999999999999999",  # > int64
                s_dec="12.5",
                s_sci="1e3",
                s_bool="true",
                d_exact=12.0,
                d_frac=12.5,
                d_huge=1e20,
                i_small=7,
                b_true=True,
                s_date="2024-01-15",
                s_ts_off="2024-01-15T12:00:00+05:30",
                s_ts_naked="2024-01-15 12:00:00",
                s_bad_date="2024/01/15",
                s_time="12:34:56.123",
                s_time_off="12:34:56+01:00",
                s_bad_time="not a time",
                obj=Row(a=1, b="x"),
                arr=[1, 2, 3],
            )
        ]
    )
    types = {f.name: f.dataType for f in df.schema.fields}

    def one(col, atype):
        return df.select(
            coerce_airbyte_value(F.col(col), types[col], atype).alias("v")
        ).first()["v"]

    # -- integer lattice row (coerceInt :84-92)
    assert one("s_int", "integer") == 42
    assert one("s_big", "integer") is None          # BigInteger > int64 -> NULL
    assert one("s_dec", "integer") is None          # "12.5" not a BigInteger
    assert one("d_exact", "integer") == 12          # NumberValue exact -> int
    assert one("d_frac", "integer") is None         # toBigIntegerExact fails
    assert one("d_huge", "integer") is None         # beyond int64 -> NULL
    assert one("b_true", "integer") is None         # bool never int
    # -- number row (coerceNumber :94-100)
    assert one("s_dec", "number") == 12.5
    assert one("s_sci", "number") == 1000.0         # BigDecimal sci notation
    assert one("i_small", "number") == 7.0
    assert one("b_true", "number") is None
    # -- boolean row (requireType :82)
    assert one("b_true", "boolean") is True
    assert one("s_bool", "boolean") is None         # strings never coerce
    assert one("i_small", "boolean") is None
    # -- string row (coerceString :102-125): everything upcasts
    assert one("i_small", "string") == "7"
    assert one("b_true", "string") == "true"
    assert one("obj", "string") == '{"a":1,"b":"x"}'
    assert one("arr", "string") == "[1,2,3]"
    # -- date row (coerceDate :127-134)
    assert one("s_date", "date") == dt.date(2024, 1, 15)
    assert one("s_bad_date", "date") is None        # non-ISO -> NULL
    assert one("i_small", "date") is None
    # -- timestamp rows (coerceTimestampTz/Ntz :168-219)
    assert one("s_ts_off", "timestamp_tz") == dt.datetime(2024, 1, 15, 6, 30)
    assert one("s_ts_naked", "timestamp_tz") == dt.datetime(2024, 1, 15, 12, 0)
    # NTZ keeps the WRITTEN wall time, offset dropped (:182)
    assert one("s_ts_off", "timestamp_ntz") == dt.datetime(2024, 1, 15, 12, 0)
    assert one("s_bad_date", "timestamp_tz") is None
    # -- time rows (coerceTimeTz/Ntz :136-166): canonical strings
    assert one("s_time", "time_ntz") == "12:34:56.123000"
    assert one("s_time_off", "time_ntz") == "12:34:56.000000"  # offset dropped
    assert one("s_time", "time_tz") == "12:34:56.123000+00:00"  # assume UTC
    assert one("s_time_off", "time_tz") == "11:34:56.000000+00:00"  # to UTC
    # hour-only ISO offset must convert, not silently read as UTC
    df_h = spark.createDataFrame([("13:00:00+05",)], ["t"])
    from pyspark.sql.types import StringType as _S

    got_h = df_h.select(
        coerce_airbyte_value(F.col("t"), _S(), "time_tz").alias("v")
    ).first()["v"]
    assert got_h == "08:00:00.000000+00:00"
    assert one("s_bad_time", "time_ntz") is None
    # -- union/object/array rows (:59-75): passthrough as JSON text
    assert one("obj", "union") == '{"a":1,"b":"x"}'
    assert one("arr", "array") == "[1,2,3]"
    assert one("s_int", "unknown") == "42"

    # -- change capture end-to-end: bad values NULL + NULLED record
    declared = {
        "s_big": "integer",
        "d_frac": "integer",
        "s_int": "integer",
        "s_bool": "boolean",
        "s_time": "time_ntz",
        "missing_col": "number",
    }
    out = coerce_airbyte_record(df, declared, sync_id=9).first()
    assert out["s_big"] is None and out["d_frac"] is None
    assert out["s_int"] == 42 and out["missing_col"] is None
    assert out["s_time"] == "12:34:56.123000"
    changed = {c["field"] for c in out["_airbyte_meta"]["changes"]}
    # missing_col is a schema gap, not a value error -> no change entry
    assert changed == {"s_big", "d_frac", "s_bool"}
    assert all(
        c["change"] == "NULLED"
        and c["reason"] == "DESTINATION_SERIALIZATION_ERROR"
        for c in out["_airbyte_meta"]["changes"]
    )
    assert out["_airbyte_meta"]["sync_id"] == 9
    # physical schema honors the lattice mapping
    got_types = dict(
        coerce_airbyte_record(df, declared).drop("_airbyte_meta").dtypes
    )
    assert got_types["s_big"] == "bigint" and got_types["missing_col"] == "double"
