"""S8 — pure-Python Avro OCF writer (Avro 1.11 spec): executor-local part
files, zigzag/union/logical-type encoding, round-trip via the matching
decoder (no third-party avro dependency exists in this container)."""

import datetime as dt
import io
import json
import struct

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.sources.avro_py import (
    MAGIC,
    _zigzag,
    avro_schema_for,
    read_avro_py,
    write_avro_py,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("n", IntegerType(), True),
        StructField("x", DoubleType(), True),
        StructField("ok", BooleanType(), True),
        StructField("blob", BinaryType(), True),
        StructField("ts", TimestampType(), True),
        StructField("d", DateType(), True),
    ]
)

ROWS = [
    (1, "alpha", 7, 1.5, True, bytearray(b"\x00\xff"), dt.datetime(2026, 1, 2, 3, 4, 5), dt.date(2026, 1, 2)),
    (2, None, None, None, None, None, None, None),
    (3, "naïve 東京", -42, -0.25, False, bytearray(b""), dt.datetime(1969, 12, 31, 23, 59, 59), dt.date(1969, 12, 31)),
]


def test_zigzag_varint_spec_values():
    # pinned against the Avro spec's documented examples
    assert _zigzag(0) == b"\x00"
    assert _zigzag(-1) == b"\x01"
    assert _zigzag(1) == b"\x02"
    assert _zigzag(-2) == b"\x03"
    assert _zigzag(64) == b"\x80\x01"


def test_schema_mapping_and_sanitized_names(spark):
    df = spark.createDataFrame([(1, "x")], "id long, `2bad name` string")
    sch = avro_schema_for(df.schema)
    assert sch["fields"][0]["type"] == ["null", "long"]  # createDataFrame -> nullable
    assert sch["fields"][1]["name"] == "_2bad_name"


def test_ocf_roundtrip(spark, tmp_table_dir):
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(2)
    out = f"{tmp_table_dir}/avro"
    write_avro_py(df, out)
    schema, rows = read_avro_py(out)
    assert schema["type"] == "record"
    assert {f["name"] for f in schema["fields"]} == set(SCHEMA.fieldNames())
    by_id = {r["id"]: r for r in rows}
    assert len(by_id) == 3
    assert by_id[1]["name"] == "alpha" and by_id[1]["ok"] is True
    assert by_id[1]["blob"] == b"\x00\xff"
    assert by_id[1]["ts"] == dt.datetime(2026, 1, 2, 3, 4, 5)
    assert by_id[1]["d"] == dt.date(2026, 1, 2)
    assert all(by_id[2][k] is None for k in ("name", "n", "x", "ok", "blob", "ts", "d"))
    assert by_id[3]["name"] == "naïve 東京" and by_id[3]["n"] == -42
    assert by_id[3]["ts"] == dt.datetime(1969, 12, 31, 23, 59, 59)  # pre-epoch
    assert by_id[3]["d"] == dt.date(1969, 12, 31)


def test_ocf_container_structure(spark, tmp_table_dir):
    """Byte-level spec conformance of the container framing: magic, metadata
    map with avro.schema/avro.codec, 16-byte sync repeated per block."""
    import glob
    import os

    df = spark.createDataFrame(ROWS, SCHEMA).coalesce(1)
    out = f"{tmp_table_dir}/avro1"
    write_avro_py(df, out)
    (p,) = glob.glob(os.path.join(out, "*.avro"))
    data = open(p, "rb").read()
    assert data[:4] == MAGIC
    schema, rows = read_avro_py(out)  # decoder asserts sync markers match
    assert len(rows) == 3
    assert json.loads(json.dumps(schema))  # schema metadata is valid JSON


def test_write_avro_falls_back(spark, tmp_table_dir):
    """files.write_avro: jar absent -> transparent pure-Python fallback."""
    from airbyte_spark.sources.files import write_avro

    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, s string")
    out = f"{tmp_table_dir}/avro2"
    write_avro(df, out)
    _, rows = read_avro_py(out)
    assert {r["id"]: r["s"] for r in rows} == {1: "a", 2: None}
