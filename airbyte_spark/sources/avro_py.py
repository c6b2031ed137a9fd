"""S8 — Avro Object Container File writer, pure Python, distributed.

The container lacks the spark-avro jar AND any Python avro package, so
this implements the Avro 1.11 spec directly (public format:
https://avro.apache.org/docs/1.11.1/specification/ — magic `Obj\\x01`,
metadata map with `avro.schema`/`avro.codec`, 16-byte sync marker, data
blocks of `count, byte-size, records, sync`; zigzag-varint longs,
little-endian IEEE floats, length-prefixed strings/bytes, union index +
value). Each Spark partition writes one .avro part file on the executor —
the driver never sees row data — mirroring how the reference streams
Avro parts to object storage (ObjectStorageFormattingWriter's avro
branch).

Schema mapping follows the engine's lattice (SURVEY §1.2): Spark
primitives map 1:1, timestamps become long/timestamp-micros, dates
int/date, nullable columns become ["null", T] unions, and nested
struct/array/map columns are stringified to JSON (the schemaless policy,
AirbyteTypeToIcebergSchema.kt:71-93). Field names pass through
to_avro_safe_name (Transformations.kt:50-66).

A matching decoder (`read_avro_py`) exists so round-trips are testable
without any third-party Avro dependency.
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from airbyte_spark.functions.names import to_avro_safe_name

MAGIC = b"Obj\x01"

_EPOCH_DAY_ORD = 719163  # date(1970,1,1).toordinal()


# ---------------------------------------------------------------------------
# primitive encoders (Avro spec §"Binary encoding")
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


# ---------------------------------------------------------------------------
# schema mapping
# ---------------------------------------------------------------------------


def _avro_type(dt) -> object:
    if isinstance(dt, StringType):
        return "string"
    if isinstance(dt, (LongType,)):
        return "long"
    if isinstance(dt, (IntegerType, ShortType)):
        return "int"
    if isinstance(dt, DoubleType):
        return "double"
    if isinstance(dt, FloatType):
        return "float"
    if isinstance(dt, BooleanType):
        return "boolean"
    if isinstance(dt, BinaryType):
        return "bytes"
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (StructType, ArrayType, MapType)):
        return "string"  # schemaless policy: JSON text
    raise ValueError(f"no avro mapping for {dt}")


def avro_schema_for(schema: StructType, name: str = "record") -> dict:
    fields = []
    for f in schema.fields:
        t = _avro_type(f.dataType)
        fields.append(
            {
                "name": to_avro_safe_name(f.name),
                "type": ["null", t] if f.nullable else t,
            }
        )
    return {"type": "record", "name": to_avro_safe_name(name), "fields": fields}


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _encode_value(v, dt) -> bytes:
    if isinstance(dt, StringType):
        return _enc_str(str(v))
    if isinstance(dt, LongType):
        return _zigzag(int(v))
    if isinstance(dt, (IntegerType, ShortType)):
        return _zigzag(int(v))
    if isinstance(dt, DoubleType):
        return struct.pack("<d", float(v))
    if isinstance(dt, FloatType):
        return struct.pack("<f", float(v))
    if isinstance(dt, BooleanType):
        return b"\x01" if v else b"\x00"
    if isinstance(dt, BinaryType):
        return _enc_bytes(bytes(v))
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        # datetime -> micros since epoch (timestamp-micros logical type)
        import calendar

        if v.tzinfo is not None:
            micros = int(v.timestamp() * 1_000_000)
        else:
            micros = calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
        return _zigzag(micros)
    if isinstance(dt, DateType):
        return _zigzag(v.toordinal() - _EPOCH_DAY_ORD)
    raise ValueError(f"no avro encoder for {dt}")


def _header(meta_schema_json: str, sync: bytes) -> bytes:
    out = bytearray(MAGIC)
    out += _zigzag(2)  # metadata map: one block of 2 entries
    out += _enc_str("avro.schema") + _enc_bytes(meta_schema_json.encode())
    out += _enc_str("avro.codec") + _enc_bytes(b"null")
    out += _zigzag(0)  # map end
    out += sync
    return bytes(out)


def write_avro_py(df: DataFrame, path: str, block_rows: int = 4096) -> None:
    """Write `df` as Avro OCF part files, one per Spark partition (the
    partition writes locally on its executor; no driver row traffic).
    Nested columns are stringified to JSON first (schemaless policy)."""
    os.makedirs(path, exist_ok=True)
    flat = df.select(
        *[
            F.to_json(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, (StructType, ArrayType, MapType))
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )
    schema = flat.schema
    schema_json = json.dumps(avro_schema_for(schema))
    fields = [(f.name, f.dataType, f.nullable) for f in schema.fields]

    def write_partition(rows) -> None:
        sync = uuid.uuid4().bytes
        buf = io.BytesIO()
        block = bytearray()
        n_in_block = 0
        wrote_any = False

        def flush_block():
            nonlocal block, n_in_block
            if not n_in_block:
                return
            buf.write(_zigzag(n_in_block))
            buf.write(_zigzag(len(block)))
            buf.write(bytes(block))
            buf.write(sync)
            block = bytearray()
            n_in_block = 0

        for row in rows:
            wrote_any = True
            for name, dt, nullable in fields:
                v = row[name]
                if nullable:
                    if v is None:
                        block.extend(_zigzag(0))  # union branch: null
                        continue
                    block.extend(_zigzag(1))
                block.extend(_encode_value(v, dt))
            n_in_block += 1
            if n_in_block >= block_rows:
                flush_block()
        if not wrote_any:
            return
        flush_block()
        out_path = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        with open(out_path, "wb") as fh:
            fh.write(_header(schema_json, sync))
            fh.write(buf.getvalue())

    flat.foreachPartition(write_partition)


# ---------------------------------------------------------------------------
# reader (round-trip verification without a third-party avro dependency)
# ---------------------------------------------------------------------------


def _decode_value(buf: io.BytesIO, atype) -> object:
    if isinstance(atype, list):  # union
        idx = _read_zigzag(buf)
        branch = atype[idx]
        return None if branch == "null" else _decode_value(buf, branch)
    if isinstance(atype, dict):
        lt = atype.get("logicalType")
        base = _decode_value(buf, atype["type"])
        if lt == "timestamp-micros":
            import datetime as dt

            return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=base)
        if lt == "date":
            import datetime as dt

            return dt.date.fromordinal(base + _EPOCH_DAY_ORD)
        return base
    if atype in ("long", "int"):
        return _read_zigzag(buf)
    if atype == "string":
        return buf.read(_read_zigzag(buf)).decode("utf-8")
    if atype == "bytes":
        return buf.read(_read_zigzag(buf))
    if atype == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if atype == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if atype == "boolean":
        return buf.read(1) == b"\x01"
    raise ValueError(f"no avro decoder for {atype}")


def read_avro_py(path: str) -> tuple[dict, list[dict]]:
    """Decode every part file: returns (avro schema dict, row dicts)."""
    schema = None
    rows: list[dict] = []
    for p in sorted(glob.glob(os.path.join(path, "*.avro"))):
        with open(p, "rb") as fh:
            data = fh.read()
        buf = io.BytesIO(data)
        assert buf.read(4) == MAGIC, "bad magic"
        meta: dict[str, bytes] = {}
        while True:
            n = _read_zigzag(buf)
            if n == 0:
                break
            if n < 0:  # block form with byte size
                _read_zigzag(buf)
                n = -n
            for _ in range(n):
                k = buf.read(_read_zigzag(buf)).decode()
                v = buf.read(_read_zigzag(buf))
                meta[k] = v
        schema = json.loads(meta["avro.schema"])
        sync = buf.read(16)
        while buf.tell() < len(data):
            count = _read_zigzag(buf)
            _size = _read_zigzag(buf)
            for _ in range(count):
                row = {}
                for f in schema["fields"]:
                    row[f["name"]] = _decode_value(buf, f["type"])
                rows.append(row)
            assert buf.read(16) == sync, "sync marker mismatch"
    return schema or {}, rows
