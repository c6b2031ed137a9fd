"""`discover` — the connector-lifecycle catalog-discovery operation.

The reference's lifecycle is spec / check / discover / read / write;
discover enumerates namespaces and streams, infers each stream's fields
with their JSON-schema airbyte types, and reports source-defined primary
keys — the AirbyteCatalog the platform shows the user before they
configure a sync (`airbyte-cdk/bulk/core/extract/src/main/kotlin/io/
airbyte/cdk/discover/DiscoverOperation.kt:16-49`, field/type mapping via
`MetadataQuerier`; type vocabulary per
`docs/platform/understanding-airbyte/supported-data-types.md:13-26`).

Two source shapes, mirroring the reference's split:

- ``discover_parquet_source``: a directory of ``<stream>.parquet`` files
  or datasets (the JDBC-shaped bulk-extract analog). Schema comes from
  parquet footers only — no data is read; per DiscoverOperation
  semantics a stream whose field list is empty is SKIPPED (a table we
  cannot type is not offered for sync).
- ``discover_lake``: a directory of lake tables (subdirs holding
  ``metadata/refs.json``). Fields come from the table's current
  registered schema, the primary key from table metadata — the
  destination-side discover (`toolkits/legacy-task-loader/.../discover/
  DiscoverOperation.kt:29`).

Scale note: discover is a METADATA operation — footer reads and JSON
loads on the driver, one per stream, no Spark jobs over data. A root
with thousands of streams costs thousands of footer opens, which is the
same cost class as the reference's per-table metadata queries.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class DiscoveredField:
    name: str
    json_type: str
    position: int  # 1-based, source column order


@dataclass
class DiscoveredStream:
    namespace: str
    name: str
    fields: list[DiscoveredField] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    #: cursor the source itself defines (CDC/lake tables); None = user picks
    source_defined_cursor: str | None = None


def spark_type_to_json_type(dt: T.DataType) -> str:
    """Spark type -> airbyte JSON-schema type string
    (supported-data-types.md:13-26). Binary is represented as a base64
    string in the protocol, so BinaryType maps to "string"."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "number"
    if isinstance(dt, (T.StringType, T.BinaryType, T.CharType, T.VarcharType)):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp_without_timezone"
    if isinstance(dt, T.TimestampType):
        return "timestamp_with_timezone"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    return "unknown"


def _fields_of(schema: T.StructType) -> list[DiscoveredField]:
    return [
        DiscoveredField(f.name, spark_type_to_json_type(f.dataType), i + 1)
        for i, f in enumerate(schema.fields)
    ]


def discover_parquet_source(
    spark: SparkSession, root: str, namespace: str | None = None
) -> list[DiscoveredStream]:
    """Discover every ``<name>.parquet`` file/dataset directly under
    `root` as a stream. Footer-only; empty-field streams are skipped
    (DiscoverOperation.kt:40-44 drops tables with no discoverable
    columns). Streams come back name-sorted — the reference iterates
    namespaces and tables in deterministic order so the emitted catalog
    is diffable across runs."""
    ns = namespace if namespace is not None else os.path.basename(root.rstrip("/"))
    out: list[DiscoveredStream] = []
    for entry in sorted(os.listdir(root)):
        if not entry.endswith(".parquet"):
            continue
        path = os.path.join(root, entry)
        try:
            schema = spark.read.parquet(path).schema
        except Exception:  # unreadable footer -> not a discoverable stream
            continue
        fields = _fields_of(schema)
        if not fields:
            continue
        out.append(DiscoveredStream(ns, entry[: -len(".parquet")], fields))
    return out


def discover_lake(spark: SparkSession, root: str) -> list[DiscoveredStream]:
    """Discover every lake table under `root` (one level deep): fields
    from the current registered schema, primary key from table metadata.
    Tables advertise `_airbyte_extracted_at` as the source-defined cursor
    when present (the incremental-scan cursor the loader maintains)."""
    from airbyte_spark.lake.table import LakeTable

    ns = os.path.basename(root.rstrip("/"))
    out: list[DiscoveredStream] = []
    for entry in sorted(os.listdir(root)):
        tdir = os.path.join(root, entry)
        if not os.path.exists(os.path.join(tdir, "metadata", "refs.json")):
            continue
        t = LakeTable.load(spark, tdir)
        schema = t.schema()
        fields = _fields_of(schema)
        if not fields:
            continue
        cursor = (
            "_airbyte_extracted_at"
            if "_airbyte_extracted_at" in schema.fieldNames()
            else None
        )
        out.append(
            DiscoveredStream(ns, entry, fields, list(t.primary_key), cursor)
        )
    return out


CATALOG_SCHEMA = (
    "namespace string, stream string, field string, position int, "
    "json_type string, is_pk boolean"
)


def catalog_df(spark: SparkSession, streams: list[DiscoveredStream]) -> DataFrame:
    """Flatten a discovered catalog to one row per field — the tabular
    AirbyteCatalog surface (driver-side metadata; row count = field
    count, never data-sized)."""
    rows = [
        (s.namespace, s.name, f.name, f.position, f.json_type,
         f.name in s.primary_key)
        for s in streams
        for f in s.fields
    ]
    return spark.createDataFrame(rows, CATALOG_SCHEMA)
