"""Typed coercion with per-field error capture into `_airbyte_meta.changes`.

Airbyte coerces every record field to the declared stream type; a failed
coercion becomes NULL plus an entry in `_airbyte_meta.changes`
(AirbyteValueCoercer.kt:37-255; change capture IcebergUtil.kt:216-268;
documented in docs/platform/understanding-airbyte/airbyte-metadata-fields
.md:17-40). Spark realization: `try_cast`-style expressions —
`when(cast(col) IS NULL AND col IS NOT NULL, record change)` — all
JVM-side, whole-stage-codegen'd; zero Python.

Airbyte type lattice -> Spark (SURVEY.md §1.2): string/bool passthrough,
integer -> long, number -> double, date/timestamp parsed (ISO-8601 fast
path AirbyteValueCoercer.kt:168-200), schemaless object/array/union ->
JSON string (to_json), unknown -> NULL + change entry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

from airbyte_spark.datagen import META_CHANGE

CHANGE_NULLED = "NULLED"
REASON_SERIALIZATION = "DESTINATION_SERIALIZATION_ERROR"


def _try_cast(col: Column, dt: DataType) -> Column:
    return col.try_cast(dt)


def coerce_columns(
    df: DataFrame,
    target: StructType,
    sync_id: int = 0,
    meta_col: str = "_airbyte_meta",
) -> DataFrame:
    """Coerce every target column; failures become NULL + a change entry.

    Columns present in `df` but absent from `target` are dropped; columns
    absent from `df` become NULL (no change entry — schema mismatch, not a
    value error). The `_airbyte_meta` struct is (re)built with sync_id and
    the concatenated change list (Meta.kt:37 shape).
    """
    out_cols: list[Column] = []
    change_cols: list[Column] = []
    have = set(df.columns)
    for f in target.fields:
        if f.name.startswith("_airbyte"):
            continue
        if f.name not in have:
            out_cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = F.col(f.name)
        coerced = _try_cast(src, f.dataType)
        out_cols.append(coerced.alias(f.name))
        # value present but uncastable -> NULLED change record
        change_cols.append(
            F.when(
                src.isNotNull() & coerced.isNull(),
                F.struct(
                    F.lit(f.name).alias("field"),
                    F.lit(CHANGE_NULLED).alias("change"),
                    F.lit(REASON_SERIALIZATION).alias("reason"),
                ),
            )
        )
    passthrough = [
        F.col(c) for c in df.columns if c.startswith("_airbyte") and c != meta_col
    ]
    meta = _merged_meta(df, change_cols, sync_id, meta_col)
    return df.select(*out_cols, *passthrough, meta)


def _merged_meta(
    df: DataFrame, change_cols: list[Column], sync_id: int, meta_col: str
) -> Column:
    """The output `_airbyte_meta` struct: new coercion changes APPENDED to
    any changes the record already carries (a two-hop pipeline — source
    nulled a field, destination nulls another — must keep both
    generations' lineage; IcebergUtil.kt:216-268 builds meta from
    `record.rawData.meta` changes + new entries). sync_id is the CURRENT
    sync's, same as the reference."""
    new_changes = (
        F.filter(F.array(*change_cols), lambda c: c.isNotNull())
        if change_cols
        else F.array()
    ).cast(ArrayType(META_CHANGE))
    if meta_col in df.columns:
        prior = F.coalesce(
            F.col(f"{meta_col}.changes").cast(ArrayType(META_CHANGE)),
            F.array().cast(ArrayType(META_CHANGE)),
        )
        changes = F.concat(prior, new_changes)
    else:
        changes = new_changes
    return F.struct(
        F.lit(sync_id).cast("long").alias("sync_id"),
        changes.alias("changes"),
    ).alias(meta_col)


def stringify_schemaless(col: Column) -> Column:
    """Schemaless object/array/union -> JSON string (IcebergUtil.kt:138-158,
    AirbyteTypeToIcebergSchema.kt:71-93)."""
    return F.to_json(col)


# ---------------------------------------------------------------------------
# full Airbyte type lattice (AirbyteValueCoercer.kt:38-255)
# ---------------------------------------------------------------------------

from pyspark.sql.types import (  # noqa: E402
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    LongType,
    MapType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

#: Airbyte logical type -> Spark physical type. Time types have no Spark
#: column type; they are stored as canonical strings (HH:mm:ss.SSSSSS, with
#: a +00:00 suffix for the tz flavor), exactly the textual form Iceberg's
#: time microseconds render to. Schemaless object/array/union/unknown are
#: stored as JSON strings (AirbyteTypeToIcebergSchema.kt:71-93).
AIRBYTE_SPARK_TYPES = {
    "boolean": BooleanType(),
    "integer": LongType(),
    "number": DoubleType(),
    "string": StringType(),
    "date": DateType(),
    "timestamp_tz": TimestampType(),
    "timestamp_ntz": TimestampNTZType(),
    "time_tz": StringType(),
    "time_ntz": StringType(),
    "object": StringType(),
    "array": StringType(),
    "union": StringType(),
    "unknown": StringType(),
}

_TIME_LOCAL_RE = r"^(\d{1,2}:\d{2}(:\d{2})?(\.\d{1,9})?)"


def _time_parts(col: Column) -> tuple[Column, Column]:
    """(local time string, offset string) split of a time literal."""
    local = F.regexp_extract(col, _TIME_LOCAL_RE, 1)
    # ISO-8601 offsets: +05, +0530, +05:30, Z — an hour-only offset that
    # slipped the regex would silently read as "assume UTC" (wrong value,
    # no change record)
    off = F.regexp_extract(col, r"([+-]\d{2}(:?\d{2})?|[zZ])$", 1)
    return local, off


def coerce_airbyte_value(col: Column, src_type, airbyte_type: str) -> Column:
    """One column through the Airbyte coercion lattice: returns the value in
    the declared type's Spark physical form, NULL when the reference would
    null it (AirbyteValueCoercer.kt:82-255). All expressions — zero Python.

    Matrix highlights, verified against the reference:
    - boolean: BooleanValue only — strings/numbers NULL (requireType, :82)
    - integer: exact integers only — NumberValue 12.5 NULLs
      (toBigIntegerExact, :88), string "12.0" NULLs (BigInteger parse,
      :90), and anything beyond int64 NULLs (overflow capture)
    - number: numeric + BigDecimal-parsable strings (scientific ok, :94)
    - string: everything upcasts; containers via to_json (:102-125)
    - date / timestamp±tz: ISO-8601 parse (the reference's ITU fast path,
      :190-219, is Spark's native codegen'd cast here); timestamps without
      zone assume UTC (:213); NTZ keeps the written wall time (:182)
    - time±tz: canonical HH:mm:ss.SSSSSS strings; tz flavor converts to
      UTC and suffixes +00:00, missing offset assumes UTC (:136-166)
    - object/array/union/unknown: passthrough as JSON text (:59-75)
    """
    if airbyte_type == "boolean":
        if isinstance(src_type, BooleanType):
            return col
        return F.lit(None).cast("boolean")
    if airbyte_type == "integer":
        if isinstance(src_type, (FloatType, DoubleType, DecimalType)):
            return F.when(col == F.floor(col), col.try_cast("long"))
        if isinstance(src_type, BooleanType):
            return F.lit(None).cast("long")
        return col.try_cast("long")  # integral widen / strict string parse
    if airbyte_type == "number":
        if isinstance(src_type, BooleanType):
            return F.lit(None).cast("double")
        return col.try_cast("double")
    if airbyte_type == "string":
        if isinstance(src_type, (StructType, ArrayType, MapType)):
            return F.to_json(col)
        return col.cast("string")
    if airbyte_type == "date":
        if isinstance(src_type, DateType):
            return col
        if isinstance(src_type, StringType):
            return col.try_cast("date")
        return F.lit(None).cast("date")
    if airbyte_type == "timestamp_tz":
        if isinstance(src_type, (TimestampType, TimestampNTZType)):
            return col.cast("timestamp")  # NTZ interpreted in UTC session
        if isinstance(src_type, StringType):
            return col.try_cast("timestamp")
        return F.lit(None).cast("timestamp")
    if airbyte_type == "timestamp_ntz":
        if isinstance(src_type, (TimestampType, TimestampNTZType)):
            return col.cast("timestamp_ntz")
        if isinstance(src_type, StringType):
            # Spark's string->NTZ cast keeps the WRITTEN wall time and drops
            # the offset — the reference's offsetDateTime().toLocalDateTime()
            return col.try_cast("timestamp_ntz")
        return F.lit(None).cast("timestamp_ntz")
    if airbyte_type in ("time_tz", "time_ntz"):
        if not isinstance(src_type, StringType):
            return F.lit(None).cast("string")
        local, off = _time_parts(col)
        if airbyte_type == "time_ntz":
            # LocalTime.parse semantics: offset (if any) is dropped
            ts = F.try_to_timestamp(F.concat(F.lit("1970-01-01 "), local))
            return F.when(local != "", F.date_format(ts, "HH:mm:ss.SSSSSS"))
        # tz flavor: resolve to UTC; missing offset assumes UTC
        full = F.concat(
            F.lit("1970-01-01T"),
            local,
            F.when(off == "", F.lit("Z")).otherwise(off),
        )
        ts = F.try_to_timestamp(full)  # session tz = UTC -> UTC wall time
        return F.when(
            local != "",
            F.concat(F.date_format(ts, "HH:mm:ss.SSSSSS"), F.lit("+00:00")),
        )
    if airbyte_type in ("object", "array", "union", "unknown"):
        if isinstance(src_type, (StructType, ArrayType, MapType)):
            return F.to_json(col)
        return col.cast("string")
    raise ValueError(f"unknown airbyte type {airbyte_type!r}")


def coerce_airbyte_record(
    df: DataFrame,
    declared: dict[str, str],
    sync_id: int = 0,
    meta_col: str = "_airbyte_meta",
) -> DataFrame:
    """Coerce a record batch to its declared Airbyte stream types with
    per-field change capture: a non-null input that nulls under coercion
    becomes NULL + a `NULLED / DESTINATION_SERIALIZATION_ERROR` entry in
    `_airbyte_meta.changes` (IcebergUtil.kt:216-268). Declared columns the
    batch lacks become typed NULLs without a change entry."""
    src_types = {f.name: f.dataType for f in df.schema.fields}
    out_cols: list[Column] = []
    change_cols: list[Column] = []
    for name, atype in declared.items():
        phys = AIRBYTE_SPARK_TYPES[atype]
        if name not in src_types:
            out_cols.append(F.lit(None).cast(phys).alias(name))
            continue
        src = F.col(name)
        coerced = coerce_airbyte_value(src, src_types[name], atype)
        out_cols.append(coerced.cast(phys).alias(name))
        change_cols.append(
            F.when(
                src.isNotNull() & coerced.isNull(),
                F.struct(
                    F.lit(name).alias("field"),
                    F.lit(CHANGE_NULLED).alias("change"),
                    F.lit(REASON_SERIALIZATION).alias("reason"),
                ),
            )
        )
    passthrough = [
        F.col(c) for c in df.columns if c.startswith("_airbyte") and c != meta_col
    ]
    meta = _merged_meta(df, change_cols, sync_id, meta_col)
    return df.select(*out_cols, *passthrough, meta)
