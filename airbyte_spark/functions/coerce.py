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
    changes = (
        F.filter(F.array(*change_cols), lambda c: c.isNotNull())
        if change_cols
        else F.array().cast(ArrayType(META_CHANGE))
    )
    meta = F.struct(
        F.lit(sync_id).cast("long").alias("sync_id"),
        changes.cast(ArrayType(META_CHANGE)).alias("changes"),
    ).alias(meta_col)
    return df.select(*out_cols, *passthrough, meta)


def stringify_schemaless(col: Column) -> Column:
    """Schemaless object/array/union -> JSON string (IcebergUtil.kt:138-158,
    AirbyteTypeToIcebergSchema.kt:71-93)."""
    return F.to_json(col)
