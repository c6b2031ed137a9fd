"""SCD2 materialization — a persistent Type-2 slowly-changing-dimension
table maintained incrementally per batch.

Mirrors the reference's normalization SCD model (base-normalization
stream_processor.py:869-997):

- `_airbyte_unique_key`      = surrogate md5 of the source primary key
- `_airbyte_start_at`        = the record version's cursor value
- `_airbyte_end_at`          = lag(cursor) over (pk ORDER BY cursor DESC
                               NULLS LAST, extracted_at DESC) — the next
                               newer version's cursor (NULL = open-ended)
- `_airbyte_active_row`      = 1 for the newest non-CDC-deleted version
- `_airbyte_unique_key_scd`  = surrogate md5 of (unique_key, start_at,
                               extracted_at) — the SCD table's own PK
- dedup disambiguation (W3)  = row_number over the scd key ORDER BY
                               active_row DESC, raw_id — exact replica of
                               the reference's dedup_data CTE (:976-995)

Incremental maintenance replicates the dbt incremental branch (:915-950):
only the batch's rows plus the PREVIOUS ACTIVE versions of the touched
keys are recomputed — historical closed versions are never rewritten, so
per-batch cost is O(batch), not O(history). (Like the reference, a
late-arriving version older than an already-closed version re-end-dates
only the active chain.) The upsert into the lake table is a standard
merge_into on `_airbyte_unique_key_scd`, which inherits manifest pruning,
salting, and snapshot isolation.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.operators.merge import (
    EXTRACTED_COL,
    RAW_ID_COL,
    MergeResult,
    merge_into,
)

UNIQUE_KEY = "_airbyte_unique_key"
UNIQUE_KEY_SCD = "_airbyte_unique_key_scd"
START_AT = "_airbyte_start_at"
END_AT = "_airbyte_end_at"
ACTIVE_ROW = "_airbyte_active_row"
SCD_COLS = (UNIQUE_KEY, UNIQUE_KEY_SCD, START_AT, END_AT, ACTIVE_ROW)


def scd2_schema(source_schema: StructType, cursor_col: str) -> StructType:
    cursor_type = source_schema[cursor_col].dataType
    return StructType(
        list(source_schema.fields)
        + [
            StructField(UNIQUE_KEY, StringType(), False),
            StructField(UNIQUE_KEY_SCD, StringType(), False),
            StructField(START_AT, cursor_type, True),
            StructField(END_AT, cursor_type, True),
            StructField(ACTIVE_ROW, IntegerType(), False),
        ]
    )


def scd2_create(
    spark: SparkSession,
    root: str,
    source_schema: StructType,
    pk: list[str],
    cursor_col: str = "updated_at",
    properties: dict | None = None,
) -> LakeTable:
    """Create the persistent SCD2 lake table for a stream. The source PK
    and cursor are recorded as table properties so every scd2_apply batch
    recomputes with the same identity."""
    return LakeTable.create(
        spark,
        root,
        scd2_schema(source_schema, cursor_col),
        primary_key=[UNIQUE_KEY_SCD],
        properties={
            **(properties or {}),
            "scd.source_pk": json.dumps(pk),
            "scd.cursor": cursor_col,
        },
    )


def scd_columns(
    df: DataFrame,
    pk: list[str],
    cursor_col: str,
    cdc_col: str | None = None,
) -> DataFrame:
    """Stamp the five SCD columns onto a set of record versions (the
    scd_data CTE, stream_processor.py:960-975)."""
    w = Window.partitionBy(*pk).orderBy(
        F.desc_nulls_last(cursor_col), F.desc(EXTRACTED_COL)
    )
    active = F.row_number().over(w) == 1
    if cdc_col and cdc_col in df.columns:
        active = active & F.col(cdc_col).isNull()
    uk = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in pk]))
    return (
        df.withColumn(UNIQUE_KEY, uk)
        .withColumn(START_AT, F.col(cursor_col))
        .withColumn(END_AT, F.lag(cursor_col).over(w))
        .withColumn(ACTIVE_ROW, active.cast("int"))
        .withColumn(
            UNIQUE_KEY_SCD,
            F.md5(
                F.concat_ws(
                    "|",
                    F.col(UNIQUE_KEY),
                    F.col(START_AT).cast("string"),
                    F.col(EXTRACTED_COL).cast("string"),
                )
            ),
        )
    )


def scd2_apply(
    table: LakeTable,
    batch: DataFrame,
    cdc_col: str | None = "_ab_cdc_deleted_at",
    branch: str = MAIN,
) -> MergeResult:
    """Fold one batch of record versions into the SCD2 table.

    1. touched keys  = distinct unique_key of the batch (new_data_ids CTE)
    2. input         = batch ∪ previous ACTIVE versions of touched keys
                       (previous_active_scd_data CTE — closed versions are
                       left alone)
    3. recompute the SCD window columns over the input
    4. W3 disambiguation: one row per scd key (active first, raw_id tiebreak)
    5. upsert by _airbyte_unique_key_scd (merge_into: updated end-datings
       overwrite in place, new versions insert)
    """
    props = table.properties
    pk = json.loads(props["scd.source_pk"])
    cursor_col = props["scd.cursor"]
    tbl_schema = table.schema(branch=branch)
    source_fields = [f for f in tbl_schema.fields if f.name not in SCD_COLS]
    source_cols = [f.name for f in source_fields]
    uk = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in pk]))
    touched = batch.select(uk.alias(UNIQUE_KEY)).distinct()
    # previous actives keep their FULL stored row: a batch missing a source
    # column must not null that column on the re-end-dated incumbent — only
    # the batch's own new versions carry NULL there
    prev_active = (
        table.scan(branch=branch)
        .filter(F.col(ACTIVE_ROW) == 1)
        .join(F.broadcast(touched), on=UNIQUE_KEY, how="left_semi")
        .select(*source_cols)
    )
    have = set(batch.columns)
    aligned = batch.select(
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in have
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in source_fields
        ]
    )
    inp = aligned.unionByName(prev_active)
    scd = scd_columns(inp, pk, cursor_col, cdc_col)
    order = [F.desc(ACTIVE_ROW)] + (
        [F.asc(RAW_ID_COL)] if RAW_ID_COL in scd.columns else [F.desc(EXTRACTED_COL)]
    )
    w3 = Window.partitionBy(UNIQUE_KEY_SCD).orderBy(*order)
    scd = (
        scd.withColumn("_scd_rn", F.row_number().over(w3))
        .filter(F.col("_scd_rn") == 1)
        .drop("_scd_rn")
    )
    # upsert: recomputed versions replace their previous selves (same scd
    # key, fresh end_at/active_row); brand-new versions insert. cursor=None
    # -> extracted_at resolution, which ties -> source (recomputed) wins.
    return merge_into(table, scd, cursor_col=None, cdc_col=None, branch=branch)
