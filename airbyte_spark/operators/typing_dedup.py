"""Destinations-V2 typing & deduping: raw JSON table → typed, deduped
final table, incrementally.

The reference lands every record append-only in a RAW table
(`_airbyte_raw_id`, `_airbyte_data` JSON, `_airbyte_extracted_at`,
`_airbyte_generation_id`) and then runs "typing and deduping": parse +
safe-cast `_airbyte_data` to the declared stream schema capturing
per-field errors into `_airbyte_meta.changes`, keep the latest record
per PK (cursor, then extracted_at), and upsert the result into the
FINAL table (docs/platform/using-airbyte/core-concepts/
typing-deduping.md; the CDK's TypeAndDedupeTransaction /
DefaultTyperDeduper lifecycle). Here both tiers are lake tables and the
pieces are the engine's own: `coerce_airbyte_record` (type lattice +
meta capture), `merge_into` (salted W1 dedup + cursor resolution).

Scale redesign (deliberate divergence, documented): the reference marks
progress by UPDATE-ing `_airbyte_loaded_at` on every typed raw row —
per-row updates on an immutable-file lake would CoW-rewrite the whole
raw table every sync. We record the raw table's SNAPSHOT ID as the
typed watermark in the final table's properties instead; the next run
slices `scan_incremental(watermark)` — pure manifest-sequence metadata,
O(batch), zero raw rewrites. Late-arriving data stays safe because
slice membership is by COMMIT, not by timestamp. `reset` (the
loaded_at-nulling "rebuild final table" path, e.g. after a destination
bug) is dropping the watermark property.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.functions.coerce import (
    AIRBYTE_SPARK_TYPES,
    coerce_airbyte_record,
)
from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.operators.merge import MergeResult, merge_into

TD_WATERMARK_PROP = "td.raw-snapshot-watermark"

#: Destinations-V2 raw table shape (AirbyteRecordMessage landing zone).
RAW_SCHEMA = StructType(
    [
        StructField("_airbyte_raw_id", StringType(), False),
        StructField("_airbyte_data", StringType()),
        StructField("_airbyte_extracted_at", TimestampType()),
        StructField("_airbyte_generation_id", LongType()),
    ]
)


def create_raw_table(spark, root: str, **kwargs) -> LakeTable:
    """The raw tier: append-only, PK = raw id (never deduped), stats on
    the extraction cursor so incremental slices prune."""
    return LakeTable.create(
        spark,
        root,
        RAW_SCHEMA,
        primary_key=["_airbyte_raw_id"],
        stats_columns=["_airbyte_raw_id", "_airbyte_extracted_at"],
        **kwargs,
    )


def final_table_schema(declared: dict[str, str]) -> StructType:
    """Physical schema of the final tier for a declared stream: typed
    user columns + the V2 meta columns the merge carries."""
    fields = [
        StructField(name, AIRBYTE_SPARK_TYPES[atype])
        for name, atype in declared.items()
    ]
    fields += [
        StructField("_airbyte_raw_id", StringType()),
        StructField("_airbyte_extracted_at", TimestampType()),
        StructField("_airbyte_generation_id", LongType()),
        StructField(
            "_airbyte_meta",
            StructType(
                [
                    StructField("sync_id", LongType()),
                    StructField(
                        "changes",
                        ArrayType(
                            StructType(
                                [
                                    StructField("field", StringType()),
                                    StructField("change", StringType()),
                                    StructField("reason", StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
    return StructType(fields)


@dataclass
class TypeDedupResult:
    raw_rows: int
    merge: MergeResult | None
    raw_snapshot_id: str
    noop: bool = False


def type_and_dedup(
    raw: LakeTable,
    final: LakeTable,
    declared: dict[str, str],
    cursor: str | None = None,
    sync_id: int = 0,
    min_generation_id: int | None = None,
    branch: str = MAIN,
    merge_mode: str = "mor",
) -> TypeDedupResult:
    """One T+D pass: slice raw commits past the watermark, parse + coerce
    `_airbyte_data` to `declared` (JSON-schema airbyte types), MERGE into
    `final` (PK/cursor resolution, intra-batch W1 dedup), then advance
    the watermark to the raw snapshot the slice was pinned to.

    `min_generation_id` drops raw rows from older generations (the
    truncate-refresh filter, P5). `cursor` names a DECLARED column; the
    merge falls back to `_airbyte_extracted_at` ordering when None."""
    wm = final.properties.get(TD_WATERMARK_PROP)
    head = raw.current_snapshot_id(branch)
    if wm == head:
        return TypeDedupResult(0, None, head, noop=True)
    sliced = (
        raw.scan_incremental(wm, branch=branch, to_snapshot_id=head)
        if wm
        else raw.scan(branch=branch, snapshot_id=head)
    )
    if min_generation_id is not None:
        sliced = sliced.filter(
            F.col("_airbyte_generation_id") >= min_generation_id
        )
    # parse the JSON blob to all-string fields; the type lattice does the
    # real casting so every failure is captured per-field, not per-row
    json_schema = StructType(
        [StructField(n, StringType()) for n in declared]
    )
    parsed = sliced.select(
        F.from_json("_airbyte_data", json_schema).alias("_d"),
        "_airbyte_raw_id",
        "_airbyte_extracted_at",
        "_airbyte_generation_id",
    ).select("_d.*", "_airbyte_raw_id", "_airbyte_extracted_at", "_airbyte_generation_id")
    # persist the typed batch: the emptiness probe and the merge must not
    # each recompute the JSON parse + coercion over the slice
    typed = coerce_airbyte_record(parsed, declared, sync_id=sync_id).persist()
    try:
        n = typed.count()
        if n == 0:
            final.set_properties({TD_WATERMARK_PROP: head})
            return TypeDedupResult(0, None, head, noop=True)
        res = merge_into(
            final,
            typed,
            cursor_col=cursor,
            mode=merge_mode,
        )
    finally:
        typed.unpersist()
    final.set_properties({TD_WATERMARK_PROP: head})
    return TypeDedupResult(n, res, head)


def reset_typing(final: LakeTable) -> None:
    """Forget typed progress (the reference's soft reset: NULL every
    `_airbyte_loaded_at`): the next pass re-types the whole raw table —
    safe because the merge is idempotent per (PK, cursor, raw_id)."""
    final.set_properties({TD_WATERMARK_PROP: None})
