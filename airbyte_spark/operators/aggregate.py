"""Metadata-only aggregate pushdown over manifest stats.

Iceberg's Spark integration answers `COUNT(*)` / `MIN` / `MAX` from
manifest file stats without touching data files when no row-level
deletes apply (`spark.sql.iceberg.aggregate-push-down.enabled`,
org.apache.iceberg.spark.source.SparkScanBuilder#pushAggregation); the
reference destination delegates table reads to that library
(airbyte-cdk/bulk/toolkits/load-iceberg-parquet). At 100 TB this is the
difference between a metadata sum over ~200k manifest entries and a
full-table scan: `SELECT count(*)` on a petabyte table becomes
milliseconds.

This module re-expresses that as a HYBRID plan, which is strictly more
useful than Iceberg's all-or-nothing fallback:

- files whose stats fully answer every requested aggregate and which no
  live delete can touch are folded driver-side from their manifest
  entries (rows / min / max / null_count — zero Spark jobs);
- every other file (delete-hit by the sequence+range+bloom test,
  straddling a `key_range` bound, written under an older partition
  spec, or simply missing stats for a requested column) joins a
  RESIDUAL SCAN that reads only those files — deletes applied, bounds
  enforced row-level — and the two halves combine exactly.

MIN/MAX from stats are restricted to numeric / temporal / decimal
columns: parquet writers may TRUNCATE binary (string) min/max, so a
string stat is an enclosing bound, not necessarily an attained value —
string extremes always come from the residual scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from airbyte_spark.lake.format import DataFileEntry
from airbyte_spark.lake.table import (
    MAIN,
    LakeTable,
    _intersects,
    coerce_stat_value,
    partition_matches,
)

# types whose parquet footer min/max are exact attained values AND that
# coerce_stat_value can round-trip from manifest JSON (writers may
# truncate binary stats, so strings are excluded by design)
_STAT_EXACT_TYPES = (
    ByteType,
    ShortType,
    IntegerType,
    LongType,
    FloatType,
    DoubleType,
    DecimalType,
    DateType,
    TimestampType,
    TimestampNTZType,
)

_FNS = ("count", "min", "max")


@dataclass
class AggregateReport:
    """How the plan split: `meta_files` answered from manifest stats,
    `scanned_files` read by the residual scan (and why)."""

    meta_files: int = 0
    scanned_files: int = 0
    meta_rows: int = 0
    scan_reasons: dict = field(default_factory=dict)  # reason -> file count


def _alias(fn: str, col: str) -> str:
    return f"{fn}_star" if col == "*" else f"{fn}_{col}"


def _validate(aggs, schema) -> None:
    names = set(schema.fieldNames())
    for fn, col in aggs:
        if fn not in _FNS:
            raise ValueError(f"unsupported aggregate {fn!r} (use {_FNS})")
        if col == "*":
            if fn != "count":
                raise ValueError(f"{fn}(*) is not an aggregate; use a column")
        elif col not in names:
            raise ValueError(f"unknown column {col!r}")


def _stats_answer(entry: DataFileEntry, aggs, schema) -> bool:
    """Can this entry's manifest stats answer EVERY requested aggregate?"""
    for fn, col in aggs:
        if col == "*":
            continue  # count(*) needs only entry.rows
        st = entry.stats.get(col)
        if fn == "count":
            # count(col) = rows - null_count; needs the null count
            if not st or st.get("null_count") is None:
                return False
            continue
        if not st or st.get("min") is None:
            return False
        if not isinstance(schema[col].dataType, _STAT_EXACT_TYPES):
            return False
        try:
            coerce_stat_value(st["min"], schema[col].dataType)
            coerce_stat_value(st["max"], schema[col].dataType)
        except (ValueError, TypeError, ArithmeticError):
            return False
    return True


def _within(entry: DataFileEntry, col: str, lo, hi, dt) -> bool:
    """True only if the file's [min,max] for `col` lies FULLY inside
    [lo,hi] — then every row passes the range predicate and the file
    stays metadata-eligible. Missing/uncoercible stats -> False."""
    st = entry.stats.get(col)
    if not st or st.get("min") is None:
        return False
    try:
        mn = coerce_stat_value(st["min"], dt)
        mx = coerce_stat_value(st["max"], dt)
        lo = coerce_stat_value(lo, dt)
        hi = coerce_stat_value(hi, dt)
        return lo <= mn and mx <= hi
    except (ValueError, TypeError, ArithmeticError):
        return False


def scan_aggregate(
    table: LakeTable,
    aggs: list[tuple[str, str]],
    branch: str = MAIN,
    snapshot_id: str | None = None,
    partition_filter: dict | None = None,
    key_range: tuple[str, object, object] | None = None,
    report: AggregateReport | None = None,
) -> DataFrame:
    """COUNT(*) / COUNT(col) / MIN(col) / MAX(col) at a snapshot, answered
    from manifest stats wherever possible (see module docstring). Returns
    a ONE-ROW DataFrame whose columns are `count_star` / `count_<col>` /
    `min_<col>` / `max_<col>` in the order requested; `report`, when
    given, records how many files each half of the hybrid plan covered.

    Semantics are exactly `table.scan(...)` followed by the same
    aggregates: MIN/MAX ignore NULLs (parquet stats already exclude
    them), `count(col)` counts non-NULL rows, and an empty selection
    yields count 0 with NULL extremes.
    """
    aggs = [tuple(a) for a in aggs]
    schema = table.schema(branch=branch, snapshot_id=snapshot_id)
    _validate(aggs, schema)
    rep = report if report is not None else AggregateReport()

    partition_filter = table.resolve_partition_filter(partition_filter)
    live = table.all_files(
        branch=branch,
        snapshot_id=snapshot_id,
        partition_filter=partition_filter,
        key_range=key_range,
    )
    entries = [e for e in live if e.content == "data"]
    eq_deletes = [e for e in live if e.content == "equality-deletes"]
    pos_deletes = [e for e in live if e.content == "position-deletes"]

    if key_range is not None:
        col, lo, hi = key_range
        dt = schema[col].dataType
        entries = [e for e in entries if _intersects(e.stats.get(col), lo, hi, dt)]
        eq_deletes = [
            d for d in eq_deletes if _intersects(d.stats.get(col), lo, hi, dt)
        ]

    # ---- split: metadata-eligible vs residual scan --------------------
    meta: list[DataFileEntry] = []
    residual: list[DataFileEntry] = []

    def _to_scan(e: DataFileEntry, reason: str) -> None:
        residual.append(e)
        rep.scan_reasons[reason] = rep.scan_reasons.get(reason, 0) + 1

    pk = table.primary_key
    min_data_seq = min((e.sequence or 0 for e in entries), default=0)
    live_eq = [d for d in eq_deletes if (d.sequence or 0) > min_data_seq]
    pos_union: set[str] | None = set()
    for d in pos_deletes:
        if d.referenced is None:
            pos_union = None  # over-cap writer fallback: applies everywhere
            break
        pos_union.update(d.referenced)

    from airbyte_spark.operators.cluster import delete_may_hit

    bloom_cache: dict = {}
    for e in entries:
        if partition_filter:
            missing = [c for c in partition_filter if c not in e.partition]
            if not missing and not partition_matches(e, partition_filter):
                continue  # layout-pruned outright
            if missing:
                # older partition spec: the layout can't prune it — the
                # residual scan enforces the predicate row-level
                _to_scan(e, "partition-evolution")
                continue
        if key_range is not None:
            col, lo, hi = key_range
            if not _within(e, col, lo, hi, schema[col].dataType):
                _to_scan(e, "key-range-straddle")
                continue
        if pos_deletes and (pos_union is None or e.path in pos_union):
            _to_scan(e, "position-delete")
            continue
        if any(
            delete_may_hit(e, d, pk, schema, cache=bloom_cache) for d in live_eq
        ):
            _to_scan(e, "equality-delete")
            continue
        if not _stats_answer(e, aggs, schema):
            _to_scan(e, "missing-stats")
            continue
        meta.append(e)

    rep.meta_files = len(meta)
    rep.scanned_files = len(residual)
    rep.meta_rows = sum(e.rows for e in meta)

    # ---- metadata half -------------------------------------------------
    vals: dict[str, object] = {}
    for fn, col in aggs:
        a = _alias(fn, col)
        if col == "*":
            vals[a] = sum(e.rows for e in meta)
        elif fn == "count":
            vals[a] = sum(e.rows - e.stats[col]["null_count"] for e in meta)
        else:
            dt = schema[col].dataType
            bounds = [coerce_stat_value(e.stats[col][fn], dt) for e in meta]
            vals[a] = (min if fn == "min" else max)(bounds) if bounds else None

    # ---- residual scan half ---------------------------------------------
    if residual:
        df = table.read_entries(
            residual, schema, deletes=live_eq + pos_deletes
        )
        if key_range is not None:
            col, lo, hi = key_range
            df = df.filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
        if partition_filter and rep.scan_reasons.get("partition-evolution"):
            # row-level twin of the layout rule (same expression the
            # writer lays dirs out with) — exact-matched files satisfy
            # it trivially, pre-evolution files get the real predicate
            from airbyte_spark.lake.table import partition_str
            from airbyte_spark.lake.transforms import fields_by_key, partition_expr

            fmap = fields_by_key(table.partition_fields())
            for c, v in partition_filter.items():
                fld = fmap.get(c)
                if fld is not None and fld.source in schema.fieldNames():
                    expr = partition_expr(fld, schema[fld.source].dataType)
                else:
                    expr = F.col(c).cast("string")
                sv = partition_str(v)
                df = df.filter(
                    expr.isNull() if sv is None else expr == F.lit(sv)
                )
        scan_exprs = []
        for fn, col in aggs:
            a = _alias(fn, col)
            if col == "*":
                scan_exprs.append(F.count(F.lit(1)).alias(a))
            elif fn == "count":
                scan_exprs.append(F.count(F.col(col)).alias(a))
            else:
                scan_exprs.append(getattr(F, fn)(F.col(col)).alias(a))
        row = df.agg(*scan_exprs).collect()[0]  # one row of scalars
        for fn, col in aggs:
            a = _alias(fn, col)
            sv = row[a]
            if fn == "count":
                vals[a] = (vals[a] or 0) + (sv or 0)
            elif sv is not None:
                mv = vals[a]
                if mv is None:
                    vals[a] = sv
                else:
                    vals[a] = (min if fn == "min" else max)(mv, sv)

    # ---- one-row result, typed exactly like the scan would be -----------
    fields, out = [], []
    for fn, col in aggs:
        a = _alias(fn, col)
        dt = LongType() if fn == "count" else schema[col].dataType
        fields.append(StructField(a, dt, True))
        out.append(vals[a])
    return table.spark.createDataFrame([tuple(out)], StructType(fields))
