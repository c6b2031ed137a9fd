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
  live delete can touch fold from their manifest entries (rows / min /
  max / null_count — no data file is opened);
- every other file (delete-hit by the sequence+range+bloom test,
  straddling a `key_range` bound, written under an older partition
  spec, or simply missing stats for a requested column) joins a
  RESIDUAL SCAN that reads only those files — deletes applied, bounds
  enforced row-level — and the two halves combine exactly.

Past `cluster.planning.distributed-threshold` live entries (the shared
planning knob, same reuse as eq->pos retirement) the split itself runs
on EXECUTORS over `entries_df` (Iceberg SparkDistributedDataScan
analog): each worker classifies its manifest slice with the same
per-entry predicates — bloom sidecars probed locally — and ships back
one partial-aggregate row per batch plus only the residual entries, so
the driver never materializes an O(table) file list.

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
    StringType,
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
_DROP = "__drop__"  # classifier verdict: file contributes nothing


@dataclass
class AggregateReport:
    """How the plan split: `meta_files` answered from manifest stats,
    `scanned_files` read by the residual scan (and why); `planning`
    records which path classified the entries."""

    meta_files: int = 0
    scanned_files: int = 0
    meta_rows: int = 0
    scan_reasons: dict = field(default_factory=dict)  # reason -> file count
    planning: str = "driver"


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


@dataclass
class _Ctx:
    """Everything the per-entry classifier needs — picklable, so the
    distributed path can ship it whole into a mapInPandas closure."""

    aggs: list
    schema: StructType
    partition_filter: dict | None
    key_range: tuple | None
    pk: list
    live_eq: list  # eq-delete DataFileEntry objects (O(debt), small)
    pos_union: set | None  # None = unknown inventory, hits everything
    has_pos: bool


def _classify(e: DataFileEntry, ctx: _Ctx, bloom_cache: dict) -> str | None:
    """One entry's verdict: None = metadata-eligible, _DROP = pruned
    outright, anything else = residual-scan reason. BOTH planning paths
    run exactly this function, so driver == distributed by construction."""
    from airbyte_spark.operators.cluster import delete_may_hit

    if ctx.partition_filter:
        missing = [c for c in ctx.partition_filter if c not in e.partition]
        if missing:
            # older partition spec: the layout can't prune it — the
            # residual scan enforces the predicate row-level
            return "partition-evolution"
        if not partition_matches(e, ctx.partition_filter):
            return _DROP
    if ctx.key_range is not None:
        col, lo, hi = ctx.key_range
        dt = ctx.schema[col].dataType
        if not _intersects(e.stats.get(col), lo, hi, dt):
            return _DROP
        if not _within(e, col, lo, hi, dt):
            return "key-range-straddle"
    if ctx.has_pos and (ctx.pos_union is None or e.path in ctx.pos_union):
        return "position-delete"
    if any(
        delete_may_hit(e, d, ctx.pk, ctx.schema, cache=bloom_cache)
        for d in ctx.live_eq
    ):
        return "equality-delete"
    if not _stats_answer(e, ctx.aggs, ctx.schema):
        return "missing-stats"
    return None


def _fold_meta(vals: dict, e: DataFileEntry, ctx: _Ctx) -> None:
    """Fold one metadata-eligible entry into the running aggregates
    (values kept COERCED; `None` start)."""
    for fn, col in ctx.aggs:
        a = _alias(fn, col)
        if col == "*":
            vals[a] = (vals[a] or 0) + e.rows
        elif fn == "count":
            vals[a] = (vals[a] or 0) + e.rows - e.stats[col]["null_count"]
        else:
            v = coerce_stat_value(e.stats[col][fn], ctx.schema[col].dataType)
            cur = vals[a]
            vals[a] = v if cur is None else (min if fn == "min" else max)(cur, v)


def _split_distributed(
    table: LakeTable,
    ctx: _Ctx,
    branch: str,
    snapshot_id: str | None,
    rep: AggregateReport,
) -> tuple[dict, list[DataFileEntry]]:
    """Classify entries on executors (see module docstring). Returns the
    folded metadata values + the residual entry list; only O(batches)
    partial rows and O(residual) entries reach the driver."""
    import json as _json

    spark = table.spark
    out_schema = StructType(
        [
            StructField("kind", StringType()),
            StructField("payload", StringType()),
        ]
    )
    aggs = [tuple(a) for a in ctx.aggs]
    sctx = ctx  # closure capture (dataclass of picklable members)

    def split(batches):
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            vals: dict = {_alias(fn, col): None for fn, col in aggs}
            raw: dict = {}  # alias -> raw manifest value of the winner
            files = rows = 0
            out = []
            for blob in pdf["entry_json"]:
                d = _json.loads(blob)
                if d.get("content", "data") != "data":
                    continue
                e = DataFileEntry.from_json(d)
                verdict = _classify(e, sctx, cache)
                if verdict == _DROP:
                    continue
                if verdict is not None:
                    out.append(("scan:" + verdict, blob))
                    continue
                files += 1
                rows += e.rows
                for fn, col in aggs:
                    a = _alias(fn, col)
                    if col == "*":
                        vals[a] = (vals[a] or 0) + e.rows
                    elif fn == "count":
                        vals[a] = (
                            (vals[a] or 0)
                            + e.rows
                            - e.stats[col]["null_count"]
                        )
                    else:
                        dt = sctx.schema[col].dataType
                        v = coerce_stat_value(e.stats[col][fn], dt)
                        if vals[a] is None or (
                            v < vals[a] if fn == "min" else v > vals[a]
                        ):
                            vals[a] = v
                            raw[a] = e.stats[col][fn]
                # counts transport as-is; extremes transport the RAW
                # manifest JSON value (numbers/ISO strings) — the driver
                # re-coerces when folding partials
            if files:
                partial = {"files": files, "rows": rows}
                for fn, col in aggs:
                    a = _alias(fn, col)
                    partial[a] = (
                        vals[a] if fn == "count" else raw.get(a)
                    )
                out.append(("meta", _json.dumps(partial)))
            yield pd.DataFrame(out, columns=["kind", "payload"])

    got = (
        table.entries_df(branch=branch, snapshot_id=snapshot_id)
        .filter(F.col("content") == "data")
        .select("entry_json")
        .mapInPandas(split, out_schema)
        .collect()
    )
    vals: dict = {_alias(fn, col): None for fn, col in aggs}
    residual: list[DataFileEntry] = []
    for r in got:
        if r["kind"] == "meta":
            p = _json.loads(r["payload"])
            rep.meta_files += p["files"]
            rep.meta_rows += p["rows"]
            for fn, col in aggs:
                a = _alias(fn, col)
                pv = p.get(a)
                if pv is None:
                    continue
                if fn == "count":
                    vals[a] = (vals[a] or 0) + pv
                else:
                    v = coerce_stat_value(pv, ctx.schema[col].dataType)
                    cur = vals[a]
                    vals[a] = (
                        v if cur is None else (min if fn == "min" else max)(cur, v)
                    )
        else:
            reason = r["kind"][5:]
            rep.scan_reasons[reason] = rep.scan_reasons.get(reason, 0) + 1
            residual.append(DataFileEntry.from_json(_json.loads(r["payload"])))
    for fn, col in aggs:  # counts must read 0, not None, on empty meta
        if fn == "count":
            a = _alias(fn, col)
            vals[a] = vals[a] or 0
    rep.scanned_files = len(residual)
    rep.planning = "distributed"
    return vals, residual


def scan_aggregate(
    table: LakeTable,
    aggs: list[tuple[str, str]],
    branch: str = MAIN,
    snapshot_id: str | None = None,
    partition_filter: dict | None = None,
    key_range: tuple[str, object, object] | None = None,
    report: AggregateReport | None = None,
    planning: str = "auto",
) -> DataFrame:
    """COUNT(*) / COUNT(col) / MIN(col) / MAX(col) at a snapshot, answered
    from manifest stats wherever possible (see module docstring). Returns
    a ONE-ROW DataFrame whose columns are `count_star` / `count_<col>` /
    `min_<col>` / `max_<col>` in the order requested; `report`, when
    given, records how many files each half of the hybrid plan covered
    and which planning path ran.

    `planning`: "auto" (driver below `cluster.planning.
    distributed-threshold` live entries — counted from manifest-list
    summaries without parsing — executors above), or force "driver" /
    "distributed".

    Semantics are exactly `table.scan(...)` followed by the same
    aggregates: MIN/MAX ignore NULLs (parquet stats already exclude
    them), `count(col)` counts non-NULL rows, and an empty selection
    yields count 0 with NULL extremes.
    """
    if planning not in ("auto", "driver", "distributed"):
        raise ValueError(f"planning must be auto|driver|distributed: {planning!r}")
    aggs = [tuple(a) for a in aggs]
    schema = table.schema(branch=branch, snapshot_id=snapshot_id)
    _validate(aggs, schema)
    rep = report if report is not None else AggregateReport()
    partition_filter = table.resolve_partition_filter(partition_filter)
    pk = list(table.primary_key)

    infos = table.snapshot(snapshot_id, branch).manifest_infos
    total_entries = (
        sum(i.get("entry_count", 0) for i in infos) if infos else None
    )
    threshold = int(
        table.properties.get("cluster.planning.distributed-threshold", 100_000)
    )
    use_dist = planning == "distributed" or (
        planning == "auto"
        and total_entries is not None
        and total_entries > threshold
    )

    if use_dist:
        # delete entries are O(debt): collect just them from the
        # executor-parsed manifests, never the data entries
        import json as _json

        dels = [
            DataFileEntry.from_json(_json.loads(r["entry_json"]))
            for r in table.entries_df(branch=branch, snapshot_id=snapshot_id)
            .filter(F.col("content") != "data")
            .select("entry_json")
            .collect()
        ]
        eq_deletes = [d for d in dels if d.content == "equality-deletes"]
        pos_deletes = [d for d in dels if d.content == "position-deletes"]
    else:
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
        eq_deletes = [
            d for d in eq_deletes if _intersects(d.stats.get(col), lo, hi, dt)
        ]
    pos_union: set[str] | None = set()
    for d in pos_deletes:
        if d.referenced is None:
            pos_union = None  # over-cap writer fallback: applies everywhere
            break
        pos_union.update(d.referenced)
    ctx = _Ctx(
        aggs=aggs,
        schema=schema,
        partition_filter=partition_filter,
        key_range=key_range,
        pk=pk,
        live_eq=eq_deletes,
        pos_union=pos_union,
        has_pos=bool(pos_deletes),
    )

    if use_dist:
        vals, residual = _split_distributed(table, ctx, branch, snapshot_id, rep)
    else:
        vals = {_alias(fn, col): None for fn, col in aggs}
        residual = []
        bloom_cache: dict = {}
        for e in entries:
            verdict = _classify(e, ctx, bloom_cache)
            if verdict == _DROP:
                continue
            if verdict is not None:
                residual.append(e)
                rep.scan_reasons[verdict] = rep.scan_reasons.get(verdict, 0) + 1
                continue
            rep.meta_files += 1
            rep.meta_rows += e.rows
            _fold_meta(vals, e, ctx)
        for fn, col in aggs:
            if fn == "count":
                a = _alias(fn, col)
                vals[a] = vals[a] or 0
        rep.scanned_files = len(residual)
        rep.planning = "driver"

    # ---- residual scan half ---------------------------------------------
    if residual:
        df = table.read_entries(residual, schema, deletes=eq_deletes + pos_deletes)
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


def histogram(df, col: str, bins: int = 10):
    """Equal-width histogram of a numeric column: (bucket, lo_edge,
    hi_edge, count), nulls AND NaNs excluded (a NaN would win Spark's
    max and poison the width), the max value folded into the last
    bucket. Two jobs — a 2-scalar min/max agg, then one partial-agg
    bucket count (floor((x - lo) / width), identical IEEE arithmetic in
    any engine). Degenerate ranges (min == max) collapse to bucket 0."""
    from pyspark.sql import functions as F

    if bins <= 0:
        raise ValueError(f"bins must be > 0: {bins}")
    df = df.filter(F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double")))
    row = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return df.sparkSession.createDataFrame(
            [], "bucket int, lo_edge double, hi_edge double, count long"
        )
    width = (hi - lo) / bins
    x = F.col(col).cast("double")
    bucket = (
        F.lit(0)
        if width == 0.0
        else F.least(F.lit(bins - 1), F.floor((x - F.lit(lo)) / F.lit(width)))
    )
    return (
        df.groupBy(bucket.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("lo_edge"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6).alias(
                "hi_edge"
            ),
            "count",
        )
    )
