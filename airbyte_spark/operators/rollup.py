"""Incrementally-maintained aggregate rollups over a lake table.

The classic warehouse pattern the reference serves with full re-syncs —
a GROUP BY summary of a huge fact table — recomputed per batch is
O(table) every time. This operator maintains the summary as a lake
table of its own, advanced O(delta) from `scan_changelog` (Iceberg
changelog / Delta CDF semantics): inserts and deletes between the
stored source-snapshot watermark and the source head fold
arithmetically into the stored aggregates, and only groups whose
deleted rows could have carried a stored MIN/MAX extreme are recomputed
— from a scan of just those groups, never the table.

Supported aggregates: count(*) (always maintained — it detects group
death), count(col), sum(col), min(col), max(col). For every sum/min/max
column a per-column non-null count is maintained as a SUPPORT column
(it decides when the aggregate collapses to NULL); avg is sum/count at
read time. Group keys are the rollup's primary key and must be
non-NULL (validated).

The rollup is an ordinary lake table: scans, time travel, branches,
MoR maintenance, compaction all apply. Updates land as a MoR merge
keyed by the group columns with the source commit sequence as cursor,
so replaying a window is idempotent; groups whose count reaches zero
are tombstoned through the merge's CDC path.

Reference anchors: incremental view maintenance over append+retract
streams (the classic counting algorithm) re-expressed on Iceberg-style
changelogs; the reference's closest surface is repeated full-refresh
`GROUP BY` models downstream of synced tables.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, NumericType, StructField, StructType

from airbyte_spark.lake.format import Snapshot
from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.operators.merge import CDC_DELETED_COL, MergeResult, merge_into

GROUP_PROP = "rollup.group-by"
AGGS_PROP = "rollup.aggs"
WATERMARK_PROP = "rollup.source-snapshot-watermark"

_FNS = ("count", "sum", "min", "max")


@dataclass
class RollupResult:
    mode: str  # "initial" | "incremental" | "rebuild" | "noop"
    watermark: str
    groups_updated: int = 0
    groups_deleted: int = 0
    groups_recomputed: int = 0
    merge: MergeResult | None = None


def _alias(fn: str, col: str) -> str:
    return f"{fn}_star" if col == "*" else f"{fn}_{col}"


def _normalize(aggs, schema: StructType) -> list[tuple[str, str]]:
    """Validate and close the agg list: count(*) always first, plus a
    count(col) support aggregate for every sum/min/max column."""
    names = set(schema.fieldNames())
    out: list[tuple[str, str]] = [("count", "*")]
    for fn, col in (tuple(a) for a in aggs):
        if fn not in _FNS:
            raise ValueError(f"unsupported aggregate {fn!r} (use {_FNS})")
        if col == "*":
            if fn != "count":
                raise ValueError(f"{fn}(*) is not an aggregate; use a column")
            continue
        if col not in names:
            raise ValueError(f"unknown column {col!r}")
        if fn == "sum" and not isinstance(schema[col].dataType, NumericType):
            raise ValueError(f"sum({col}) needs a numeric column")
        if ("count", col) not in out:
            out.append(("count", col))
        if (fn, col) != ("count", col) and (fn, col) not in out:
            out.append((fn, col))
    return out


def _full_exprs(aggs) -> list[Column]:
    """The from-scratch aggregate expressions (initial build, rebuilds,
    and per-group recomputes all use exactly these)."""
    exprs = []
    for fn, col in aggs:
        a = _alias(fn, col)
        if col == "*":
            exprs.append(F.count(F.lit(1)).alias(a))
        elif fn == "count":
            exprs.append(F.count(F.col(col)).alias(a))
        else:
            exprs.append(getattr(F, fn)(F.col(col)).alias(a))
    return exprs


def create_rollup(
    source: LakeTable,
    root: str,
    group_by: list[str],
    aggs: list[tuple[str, str]],
    branch: str = MAIN,
) -> LakeTable:
    """Create the (empty) rollup table for `source`: PK = group columns,
    one column per closed aggregate, `_rollup_seq` cursor. The group/agg
    config is pinned in table properties; materialize validates against
    it so two writers can't maintain diverging definitions."""
    src_schema = source.schema(branch=branch)
    if not group_by:
        raise ValueError("group_by must name at least one column")
    for g in group_by:
        if g not in src_schema.fieldNames():
            raise ValueError(f"unknown group column {g!r}")
    closed = _normalize(aggs, src_schema)
    # derive agg result types without running a job: aggregate an empty
    # frame with the real expressions and read its schema
    empty = source.spark.createDataFrame([], src_schema)
    agg_schema = empty.groupBy(*group_by).agg(*_full_exprs(closed)).schema
    fields = [
        StructField(f.name, f.dataType, f.name not in group_by)
        for f in agg_schema.fields
    ] + [StructField("_rollup_seq", LongType(), True)]
    t = LakeTable.create(
        source.spark, root, StructType(fields), primary_key=list(group_by)
    )
    t.set_properties(
        {GROUP_PROP: json.dumps(list(group_by)), AGGS_PROP: json.dumps(closed)}
    )
    return t


def _config(rollup: LakeTable) -> tuple[list[str], list[tuple[str, str]]]:
    props = rollup.properties
    try:
        groups = json.loads(props[GROUP_PROP])
        aggs = [tuple(a) for a in json.loads(props[AGGS_PROP])]
    except KeyError as e:
        raise ValueError(
            "not a rollup table (create it with create_rollup)"
        ) from e
    return groups, aggs


def _guard_null_groups(df: DataFrame, group_by: list[str], what: str) -> None:
    cond = None
    for g in group_by:
        c = F.col(g).isNull()
        cond = c if cond is None else cond | c
    if df.filter(cond).limit(1).count():
        raise ValueError(
            f"NULL group key in {what}: group columns are the rollup's "
            "primary key and must be non-NULL"
        )


def materialize_rollup(
    source: LakeTable,
    rollup: LakeTable,
    branch: str = MAIN,
    on_unsupported: str = "raise",
    merge_mode: str = "mor",
) -> RollupResult:
    """Advance `rollup` to `source`'s current snapshot (see module
    docstring). First call builds the summary with one full GROUP BY;
    every later call folds only the changelog since the watermark.

    `on_unsupported="rebuild"` recomputes from scratch (one full GROUP
    BY merged in, vanished groups tombstoned) when the changelog window
    contains a snapshot whose row diff is not metadata-recoverable (CoW
    overwrites / truncate); the default propagates scan_changelog's
    ValueError so the caller notices the expensive path."""
    if on_unsupported not in ("raise", "rebuild"):
        raise ValueError(f"on_unsupported must be raise|rebuild: {on_unsupported!r}")
    group_by, aggs = _config(rollup)
    head: Snapshot = source.snapshot(branch=branch)
    wm = rollup.properties.get(WATERMARK_PROP)
    if wm == head.snapshot_id:
        return RollupResult("noop", wm)

    if wm is None and rollup.data_files(branch):
        # progress was reset on a non-empty rollup: a plain re-append
        # would double-count — rebuild merges the full aggregate instead
        return _rebuild(source, rollup, group_by, aggs, head, branch, merge_mode)
    if wm is None:
        full = (
            source.scan(branch=branch, snapshot_id=head.snapshot_id)
            .groupBy(*group_by)
            .agg(*_full_exprs(aggs))
            .withColumn("_rollup_seq", F.lit(head.sequence))
            .persist()
        )
        try:
            _guard_null_groups(full, group_by, "the source table")
            n = full.count()
            rollup.append(full)
        finally:
            full.unpersist()
        rollup.set_properties({WATERMARK_PROP: head.snapshot_id})
        return RollupResult("initial", head.snapshot_id, groups_updated=n)

    try:
        cl = source.scan_changelog(
            wm, branch=branch, to_snapshot_id=head.snapshot_id
        )
    except ValueError:
        if on_unsupported == "raise":
            raise
        return _rebuild(source, rollup, group_by, aggs, head, branch, merge_mode)
    return _incremental(
        source, rollup, group_by, aggs, head, cl, branch, merge_mode
    )


def _incremental(
    source: LakeTable,
    rollup: LakeTable,
    group_by: list[str],
    aggs,
    head: Snapshot,
    changelog: DataFrame,
    branch: str,
    merge_mode: str,
) -> RollupResult:
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    d_exprs: list[Column] = [
        F.max(F.when(F.col("_change_type") == "delete", 1).otherwise(0)).alias(
            "_has_delete"
        )
    ]
    for fn, col in aggs:
        a = _alias(fn, col)
        if col == "*":
            d_exprs.append(F.sum(sign).alias(f"_d_{a}"))
        elif fn == "count":
            d_exprs.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), sign).otherwise(F.lit(0))
                ).alias(f"_d_{a}")
            )
        elif fn == "sum":
            d_exprs.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), F.col(col) * sign)
                ).alias(f"_d_{a}")
            )
        else:  # min / max: inserted-side candidate + deleted-side bound
            ins = F.when(F.col("_change_type") == "insert", F.col(col))
            del_ = F.when(F.col("_change_type") == "delete", F.col(col))
            d_exprs.append(getattr(F, fn)(ins).alias(f"_ins_{a}"))
            d_exprs.append(getattr(F, fn)(del_).alias(f"_del_{a}"))
    delta = changelog.groupBy(*group_by).agg(*d_exprs).persist()
    try:
        _guard_null_groups(delta, group_by, "the changelog window")
        # stored rows for touched groups only: semi-filter the rollup by
        # the (small) delta keys, then broadcast it back onto the delta —
        # the rollup is never shuffled and untouched groups never move
        keys = delta.select(*group_by)
        old = rollup.scan(branch=branch).join(
            F.broadcast(keys), on=group_by, how="semi"
        )
        j = delta.join(F.broadcast(old), on=group_by, how="left")

        new_cols: dict[str, Column] = {}
        recompute_cond: Column = F.lit(False)
        for fn, col in aggs:
            a = _alias(fn, col)
            if fn == "count":
                new_cols[a] = F.coalesce(F.col(a), F.lit(0)) + F.col(f"_d_{a}")
            elif fn == "sum":
                cnt = F.col(f"__new_{_alias('count', col)}")
                new_cols[a] = F.when(cnt == 0, F.lit(None)).otherwise(
                    F.coalesce(F.col(a), F.lit(0))
                    + F.coalesce(F.col(f"_d_{a}"), F.lit(0))
                )
            else:
                cnt = F.col(f"__new_{_alias('count', col)}")
                # least/greatest skip NULLs: a brand-new group takes the
                # inserted extreme, an untouched stored extreme survives
                comb = (F.least if fn == "min" else F.greatest)(
                    F.col(a), F.col(f"_ins_{a}")
                )
                new_cols[a] = F.when(cnt == 0, F.lit(None)).otherwise(comb)
                # a delete can only invalidate the CANDIDATE extreme
                # (stored ∪ window inserts) if it reached it — comparing
                # against the stored extreme alone misses groups whose
                # extreme was both inserted and deleted inside this window
                # (e.g. a brand-new group MoR-updated before the first
                # materialize: stored is NULL, yet the deleted insert must
                # not survive as the extreme)
                hit = (
                    (F.col("_has_delete") == 1)
                    & comb.isNotNull()
                    & F.col(f"_del_{a}").isNotNull()
                    & (
                        (F.col(f"_del_{a}") <= comb)
                        if fn == "min"
                        else (F.col(f"_del_{a}") >= comb)
                    )
                )
                recompute_cond = recompute_cond | hit
        # two passes so sum/min NULL-collapse can reference the NEW count
        staged = j
        for fn, col in aggs:
            if fn == "count":
                staged = staged.withColumn(
                    f"__new_{_alias(fn, col)}", new_cols[_alias(fn, col)]
                )
        for fn, col in aggs:
            if fn != "count":
                staged = staged.withColumn(
                    f"__new_{_alias(fn, col)}", new_cols[_alias(fn, col)]
                )
        alive = F.col("__new_count_star") > 0
        staged = staged.withColumn(
            "__recompute", alive & recompute_cond
        ).persist()
        try:
            out_cols = group_by + [
                F.col(f"__new_{_alias(fn, col)}").alias(_alias(fn, col))
                for fn, col in aggs
            ]
            arithmetic = staged.filter(~F.col("__recompute")).select(
                *out_cols,
                F.lit(head.sequence).alias("_rollup_seq"),
                F.when(~alive, F.current_timestamp()).alias(CDC_DELETED_COL),
            )
            rec_keys = staged.filter(F.col("__recompute")).select(*group_by)
            n_rec = rec_keys.count()
            if n_rec:
                recomputed = (
                    source.scan(branch=branch, snapshot_id=head.snapshot_id)
                    .join(F.broadcast(rec_keys), on=group_by, how="semi")
                    .groupBy(*group_by)
                    .agg(*_full_exprs(aggs))
                    .select(
                        *group_by,
                        *[_alias(fn, col) for fn, col in aggs],
                        F.lit(head.sequence).alias("_rollup_seq"),
                        F.lit(None)
                        .cast("timestamp")
                        .alias(CDC_DELETED_COL),
                    )
                )
                batch = arithmetic.unionByName(recomputed)
            else:
                batch = arithmetic
            n_dead = staged.filter(~alive).count()
            n_upd = staged.count() - n_dead
            res = merge_into(
                rollup,
                batch,
                cursor_col="_rollup_seq",
                mode=merge_mode,
                branch=branch,
            )
        finally:
            staged.unpersist()
    finally:
        delta.unpersist()
    rollup.set_properties({WATERMARK_PROP: head.snapshot_id})
    return RollupResult(
        "incremental",
        head.snapshot_id,
        groups_updated=n_upd,
        groups_deleted=n_dead,
        groups_recomputed=n_rec,
        merge=res,
    )


def _rebuild(
    source: LakeTable,
    rollup: LakeTable,
    group_by: list[str],
    aggs,
    head: Snapshot,
    branch: str,
    merge_mode: str,
) -> RollupResult:
    full = (
        source.scan(branch=branch, snapshot_id=head.snapshot_id)
        .groupBy(*group_by)
        .agg(*_full_exprs(aggs))
        .persist()
    )
    try:
        _guard_null_groups(full, group_by, "the source table")
        dead = (
            rollup.scan(branch=branch)
            .select(*group_by)
            .join(full.select(*group_by), on=group_by, how="anti")
        )
        agg_names = [_alias(fn, col) for fn, col in aggs]
        batch = full.select(
            *group_by,
            *agg_names,
            F.lit(head.sequence).alias("_rollup_seq"),
            F.lit(None).cast("timestamp").alias(CDC_DELETED_COL),
        ).unionByName(
            dead.select(
                *group_by,
                *[
                    F.lit(None).cast(rollup.schema()[a].dataType).alias(a)
                    for a in agg_names
                ],
                F.lit(head.sequence).alias("_rollup_seq"),
                F.current_timestamp().alias(CDC_DELETED_COL),
            )
        )
        n_dead = dead.count()
        n_upd = full.count()
        res = merge_into(
            rollup, batch, cursor_col="_rollup_seq", mode=merge_mode, branch=branch
        )
    finally:
        full.unpersist()
    rollup.set_properties({WATERMARK_PROP: head.snapshot_id})
    return RollupResult(
        "rebuild",
        head.snapshot_id,
        groups_updated=n_upd,
        groups_deleted=n_dead,
        merge=res,
    )


def reset_rollup(rollup: LakeTable) -> None:
    """Forget incremental progress: the next materialize rebuilds from a
    full GROUP BY (safe — the merge is idempotent per group+sequence)."""
    rollup.set_properties({WATERMARK_PROP: None})
