"""Connection-level schema-change detection and propagation policy.

The reference checks the source catalog against the configured one
immediately before syncing and applies the connection's "Detect and
Propagate Schema Changes" setting
(``docs/platform/using-airbyte/schema-change-management.md:33-49``):

| policy               | reference setting                         |
|----------------------|-------------------------------------------|
| ``ignore``           | Approve all changes myself — changes are
|                      | DETECTED but not propagated; the sync
|                      | keeps running with the configured schema  |
| ``propagate_columns``| Propagate field changes only — column
|                      | adds / removals / type widenings land on
|                      | the destination table; new or removed
|                      | STREAMS are ignored                       |
| ``propagate_fully``  | Propagate all field and stream changes —
|                      | column changes plus stream additions
|                      | (created via the caller's factory) and
|                      | stream removals (deselected from the
|                      | sync; the destination table is KEPT —
|                      | the reference never drops destination
|                      | data on stream removal)                   |
| ``disable``          | Stop future syncs — the connection pauses
|                      | as soon as any change is detected         |

Column propagation reuses the engine's evolution machinery
(lake/evolve.py): additions and int->long / float->double widenings via
``merge_supertype``, removals as a schema commit that drops the column
(old files keep the data; scans null-align). Primary-key columns, the
stream's cursor, and the airbyte meta columns are PROTECTED — a source
schema that stops reporting them never silently destroys the dedup /
resume contract (the removal is reported instead).

Everything here is metadata-only (schema registry commits); no data
files move, so a 1000-stream reconciliation is O(streams) JSON swaps.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql.types import StructType

from airbyte_spark.lake.evolve import merge_supertype
from airbyte_spark.operators.merge import (
    CDC_DELETED_COL,
    EXTRACTED_COL,
    RAW_ID_COL,
)
from airbyte_spark.streaming.connection import StreamSpec

POLICIES = ("ignore", "propagate_columns", "propagate_fully", "disable")

#: engine-owned columns a source schema never governs
META_COLUMNS = frozenset({RAW_ID_COL, EXTRACTED_COL, CDC_DELETED_COL})


class ConnectionPausedError(RuntimeError):
    """policy="disable": schema drift detected -> pause the connection."""


@dataclass
class CatalogChanges:
    """What moved between the configured catalog and the observed one."""

    new_streams: list[str] = field(default_factory=list)
    removed_streams: list[str] = field(default_factory=list)
    #: stream -> {"added": [...], "removed": [...], "widened": [...]}
    column_changes: dict[str, dict] = field(default_factory=dict)

    @property
    def any_change(self) -> bool:
        return bool(
            self.new_streams or self.removed_streams or self.column_changes
        )


@dataclass
class PolicyReport:
    policy: str
    changes: CatalogChanges
    #: stream -> list of applied evolution actions ("+col", "-col",
    #: "widen col old->new"); empty under ignore
    applied: dict[str, list[str]] = field(default_factory=dict)
    #: streams to sync after reconciliation (propagate_fully drops
    #: removed streams and appends factory-created ones)
    selected: list[StreamSpec] = field(default_factory=list)
    #: new streams detected but NOT created (no factory / other policy)
    pending_new: list[str] = field(default_factory=list)
    #: streams whose table gained columns this reconciliation — existing
    #: rows read NULL there until a backfill pass re-syncs them (the
    #: reference backfills propagated column adds when the change is
    #: detected as part of a sync — schema-change-management.md:83-88)
    backfill_streams: list[str] = field(default_factory=list)


def _column_diff(
    table_schema: StructType, observed: StructType, protected: set[str]
) -> tuple[StructType, dict]:
    """(evolution target, reported change dict) for one stream.

    Target = union supertype (adds + widenings, nothing narrowed) minus
    the non-protected top-level columns the source stopped reporting.
    Protected or meta columns missing from the source are reported as
    ``removed`` but stay in the target (and are excluded from it only
    never — they are never dropped)."""
    table_names = set(table_schema.fieldNames())
    supertype = merge_supertype(table_schema, observed)
    observed_names = set(observed.fieldNames())
    added = [n for n in supertype.fieldNames() if n not in table_names]
    widened = [
        (f.name, table_schema[f.name].dataType.simpleString(),
         f.dataType.simpleString())
        for f in supertype.fields
        if f.name in table_names
        and f.dataType != table_schema[f.name].dataType
    ]
    removed = [
        n
        for n in table_names
        if n not in observed_names and n not in META_COLUMNS
    ]
    droppable = [n for n in removed if n not in protected]
    target = StructType(
        [f for f in supertype.fields if f.name not in droppable]
    )
    report: dict = {}
    if added:
        report["added"] = sorted(added)
    if removed:
        report["removed"] = sorted(removed)
    if widened:
        report["widened"] = sorted(f"{n} {o}->{w}" for n, o, w in widened)
    return target, report


def detect_catalog_changes(
    specs: list[StreamSpec], observed: dict[str, StructType]
) -> CatalogChanges:
    """Diff the configured streams against the observed source catalog
    (``observed`` maps stream name -> source schema at sync start)."""
    changes = CatalogChanges()
    by_name = {s.name: s for s in specs}
    changes.new_streams = sorted(set(observed) - set(by_name))
    changes.removed_streams = sorted(set(by_name) - set(observed))
    for name, spec in by_name.items():
        if name not in observed:
            continue
        protected = _protected_columns(spec)
        _, report = _column_diff(
            spec.table.schema(), observed[name], protected
        )
        if report:
            changes.column_changes[name] = report
    return changes


def _protected_columns(spec: StreamSpec) -> set[str]:
    protected = set(spec.table.primary_key or [])
    if spec.cursor_col:
        protected.add(spec.cursor_col)
    return protected


def apply_schema_policy(
    specs: list[StreamSpec],
    observed: dict[str, StructType],
    policy: str = "ignore",
    create_stream: Callable[[str, StructType], StreamSpec] | None = None,
) -> PolicyReport:
    """Reconcile the configured streams with the observed source catalog
    under ``policy`` (module docstring table). Returns the report with
    the post-reconciliation stream selection; under ``disable`` raises
    ``ConnectionPausedError`` on ANY detected change. ``create_stream``
    (propagate_fully only) materializes a StreamSpec for a newly
    observed stream — without it new streams land in ``pending_new``."""
    if policy not in POLICIES:
        raise ValueError(f"policy must be one of {POLICIES}: {policy!r}")
    changes = detect_catalog_changes(specs, observed)
    report = PolicyReport(policy=policy, changes=changes,
                          selected=list(specs))
    if policy == "disable":
        if changes.any_change:
            raise ConnectionPausedError(
                "schema changes detected with policy='disable' "
                f"(Stop future syncs): {changes}"
            )
        return report
    if policy == "ignore":
        report.pending_new = list(changes.new_streams)
        return report

    # propagate_columns / propagate_fully: land column changes
    for spec in specs:
        if spec.name not in observed:
            continue
        protected = _protected_columns(spec)
        table_schema = spec.table.schema()
        target, rep = _column_diff(
            table_schema, observed[spec.name], protected
        )
        if target == table_schema:
            continue
        spec.table.evolve_schema(target)
        actions = []
        for n in rep.get("added", []):
            actions.append(f"+{n}")
        for n in rep.get("removed", []):
            actions.append(
                f"-{n}" if n not in protected and n not in META_COLUMNS
                else f"kept {n} (protected)"
            )
        actions.extend(rep.get("widened", []))
        report.applied[spec.name] = actions
        if rep.get("added"):
            report.backfill_streams.append(spec.name)

    if policy == "propagate_fully":
        report.selected = [
            s for s in specs if s.name not in set(changes.removed_streams)
        ]
        for name in changes.new_streams:
            if create_stream is None:
                report.pending_new.append(name)
                continue
            new_spec = create_stream(name, observed[name])
            report.selected.append(new_spec)
            report.applied.setdefault(name, []).append("stream created")
    else:
        report.pending_new = list(changes.new_streams)
    return report
