"""Registered derived tables: rollups and near-dup indexes advanced as
a maintenance stage.

A web-scale pipeline's derived artifacts (GROUP BY rollup tables,
near-dup indexes) go stale the moment the base table moves, and
re-deriving them out-of-band re-introduces the full-corpus pass both
operators were built to avoid. Registration pins the artifact list IN
the source table's properties (``maintenance.derived-tables``, a JSON
list of ``{"kind", "root"}``), and `run_maintenance` advances every
registered artifact right after the branch swap publishes new state —
and BEFORE expire/GC, so the changelog window each artifact reads is
still resolvable (an artifact that lags past snapshot retention must be
reset/rebuilt; the updaters raise rather than silently resync).

Both updaters are watermark-idempotent (noop when already at head), so
the stage is safe under at-least-once checkpoint replay, and a failed
artifact doesn't poison the others — per-artifact errors are captured
in the stage report (the artifact stays at its old watermark and is
retried next cycle). Changelog consumers require MoR windows: a
maintenance pass running its merge as copy-on-write makes the window's
row diff unrecoverable (scan_changelog raises; the error lands in the
artifact's report) — run registered-artifact tables with
merge_mode="mor", the bench/scaling default.

Reference shape: materialized-view maintenance tied to table commits
(Iceberg's changelog-driven incremental refresh discussions; dbt-style
derived models re-run per sync in the reference's ecosystem).
"""

from __future__ import annotations

import json

from airbyte_spark.lake.table import MAIN, LakeTable

DERIVED_PROP = "maintenance.derived-tables"
KINDS = ("rollup", "near-dup-index", "ann-index", "feature")


def registered_derived_tables(source: LakeTable) -> list[dict]:
    raw = source.properties.get(DERIVED_PROP)
    return json.loads(raw) if raw else []


def register_derived_table(
    source: LakeTable, kind: str, root: str
) -> list[dict]:
    """Add an artifact to the source's registry (idempotent by root).
    The artifact table must already exist with its own config pinned
    (create_rollup / create_near_dup_index)."""
    if kind not in KINDS:
        raise ValueError(f"kind must be one of {KINDS}: {kind!r}")
    entries = registered_derived_tables(source)
    if any(e["root"] == root for e in entries):
        return entries
    entries.append({"kind": kind, "root": root})
    source.set_properties({DERIVED_PROP: json.dumps(entries)})
    return entries


def deregister_derived_table(source: LakeTable, root: str) -> list[dict]:
    entries = [
        e for e in registered_derived_tables(source) if e["root"] != root
    ]
    source.set_properties(
        {DERIVED_PROP: json.dumps(entries) if entries else None}
    )
    return entries


def update_derived_tables(
    source: LakeTable, branch: str = MAIN
) -> list[dict]:
    """Advance every registered artifact to `source`'s head on `branch`;
    one report dict per artifact ({kind, root, mode, ...} or
    {kind, root, error})."""
    from airbyte_spark.operators.ann_index import update_ann_index
    from airbyte_spark.operators.dedup_index import update_near_dup_index
    from airbyte_spark.operators.feature_table import update_feature_table
    from airbyte_spark.operators.rollup import materialize_rollup

    reports: list[dict] = []
    for e in registered_derived_tables(source):
        rep = {"kind": e["kind"], "root": e["root"]}
        try:
            t = LakeTable(source.spark, e["root"])
            if e["kind"] == "rollup":
                r = materialize_rollup(source, t, branch=branch)
                rep.update(
                    mode=r.mode,
                    groups_updated=r.groups_updated,
                    groups_deleted=r.groups_deleted,
                )
            elif e["kind"] == "feature":
                r = update_feature_table(source, t, branch=branch)
                rep.update(
                    mode=r.mode,
                    upserted=r.rows_upserted,
                    removed=r.rows_removed,
                )
            elif e["kind"] == "ann-index":
                r = update_ann_index(source, t, branch=branch)
                rep.update(
                    mode=r.mode,
                    upserted=r.vectors_upserted,
                    removed=r.vectors_removed,
                )
            else:
                r = update_near_dup_index(source, t, probe=False, branch=branch)
                rep.update(
                    mode=r.mode,
                    upserted=r.images_upserted,
                    removed=r.images_removed,
                )
        except Exception as ex:  # captured per-artifact, retried next cycle
            rep["error"] = f"{type(ex).__name__}: {ex}"
        reports.append(rep)
    return reports
