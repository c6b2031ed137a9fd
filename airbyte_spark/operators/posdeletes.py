"""Position deletes — Iceberg v2 "Position Delete Files" for this format.

Two writers and the retirement predicate:

- ``delete_where``: merge-on-read DELETE FROM. Instead of rewriting every
  file containing a matching row (CoW write amplification ∝ touched-file
  bytes), record (file, row-ordinal) tombstones — O(matched rows) written —
  and drop files whose EVERY physical row matches as a pure metadata
  removal (Iceberg's metadata delete). Scans afterwards apply a slim
  per-file anti-join (lake/table.py::apply_position_deletes) pruned to the
  referenced files only.

- ``retire_equality_deletes``: minor compaction converting accumulated
  equality-delete debt into position deletes (the Iceberg
  `convert-equality-deletes` rewrite role Flink writers rely on). An
  equality delete costs every scan a PK join against EVERY older data
  file; after conversion the cost is an exact-path anti-join over only the
  files that actually contain deleted keys. The conversion scan is pruned
  by the same range + PK-bloom-sidecar test the cluster victim selector
  uses (operators/cluster.py::delete_may_hit) — proportional to the
  update, not the table — and reads only the PK columns.

- ``dead_position_deletes``: a position-delete entry is retireable once
  no LIVE data file is in its ``referenced`` list (rewrites mint new
  paths, so rows naming dead paths are inert). Entries with
  referenced=None (writer over-cap) are never auto-retired.

Reference anchors: Iceberg format spec "Position Delete Files" /
"Scan Planning"; the reference delegates delete maintenance to the
Iceberg engine (docs/integrations/destinations/s3-data-lake.md:359-369) —
this module is that engine's position-delete role.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbyte_spark.lake.format import DataFileEntry, Snapshot
from airbyte_spark.lake.table import (
    MAIN,
    POS_KEY_DEPTH,
    LakeTable,
    _align_keep,
    equality_delete_keys,
)
from airbyte_spark.operators.fileid import file_tail, input_file_tail, tail_map


@dataclass
class PositionDeleteResult:
    snapshot: Snapshot | None
    matched_rows: int = 0
    delete_rows: int = 0
    removed_files: int = 0  # fully-matched files dropped metadata-only
    referenced_files: int = 0
    scanned_files: int = 0  # files the condition was evaluated over


@dataclass
class RetireResult:
    snapshot: Snapshot | None
    converted_delete_files: int = 0
    position_delete_rows: int = 0
    scanned_files: int = 0
    referenced_files: int = 0
    removed_files: int = 0  # fully-dead data files dropped metadata-only
    reasons: dict = field(default_factory=dict)


def _pos_scan(
    table: LakeTable, entries: list[DataFileEntry], keep_mor_seq: bool
) -> DataFrame:
    """Current-schema view of `entries` carrying `_pos_file`/`_pos_idx`
    (and `_mor_seq` when asked) — the row-identity projection every
    position-delete writer filters. Grouped per write-time schema like
    read_entries so pre-evolution files stay readable."""
    schema = table.schema()
    by_schema: dict[int, list[DataFileEntry]] = {}
    for e in entries:
        by_schema.setdefault(e.schema_id, []).append(e)
    parts: list[DataFrame] = []
    for sid, group in sorted(by_schema.items()):
        physical = table.registered_schema(sid)
        part = (
            table.spark.read.schema(physical)
            .parquet(*(e.path for e in group))
            .withColumn("_pos_file", input_file_tail(POS_KEY_DEPTH))
            .withColumn("_pos_idx", F.col("_metadata.row_index"))
        )
        keep = ["_pos_file", "_pos_idx"]
        if keep_mor_seq:
            part = part.withColumn(
                "_mor_seq", tail_map({e.path: e.sequence or 0 for e in group})
            )
            keep.append("_mor_seq")
        parts.append(_align_keep(part, schema, keep))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def _scoped_plan(
    table: LakeTable,
    condition,
    branch: str,
    partition_filter: dict | None,
    key_range: tuple[str, object, object] | None,
):
    """Shared DELETE/UPDATE planning: pin the parent, prune entries by
    the optional partition/key-range hints (manifest summaries first,
    then per-entry stats / partition values), and AND the hints into the
    row condition so a wrong hint can never over- or under-match.
    Partition hints are transform-aware: they normalize through
    `resolve_partition_filter` and the row-level twin uses the writer's
    own partition expression (identity cast or lake/transforms.py)."""
    if isinstance(condition, str):
        condition = F.expr(condition)
    planned_parent = table.current_snapshot_id(branch)
    partition_filter = table.resolve_partition_filter(partition_filter)
    entries = table.data_files(
        branch=branch, partition_filter=partition_filter, key_range=key_range
    )
    schema = table.schema(branch=branch)
    if key_range is not None:
        from airbyte_spark.lake.table import _intersects

        col, lo, hi = key_range
        dt = schema[col].dataType if col in schema.fieldNames() else None
        entries = [
            e for e in entries if _intersects(e.stats.get(col), lo, hi, dt)
        ]
        condition = condition & (F.col(col) >= F.lit(lo)) & (
            F.col(col) <= F.lit(hi)
        )
    if partition_filter:
        from airbyte_spark.lake.table import partition_matches, partition_str
        from airbyte_spark.lake.transforms import fields_by_key, partition_expr

        # same mixed-spec rule as scan(): layout-covered files prune
        # exactly; pre-evolution files stay and the row predicate decides
        entries = [
            e
            for e in entries
            if not all(c in e.partition for c in partition_filter)
            or partition_matches(e, partition_filter)
        ]
        fmap = fields_by_key(table.partition_fields())
        for c, v in partition_filter.items():
            fld = fmap.get(c)
            if fld is not None and fld.source in schema.fieldNames():
                expr = partition_expr(fld, schema[fld.source].dataType)
            else:
                expr = F.col(c).cast("string")
            sv = partition_str(v)
            condition = condition & (
                expr.isNull() if sv is None else expr == F.lit(sv)
            )
    return condition, entries, planned_parent


def delete_where(
    table: LakeTable,
    condition: Column | str,
    branch: str = MAIN,
    partition_filter: dict | None = None,
    key_range: tuple[str, object, object] | None = None,
) -> PositionDeleteResult:
    """MoR ``DELETE FROM table WHERE condition``. Writes one
    position-delete file naming the matched (file, pos) pairs; files whose
    every physical row matches are removed metadata-only instead. The
    condition is evaluated against the CURRENT logical schema (older files
    are aligned first). Rows an equality delete already hides may be
    re-tombstoned — both kinds are subtractive, so that is harmless, and
    the full-file test uses PHYSICAL row counts so a metadata removal is
    always safe.

    `partition_filter` / `key_range` scope the DELETE the way a 100-TB
    table needs: they are ADDITIONAL predicates (ANDed into the
    condition, so a wrong hint can never over- or under-delete) that
    prune at BOTH metadata levels — whole manifests via the manifest-list
    summaries, then entries via per-file stats / partition values —
    before any file is opened. Without them a full-table DELETE scans
    every file, which is its honest cost."""
    condition, entries, planned_parent = _scoped_plan(
        table, condition, branch, partition_filter, key_range
    )
    if not entries:
        return PositionDeleteResult(snapshot=None)
    by_tail = {file_tail(e.path, POS_KEY_DEPTH): e for e in entries}
    scan = _pos_scan(table, entries, keep_mor_seq=False)
    # job 1: per-file matched counts — slim (Catalyst prunes everything but
    # the condition's columns + the two identity columns), metadata-sized
    # result (one row per AFFECTED file)
    counts = {
        r["_pos_file"]: r["n"]
        for r in scan.filter(condition)
        .groupBy("_pos_file")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return PositionDeleteResult(snapshot=None, scanned_files=len(entries))
    matched = int(sum(counts.values()))
    full_tails = {t for t, n in counts.items() if n == by_tail[t].rows}
    partial_tails = sorted(set(counts) - full_tails)
    add: list[DataFileEntry] = []
    delete_rows = 0
    if partial_tails:
        # job 2: the tombstone write, scanning only the partially-matched
        # files (fully-matched ones are being dropped metadata-only)
        partial_entries = [by_tail[t] for t in partial_tails]
        pairs = (
            _pos_scan(table, partial_entries, keep_mor_seq=False)
            .filter(condition)
            .select(
                F.col("_pos_file").alias("file_path"),
                F.col("_pos_idx").alias("pos"),
            )
        )
        add = table.write_position_delete_files(
            pairs, referenced=[by_tail[t].path for t in partial_tails]
        )
        delete_rows = sum(e.rows for e in add)
    snap = table.commit(
        "delete",
        add,
        remove_paths={by_tail[t].path for t in full_tails},
        branch=branch,
        expected_parent=planned_parent,
        summary={
            "matched_rows": matched,
            "delete_rows": delete_rows,
            "removed_files": len(full_tails),
            "referenced_files": len(partial_tails),
            "scanned_files": len(entries),
        },
    )
    return PositionDeleteResult(
        snapshot=snap,
        matched_rows=matched,
        delete_rows=delete_rows,
        removed_files=len(full_tails),
        referenced_files=len(partial_tails),
        scanned_files=len(entries),
    )


@dataclass
class UpdateResult:
    snapshot: Snapshot | None
    matched_rows: int = 0
    delete_rows: int = 0  # tombstoned positions in partially-matched files
    removed_files: int = 0  # fully-matched files swapped for rewrites
    added_files: int = 0
    scanned_files: int = 0


def update_where(
    table: LakeTable,
    condition: Column | str,
    set_exprs: dict,
    branch: str = MAIN,
    partition_filter: dict | None = None,
    key_range: tuple[str, object, object] | None = None,
    generation_id: int = 0,
) -> UpdateResult:
    """MoR ``UPDATE table SET ... WHERE condition`` (Iceberg v2
    merge-on-read UPDATE: copy-out of the new row versions + position
    deletes for the old ones, one commit). Matched rows in
    partially-matched files are tombstoned by (file, pos) and re-appended
    with `set_exprs` applied; a file whose every PHYSICAL row matched is
    removed metadata-only and its rewritten copy appended — no tombstone.

    Correctness rules this encodes:
    - live equality AND position deletes are applied BEFORE matching —
      updating a row a delete already hides would otherwise resurrect it
      as a fresh version at the new sequence;
    - `set_exprs` may not touch primary-key columns (an identity change
      is a delete+insert — that is merge_into's job), so merge dedup and
      bloom pruning stay sound;
    - partition-source columns MAY change: new versions re-derive their
      layout in write_dataframe, and the old copy dies by position (not
      by key), so a row moving across partitions leaves no stale twin;
    - the full-file test uses PHYSICAL row counts — a file with any
      delete-hidden row is treated as partial, never metadata-removed.

    `partition_filter` / `key_range` scope the UPDATE exactly like
    delete_where (pruned at both metadata levels, ANDed into the row
    condition). Without them a full-table UPDATE scans every file —
    its honest cost."""
    if not set_exprs:
        raise ValueError("update_where: empty SET")
    schema = table.schema(branch=branch)
    bad = [c for c in set_exprs if c not in schema.fieldNames()]
    if bad:
        raise ValueError(f"update_where: SET columns not in schema: {bad}")
    pk_touched = [c for c in set_exprs if c in table.primary_key]
    if pk_touched:
        raise ValueError(
            f"update_where: SET may not change primary-key columns "
            f"{pk_touched} — an identity change is a delete + insert "
            f"(use merge_into)"
        )
    set_cols = {
        c: F.expr(v) if isinstance(v, str) else v for c, v in set_exprs.items()
    }
    condition, entries, planned_parent = _scoped_plan(
        table, condition, branch, partition_filter, key_range
    )
    if not entries:
        return UpdateResult(snapshot=None)
    by_tail = {file_tail(e.path, POS_KEY_DEPTH): e for e in entries}
    from airbyte_spark.lake.table import (
        apply_equality_deletes,
        apply_position_deletes,
    )

    scan = _pos_scan(table, entries, keep_mor_seq=True)
    pos_live = table.position_delete_files(branch=branch)
    if pos_live:
        scan = apply_position_deletes(table, scan, pos_live)
    eq_live = table.delete_files(branch=branch)
    if eq_live:
        scan = apply_equality_deletes(table, scan, eq_live)  # drops _mor_seq
    else:
        scan = scan.drop("_mor_seq")
    matched_df = scan.filter(condition).persist()
    try:
        counts = {
            r["_pos_file"]: r["n"]
            for r in matched_df.groupBy("_pos_file")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if not counts:
            return UpdateResult(snapshot=None, scanned_files=len(entries))
        matched = int(sum(counts.values()))
        full_tails = {t for t, n in counts.items() if n == by_tail[t].rows}
        partial_tails = sorted(set(counts) - full_tails)

        updated = matched_df
        for c, expr in set_cols.items():
            updated = updated.withColumn(c, expr.cast(schema[c].dataType))
        updated = updated.select(*schema.fieldNames())
        add = table.write_dataframe(updated, generation_id=generation_id)

        delete_rows = 0
        if partial_tails:
            pairs = matched_df
            if full_tails:
                # plan-size: exclude full files via the SMALLER literal
                # set — a full-table UPDATE with no fully-matched file
                # (the common case) takes no filter at all, and a mostly
                # full-file one carries O(|partial|) literals, never
                # O(files-touched)
                if len(full_tails) <= len(partial_tails):
                    pairs = pairs.filter(
                        ~F.col("_pos_file").isin(sorted(full_tails))
                    )
                else:
                    pairs = pairs.filter(
                        F.col("_pos_file").isin(partial_tails)
                    )
            pairs = pairs.select(
                F.col("_pos_file").alias("file_path"),
                F.col("_pos_idx").alias("pos"),
            )
            pos_add = table.write_position_delete_files(
                pairs, referenced=[by_tail[t].path for t in partial_tails]
            )
            delete_rows = sum(e.rows for e in pos_add)
            add = add + pos_add
        snap = table.commit(
            "update",
            add,
            remove_paths={by_tail[t].path for t in full_tails},
            branch=branch,
            expected_parent=planned_parent,
            summary={
                "matched_rows": matched,
                "delete_rows": delete_rows,
                "removed_files": len(full_tails),
                "scanned_files": len(entries),
                "set_columns": sorted(set_exprs),
            },
        )
        return UpdateResult(
            snapshot=snap,
            matched_rows=matched,
            delete_rows=delete_rows,
            removed_files=len(full_tails),
            added_files=len(add),
            scanned_files=len(entries),
        )
    finally:
        matched_df.unpersist()


def _affected_entries_distributed(
    table: LakeTable,
    deletes: list[DataFileEntry],
    pk: list[str],
    schema,
    branch: str,
    snapshot_id: str | None,
) -> list[DataFileEntry]:
    """Data entries some equality delete may hit, selected on executors
    (mirrors cluster.py::dead_delete_files_distributed, inverted: collect
    the HIT entries). Workers run the same delete_may_hit predicate —
    sequence compare, PK-range intersect, bloom-sidecar probe with the
    sidecars read locally — over their manifest slices; only O(affected)
    entry blobs return to the driver. The delete list is micro-batch-
    bounded (merge.mor.max-delete-eras), so the closure ships ~KBs."""
    import json as _json

    import pandas as pd

    from airbyte_spark.operators.cluster import delete_may_hit as _hit

    del_blobs = [_json.dumps(d.to_json()) for d in deletes]
    pk_local, schema_local = list(pk), schema

    def probe(batches):
        dels = [DataFileEntry.from_json(_json.loads(b)) for b in del_blobs]
        cache: dict = {}
        for pdf in batches:
            out = []
            for blob in pdf["entry_json"]:
                e = DataFileEntry.from_json(_json.loads(blob))
                if any(
                    _hit(e, d, pk_local, schema_local, cache=cache)
                    for d in dels
                ):
                    out.append(blob)
            yield pd.DataFrame({"entry_json": out})

    rows = (
        table.entries_df(branch=branch, snapshot_id=snapshot_id)
        .where(F.col("content") == "data")
        .select("entry_json")
        .mapInPandas(probe, "entry_json string")
        .collect()
    )
    return [DataFileEntry.from_json(_json.loads(r["entry_json"])) for r in rows]


def retire_equality_deletes(
    table: LakeTable, branch: str = MAIN
) -> RetireResult:
    """Convert every live equality-delete file into position deletes in
    one atomic commit. Candidate data files are pruned by sequence +
    PK-range + bloom-sidecar membership (delete_may_hit — false positives
    only cost a key-column scan; false negatives impossible), then ONE
    slim scan of their PK columns joins the delete keys to material
    (file, pos) tombstones. Data files whose every physical row is deleted
    are removed metadata-only. Scan output is identical before and after
    (pinned by tests): the eq anti-join over all older files becomes an
    exact-path anti-join over only the files that contain deleted keys."""
    deletes = table.delete_files(branch=branch)
    if not deletes:
        return RetireResult(snapshot=None)
    planned_parent = table.current_snapshot_id(branch)
    from airbyte_spark.operators.cluster import delete_may_hit

    schema = table.schema(branch=branch)
    pk = table.primary_key
    # affected-file selection: the same sequence+range+bloom predicate the
    # cluster victim selector runs. Past the planning threshold it runs
    # over executor-parsed manifests (entries_df) so the driver never
    # materializes an O(table) entry list — same policy as cluster/merge.
    infos = table.snapshot(branch=branch).manifest_infos
    total_entries = (
        sum(i.get("entry_count", 0) for i in infos) if infos else None
    )
    dist_threshold = int(
        table.properties.get("cluster.planning.distributed-threshold", 100_000)
    )
    if total_entries is not None and total_entries > dist_threshold:
        affected = _affected_entries_distributed(
            table, deletes, pk, schema, branch, planned_parent
        )
    else:
        data = table.data_files(branch=branch)
        cache: dict = {}
        affected = [
            e
            for e in data
            if any(
                delete_may_hit(e, d, pk, schema, cache=cache) for d in deletes
            )
        ]
    add: list[DataFileEntry] = []
    remove = {d.path for d in deletes}
    full_paths: set[str] = set()
    pos_rows = 0
    referenced = 0
    if affected:
        by_tail = {file_tail(e.path, POS_KEY_DEPTH): e for e in affected}
        scan = _pos_scan(table, affected, keep_mor_seq=True).select(
            *pk, "_pos_file", "_pos_idx", "_mor_seq"
        )
        keys = equality_delete_keys(table, deletes)
        if sum(d.rows for d in deletes) <= 2_000_000:
            keys = F.broadcast(keys)
        pairs = (
            scan.join(keys, on=pk, how="inner")
            .filter(F.col("_mor_seq") < F.col("_del_seq"))
            .select(
                F.col("_pos_file").alias("file_path"),
                F.col("_pos_idx").alias("pos"),
            )
        )
        add = table.write_position_delete_files(
            pairs, referenced=[e.path for e in affected]
        )
        # the written tombstone set is micro-batch-scale; one cheap read
        # refines `referenced` to the files that actually matched and
        # surfaces fully-dead files for metadata removal
        if add:
            counts = {
                r["file_path"]: r["n"]
                for r in table.spark.read.parquet(*(e.path for e in add))
                .groupBy("file_path")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            pos_rows = int(sum(counts.values()))
            referenced = len(counts)
            full_tails = {
                t for t, n in counts.items() if n == by_tail[t].rows
            }
            full_paths = {by_tail[t].path for t in full_tails}
            for e in add:
                if e.referenced is not None:
                    e.referenced = sorted(
                        by_tail[t].path for t in counts if t not in full_tails
                    )
            if set(counts) <= full_tails:
                # every matched file died whole — the tombstones are inert
                import os as _os

                for e in add:
                    _os.unlink(e.path)
                add = []
                pos_rows = 0
    snap = table.commit(
        "retire-deletes",
        add,
        remove_paths=remove | full_paths,
        branch=branch,
        expected_parent=planned_parent,
        summary={
            "converted_delete_files": len(deletes),
            "position_delete_rows": pos_rows,
            "scanned_files": len(affected),
            "removed_files": len(full_paths),
        },
    )
    return RetireResult(
        snapshot=snap,
        converted_delete_files=len(deletes),
        position_delete_rows=pos_rows,
        scanned_files=len(affected),
        referenced_files=referenced,
        removed_files=len(full_paths),
    )


@dataclass
class TombstoneCompactionResult:
    snapshot: Snapshot | None
    input_files: int = 0
    output_files: int = 0
    rows_before: int = 0
    rows_after: int = 0


def compact_position_deletes(
    table: LakeTable,
    branch: str = MAIN,
    min_input_files: int = 2,
) -> TombstoneCompactionResult:
    """Fold many small position-delete files into one (Iceberg's
    rewrite_position_delete_files): stacked DELETE WHERE commits each add
    a tombstone file every scan must union — compaction bounds that at
    one file, and drops rows whose named data file is no longer live
    (inert: rewrites mint new paths). Tombstone sets are O(deleted rows),
    micro-scale next to the data, so the rewrite is one slim job; the
    liveness check is a bounded semi-join over the referenced unions
    (never an O(table) driver list). Rows of an unknown-inventory file
    (referenced=None) are kept verbatim — they cannot be attributed."""
    pos = table.position_delete_files(branch=branch)
    if len(pos) < min_input_files:
        return TombstoneCompactionResult(None, input_files=len(pos))
    planned_parent = table.current_snapshot_id(branch)
    known_refs: set[str] = set()
    any_unknown = False
    for d in pos:
        if d.referenced is None:
            any_unknown = True
        else:
            known_refs.update(d.referenced)
    # liveness of the (bounded) referenced union via one slim semi-join
    # against executor-parsed manifests
    live_refs: set[str] = set()
    if known_refs:
        refs_df = table.spark.createDataFrame(
            [(p,) for p in sorted(known_refs)], "path string"
        )
        live_refs = {
            r["path"]
            for r in table.entries_df(branch=branch, snapshot_id=planned_parent)
            .where(F.col("content") == "data")
            .join(F.broadcast(refs_df), on="path", how="inner")
            .select("path")
            .collect()
        }
    dead_tails = {
        file_tail(p, POS_KEY_DEPTH) for p in known_refs - live_refs
    }
    rows = table.spark.read.schema("file_path string, pos long").parquet(
        *(d.path for d in pos)
    )
    if dead_tails:
        rows = rows.filter(~F.col("file_path").isin(*sorted(dead_tails)))
    # exact duplicates across stacked DELETEs collapse too
    rows = rows.distinct()
    add = table.write_position_delete_files(
        rows,
        referenced=None if any_unknown else sorted(live_refs),
    )
    snap = table.commit(
        "rewrite-tombstones",
        add,
        remove_paths={d.path for d in pos},
        branch=branch,
        expected_parent=planned_parent,
        summary={
            "input_files": len(pos),
            "output_files": len(add),
            "rows_after": sum(e.rows for e in add),
        },
    )
    return TombstoneCompactionResult(
        snapshot=snap,
        input_files=len(pos),
        output_files=len(add),
        rows_before=sum(d.rows for d in pos),
        rows_after=sum(e.rows for e in add),
    )


def dead_position_deletes(
    table: LakeTable,
    pos_entries: list[DataFileEntry],
    remove_paths: set[str],
    survivors: list[DataFileEntry] | None = None,
    branch: str = MAIN,
    snapshot_id: str | None = None,
) -> list[DataFileEntry]:
    """Position-delete entries none of whose referenced data files survive
    once this commit removes `remove_paths` — safe to drop alongside.
    With a driver `survivors` list the check is pure set algebra; without
    one (distributed planning) liveness of the referenced paths — a
    bounded set, REFERENCED_PATHS_CAP per entry — is answered by one slim
    semi-join against executor-parsed manifests (entries_df), never an
    O(table) driver list. referenced=None is never auto-retired."""
    cands = [d for d in pos_entries if d.referenced is not None]
    if not cands:
        return []
    need = set().union(*(d.referenced for d in cands)) - set(remove_paths)
    if not need:
        live: set[str] = set()
    elif survivors is not None:
        live = {e.path for e in survivors} & need
    else:
        refs_df = table.spark.createDataFrame(
            [(p,) for p in sorted(need)], "path string"
        )
        live = {
            r["path"]
            for r in table.entries_df(branch=branch, snapshot_id=snapshot_id)
            .join(F.broadcast(refs_df), on="path", how="inner")
            .select("path")
            .collect()
        }
    return [d for d in cands if not (set(d.referenced) & live)]
