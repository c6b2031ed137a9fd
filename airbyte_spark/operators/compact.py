"""Bin-packed small-file compaction (SURVEY.md §2.11 row 1).

Plan: driver-side FFD over the manifest file-size histogram (plans/ffd.py).
Execute: ONE Spark job for all bins — read every victim file, tag each row
with its bin via an `input_file_name()` → bin_id broadcast map-literal
lookup (no shuffle-side join), hash-repartition on bin_id so each bin's
rows land wholly in one task, and write `partitionBy("_bin")` so the
writer emits exactly one parquet file per bin regardless of hash
collisions between bins. Commit swaps victims for packed files atomically.

Reference anchors: rolling-writer target size IcebergTableWriterFactory.kt:
77-82; compaction-file awareness in generation deletes IcebergTableCleaner.
kt:55-62; docs/integrations/destinations/s3-data-lake.md:359-369 (Airbyte
defers compaction to an external engine — this module is that engine).

Scale note: bins are independent tasks; 10^6 small files → ~10^4 bins →
10^4 tasks across the cluster, zero driver row traffic. Row order within a
file is preserved per-file (parquet scan order) and files within a bin are
concatenated; PK sort order across bin boundaries is restored by the
clustering job, not compaction (same division as Iceberg's binpack vs sort
rewrite strategies).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from airbyte_spark.lake.format import Snapshot
from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.plans.ffd import CompactionPlan, plan_ffd

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


@dataclass
class CompactionResult:
    snapshot: Snapshot | None
    plan: CompactionPlan
    files_before: int
    files_after: int
    rewritten_bytes: int
    # partial-progress mode only: every chunk commit that landed, and how
    # many chunks were abandoned to a concurrent writer (their output
    # files are deleted; their victims stay live for the next pass)
    snapshots: list = None  # type: ignore[assignment]
    skipped_chunks: int = 0


def compact(
    table: LakeTable,
    target_file_bytes: int | None = None,
    small_file_threshold: float = 0.75,
    branch: str = MAIN,
    partition_filter: dict | None = None,
    partial_progress: bool | None = None,
    max_commits: int | None = None,
    _between_chunks=None,
) -> CompactionResult:
    """Rewrite small files into ~target-size bins; one atomic commit.
    With `partition_filter` only that partition's files are considered —
    the bounded per-partition job shape for 10^12-row tables.

    `partial_progress=True` (Iceberg RewriteDataFiles
    `partial-progress.enabled`, Spark action RewriteDataFilesSparkAction):
    the bins are split across up to `max_commits` INDEPENDENT commits, so
    at 100-TB scale an executor loss or a concurrent writer voids one
    chunk of the rewrite, never hours of finished work. Each chunk
    re-validates against the branch head at its own commit time — its
    victims must still be live and no NEW delete files may have landed
    since planning (a post-plan tombstone would stop applying to the
    re-sequenced packed file and silently resurrect rows) — and a chunk
    that fails validation is abandoned: its output files are deleted and
    its victims remain for the next maintenance cycle. `_between_chunks`
    is a test seam called after each chunk's Spark job, before its
    commit."""
    props = table.properties
    # accept source-column literals for transformed partition fields
    # (idempotent on already-normalized {field: layout-string} dicts)
    partition_filter = table.resolve_partition_filter(partition_filter)
    target_file_bytes = target_file_bytes or int(
        props.get("write.target-file-size-bytes", DEFAULT_TARGET_FILE_BYTES)
    )
    if partial_progress is None:
        partial_progress = str(
            props.get("compact.partial-progress.enabled", "false")
        ).lower() in ("true", "1")
    if max_commits is None:
        max_commits = int(props.get("compact.partial-progress.max-commits", 10))
    # pin the snapshot we plan against: a concurrent commit between
    # planning and commit raises CommitConflict instead of being discarded
    planned_parent = table.current_snapshot_id(branch)
    # candidate predicate is pure per-entry (bytes < cutoff), so past the
    # distributed threshold selection runs over executor-parsed manifests
    # and the driver collects only O(small files) entry blobs — the same
    # shape as cluster's distributed victim selection; entry counts come
    # from the manifest-list summaries (deciding HOW to plan must not
    # itself cost an O(table) manifest parse)
    cutoff = int(target_file_bytes * small_file_threshold)
    infos = table.snapshot(branch=branch).manifest_infos
    total_entries = sum(i.get("entry_count", 0) for i in infos) if infos else None
    dist_threshold = int(
        props.get("compact.planning.distributed-threshold", 100_000)
    )
    distributed = total_entries is not None and total_entries > dist_threshold
    pre_skipped = 0
    if distributed:
        entries, files_before = _small_candidates_distributed(
            table, branch, planned_parent, partition_filter, cutoff
        )
        pre_skipped = files_before - len(entries)
    else:
        # partition_filter prunes whole manifests via the summaries too
        entries = table.data_files(
            branch=branch, partition_filter=partition_filter
        )
        if partition_filter:
            from airbyte_spark.lake.table import partition_matches

            entries = [
                e for e in entries if partition_matches(e, partition_filter)
            ]
        files_before = len(entries)
    deletes = table.delete_files(branch=branch)
    pos_deletes = table.position_delete_files(branch=branch)
    # group by (generation, schema, partition) — files may only be packed
    # with peers of the same schema + generation (generation-tagged naming
    # S14, IcebergUtil.kt:58-69) and the same partition (partition-scoped
    # rewrites keep commits bounded and parallelizable at table scale)
    groups: dict[tuple, list] = {}
    for e in entries:
        pkey = tuple(sorted(e.partition.items()))
        groups.setdefault((e.generation_id, e.schema_id, pkey), []).append(e)

    group_plans = []  # (generation_id, schema_id, seq_by_path, plan)
    plans: list[CompactionPlan] = []
    for (gen, sid, _pkey), group in sorted(groups.items()):
        plan = plan_ffd(
            [(e.path, e.bytes, e.rows) for e in group],
            target_bytes=target_file_bytes,
            small_file_threshold=small_file_threshold,
        )
        plans.append(plan)
        if plan.bins:
            group_plans.append(
                (gen, sid, {e.path: e.sequence or 0 for e in group}, plan)
            )

    merged_plan = CompactionPlan(
        bins=[b for p in plans for b in p.bins],
        skipped_files=sum(p.skipped_files for p in plans) + pre_skipped,
    )
    if not group_plans:
        return CompactionResult(None, merged_plan, files_before, files_before, 0)

    if partial_progress and len(merged_plan.bins) > 1 and max_commits > 1:
        return _compact_partial(
            table, group_plans, deletes, pos_deletes, branch,
            merged_plan, files_before, max_commits, _between_chunks,
        )

    all_new, all_victims = [], set()
    for gen, sid, seq_by_path, plan in group_plans:
        all_new.extend(
            _execute_bins(table, plan, gen, sid, deletes, seq_by_path, pos_deletes)
        )
        for b in plan.bins:
            all_victims.update(b.paths)

    # a position-delete entry none of whose referenced files survive this
    # commit is retired alongside (its tombstones were folded into the bins)
    from airbyte_spark.operators.posdeletes import dead_position_deletes

    if partition_filter is None and not distributed:
        survivors = [e for e in entries if e.path not in all_victims]
        dead_pos = dead_position_deletes(
            table, pos_deletes, all_victims, survivors=survivors
        )
    else:
        # scoped or distributed planning never held the full entry list —
        # referenced-path liveness resolves via the entries_df semi-join
        dead_pos = dead_position_deletes(
            table, pos_deletes, all_victims, branch=branch,
            snapshot_id=planned_parent,
        )
    snap = table.commit(
        "compact",
        all_new,
        remove_paths=all_victims | {d.path for d in dead_pos},
        branch=branch,
        expected_parent=planned_parent,
        summary={
            "bins": len(merged_plan.bins),
            "input_files": merged_plan.input_files,
            "skipped_files": merged_plan.skipped_files,
        },
    )
    return CompactionResult(
        snapshot=snap,
        plan=merged_plan,
        files_before=files_before,
        # arithmetic, not a second table listing (at 30M files the old
        # len(table.data_files()) here was its own O(table) driver pass)
        files_after=files_before - len(all_victims) + len(all_new),
        rewritten_bytes=sum(b.bytes for b in merged_plan.bins),
        snapshots=[snap],
    )


def _small_candidates_distributed(
    table: LakeTable,
    branch: str,
    snapshot_id: str | None,
    partition_filter: dict | None,
    cutoff: int,
):
    """(candidate small data entries, total matching data-file count),
    selected on executors over entries_df — the FFD candidate predicate
    (bytes < small_file_threshold × target) is pure per-entry, so past
    the planning threshold the driver collects only O(small files) entry
    blobs, never the table's file list (same shape as cluster's
    select_cluster_victims_distributed / Iceberg SparkDistributedDataScan
    planning). Partition scoping matches the driver rule exactly: an
    anchored canonical-key pair match per filter entry."""
    import json as _json
    import re as _re

    from airbyte_spark.lake.format import DataFileEntry
    from airbyte_spark.lake.table import partition_str

    edf = table.entries_df(branch=branch, snapshot_id=snapshot_id)
    cond = F.col("content") == "data"
    if partition_filter:
        for k, v in partition_filter.items():
            pair = _re.escape(f"{k}={partition_str(v)}")
            cond = cond & F.col("partition_key").rlike(f"(^|/){pair}(/|$)")
    data = edf.filter(cond)
    total = data.count()
    rows = data.filter(F.col("bytes") < cutoff).select("entry_json").collect()
    entries = [DataFileEntry.from_json(_json.loads(r["entry_json"])) for r in rows]
    return entries, total


class _ChunkAbandoned(Exception):
    """A partial-progress chunk failed commit-time validation (victims
    rewritten by a concurrent commit, or new delete files landed since
    planning) — the chunk is dropped, not retried: neither condition can
    revert. ``pass_fatal`` marks conditions that also doom every LATER
    chunk (a post-plan delete file stays live for the rest of the pass);
    the loop stops instead of executing rewrites it will abandon."""

    def __init__(self, msg: str, pass_fatal: bool = False):
        super().__init__(msg)
        self.pass_fatal = pass_fatal


def _compact_partial(
    table: LakeTable,
    group_plans: list,
    deletes,
    pos_deletes,
    branch: str,
    merged_plan: CompactionPlan,
    files_before: int,
    max_commits: int,
    between_chunks,
) -> CompactionResult:
    """Execute the planned bins as up to `max_commits` independent commits.

    Chunk assignment is round-robin over bins sorted by descending bytes,
    so every commit carries a comparable rewrite volume (one straggler
    chunk would serialize the tail). Each chunk is validated against the
    CURRENT branch head inside the commit-retry loop: a parent move alone
    re-validates and re-commits (cheap — the Spark job is NOT re-run; the
    packed files are already on disk), while a victim loss or a post-plan
    delete file abandons the chunk and deletes its output."""
    import os

    from airbyte_spark.lake.retry import retry_on_conflict
    from airbyte_spark.lake.table import CommitConflict
    from airbyte_spark.operators.posdeletes import dead_position_deletes

    units = [
        (gi, b)
        for gi, (_gen, _sid, _seq, plan) in enumerate(group_plans)
        for b in plan.bins
    ]
    n_chunks = min(max_commits, len(units))
    chunks: list[list] = [[] for _ in range(n_chunks)]
    for i, unit in enumerate(sorted(units, key=lambda u: -u[1].bytes)):
        chunks[i % n_chunks].append(unit)

    planned_delete_paths = {d.path for d in deletes} | {
        d.path for d in pos_deletes
    }
    snaps: list[Snapshot] = []
    skipped_chunks = 0
    rewritten_bytes = 0
    n_removed = n_added = 0
    for ci, chunk in enumerate(chunks):
        new_entries, victims = [], set()
        by_group: dict[int, list] = {}
        for gi, b in chunk:
            by_group.setdefault(gi, []).append(b)
        for gi, bins in sorted(by_group.items()):
            gen, sid, seq_by_path, _ = group_plans[gi]
            sub_plan = CompactionPlan(bins=bins, skipped_files=0)
            sub_seq = {p: seq_by_path[p] for b in bins for p in b.paths}
            new_entries.extend(
                _execute_bins(
                    table, sub_plan, gen, sid, deletes, sub_seq, pos_deletes
                )
            )
            victims.update(p for b in bins for p in b.paths)
        if between_chunks is not None:
            between_chunks(ci)

        def attempt():
            parent = table.current_snapshot_id(branch)
            live_pos = table.position_delete_files(branch=branch)
            current_delete_paths = {
                d.path for d in table.delete_files(branch=branch)
            } | {d.path for d in live_pos}
            if current_delete_paths - planned_delete_paths:
                raise _ChunkAbandoned(
                    "delete files landed since planning", pass_fatal=True
                )
            snap_now = table.snapshot(branch=branch)
            infos = snap_now.manifest_infos
            total_entries = (
                sum(i.get("entry_count", 0) for i in infos) if infos else None
            )
            dist_threshold = int(
                table.properties.get(
                    "compact.planning.distributed-threshold", 100_000
                )
            )
            if total_entries is not None and total_entries > dist_threshold:
                # liveness by a broadcast semi-join over executor-parsed
                # manifests — the driver never lists the table inside the
                # chunk loop (mirror of cluster's partial path)
                vdf = table.spark.createDataFrame(
                    [(p,) for p in sorted(victims)], "path string"
                )
                live_n = (
                    table.entries_df(branch=branch)
                    .filter(F.col("content") == "data")
                    .join(F.broadcast(vdf), "path", "left_semi")
                    .count()
                )
                if live_n != len(victims):
                    raise _ChunkAbandoned(
                        "victim rewritten by a concurrent commit"
                    )
                dead_pos = dead_position_deletes(
                    table, live_pos, victims, branch=branch,
                    snapshot_id=snap_now.snapshot_id,
                )
            else:
                live_entries = table.data_files(branch=branch)
                if not victims <= {e.path for e in live_entries}:
                    raise _ChunkAbandoned(
                        "victim rewritten by a concurrent commit"
                    )
                dead_pos = dead_position_deletes(
                    table, live_pos, victims,
                    survivors=[
                        e for e in live_entries if e.path not in victims
                    ],
                )
            return table.commit(
                "compact",
                new_entries,
                remove_paths=victims | {d.path for d in dead_pos},
                branch=branch,
                expected_parent=parent,
                summary={
                    "bins": len([b for _, b in chunk]),
                    "input_files": len(victims),
                    "partial-progress": f"{ci + 1}/{n_chunks}",
                },
            )

        try:
            snaps.append(retry_on_conflict(attempt))
            rewritten_bytes += sum(b.bytes for _, b in chunk)
            n_removed += len(victims)
            n_added += len(new_entries)
        except (_ChunkAbandoned, CommitConflict) as exc:
            skipped_chunks += 1
            for e in new_entries:
                for path in (e.path, e.path + ".bloom"):
                    try:
                        os.remove(path)
                    except OSError:
                        pass
            if getattr(exc, "pass_fatal", False):
                # the condition holds for every later chunk too — stop
                # before executing their rewrites
                skipped_chunks += len(chunks) - ci - 1
                break

    return CompactionResult(
        snapshot=snaps[-1] if snaps else None,
        plan=merged_plan,
        files_before=files_before,
        files_after=files_before - n_removed + n_added,
        rewritten_bytes=rewritten_bytes,
        snapshots=snaps,
        skipped_chunks=skipped_chunks,
    )


def _execute_bins(
    table: LakeTable,
    plan: CompactionPlan,
    generation_id: int,
    schema_id: int,
    deletes=None,
    seq_by_path: dict | None = None,
    pos_deletes=None,
):
    from airbyte_spark.operators.fileid import input_file_tail, tail_map

    spark = table.spark
    physical = table.registered_schema(schema_id)
    victims = [p for b in plan.bins for p in b.paths]
    # input_file_name() → bin id via a <dir>/<file>-keyed map literal
    # (operators/fileid.py — codegen'd lookup, no join, no shuffle)
    df = (
        spark.read.schema(physical)
        .parquet(*victims)
        .withColumn(
            "_bin", tail_map({p: b.bin_id for b in plan.bins for p in b.paths})
        )
    )
    # MoR tables: packed output files get a NEW commit sequence, so live
    # equality-deletes would stop applying to them, and position deletes
    # naming any victim must fold in (packed files carry new paths — an
    # unapplied tombstone would resurrect its rows). ALL file-identity
    # columns (input_file_name()-derived) must attach BEFORE the first
    # join: Spark's PreReadCheck rejects input_file_name on a plan with
    # more than one file source (caught by test_posdelete_model).
    min_seq = min(seq_by_path.values()) if seq_by_path else 0
    applicable = [d for d in (deletes or []) if (d.sequence or 0) > min_seq]
    vset = set(victims)
    applicable_pos = [
        d
        for d in (pos_deletes or [])
        if d.referenced is None or vset & set(d.referenced)
    ]
    if applicable:
        df = df.withColumn(
            "_mor_seq", tail_map({p: seq_by_path.get(p, 0) for p in victims})
        )
    if applicable_pos:
        from airbyte_spark.lake.table import (
            POS_KEY_DEPTH,
            apply_position_deletes,
        )

        df = df.withColumn("_pos_file", input_file_tail(POS_KEY_DEPTH)).withColumn(
            "_pos_idx", F.col("_metadata.row_index")
        )
        df = apply_position_deletes(table, df, applicable_pos).drop(
            "_pos_file", "_pos_idx"
        )
    if applicable:
        from airbyte_spark.lake.table import apply_equality_deletes

        df = apply_equality_deletes(table, df, applicable)
    n_bins = len(plan.bins)
    out = df.repartition(
        max(n_bins, spark.sparkContext.defaultParallelism), "_bin"
    )
    # NOTE: compaction entries must carry the victims' schema_id, not the
    # table's current one — write under a scoped entry collection
    entries = table.write_dataframe(out, generation_id=generation_id, partition_by="_bin")
    if schema_id != table.current_schema_id:
        for e in entries:
            e.schema_id = schema_id
    return entries
