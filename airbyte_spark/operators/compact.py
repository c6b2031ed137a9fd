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


def compact(
    table: LakeTable,
    target_file_bytes: int | None = None,
    small_file_threshold: float = 0.75,
    branch: str = MAIN,
    partition_filter: dict | None = None,
) -> CompactionResult:
    """Rewrite small files into ~target-size bins; one atomic commit.
    With `partition_filter` only that partition's files are considered —
    the bounded per-partition job shape for 10^12-row tables."""
    target_file_bytes = target_file_bytes or int(
        table.properties.get("write.target-file-size-bytes", DEFAULT_TARGET_FILE_BYTES)
    )
    # pin the snapshot we plan against: a concurrent commit between
    # planning and commit raises CommitConflict instead of being discarded
    planned_parent = table.current_snapshot_id(branch)
    # partition_filter prunes whole manifests via the summaries too
    entries = table.data_files(branch=branch, partition_filter=partition_filter)
    if partition_filter:
        from airbyte_spark.lake.table import partition_matches

        entries = [e for e in entries if partition_matches(e, partition_filter)]
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

    all_new, all_victims = [], set()
    plans: list[CompactionPlan] = []
    for (gen, sid, _pkey), group in sorted(groups.items()):
        plan = plan_ffd(
            [(e.path, e.bytes, e.rows) for e in group],
            target_bytes=target_file_bytes,
            small_file_threshold=small_file_threshold,
        )
        plans.append(plan)
        if not plan.bins:
            continue
        seq_by_path = {e.path: e.sequence or 0 for e in group}
        new_entries = _execute_bins(
            table, plan, gen, sid, deletes, seq_by_path, pos_deletes
        )
        all_new.extend(new_entries)
        for b in plan.bins:
            all_victims.update(b.paths)

    merged_plan = CompactionPlan(
        bins=[b for p in plans for b in p.bins],
        skipped_files=sum(p.skipped_files for p in plans),
    )
    if not all_new:
        return CompactionResult(None, merged_plan, len(entries), len(entries), 0)

    # a position-delete entry none of whose referenced files survive this
    # commit is retired alongside (its tombstones were folded into the bins)
    from airbyte_spark.operators.posdeletes import dead_position_deletes

    if partition_filter is None:
        survivors = [e for e in entries if e.path not in all_victims]
        dead_pos = dead_position_deletes(
            table, pos_deletes, all_victims, survivors=survivors
        )
    else:
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
        files_before=len(entries),
        files_after=len(table.data_files(branch=branch)),
        rewritten_bytes=sum(b.bytes for b in merged_plan.bins),
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
