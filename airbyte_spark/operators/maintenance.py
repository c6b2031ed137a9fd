"""The north-star maintenance pipeline: MERGE -> compact -> cluster ->
manifest rewrite -> expire + GC, checkpointed per stage so a killed job
resumes idempotently (SURVEY.md §2.11, BASELINE.json north_rule).

Runs entirely on a staging branch and swaps main atomically at the end,
so concurrent readers of main see the pre-maintenance snapshot for the
whole job (snapshot isolation, S3DataLakeStreamLoader.kt:74-133).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from airbyte_spark.checkpoints import JobCheckpointer
from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.operators.cluster import cluster
from airbyte_spark.operators.compact import compact
from airbyte_spark.operators.merge import merge_into


@dataclass
class MaintenanceReport:
    job_id: str
    stages: dict = field(default_factory=dict)  # name -> metrics
    wall_s: float = 0.0
    rows: int = 0

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.wall_s if self.wall_s else 0.0


def run_maintenance(
    table: LakeTable,
    job_id: str,
    merge_source: DataFrame | None = None,
    cursor_col: str | None = "updated_at",
    cluster_dims: list[str] | None = None,
    curve: str = "zorder",
    target_file_bytes: int | None = None,
    expire_keep_last: int | None = None,
    use_staging: bool = True,
    merge_mode: str = "cow",
    compact_mode: str = "auto",  # auto | always | never
    cluster_scope: str = "dirty",  # dirty | full
) -> MaintenanceReport:
    """Full maintenance pass. Stage boundaries are checkpoint boundaries:
    each stage's snapshot commit + ledger write is atomic-by-effect, so a
    re-run with the same job_id skips completed stages (T4/T5).

    merge_mode="mor" runs the merge as insert+equality-delete (O(batch)
    writes); the compact and cluster stages downstream fold the deletes
    back into data files, so one maintenance pass leaves a clean CoW-state
    table either way.

    cluster_scope="dirty" (default — r3 verdict top item) makes the
    cluster stage rewrite ONLY files that need it (new since their last
    cluster, delete-affected, or under-sized; operators/cluster.py victim
    selection), so steady-state maintenance cost is O(batch), not
    O(table). The first-ever pass sees everything dirty and behaves as a
    full rewrite; pass "full" to force the global re-sort that restores
    disjoint key ranges after many incremental passes.

    compact_mode="auto" (default) skips the compact stage: the cluster
    rewrite that follows already writes target-size files and folds live
    deletes (Iceberg's rewrite_data_files with a sort order IS
    compaction+clustering in one op — dirty scope's "undersized" victim
    criterion covers small clean files too), so a separate compact pass
    would rewrite the same payload twice — measured ~17% of pipeline wall
    at the 128k-image shape. "always" forces it (compaction-only
    maintenance or diagnostics); "never" skips unconditionally."""
    import os

    if compact_mode not in ("auto", "always", "never"):
        raise ValueError(f"compact_mode must be auto|always|never: {compact_mode!r}")
    if cluster_scope not in ("dirty", "full"):
        raise ValueError(f"cluster_scope must be dirty|full: {cluster_scope!r}")

    ck = JobCheckpointer(os.path.join(table.root, "checkpoints"), job_id)
    branch = f"staging-{job_id}" if use_staging else MAIN
    t0 = time.monotonic()
    report = MaintenanceReport(job_id=job_id)

    def _stage(seq: int, name: str, fn):
        s0 = time.monotonic()
        metrics, ran = ck.run_step(seq, name, fn)
        report.stages[name] = {
            **metrics,
            "resumed": not ran,
            "sec": round(time.monotonic() - s0, 3),
        }
        return metrics

    _stage(0, "start", lambda: (
        table.create_branch(branch, from_branch=MAIN)
        if use_staging and branch not in table.branches()
        else None
    ) or {"branch": branch})

    def _merge():
        if merge_source is None:
            return {"rows": 0, "skipped": True}
        # sorted write (guide §6): the merge emits its data files already
        # ordered by the cluster stage's curve key and stamped with the
        # registered sort-order id, so the cluster pass below never
        # rewrites the bytes this merge just wrote — in steady state the
        # cluster stage becomes metadata-only
        sort_spec = None
        dims = cluster_dims or ["phash", "w", "h"]
        if all(d in table.schema(branch=branch).fieldNames() for d in dims):
            bits = min(63 // len(dims), 21)
            sort_spec = {
                "dims": dims,
                "curve": curve,
                "bits": bits,
                "order_id": table.ensure_sort_order(dims, curve, bits),
            }
        res = merge_into(
            table, merge_source, cursor_col=cursor_col, branch=branch,
            target_file_bytes=target_file_bytes, mode=merge_mode,
            sort_spec=sort_spec,
        )
        return {
            "rows": res.source_rows,
            "deduped_rows": res.deduped_rows,
            "rewritten_files": res.rewritten_files,
            "added_files": res.added_files,
            "snapshot": res.snapshot.snapshot_id,
            "phase_sec": res.phase_sec,
        }
    m = _stage(1, "merge", _merge)
    report.rows += int(m.get("rows", 0))

    def _compact():
        if compact_mode != "always":
            return {"skipped": "subsumed by the full-table cluster rewrite"}
        res = compact(table, target_file_bytes=target_file_bytes, branch=branch)
        return {
            "files_before": res.files_before,
            "files_after": res.files_after,
            "bins": len(res.plan.bins),
            "rewritten_bytes": res.rewritten_bytes,
        }
    _stage(2, "compact", _compact)

    def _cluster():
        res = cluster(
            table, dims=cluster_dims, curve=curve,
            target_file_bytes=target_file_bytes, branch=branch,
            scope=cluster_scope,
        )
        return {
            "files_after": res.files_after,
            "curve": curve,
            "scope": res.scope,
            "phase_sec": res.phase_sec,
            "rewritten_files": res.rewritten_files,
            "rewritten_bytes": res.rewritten_bytes,
            "skipped_files": res.skipped_files,
            "skipped_bytes": res.skipped_bytes,
            "dropped_delete_files": res.dropped_delete_files,
            "victim_reasons": res.victim_reasons,
        }
    _stage(3, "cluster", _cluster)

    # files written outside a JVM context (the streaming sink's Python
    # DataSource workers) land without PK bloom sidecars; stamp them here
    # so membership pruning is tight again. Steady state: metadata-only
    # no-op (zero bloom-less files -> no Spark job, no commit).
    _stage(4, "attach-blooms", lambda: {
        "backfilled": table.backfill_pk_blooms(branch=branch)
    })

    def _manifests():
        # O(table) footer recompute — only worth it when a prior stage
        # actually changed files; a no-op steady-state cycle skips it
        changed = (
            int(report.stages.get("merge", {}).get("rows", 0)) > 0
            or int(report.stages.get("cluster", {}).get("rewritten_files", 0)) > 0
            or report.stages.get("compact", {}).get("bins", 0)
        )
        if not changed:
            return {"skipped": "no files changed this cycle"}
        return {
            "entries": table.rewrite_manifests(branch=branch).summary[
                "rewritten_entries"
            ]
        }
    _stage(5, "rewrite-manifests", _manifests)

    def _swap():
        if use_staging:
            table.replace_branch(MAIN, branch)
            table.drop_branch(branch)
        return {"swapped": use_staging}
    _stage(6, "swap", _swap)

    # derived artifacts (rollups / near-dup indexes) advance from the
    # just-published state, BEFORE expire/GC shortens the snapshot chain
    # their changelog windows read; the updaters are watermark-idempotent
    # so checkpoint replay is safe, and a no-op registry costs nothing
    def _derived():
        from airbyte_spark.operators.derived import update_derived_tables

        reports = update_derived_tables(table, branch=MAIN)
        return {"artifacts": reports} if reports else {"skipped": "none registered"}
    _stage(7, "update-derived", _derived)

    def _gc():
        expired = table.expire_snapshots_by_policy(keep_last=expire_keep_last)
        orphans = table.remove_orphan_files()
        return {"expired_snapshots": len(expired), "orphan_files": len(orphans)}
    _stage(8, "expire-gc", _gc)

    report.wall_s = time.monotonic() - t0
    if not report.rows:
        report.rows = sum(e.rows for e in table.data_files())
    return report


def run_partitioned_maintenance(
    table: LakeTable,
    job_id: str,
    partitions: list[dict] | None = None,
    max_concurrent: int = 4,
    cluster_dims: list[str] | None = None,
    curve: str = "zorder",
    target_file_bytes: int | None = None,
    expire_keep_last: int | None = None,
    compact_mode: str = "auto",  # auto | always | never (see run_maintenance)
    cluster_scope: str = "dirty",  # dirty | full
) -> MaintenanceReport:
    """Per-partition maintenance, partitions in PARALLEL — the job shape
    that bounds every rewrite and commit at 10^12 rows: each partition's
    compact + cluster is an independent job over only that partition's
    files (scheduled here as driver threads; on a real deployment each is
    its own spark-submit, see scripts/weak_scaling.py). Commits are
    optimistic — concurrent partitions race on the refs pointer only and
    resolve via retry_on_conflict re-planning (Iceberg commit.retry), never
    on data files (partitions are disjoint by construction).

    `partitions`: list of {col: value} filters; default = only partitions
    holding at least one rewrite victim under `cluster_scope="dirty"`
    (clean partitions are never visited — O(change) at table scale; pass
    cluster_scope="full" to rewrite every live partition). Ends with ONE
    table-wide expire+GC."""
    from concurrent.futures import ThreadPoolExecutor

    from airbyte_spark.lake.retry import retry_on_conflict

    if compact_mode not in ("auto", "always", "never"):
        raise ValueError(f"compact_mode must be auto|always|never: {compact_mode!r}")
    if cluster_scope not in ("dirty", "full"):
        raise ValueError(f"cluster_scope must be dirty|full: {cluster_scope!r}")

    t0 = time.monotonic()
    report = MaintenanceReport(job_id=job_id)
    skipped_partitions = 0
    if partitions is None:
        seen: dict[tuple, dict] = {}
        for e in table.data_files():
            if e.partition:
                key = tuple(sorted(e.partition.items()))
                seen.setdefault(key, dict(e.partition))
        if not seen:
            raise ValueError("table has no partitions; use run_maintenance")
        if cluster_scope == "dirty":
            # manifest-metadata victim pre-scan: a partition with zero
            # victims is never visited (no Spark job, no commit)
            from airbyte_spark.operators.cluster import (
                DEFAULT_TARGET_FILE_BYTES,
                select_cluster_victims,
            )

            dims = cluster_dims or ["phash", "w", "h"]
            bits = min(63 // len(dims), 21)
            order_id = table.ensure_sort_order(dims, curve, bits)
            tfb = target_file_bytes or int(
                table.properties.get(
                    "write.target-file-size-bytes", DEFAULT_TARGET_FILE_BYTES
                )
            )
            deletes = table.delete_files()
            pos_deletes = table.position_delete_files()
            max_eras = int(table.properties.get("cluster.max-delete-eras", 8) or 0)
            eras = {d.sequence or 0 for d in deletes} | {
                d.sequence or 0 for d in pos_deletes
            }
            fold = bool(max_eras) and len(eras) > max_eras
            victims, _ = select_cluster_victims(
                table, table.data_files(), deletes, order_id, tfb,
                fold_deletes=fold,
                max_sorted_levels=int(
                    table.properties.get("cluster.max-sorted-levels", 8) or 0
                ),
                pos_deletes=pos_deletes,
            )
            dirty = {tuple(sorted(v.partition.items())) for v in victims}
            skipped_partitions = len(seen) - len(dirty & set(seen))
            partitions = [seen[k] for k in sorted(seen) if k in dirty]
        else:
            partitions = [seen[k] for k in sorted(seen)]
    if not partitions:
        report.stages["summary"] = {
            "dirty_partitions": 0, "skipped_partitions": skipped_partitions,
        }
        report.wall_s = time.monotonic() - t0
        report.rows = sum(e.rows for e in table.data_files())
        return report

    def one(pf: dict) -> dict:
        s0 = time.monotonic()
        # the partition-scoped cluster rewrites the partition's victim
        # files at target size with deletes applied — a compact pass
        # before it rewrites the same payload twice (see run_maintenance
        # compact_mode)
        bins = None
        if compact_mode == "always":
            c = retry_on_conflict(
                lambda: compact(
                    table, target_file_bytes=target_file_bytes,
                    partition_filter=pf,
                )
            )
            bins = len(c.plan.bins)
        k = retry_on_conflict(
            lambda: cluster(
                table,
                dims=cluster_dims,
                curve=curve,
                target_file_bytes=target_file_bytes,
                partition_filter=pf,
                scope=cluster_scope,
            )
        )
        return {
            "partition": pf,
            "compact_bins": bins,
            "cluster_files": k.files_after,
            "rewritten_files": k.rewritten_files,
            "skipped_files": k.skipped_files,
            "sec": round(time.monotonic() - s0, 3),
        }

    with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
        for m in pool.map(one, partitions):
            report.stages[f"partition-{m['partition']}"] = m
    report.stages["summary"] = {
        "dirty_partitions": len(partitions),
        "skipped_partitions": skipped_partitions,
    }
    # partition-scoped clusters keep equality-delete files alive (they may
    # still apply to other partitions); fold + drop them table-wide once
    # debt crosses the era threshold (the scan-side anti-join keeps
    # un-folded deletes correct meanwhile — same policy as the dirty
    # cluster and the MoR merge). Cheap when it runs: the per-partition
    # rewrites already restamped most data files to a newer sequence
    leftover = table.delete_files() + table.position_delete_files()
    max_eras = int(table.properties.get("cluster.max-delete-eras", 8) or 0)
    if leftover and (
        cluster_scope == "full"
        or (bool(max_eras) and len({d.sequence or 0 for d in leftover}) > max_eras)
    ):
        from airbyte_spark.operators.deletes import rewrite_deletes

        fold = retry_on_conflict(lambda: rewrite_deletes(table))
        report.stages["fold-deletes"] = {
            "rewritten_files": fold.rewritten_files,
            "dropped_delete_files": fold.dropped_delete_files,
        }
    backfilled = retry_on_conflict(lambda: table.backfill_pk_blooms())
    if backfilled:
        report.stages["attach-blooms"] = {"backfilled": backfilled}
    # derived artifacts advance BEFORE GC shortens the snapshot chain
    # their changelog windows read (same ordering as run_maintenance)
    from airbyte_spark.operators.derived import update_derived_tables

    derived = update_derived_tables(table)
    if derived:
        report.stages["update-derived"] = {"artifacts": derived}
    expired = table.expire_snapshots_by_policy(keep_last=expire_keep_last)
    orphans = table.remove_orphan_files()
    report.stages["expire-gc"] = {
        "expired_snapshots": len(expired),
        "orphan_files": len(orphans),
    }
    report.wall_s = time.monotonic() - t0
    report.rows = sum(e.rows for e in table.data_files())
    return report
