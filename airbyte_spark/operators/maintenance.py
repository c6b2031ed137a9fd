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
    expire_keep_last: int = 2,
    use_staging: bool = True,
    merge_mode: str = "cow",
    compact_mode: str = "auto",  # auto | always | never
) -> MaintenanceReport:
    """Full maintenance pass. Stage boundaries are checkpoint boundaries:
    each stage's snapshot commit + ledger write is atomic-by-effect, so a
    re-run with the same job_id skips completed stages (T4/T5).

    merge_mode="mor" runs the merge as insert+equality-delete (O(batch)
    writes); the compact and cluster stages downstream fold the deletes
    back into data files, so one maintenance pass leaves a clean CoW-state
    table either way.

    compact_mode="auto" (default) skips the compact stage: the full-table
    cluster rewrite that follows already writes target-size files and
    folds every live delete (Iceberg's rewrite_data_files with a sort
    order IS compaction+clustering in one op), so a separate compact pass
    would rewrite the same payload twice — measured ~17% of pipeline wall
    at the 128k-image shape. "always" forces it (compaction-only
    maintenance or diagnostics); "never" skips unconditionally."""
    import os

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
        res = merge_into(
            table, merge_source, cursor_col=cursor_col, branch=branch,
            target_file_bytes=target_file_bytes, mode=merge_mode,
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

    if compact_mode not in ("auto", "always", "never"):
        raise ValueError(f"compact_mode must be auto|always|never: {compact_mode!r}")

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
        )
        return {"files_after": res.files_after, "curve": curve}
    _stage(3, "cluster", _cluster)

    _stage(4, "rewrite-manifests", lambda: {
        "entries": table.rewrite_manifests(branch=branch).summary["rewritten_entries"]
    })

    def _swap():
        if use_staging:
            table.replace_branch(MAIN, branch)
            table.drop_branch(branch)
        return {"swapped": use_staging}
    _stage(5, "swap", _swap)

    def _gc():
        expired = table.expire_snapshots(keep_last=expire_keep_last)
        orphans = table.remove_orphan_files()
        return {"expired_snapshots": len(expired), "orphan_files": len(orphans)}
    _stage(6, "expire-gc", _gc)

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
    expire_keep_last: int = 2,
    compact_mode: str = "auto",  # auto | always (see run_maintenance)
) -> MaintenanceReport:
    """Per-partition maintenance, partitions in PARALLEL — the job shape
    that bounds every rewrite and commit at 10^12 rows: each partition's
    compact + cluster is an independent job over only that partition's
    files (scheduled here as driver threads; on a real deployment each is
    its own spark-submit, see scripts/weak_scaling.py). Commits are
    optimistic — concurrent partitions race on the refs pointer only and
    resolve via retry_on_conflict re-planning (Iceberg commit.retry), never
    on data files (partitions are disjoint by construction).

    `partitions`: list of {col: value} filters; default = every live
    partition tuple in the manifests. Ends with ONE table-wide expire+GC."""
    from concurrent.futures import ThreadPoolExecutor

    from airbyte_spark.lake.retry import retry_on_conflict

    t0 = time.monotonic()
    report = MaintenanceReport(job_id=job_id)
    if partitions is None:
        seen: dict[tuple, dict] = {}
        for e in table.data_files():
            if e.partition:
                key = tuple(sorted(e.partition.items()))
                seen.setdefault(key, dict(e.partition))
        partitions = list(seen.values())
    if not partitions:
        raise ValueError("table has no partitions; use run_maintenance")

    def one(pf: dict) -> dict:
        s0 = time.monotonic()
        # the partition-scoped cluster rewrites every file of the
        # partition at target size with deletes applied — a compact pass
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
            )
        )
        return {
            "partition": pf,
            "compact_bins": bins,
            "cluster_files": k.files_after,
            "sec": round(time.monotonic() - s0, 3),
        }

    with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
        for m in pool.map(one, partitions):
            report.stages[f"partition-{m['partition']}"] = m
    # partition-scoped clusters keep equality-delete files alive (they may
    # still apply to other partitions); fold + drop them table-wide. Cheap:
    # the per-partition rewrites already restamped most data files to a
    # newer sequence, so few victims remain
    if table.delete_files():
        from airbyte_spark.operators.deletes import rewrite_deletes

        fold = retry_on_conflict(lambda: rewrite_deletes(table))
        report.stages["fold-deletes"] = {
            "rewritten_files": fold.rewritten_files,
            "dropped_delete_files": fold.dropped_delete_files,
        }
    expired = table.expire_snapshots(keep_last=expire_keep_last)
    orphans = table.remove_orphan_files()
    report.stages["expire-gc"] = {
        "expired_snapshots": len(expired),
        "orphan_files": len(orphans),
    }
    report.wall_s = time.monotonic() - t0
    report.rows = sum(e.rows for e in table.data_files())
    return report
