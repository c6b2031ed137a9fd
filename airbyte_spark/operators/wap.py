"""Write-audit-publish: stage commits on a branch, gate the publish on
data-quality audits, then fast-forward the target ref atomically.

The reference runs exactly this teardown for its data-lake destination —
every sync writes to a staging branch and `replaceBranch(main <- staging)`
only after the stream finishes cleanly (S3DataLakeStreamLoader.kt:96-133);
its connector acceptance suite then replays read-after-write, dedup, and
null-identifier checks against the published table
(BasicFunctionalityIntegrationTest.kt). `audit_branch` runs those checks
BEFORE the swap (the Iceberg write-audit-publish pattern), so a bad batch
never becomes readable on main:

- invariant audits in ONE full scan (conditional aggregates, no UDFs):
  null-PK rows, caller `expectations` (dbt-test-style boolean SQL
  predicates counted per violating row — a NULL predicate counts as a
  violation), row count;
- duplicate-PK audit as its own partial-agg groupBy (the only check that
  cannot ride the single-pass aggregate);
- row-delta-vs-base and file-debt audits from snapshot metadata alone
  (manifest row counts, live delete entries) — free at any table size.

`publish_branch` re-uses the fast-forward-only `replace_branch` swap, so
a commit that landed on the target after staging branched raises
CommitConflict instead of being silently discarded, and optionally tags
the published snapshot for time travel.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from airbyte_spark.lake.table import MAIN, LakeTable


@dataclass
class AuditResult:
    name: str
    passed: bool
    observed: object
    detail: str = ""


def _lineage(table: LakeTable, head: str | None) -> list[str]:
    """Snapshot ids from `head` back to the root (driver metadata walk,
    bounded by snapshot expiry)."""
    out: list[str] = []
    sid = head
    while sid is not None:
        out.append(sid)
        sid = table.snapshot(sid).parent_id
    return out


class AuditFailed(Exception):
    def __init__(self, results: list[AuditResult]):
        self.results = results
        failed = [r for r in results if not r.passed]
        super().__init__(
            "audit failed: "
            + "; ".join(f"{r.name}={r.observed} ({r.detail})" for r in failed)
        )


def audit_branch(
    table: LakeTable,
    branch: str,
    base: str = MAIN,
    *,
    require_no_null_pk: bool = True,
    require_no_dup_pk: bool = True,
    max_row_delta_fraction: float | None = None,
    max_delete_file_debt: int | None = None,
    expectations: dict[str, str] | None = None,
    rules: list[dict] | None = None,
) -> list[AuditResult]:
    """Run the audit suite against `branch` and return every result
    (callers usually go through `publish_branch`, which raises on any
    failure). `expectations` maps audit name -> boolean SQL predicate
    over the staged rows; a row where the predicate is NULL or false is
    a violation. `rules` accepts the full declarative grammar of
    operators/expectations.py (not_null / unique / accepted_values /
    range / regex / expression / freshness) — one extra pass over the
    staged scan (the row-level rules themselves share a single
    aggregate), one AuditResult per rule."""
    results: list[AuditResult] = []
    pk = table.primary_key

    df = table.scan(branch=branch)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    if require_no_null_pk and pk:
        null_pk = None
        for c in pk:
            n = F.col(c).isNull()
            null_pk = n if null_pk is None else (null_pk | n)
        aggs.append(
            F.sum(F.when(null_pk, 1).otherwise(0)).alias("_null_pk")
        )
    for name, pred in (expectations or {}).items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(F.expr(pred), F.lit(False)), 0).otherwise(1)
            ).alias(f"_x_{name}")
        )
    row = df.agg(*aggs).first()
    n_rows = row["_rows"] or 0

    if require_no_null_pk and pk:
        bad = row["_null_pk"] or 0
        results.append(
            AuditResult(
                "no_null_pk", bad == 0, bad,
                f"rows with NULL in any of {pk}",
            )
        )
    for name in (expectations or {}):
        bad = row[f"_x_{name}"] or 0
        results.append(
            AuditResult(name, bad == 0, bad, "violating rows")
        )

    if rules:
        from airbyte_spark.operators.expectations import validate as _validate

        for r in _validate(df, rules).collect():
            results.append(
                AuditResult(
                    f"{r['rule']}:{r['column']}",
                    bool(r["passed"]),
                    int(r["violations"]),
                    f"violations of {r['checked']} checked",
                )
            )

    if require_no_dup_pk and pk:
        # partial-agg groupBy on the PK projection only; nothing wide
        # crosses the shuffle
        dups = (
            df.select(*pk)
            .groupBy(*pk)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .count()
        )
        results.append(
            AuditResult("no_dup_pk", dups == 0, dups, "duplicated PK values")
        )

    if max_row_delta_fraction is not None:
        # metadata-only: base row count comes from manifest entry stats —
        # on a MoR base with un-folded delete debt this is an upper bound
        # of the live count (deltas read slightly small); publish flows
        # normally target a settled main, and the staged side is counted
        # exactly by the audit scan above
        base_rows = sum(e.rows or 0 for e in table.data_files(branch=base))
        delta = abs(n_rows - base_rows)
        frac = delta / base_rows if base_rows else float(n_rows > 0)
        results.append(
            AuditResult(
                "row_delta_within_bound",
                frac <= max_row_delta_fraction,
                round(frac, 6),
                f"|{n_rows} - {base_rows}| / {base_rows} vs "
                f"bound {max_row_delta_fraction}",
            )
        )

    if max_delete_file_debt is not None:
        debt = len(table.delete_files(branch=branch)) + len(
            table.position_delete_files(branch=branch)
        )
        results.append(
            AuditResult(
                "delete_file_debt_within_bound",
                debt <= max_delete_file_debt,
                debt,
                f"live delete entries vs bound {max_delete_file_debt}",
            )
        )

    return results


def publish_branch(
    table: LakeTable,
    source: str,
    target: str = MAIN,
    *,
    tag: str | None = None,
    drop_source: bool = False,
    on_conflict: str = "fail",  # fail | cherry-pick
    **audit_kwargs,
) -> list[AuditResult]:
    """Audit `source`, then fast-forward `target` onto its head (raising
    CommitConflict if `target` moved off the staged lineage — the caller
    rebases by re-staging, exactly like the reference's replaceBranch
    teardown). On success optionally tags the published snapshot and
    drops the staging ref. Returns the audit results; raises AuditFailed
    without touching any ref if a check fails.

    `on_conflict="cherry-pick"`: when the fast-forward is refused because
    `target` advanced concurrently, re-apply the staged commits onto the
    new head instead (Iceberg `cherrypick_snapshot`, oldest first). Each
    staged commit must be an append-only data commit — anything that
    removed files or added tombstones raises, because re-applying it
    against a different head could resurrect or double-delete rows."""
    from airbyte_spark.lake.table import CommitConflict

    if on_conflict not in ("fail", "cherry-pick"):
        raise ValueError(f"on_conflict must be fail|cherry-pick: {on_conflict!r}")
    results = audit_branch(table, source, base=target, **audit_kwargs)
    if any(not r.passed for r in results):
        raise AuditFailed(results)
    try:
        table.replace_branch(target, source, require_ancestor=True)
    except CommitConflict:
        if on_conflict != "cherry-pick":
            raise
        target_ancestry = set(_lineage(table, table.current_snapshot_id(target)))
        pending = [
            sid
            for sid in _lineage(table, table.current_snapshot_id(source))
            if sid not in target_ancestry
        ]
        for sid in reversed(pending):  # oldest staged commit first
            table.cherry_pick(sid, branch=target)
    if tag is not None:
        table.create_tag(tag, table.current_snapshot_id(target))
    if drop_source:
        table.drop_branch(source)
    return results
