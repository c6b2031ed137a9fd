"""Write-audit-publish (operators/wap.py): audits gate the fast-forward
swap the reference performs at stream teardown
(S3DataLakeStreamLoader.kt:96-133), with the acceptance-suite invariants
(null/dup identifiers, read-after-write) checked BEFORE main moves."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import CommitConflict, LakeTable
from airbyte_spark.operators.wap import (
    AuditFailed,
    audit_branch,
    publish_branch,
)

SCHEMA = StructType(
    [
        StructField("id", StringType(), True),  # nullable: the audit,
        # not the writer, is what rejects NULL identifiers here
        StructField("v", IntegerType()),
    ]
)


def _staged(spark, root, seed_rows, staged_rows, pk=("id",)):
    t = LakeTable.create(spark, root, SCHEMA, primary_key=list(pk))
    t.append(spark.createDataFrame(seed_rows, SCHEMA))
    t.create_branch("staging")
    t.append(spark.createDataFrame(staged_rows, SCHEMA), branch="staging")
    return t


def test_publish_moves_main_only_after_audit(spark, tmp_table_dir):
    t = _staged(
        spark, tmp_table_dir,
        [(f"k{i}", i) for i in range(10)],
        [(f"n{i}", 100 + i) for i in range(5)],
    )
    before = t.current_snapshot_id("main")
    results = publish_branch(t, "staging", tag="published-1")
    assert all(r.passed for r in results)
    assert t.current_snapshot_id("main") != before
    assert t.scan().count() == 15  # read-after-write on main
    # published snapshot is tagged for time travel
    assert t.tags["published-1"] == t.current_snapshot_id("main")


def test_failed_audit_leaves_main_untouched(spark, tmp_table_dir):
    t = _staged(
        spark, tmp_table_dir,
        [(f"k{i}", i) for i in range(10)],
        [(None, 999)],  # NULL PK lands on staging
    )
    before = t.current_snapshot_id("main")
    with pytest.raises(AuditFailed) as ei:
        publish_branch(t, "staging")
    failed = {r.name for r in ei.value.results if not r.passed}
    assert failed == {"no_null_pk"}
    assert t.current_snapshot_id("main") == before
    assert t.scan().count() == 10


def test_dup_pk_audit(spark, tmp_table_dir):
    t = _staged(
        spark, tmp_table_dir,
        [("a", 1)],
        [("a", 2)],  # append (not merge): duplicates the PK on staging
    )
    res = {r.name: r for r in audit_branch(t, "staging")}
    assert not res["no_dup_pk"].passed
    assert res["no_dup_pk"].observed == 1
    assert res["no_null_pk"].passed


def test_expectations_null_predicate_counts_as_violation(spark, tmp_table_dir):
    t = _staged(
        spark, tmp_table_dir,
        [("a", 1)],
        [("b", None), ("c", 5), ("d", -2)],
    )
    res = {
        r.name: r
        for r in audit_branch(
            t, "staging",
            require_no_dup_pk=False,
            expectations={"v_positive": "v > 0"},
        )
    }
    # NULL v and -2 both violate
    assert not res["v_positive"].passed
    assert res["v_positive"].observed == 2


def test_row_delta_bound(spark, tmp_table_dir):
    t = _staged(
        spark, tmp_table_dir,
        [(f"k{i}", i) for i in range(100)],
        [(f"n{i}", i) for i in range(60)],
    )
    res = {
        r.name: r
        for r in audit_branch(
            t, "staging", max_row_delta_fraction=0.5
        )
    }
    assert not res["row_delta_within_bound"].passed  # +60%
    res2 = {
        r.name: r
        for r in audit_branch(
            t, "staging", max_row_delta_fraction=0.7
        )
    }
    assert res2["row_delta_within_bound"].passed


def test_publish_refuses_when_target_diverged(spark, tmp_table_dir):
    """A commit on main after staging branched must raise CommitConflict
    (fast-forward-only), not silently vanish."""
    t = _staged(
        spark, tmp_table_dir,
        [("a", 1)],
        [("b", 2)],
    )
    t.append(spark.createDataFrame([("z", 99)], SCHEMA))  # main moves
    with pytest.raises(CommitConflict):
        publish_branch(t, "staging")
    # the diverging commit survived
    assert {r["id"] for r in t.scan().collect()} == {"a", "z"}


def test_delete_debt_audit(spark, tmp_table_dir):
    from airbyte_spark.operators.merge import merge_into

    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([(f"k{i}", i) for i in range(20)], SCHEMA))
    t.create_branch("staging")
    merge_into(
        t,
        spark.createDataFrame([("k1", 101), ("k2", 102)], SCHEMA),
        cursor_col="v",
        branch="staging",
        mode="mor",
    )
    res = {
        r.name: r
        for r in audit_branch(t, "staging", max_delete_file_debt=0)
    }
    assert not res["delete_file_debt_within_bound"].passed
    assert res["delete_file_debt_within_bound"].observed >= 1
    # MoR scan still deduped, so PK audits pass
    assert res["no_dup_pk"].passed
    res2 = {
        r.name: r
        for r in audit_branch(t, "staging", max_delete_file_debt=5)
    }
    assert res2["delete_file_debt_within_bound"].passed


def test_drop_source_after_publish(spark, tmp_table_dir):
    t = _staged(spark, tmp_table_dir, [("a", 1)], [("b", 2)])
    publish_branch(t, "staging", drop_source=True)
    assert "staging" not in t.branches()
    assert t.scan().count() == 2


def test_cherry_pick_reapplies_append_on_diverged_main(spark, tmp_table_dir):
    """Iceberg cherrypick_snapshot: an append-only staged snapshot lands
    on a main that moved concurrently — neither side's rows lost."""
    t = _staged(
        spark, tmp_table_dir,
        [("a", 1)],
        [("b", 2), ("c", 3)],
    )
    staged_head = t.current_snapshot_id("staging")
    t.append(spark.createDataFrame([("z", 99)], SCHEMA))  # main diverges
    snap = t.cherry_pick(staged_head, branch="main")
    assert snap.operation == "cherry-pick"
    assert snap.summary["source-snapshot"] == staged_head
    assert {r["id"] for r in t.scan().collect()} == {"a", "b", "c", "z"}
    # double-application refused
    with pytest.raises(ValueError, match="already"):
        t.cherry_pick(staged_head, branch="main")


def test_cherry_pick_refuses_non_append_snapshots(spark, tmp_table_dir):
    """A snapshot that removed files (CoW merge) or added tombstones
    (MoR merge) depends on its parent's file set — cherry-pick refuses."""
    from airbyte_spark.operators.merge import merge_into

    sch = StructType(
        [
            StructField("id", StringType(), False),
            StructField("updated_at", IntegerType()),
            StructField("v", IntegerType()),
        ]
    )
    t = LakeTable.create(spark, tmp_table_dir, sch, primary_key=["id"])
    t.append(spark.createDataFrame([("a", 1, 1), ("b", 1, 2)], sch))
    t.create_branch("staging")
    merge_into(
        t, spark.createDataFrame([("a", 2, 10)], sch),
        cursor_col="updated_at", cdc_col=None, mode="cow", branch="staging",
    )
    cow_head = t.current_snapshot_id("staging")
    with pytest.raises(ValueError, match="removed"):
        t.cherry_pick(cow_head, branch="main")
    merge_into(
        t, spark.createDataFrame([("b", 2, 20)], sch),
        cursor_col="updated_at", cdc_col=None, mode="mor", branch="staging",
    )
    mor_head = t.current_snapshot_id("staging")
    with pytest.raises(ValueError, match="delete/tombstone"):
        t.cherry_pick(mor_head, branch="main")


def test_publish_cherry_picks_on_conflict(spark, tmp_table_dir):
    """publish_branch(on_conflict='cherry-pick') rebases multiple staged
    append commits (oldest first) onto the moved main after audits."""
    t = _staged(
        spark, tmp_table_dir,
        [("a", 1)],
        [("b", 2)],
    )
    t.append(spark.createDataFrame([("c", 3)], SCHEMA), branch="staging")
    t.append(spark.createDataFrame([("z", 99)], SCHEMA))  # main diverges
    results = publish_branch(
        t, "staging", on_conflict="cherry-pick", tag="rebased",
        drop_source=True,
    )
    assert all(r.passed for r in results)
    assert {r["id"] for r in t.scan().collect()} == {"a", "b", "c", "z"}
    assert t.tags["rebased"] == t.current_snapshot_id("main")
    assert "staging" not in t.branches()


def test_declarative_rules_gate_publish(spark, tmp_table_dir):
    """The full expectations grammar (operators/expectations.py) plugs
    into the audit: a staged batch with an out-of-range value is
    refused; re-staging clean rows publishes, with one AuditResult per
    rule."""
    t = _staged(
        spark, tmp_table_dir,
        [(f"k{i}", i) for i in range(4)],
        [("bad", -7), ("ok", 5)],
    )
    rules = [
        {"rule": "range", "column": "v", "min": 0},
        {"rule": "not_null", "column": "id"},
        {"rule": "regex", "column": "id", "pattern": "^[a-z0-9]+$"},
    ]
    before = t.current_snapshot_id("main")
    with pytest.raises(AuditFailed, match="range:v=1"):
        publish_branch(t, "staging", rules=rules)
    assert t.current_snapshot_id("main") == before

    results = audit_branch(t, "staging", rules=rules)
    by = {r.name: r for r in results}
    assert by["range:v"].passed is False and by["range:v"].observed == 1
    assert by["not_null:id"].passed and by["regex:id"].passed

    # fix the branch: replace it at main and stage clean rows
    t.drop_branch("staging")
    t.create_branch("staging")
    t.append(spark.createDataFrame([("ok2", 7)], SCHEMA), branch="staging")
    results = publish_branch(t, "staging", rules=rules)
    assert all(r.passed for r in results)
    assert t.scan().count() == 5
