"""Connection-level schema-change propagation policy
(streaming/schema_policy.py — reference:
docs/platform/using-airbyte/schema-change-management.md:33-49)."""

import os

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.streaming.connection import StreamSpec
from airbyte_spark.streaming.schema_policy import (
    ConnectionPausedError,
    apply_schema_policy,
    detect_catalog_changes,
)

BASE = StructType(
    [
        StructField("id", LongType(), False),
        StructField("updated_at", LongType(), True),
        StructField("name", StringType(), True),
        StructField("score", IntegerType(), True),
    ]
)

#: source drops `name`, widens `score`, adds `email` — and stops
#: reporting the cursor (protected: must survive)
DRIFTED = StructType(
    [
        StructField("id", LongType(), False),
        StructField("score", LongType(), True),
        StructField("email", StringType(), True),
    ]
)


def _spec(spark, root, name="users", schema=BASE):
    t = LakeTable.create(
        spark, os.path.join(root, name), schema, primary_key=["id"]
    )
    return StreamSpec(name=name, table=t, cursor_col="updated_at")


def test_detect_reports_all_change_kinds(spark, tmp_table_dir):
    spec = _spec(spark, tmp_table_dir)
    changes = detect_catalog_changes(
        [spec], {"users": DRIFTED, "orders": BASE}
    )
    assert changes.new_streams == ["orders"]
    assert changes.removed_streams == []
    rep = changes.column_changes["users"]
    assert rep["added"] == ["email"]
    assert set(rep["removed"]) == {"name", "updated_at"}
    assert rep["widened"] == ["score int->bigint"]


def test_ignore_detects_but_touches_nothing(spark, tmp_table_dir):
    spec = _spec(spark, tmp_table_dir)
    report = apply_schema_policy([spec], {"users": DRIFTED}, "ignore")
    assert report.changes.any_change
    assert report.applied == {}
    assert spec.table.schema() == BASE  # untouched
    assert [s.name for s in report.selected] == ["users"]
    assert report.backfill_streams == []  # nothing propagated, no backfill


def test_disable_pauses_on_any_change(spark, tmp_table_dir):
    spec = _spec(spark, tmp_table_dir)
    with pytest.raises(ConnectionPausedError):
        apply_schema_policy([spec], {"users": DRIFTED}, "disable")
    # no drift -> runs clean
    report = apply_schema_policy([spec], {"users": BASE}, "disable")
    assert not report.changes.any_change


def test_propagate_columns_lands_adds_widens_drops(spark, tmp_table_dir):
    spec = _spec(spark, tmp_table_dir)
    report = apply_schema_policy(
        [spec], {"users": DRIFTED, "orders": BASE}, "propagate_columns"
    )
    got = spec.table.schema()
    names = got.fieldNames()
    assert "email" in names  # added
    assert "name" not in names  # dropped (non-protected)
    # protected columns survive the source dropping them
    assert "id" in names and "updated_at" in names
    assert got["score"].dataType == LongType()  # widened
    # stream changes are ignored under propagate_columns
    assert report.pending_new == ["orders"]
    assert [s.name for s in report.selected] == ["users"]
    assert "kept updated_at (protected)" in report.applied["users"]
    # a propagated column add flags the stream for backfill
    # (schema-change-management.md:83-88)
    assert report.backfill_streams == ["users"]


def test_propagate_fully_creates_and_deselects_streams(
    spark, tmp_table_dir
):
    spec = _spec(spark, tmp_table_dir)
    gone = _spec(spark, tmp_table_dir, name="legacy")
    created = {}

    def factory(name, schema):
        t = LakeTable.create(
            spark, os.path.join(tmp_table_dir, name), schema,
            primary_key=[schema.fieldNames()[0]],
        )
        created[name] = t
        return StreamSpec(name=name, table=t, cursor_col=None)

    report = apply_schema_policy(
        [spec, gone],
        {"users": BASE, "orders": DRIFTED},
        "propagate_fully",
        create_stream=factory,
    )
    assert sorted(s.name for s in report.selected) == ["orders", "users"]
    assert "orders" in created
    assert created["orders"].schema().fieldNames() == DRIFTED.fieldNames()
    # the removed stream's destination table is KEPT (never dropped)
    assert gone.table.schema() == BASE
    assert report.applied["orders"] == ["stream created"]


def test_propagate_fully_without_factory_reports_pending(
    spark, tmp_table_dir
):
    spec = _spec(spark, tmp_table_dir)
    report = apply_schema_policy(
        [spec], {"users": BASE, "orders": BASE}, "propagate_fully"
    )
    assert report.pending_new == ["orders"]
    assert [s.name for s in report.selected] == ["users"]


def test_narrowing_is_reported_not_applied(spark, tmp_table_dir):
    """A source narrowing long->int keeps the table's wider type (the
    supertype keeps the table side) and reports nothing to widen."""
    wide = StructType(
        [
            StructField("id", LongType(), False),
            StructField("score", DoubleType(), True),
        ]
    )
    spec = StreamSpec(
        name="users",
        table=LakeTable.create(
            spark, os.path.join(tmp_table_dir, "w"), wide,
            primary_key=["id"],
        ),
        cursor_col=None,
    )
    narrow = StructType(
        [
            StructField("id", LongType(), False),
            StructField("score", IntegerType(), True),
        ]
    )
    report = apply_schema_policy(
        [spec], {"users": narrow}, "propagate_columns"
    )
    assert spec.table.schema() == wide
    assert report.applied == {}
