"""Metadata tables (`$partitions` / `$manifests` / `$refs` analogs):
the SQL-queryable inspection surface over table metadata, computed on
executors so the driver never materializes an O(table) entry list."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("part", StringType()),
        StructField("v", IntegerType()),
    ]
)


@pytest.fixture()
def table(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, primary_key=["id"],
        partition_by=["part"],
    )
    rows = [(f"k{i}", "ab"[i % 2], i) for i in range(40)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    t.append(
        spark.createDataFrame(
            [(f"m{i}", "a", 100 + i) for i in range(10)], SCHEMA
        )
    )
    return t


def test_partitions_df_matches_entry_groundtruth(spark, table):
    got = {
        (r["partition"], r["content"]): (
            r["file_count"], r["row_count"], r["total_bytes"]
        )
        for r in table.partitions_df().collect()
    }
    from collections import defaultdict

    from airbyte_spark.lake.table import canonical_partition_key

    exp = defaultdict(lambda: [0, 0, 0])
    for e in table.all_files():
        k = (canonical_partition_key(e.partition), e.content)
        exp[k][0] += 1
        exp[k][1] += e.rows or 0
        exp[k][2] += e.bytes or 0
    assert got == {k: tuple(v) for k, v in exp.items()}
    # both partitions present, rows add up to the table
    assert sum(v[1] for k, v in got.items() if k[1] == "data") == 50


def test_partitions_df_sees_delete_content(spark, table):
    from airbyte_spark.operators.merge import merge_into

    merge_into(
        table,
        spark.createDataFrame([("k0", "a", 999), ("k2", "a", 998)], SCHEMA),
        cursor_col="v",
        mode="mor",
    )
    kinds = {
        r["content"]
        for r in table.partitions_df().collect()
    }
    assert "equality-deletes" in kinds


def test_manifests_df_matches_snapshot(spark, table):
    snap = table.snapshot()
    rows = table.manifests_df().collect()
    assert {r["manifest"] for r in rows} == set(snap.manifests)
    by_entry_sum = sum(r["entries"] for r in rows)
    assert by_entry_sum == len(table.all_files())
    assert sum(r["data_entries"] for r in rows) == len(table.data_files())
    assert all(r["length_bytes"] > 0 for r in rows)


def test_refs_df_lists_branches_and_tags(spark, table):
    table.create_branch("staging")
    table.create_tag("v1")
    rows = {(r["name"], r["type"]): r["snapshot_id"] for r in table.refs_df().collect()}
    assert rows[("main", "branch")] == table.current_snapshot_id("main")
    assert rows[("staging", "branch")] == table.current_snapshot_id("main")
    assert rows[("v1", "tag")] == table.current_snapshot_id("main")


def test_partitions_df_is_distributed(spark, table):
    """Plan shape: the aggregation consumes the executor-side
    mapInPandas manifest parse (no driver-collected local relation)."""
    plan = (
        table.partitions_df()._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
