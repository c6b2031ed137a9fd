"""Native streaming read of a lake table (sources/lakestream.py):
Spark-4 Python DataSource with snapshot-sequence offsets — Iceberg
"Streaming Reads" semantics (append/MoR commits emit, maintenance
commits skip, delete-bearing commits fail unless on_delete=skip)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.sources.lakestream import LakeStreamDataSource

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("v", IntegerType()),
    ]
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakeStreamDataSource)


def _drain(spark, root, name, **options):
    """availableNow pass over the stream into a memory sink; returns the
    collected rows."""
    reader = spark.readStream.format("lake_stream").option("path", root)
    for k, v in options.items():
        reader = reader.option(k, v)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            reader.load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(ckpt, "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).collect()


def test_appends_stream_with_commit_lineage(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([(f"a{i}", i) for i in range(5)], SCHEMA))
    t.append(spark.createDataFrame([(f"b{i}", i) for i in range(3)], SCHEMA))
    rows = _drain(spark, tmp_table_dir, "s_appends")
    assert len(rows) == 8
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["_commit_sequence"], set()).add(r["id"])
    seqs = sorted(by_seq)
    assert len(seqs) == 2 and seqs[0] < seqs[1]
    assert by_seq[seqs[0]] == {f"a{i}" for i in range(5)}
    assert by_seq[seqs[1]] == {f"b{i}" for i in range(3)}
    # lineage column points at real snapshots
    sids = {r["_commit_snapshot_id"] for r in rows}
    assert sids <= {s.snapshot_id for s in t.history()}


def test_maintenance_commits_are_invisible(spark, tmp_table_dir):
    from airbyte_spark.operators.compact import compact

    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, primary_key=["id"],
        properties={"write.target-file-size-bytes": 1 << 20},
    )
    for i in range(3):
        t.append(
            spark.createDataFrame(
                [(f"k{i}_{j}", j) for j in range(10)], SCHEMA
            )
        )
    compact(t)  # row-set invariant: must emit nothing new
    rows = _drain(spark, tmp_table_dir, "s_maint")
    assert len(rows) == 30
    assert len({r["_commit_sequence"] for r in rows}) == 3


def test_mor_merge_fails_by_default_and_skips_on_option(spark, tmp_table_dir):
    from airbyte_spark.operators.merge import merge_into

    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    merge_into(
        t,
        spark.createDataFrame([("a", 100), ("c", 3)], SCHEMA),
        cursor_col="v",
        mode="mor",
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="on_delete=skip"):
        _drain(spark, tmp_table_dir, "s_fail")
    rows = _drain(spark, tmp_table_dir, "s_skip", on_delete="skip")
    # post-images only: the merge's added file rows stream, the eq-delete
    # tombstone does not retract the stale ('a', 1)
    got = {(r["id"], r["v"]) for r in rows}
    assert got == {("a", 1), ("b", 2), ("a", 100), ("c", 3)}


def test_from_sequence_resumes_mid_chain(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([("old", 0)], SCHEMA))
    first_seq = t.snapshot().sequence
    t.append(spark.createDataFrame([("new", 1)], SCHEMA))
    rows = _drain(
        spark, tmp_table_dir, "s_resume", from_sequence=str(first_seq)
    )
    assert {r["id"] for r in rows} == {"new"}


def test_partition_values_and_evolved_schema_nullpad(spark, tmp_table_dir):
    part_schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("part", StringType()),
            StructField("v", IntegerType()),
        ]
    )
    t = LakeTable.create(
        spark, tmp_table_dir, part_schema, primary_key=["id"],
        partition_by=["part"],
    )
    t.append(
        spark.createDataFrame(
            [("a", "x", 1), ("b", "y", 2)], part_schema
        )
    )
    t.evolve_schema(
        StructType(list(part_schema.fields) + [StructField("extra", StringType())])
    )
    new_schema = t.schema()
    t.append(
        spark.createDataFrame([("c", "x", 3, "E")], new_schema)
    )
    rows = _drain(spark, tmp_table_dir, "s_parts")
    got = {(r["id"], r["part"], r["v"], r["extra"]) for r in rows}
    # hive partition columns are reconstructed; pre-evolution files
    # null-pad the new column
    assert got == {("a", "x", 1, None), ("b", "y", 2, None), ("c", "x", 3, "E")}
