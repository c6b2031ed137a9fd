"""In-place parquet import (lake/import_files.py — Iceberg `add_files` /
`migrate` analog): metadata-only registration of existing parquet files,
strict footer-schema validation, layout-derived partition values, bloom
sidecars, and the never-delete-imported-files GC contract."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.import_files import add_files, migrate_parquet_dir
from airbyte_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("cat", StringType()),
        StructField("v", IntegerType()),
    ]
)


def _src(spark, d, n=50, partition_by=None):
    df = spark.createDataFrame(
        [(i, "ab" if i % 2 else "cd", i * 10) for i in range(n)], SCHEMA
    )
    w = df.write.mode("overwrite")
    if partition_by:
        # keep the real column in the files (self-contained contract):
        # duplicate it into the layout column
        df2 = df.withColumn("_cat", F.col("cat"))
        df2.write.mode("overwrite").partitionBy("_cat").parquet(d)
        return df
    w.parquet(d)
    return df


def test_import_flat_dir_in_place(spark, tmp_table_dir):
    src = os.path.join(tmp_table_dir, "src")
    df = _src(spark, src)
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "tbl"), SCHEMA, primary_key=["id"]
    )
    snap = add_files(t, src)
    assert snap.operation == "add-files"
    assert snap.summary["imported-files"] == len(t.data_files())
    # zero data movement: every entry path IS a source file
    for e in t.data_files():
        assert e.path.startswith(os.path.abspath(src) + os.sep)
    got = {(r["id"], r["v"]) for r in t.scan().collect()}
    assert got == {(r["id"], r["v"]) for r in df.collect()}
    # footer stats landed (merge/scan pruning works on imported files)
    assert all("id" in e.stats for e in t.data_files())
    # bloom sidecars attached next to the imported files (default on)
    assert all(os.path.exists(e.path + ".bloom") for e in t.data_files())


def test_reimport_and_engine_dir_rejected(spark, tmp_table_dir):
    src = os.path.join(tmp_table_dir, "src")
    _src(spark, src)
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "tbl"), SCHEMA, primary_key=["id"]
    )
    add_files(t, src)
    with pytest.raises(ValueError, match="already live"):
        add_files(t, src)
    # the engine's own files can't be re-registered
    own = t.data_files()[0].path  # imported, lives in src — pick a managed one
    t.append(spark.createDataFrame([(1000, "x", 1)], SCHEMA))
    managed = [e.path for e in t.data_files() if e.path.startswith(t.data_dir)]
    with pytest.raises(ValueError, match="data dir"):
        add_files(t, managed)
    assert own  # silence lint


def test_schema_mismatch_rejected(spark, tmp_table_dir):
    src = os.path.join(tmp_table_dir, "src")
    # id written as INT, registered as LONG — the JVM reader would fail
    # (or mis-prune) on the physical mismatch, so import must refuse
    spark.createDataFrame([(1, "a", 1)], "id int, cat string, v int").write.parquet(src)
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "tbl"), SCHEMA, primary_key=["id"]
    )
    with pytest.raises(ValueError, match="incompatible"):
        add_files(t, src)


def test_missing_columns_rules(spark, tmp_table_dir):
    src = os.path.join(tmp_table_dir, "src")
    spark.createDataFrame([(1, "a")], "id long, cat string").write.parquet(src)
    # missing nullable non-pk column v -> allowed, scan null-pads
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "t1"), SCHEMA, primary_key=["id"]
    )
    add_files(t, src)
    row = t.scan().first()
    assert row["id"] == 1 and row["v"] is None
    # missing PK column -> rejected
    src2 = os.path.join(tmp_table_dir, "src2")
    spark.createDataFrame([("a", 1)], "cat string, v int").write.parquet(src2)
    t2 = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "t2"), SCHEMA, primary_key=["id"]
    )
    with pytest.raises(ValueError, match="primary-key"):
        add_files(t2, src2)


def test_hive_layout_partition_values(spark, tmp_table_dir):
    """Identity partition values parse from foreign col=value dirs when
    the files also carry the column; pruning then works."""
    src = os.path.join(tmp_table_dir, "src")
    df = spark.createDataFrame(
        [(i, "ab" if i % 2 else "cd", i) for i in range(20)], SCHEMA
    )
    # files keep the real 'cat' column AND sit under cat=<v> dirs: write
    # per partition value so partitionBy doesn't strip the column
    for v in ("ab", "cd"):
        df.filter(F.col("cat") == v).write.parquet(os.path.join(src, f"cat={v}"))
    t = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "tbl"),
        SCHEMA,
        primary_key=["id"],
        partition_by=["cat"],
    )
    add_files(t, src)
    parts = {e.partition.get("cat") for e in t.data_files()}
    assert parts == {"ab", "cd"}
    got = t.scan(partition_filter={"cat": "ab"})
    assert {r["cat"] for r in got.collect()} == {"ab"}
    opened = {os.path.normpath(p.replace("file:", "")) for p in got.inputFiles()}
    assert all("cat=ab" in p for p in opened)


def test_imported_files_survive_rewrite_and_gc(spark, tmp_table_dir):
    """A rewrite strands imported files from the table's metadata, but
    orphan GC must never delete them — they are the user's files."""
    from airbyte_spark.operators.compact import compact

    src = os.path.join(tmp_table_dir, "src")
    _src(spark, src, n=40)
    t = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "tbl"),
        SCHEMA,
        primary_key=["id"],
        properties={"write.target-file-size-bytes": 1 << 20},
    )
    add_files(t, src)
    imported = sorted(e.path for e in t.data_files())
    res = compact(t, target_file_bytes=1 << 20)
    assert res.files_before == len(imported) and res.rewritten_bytes > 0
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(grace_period_ms=0)
    # stranded source files still on disk, bit-for-bit
    assert all(os.path.exists(p) for p in imported)
    # and the table state is intact
    assert t.scan().count() == 40
    # engine-managed files now carry the data
    assert all(e.path.startswith(t.data_dir) for e in t.data_files())


def test_merge_into_imported_table(spark, tmp_table_dir):
    """MERGE works directly over imported files (stats + blooms feed
    candidate selection exactly like engine-written files)."""
    from airbyte_spark.operators.merge import merge_into

    sch = StructType(
        [
            StructField("id", LongType(), False),
            StructField("updated_at", LongType()),
            StructField("v", IntegerType()),
        ]
    )
    src = os.path.join(tmp_table_dir, "src")
    spark.createDataFrame([(i, 1, i) for i in range(30)], sch).repartition(
        3
    ).write.parquet(src)
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "tbl"), sch, primary_key=["id"]
    )
    add_files(t, src)
    merge_into(
        t,
        spark.createDataFrame([(7, 2, 700), (99, 2, 990)], sch),
        cursor_col="updated_at",
        cdc_col=None,
        mode="cow",
    )
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert got[7] == 700 and got[99] == 990 and len(got) == 31


def test_migrate_parquet_dir(spark, tmp_table_dir):
    src = os.path.join(tmp_table_dir, "src")
    _src(spark, src, n=25)
    t = migrate_parquet_dir(
        spark, src, os.path.join(tmp_table_dir, "tbl"), primary_key=["id"]
    )
    assert t.scan().count() == 25
    assert t.snapshot().operation == "add-files"


def test_snapshot_table_zero_copy_clone(spark, tmp_table_dir):
    """Iceberg `snapshot` procedure: a new independent table referencing
    the source's live files in place, then evolving on its own."""
    from airbyte_spark.lake.import_files import snapshot_table
    from airbyte_spark.operators.posdeletes import delete_where

    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"), SCHEMA, primary_key=["id"]
    )
    src.append(
        spark.createDataFrame(
            [(i, "ab" if i % 2 else "cd", i) for i in range(30)], SCHEMA
        )
    )
    delete_where(src, "id = 7")  # live position delete clones by path
    t = snapshot_table(src, os.path.join(tmp_table_dir, "clone"))
    assert t.snapshot().operation == "snapshot-table"
    # zero copy: every cloned data entry is a source-owned path
    assert all(
        e.path.startswith(os.path.abspath(src.root)) for e in t.data_files()
    )
    want = {(r["id"], r["v"]) for r in src.scan().collect()}
    assert {(r["id"], r["v"]) for r in t.scan().collect()} == want
    assert t.scan().filter("id = 7").count() == 0  # pos delete applied
    # the clone evolves independently: a write lands in ITS data_dir and
    # the source is untouched
    t.append(spark.createDataFrame([(100, "x", 1)], SCHEMA))
    assert t.scan().count() == 30 and src.scan().count() == 29
    # clone GC never touches source files
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(grace_period_ms=0)
    assert src.scan().count() == 29


def test_snapshot_table_refuses_live_equality_deletes(spark, tmp_table_dir):
    from airbyte_spark.lake.import_files import snapshot_table
    from airbyte_spark.operators.merge import merge_into

    sch = StructType(
        [
            StructField("id", LongType(), False),
            StructField("updated_at", LongType()),
            StructField("v", IntegerType()),
        ]
    )
    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"), sch, primary_key=["id"]
    )
    src.append(spark.createDataFrame([(i, 1, i) for i in range(10)], sch))
    merge_into(
        src, spark.createDataFrame([(3, 2, 300)], sch),
        cursor_col="updated_at", cdc_col=None, mode="mor",
    )
    with pytest.raises(ValueError, match="equality-delete"):
        snapshot_table(src, os.path.join(tmp_table_dir, "clone"))


def test_snapshot_table_inherits_registries(spark, tmp_table_dir):
    """Mixed-schema-era files and clustered stamps stay readable/clean in
    the clone (schema + sort-order registries copied)."""
    from airbyte_spark.lake.import_files import snapshot_table
    from airbyte_spark.operators.cluster import cluster

    src = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "src"), SCHEMA, primary_key=["id"]
    )
    src.append(
        spark.createDataFrame([(i, "a", i) for i in range(20)], SCHEMA)
    )
    cluster(src, dims=["id", "v"], curve="zorder", target_file_bytes=1 << 20)
    src.evolve_schema(
        StructType(SCHEMA.fields + [StructField("extra", IntegerType())])
    )
    src.append(
        spark.createDataFrame(
            [(100 + i, "b", i, i) for i in range(5)], src.schema()
        )
    )
    t = snapshot_table(src, os.path.join(tmp_table_dir, "clone"))
    assert t.scan().count() == 25
    # pre-evolution files read null-padded through the copied registry
    assert t.scan().filter("extra IS NULL").count() == 20
    # registries carried over verbatim: mixed schema ids resolve and the
    # clustered files' sort stamps name a registered order (ids NOT reset
    # to an empty registry where every stamp would read as dirty)
    assert t.sort_orders() == src.sort_orders()
    stamps = {e.sort_order_id for e in t.data_files() if e.sort_order_id}
    assert stamps and stamps <= set(t.sort_orders())
    schema_ids = {e.schema_id for e in t.data_files()}
    assert len(schema_ids) == 2
    for sid in schema_ids:
        assert t.registered_schema(sid) is not None
    # a dirty pass over the clone still works end-to-end (may legally
    # repack undersized files; state stays identical)
    before = {(r["id"], r["v"]) for r in t.scan().collect()}
    cluster(
        t, dims=["id", "v"], curve="zorder", scope="dirty",
        target_file_bytes=1 << 20,
    )
    assert {(r["id"], r["v"]) for r in t.scan().collect()} == before
