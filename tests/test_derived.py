"""Registered derived tables (operators/derived.py): rollups and
near-dup indexes advance as a run_maintenance stage from the published
state, before expire/GC; errors isolate per artifact."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.derived import (
    DERIVED_PROP,
    deregister_derived_table,
    register_derived_table,
    registered_derived_tables,
    update_derived_tables,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("cat", StringType()),
        StructField("text", StringType()),
        StructField("val", DoubleType()),
        StructField("updated_at", TimestampType()),
    ]
)
TS = datetime.datetime(2026, 1, 1)


def _text(i, grp=None):
    import random

    g = (i % 3) if grp is None else grp
    rng = random.Random(g)
    return " ".join(f"w{rng.randrange(2000)}" for _ in range(30))


def _rows(ids, grp=None, day=0):
    return [
        (
            i,
            f"c{i % 2}",
            _text(i, grp),
            float(i),
            TS + datetime.timedelta(days=day),
        )
        for i in ids
    ]


@pytest.fixture()
def source(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir + "/src", SCHEMA, primary_key=["doc_id"]
    )
    t.append(spark.createDataFrame(_rows(range(8)), SCHEMA))
    return t


def test_registry_roundtrip(source, tmp_table_dir):
    with pytest.raises(ValueError, match="kind must be one of"):
        register_derived_table(source, "view", tmp_table_dir + "/v")
    register_derived_table(source, "rollup", tmp_table_dir + "/ru")
    # idempotent by root
    register_derived_table(source, "rollup", tmp_table_dir + "/ru")
    entries = register_derived_table(
        source, "near-dup-index", tmp_table_dir + "/idx"
    )
    assert [e["root"] for e in entries] == [
        tmp_table_dir + "/ru",
        tmp_table_dir + "/idx",
    ]
    assert registered_derived_tables(source) == entries
    left = deregister_derived_table(source, tmp_table_dir + "/ru")
    assert [e["kind"] for e in left] == ["near-dup-index"]
    deregister_derived_table(source, tmp_table_dir + "/idx")
    assert source.properties.get(DERIVED_PROP) is None


def test_maintenance_advances_registered_artifacts(
    spark, source, tmp_table_dir
):
    from airbyte_spark.operators.dedup_index import create_near_dup_index
    from airbyte_spark.operators.maintenance import run_maintenance
    from airbyte_spark.operators.rollup import create_rollup

    ru = create_rollup(
        source, tmp_table_dir + "/ru", ["cat"], [("count", "*"), ("sum", "val")]
    )
    idx = create_near_dup_index(
        source, tmp_table_dir + "/idx", "text", "doc_id",
        hasher="simhash-md5", max_hamming=8,
    )
    register_derived_table(source, "rollup", ru.root)
    register_derived_table(source, "near-dup-index", idx.root)

    batch = spark.createDataFrame(
        _rows([6, 7], grp=0, day=1) + _rows([20, 21], grp=5, day=1), SCHEMA
    )
    rep = run_maintenance(
        source, "derived-job-1", merge_source=batch, merge_mode="mor",
        cluster_dims=["doc_id"],
    )
    arts = rep.stages["update-derived"]["artifacts"]
    assert [a["kind"] for a in arts] == ["rollup", "near-dup-index"]
    assert all("error" not in a for a in arts)
    assert arts[0]["mode"] == "initial" and arts[1]["mode"] == "initial"

    # rollup state == direct GROUP BY of the published table
    want = {
        (r["cat"], r["count_star"], r["sum_val"])
        for r in source.scan()
        .groupBy("cat")
        .agg(
            F.count(F.lit(1)).alias("count_star"),
            F.sum("val").alias("sum_val"),
        )
        .collect()
    }
    got = {
        (r["cat"], r["count_star"], r["sum_val"])
        for r in ru.scan().select("cat", "count_star", "sum_val").collect()
    }
    assert got == want
    # index covers exactly the live ids
    ids = {r["doc_id"] for r in idx.scan().select("doc_id").distinct().collect()}
    assert ids == set(range(8)) | {20, 21}

    # second cycle with no data change: both artifacts noop
    rep2 = run_maintenance(
        source, "derived-job-2", merge_source=None, cluster_dims=["doc_id"]
    )
    arts2 = rep2.stages["update-derived"]["artifacts"]
    assert [a["mode"] for a in arts2] == ["noop", "noop"]


def test_artifact_errors_isolate(spark, source, tmp_table_dir):
    from airbyte_spark.operators.rollup import create_rollup

    ru = create_rollup(
        source, tmp_table_dir + "/ru", ["cat"], [("count", "*")]
    )
    register_derived_table(source, "near-dup-index", tmp_table_dir + "/gone")
    register_derived_table(source, "rollup", ru.root)
    reports = update_derived_tables(source)
    assert "error" in reports[0] and reports[0]["kind"] == "near-dup-index"
    assert reports[1]["mode"] == "initial"
    assert ru.scan().count() == 2


def test_partitioned_maintenance_advances_artifacts(spark, tmp_table_dir):
    from airbyte_spark.operators.maintenance import run_partitioned_maintenance
    from airbyte_spark.operators.rollup import create_rollup

    t = LakeTable.create(
        spark, tmp_table_dir + "/psrc", SCHEMA,
        primary_key=["doc_id"], partition_by=["cat"],
    )
    t.append(spark.createDataFrame(_rows(range(8)), SCHEMA))
    ru = create_rollup(
        t, tmp_table_dir + "/pru", ["cat"], [("count", "*"), ("sum", "val")]
    )
    register_derived_table(t, "rollup", ru.root)
    rep = run_partitioned_maintenance(
        t, "pderived-1", cluster_dims=["doc_id"]
    )
    arts = rep.stages["update-derived"]["artifacts"]
    assert arts[0]["mode"] == "initial" and "error" not in arts[0]
    assert {
        (r["cat"], r["count_star"]) for r in ru.scan().collect()
    } == {("c0", 4), ("c1", 4)}


def test_streaming_ingest_keeps_index_fresh(spark, tmp_table_dir):
    """Composition pin: continuous ingest through the lake_stream SINK,
    index advanced from the changelog the sink commits produced."""
    import os
    import shutil
    import tempfile

    from airbyte_spark.operators.dedup_index import (
        create_near_dup_index,
        update_near_dup_index,
    )
    from airbyte_spark.sources.lakestream import LakeStreamDataSource

    spark.dataSource.register(LakeStreamDataSource)
    t = LakeTable.create(
        spark, tmp_table_dir + "/src", SCHEMA, primary_key=["doc_id"]
    )
    idx = create_near_dup_index(
        t, tmp_table_dir + "/idx", "text", "doc_id",
        hasher="simhash-md5", max_hamming=8,
    )
    src = tempfile.mkdtemp(prefix="idxsinksrc-")
    ckpt = tempfile.mkdtemp(prefix="idxsinkckpt-")

    def pump(path, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(path)
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(f"{src}/*")
            .writeStream.format("lake_stream")
            .option("path", t.root)
            .option("stream_id", "idxq")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        pump(os.path.join(src, "f1"), _rows(range(6)))
        r1 = update_near_dup_index(t, idx)
        assert r1.mode == "initial" and r1.images_upserted == 6
        # second micro-batch: two docs joining group 0
        pump(os.path.join(src, "f2"), _rows([100, 101], grp=0))
        r2 = update_near_dup_index(t, idx)
        assert r2.mode == "incremental" and r2.images_upserted == 2
        got = {(p["id_a"], p["id_b"]) for p in r2.pairs.collect()}
        assert got == {(0, 100), (3, 100), (0, 101), (3, 101), (100, 101)}
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_ann_index_kind_dispatches(spark, tmp_table_dir):
    import numpy as np

    from airbyte_spark.operators.ann_index import create_ann_index
    from pyspark.sql.types import ArrayType, FloatType

    vs = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), False),
            StructField("updated_at", TimestampType()),
        ]
    )
    t = LakeTable.create(
        spark, tmp_table_dir + "/vsrc", vs, primary_key=["vec_id"]
    )

    def vec(i):
        rng = np.random.default_rng(i)
        return [float(x) for x in rng.standard_normal(8)]

    t.append(
        spark.createDataFrame([(i, vec(i), TS) for i in range(6)], vs)
    )
    idx = create_ann_index(t, tmp_table_dir + "/vidx", "embedding", "vec_id", dim=8)
    register_derived_table(t, "ann-index", idx.root)
    reports = update_derived_tables(t)
    assert reports[0] == {
        "kind": "ann-index",
        "root": idx.root,
        "mode": "initial",
        "upserted": 6,
        "removed": 0,
    }
    assert update_derived_tables(t)[0]["mode"] == "noop"
