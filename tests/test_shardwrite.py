"""Shuffle-and-shard export (operators/shardwrite.py): deterministic
seeded permutation, exact fixed-size shards via distributed prefix sum,
one-file-per-shard write in permutation order."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.shardwrite import shard_assignments, write_shards


def _py_reference(ids, seed, rows_per_shard):
    keyed = sorted(
        (hashlib.md5(f"{i}{seed}".encode()).hexdigest(), i) for i in ids
    )
    return {
        i: (rank // rows_per_shard, rank % rows_per_shard)
        for rank, (_k, i) in enumerate(keyed)
    }


def test_assignments_match_python_reference(spark):
    ids = list(range(137))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard_id"], r["shard_pos"])
        for r in shard_assignments(df, "doc_id", "s1", 16, num_ranges=8).collect()
    }
    assert got == _py_reference(ids, "s1", 16)


def test_assignments_independent_of_range_count(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = shard_assignments(df, "doc_id", "x", 32, num_ranges=1).collect()
    b = shard_assignments(df, "doc_id", "x", 32, num_ranges=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_shards_are_exactly_full_except_last(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    sizes = (
        shard_assignments(df, "doc_id", "z", 30)
        .groupBy("shard_id")
        .count()
        .orderBy("shard_id")
        .collect()
    )
    assert [(r["shard_id"], r["count"]) for r in sizes] == [
        (0, 30),
        (1, 30),
        (2, 30),
        (3, 10),
    ]


def test_seed_changes_the_permutation(spark):
    df = spark.range(64).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shard_pos"] for r in shard_assignments(df, "doc_id", "a", 8).collect()}
    b = {r["doc_id"]: r["shard_pos"] for r in shard_assignments(df, "doc_id", "b", 8).collect()}
    assert a != b


def test_rows_per_shard_must_be_positive(spark):
    df = spark.range(4).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="rows_per_shard"):
        shard_assignments(df, "doc_id", "s", 0)


def test_write_shards_one_file_per_shard_in_order(spark, tmp_table_dir):
    out = os.path.join(tmp_table_dir, "shards")
    df = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(90)], "doc_id long, text string"
    )
    stats = write_shards(df, out, "doc_id", "w1", 25, num_ranges=4)
    assert stats == {"shards": 4, "rows": 90}
    # one data file per shard directory
    for d in sorted(os.listdir(out)):
        if not d.startswith("shard_id="):
            continue
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    # rows inside each shard file are in permutation order with payload intact
    back = spark.read.parquet(out)
    ref = _py_reference(range(90), "w1", 25)
    for r in back.collect():
        sid, pos = ref[r["doc_id"]]
        assert (r["shard_id"], r["shard_pos"]) == (sid, pos)
        assert r["text"] == f"text-{r['doc_id']}"
    one = spark.read.parquet(os.path.join(out, "shard_id=0"))
    poses = [r["shard_pos"] for r in one.collect()]
    assert poses == sorted(poses)


def test_write_shards_is_deterministic_across_runs(spark, tmp_table_dir):
    df = spark.range(60).withColumnRenamed("id", "doc_id")
    o1, o2 = (os.path.join(tmp_table_dir, d) for d in ("a", "b"))
    write_shards(df.withColumn("p", F.col("doc_id") * 2), o1, "doc_id", "d", 16)
    write_shards(df.withColumn("p", F.col("doc_id") * 2), o2, "doc_id", "d", 16)
    a = sorted(map(tuple, spark.read.parquet(o1).collect()))
    b = sorted(map(tuple, spark.read.parquet(o2).collect()))
    assert a == b
