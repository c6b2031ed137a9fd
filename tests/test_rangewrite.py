"""range_bucketed bucket→partition mapping (r6 optimization round).

The shuffle behind every range-bucketed write used to hash the bucket id
itself, so with n_out ≈ n_parts several buckets collided into one reducer
while others sat empty (balls-into-bins; optimization guide §2.5). The
salted mapping must (a) reproduce Spark's hash exactly and (b) place each
bucket alone in its own partition.
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbyte_spark.operators.rangewrite import (  # noqa: E402
    _murmur3_int,
    partition_salts,
    range_bucketed,
)


def test_rangewrite_salts_match_spark_hash(spark):
    df = spark.range(-100, 3000).select(F.col("id").cast("int").alias("i"))
    rows = df.select(
        "i", F.hash("i").alias("h"), F.pmod(F.hash("i"), F.lit(37)).alias("p")
    ).collect()
    for r in rows:
        assert _murmur3_int(r["i"]) == r["h"]
        assert _murmur3_int(r["i"]) % 37 == r["p"]


def test_partition_salts_are_a_bijection():
    for n in (1, 2, 7, 32, 267):
        salts = partition_salts(n)
        assert len(salts) == n
        assert sorted(_murmur3_int(s) % n for s in salts) == list(range(n))


def test_range_bucketed_one_bucket_per_partition(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    boundaries = [2500, 5000, 7500]
    out = range_bucketed(df, F.col("k"), boundaries, sort_cols=["k"], min_tasks=8)
    got = (
        out.withColumn("_sp", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count_distinct("_sp").alias("nsp"), F.min("_sp").alias("sp"))
        .collect()
    )
    # every bucket lives in exactly one partition, and partition == bucket id
    assert {r["_pid"] for r in got} == {0, 1, 2, 3}
    for r in got:
        assert r["nsp"] == 1
        assert r["sp"] == r["_pid"]
    # the transient salt column never reaches the caller
    assert "_psalt" not in out.columns
