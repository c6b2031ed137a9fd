"""Skew utilities: hot-key detection + salted sort-merge join correctness
(the explicit skew-splitting machinery from SURVEY.md §2.3)."""

from pyspark.sql import functions as F

from airbyte_spark.operators.skew import (
    detect_hot_keys,
    salted_dedup_rank,
    salted_sort_merge_join,
)


def _skewed(spark, n_hot=5000, n_cold=200):
    hot = spark.range(n_hot).select(
        F.lit("HOT").alias("k"), (F.col("id")).alias("v")
    )
    cold = spark.range(n_cold).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold).repartition(8)


def test_detect_hot_keys(spark):
    df = _skewed(spark)
    hot = detect_hot_keys(df, ["k"], min_rows=1000)
    assert [r["k"] for r in hot.collect()] == ["HOT"]


def test_salted_join_matches_plain_join(spark):
    skewed = _skewed(spark)
    other = spark.createDataFrame(
        [("HOT", "dim-hot"), ("c1", "dim-1"), ("c7", "dim-7"), ("miss", "x")],
        ["k", "label"],
    )
    for how in ("inner", "left"):
        expected = skewed.join(other, on="k", how=how)
        got = salted_sort_merge_join(
            skewed, other, ["k"], how=how, salt_buckets=8, hot_min_rows=1000
        )
        ec = expected.groupBy("k").count().orderBy("k").collect()
        gc = got.groupBy("k").count().orderBy("k").collect()
        assert [tuple(r) for r in ec] == [tuple(r) for r in gc], how
        assert expected.count() == got.count()


def test_salted_dedup_rank_exact_winner(spark):
    df = _skewed(spark).withColumn("tie", F.col("v") % 10)
    out = salted_dedup_rank(
        df, ["k"], [F.desc("v"), F.desc("tie")], salt_buckets=8, salt_on="v"
    )
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows["HOT"] == 4999  # global max despite salting
    assert out.count() == out.select("k").distinct().count()
