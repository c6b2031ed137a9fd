"""Bucketed tables: co-located joins without a shuffle.

For repeated big-big joins on a stable key (e.g. images ⋈ annotations on
image_id at 10^12 rows), hash-bucketing both tables on the join key at
write time removes the per-query shuffle entirely: Spark reads matching
buckets pairwise and sort-merge joins them in place. This is the
write-once/join-many amortization the brief calls out ("bucketing for
co-located joins"); the reference has no analog (it never joins two big
tables) — SURVEY.md §2.3.

Bucketed writes go through the session catalog (`saveAsTable`) because
bucket metadata lives in the table catalog, not in parquet files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs
    Catalyst plans a SortMergeJoin with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
