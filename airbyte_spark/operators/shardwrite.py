"""Shuffle-and-shard export: deterministic global pseudo-random
permutation of a corpus into fixed-size training shards.

Every pretraining loader wants the corpus (a) globally shuffled, so a
context window never sees neighboring source docs, (b) cut into
fixed-row shards it can map to workers, (c) reproducibly — the same
seed must yield the same shard layout on every run and after any retry.

Spark-first design (no global single-partition sort, the classic trap):

- permutation key = md5(id || seed) — cross-engine stable (DuckDB
  replays it bit-for-bit for the oracle) and uniformly distributed, so
  range buckets on its 60-bit numeric prefix are balanced by
  construction — no skew handling needed, unlike user-key sorts.
- global rank via the distributed exact prefix-sum idiom
  (functions/sampling.py::pack_documents): frozen range boundaries on
  the hash prefix -> per-range counts (O(ranges) collect) -> per-range
  row_number + offset. Rows with equal prefixes land in the same range
  (prefix-of-key ordering is consistent with full-key ordering), so
  (range, key, id) ordering IS global (key, id) ordering.
- shard_id = rank // rows_per_shard, shard_pos = rank % rows_per_shard.
- write path: repartition(shard_id) + sortWithinPartitions ->
  partitionBy(shard_id) — every shard's rows sit in exactly one task,
  so each shard directory holds exactly one file, in permutation order.

At 10^12 rows: one column-pruned pass for boundaries/counts, one
shuffle keyed by range id for ranking, one shuffle keyed by shard for
the write. `num_ranges` bounds per-task window size — size it to
rows/executor-memory as with any range write.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

log = logging.getLogger("airbyte_spark.shardwrite")


def _perm_key(id_col: str, seed: str):
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))


def shard_assignments(
    df: DataFrame,
    id_col: str,
    seed: str,
    rows_per_shard: int,
    num_ranges: int | None = None,
) -> DataFrame:
    """(id_col, shard_id, shard_pos) for the seeded global permutation.

    ``id_col`` must be unique (it's the tiebreaker and the hash input);
    ``rows_per_shard`` > 0. Join back on ``id_col`` to carry payload —
    the ranking passes stay slim/column-pruned."""
    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive, got {rows_per_shard}")
    spark = df.sparkSession
    slim = df.select(
        F.col(id_col),
        _perm_key(id_col, seed).alias("_k"),
    ).withColumn("_kp", F.conv(F.substring("_k", 1, 15), 16, 10).cast("long"))
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("shard_id", LongType()),
            StructField("shard_pos", LongType()),
        ]
    )
    n_ranges = num_ranges or max(2, spark.sparkContext.defaultParallelism)
    if n_ranges > 1:
        qs = [i / n_ranges for i in range(1, n_ranges)]
        bounds = sorted(set(slim.stat.approxQuantile("_kp", qs, 0.001)))
    else:
        bounds = []
    if bounds:
        barr = F.array(*[F.lit(b).cast("long") for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b <= F.col("_kp"))).alias("_pid")
    else:
        pid = F.lit(0).alias("_pid")
    ranged = slim.select(F.col(id_col), F.col("_k"), pid)
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    if not counts:
        return spark.createDataFrame([], out_schema)
    offsets: dict[int, int] = {}
    running = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = running
        running += int(r["_n"])
    off_map = F.create_map(
        *[
            c
            for p, off in offsets.items()
            for c in (F.lit(p).cast("int"), F.lit(off).cast("long"))
        ]
    )
    w = Window.partitionBy("_pid").orderBy("_k", id_col)
    rank = (F.row_number().over(w) - 1 + off_map[F.col("_pid")]).alias("_rank")
    return ranged.select(F.col(id_col), rank).select(
        F.col(id_col),
        (F.col("_rank") / rows_per_shard).cast("long").alias("shard_id"),
        (F.col("_rank") % rows_per_shard).cast("long").alias("shard_pos"),
    )


def write_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    seed: str,
    rows_per_shard: int,
    num_ranges: int | None = None,
) -> dict:
    """Materialize the shuffled corpus as ``out_dir/shard_id=N/`` parquet
    dirs, one file per shard, rows in permutation order inside each file
    (``shard_pos`` is written so readers can verify/stream in order).
    Returns {"shards": n, "rows": n}. Deterministic for a given seed —
    a retry overwrites with identical layout."""
    asg = shard_assignments(df, id_col, seed, rows_per_shard, num_ranges)
    full = df.join(asg, id_col)
    (
        full.repartition("shard_id")
        .sortWithinPartitions("shard_id", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    written = spark.read.parquet(out_dir)
    n_shards = written.select("shard_id").distinct().count()
    return {"shards": int(n_shards), "rows": int(written.count())}
