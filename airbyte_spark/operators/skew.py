"""Explicit skew-key handling: hot-key detection + salted joins/windows.

The reference's closest analog is cardinality-based eviction of hot
aggregates (airbyte-cdk/bulk/core/load/src/main/kotlin/io/airbyte/cdk/load/
dataflow/aggregate/AggregateStore.kt:51-63). Proper skew-splitting is our
addition (SURVEY.md §2.3): a hot `image_id` in a MERGE source batch (e.g.
a re-crawled viral image emitted millions of times) would otherwise pin one
shuffle partition.

Two mechanisms, both pure DataFrame:

- `salted_dedup_rank`: two-phase window dedup — rank within (pk, salt)
  buckets first (map-side-style partial reduction: each hot key's rows are
  spread over `salt_buckets` partitions), then a final rank over the ≤
  salt_buckets survivors per key. At 10^9 duplicate rows for one key the
  second window sees `salt_buckets` rows, not 10^9.

- `salted_sort_merge_join`: generic N-way skew split for equi-joins where
  one side has heavily repeated keys: hot keys (detected via a cheap
  aggregate on the skewed side) get their rows salted on the skewed side
  and replicated x salt on the other side; cold keys join normally. The
  union of both joins is exact. `spark.sql.adaptive.skewJoin.enabled` is
  the runtime backstop (session.py); this is the explicit plan-level fix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame,
    keys: list[str],
    min_rows: int = 100_000,
    max_keys: int = 1000,
) -> DataFrame:
    """Keys with > min_rows occurrences (the skew set). One partial-agg
    shuffle over the key columns only (column-pruned scan); the result is
    metadata-sized (≤ max_keys rows) and broadcastable."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_hot_n"))
        .filter(F.col("_hot_n") > min_rows)
        .orderBy(F.desc("_hot_n"))
        .limit(max_keys)
        .drop("_hot_n")
    )


def salted_dedup_rank(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Keep exactly one row per key — the first under `order_by` — via a
    two-phase salted ROW_NUMBER (W1, SnowflakeDirectLoadSqlGenerator.kt:
    283-287). Phase 1 ranks within (keys, salt); phase 2 ranks the phase-1
    winners per key. Requires `order_by` to be a total order (callers add a
    stable tiebreaker, e.g. _airbyte_raw_id) so the result is deterministic
    regardless of salting."""
    salt_src = F.col(salt_on) if salt_on else F.rand(seed=7)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_src.cast("string")), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def salted_sort_merge_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    hot_min_rows: int = 100_000,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Equi-join `skewed ⋈ other` on `keys`, splitting hot keys across
    salt buckets. `how` must be 'inner' or 'left' (left = skewed side
    preserved). The cold-key path is a plain sort-merge join; the hot-key
    path salts the skewed side and explodes the other side x salt_buckets.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_sort_merge_join supports how in {'inner','left'}")
    if hot_keys is None:
        hot_keys = detect_hot_keys(skewed, keys, min_rows=hot_min_rows)
    hot = hot_keys.withColumn("_is_hot", F.lit(True))

    sk = skewed.join(F.broadcast(hot), on=keys, how="left")
    sk_hot = sk.filter(F.col("_is_hot").isNotNull()).drop("_is_hot")
    sk_cold = sk.filter(F.col("_is_hot").isNull()).drop("_is_hot")

    ot = other.join(F.broadcast(hot), on=keys, how="left")
    ot_hot = ot.filter(F.col("_is_hot").isNotNull()).drop("_is_hot")
    ot_cold = ot.filter(F.col("_is_hot").isNull()).drop("_is_hot")

    cold = sk_cold.hint("merge").join(ot_cold, on=keys, how=how)

    sk_salted = sk_hot.withColumn(
        "_salt", F.pmod(F.xxhash64(F.rand(seed=11).cast("string")), F.lit(salt_buckets))
    )
    ot_salted = ot_hot.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    hot_joined = sk_salted.hint("merge").join(
        ot_salted, on=keys + ["_salt"], how=how
    ).drop("_salt")

    return cold.unionByName(hot_joined)
