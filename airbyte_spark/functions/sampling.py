"""Deterministic sampling and sequence packing for training-data curation.

Two curation primitives a large-scale pretraining pipeline needs on top
of the dedup/quality operators (reference analog: Airbyte's per-stream
record selection + the mixture/packing steps every published LLM data
pipeline performs between curation and tokenization):

- **Hash-based (stratified) sampling** — select a deterministic,
  reproducible fraction of rows per stratum (language, source, quality
  bucket) so a mixture spec like ``{"en": 0.5, "de": 0.25}`` yields the
  SAME subset on every engine and every run. The keep-predicate is a
  pure codegen expression (md5 prefix vs a precomputed hex threshold —
  no shuffle, no UDF, pushes through Catalyst like any filter), and
  because both Spark and DuckDB lowercase-hex their md5, the predicate
  is engine-portable for oracle checking. Seed-change ≡ resample.

- **Sequence packing** — assign every document its global token offset
  in a canonical concatenation order and the id of the fixed-size
  context window its first token lands in (``bin = floor(offset /
  budget)``), the layout step that turns a curated corpus into
  fixed-length pretraining samples. Implemented as a distributed exact
  prefix sum: frozen range boundaries -> per-range exact totals
  (O(ranges) driver metadata) -> per-range window cumsum + offset. No
  global single-partition window, no nondeterministic
  ``spark_partition_id`` capture — the range id is a pure function of
  the order column against literal boundaries, so every recomputation
  of the lazy result agrees.

At 100 TB: sampling is a filter (scan-local, pushdown-friendly);
packing reads a slim (order, weight) projection three times (boundary
sample, exact totals, final cumsum) — the standard price of an exact
distributed prefix sum — and shuffles once on the range id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_HEX_SPACE = 16 ** 8  # md5-prefix threshold resolution: 8 hex digits


def fraction_threshold(fraction: float) -> str | None:
    """8-hex-digit keep threshold for ``fraction`` (None = keep all).

    A key is kept iff ``substr(md5(key || seed), 1, 8) < threshold``;
    md5 prefixes are uniform, so P(keep) == floor(fraction * 16^8) /
    16^8 — exact to ~2.3e-10. The hex comparison is lexicographic ==
    numeric (fixed width, lowercase in both Spark and DuckDB), which is
    what makes the predicate oracle-portable.
    """
    if fraction >= 1.0:
        return None
    if fraction <= 0.0:
        return "00000000"
    return format(int(fraction * _HEX_SPACE), "08x")


def hash_keep(key: Column, fraction: float, seed: str = "") -> Column:
    """Deterministic keep-predicate selecting ~``fraction`` of keys."""
    thr = fraction_threshold(fraction)
    if thr is None:
        return F.lit(True)
    if thr == "00000000":
        return F.lit(False)
    return (
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(seed))), 1, 8)
        < F.lit(thr)
    )


def stratified_keep(
    key: Column,
    strata: Column,
    fractions: dict[str, float],
    seed: str = "",
    default_fraction: float = 0.0,
) -> Column:
    """Per-stratum keep-predicate: ``fractions[stratum]`` of each
    stratum's keys survive (``default_fraction`` for strata not in the
    spec). Built as a when-chain over the spec — right-sized for the
    handful-to-hundreds of strata a mixture spec names; a million-
    stratum spec should broadcast-join a fractions dim instead."""
    expr = hash_keep(key, default_fraction, seed)
    for val in sorted(fractions, reverse=True):
        expr = F.when(
            strata == F.lit(val), hash_keep(key, fractions[val], seed)
        ).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Rows of ``df`` surviving the per-stratum mixture spec."""
    return df.filter(
        stratified_keep(
            F.col(key_col),
            F.col(strata_col),
            fractions,
            seed=seed,
            default_fraction=default_fraction,
        )
    )


def repeat_count(key: Column, weight: float, seed: str = "") -> Column:
    """Deterministic per-key copy count with E[copies] == ``weight``:
    ``floor(weight)`` full copies plus one extra iff the key's md5
    prefix clears the fractional-part threshold — the upsampling rule a
    mixture spec with weights > 1 needs (repeat high-value sources
    ~2.5x) while weights < 1 degrade gracefully to sampling."""
    if weight < 0:
        raise ValueError(f"weight must be >= 0: {weight}")
    base = int(weight)
    frac = weight - base
    out = F.lit(base)
    if frac > 0:
        out = out + hash_keep(key, frac, seed).cast("int")
    return out


def weighted_upsample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    seed: str = "",
    default_weight: float = 1.0,
    copy_col: str = "copy_id",
) -> DataFrame:
    """One output row per (row, copy): every input row is emitted
    ``repeat_count(key, weights[stratum])`` times with ``copy_col``
    numbering its copies 0..n-1 — deterministic epoch-weighted
    upsampling/downsampling in a single codegen explode (no shuffle, no
    UDF). Rows whose count is 0 disappear; expected output size is
    exactly sum(weight per row)."""
    n = repeat_count(F.col(key_col), default_weight, seed)
    for val in sorted(weights, reverse=True):
        n = F.when(
            F.col(strata_col) == F.lit(val),
            repeat_count(F.col(key_col), weights[val], seed),
        ).otherwise(n)
    copies = F.when(
        n > 0, F.sequence(F.lit(0).cast("long"), (n - 1).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn(copy_col, F.explode(copies))


def pack_documents(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    num_ranges: int | None = None,
) -> DataFrame:
    """(order, start_offset, bin_id) for packing documents into
    fixed-``budget`` context windows in ``order_col`` order.

    ``start_offset`` is the exact global running sum of ``weight_col``
    over all earlier rows (the document's first-token position in the
    canonical concatenation); ``bin_id = floor(start_offset / budget)``
    is the window its first token lands in — the document-to-sample
    assignment a fixed-context pretraining loader uses. Deterministic:
    range boundaries are frozen literals, so recomputing the lazy
    result always reproduces the same offsets.

    ``order_col`` must be numeric and unique; null/negative weights
    count as 0. Join the result back on ``order_col`` to carry payloads
    (kept slim here so the three prefix-sum passes stay column-pruned).
    """
    spark = df.sparkSession
    slim = df.select(
        F.col(order_col),
        F.greatest(
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0)), F.lit(0)
        ).alias("_w"),
    )
    out_schema = StructType(
        [
            StructField(order_col, df.schema[order_col].dataType),
            StructField("start_offset", LongType()),
            StructField("bin_id", LongType()),
        ]
    )
    n_ranges = num_ranges or max(2, spark.sparkContext.defaultParallelism)
    if n_ranges > 1:
        qs = [i / n_ranges for i in range(1, n_ranges)]
        bounds = sorted(
            set(slim.stat.approxQuantile(order_col, qs, 0.001))
        )
    else:
        bounds = []
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        pid = F.size(
            F.filter(barr, lambda b: b <= F.col(order_col))
        ).alias("_pid")
    else:
        pid = F.lit(0).alias("_pid")
    ranged = slim.select(F.col(order_col), F.col("_w"), pid)
    totals = ranged.groupBy("_pid").agg(F.sum("_w").alias("_t")).collect()
    if not totals:
        return spark.createDataFrame([], out_schema)
    offsets: dict[int, int] = {}
    running = 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = running
        running += int(r["_t"])
    off_map = F.create_map(
        *[
            c
            for p, off in offsets.items()
            for c in (F.lit(p).cast("int"), F.lit(off).cast("long"))
        ]
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_cum", F.sum("_w").over(w))
        .select(
            F.col(order_col),
            (
                F.col("_cum") - F.col("_w") + off_map[F.col("_pid")]
            ).alias("start_offset"),
            F.floor(
                (F.col("_cum") - F.col("_w") + off_map[F.col("_pid")])
                / F.lit(budget)
            ).alias("bin_id"),
        )
    )


def split_expr(key: Column, splits: dict[str, float], seed: str = "") -> Column:
    """Deterministic split label for ``key`` — cumulative md5-prefix
    thresholds cut the hash space into one band per split, so
    P(split s) == fraction(s) (to the 8-hex-digit resolution of
    fraction_threshold) and the SAME key always lands in the SAME split
    in any engine. Fractions must be >= 0 and sum to 1 (the last split
    absorbs the hash-space remainder as the CASE else-branch). A NULL
    key hashes to NULL, every band comparison is NULL, and the row
    falls to the LAST split — identically in Spark (when() skips) and
    SQL (CASE skips), so the cross-engine contract holds for NULLs
    too."""
    names = list(splits)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    if any(v < 0 for v in splits.values()):
        raise ValueError(f"split fractions must be >= 0: {splits}")
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {splits}")
    h = F.substring(F.md5(F.concat(key.cast("string"), F.lit(seed))), 1, 8)
    out = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(fraction_threshold(min(cum, 1.0 - 1e-12)))
        out = F.when(cond, name) if out is None else out.when(cond, name)
    return out.otherwise(names[-1])


def assign_splits(
    df: DataFrame,
    group_col: str,
    splits: dict[str, float],
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a pure
    function of ``group_col`` (a user, a source domain, a dedup-cluster
    representative), so every row of a group lands in the SAME split and
    near-duplicate rows sharing the group key can never straddle the
    train/eval boundary. One codegen projection — no shuffle, no state,
    reproducible across engines and reruns."""
    return df.withColumn(out_col, split_expr(F.col(group_col), splits, seed))


def exact_sample(
    df: DataFrame, key_col: str, k: int, seed: str = ""
) -> DataFrame:
    """EXACTLY min(k, n) rows, chosen by the md5(key||seed) order — the
    deterministic replacement for reservoir sampling when the sample
    must be reproducible across engines and reruns (eval-set
    construction). Rows with a NULL key are EXCLUDED — their hash is
    NULL, which Spark sorts first and SQL engines sort last, and ties
    among them have no deterministic order; a sample key must identify
    the row. Plans as TakeOrderedAndProject: each partition ships only
    its local top-k, never a global sort."""
    if k <= 0:
        raise ValueError(f"k must be > 0: {k}")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed)))
    return (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("_h", h)
        .orderBy("_h", key_col)
        .limit(k)
        .drop("_h")
    )


def balanced_sample(
    df: DataFrame, key_col: str, strata_col: str, k: int, seed: str = ""
) -> DataFrame:
    """Class-balanced sampling: EXACTLY min(k, stratum size) rows per
    stratum, again in md5(key||seed) order — equal-sized per-language /
    per-source eval slices regardless of corpus skew. NULL-key rows are
    excluded like exact_sample (no deterministic order among them);
    a NULL stratum is its own stratum. One window ranked within the
    stratum hash partition; rows never leave their stratum's reducer."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be > 0: {k}")
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed)))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
