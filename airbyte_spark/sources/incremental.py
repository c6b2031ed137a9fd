"""Incremental / resumable scans (SURVEY.md §2.1 S1-S3, §2.2 P2/P4).

- cursor_bounded_scan: S2 — `cursor > lo AND cursor <= hi` with the upper
  bound pre-computed via MAX(cursor) (DefaultJdbcPartition.kt:114-135,
  JdbcPartitionsCreator.kt:71-100). Two-phase: agg(max) then filter, so
  concurrent appends past `hi` don't tear the read.
- composite_range_filter: P2 — row-value comparison `(a,b) > (x,y)`
  expanded into OR-of-ANDs (DefaultJdbcPartition.kt:13-70), for resumable
  partition ranges over composite checkpoint keys.
- sample_scan: S3 — TABLESAMPLE-equivalent capped at 1024 rows
  (SelectQuerySpec.kt:49-66, DefaultJdbcConstants.kt:52), used for
  row-size estimation and split-point planning.
- incremental_watermark_filter: P4 — `WHERE cursor > (SELECT MAX(cursor)
  FROM final)` (base-normalization macros/incremental.sql:11-19).
- plan_range_partitions: the sampling-driven splitter
  (JdbcPartitionsCreator.kt:196-282): sample -> estimate bytes/row ->
  target rows per partition -> quantile split points.

All filters are plain Catalyst predicates → pushed to the parquet scan
(PushedFilters), so an incremental read of a 100 TB table touches only
row groups past the cursor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TABLE_SAMPLE_SIZE = 1024  # DefaultJdbcConstants.kt:52


def max_cursor(df: DataFrame, cursor_col: str):
    """A1 scalar agg: upper bound for the incremental window."""
    return df.agg(F.max(cursor_col).alias("hi")).first()["hi"]


def cursor_bounded_scan(
    df: DataFrame, cursor_col: str, lo=None, hi=None
) -> tuple[DataFrame, object]:
    """S2: rows with lo < cursor <= hi; hi defaults to current MAX."""
    if hi is None:
        hi = max_cursor(df, cursor_col)
    out = df
    if lo is not None:
        out = out.filter(F.col(cursor_col) > F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(cursor_col) <= F.lit(hi))
    return out, hi


def composite_range_filter(cols: list[str], bound: tuple, inclusive: bool = False) -> Column:
    """P2: lexicographic (c1,c2,...) > (b1,b2,...) as OR-of-ANDs:
    c1>b1 OR (c1=b1 AND c2>b2) OR ... (last term >= if inclusive)."""
    terms: list[Column] = []
    for i in range(len(cols)):
        eqs = [F.col(cols[j]) == F.lit(bound[j]) for j in range(i)]
        last = F.col(cols[i]) > F.lit(bound[i])
        if inclusive and i == len(cols) - 1:
            last = F.col(cols[i]) >= F.lit(bound[i])
        term = last
        for e in eqs:
            term = e & term
        terms.append(term)
    out = terms[0]
    for t in terms[1:]:
        out = out | t
    return out


def sample_scan(df: DataFrame, fraction: float = 0.01, seed: int = 42) -> DataFrame:
    """S3: bernoulli sample capped at TABLE_SAMPLE_SIZE rows."""
    return df.sample(fraction=fraction, seed=seed).limit(TABLE_SAMPLE_SIZE)


def incremental_watermark_filter(
    new_data: DataFrame, final: DataFrame, cursor_col: str
) -> DataFrame:
    """P4: rows newer than the destination's high-water mark."""
    wm = final.agg(F.max(cursor_col)).first()[0]
    if wm is None:
        return new_data
    return new_data.filter(F.col(cursor_col) > F.lit(wm))


def plan_range_partitions(
    df: DataFrame,
    split_cols: list[str],
    target_rows_per_partition: int,
    sample_fraction: float = 0.05,
    seed: int = 42,
) -> list[tuple]:
    """Sampling-driven split points (JdbcPartitionsCreator.kt:222-281):
    sample the table, take every k-th sampled key as a boundary. Returns
    the ordered list of exclusive upper-bound tuples; consumers build
    composite_range_filter ranges from consecutive bounds."""
    sample = (
        sample_scan(df.select(*split_cols), fraction=sample_fraction, seed=seed)
        .orderBy(*split_cols)
        .collect()
    )
    if not sample:
        return []
    # table size estimated FROM the sample (JdbcPartitionsCreator.kt:240
    # does the same) — a df.count() here would be a second full scan just
    # for the boundary count. When the TABLE_SAMPLE_SIZE cap truncated the
    # sample this lower-bounds the size (fewer, larger partitions).
    total = int(len(sample) / sample_fraction)
    n_parts = max(1, -(-total // target_rows_per_partition))
    if n_parts <= 1:
        return []
    step = max(1, len(sample) // n_parts)
    return [tuple(sample[i]) for i in range(step, len(sample), step)][: n_parts - 1]
