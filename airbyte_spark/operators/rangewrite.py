"""Single-pass range-bucketed writes.

`df.repartitionByRange(col)` samples its input with a separate job, which
re-executes the whole upstream plan — for a payload-heavy merge join or a
decode-UDF clustering pipeline that doubles the dominant cost. Instead:

1. compute n_out-1 boundary values for the range key on a CHEAP plan —
   either the same plan column-pruned to the key (Catalyst drops the
   payload I/O), a numeric approxQuantile, or manifest stats;
2. tag each row with `_pid = #{boundaries < key}` (a codegen'd literal
   scan, no shuffle);
3. `repartition(N, '_pid')` (hash keeps a bucket wholly in one task) and
   `write.partitionBy('_pid')` — the writer splits by directory, so each
   bucket emits exactly ONE file regardless of hash collisions.

Result: one execution of the expensive plan, one shuffle, deterministic
file count, disjoint key ranges per file (manifest pruning stays sharp).
For bucket counts beyond ~1000 the boundary-literal expression gets big;
callers at that scale shard the job (e.g. compact/cluster per partition
of the table), which they need anyway for commit-size hygiene.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sampled_boundaries(
    keys: DataFrame,
    col: str,
    n_out: int,
    est_rows: int,
    sample_rows: int = 20_000,
    seed: int = 42,
) -> list:
    """Quantile boundaries for any orderable key via a small sample of a
    column-pruned plan. One cheap job; boundary list is driver metadata."""
    if n_out <= 1:
        return []
    frac = min(1.0, sample_rows / max(1, est_rows))
    rows = [r[0] for r in keys.select(col).sample(fraction=frac, seed=seed).collect()]
    if not rows:
        return []
    rows.sort()
    step = len(rows) / n_out
    bounds = []
    for i in range(1, n_out):
        v = rows[min(len(rows) - 1, int(i * step))]
        if not bounds or v > bounds[-1]:
            bounds.append(v)
    return bounds


def manifest_boundaries(entries: list, col: str, n_out: int) -> list:
    """Boundaries interpolated purely from manifest [min,max]+rows stats —
    zero Spark jobs. Assumes roughly uniform keys within each file (true
    for PK-sorted tables); rows outside the known range clamp into the
    first/last bucket. entries: DataFileEntry list with stats[col]."""
    if n_out <= 1:
        return []
    pts: list = []
    for e in entries:
        st = e.stats.get(col) if hasattr(e, "stats") else None
        if st and st.get("min") is not None:
            pts.append(st["min"])
            pts.append(st["max"])
    if not pts:
        return []
    pts.sort()
    step = len(pts) / n_out
    out = []
    for i in range(1, n_out):
        v = pts[min(len(pts) - 1, int(i * step))]
        if not out or v > out[-1]:
            out.append(v)
    return out


def numeric_boundaries(keys: DataFrame, col: str, n_out: int) -> list:
    """Quantile boundaries for a numeric key: ONE collect of the (already
    sampled, slim) key column + an exact numpy quantile on the driver.
    Callers bound the input to ~200k rows (cluster samples before the key
    UDF), so the collect is ≤ 1.6 MB — cheaper than approxQuantile's
    separate aggregation job, and boundary precision only affects file-size
    balance."""
    if n_out <= 1:
        return []
    vals = [r[0] for r in keys.select(col).collect() if r[0] is not None]
    if not vals:
        return []
    arr = np.sort(np.asarray(vals))
    idx = (np.arange(1, n_out) * len(arr)) // n_out
    out: list = []
    for v in arr[np.minimum(idx, len(arr) - 1)]:
        v = v.item()
        if not out or v > out[-1]:
            out.append(v)
    return out


def _sql_boundary(b) -> str | None:
    """SQL literal for a boundary value, or None when the type has no safe
    inline form (the caller falls back to the F.lit chain)."""
    if isinstance(b, bool):
        return None
    if isinstance(b, int):
        return f"{b}L"
    if isinstance(b, float):
        # string round-trip: repr() is the shortest exact form and Spark's
        # string->double cast parses it back to the identical double
        # (a bare fractional literal would parse as DECIMAL)
        return f"CAST('{b!r}' AS DOUBLE)"
    if isinstance(b, str):
        return "'" + b.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return None


def bucket_expr(key: Column, boundaries: list) -> Column:
    """Partition id = number of boundaries <= key (0..len(boundaries))."""
    if not boundaries:
        return F.lit(0)
    pid = F.lit(0)
    for b in boundaries:
        pid = pid + (key >= F.lit(b)).cast("int")
    return pid


def _bucket_expr_named(col_name: str, boundaries: list) -> Column | None:
    """`bucket_expr` over an existing column, emitted as ONE parsed SQL
    expression (same codegen'd comparison chain): the `F.lit`-per-boundary
    form costs ~3 py4j round trips per boundary — a full second of driver
    latency at a few hundred output files, per write. None when a boundary
    type has no safe inline SQL form (caller falls back)."""
    lits = [_sql_boundary(b) for b in boundaries]
    if not lits or any(s is None for s in lits):
        return None
    terms = " + ".join(f"CAST((`{col_name}` >= {s}) AS INT)" for s in lits)
    return F.expr(terms)


def _murmur3_int(value: int, seed: int = 42) -> int:
    """Spark's Murmur3Hash of one INT column value (`F.hash(int_col)`),
    replicated exactly (pinned by test_rangewrite_salts_match_spark_hash)
    so bucket→partition salts can be planned driver-side with no Spark
    job."""
    k1 = (value & 0xFFFFFFFF) * 0xCC9E2D51 & 0xFFFFFFFF
    k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
    k1 = (k1 * 0x1B873593) & 0xFFFFFFFF
    h1 = (seed & 0xFFFFFFFF) ^ k1
    h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
    h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4  # input length in bytes
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - 0x100000000 if h1 >= 0x80000000 else h1


_SALT_CACHE: dict[int, list[int]] = {}


def partition_salts(n_parts: int) -> list[int]:
    """salts[p] = smallest int x with pmod(murmur3(x), n_parts) == p.

    `repartition(n, col)` places a row in pmod(hash(col), n): hashing the
    bucket id directly COLLIDES buckets into one task and leaves others
    empty whenever the bucket count is near the partition count (the
    classic balls-into-bins skew — guide §2.5). Remapping each bucket id
    through its salt makes bucket→partition a bijection: every reducer
    gets exactly one range bucket, so the biggest task is one bucket, not
    three."""
    salts = _SALT_CACHE.get(n_parts)
    if salts is None:
        salts = [-1] * n_parts
        found, x = 0, 0
        while found < n_parts:
            p = _murmur3_int(x) % n_parts  # python % IS pmod for n>0
            if salts[p] < 0:
                salts[p] = x
                found += 1
            x += 1
        _SALT_CACHE[n_parts] = salts
    return salts


def range_bucketed(
    df: DataFrame,
    key: Column,
    boundaries: list,
    sort_cols: list,
    min_tasks: int = 0,
) -> DataFrame:
    """Tag + shuffle + sort: returns a DataFrame carrying `_pid`, ready for
    `write.partitionBy('_pid')` (table.write_dataframe(partition_by='_pid')).

    The shuffle hashes a per-bucket SALT chosen so bucket→partition is
    exactly 1:1 (see partition_salts) — no two buckets share a reducer, no
    reducer idles, and each output file is produced by exactly one task."""
    n_out = len(boundaries) + 1
    named = _bucket_expr_named("_rwk", boundaries) if boundaries else None
    if named is not None:
        tagged = (
            df.withColumn("_rwk", key)
            .withColumn("_pid", named)
            .drop("_rwk")
        )
    else:
        tagged = df.withColumn("_pid", bucket_expr(key, boundaries))
    n_parts = max(n_out, min_tasks)
    salts = partition_salts(n_parts)[:n_out]
    # one parsed expression, not one F.lit per salt (py4j latency)
    salt_col = F.element_at(
        F.expr(f"array({', '.join(str(s) for s in salts)})"), F.col("_pid") + 1
    )
    tagged = tagged.withColumn("_psalt", salt_col)
    return (
        tagged.repartition(n_parts, "_psalt")
        .sortWithinPartitions("_pid", *sort_cols)
        .drop("_psalt")
    )
