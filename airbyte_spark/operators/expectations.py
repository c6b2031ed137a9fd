"""Declarative data-quality expectations over a table (the dbt-test /
Great-Expectations shape, scoped to what a training-data lake needs;
the reference's per-record schema validation — AirbyteValueCoercer /
record validation in the CDK — covers ingest-time types, this covers
table-level invariants a curation pipeline gates on before export).

Rules are plain dicts; `validate(df, rules)` returns ONE report row per
rule: (rule_id, rule, column, violations, checked, passed).

Supported rules
  {"rule": "not_null",        "column": c}
  {"rule": "unique",          "columns": [c, ...]}          # null keys excluded (not_null owns them)
  {"rule": "accepted_values", "column": c, "values": [...]} # nulls ignored
  {"rule": "range",           "column": c, "min": x, "max": y}  # inclusive, either side optional, nulls ignored
  {"rule": "regex",           "column": c, "pattern": p}    # non-matching = violation, nulls ignored
  {"rule": "expression",      "name": n, "sql": bool-SQL}   # violation = NOT coalesce(expr, FALSE)
  {"rule": "freshness",       "column": ts, "max_age_s": n, "now": "iso-ts"}
      # violation = row older than now - max_age_s ("now" is explicit —
      # deterministic across engines and replays, never wall-clock)

Scale shape: every row-level rule compiles to one conditional-count
aggregate, and ALL of them run in a SINGLE scan (one partial-agg
reduce to a 1-row frame — no shuffle wider than the final combine).
Each `unique` rule adds one count/countDistinct pass over its key
columns (two-phase partial agg). Nothing ever collects rows; the report
is O(#rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_RULES = ("not_null", "accepted_values", "range", "regex", "expression", "freshness")


def _violation_cond(rule: dict):
    """Boolean Column that is True when a row VIOLATES the rule, None
    checked-condition meaning 'all rows checked'. Returns (violates,
    checked) columns."""
    kind = rule["rule"]
    if kind == "not_null":
        c = F.col(rule["column"])
        return c.isNull(), F.lit(True)
    if kind == "accepted_values":
        c = F.col(rule["column"])
        return c.isNotNull() & ~c.isin(list(rule["values"])), c.isNotNull()
    if kind == "range":
        c = F.col(rule["column"])
        cond = F.lit(False)
        if rule.get("min") is not None:
            cond = cond | (c < F.lit(rule["min"]))
        if rule.get("max") is not None:
            cond = cond | (c > F.lit(rule["max"]))
        return c.isNotNull() & cond, c.isNotNull()
    if kind == "regex":
        c = F.col(rule["column"])
        return c.isNotNull() & ~c.rlike(rule["pattern"]), c.isNotNull()
    if kind == "expression":
        ok = F.coalesce(F.expr(rule["sql"]), F.lit(False))
        return ~ok, F.lit(True)
    if kind == "freshness":
        c = F.col(rule["column"])
        cutoff = F.lit(rule["now"]).cast("timestamp") - F.expr(
            f"INTERVAL {int(rule['max_age_s'])} SECONDS"
        )
        return c.isNotNull() & (c < cutoff), c.isNotNull()
    raise ValueError(f"unknown rule kind {kind!r}")


def _label(rule: dict) -> str:
    if rule["rule"] == "unique":
        return ",".join(rule["columns"])
    if rule["rule"] == "expression":
        return rule.get("name", rule["sql"])
    return rule["column"]


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """One report row per rule: (rule_id, rule, column, violations,
    checked, passed), rule_id = position in `rules`. See module doc for
    the rule grammar and the single-scan plan shape."""
    spark = df.sparkSession
    row_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] in _ROW_RULES]
    uniq_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] == "unique"]
    unknown = [r for _, r in enumerate(rules) if r["rule"] not in _ROW_RULES + ("unique",)]
    if unknown:
        raise ValueError(f"unknown rule kinds: {[r['rule'] for r in unknown]}")

    reports: list[DataFrame] = []
    if row_rules:
        aggs = []
        for i, r in row_rules:
            viol, checked = _violation_cond(r)
            aggs.append(
                F.sum(F.when(viol, F.lit(1)).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"v{i}")
            )
            aggs.append(
                F.sum(F.when(checked, F.lit(1)).otherwise(F.lit(0)))
                .cast("long")
                .alias(f"c{i}")
            )
        one = df.agg(*aggs)
        selects = []
        for i, r in row_rules:
            selects.append(
                F.struct(
                    F.lit(i).cast("int").alias("rule_id"),
                    F.lit(r["rule"]).alias("rule"),
                    F.lit(_label(r)).alias("column"),
                    F.coalesce(F.col(f"v{i}"), F.lit(0)).alias("violations"),
                    F.coalesce(F.col(f"c{i}"), F.lit(0)).alias("checked"),
                ).alias(f"s{i}")
            )
        packed = one.select(F.array(*selects).alias("a"))
        reports.append(
            packed.select(F.explode("a").alias("s")).select("s.*")
        )
    for i, r in uniq_rules:
        cols = [F.col(c) for c in r["columns"]]
        nonnull = df
        for c in r["columns"]:
            nonnull = nonnull.filter(F.col(c).isNotNull())
        agg = nonnull.agg(
            F.count(F.lit(1)).cast("long").alias("checked"),
            F.countDistinct(*cols).cast("long").alias("_d"),
        )
        reports.append(
            agg.select(
                F.lit(i).cast("int").alias("rule_id"),
                F.lit("unique").alias("rule"),
                F.lit(_label(r)).alias("column"),
                (F.col("checked") - F.col("_d")).alias("violations"),
                F.col("checked"),
            )
        )
    if not reports:
        return spark.createDataFrame(
            [],
            "rule_id int, rule string, column string, "
            "violations long, checked long, passed boolean",
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("violations") == 0)


def drift_report(
    table,
    col: str,
    bins: int = 10,
    old_snapshot: str | None = None,
    new_snapshot: str | None = None,
    branch: str = "main",
) -> DataFrame:
    """Distribution drift of a numeric column between two versions of a
    lake table (the dataset-version QA gate: did this sync shift the
    score/length/value distribution?). Both versions are binned on ONE
    shared equal-width grid spanning their combined range, so the
    per-bucket fractions are directly comparable; sum(|old_frac -
    new_frac|) is the L1 (total-variation x2) drift. NULLs and NaNs are
    excluded on both sides.

    Returns (bucket, lo_edge, hi_edge, old_count, new_count, old_frac,
    new_frac) — empty when neither version has a usable value. Scale
    shape: two snapshot scans (time travel is metadata-only), one
    4-scalar range agg over their union, one partial-agg count per side,
    and a bucket-keyed outer join of two <= bins-row frames."""
    from pyspark.sql import functions as F

    if bins <= 0:
        raise ValueError(f"bins must be > 0: {bins}")

    def _vals(snap):
        x = F.col(col).cast("double")
        return (
            table.scan(branch=branch, snapshot_id=snap)
            .select(x.alias("_x"))
            .filter(F.col("_x").isNotNull() & ~F.isnan("_x"))
        )

    old_v, new_v = _vals(old_snapshot), _vals(new_snapshot)
    row = old_v.unionByName(new_v).agg(
        F.min("_x").alias("lo"), F.max("_x").alias("hi")
    ).first()
    lo, hi = row["lo"], row["hi"]
    spark = table.spark
    empty = "bucket int, lo_edge double, hi_edge double, " \
            "old_count long, new_count long, old_frac double, new_frac double"
    if lo is None:
        return spark.createDataFrame([], empty)
    width = (hi - lo) / bins

    def _hist(df, name):
        bucket = (
            F.lit(0)
            if width == 0.0
            else F.least(
                F.lit(bins - 1), F.floor((F.col("_x") - F.lit(lo)) / F.lit(width))
            )
        )
        return df.groupBy(bucket.cast("int").alias("bucket")).agg(
            F.count(F.lit(1)).alias(name)
        )

    joined = _hist(old_v, "old_count").join(
        _hist(new_v, "new_count"), "bucket", "full_outer"
    )
    totals = joined.agg(
        F.sum("old_count").alias("ot"), F.sum("new_count").alias("nt")
    ).first()
    ot, nt = totals["ot"] or 0, totals["nt"] or 0
    return joined.select(
        "bucket",
        F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("lo_edge"),
        F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6).alias("hi_edge"),
        F.coalesce("old_count", F.lit(0)).cast("long").alias("old_count"),
        F.coalesce("new_count", F.lit(0)).cast("long").alias("new_count"),
        F.round(
            F.coalesce("old_count", F.lit(0)) / F.lit(float(ot)) if ot else F.lit(0.0),
            6,
        ).alias("old_frac"),
        F.round(
            F.coalesce("new_count", F.lit(0)) / F.lit(float(nt)) if nt else F.lit(0.0),
            6,
        ).alias("new_frac"),
    )
