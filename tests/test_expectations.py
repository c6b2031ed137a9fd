"""Declarative data-quality expectations (operators/expectations.py)."""

import datetime

import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.expectations import validate

TS = datetime.datetime(2024, 1, 10)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "alpha", "en", 5, TS),
        (2, None, "en", 4, TS),
        (3, "Gamma!", "xx", -1, TS - datetime.timedelta(days=30)),
        (4, "delta", "es", 5, None),
        (4, "delta", "es", 5, TS),
        (None, "eps", "en", 3, TS),
    ]
    return spark.createDataFrame(
        rows, "id long, text string, lang string, n long, ts timestamp"
    )


def _by_label(rep):
    return {(r["rule"], r["column"]): r for r in rep.collect()}


def test_all_rule_kinds(df):
    rep = validate(
        df,
        [
            {"rule": "not_null", "column": "text"},
            {"rule": "unique", "columns": ["id"]},
            {"rule": "accepted_values", "column": "lang", "values": ["en", "es"]},
            {"rule": "range", "column": "n", "min": 0, "max": 10},
            {"rule": "regex", "column": "text", "pattern": "^[a-z]+$"},
            {"rule": "expression", "name": "n_matches_len", "sql": "n = length(text)"},
            {
                "rule": "freshness",
                "column": "ts",
                "max_age_s": 7 * 86400,
                "now": "2024-01-12T00:00:00",
            },
        ],
    )
    got = _by_label(rep)
    assert got[("not_null", "text")]["violations"] == 1
    assert got[("not_null", "text")]["checked"] == 6
    # null id excluded; id=4 twice -> 1 surplus row
    u = got[("unique", "id")]
    assert (u["violations"], u["checked"], u["passed"]) == (1, 5, False)
    assert got[("accepted_values", "lang")]["violations"] == 1  # xx
    assert got[("range", "n")]["violations"] == 1  # -1
    # 'Gamma!' fails the regex; null text ignored
    r = got[("regex", "text")]
    assert (r["violations"], r["checked"]) == (1, 5)
    # expression: null text -> length null -> coalesce false -> violation
    # (row 2), plus row 3 ('Gamma!' len 6 != -1)
    assert got[("expression", "n_matches_len")]["violations"] == 2
    # freshness: row 3 is 30 days old vs 7-day window; null ts ignored
    f_ = got[("freshness", "ts")]
    assert (f_["violations"], f_["checked"]) == (1, 5)
    assert rep.filter("passed").count() == 0 + sum(
        1 for k in got if got[k]["violations"] == 0
    )


def test_composite_unique_and_passing_rules(df):
    rep = validate(
        df,
        [
            {"rule": "unique", "columns": ["id", "ts"]},
            {"rule": "not_null", "column": "lang"},
            {"rule": "range", "column": "n", "min": -5},
        ],
    )
    got = _by_label(rep)
    # (4, TS) appears once, (4, None) excluded (null key col) -> no dup
    assert got[("unique", "id,ts")]["violations"] == 0
    assert got[("not_null", "lang")]["passed"] is True
    assert got[("range", "n")]["passed"] is True


def test_unknown_rule_raises(df):
    with pytest.raises(ValueError, match="unknown rule kinds"):
        validate(df, [{"rule": "nope", "column": "id"}])


def test_empty_rules(df):
    rep = validate(df, [])
    assert rep.count() == 0
    assert rep.columns == [
        "rule_id", "rule", "column", "violations", "checked", "passed",
    ]


def test_row_rules_share_one_scan(spark):
    """All row-level rules compile into a single aggregate over ONE scan
    of the input — the property that keeps validate O(1 pass) at
    100 TB."""
    d = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("n"), F.lit("en").alias("lang")
    )
    rep = validate(
        d,
        [
            {"rule": "not_null", "column": "n"},
            {"rule": "range", "column": "n", "min": 0, "max": 5},
            {"rule": "accepted_values", "column": "lang", "values": ["en"]},
            {"rule": "expression", "name": "pos", "sql": "id >= 0"},
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1
    assert rep.filter("passed").count() == 3  # range rule fails (6 > 5)


def test_drift_report_between_snapshots(spark, tmp_table_dir):
    from pyspark.sql import functions as F2

    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.expectations import drift_report

    t = LakeTable.create(
        spark, f"{tmp_table_dir}/drift",
        spark.createDataFrame([], "id long, v double").schema,
        primary_key=["id"],
    )
    t.append(spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double"))
    old = t.current_snapshot_id("main")
    # v2 shifts the distribution upward and adds a null + NaN
    t.append(spark.createDataFrame(
        [(100 + i, 10.0 + i) for i in range(10)]
        + [(200, None), (201, float("nan"))],
        "id long, v double",
    ))
    rep = drift_report(t, "v", bins=2, old_snapshot=old).collect()
    by = {r["bucket"]: r for r in rep}
    # shared range [0, 19], width 9.5: old all in bucket 0 (0..9),
    # new has 10 in [0,9.5) plus 10 rows 10..19 -> bucket 1
    assert by[0]["old_count"] == 10 and by[0]["old_frac"] == 1.0
    assert by[0]["new_count"] == 10 and by[1]["new_count"] == 10
    assert by[1]["old_count"] == 0 and by[1]["old_frac"] == 0.0
    assert by[0]["new_frac"] == 0.5 and by[1]["new_frac"] == 0.5
    l1 = sum(abs(r["old_frac"] - r["new_frac"]) for r in rep)
    assert abs(l1 - 1.0) < 1e-9
    assert by[1]["hi_edge"] == 19.0

    # same-version drift is zero
    same = drift_report(t, "v", bins=4, old_snapshot=None).collect()
    assert all(r["old_frac"] == r["new_frac"] for r in same)
