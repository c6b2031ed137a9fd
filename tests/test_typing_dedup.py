"""Destinations-V2 typing & deduping (operators/typing_dedup.py): raw
JSON tier → typed+deduped final tier, watermark-incremental."""

import json

import pytest
from pyspark.sql import functions as F

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.typing_dedup import (
    RAW_SCHEMA,
    TD_WATERMARK_PROP,
    create_raw_table,
    final_table_schema,
    reset_typing,
    type_and_dedup,
)

DECLARED = {"rid": "integer", "name": "string", "score": "number"}


def _raw_rows(spark, rows, gen=0):
    """rows: list of (raw_id, data-dict, extracted_at_day)"""
    import datetime as dt

    data = [
        (
            rid,
            json.dumps(d),
            dt.datetime(2026, 1, 1 + day),
            gen,
        )
        for rid, d, day in rows
    ]
    return spark.createDataFrame(data, RAW_SCHEMA)


@pytest.fixture()
def tiers(spark, tmp_table_dir):
    import tempfile

    raw = create_raw_table(spark, tmp_table_dir)
    final = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="final-"),
        final_table_schema(DECLARED),
        primary_key=["rid"],
    )
    return raw, final


def test_types_dedups_and_captures_errors(spark, tiers):
    raw, final = tiers
    raw.append(
        _raw_rows(
            spark,
            [
                ("r1", {"rid": "1", "name": "a", "score": "1.5"}, 0),
                ("r2", {"rid": "2", "name": "b", "score": "oops"}, 0),
                # same PK twice in one batch: later extraction wins (W1)
                ("r3", {"rid": "3", "name": "stale", "score": "0"}, 0),
                ("r4", {"rid": "3", "name": "fresh", "score": "9"}, 1),
            ],
        )
    )
    res = type_and_dedup(raw, final, DECLARED)
    assert res.raw_rows == 4 and not res.noop
    got = {r["rid"]: r for r in final.scan().collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["score"] == 1.5 and got[1]["name"] == "a"
    # uncastable value -> typed NULL + a NULLED change entry
    assert got[2]["score"] is None
    changes = got[2]["_airbyte_meta"]["changes"]
    assert any(c["field"] == "score" for c in changes)
    assert got[3]["name"] == "fresh" and got[3]["score"] == 9.0


def test_watermark_makes_passes_incremental(spark, tiers):
    raw, final = tiers
    raw.append(_raw_rows(spark, [("r1", {"rid": "1", "name": "x", "score": "1"}, 0)]))
    r1 = type_and_dedup(raw, final, DECLARED)
    assert r1.raw_rows == 1
    # no new raw commits: metadata-only no-op, no merge
    r2 = type_and_dedup(raw, final, DECLARED)
    assert r2.noop and r2.merge is None
    # a later commit types ONLY its own rows (watermark slice)
    raw.append(_raw_rows(spark, [("r2", {"rid": "2", "name": "y", "score": "2"}, 0)]))
    r3 = type_and_dedup(raw, final, DECLARED)
    assert r3.raw_rows == 1
    assert final.scan().count() == 2
    # watermark recorded on the final table
    assert final.properties[TD_WATERMARK_PROP] == raw.current_snapshot_id()


def test_late_arriving_old_timestamp_still_types(spark, tiers):
    """Commit-based watermark: a record whose extracted_at is OLDER than
    anything already typed still lands, because slice membership is by
    commit, not timestamp (the redesign's correctness argument)."""
    raw, final = tiers
    raw.append(_raw_rows(spark, [("r1", {"rid": "1", "name": "n", "score": "5"}, 5)]))
    type_and_dedup(raw, final, DECLARED)
    raw.append(_raw_rows(spark, [("r0", {"rid": "10", "name": "late", "score": "0"}, 0)]))
    res = type_and_dedup(raw, final, DECLARED)
    assert res.raw_rows == 1
    assert {r["rid"] for r in final.scan().collect()} == {1, 10}


def test_reset_retypes_everything_idempotently(spark, tiers):
    raw, final = tiers
    raw.append(_raw_rows(spark, [("r1", {"rid": "1", "name": "a", "score": "1"}, 0)]))
    type_and_dedup(raw, final, DECLARED)
    reset_typing(final)
    res = type_and_dedup(raw, final, DECLARED)
    assert res.raw_rows == 1  # full re-type
    # merge idempotency: still exactly one typed row
    assert final.scan().count() == 1


def test_generation_filter_drops_pre_truncate_rows(spark, tiers):
    raw, final = tiers
    raw.append(_raw_rows(spark, [("r1", {"rid": "1", "name": "old", "score": "1"}, 0)], gen=0))
    raw.append(_raw_rows(spark, [("r2", {"rid": "2", "name": "new", "score": "2"}, 0)], gen=1))
    res = type_and_dedup(raw, final, DECLARED, min_generation_id=1)
    assert res.raw_rows == 1
    assert {r["rid"] for r in final.scan().collect()} == {2}


def test_declared_cursor_beats_extraction_order(spark, tiers):
    """With a declared cursor, the cursor decides the winner even when
    the losing record was extracted later (T6 late data)."""
    raw, final = tiers
    declared = dict(DECLARED)
    raw.append(
        _raw_rows(
            spark,
            [
                ("r1", {"rid": "1", "name": "cursor9", "score": "9"}, 0),
                ("r2", {"rid": "1", "name": "cursor3", "score": "3"}, 2),
            ],
        )
    )
    type_and_dedup(raw, final, declared, cursor="score")
    got = final.scan().collect()
    assert len(got) == 1 and got[0]["name"] == "cursor9"
