"""S4 CDC log scan: Debezium envelope -> bounded merge source -> MERGE
(CdcPartitionsCreator.kt bounded-window + warm-start semantics)."""

import json
import os

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import merge_into
from airbyte_spark.sources.cdc import cdc_upper_bound, read_cdc_log

VALUE = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType()),
        StructField("v", IntegerType()),
    ]
)


def _write_log(path, events):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "shard-0.jsonl"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


EVENTS = [
    {"op": "c", "lsn": 1, "ts_ms": 1000, "before": None,
     "after": {"id": "a", "name": "a-v1", "v": 1}},
    {"op": "c", "lsn": 2, "ts_ms": 2000, "before": None,
     "after": {"id": "b", "name": "b-v1", "v": 1}},
    {"op": "u", "lsn": 3, "ts_ms": 3000,
     "before": {"id": "a", "name": "a-v1", "v": 1},
     "after": {"id": "a", "name": "a-v2", "v": 2}},
    {"op": "d", "lsn": 4, "ts_ms": 4000,
     "before": {"id": "b", "name": "b-v1", "v": 1}, "after": None},
    {"op": "c", "lsn": 5, "ts_ms": 5000, "before": None,
     "after": {"id": "c", "name": "c-v1", "v": 1}},
]


def test_cdc_envelope_to_merge_source(spark, tmp_table_dir):
    log = os.path.join(tmp_table_dir, "wal")
    _write_log(log, EVENTS)
    src = read_cdc_log(spark, log, VALUE)
    rows = {(r["id"], r["_ab_cdc_lsn"]): r for r in src.collect()}
    assert rows[("a", 3)]["name"] == "a-v2"
    # delete carries the BEFORE image + tombstone timestamp
    assert rows[("b", 4)]["_ab_cdc_deleted_at"] is not None
    assert rows[("b", 4)]["name"] == "b-v1"
    assert rows[("a", 1)]["_ab_cdc_deleted_at"] is None


def test_cdc_bounded_window_and_upper_pin(spark, tmp_table_dir):
    log = os.path.join(tmp_table_dir, "wal")
    _write_log(log, EVENTS)
    assert cdc_upper_bound(spark, log) == 5
    # warm start from position 2, pinned upper 4 -> exactly lsn 3 and 4
    got = sorted(
        r["_ab_cdc_lsn"]
        for r in read_cdc_log(
            spark, log, VALUE, lower_bound=2, upper_bound=4
        ).collect()
    )
    assert got == [3, 4]


def test_cdc_end_to_end_merge(spark, tmp_table_dir):
    """Full S4 path: log -> bounded scan -> MERGE with lsn cursor; a second
    sync resumes from the previous upper bound (no reprocessing) and lands
    only the new tail."""
    log = os.path.join(tmp_table_dir, "wal")
    _write_log(log, EVENTS)
    table_schema = StructType(
        list(VALUE.fields)
        + [
            StructField("_ab_cdc_lsn", LongType()),
            StructField("_airbyte_extracted_at", TimestampType()),
        ]
    )
    t = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "tbl"), table_schema, primary_key=["id"]
    )
    upper1 = cdc_upper_bound(spark, log)
    src = read_cdc_log(spark, log, VALUE, upper_bound=upper1)
    merge_into(t, src, cursor_col="_ab_cdc_lsn")
    state = {r["id"]: (r["name"], r["v"]) for r in t.scan().collect()}
    assert state == {"a": ("a-v2", 2), "c": ("c-v1", 1)}  # b deleted
    # tail arrives: resurrect b, bump a
    _write_log(
        os.path.join(tmp_table_dir, "wal2"),
        EVENTS
        + [
            {"op": "c", "lsn": 6, "ts_ms": 6000, "before": None,
             "after": {"id": "b", "name": "b-v2", "v": 9}},
            {"op": "u", "lsn": 7, "ts_ms": 7000,
             "before": {"id": "a", "name": "a-v2", "v": 2},
             "after": {"id": "a", "name": "a-v3", "v": 3}},
        ],
    )
    log2 = os.path.join(tmp_table_dir, "wal2")
    src2 = read_cdc_log(spark, log2, VALUE, lower_bound=upper1)
    assert src2.count() == 2  # warm start skips everything already synced
    merge_into(t, src2, cursor_col="_ab_cdc_lsn")
    state = {r["id"]: (r["name"], r["v"]) for r in t.scan().collect()}
    assert state == {"a": ("a-v3", 3), "b": ("b-v2", 9), "c": ("c-v1", 1)}
