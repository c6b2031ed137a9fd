"""Text flavor of the incremental near-dup index (operators/
dedup_index.py with hasher="simhash-md5"): the same changelog-advanced
banded index, hash pass swapped from image phash to text simhash —
pair-stream parity against the one-shot `simhash_near_dup_pairs` must
hold identically."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.functions.dedup import simhash_near_dup_pairs
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.dedup_index import (
    create_near_dup_index,
    update_near_dup_index,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType()),
        StructField("updated_at", TimestampType()),
    ]
)
TS = datetime.datetime(2026, 1, 1)


def _text(i, grp=None):
    """Group members share an identical word bag (simhash hamming 0);
    distinct seeded 30-word bags sit far apart in 64-bit simhash space."""
    import random

    g = (i % 4) if grp is None else grp
    rng = random.Random(g)
    return " ".join(f"w{rng.randrange(2000)}" for _ in range(30))


def _rows(ids, grp=None, day=0):
    return [
        (i, _text(i, grp), TS + datetime.timedelta(days=day)) for i in ids
    ]


def _pairset(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


def _oneshot(source):
    return _pairset(
        simhash_near_dup_pairs(
            source.scan().select("doc_id", "text"),
            max_hamming=8,
            hasher="md5",
            max_bucket_size=None,
        )
    )


@pytest.fixture()
def source(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir + "/src", SCHEMA, primary_key=["doc_id"]
    )
    t.append(spark.createDataFrame(_rows(range(12)), SCHEMA))
    return t


@pytest.fixture()
def index(source, tmp_table_dir):
    return create_near_dup_index(
        source,
        tmp_table_dir + "/idx",
        "text",
        "doc_id",
        hasher="simhash-md5",
        max_hamming=8,
    )


def test_initial_build_matches_oneshot(source, index):
    res = update_near_dup_index(source, index)
    assert res.mode == "initial" and res.images_upserted == 12
    assert _pairset(res.pairs) == _oneshot(source)
    # 9 radius-complete bands per doc at max_hamming=8
    assert index.scan().count() == 12 * 9
    assert update_near_dup_index(source, index).mode == "noop"


def test_union_across_windows_equals_final_oneshot(spark, source, index):
    from airbyte_spark.operators.posdeletes import delete_where

    emitted = _pairset(update_near_dup_index(source, index).pairs)
    # two docs joining group 2, two founding a brand-new group
    batch = _rows([100, 101], grp=2) + _rows([200, 201], grp=9)
    source.append(spark.createDataFrame(batch, SCHEMA))
    res = update_near_dup_index(source, index)
    assert res.mode == "incremental" and res.images_upserted == 4
    assert all(
        a in (100, 101, 200, 201) or b in (100, 101, 200, 201)
        for a, b, _ in _pairset(res.pairs)
    )
    emitted |= _pairset(res.pairs)
    delete_where(source, "doc_id IN (2, 100)")
    r = update_near_dup_index(source, index)
    assert r.images_removed == 2 and r.pairs is None
    alive = {
        row["doc_id"] for row in source.scan().select("doc_id").collect()
    }
    alive_pairs = {
        (a, b, h) for a, b, h in emitted if a in alive and b in alive
    }
    assert alive_pairs == _oneshot(source)


def test_payload_update_rebinds_the_doc(spark, source, index):
    from airbyte_spark.operators.merge import merge_into

    update_near_dup_index(source, index)
    # doc 0 (group 0) rewritten with group-2 text
    upd = spark.createDataFrame(
        [(0, _text(0, grp=2), TS + datetime.timedelta(days=1))], SCHEMA
    )
    merge_into(source, upd, mode="mor")
    res = update_near_dup_index(source, index)
    assert res.mode == "incremental"
    assert res.images_upserted == 1 and res.images_removed == 0
    assert {p[:2] for p in _pairset(res.pairs)} == {
        (0, i) for i in (2, 6, 10)
    }
