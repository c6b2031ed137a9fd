"""Incrementally-maintained ANN top-k index (operators/ann_index.py):
query results over the index must equal the one-shot
lsh_topk_fixed_planes pass with the same plane family over the same
corpus, across initial/append/delete windows."""

import datetime

import numpy as np
import pytest
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.functions.similarity import (
    lsh_topk_fixed_planes,
    signed_planes,
)
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.ann_index import (
    create_ann_index,
    query_ann_index,
    update_ann_index,
)

DIM = 16
PLANES = signed_planes(4, 6, DIM, seed=777)
SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("updated_at", TimestampType()),
    ]
)
TS = datetime.datetime(2026, 1, 1)


def _vec(i):
    rng = np.random.default_rng(4000 + i)
    v = rng.standard_normal(DIM)
    return [float(x) for x in (v / np.linalg.norm(v)).astype(np.float32)]


def _rows(ids, day=0):
    return [(i, _vec(i), TS + datetime.timedelta(days=day)) for i in ids]


def _ranked(df):
    return {(r[0], r[1], r[2]) for r in df.collect()}


def _oneshot(spark, source, query_ids, k):
    corpus = source.scan().select("vec_id", "embedding")
    queries = spark.createDataFrame(
        [(i, _vec(i)) for i in query_ids],
        "query_id long, embedding array<float>",
    )
    return _ranked(
        lsh_topk_fixed_planes(
            corpus, queries, PLANES, k=k,
            id_col="vec_id", vec_col="embedding", query_id_col="query_id",
        )
    )


@pytest.fixture()
def source(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir + "/src", SCHEMA, primary_key=["vec_id"]
    )
    t.append(spark.createDataFrame(_rows(range(30)), SCHEMA))
    return t


@pytest.fixture()
def index(source, tmp_table_dir):
    return create_ann_index(
        source, tmp_table_dir + "/idx", "embedding", "vec_id", dim=DIM
    )


def _query(spark, index, query_ids, k):
    q = spark.createDataFrame(
        [(i, _vec(i)) for i in query_ids],
        "query_id long, embedding array<float>",
    )
    return query_ann_index(index, q, k=k)


def test_initial_build_matches_oneshot(spark, source, index):
    res = update_ann_index(source, index)
    assert res.mode == "initial" and res.vectors_upserted == 30
    assert index.scan().count() == 30 * 4  # one row per LSH table
    got = _ranked(_query(spark, index, [0, 1, 2], k=5))
    assert got == _oneshot(spark, source, [0, 1, 2], k=5)
    assert update_ann_index(source, index).mode == "noop"


def test_incremental_windows_track_the_corpus(spark, source, index):
    from airbyte_spark.operators.merge import merge_into
    from airbyte_spark.operators.posdeletes import delete_where

    update_ann_index(source, index)
    source.append(spark.createDataFrame(_rows(range(30, 40)), SCHEMA))
    res = update_ann_index(source, index)
    assert res.mode == "incremental" and res.vectors_upserted == 10
    delete_where(source, "vec_id IN (1, 7, 33)")
    res = update_ann_index(source, index)
    assert res.vectors_removed == 3
    # vector update rebinds: vec 2 becomes vec_id 99's direction
    upd = spark.createDataFrame(
        [(2, _vec(99), TS + datetime.timedelta(days=2))], SCHEMA
    )
    merge_into(source, upd, mode="mor")
    res = update_ann_index(source, index)
    assert res.vectors_upserted == 1 and res.vectors_removed == 0

    got = _ranked(_query(spark, index, [0, 5, 35], k=7))
    want = _oneshot(spark, source, [0, 5, 35], k=7)
    assert got == want
    assert not any(v in (1, 7, 33) for _, v, _ in got)


def test_crashed_initial_build_replays_without_duplicates(spark, source, index):
    """A crash between the initial append and the watermark stamp (the
    maintenance loop is at-least-once) must not double the index: the
    retry rebuilds via an idempotent merge, and ids that left the source
    in the gap are tombstoned."""
    from airbyte_spark.operators.ann_index import WATERMARK_PROP
    from airbyte_spark.operators.posdeletes import delete_where

    update_ann_index(source, index)
    index.set_properties({WATERMARK_PROP: None})  # simulate the crash
    delete_where(source, "vec_id = 3")  # source moved before the retry
    res = update_ann_index(source, index)
    assert res.mode == "rebuild" and res.vectors_upserted == 29
    assert index.scan().count() == 29 * 4  # no duplicated (id, tbl) rows
    got = _ranked(_query(spark, index, [0, 1, 2], k=5))
    assert got == _oneshot(spark, source, [0, 1, 2], k=5)
    assert not any(v == 3 for _, v, _ in got)
    assert update_ann_index(source, index).mode == "noop"


def test_validation(source, tmp_table_dir):
    with pytest.raises(ValueError, match="unknown id column"):
        create_ann_index(
            source, tmp_table_dir + "/x", "embedding", "nope", dim=DIM
        )
    with pytest.raises(ValueError, match="must be an array column"):
        create_ann_index(
            source, tmp_table_dir + "/y", "updated_at", "vec_id", dim=DIM
        )
    with pytest.raises(ValueError, match="not an ANN index"):
        update_ann_index(source, source)
