"""Embedding flavor of the incremental near-dup index (operators/
dedup_index.py with hasher="hyperplane"): fixed ±1 sign planes fold the
vector into a 64-bit signature; identical vectors collide at hamming 0
while independent random directions sit near hamming 32, so group
structure maps exactly onto the radius pair set."""

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

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.dedup_index import (
    create_near_dup_index,
    update_near_dup_index,
)

DIM = 16
SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("updated_at", TimestampType()),
    ]
)
TS = datetime.datetime(2026, 1, 1)


def _vec(i, grp=None):
    g = (i % 4) if grp is None else grp
    rng = np.random.default_rng(1000 + g)
    v = rng.standard_normal(DIM)
    return [float(x) for x in (v / np.linalg.norm(v)).astype(np.float32)]


def _rows(ids, grp=None, day=0):
    return [
        (i, _vec(i, grp), TS + datetime.timedelta(days=day)) for i in ids
    ]


def _pairset(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


def _same_group_pairs(ids):
    return {
        (a, b, 0)
        for a in ids
        for b in ids
        if a < b and a % 4 == b % 4
    }


@pytest.fixture()
def source(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir + "/src", SCHEMA, primary_key=["vec_id"]
    )
    t.append(spark.createDataFrame(_rows(range(12)), SCHEMA))
    return t


@pytest.fixture()
def index(source, tmp_table_dir):
    return create_near_dup_index(
        source,
        tmp_table_dir + "/idx",
        "embedding",
        "vec_id",
        hasher="hyperplane",
        max_hamming=8,
        dim=DIM,
    )


def test_initial_build_finds_identical_vector_groups(source, index):
    res = update_near_dup_index(source, index)
    assert res.mode == "initial" and res.images_upserted == 12
    assert _pairset(res.pairs) == _same_group_pairs(set(range(12)))


def test_union_across_windows_equals_final_groups(spark, source, index):
    from airbyte_spark.operators.posdeletes import delete_where

    emitted = _pairset(update_near_dup_index(source, index).pairs)
    source.append(spark.createDataFrame(_rows([100, 101], grp=1), SCHEMA))
    res = update_near_dup_index(source, index)
    assert res.mode == "incremental" and res.images_upserted == 2
    emitted |= _pairset(res.pairs)
    delete_where(source, "vec_id IN (5, 100)")
    r = update_near_dup_index(source, index)
    assert r.images_removed == 2 and r.pairs is None
    alive = {
        row["vec_id"] for row in source.scan().select("vec_id").collect()
    }
    alive_pairs = {
        (a, b, h) for a, b, h in emitted if a in alive and b in alive
    }
    want = {
        (a, b, 0)
        for a in alive
        for b in alive
        if a < b and (a % 4 if a < 100 else 1) == (b % 4 if b < 100 else 1)
    }
    assert alive_pairs == want


def test_hyperplane_requires_dim(source, tmp_table_dir):
    with pytest.raises(ValueError, match="needs dim"):
        create_near_dup_index(
            source, tmp_table_dir + "/x", "embedding", "vec_id",
            hasher="hyperplane",
        )
    with pytest.raises(ValueError, match="needs a ArrayType column"):
        create_near_dup_index(
            source, tmp_table_dir + "/y", "updated_at", "vec_id",
            hasher="hyperplane", dim=DIM,
        )
