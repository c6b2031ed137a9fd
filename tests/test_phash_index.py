"""Incrementally-maintained phash near-dup index (operators/
dedup_index.py): the union of pairs emitted across updates must equal a
from-scratch one-shot pass over the final state (for alive endpoints),
the index must track payload updates/removals, and probes must touch
only the batch's hash buckets."""

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.codecs import encode_image
from airbyte_spark.functions.images import phash_near_dup_pairs
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.dedup_index import (
    create_phash_index,
    update_phash_index,
)

SCHEMA = StructType(
    [
        StructField("image_id", LongType(), False),
        StructField("bytes", BinaryType()),
        StructField("updated_at", TimestampType()),
    ]
)
TS = datetime.datetime(2026, 1, 1)


def _waves():
    yy, xx = np.mgrid[0:64, 0:64]
    return [
        (xx // 32) % 2,
        (yy // 32) % 2,
        ((xx + yy) // 32) % 2,
        ((xx // 16) + (yy // 16)) % 2,
    ]


WAVES = _waves()


def _png(i, grp=None):
    """Deterministic image: pattern = group, power-of-2 contrast variant
    per id (phash-exact within a group, groups >= 10 hamming apart —
    same construction the dedup_phash oracle fixture pins)."""
    g = (i % 4) if grp is None else grp
    v = ((32 << (i % 3)) * WAVES[g]).astype(np.uint8)
    return encode_image(np.stack([v] * 3, -1), "png")


def _rows(ids, grp=None, day=0):
    return [
        (i, _png(i, grp), TS + datetime.timedelta(days=day)) for i in ids
    ]


def _pairset(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


def _oneshot(source):
    return _pairset(
        phash_near_dup_pairs(
            source.scan().select("image_id", "bytes"),
            max_hamming=4,
            max_bucket_size=None,
        )
    )


@pytest.fixture()
def source(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir + "/src", SCHEMA, primary_key=["image_id"]
    )
    t.append(spark.createDataFrame(_rows(range(12)), SCHEMA))
    return t


@pytest.fixture()
def index(source, tmp_table_dir):
    return create_phash_index(source, tmp_table_dir + "/idx", max_hamming=4)


def test_initial_build_matches_oneshot(source, index):
    res = update_phash_index(source, index)
    assert res.mode == "initial" and res.images_upserted == 12
    assert _pairset(res.pairs) == _oneshot(source)
    # 5 radius-complete bands per image at max_hamming=4
    assert index.scan().count() == 12 * 5
    assert update_phash_index(source, index).mode == "noop"


def test_crashed_initial_build_replays_without_duplicates(spark, source, index):
    """Retrying the initial build against a non-empty index (crash
    between append and the watermark stamp) must rebuild idempotently —
    no duplicated (id, band) rows, stale ids tombstoned."""
    from airbyte_spark.operators.dedup_index import WATERMARK_PROP
    from airbyte_spark.operators.posdeletes import delete_where

    update_phash_index(source, index)
    index.set_properties({WATERMARK_PROP: None})  # simulate the crash
    delete_where(source, "image_id = 2")  # source moved before the retry
    res = update_phash_index(source, index)
    assert res.mode == "rebuild" and res.images_upserted == 11
    assert index.scan().count() == 11 * 5
    assert _pairset(res.pairs) == _oneshot(source)
    assert update_phash_index(source, index).mode == "noop"


def test_incremental_batch_emits_exactly_the_new_pairs(spark, source, index):
    first = update_phash_index(source, index)
    before = _pairset(first.pairs)
    # two images joining group 1, two founding a brand-new group
    batch = _rows([100, 101], grp=1) + _rows([200, 201], grp=3, day=0)
    source.append(spark.createDataFrame(batch, SCHEMA))
    res = update_phash_index(source, index)
    assert res.mode == "incremental" and res.images_upserted == 4
    emitted = _pairset(res.pairs)
    assert before | emitted == _oneshot(source)
    # every emitted pair touches the batch
    assert all(
        a in (100, 101, 200, 201) or b in (100, 101, 200, 201)
        for a, b, _ in emitted
    )
    # bucket pruning: the probe opened only the batch's hash buckets
    assert 0 < res.probed_files <= res.total_files


def test_payload_update_rebinds_the_image(spark, source, index):
    from airbyte_spark.operators.merge import merge_into

    update_phash_index(source, index)
    # image 0 (group 0) re-encoded as a group-2 picture
    upd = spark.createDataFrame(
        [(0, _png(0, grp=2), TS + datetime.timedelta(days=1))], SCHEMA
    )
    merge_into(source, upd, mode="mor")
    res = update_phash_index(source, index)
    assert res.mode == "incremental"
    assert res.images_upserted == 1 and res.images_removed == 0
    # the probe reports image 0's NEW neighbors (group 2 members)
    assert {p[:2] for p in _pairset(res.pairs)} == {
        (0, i) for i in (2, 6, 10)
    }
    # index state parity: stored hashes == hashes of the final payloads
    stored = {
        (r["image_id"], r["phash"])
        for r in index.scan().select("image_id", "phash").distinct().collect()
    }
    from airbyte_spark.functions.images import phash_udf

    truth = {
        (r["image_id"], r["_ph"])
        for r in source.scan()
        .select("image_id", phash_udf(F.col("bytes")).alias("_ph"))
        .collect()
    }
    assert stored == truth


def test_removal_tombstones_and_future_probes_exclude(spark, source, index):
    from airbyte_spark.operators.posdeletes import delete_where

    update_phash_index(source, index)
    delete_where(source, "image_id IN (1, 5, 9)")  # all of group 1
    res = update_phash_index(source, index)
    assert res.mode == "incremental"
    assert res.images_removed == 3 and res.images_upserted == 0
    assert res.pairs is None  # nothing upserted -> nothing to probe
    ids = {r["image_id"] for r in index.scan().select("image_id").collect()}
    assert ids == set(range(12)) - {1, 5, 9}
    # a later batch joining group 1 pairs only with... nothing alive
    source.append(spark.createDataFrame(_rows([300], grp=1), SCHEMA))
    res2 = update_phash_index(source, index)
    assert _pairset(res2.pairs) == set()


def test_union_across_windows_equals_final_oneshot(spark, source, index):
    from airbyte_spark.operators.posdeletes import delete_where

    emitted = _pairset(update_phash_index(source, index).pairs)
    source.append(spark.createDataFrame(_rows([50, 51], grp=0), SCHEMA))
    emitted |= _pairset(update_phash_index(source, index).pairs)
    delete_where(source, "image_id IN (4, 50)")
    r = update_phash_index(source, index)
    assert r.pairs is None
    alive = {
        row["image_id"] for row in source.scan().select("image_id").collect()
    }
    alive_pairs = {
        (a, b, h) for a, b, h in emitted if a in alive and b in alive
    }
    assert alive_pairs == _oneshot(source)


def test_index_table_is_ordinary_compaction_preserves_probes(
    spark, source, index
):
    """The module docstring's 'the index table is ordinary' claim:
    after several MoR update windows scatter per-bucket files and
    tombstones, compact() folds them and probes answer identically."""
    from airbyte_spark.operators.compact import compact
    from airbyte_spark.operators.dedup_index import probe_index
    from airbyte_spark.operators.posdeletes import delete_where

    update_phash_index(source, index)
    source.append(spark.createDataFrame(_rows([100, 101], grp=1), SCHEMA))
    update_phash_index(source, index)
    delete_where(source, "image_id = 5")
    update_phash_index(source, index)
    batch = spark.createDataFrame(_rows([300], grp=1), SCHEMA)
    before = _pairset(probe_index(index, batch.select("image_id", "bytes")))
    files_before = len(index.data_files())
    res = compact(index, target_file_bytes=1 << 20)
    assert res.rewritten_bytes > 0
    assert len(index.data_files()) < files_before
    after = _pairset(probe_index(index, batch.select("image_id", "bytes")))
    assert after == before == {(1, 300, 0), (9, 300, 0), (100, 300, 0), (101, 300, 0)}


def test_probe_is_read_only_ingest_gate(spark, source, index):
    from airbyte_spark.operators.dedup_index import probe_index

    update_phash_index(source, index)
    wm_before = index.properties["phash-index.source-snapshot-watermark"]
    # candidate batch: one dup each of groups 1 and 3
    batch = spark.createDataFrame(
        _rows([100], grp=1) + _rows([200], grp=3), SCHEMA
    )
    pairs = _pairset(probe_index(index, batch.select("image_id", "bytes")))
    assert {p[:2] for p in pairs} == {(i, 100) for i in (1, 5, 9)} | {
        (i, 200) for i in (3, 7, 11)
    }
    # read-only: watermark and index rows untouched
    assert (
        index.properties["phash-index.source-snapshot-watermark"] == wm_before
    )
    assert index.scan().count() == 12 * 5


def test_validation(source, tmp_table_dir):
    from airbyte_spark.operators.dedup_index import create_near_dup_index

    with pytest.raises(ValueError, match="unknown id column"):
        create_phash_index(source, tmp_table_dir + "/x", id_col="nope")
    with pytest.raises(ValueError, match="not a near-dup index"):
        update_phash_index(source, source)
    with pytest.raises(ValueError, match="unknown hasher"):
        create_near_dup_index(
            source, tmp_table_dir + "/y", "bytes", "image_id", hasher="crc32"
        )
    # type mismatch: simhash wants a string column, bytes is binary
    with pytest.raises(ValueError, match="needs a StringType column"):
        create_near_dup_index(
            source, tmp_table_dir + "/z", "bytes", "image_id",
            hasher="simhash-md5",
        )
