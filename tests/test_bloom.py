"""Per-file PK bloom sidecars (lake/bloom.py) — tight file pruning for
merges and delete-hit victim tests on clustered tables whose files all
span the full PK range (range pruning degenerates to "all files" there).

Role model: Iceberg's `write.parquet.bloom-filter-enabled.column.*`
(parquet column bloom pages); here the filter is a sidecar because
pyarrow in this environment can't read parquet bloom pages. Safety
invariant tested throughout: false negatives are IMPOSSIBLE (a dropped
file can never contain a batch key), false positives only cost a
redundant read.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images
from airbyte_spark.lake import bloom as bl
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators import merge as merge_mod
from airbyte_spark.operators.cluster import delete_may_hit
from airbyte_spark.operators.merge import _candidate_entries, merge_into


# ------------------------------------------------------------------
# pure-numpy unit layer
# ------------------------------------------------------------------


def test_bitmap_has_no_false_negatives():
    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    m = bl.bloom_bits(len(hashes))
    bm = bl.build_bitmap(hashes, m)
    assert bl.hits_mask(bm, hashes, bl.DEFAULT_K).all()


def test_false_positive_rate_near_design_point():
    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**64, size=20_000, dtype=np.uint64)
    probes = rng.integers(0, 2**64, size=20_000, dtype=np.uint64)
    probes = np.setdiff1d(probes, members)
    m = bl.bloom_bits(len(members))  # 18 bits/key
    k = bl.optimal_k(bl.DEFAULT_BITS_PER_KEY)  # derived probe count
    bm = bl.build_bitmap(members, m, k)
    fpr = bl.hits_mask(bm, probes, k).mean()
    # design point ~5e-4 per key: sized so a multi-key batch probe
    # (file falsely kept with prob ~batch_keys*FPR) still prunes
    assert fpr < 0.005, f"FPR {fpr:.5f} far above the ~5e-4 design point"


def test_sidecar_roundtrip(tmp_path):
    data = str(tmp_path / "f.parquet")
    bm = np.arange(256, dtype=np.uint8)
    side = bl.write_bitmap_sidecar(data, bm)
    assert side == data + bl.BLOOM_SUFFIX
    assert np.array_equal(bl.read_bitmap_sidecar(side), bm)
    hs = np.array([1, -5, 2**63 - 1], dtype=np.int64)
    hside = bl.write_hashes_sidecar(data, hs)
    assert np.array_equal(
        bl.read_hashes_sidecar(hside), hs.view(np.uint64)
    )


def test_tiny_file_gets_floor_sized_bitmap():
    assert bl.bloom_bits(1) == 1024
    assert bl.bloom_bits(0) == 1024
    # byte-aligned above the floor
    assert bl.bloom_bits(1000) % 8 == 0


# ------------------------------------------------------------------
# write-path integration
# ------------------------------------------------------------------

TARGET = 1024 * 1024


def _table(spark, root, n=60, props=None):
    t = LakeTable.create(
        spark,
        root,
        IMAGES_SCHEMA,
        primary_key=["image_id"],
        properties={"write.target-file-size-bytes": TARGET, **(props or {})},
    )
    t.append(generate_images(spark, n, num_partitions=2))
    return t


def test_append_attaches_bloom_metadata_and_sidecars(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    entries = t.data_files()
    assert entries
    for e in entries:
        assert e.bloom is not None, e.path
        assert e.bloom["col"] == "image_id"
        assert e.bloom.get("kind") is None
        assert e.bloom["m"] >= 1024
        assert e.bloom["k"] == bl.optimal_k(bl.DEFAULT_BITS_PER_KEY)
        assert os.path.exists(e.path + bl.BLOOM_SUFFIX)
    # survives a manifest reload from disk (JSON round-trip)
    t2 = LakeTable(spark, tmp_table_dir)
    assert all(e.bloom for e in t2.data_files())


def test_bloom_disabled_by_property(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, props={"write.pk-bloom.enabled": "false"})
    for e in t.data_files():
        assert e.bloom is None
        assert not os.path.exists(e.path + bl.BLOOM_SUFFIX)


def test_delete_files_carry_key_hash_sidecars(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    keys = t.scan().select("image_id").limit(5)
    entries = t.write_delete_files(keys)
    assert entries
    for e in entries:
        assert e.bloom and e.bloom["kind"] == "hashes"
        assert e.bloom["col"] == "image_id"
        side = e.path + bl.HASHES_SUFFIX
        assert os.path.exists(side)
        assert bl.read_hashes_sidecar(side).size == e.bloom["n"]


def test_sidecar_hashes_match_spark_xxhash64(spark, tmp_table_dir):
    """The hash contract: sidecar bitmaps are built from Spark's
    xxhash64(pk) — probing with Spark-computed hashes of the SAME keys
    must hit every time (zero false negatives end-to-end)."""
    t = _table(spark, tmp_table_dir)
    for e in t.data_files():
        hs = np.array(
            [
                r["h"]
                for r in spark.read.parquet(e.path)
                .select(F.xxhash64("image_id").alias("h"))
                .collect()
            ],
            dtype=np.int64,
        ).view(np.uint64)
        bm = bl.read_bitmap_sidecar(e.path + bl.BLOOM_SUFFIX)
        assert bl.hits_mask(bm, hs, int(e.bloom["k"])).all()


# ------------------------------------------------------------------
# merge candidate pruning (range stage blind, bloom stage prunes)
# ------------------------------------------------------------------


def _id_num(col="image_id"):
    return F.substring(col, 5, 12).cast("long")  # "img-%012d" suffix


def _ids(*nums):
    return [f"img-{n:012d}" for n in nums]


def _interleaved_table(spark, root, props=None):
    """Two files with fully OVERLAPPING PK ranges: evens in one, odds in
    the other. Range pruning keeps both for any key; only membership can
    tell them apart — the clustered-table shape in miniature."""
    t = LakeTable.create(
        spark,
        root,
        IMAGES_SCHEMA,
        primary_key=["image_id"],
        properties={"write.target-file-size-bytes": TARGET, **(props or {})},
    )
    imgs = generate_images(spark, 80, num_partitions=1).persist()
    t.append(imgs.filter(_id_num() % 2 == 0).repartition(1))
    t.append(imgs.filter(_id_num() % 2 == 1).repartition(1))
    imgs.unpersist()
    return t


def _file_for(t, spark, pred):
    for e in t.data_files():
        if spark.read.parquet(e.path).filter(pred).count() > 0:
            return e
    raise AssertionError("no file matched")


def test_bloom_prunes_range_overlapping_file(spark, tmp_table_dir):
    t = _interleaved_table(spark, tmp_table_dir)
    entries = t.data_files()
    assert len(entries) == 2
    even = _file_for(t, spark, _id_num() % 2 == 0)
    src_keys = spark.createDataFrame(
        [(i,) for i in _ids(4, 10, 22)], "image_id string"
    )
    cands = _candidate_entries(t, src_keys, entries, "image_id")
    paths = {e.path for e in cands}
    assert even.path in paths  # never a false negative
    assert paths == {even.path}  # odd file bloom-pruned despite range hit


def test_bloom_prune_skipped_when_disabled(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, props={"write.pk-bloom.enabled": "false"})
    entries = t.data_files()
    src_keys = t.scan().select("image_id").limit(3)
    cands = _candidate_entries(t, src_keys, entries, "image_id")
    # no blooms -> pruning falls back to range-only; keys exist, so the
    # owning files survive
    assert cands


def test_bloom_prune_respects_probe_key_cap(spark, tmp_table_dir):
    t = _interleaved_table(
        spark, tmp_table_dir, props={"merge.bloom.max-probe-keys": "2"}
    )
    entries = t.data_files()
    src_keys = spark.createDataFrame(
        [(i,) for i in _ids(4, 10, 22)], "image_id string"
    )
    cands = _candidate_entries(t, src_keys, entries, "image_id")
    # over the cap: reverts to range pruning alone -> both files kept
    assert {e.path for e in cands} == {e.path for e in entries}


def test_distributed_probe_matches_driver_probe(spark, tmp_table_dir, monkeypatch):
    t = _interleaved_table(spark, tmp_table_dir)
    entries = t.data_files()
    src_keys = spark.createDataFrame(
        [(i,) for i in _ids(4, 10, 22)], "image_id string"
    )
    driver = {e.path for e in _candidate_entries(t, src_keys, entries, "image_id")}
    monkeypatch.setattr(merge_mod, "BLOOM_PROBE_DISTRIBUTED_THRESHOLD", 0)
    dist = {e.path for e in _candidate_entries(t, src_keys, entries, "image_id")}
    assert dist == driver


def test_merge_correct_with_interleaved_files(spark, tmp_table_dir):
    """End-to-end: a merge whose candidate set was bloom-pruned still
    produces exactly the upserted table (the pruned file's rows are
    untouched and intact)."""
    t = _interleaved_table(spark, tmp_table_dir)
    before = {
        r["image_id"]: r["caption"]
        for r in t.scan().select("image_id", "caption").collect()
    }
    src = (
        t.scan()
        .filter(F.col("image_id").isin(_ids(4, 10, 22)))
        .withColumn("caption", F.concat(F.col("caption"), F.lit("-v2")))
    )
    merge_into(t, src, cursor_col=None, mode="cow")
    after = {
        r["image_id"]: r["caption"]
        for r in t.scan().select("image_id", "caption").collect()
    }
    assert set(after) == set(before)
    changed = set(_ids(4, 10, 22))
    for k, v in after.items():
        if k in changed:
            assert v == before[k] + "-v2"
        else:
            assert v == before[k]


# ------------------------------------------------------------------
# delete-hit refinement (cluster victim test + dead-delete retirement)
# ------------------------------------------------------------------


def test_delete_may_hit_refined_by_bloom(spark, tmp_table_dir):
    t = _interleaved_table(spark, tmp_table_dir)
    even = _file_for(t, spark, _id_num() % 2 == 0)
    odd = _file_for(t, spark, _id_num() % 2 == 1)
    dels = t.write_delete_files(
        spark.createDataFrame([(i,) for i in _ids(4, 10)], "image_id string")
    )
    assert len(dels) == 1
    d = dels[0]
    d.sequence = max(e.sequence or 0 for e in (even, odd)) + 1
    schema = t.schema()
    cache: dict = {}
    # ranges overlap BOTH files; bloom membership separates them
    assert delete_may_hit(even, d, ["image_id"], schema, cache=cache)
    assert not delete_may_hit(odd, d, ["image_id"], schema, cache=cache)
    # sequence gate still wins over membership
    d.sequence = 0
    assert not delete_may_hit(even, d, ["image_id"], schema, cache=cache)


def test_delete_may_hit_conservative_without_sidecars(spark, tmp_table_dir):
    t = _interleaved_table(spark, tmp_table_dir)
    odd = _file_for(t, spark, _id_num() % 2 == 1)
    dels = t.write_delete_files(
        spark.createDataFrame([(i,) for i in _ids(4, 10)], "image_id string")
    )
    d = dels[0]
    d.sequence = (odd.sequence or 0) + 1
    # strip the membership metadata -> must fall back to range (True)
    d2 = type(d).from_json({**d.to_json(), "bloom": None})
    assert delete_may_hit(odd, d2, ["image_id"], t.schema())
    # type mismatch (PK evolution) -> conservative too
    d3 = type(d).from_json(
        {**d.to_json(), "bloom": {**d.bloom, "type": "bigint"}}
    )
    assert delete_may_hit(odd, d3, ["image_id"], t.schema())


# ------------------------------------------------------------------
# lifecycle: sidecars die with their data file
# ------------------------------------------------------------------


def test_gc_removes_bloom_sidecars(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    old = t.data_files()
    for e in old:
        assert os.path.exists(e.path + bl.BLOOM_SUFFIX)
    # rewrite everything (CoW) so old files become orphanable
    fresh = t.write_dataframe(generate_images(spark, 30, num_partitions=1))
    t.commit("rewrite", fresh, remove_paths={e.path for e in old})
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files()
    for e in old:
        assert not os.path.exists(e.path), "old data file should be GC'd"
        assert not os.path.exists(
            e.path + bl.BLOOM_SUFFIX
        ), "sidecar must die with its data file"
