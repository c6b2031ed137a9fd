"""Compaction + clustering rewrites over the synthetic images table.

Compaction analog: rolling-writer target size + external-compaction note
(IcebergTableWriterFactory.kt:77-82, docs/integrations/destinations/
s3-data-lake.md:359-369). Clustering analog: table PK sort order
(IcebergUtil.kt:185-189) extended to space-filling curves."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.cluster import cluster
from airbyte_spark.operators.compact import compact


@pytest.fixture()
def small_file_table(spark, tmp_table_dir):
    """A table with a long tail of small files: 8 tiny commits
    (FIXTURES.md F1 'file-size skew' fixture)."""
    t = LakeTable.create(
        spark,
        tmp_table_dir,
        IMAGES_SCHEMA,
        primary_key=["image_id"],
        properties={"write.target-file-size-bytes": 4 * 1024 * 1024},
    )
    for i in range(8):
        df = generate_images(spark, 50, id_offset=i * 50, num_partitions=2)
        t.append(df)
    return t


def test_compact_reduces_file_count_preserves_rows(spark, small_file_table):
    t = small_file_table
    before_files = t.data_files()
    chk = [
        F.expr("bit_xor(xxhash64(image_id, caption))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ]
    before = t.scan().select(*chk).first()
    res = compact(t)
    assert res.snapshot is not None
    after_files = t.data_files()
    assert len(after_files) < len(before_files)
    after = t.scan().select(*chk).first()
    assert (before["n"], before["h"]) == (after["n"], after["h"])
    # every packed bin respects the target capacity
    for b in res.plan.bins:
        assert b.bytes <= 4 * 1024 * 1024


def test_compact_is_noop_on_packed_table(spark, small_file_table):
    t = small_file_table
    compact(t)
    files_once = {e.path for e in t.data_files()}
    res2 = compact(t)
    assert res2.snapshot is None  # nothing to do
    assert {e.path for e in t.data_files()} == files_once


def test_compact_snapshot_isolation(spark, small_file_table):
    """A scan pinned before compaction returns identical rows after it
    (reader on main sees old data until swap — s3-data-lake.md:346-357)."""
    t = small_file_table
    pre_snap = t.current_snapshot_id()
    pre_rows = t.scan().count()
    compact(t)
    assert t.scan(snapshot_id=pre_snap).count() == pre_rows


@pytest.mark.parametrize("curve", ["zorder", "hilbert"])
def test_cluster_orders_files_by_key(spark, small_file_table, curve):
    t = small_file_table
    total = t.scan().count()
    res = cluster(t, dims=["phash", "w", "h"], curve=curve,
                  target_file_bytes=2 * 1024 * 1024)
    assert res.snapshot.operation == "cluster"
    assert t.scan().count() == total
    # per-file stats on clustered dims must be tight & files ~disjoint in
    # key space: check phash ranges overlap less than pre-cluster
    entries = t.data_files()
    assert len(entries) >= 2
    spans = sorted(
        (e.stats["phash"]["min"], e.stats["phash"]["max"]) for e in entries
    )


def test_cluster_improves_pruning(spark, tmp_table_dir):
    """After clustering on (phash,w,h), a w-range scan prunes files via
    manifest stats — the point of clustering."""
    t = LakeTable.create(
        spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"]
    )
    t.append(generate_images(spark, 400, num_partitions=8))
    cluster(t, dims=["w", "h", "phash"], curve="zorder",
            target_file_bytes=512 * 1024)
    entries = t.data_files()
    n_files = len(entries)
    # files whose w-range is exactly [32,32] exist after clustering on w
    w32 = [e for e in entries if e.stats["w"]["max"] == 32]
    pruned = [
        e for e in entries
        if not (e.stats["w"]["max"] < 128 or e.stats["w"]["min"] > 128)
    ]
    assert n_files >= 3
    assert len(pruned) < n_files, "manifest stats must prune some files"
    # scan with key_range uses the same pruning
    df = t.scan(key_range=("w", 128, 128))
    assert df.count() == t.scan().filter("w = 128").count()


def test_cluster_roundtrip_pixels_survive(spark, small_file_table):
    """Maintenance must not corrupt payloads: decode a sample and compare
    caption/bytes checksums pre/post cluster (PSNR gate is exercised in
    test_images_pipeline)."""
    t = small_file_table
    pre = {
        r["image_id"]: (r["caption"], len(r["bytes"]))
        for r in t.scan().select("image_id", "caption", "bytes").limit(50).collect()
    }
    cluster(t, curve="hilbert", target_file_bytes=2 * 1024 * 1024)
    post_df = t.scan().filter(F.col("image_id").isin(list(pre))).collect()
    post = {r["image_id"]: (r["caption"], len(r["bytes"])) for r in post_df}
    assert pre == post


# ---------------------------------------------------------------- partial
# progress: the rewrite lands as up to max-commits independent snapshots
# (Iceberg RewriteDataFiles partial-progress.enabled), each re-validated
# against the branch head at its own commit time.


def _images_checksum(t, snapshot_id=None):
    row = (
        t.scan(snapshot_id=snapshot_id)
        .select(
            F.expr("bit_xor(xxhash64(image_id, caption))").alias("h"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    return row["n"], row["h"]


def test_partial_progress_lands_independent_commits(spark, small_file_table):
    t = small_file_table
    before = _images_checksum(t)
    before_files = len(t.data_files())
    res = compact(t, target_file_bytes=2 * 1024 * 1024,
                  partial_progress=True, max_commits=3)
    assert len(res.snapshots) == 3
    assert res.skipped_chunks == 0
    assert res.snapshot.snapshot_id == res.snapshots[-1].snapshot_id
    assert [s.operation for s in res.snapshots] == ["compact"] * 3
    assert _images_checksum(t) == before
    assert len(t.data_files()) < before_files
    # EVERY intermediate commit is a consistent table state: each chunk
    # swaps its victims for their packed equivalents, nothing else
    for s in res.snapshots:
        assert _images_checksum(t, snapshot_id=s.snapshot_id) == before
    # chunk volumes are balanced (round-robin by descending size), so no
    # straggler commit carries the whole rewrite
    per_chunk = [int(s.summary["input_files"]) for s in res.snapshots]
    assert max(per_chunk) - min(per_chunk) <= max(2, min(per_chunk))


def test_partial_progress_respects_table_properties(spark, small_file_table):
    t = small_file_table
    t.set_properties(
        {
            "write.target-file-size-bytes": 2 * 1024 * 1024,
            "compact.partial-progress.enabled": True,
            "compact.partial-progress.max-commits": 4,
        }
    )
    before = _images_checksum(t)
    res = compact(t)  # no args: mode comes from the registered properties
    assert len(res.snapshots) == min(4, len(res.plan.bins))
    assert len(res.snapshots) > 1
    assert _images_checksum(t) == before


def test_partial_progress_abandons_chunks_after_new_delete_file(
    spark, small_file_table
):
    """A tombstone landing mid-rewrite stops applying to re-sequenced
    packed files — every not-yet-committed chunk must abandon, or the
    packed files would resurrect the deleted rows."""
    from airbyte_spark.operators.posdeletes import delete_where

    t = small_file_table
    n_before, _ = _images_checksum(t)
    doomed = [
        r["image_id"]
        for r in t.scan().filter("w <= 64").select("image_id").collect()
    ]
    assert doomed

    executed = []

    def inject(ci):
        executed.append(ci)
        if ci == 1:  # chunk 0 already committed; 1 and 2 must abandon
            delete_where(t, "w <= 64")

    res = compact(t, target_file_bytes=2 * 1024 * 1024,
                  partial_progress=True, max_commits=3, _between_chunks=inject)
    assert len(res.snapshots) == 1
    assert res.skipped_chunks == 2
    # pass-fatal: chunk 2's rewrite is never executed — the new delete
    # file dooms every later chunk, so the loop stops instead of burning
    # a rewrite per chunk only to abandon each at validation
    assert executed == [0, 1]
    assert t.scan().count() == n_before - len(doomed)
    assert t.scan().filter("w <= 64").count() == 0
    # abandoned chunks' output files are deleted from disk: everything on
    # disk is either referenced by some snapshot (victims stay readable
    # for time travel) or live
    import pathlib

    referenced = set()
    for snap in t.history():
        referenced |= {e.path for e in t.data_files(snapshot_id=snap.snapshot_id)}
        referenced |= {
            d.path for d in t.position_delete_files(snapshot_id=snap.snapshot_id)
        }
    on_disk = {str(p) for p in pathlib.Path(t.root).rglob("*.parquet")}
    assert on_disk <= referenced


def test_partial_progress_abandons_only_the_chunk_whose_victim_was_lost(
    spark, small_file_table
):
    """A concurrent rewrite that removes ONE victim voids only the chunk
    holding it; the other chunks' packed files still commit — partial
    progress is the point."""
    t = small_file_table
    lost = {}

    def inject(ci):
        if ci == 0:  # before any chunk committed: all victims still live
            victim = sorted(e.path for e in t.data_files())[0]
            lost["path"] = victim
            lost["rows"] = next(
                e.rows for e in t.data_files() if e.path == victim
            )
            lost["ids"] = [
                r["image_id"]
                for r in t.spark.read.parquet(victim).select("image_id").collect()
            ]
            t.commit("delete", [], remove_paths={victim})

    n_before, _ = _images_checksum(t)
    res = compact(t, target_file_bytes=2 * 1024 * 1024,
                  partial_progress=True, max_commits=3, _between_chunks=inject)
    assert res.skipped_chunks == 1
    assert len(res.snapshots) == 2
    # the lost victim's rows are gone and STAY gone: the abandoned chunk's
    # packed file (which still contained them) never became visible
    assert t.scan().count() == n_before - lost["rows"]
    assert t.scan().filter(F.col("image_id").isin(lost["ids"])).count() == 0


def test_cluster_partial_progress_lands_independent_commits(
    spark, small_file_table
):
    t = small_file_table
    before = _images_checksum(t)
    res = cluster(
        t, dims=["phash", "w", "h"], curve="zorder",
        target_file_bytes=2 * 1024 * 1024,
        partial_progress=True, max_commits=3,
    )
    assert len(res.snapshots) == 3
    assert res.skipped_chunks == 0
    assert res.snapshot.snapshot_id == res.snapshots[-1].snapshot_id
    assert _images_checksum(t) == before
    # every intermediate commit is a consistent table state
    for s in res.snapshots:
        assert _images_checksum(t, snapshot_id=s.snapshot_id) == before
    # every surviving data file carries the registered sort-order stamp:
    # a follow-up dirty pass selects nothing (the leftover-victim state
    # only arises when chunks abandon)
    order_ids = {e.sort_order_id for e in t.data_files()}
    assert len(order_ids) == 1 and None not in order_ids
    res2 = cluster(
        t, dims=["phash", "w", "h"], curve="zorder",
        target_file_bytes=2 * 1024 * 1024, scope="dirty",
    )
    assert res2.rewritten_files == 0 and res2.snapshot is None


def test_cluster_partial_progress_abandons_on_sort_order_invalidation(
    spark, small_file_table
):
    """A PK/identifier change mid-pass clears the sort-order registry;
    committing would stamp files with a dead order id. Chunks after the
    invalidation must abandon; their victims stay live (and dirty)."""
    t = small_file_table
    before = _images_checksum(t)

    executed = []

    def inject(ci):
        executed.append(ci)
        if ci == 1:
            t.invalidate_sort_orders()

    res = cluster(
        t, dims=["phash", "w", "h"], curve="zorder",
        target_file_bytes=2 * 1024 * 1024,
        partial_progress=True, max_commits=3, _between_chunks=inject,
    )
    assert len(res.snapshots) == 1
    assert res.skipped_chunks == 2
    assert executed == [0, 1]  # pass-fatal: chunk 2 never even sorted
    assert _images_checksum(t) == before
    # recovery: the next dirty pass re-registers the order and rewrites
    # exactly the leftover state (abandoned victims + stale-stamped chunk)
    res2 = cluster(
        t, dims=["phash", "w", "h"], curve="zorder",
        target_file_bytes=2 * 1024 * 1024, scope="dirty",
    )
    assert res2.snapshot is not None
    assert _images_checksum(t) == before
    order_ids = {e.sort_order_id for e in t.data_files()}
    assert order_ids == {t.ensure_sort_order(["phash", "w", "h"], "zorder", 21)}


def test_cluster_partial_progress_abandons_after_new_delete_file(
    spark, small_file_table
):
    """Same resurrection argument as compaction: a tombstone landing
    mid-pass cannot apply to re-sorted output files, so chunks that have
    not committed yet must abandon."""
    from airbyte_spark.operators.posdeletes import delete_where

    t = small_file_table
    n_before, _ = _images_checksum(t)
    doomed = t.scan().filter("h <= 64").count()
    assert doomed

    def inject(ci):
        if ci == 1:
            delete_where(t, "h <= 64")

    res = cluster(
        t, dims=["phash", "w", "h"], curve="zorder",
        target_file_bytes=2 * 1024 * 1024,
        partial_progress=True, max_commits=3, _between_chunks=inject,
    )
    assert len(res.snapshots) == 1
    assert res.skipped_chunks == 2
    assert t.scan().count() == n_before - doomed
    assert t.scan().filter("h <= 64").count() == 0
