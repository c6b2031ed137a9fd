"""Partitioned lake tables: layout, scan pruning, partition-scoped
compaction/clustering, partition-aware merge pruning. The bounded-rewrite
shape that keeps maintenance commits small at 10^12 rows."""

import pytest
from pyspark.sql import functions as F

from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images, generate_update_batch
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.cluster import cluster
from airbyte_spark.operators.compact import compact
from airbyte_spark.operators.merge import merge_into


@pytest.fixture()
def part_table(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"],
        partition_by=["fmt"],
        properties={"write.target-file-size-bytes": 2 * 1024 * 1024},
    )
    for i in range(4):
        t.append(generate_images(spark, 60, id_offset=i * 60, num_partitions=2))
    return t


def test_partition_layout_and_entries(spark, part_table):
    entries = part_table.data_files()
    assert entries
    for e in entries:
        assert e.partition.get("fmt") in ("png", "jpeg")
        assert f"_p_fmt={e.partition['fmt']}" in e.path


def test_partition_scan_pruning(spark, part_table):
    full = part_table.scan()
    png = part_table.scan(partition_filter={"fmt": "png"})
    assert png.count() == full.filter("fmt = 'png'").count()
    # pruning happens at the file level, not as a post-filter
    opened = {p.replace("file:", "") for p in png.inputFiles()}
    assert all("_p_fmt=png" in p for p in opened)
    assert len(opened) < len(part_table.data_files())


def test_partition_scoped_compaction(spark, part_table):
    t = part_table
    before = {e.path for e in t.data_files() if e.partition["fmt"] == "png"}
    res = compact(t)
    assert res.snapshot is not None
    # bins never mix partitions: every output file has exactly one fmt
    for e in t.data_files():
        vals = t.spark.read.parquet(e.path).select("fmt").distinct().collect()
        assert len(vals) == 1
        assert str(vals[0][0]) == e.partition["fmt"]


def test_partition_scoped_cluster(spark, part_table):
    t = part_table
    jpeg_before = {e.path for e in t.data_files() if e.partition["fmt"] == "jpeg"}
    png_before = {e.path for e in t.data_files() if e.partition["fmt"] == "png"}
    n_png = t.scan(partition_filter={"fmt": "png"}).count()
    res = cluster(t, curve="zorder", partition_filter={"fmt": "png"},
                  target_file_bytes=1024 * 1024)
    after = t.data_files()
    # jpeg untouched, png rewritten
    assert jpeg_before == {e.path for e in after if e.partition["fmt"] == "jpeg"}
    assert png_before.isdisjoint(
        {e.path for e in after if e.partition["fmt"] == "png"}
    )
    assert t.scan(partition_filter={"fmt": "png"}).count() == n_png


def test_merge_moves_rows_across_partitions(spark, part_table):
    """Default (no pruning): an update that changes a row's partition value
    (png -> jpeg) must MOVE the row — old copy removed, no duplicate PK."""
    t = part_table
    src = generate_update_batch(spark, 240, 60, num_partitions=2)
    merge_into(t, src)
    dup = (
        t.scan().groupBy("image_id").count().filter("count > 1")
    )
    assert dup.isEmpty(), "rows must not be duplicated across partitions"
    # every file's physical fmt matches its partition dir
    for e in t.data_files():
        vals = spark.read.parquet(e.path).select("fmt").distinct().collect()
        assert len(vals) == 1 and str(vals[0][0]) == e.partition["fmt"]


def test_partition_pruned_merge_when_immutable(spark, tmp_table_dir):
    """With `merge.partition-pruning` asserted, a batch confined to the
    jpeg partition must not rewrite any png file even when PK ranges
    interleave."""
    t = LakeTable.create(
        spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"],
        partition_by=["fmt"],
        properties={"merge.partition-pruning": "true",
                    "write.target-file-size-bytes": 2 * 1024 * 1024},
    )
    base = generate_images(spark, 200, num_partitions=2).persist()
    t.append(base)
    png_before = {e.path for e in t.data_files() if e.partition["fmt"] == "png"}
    assert png_before
    # updates for existing jpeg-resident ids, fmt preserved
    jpeg_rows = base.filter("fmt = 'jpeg'").limit(30)
    src = (
        jpeg_rows.withColumn("caption", F.concat(F.col("caption"), F.lit(" v2")))
        .withColumn("updated_at", F.lit("2026-05-01 00:00:00").cast("timestamp"))
        .withColumn("_airbyte_raw_id", F.concat(F.col("_airbyte_raw_id"), F.lit("-u")))
    )
    merge_into(t, src)
    png_after = {e.path for e in t.data_files() if e.partition["fmt"] == "png"}
    assert png_before == png_after, "png partition must be untouched"
    assert t.scan().filter(F.col("caption").endswith(" v2")).count() == 30
    base.unpersist()


def test_partitioned_maintenance_parallel(spark, part_table):
    """run_partitioned_maintenance: per-partition compact+cluster jobs run
    CONCURRENTLY with optimistic commits + retry; rows, payload checksums
    and per-partition clustering all hold afterwards."""
    from airbyte_spark.operators.maintenance import run_partitioned_maintenance

    t = part_table
    chk = [
        F.expr("bit_xor(xxhash64(image_id, caption))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ]
    before = t.scan().select(*chk).first()
    rep = run_partitioned_maintenance(
        t, "pm-1", max_concurrent=2, target_file_bytes=2 * 1024 * 1024
    )
    part_stages = [k for k in rep.stages if k.startswith("partition-")]
    assert len(part_stages) == 2  # png + jpeg
    after = t.scan().select(*chk).first()
    assert (before["n"], before["h"]) == (after["n"], after["h"])
    # outputs stay partition-pure and GC left no orphans
    for e in t.data_files():
        assert e.partition.get("fmt") in ("png", "jpeg")
    import glob as _glob
    import os as _os

    on_disk = set(
        _glob.glob(_os.path.join(t.data_dir, "**", "*.parquet"), recursive=True)
    )
    assert on_disk == t.reachable_files()


def test_rollback_to_ancestor(spark, part_table):
    from pytest import raises

    t = part_table
    snap0 = t.current_snapshot_id()
    n0 = t.scan().count()
    t.append(generate_images(spark, 30, id_offset=9000, num_partitions=2))
    assert t.scan().count() == n0 + 30
    t.rollback(snap0)
    assert t.scan().count() == n0
    with raises(ValueError):
        t.rollback("not-a-snapshot")


def test_mor_partition_pruning_safe_for_cross_partition_moves(spark, tmp_table_dir):
    """MoR makes `merge.partition-pruning` safe even when an update MOVES a
    row across partitions: the equality-delete file is table-global, so the
    old-partition copy dies at scan time without being rewritten — the
    failure mode that forces pruning to be opt-in for CoW doesn't exist."""
    t = LakeTable.create(
        spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"],
        partition_by=["fmt"],
        properties={"merge.partition-pruning": "true",
                    "write.target-file-size-bytes": 2 * 1024 * 1024},
    )
    base = generate_images(spark, 120, num_partitions=2).persist()
    t.append(base)
    mover = base.filter("fmt = 'png'").limit(5)
    src = (
        mover.withColumn("fmt", F.lit("jpeg"))
        .withColumn("caption", F.concat(F.col("caption"), F.lit(" moved")))
        .withColumn("updated_at", F.lit("2026-06-01 00:00:00").cast("timestamp"))
        .withColumn("_airbyte_raw_id",
                    F.concat(F.col("_airbyte_raw_id"), F.lit("-m")))
    )
    moved_ids = [r["image_id"] for r in mover.select("image_id").collect()]
    res = merge_into(t, src, mode="mor")
    assert res.rewritten_files == 0
    got = t.scan().filter(F.col("image_id").isin(moved_ids))
    rows = got.select("image_id", "fmt", "caption").collect()
    assert len(rows) == 5  # no stranded old-partition duplicates
    assert all(r["fmt"] == "jpeg" and r["caption"].endswith(" moved") for r in rows)
    # and the pruned scan of the OLD partition no longer returns them
    png = t.scan(partition_filter={"fmt": "png"})
    assert png.filter(F.col("image_id").isin(moved_ids)).isEmpty()
    base.unpersist()


def test_partitioned_maintenance_folds_mor_deletes(spark, part_table):
    """MoR merges followed by partition-parallel maintenance. One era of
    delete debt is BELOW the fold threshold, so the dirty-scoped pass
    keeps it as MoR files (scan-side anti-join stays correct); a
    full-scope pass retires the debt and drops every delete file. The
    post-maintenance state equals the pre-maintenance scan either way."""
    from airbyte_spark.operators.maintenance import run_partitioned_maintenance

    t = part_table
    # settle first: on a never-clustered table EVERY file is a victim, so
    # the first pass rewrites everything and deletes die as a side effect;
    # the debt-kept contract applies to an already-clustered steady state
    for i in range(3):
        r0 = run_partitioned_maintenance(
            t, f"pm-settle-{i}", max_concurrent=2,
            target_file_bytes=2 * 1024 * 1024,
        )
        if r0.stages["summary"]["dirty_partitions"] == 0:
            break
    src = generate_update_batch(spark, 240, 50, num_partitions=2)
    merge_into(t, src, mode="mor")
    assert t.delete_files()
    before = {
        r["image_id"]: r["caption"]
        for r in t.scan().select("image_id", "caption").collect()
    }
    rep = run_partitioned_maintenance(
        t, "pm-mor", max_concurrent=2, target_file_bytes=2 * 1024 * 1024
    )
    # 1 era <= cluster.max-delete-eras: debt intentionally kept; only the
    # clean files it would hit survive un-rewritten
    assert "fold-deletes" not in rep.stages
    assert t.delete_files()
    mid = {
        r["image_id"]: r["caption"]
        for r in t.scan().select("image_id", "caption").collect()
    }
    assert before == mid
    rep2 = run_partitioned_maintenance(
        t, "pm-mor-full", max_concurrent=2,
        target_file_bytes=2 * 1024 * 1024, cluster_scope="full",
    )
    assert "fold-deletes" in rep2.stages or not t.delete_files()
    assert not t.delete_files()
    after = {
        r["image_id"]: r["caption"]
        for r in t.scan().select("image_id", "caption").collect()
    }
    assert before == after
