"""Snapshot tags (Iceberg tags): named immutable refs that pin a
snapshot — and its files — through expire/GC until dropped."""

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from airbyte_spark.lake.table import LakeTable

SCHEMA = StructType(
    [StructField("id", StringType(), False), StructField("v", IntegerType())]
)


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([(f"k{i}", i) for i in range(10)], SCHEMA))
    return t


def test_tag_pins_snapshot_through_expiry(spark, tmp_table_dir):
    from airbyte_spark.operators.merge import merge_into

    t = _mk(spark, tmp_table_dir)
    t.create_tag("v1")
    # CoW merge rewrites the only file; untagged history then expires
    batch = spark.createDataFrame([("k1", 999)], SCHEMA)
    merge_into(t, batch, cursor_col="v", cdc_col=None, mode="cow")
    t.append(spark.createDataFrame([("z", 0)], SCHEMA))
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files()
    # the tagged snapshot still reads in full — by tag NAME (VERSION AS OF)
    got = {r["id"]: r["v"] for r in t.scan(snapshot_id="v1").collect()}
    assert got == {f"k{i}": i for i in range(10)}
    head = {r["id"]: r["v"] for r in t.scan().collect()}
    assert head["k1"] == 999 and "z" in head


def test_drop_tag_releases_the_pin(spark, tmp_table_dir):
    import glob
    import os

    t = _mk(spark, tmp_table_dir)
    t.create_tag("v1")
    old_files = {e.path for e in t.data_files()}
    # full cluster rewrite: every pre-tag file is replaced in head, so the
    # tag is the ONLY thing keeping the old files alive
    from airbyte_spark.operators.cluster import cluster

    cluster(t, dims=["v"], curve="zorder")
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files()
    assert all(os.path.exists(p) for p in old_files)  # pinned
    t.drop_tag("v1")
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files()
    assert not any(os.path.exists(p) for p in old_files)
    assert glob.glob(os.path.join(t.data_dir, "**", "*.parquet"), recursive=True)


def test_tag_validation(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.create_tag("v1")
    with pytest.raises(ValueError, match="exists"):
        t.create_tag("v1")
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.create_tag("v2", snapshot_id="deadbeef")
    with pytest.raises(ValueError, match="branch"):
        t.create_tag("main")
    assert t.tags == {"v1": t.current_snapshot_id()}


def test_max_ref_age_drops_stale_refs_but_never_main(spark, tmp_table_dir):
    """Iceberg MAX_REF_AGE_MS: tags and side branches whose pinned
    snapshot is older than the age are dropped by expire, releasing
    their retention pins; main never ages out."""
    import time as _time

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from airbyte_spark.lake.table import LakeTable

    schema = StructType(
        [StructField("id", StringType(), False), StructField("v", IntegerType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["id"])
    t.append(spark.createDataFrame([("a", 1)], schema))
    t.create_tag("old-tag")
    t.create_branch("old-branch")
    old_pin = t.tags["old-tag"]
    _time.sleep(0.05)
    t.append(spark.createDataFrame([("b", 2)], schema))
    t.create_tag("fresh-tag")
    # age out anything pinned before the second append
    expired = t.expire_snapshots(keep_last=1, max_ref_age_ms=40)
    assert "old-tag" not in t.tags
    assert "old-branch" not in t.branches()
    assert "fresh-tag" in t.tags  # pinned snapshot is recent enough
    assert "main" in t.branches()
    # the previously tag-pinned snapshot expired once the pin released
    assert old_pin in expired
    assert t.scan().count() == 2
