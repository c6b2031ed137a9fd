"""Partition spec evolution (Iceberg 'Partition Evolution'): changing the
identity-partition columns is metadata-only — existing files keep the
layout of the spec they were written under, new writes use the new spec,
and readers handle the mixture: layout pruning where the file carries the
column, exact row-level enforcement where it does not. Maintenance
rewrites migrate old files to the current spec lazily."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from airbyte_spark.lake.format import DataFileEntry
from airbyte_spark.lake.table import LakeTable, _manifest_may_match

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("grp", StringType()),
        StructField("day", StringType()),
        StructField("v", LongType()),
    ]
)


def _mk(spark, root, partition_by=None):
    t = LakeTable.create(
        spark, root, SCHEMA, primary_key=["id"], partition_by=partition_by
    )
    return t


def _rows(df):
    return sorted((r["id"], r["grp"], r["day"], r["v"]) for r in df.collect())


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
        F.concat(F.lit("d"), (F.col("id") % 3).cast("string")).alias("day"),
        (F.col("id") * 10).alias("v"),
    )


def test_unpartitioned_to_partitioned_scan_exact(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 40).coalesce(2))
    t.update_partition_spec(["grp"])
    t.append(_df(spark, 40, 80).coalesce(2))
    # new files carry the layout, old files don't
    parts = [e.partition for e in t.data_files()]
    assert any("grp" in p for p in parts) and any("grp" not in p for p in parts)
    got = _rows(t.scan(partition_filter={"grp": "even"}))
    assert got == _rows(_df(spark, 0, 80).filter("grp = 'even'"))
    # unfiltered scan unchanged
    assert _rows(t.scan()) == _rows(_df(spark, 0, 80))


def test_changed_partition_column_scan_exact(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), partition_by=["day"])
    t.append(_df(spark, 0, 30))
    t.update_partition_spec(["grp"])
    t.append(_df(spark, 30, 60))
    got = _rows(t.scan(partition_filter={"grp": "odd"}))
    assert got == _rows(_df(spark, 0, 60).filter("grp = 'odd'"))
    # filtering on the OLD column still works: new-era files lack `day`
    # in their layout and are enforced row-level
    got = _rows(t.scan(partition_filter={"day": "d1"}))
    assert got == _rows(_df(spark, 0, 60).filter("day = 'd1'"))


def test_update_spec_validates_and_dedups(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="nope"):
        t.update_partition_spec(["nope"])
    t.update_partition_spec(["grp"])
    t.update_partition_spec(["grp"])  # no-op
    refs = t._refs()["table"]
    assert refs["partition_by"] == ["grp"]
    assert refs["partition_spec_history"] == [[], ["grp"]]


def test_transform_param_change_is_refused(spark, tmp_path):
    """bucket(4, id) -> bucket(8, id) derives the SAME layout field name
    (id_bucket), so old-spec files would be compared against new-spec
    literals and silently mis-pruned — the evolution must be refused
    (Iceberg's unique-partition-name rule), including re-adding the
    transform after an intermediate spec dropped it."""
    t = _mk(spark, str(tmp_path / "t"), partition_by=["bucket(4, id)"])
    t.append(_df(spark, 0, 40))
    with pytest.raises(ValueError, match="id_bucket"):
        t.update_partition_spec(["bucket(8, id)"])
    # param change hidden behind an intermediate spec is still refused
    t.update_partition_spec(["grp"])
    with pytest.raises(ValueError, match="id_bucket"):
        t.update_partition_spec(["bucket(8, id)"])
    # re-adding the ORIGINAL transform is fine, and scans stay exact
    t.update_partition_spec(["bucket(4, id)"])
    t.append(_df(spark, 40, 80))
    # partition_filter prunes to id=7's bucket PARTITION (both eras use
    # the same transform, so pruning is safe) — the row must survive
    got = _rows(t.scan(partition_filter={"id": 7}))
    assert (7, "odd", "d1", 70) in got
    assert _rows(t.scan()) == _rows(_df(spark, 0, 80))
    with pytest.raises(ValueError, match="truncate"):
        t2 = _mk(spark, str(tmp_path / "t2"), partition_by=["truncate(2, day)"])
        t2.update_partition_spec(["truncate(1, day)"])


def test_merge_partition_pruning_survives_evolution(spark, tmp_path):
    from airbyte_spark.operators.merge import merge_into

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        primary_key=["id"],
        partition_by=["day"],
        properties={"merge.partition-pruning": "true"},
    )
    t.append(_df(spark, 0, 30))
    t.update_partition_spec(["grp"])
    # update rows living in OLD-spec files: pruning keyed on the NEW
    # column must still treat pre-evolution layouts as unprunable, else
    # the merge misses the old copy and duplicates the PK
    batch = _df(spark, 0, 30).filter("id in (3, 7)").withColumn(
        "v", F.lit(99999).cast("long")
    )
    merge_into(t, batch, cursor_col="v", cdc_col=None, mode="cow")
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert len(got) == 30  # no duplicate PKs
    assert got[3] == 99999 and got[7] == 99999


def test_maintenance_migrates_old_files_to_current_spec(spark, tmp_path):
    from airbyte_spark.operators.cluster import cluster

    t = _mk(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 40))
    t.update_partition_spec(["grp"])
    before = _rows(t.scan())
    cluster(t, dims=["id", "v"], curve="zorder")
    assert _rows(t.scan()) == before
    # the full rewrite wrote under the CURRENT spec: every file now
    # carries the layout, so partition pruning is pure metadata again
    assert all("grp" in e.partition for e in t.data_files())
    assert _rows(t.scan(partition_filter={"grp": "even"})) == [
        r for r in before if r[1] == "even"
    ]


def test_manifest_pruning_keeps_old_spec_manifests(spark, tmp_path):
    # direct unit check of the summary rule: a partition dict lacking the
    # filter column keeps the manifest (mirrors the scan entry rule)
    e_old = DataFileEntry(path="/x/a.parquet", rows=1, bytes=1, partition={})
    e_new = DataFileEntry(
        path="/x/b.parquet", rows=1, bytes=1, partition={"grp": "odd"}
    )
    from airbyte_spark.lake.format import manifest_summary

    info_old = manifest_summary([e_old])
    info_new = manifest_summary([e_new])
    assert _manifest_may_match(info_old, {"grp": "even"}, None, None)
    assert not _manifest_may_match(info_new, {"grp": "even"}, None, None)
    assert _manifest_may_match(info_new, {"grp": "odd"}, None, None)
