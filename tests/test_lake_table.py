"""Lake table layer: commits, snapshot isolation, branches, expiry/GC,
schema evolution. Models the reference's write-path guarantees
(S3DataLakeStreamLoader.kt:74-133, IcebergTableCleaner.kt:33-72,
IcebergTableSynchronizerTest.kt)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.evolve import SchemaEvolutionError, diff_schemas
from airbyte_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("v", IntegerType()),
    ]
)


def _mk(spark, root, rows):
    t = LakeTable.create(spark, root, SCHEMA, primary_key=["id"])
    df = spark.createDataFrame(rows, SCHEMA)
    t.append(df)
    return t


def test_append_scan_roundtrip(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [(f"k{i}", i) for i in range(100)])
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert got == {f"k{i}": i for i in range(100)}


def test_snapshot_isolation(spark, tmp_table_dir):
    """A reader pinned to a snapshot sees identical data across later
    commits (branch-swap pattern, S3DataLakeStreamLoader.kt:104-133)."""
    t = _mk(spark, tmp_table_dir, [("a", 1)])
    snap0 = t.current_snapshot_id()
    t.append(spark.createDataFrame([("b", 2)], SCHEMA))
    assert sorted(r["id"] for r in t.scan(snapshot_id=snap0).collect()) == ["a"]
    assert sorted(r["id"] for r in t.scan().collect()) == ["a", "b"]


def test_branch_staging_swap(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1)])
    t.create_branch("staging")
    t.append(spark.createDataFrame([("b", 2)], SCHEMA), branch="staging")
    # main unchanged until swap
    assert t.scan().count() == 1
    t.replace_branch("main", "staging")
    t.drop_branch("staging")
    assert t.scan().count() == 2


def test_manifest_stats_pruning(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    # two disjoint key-range files
    t.append(spark.createDataFrame([(f"a{i}", i) for i in range(10)], SCHEMA))
    t.append(spark.createDataFrame([(f"z{i}", i) for i in range(10)], SCHEMA))
    all_files = t.data_files()
    assert len(all_files) >= 2
    pruned = t.scan(key_range=("id", "a0", "a9"))
    assert pruned.count() == 10
    # pruning must not open the z-file: inputFiles reflects the plan
    opened = pruned.inputFiles()
    assert all("z" not in os.path.basename(os.path.dirname(p)) for p in opened)
    zpaths = {e.path for e in all_files if e.stats["id"]["min"].startswith("z")}
    assert not zpaths & {p.replace("file:", "") for p in opened}


def test_expire_and_orphan_gc(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1)])
    files_v1 = {e.path for e in t.data_files()}
    # overwrite everything (CoW): v1 files become historical
    entries = t.write_dataframe(spark.createDataFrame([("a", 2)], SCHEMA))
    t.commit("rewrite", entries, remove_paths=files_v1)
    assert t.scan().collect()[0]["v"] == 2
    # before expiry: v1 physically present and reachable via history
    assert all(os.path.exists(p) for p in files_v1)
    expired = t.expire_snapshots(keep_last=1)
    assert expired
    orphans = t.remove_orphan_files()
    assert set(orphans) == files_v1
    assert not any(os.path.exists(p) for p in files_v1)
    assert t.scan().collect()[0]["v"] == 2  # head untouched


def test_gc_collects_nested_maintenance_outputs(spark, tmp_table_dir):
    """Regression (round-1 verdict): merge/compact/cluster outputs are
    written NESTED (`_pid=N/`, `_p_<col>=v/` partitionBy dirs); a one-level
    GC glob never saw them, leaking every CoW-replaced file. After expire +
    GC, on-disk parquet must equal exactly the reachable set — on a
    clustered table AND a partitioned one."""
    import glob as _glob

    from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images
    from airbyte_spark.operators.cluster import cluster

    def on_disk(t):
        return set(
            _glob.glob(os.path.join(t.data_dir, "**", "*.parquet"), recursive=True)
        )

    for part_by in (None, ["fmt"]):
        root = os.path.join(tmp_table_dir, "part" if part_by else "flat")
        t = LakeTable.create(
            spark, root, IMAGES_SCHEMA, primary_key=["image_id"],
            partition_by=part_by,
            properties={"write.target-file-size-bytes": 2 * 1024 * 1024},
        )
        t.append(generate_images(spark, 80, num_partitions=4))
        cluster(t, dims=["phash", "w", "h"], curve="hilbert",
                target_file_bytes=512 * 1024)
        cluster(t, dims=["phash", "w", "h"], curve="hilbert",
                target_file_bytes=1024 * 1024)
        head_files = {e.path for e in t.data_files()}
        assert on_disk(t) > head_files  # historical (CoW-replaced) files exist
        # the replaced files live in NESTED dirs — the round-1 leak shape
        assert any("_pid=" in p or "_p_fmt=" in p for p in on_disk(t) - head_files)
        t.expire_snapshots(keep_last=1)
        t.remove_orphan_files()
        assert on_disk(t) == t.reachable_files()  # zero leaked files
        assert t.scan().count() == 80
        # no empty or marker-only directories left behind, and no stray
        # _SUCCESS/.crc files for deleted parquet
        for d, _dirs, files in os.walk(t.data_dir):
            if d == t.data_dir:
                continue
            assert any(
                not (f == "_SUCCESS" or f.endswith(".crc")) for f in os.listdir(d)
            ), f"marker-only dir leaked: {d}"


def test_gc_distributed_listing_many_files(spark, tmp_table_dir, monkeypatch):
    """Above DISTRIBUTED_LISTING_THRESHOLD physical files, orphan listing
    must run as a Spark job, never the driver glob (r2 verdict missing #4
    — a 10^6-file table's LIST calls cannot serialize through the driver).
    Plants a forest of orphan files, poisons the driver-glob path, and
    asserts exact reclamation with live files and grace period honored."""
    t = _mk(spark, tmp_table_dir, [(f"k{i}", i) for i in range(20)])
    live = {os.path.realpath(e.path) for e in t.data_files()}
    # nested fake orphans: committed-then-expired leftovers of prior jobs
    n_orphans = 120
    for i in range(n_orphans):
        # every 5th orphan sits under a dir with URI-hostile characters
        # (space, colon, percent) — the binaryFile listing returns
        # percent-encoded URIs that must decode back to the on-disk name
        leaf = (
            f"_p_ts=2024-01-01 00:15:{i % 60:02d}%00" if i % 5 == 0
            else f"_pid={i % 4}"
        )
        d = os.path.join(t.data_dir, f"commit-old{i % 7}", leaf)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"part-{i:05d}.parquet"), "wb") as f:
            f.write(b"x")
    monkeypatch.setattr(LakeTable, "DISTRIBUTED_LISTING_THRESHOLD", 50)

    def _no_driver_glob(self):
        raise AssertionError("driver glob used above the distributed threshold")

    def _no_driver_reachable(self):
        raise AssertionError(
            "driver reachable-set built above the distributed threshold"
        )

    monkeypatch.setattr(LakeTable, "_list_data_files_driver", _no_driver_glob)
    # the reachable side must ALSO stay off the driver: it is O(table)
    # paths (~3 GB of python strings at the 30M-file design point)
    monkeypatch.setattr(LakeTable, "reachable_files", _no_driver_reachable)
    # grace period: everything is younger than the cutoff -> nothing reaped
    assert t.remove_orphan_files(grace_period_ms=3_600_000) == []
    orphans = t.remove_orphan_files()
    assert len(orphans) == n_orphans
    on_disk = {
        os.path.realpath(os.path.join(r, f))
        for r, _d, fs in os.walk(t.data_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert on_disk == live
    assert t.scan().count() == 20  # table intact


def test_schema_evolution_roundtrip(spark, tmp_table_dir):
    """v1 write -> evolve (add col, widen int->long) -> v2 write -> both
    generations scan under v2 schema (testAppendSchemaEvolution analog,
    BasicFunctionalityIntegrationTest.kt:2842)."""
    t = _mk(spark, tmp_table_dir, [("a", 1)])
    v2 = StructType(
        [
            StructField("id", StringType(), False),
            StructField("v", LongType()),  # widened
            StructField("alt_text", StringType(), True),  # added
        ]
    )
    t.evolve_schema(v2)
    t.append(
        spark.createDataFrame([("b", 2, "hello")], v2)
    )
    rows = {r["id"]: (r["v"], r["alt_text"]) for r in t.scan().collect()}
    assert rows == {"a": (1, None), "b": (2, "hello")}
    assert dict(t.scan().dtypes)["v"] == "bigint"


def test_schema_evolution_illegal(spark):
    v1 = StructType([StructField("v", LongType())])
    v2 = StructType([StructField("v", IntegerType())])
    with pytest.raises(SchemaEvolutionError):
        diff_schemas(v1, v2)
    v3 = StructType([StructField("v", LongType()), StructField("n", StringType(), False)])
    with pytest.raises(SchemaEvolutionError):
        diff_schemas(v1, v3)


def test_rewrite_manifests_recomputes_stats(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [(f"k{i:03d}", i) for i in range(50)])
    snap = t.rewrite_manifests()
    assert snap.operation == "rewrite-manifests"
    entries = t.data_files()
    assert sum(e.rows for e in entries) == 50
    for e in entries:
        assert e.stats["id"]["min"] <= e.stats["id"]["max"]
        assert e.stats["v"]["null_count"] == 0


def test_commit_conflict(spark, tmp_table_dir):
    from airbyte_spark.lake.table import CommitConflict

    t = _mk(spark, tmp_table_dir, [("a", 1)])
    stale_parent = t.current_snapshot_id()
    t.append(spark.createDataFrame([("b", 2)], SCHEMA))
    entries = t.write_dataframe(spark.createDataFrame([("c", 3)], SCHEMA))
    with pytest.raises(CommitConflict):
        t.commit("append", entries, expected_parent=stale_parent)


def test_concurrent_commits_none_lost(spark, tmp_table_dir):
    """The refs swap is atomic against concurrent committers: 8 threaded
    appends (4-way concurrent) with conflict-retry must ALL land — the
    race where two writers pass the expected-parent check and one commit
    silently vanishes is closed by the per-table refs lock."""
    from concurrent.futures import ThreadPoolExecutor

    from airbyte_spark.lake.retry import retry_on_conflict

    t = _mk(spark, tmp_table_dir, [("base", 0)])

    def one(i):
        df = spark.createDataFrame(
            [(f"c{i}-{j}", j) for j in range(5)], SCHEMA
        )
        return retry_on_conflict(lambda: t.append(df), attempts=10)

    with ThreadPoolExecutor(max_workers=4) as ex:
        snaps = list(ex.map(one, range(8)))
    assert len({s.snapshot_id for s in snaps}) == 8
    assert t.scan().count() == 1 + 8 * 5
    # history contains every snapshot (nothing orphaned off the chain)
    hist = {s.snapshot_id for s in t.history()}
    assert {s.snapshot_id for s in snaps} <= hist


def test_incremental_scan_between_snapshots(spark, tmp_table_dir):
    """Changelog read: rows committed after a snapshot, selected from
    manifest sequences (Iceberg incremental append scan)."""
    t = _mk(spark, tmp_table_dir, [("a", 1)])
    snap0 = t.current_snapshot_id()
    t.append(spark.createDataFrame([("b", 2)], SCHEMA))
    mid = t.current_snapshot_id()
    t.append(spark.createDataFrame([("c", 3)], SCHEMA))
    inc = t.scan_incremental(snap0)
    assert sorted(r["id"] for r in inc.collect()) == ["b", "c"]
    window = t.scan_incremental(snap0, to_snapshot_id=mid)
    assert sorted(r["id"] for r in window.collect()) == ["b"]
    assert t.scan_incremental(t.current_snapshot_id()).count() == 0


def test_incremental_scan_applies_mor_deletes(spark, tmp_table_dir):
    """A MoR merge inside the incremental window: the window's new rows
    arrive with the window's deletes applied (upserted versions only)."""
    import datetime as dt

    from pyspark.sql.types import TimestampType

    from airbyte_spark.operators.merge import merge_into

    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("v", IntegerType()),
            StructField("_airbyte_raw_id", StringType()),
            StructField("_airbyte_extracted_at", TimestampType()),
        ]
    )
    ts0 = dt.datetime(2026, 4, 1)
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["id"])
    t.append(spark.createDataFrame([("a", 1, "r1", ts0), ("b", 1, "r2", ts0)], schema))
    snap0 = t.current_snapshot_id()
    src_schema = StructType(
        list(schema.fields)
        + [StructField("updated_at", TimestampType())]
    )
    merge_into(
        t,
        spark.createDataFrame([("a", 2, "s1", ts0, ts0)], src_schema),
        mode="mor",
    )
    merge_into(
        t,
        spark.createDataFrame([("a", 3, "s2", ts0, ts0.replace(day=2))], src_schema),
        mode="mor",
    )
    inc = t.scan_incremental(snap0)
    rows = [(r["id"], r["v"]) for r in inc.collect()]
    assert rows == [("a", 3)]  # only the surviving upserted version


def test_metadata_tables(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [("a", 1)])
    t.append(spark.createDataFrame([("b", 2)], SCHEMA))
    snaps = t.snapshots_df()
    assert snaps.filter("operation = 'append'").count() >= 2
    assert snaps.filter("operation = 'create'").count() == 1
    files = t.files_df()
    assert files.filter("content = 'data'").count() == len(t.data_files())
    assert files.agg(F.sum("rows")).first()[0] == 2


def test_temporal_key_range_scan_prunes(spark, tmp_table_dir):
    """key_range on a timestamp column: manifest stats are strings after
    the JSON round-trip; pruning must coerce, not TypeError, and must
    still prune disjoint files (third-review finding)."""
    import datetime as dt

    from pyspark.sql.types import TimestampType

    schema = StructType(
        [StructField("id", StringType(), False), StructField("ts", TimestampType())]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["id"])
    jan = [(f"j{i}", dt.datetime(2024, 1, 1 + i)) for i in range(5)]
    jun = [(f"u{i}", dt.datetime(2024, 6, 1 + i)) for i in range(5)]
    t.append(spark.createDataFrame(jan, schema))
    t.append(spark.createDataFrame(jun, schema))
    df = t.scan(key_range=("ts", dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)))
    assert sorted(r["id"] for r in df.collect()) == [f"j{i}" for i in range(5)]
    # manifests must actually CARRY ts stats (TIMESTAMP_MICROS; INT96 had
    # none) and the pruned plan must not open any june file
    assert all("ts" in e.stats for e in t.data_files())
    opened = {os.path.basename(p) for p in df.inputFiles()}
    june_files = {
        os.path.basename(e.path)
        for e in t.data_files()
        if str(e.stats["id"]["min"]).startswith("u")
    }
    assert june_files and not opened & june_files, (opened, june_files)


def test_gc_with_relative_root_spelling(spark, tmp_table_dir):
    """remove_orphan_files must compare normalized paths: loading the table
    under a different root spelling must NOT classify live files as
    orphans (third-review finding — would be total data loss)."""
    t = _mk(spark, tmp_table_dir, [("a", 1), ("b", 2)])
    alias = tmp_table_dir.rstrip("/") + "/"  # same dir, different spelling
    t2 = LakeTable.load(spark, alias)
    orphans = t2.remove_orphan_files()
    assert orphans == []
    assert t.scan().count() == 2


def test_boolean_partition_filter(spark, tmp_table_dir):
    """Python True vs Spark 'true' rendering must not break partition
    pruning (third-review finding)."""
    from pyspark.sql.types import BooleanType

    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("flag", BooleanType()),
        ]
    )
    t = LakeTable.create(
        spark, tmp_table_dir, schema, primary_key=["id"], partition_by=["flag"]
    )
    t.append(
        spark.createDataFrame(
            [("a", True), ("b", False), ("c", True)], schema
        )
    )
    got = t.scan(partition_filter={"flag": True})
    assert sorted(r["id"] for r in got.collect()) == ["a", "c"]


def test_time_travel_as_of(spark, tmp_table_dir):
    """snapshot_as_of: newest snapshot at-or-before a timestamp, walking
    ONLY the branch ancestry; plus time-based expire retention."""
    import time

    t = _mk(spark, tmp_table_dir, [("a", 1)])
    s1 = t.snapshot()
    time.sleep(0.05)
    t.append(spark.createDataFrame([("b", 2)], SCHEMA))
    s2 = t.snapshot()
    time.sleep(0.05)
    t.append(spark.createDataFrame([("c", 3)], SCHEMA))
    # as-of between s1 and s2 -> s1's state
    got = t.snapshot_as_of(s1.timestamp_ms)
    assert got.snapshot_id == s1.snapshot_id
    assert t.scan(snapshot_id=got.snapshot_id).count() == 1
    mid = t.snapshot_as_of(s2.timestamp_ms)
    assert mid.snapshot_id == s2.snapshot_id
    with __import__("pytest").raises(ValueError):
        t.snapshot_as_of(0)
    # time-based retention: expire strictly-older-than s2 keeps s2+head
    t.expire_snapshots(keep_last=1, older_than_ms=s2.timestamp_ms)
    assert t.snapshot_as_of(s2.timestamp_ms).snapshot_id == s2.snapshot_id
    assert t.scan().count() == 3


def test_expire_snapshots_by_policy(spark, tmp_table_dir):
    """Retention resolved from `history.expire.*` table properties
    (Iceberg TableProperties MIN_SNAPSHOTS_TO_KEEP / MAX_SNAPSHOT_AGE_MS /
    MAX_REF_AGE_MS): run_maintenance's expire stage goes through
    expire_snapshots_by_policy, so retention is governed per-table
    instead of per-job-invocation."""
    import time

    t = _mk(spark, tmp_table_dir, [("a", 1)])
    t.append(spark.createDataFrame([("b", 2)], SCHEMA))
    t.append(spark.createDataFrame([("c", 3)], SCHEMA))
    # default policy: min-snapshots-to-keep registry default is 2
    expired = t.expire_snapshots_by_policy()
    assert expired and len(t.history()) == 2
    # a huge max-snapshot-age pins everything the count floor would drop
    t.set_properties({
        "history.expire.min-snapshots-to-keep": 1,
        "history.expire.max-snapshot-age-ms": 10**12,
    })
    t.append(spark.createDataFrame([("d", 4)], SCHEMA))
    assert t.expire_snapshots_by_policy() == []
    assert len(t.history()) == 3
    # tiny age: everything older than the window dies down to the floor,
    # and a stale tag's pin is released by max-ref-age first
    t.create_tag("audit")
    time.sleep(0.02)
    t.append(spark.createDataFrame([("e", 5)], SCHEMA))
    t.set_properties({
        "history.expire.max-snapshot-age-ms": 1,
        "history.expire.max-ref-age-ms": 1,
    })
    t.expire_snapshots_by_policy()
    assert "audit" not in t.tags
    assert len(t.history()) == 1
    assert t.scan().count() == 5  # head state untouched
    # explicit caller arg still wins over the property
    t.append(spark.createDataFrame([("f", 6)], SCHEMA))
    t.set_properties({
        "history.expire.max-snapshot-age-ms": 0,
        "history.expire.min-snapshots-to-keep": 1,
    })
    assert t.expire_snapshots_by_policy(keep_last=2) == []
    # typo'd engine-reserved key is a typed config error, not metadata
    import pytest as _pytest

    from airbyte_spark.lake.spec import ConfigValidationError

    with _pytest.raises(ConfigValidationError):
        t.set_properties({"history.expire.max-snapshot-age": 5})
