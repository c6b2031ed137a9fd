"""Manifest reuse + manifest-list summaries: commit metadata is O(change),
not O(table) (Iceberg fast-append / manifest-merge semantics —
`commit.manifests.min-count-to-merge`; the reference's Iceberg writers get
this from the library, `IcebergUtil.kt` table writes), and scans prune
whole manifests from their summaries before opening them."""

import json
import os

import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.format import Snapshot, manifest_summary, read_json
from airbyte_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("v", IntegerType()),
    ]
)


def _mk(spark, root, properties=None):
    return LakeTable.create(
        spark, root, SCHEMA, primary_key=["id"], properties=properties
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_pure_append_reuses_parent_manifests_by_name(spark, tmp_table_dir):
    """An append must not rewrite existing metadata: the parent's
    manifests are carried forward by NAME and exactly one new manifest is
    added — O(batch) commit metadata at any table size."""
    t = _mk(spark, tmp_table_dir)
    t.append(_df(spark, [("a", 1)]))
    before = t.snapshot()
    t.append(_df(spark, [("b", 2)]))
    after = t.snapshot()
    assert set(before.manifests) <= set(after.manifests)
    new = set(after.manifests) - set(before.manifests)
    assert len(new) == 1
    assert len(after.manifest_infos) == len(after.manifests)


def test_remove_rewrites_only_the_covering_manifest(spark, tmp_table_dir):
    """A commit that removes files touches only manifests containing
    them; disjoint manifests keep their names (and are never re-read,
    per the commit-dir targeting in the summaries)."""
    t = _mk(spark, tmp_table_dir)
    t.append(_df(spark, [("a", 1)]))
    t.append(_df(spark, [("b", 2)]))
    t.append(_df(spark, [("c", 3)]))
    snap = t.snapshot()
    # remove the file(s) added by the second commit
    victims = [
        e
        for e in t.data_files()
        if any(r["id"] == "b" for r in t.read_entries([e]).collect())
    ]
    assert victims
    t.commit("delete", [], remove_paths={e.path for e in victims})
    after = t.snapshot()
    surviving_parent = set(snap.manifests) & set(after.manifests)
    # the two untouched appends' manifests survive by name
    assert len(surviving_parent) >= 2
    assert sorted(r["id"] for r in t.scan().collect()) == ["a", "c"]


def test_commit_time_manifest_merge_bounds_the_list(spark, tmp_table_dir):
    t = _mk(
        spark,
        tmp_table_dir,
        properties={
            "commit.manifest-min-count-to-merge": 4,
            "commit.manifest-target-entries": 100,
        },
    )
    for i in range(12):
        t.append(_df(spark, [(f"k{i}", i)]))
    snap = t.snapshot()
    # 12 appends but the list was folded at the threshold
    assert len(snap.manifests) <= 5
    assert sorted(r["id"] for r in t.scan().collect()) == sorted(
        f"k{i}" for i in range(12)
    )
    # merged manifests preserve per-entry identity (sequence numbers span
    # the original commits — delete applicability unchanged)
    seqs = {e.sequence for e in t.data_files()}
    assert len(seqs) == 12


def test_manifest_summaries_written_and_loadable(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    snap = t.snapshot()
    assert len(snap.manifest_infos) == len(snap.manifests) == 1
    info = snap.manifest_infos[0]
    assert info["content"] == ["data"]
    assert info["entry_count"] >= 1
    assert info["rows"] == 2
    assert info["dirs"] and all(os.path.isabs(d) for d in info["dirs"])
    # id stats aggregated over entries -> usable for manifest-level pruning
    assert info["stats"]["id"]["min"] == "a"
    assert info["stats"]["id"]["max"] == "b"


def test_scan_skips_manifests_by_key_range_without_opening_them(
    spark, tmp_table_dir, monkeypatch
):
    """Manifest-level pruning: a key_range scan must not even OPEN a
    manifest whose summary stats exclude the range."""
    t = _mk(spark, tmp_table_dir)
    t.append(_df(spark, [("a", 1), ("b", 2)]))
    t.append(_df(spark, [("x", 24), ("y", 25)]))

    import airbyte_spark.lake.table as tbl

    opened = []
    real = tbl._read_manifest_raw

    def spy(path):
        opened.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(tbl, "_read_manifest_raw", spy)
    rows = t.scan(key_range=("id", "x", "z")).collect()
    assert sorted(r["id"] for r in rows) == ["x", "y"]
    # exactly one of the two manifests was opened
    assert len(set(opened)) == 1


def test_scan_skips_pure_data_manifests_by_partition(spark, tmp_table_dir):
    part_schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("v", IntegerType()),
            StructField("p", StringType()),
        ]
    )
    t = LakeTable.create(
        spark, tmp_table_dir, part_schema, primary_key=["id"], partition_by=["p"]
    )
    t.append(spark.createDataFrame([("a", 1, "eu"), ("b", 2, "us")], part_schema))

    import airbyte_spark.lake.table as tbl

    infos = t.snapshot().manifest_infos
    # partitioned append -> one manifest per partition, each summarized
    assert len(infos) == 2
    for info in infos:
        assert info["content"] == ["data"]
        assert info["partitions"] is not None and len(info["partitions"]) == 1
    rows = t.scan(partition_filter={"p": "eu"}).collect()
    assert [r["id"] for r in rows] == ["a"]


def test_legacy_snapshot_without_infos_still_reads_and_upgrades(
    spark, tmp_table_dir
):
    """Snapshots written before manifest summaries existed load fine
    (infos default empty -> every manifest is opened), and the next
    commit upgrades them to a fully-summarized manifest list."""
    t = _mk(spark, tmp_table_dir)
    t.append(_df(spark, [("a", 1)]))
    # strip the infos on disk, as an old-format snapshot would be
    sid = t.current_snapshot_id()
    p = os.path.join(t.meta_dir, f"snap-{sid}.json")
    d = read_json(p)
    d.pop("manifest_infos")
    with open(p, "w") as f:
        json.dump(d, f)
    t2 = LakeTable.load(spark, tmp_table_dir)
    assert t2.snapshot().manifest_infos == []
    assert [r["id"] for r in t2.scan().collect()] == ["a"]
    t2.append(_df(spark, [("b", 2)]))
    after = t2.snapshot()
    assert len(after.manifest_infos) == len(after.manifests) == 2


def test_gc_keeps_manifests_shared_with_live_snapshots(spark, tmp_table_dir):
    """Expiry must not delete a manifest still referenced by a kept
    snapshot — with reuse the same manifest is live across many
    snapshots."""
    t = _mk(spark, tmp_table_dir)
    t.append(_df(spark, [("a", 1)]))
    first_manifests = set(t.snapshot().manifests)
    for i in range(3):
        t.append(_df(spark, [(f"k{i}", i)]))
    t.expire_snapshots(keep_last=1)
    head = t.snapshot()
    # the head still references the very first manifest; it must exist
    assert first_manifests <= set(head.manifests)
    for m in head.manifests:
        assert os.path.exists(os.path.join(t.meta_dir, m))
    assert t.scan().count() == 4


def test_removal_after_merging_still_targets_correctly(spark, tmp_table_dir):
    """Once small manifests have been folded together, a merged manifest
    covers MANY commit dirs — a remove commit must still find and drop
    the victim entry inside it (and only rewrite that one manifest)."""
    t = _mk(
        spark,
        tmp_table_dir,
        properties={
            "commit.manifest-min-count-to-merge": 3,
            "commit.manifest-target-entries": 1000,
        },
    )
    for i in range(8):
        t.append(_df(spark, [(f"k{i}", i)]))
    assert len(t.snapshot().manifests) <= 4  # folding happened
    victim = next(
        e
        for e in t.data_files()
        if t.read_entries([e]).collect()[0]["id"] == "k3"
    )
    t.commit("delete", [], remove_paths={victim.path})
    assert sorted(r["id"] for r in t.scan().collect()) == sorted(
        f"k{i}" for i in range(8) if i != 3
    )
    # and appends continue to reuse whatever survived
    before = set(t.snapshot().manifests)
    t.append(_df(spark, [("k9", 9)]))
    assert before <= set(t.snapshot().manifests)


def test_manifest_summary_is_conservative_on_missing_stats():
    from airbyte_spark.lake.format import DataFileEntry

    e1 = DataFileEntry(
        path="/d/x/f1.parquet", rows=1, bytes=10,
        stats={"id": {"min": "a", "max": "b", "null_count": 0}},
    )
    e2 = DataFileEntry(path="/d/y/f2.parquet", rows=2, bytes=20, stats={})
    info = manifest_summary([e1, e2])
    # one statless entry -> the column is NOT summarized (no false pruning)
    assert "id" not in info["stats"]
    assert info["entry_count"] == 2
    assert sorted(info["dirs"]) == ["/d/x", "/d/y"]


def test_key_range_manifest_pruning_survives_type_widening(spark, tmp_table_dir):
    """Manifest summaries written under int stats must still prune (and
    never misprune) after the column widens to long — stat strings are
    coerced with the CURRENT schema type at compare time."""
    int_schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("v", IntegerType()),
        ]
    )
    long_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("v", IntegerType()),
        ]
    )
    t = LakeTable.create(spark, tmp_table_dir, int_schema, primary_key=["id"])
    t.append(spark.createDataFrame([(i, i) for i in range(10)], int_schema))
    t.evolve_schema(long_schema)
    t.append(
        spark.createDataFrame([(10**10 + i, i) for i in range(5)], long_schema)
    )
    rows = t.scan(key_range=("id", 3, 4)).collect()
    assert sorted(r["id"] for r in rows) == [3, 4]
    rows = t.scan(key_range=("id", 10**10, 10**10 + 1)).collect()
    assert sorted(r["id"] for r in rows) == [10**10, 10**10 + 1]


def test_crashed_commit_leaves_only_gc_able_orphans(spark, tmp_table_dir, monkeypatch):
    """A crash AFTER manifests are written but BEFORE the ref swap must
    leave the table unchanged, and expire+GC must reap the orphan
    manifests and data files without touching live ones."""
    import glob as _glob

    t = _mk(spark, tmp_table_dir)
    t.append(_df(spark, [("a", 1)]))

    def boom(self, *a, **k):
        raise RuntimeError("crash before ref swap")

    monkeypatch.setattr(LakeTable, "_swap_ref", boom)
    with pytest.raises(RuntimeError):
        t.append(_df(spark, [("b", 2)]))
    monkeypatch.undo()
    assert [r["id"] for r in t.scan().collect()] == ["a"]
    live = set(t.snapshot().manifests)
    on_disk = {
        os.path.basename(p)
        for p in _glob.glob(os.path.join(t.meta_dir, "manifest-*.json"))
    }
    assert on_disk > live  # the crashed commit's manifests are orphaned
    t.expire_snapshots(keep_last=1)
    after = {
        os.path.basename(p)
        for p in _glob.glob(os.path.join(t.meta_dir, "manifest-*.json"))
    }
    assert after == live
    assert t.remove_orphan_files()  # the crashed append's data file
    assert [r["id"] for r in t.scan().collect()] == ["a"]


def test_huge_commits_slice_into_target_sized_manifests():
    """A single commit adding more entries than the manifest target must
    write MULTIPLE manifests — one giant manifest can't be rebalanced by
    commit-time merging and defeats removal targeting."""
    from airbyte_spark.lake.format import DataFileEntry
    from airbyte_spark.lake.table import _group_add_entries

    entries = [
        DataFileEntry(path=f"/d/c{i // 100:03d}/part-{i:05d}.parquet", rows=1, bytes=1)
        for i in range(2500)
    ]
    groups = _group_add_entries(entries, target_entries=1000)
    assert [len(g) for g in groups] == [1000, 1000, 500]
    assert sorted(e.path for g in groups for e in g) == sorted(
        e.path for e in entries
    )


def test_mixed_content_manifest_never_partition_pruned():
    from airbyte_spark.lake.table import _manifest_may_match

    info = {
        "content": ["data", "equality-deletes"],
        "partitions": [{"p": "eu"}],
        "stats": {},
    }
    # scan keeps delete entries regardless of partition_filter, so a
    # mixed manifest must survive manifest-level partition pruning
    assert _manifest_may_match(info, {"p": "us"}, None, None)
    data_only = dict(info, content=["data"])
    assert not _manifest_may_match(data_only, {"p": "us"}, None, None)


def test_manifest_summary_drops_stringified_numeric_stats():
    """Decimal/float stats come back from the JSON round-trip as STRINGS
    (atomic_write_json default=str); min/max over those is lexicographic
    ('9.5' > '10.2'), so a summary built from them would mis-prune
    manifests whose entries DO intersect the scan range — silent row
    loss. The summary must omit such columns (conservative: unprunable);
    ISO temporal strings and true strings stay summarized because their
    lexicographic order IS the column's order."""
    from airbyte_spark.lake.format import DataFileEntry

    e1 = DataFileEntry(
        path="/d/x/f1.parquet", rows=1, bytes=10,
        stats={
            "amt": {"min": "9.5", "max": "9.5", "null_count": 0},
            "ts": {"min": "2026-01-02T00:00:00", "max": "2026-01-03T00:00:00"},
            "name": {"min": "alice", "max": "bob"},
        },
    )
    e2 = DataFileEntry(
        path="/d/x/f2.parquet", rows=1, bytes=10,
        stats={
            "amt": {"min": "10.2", "max": "10.2", "null_count": 0},
            "ts": {"min": "2026-01-01T00:00:00", "max": "2026-01-01T12:00:00"},
            "name": {"min": "carol", "max": "dave"},
        },
    )
    info = manifest_summary([e1, e2])
    assert "amt" not in info["stats"], "lexicographic numeric-string bounds"
    assert info["stats"]["ts"] == {
        "min": "2026-01-01T00:00:00", "max": "2026-01-03T00:00:00"
    }
    assert info["stats"]["name"] == {"min": "alice", "max": "dave"}
    # native numeric stats (fresh, pre-round-trip) still summarize
    f1 = DataFileEntry(path="/d/x/g1.parquet", rows=1, bytes=1,
                       stats={"v": {"min": 9.5, "max": 9.5}})
    f2 = DataFileEntry(path="/d/x/g2.parquet", rows=1, bytes=1,
                       stats={"v": {"min": 10.2, "max": 10.2}})
    assert manifest_summary([f1, f2])["stats"]["v"] == {"min": 9.5, "max": 10.2}


def test_removal_survivors_slice_into_target_sized_manifests(
    spark, tmp_table_dir
):
    """A removal spanning many manifests must NOT fold every survivor into
    one giant manifest: an oversized manifest never rebalances (merging
    only folds small manifests) and every later removal would reopen it —
    survivors are sliced to commit.manifest-target-entries like added
    entries (ADVICE r4)."""
    t = _mk(
        spark,
        tmp_table_dir,
        properties={
            "commit.manifest-target-entries": 16,
            "commit.manifest-min-count-to-merge": 1000,
        },
    )
    # 4 appends x 12 files = 4 manifests of 12 entries
    for b in range(4):
        t.append(
            _df(spark, [(f"k{b}-{i}", b * 10 + i) for i in range(24)]).repartition(12)
        )
    assert all(i["entry_count"] <= 16 for i in t.snapshot().manifest_infos)
    # remove one file from every manifest in ONE commit
    per_manifest_victim = []
    snap = t.snapshot()
    for name in snap.manifests:
        entries = t._read_entries_of(name)
        per_manifest_victim.append(entries[0].path)
    t.commit("delete", [], remove_paths=set(per_manifest_victim))
    after = t.snapshot()
    sizes = [i["entry_count"] for i in after.manifest_infos]
    assert sum(sizes) == 44  # 48 files - 4 removed
    assert max(sizes) <= 16, f"oversized survivor manifest: {sizes}"
    assert len(sizes) >= 3, f"survivors folded into too few manifests: {sizes}"
    # and no rows were lost
    assert t.scan().count() == sum(
        e.rows
        for n in after.manifests
        for e in t._read_entries_of(n)
    )
