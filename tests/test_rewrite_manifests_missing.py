"""rewrite_manifests mode="missing" (r6): complete entries are carried
forward without any file I/O; only stat-stripped entries pay a footer
read. Pinned so the steady maintenance pass stays metadata-only."""

import os
import sys

from pyspark.sql.types import LongType, StringType, StructField, StructType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbyte_spark.lake.table import LakeTable  # noqa: E402

SCHEMA = StructType(
    [StructField("id", StringType(), False), StructField("v", LongType())]
)


def _mk(spark, root, rows):
    t = LakeTable.create(spark, root, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_missing_mode_refooters_only_stripped_entries(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, [(f"k{i:03d}", i) for i in range(50)])
    t.append(spark.createDataFrame([(f"z{i}", 100 + i) for i in range(5)], SCHEMA))
    entries = t.data_files()
    assert all("id" in e.stats and "v" in e.stats for e in entries)
    # strip one entry's stats and commit the damage (simulates an import
    # path that never read footers)
    victim = entries[0]
    victim.stats = {}
    t.commit(
        "append", [victim], remove_paths={victim.path},
        summary={"test": "strip"},
    )
    import airbyte_spark.lake.table as tbl

    calls: list[list[str]] = []
    orig = tbl.collect_file_entries

    def spy(spark_, paths, cols, gen=0, schema_id=0):
        calls.append(sorted(paths))
        return orig(spark_, paths, cols, gen, schema_id=schema_id)

    tbl.collect_file_entries = spy
    try:
        t.rewrite_manifests()
    finally:
        tbl.collect_file_entries = orig
    # only the stripped file was re-read
    assert calls == [[victim.path]]
    after = {e.path: e for e in t.data_files()}
    assert "id" in after[victim.path].stats
    assert all("id" in e.stats and "v" in e.stats for e in after.values())
    # full mode still re-reads everything
    calls.clear()
    tbl.collect_file_entries = spy
    try:
        t.rewrite_manifests(mode="full")
    finally:
        tbl.collect_file_entries = orig
    assert sorted(p for ps in calls for p in ps) == sorted(after.keys())
