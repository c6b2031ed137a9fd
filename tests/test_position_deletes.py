"""Position deletes (Iceberg v2): delete_where, scan application,
equality->position retirement, and interaction with MoR merge deletes.

Core invariant (north rule): scan output after any position-delete
operation equals the same logical filter applied to the pre-op scan, and
maintenance rewrites never resurrect tombstoned rows.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.posdeletes import (
    dead_position_deletes,
    delete_where,
    retire_equality_deletes,
)


def _rows(df, cols=("id",)):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture
def table(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema=StructType(
            [
                StructField("id", LongType(), False),
                StructField("grp", StringType()),
                StructField("v", LongType()),
            ]
        ),
        primary_key=["id"],
        stats_columns=["id", "grp"],
    )
    # three files with known contents: ids 0-9 / 10-19 / 20-29
    for lo in (0, 10, 20):
        df = spark.range(lo, lo + 10).select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
            (F.col("id") * 100).alias("v"),
        )
        t.append(df.coalesce(1))
    return t


def test_delete_where_scan_matches_filter(spark, table):
    before = _rows(table.scan())
    assert len(before) == 30
    res = delete_where(table, "grp = 'odd' and id < 15")
    assert res.matched_rows == 7  # 1,3,5,7,9,11,13
    after = _rows(table.scan())
    assert after == [(i,) for i in range(30) if not (i % 2 == 1 and i < 15)]
    # delete files carry their referenced inventory
    pos = table.position_delete_files()
    assert len(pos) == 1
    assert pos[0].referenced is not None and len(pos[0].referenced) == 2
    assert res.removed_files == 0


def test_delete_where_full_file_is_metadata_only(spark, table):
    files_before = {e.path for e in table.data_files()}
    res = delete_where(table, F.col("id") >= 20)
    # the whole 20-29 file matches -> dropped from the snapshot, no
    # tombstones written at all
    assert res.removed_files == 1
    assert res.delete_rows == 0
    assert table.position_delete_files() == []
    assert len(table.data_files()) == 2
    assert {e.path for e in table.data_files()} < files_before
    assert _rows(table.scan()) == [(i,) for i in range(20)]


def test_delete_where_no_match_is_noop(spark, table):
    head = table.current_snapshot_id()
    res = delete_where(table, F.col("id") > 1000)
    assert res.snapshot is None
    assert table.current_snapshot_id() == head


def test_delete_where_time_travel_preserves_history(spark, table):
    pre = table.current_snapshot_id()
    delete_where(table, "id % 3 = 0")
    assert len(_rows(table.scan(snapshot_id=pre))) == 30
    assert _rows(table.scan()) == [(i,) for i in range(30) if i % 3 != 0]


def test_delete_where_stacks_and_column_projection(spark, table):
    delete_where(table, "id in (0, 5)")
    delete_where(table, "id in (5, 7, 25)")
    got = table.scan(columns=["id", "v"])
    assert _rows(got, ("id", "v")) == [
        (i, i * 100) for i in range(30) if i not in (0, 5, 7, 25)
    ]
    assert len(table.position_delete_files()) == 2


def test_delete_where_with_key_range_scan(spark, table):
    delete_where(table, "id in (2, 12, 22)")
    got = table.scan(key_range=("id", 10, 25))
    assert _rows(got) == [(i,) for i in range(10, 26) if i not in (12, 22)]


def test_mixed_position_and_equality_deletes(spark, table):
    from airbyte_spark.operators.merge import merge_into

    delete_where(table, "id in (1, 11)")
    # MoR upsert: updates id 2, deletes id 3 via CDC
    batch = spark.createDataFrame(
        [(2, "even", 99999, None), (3, "odd", 88888, "2024-01-01T00:00:00Z")],
        "id long, grp string, v long, _ab_cdc_deleted_at string",
    )
    merge_into(table, batch, cursor_col="v", cdc_col="_ab_cdc_deleted_at", mode="mor")
    got = {r["id"]: r["v"] for r in table.scan().collect()}
    assert 1 not in got and 11 not in got and 3 not in got
    assert got[2] == 99999
    assert len(got) == 27


def test_retire_equality_deletes_scan_identical(spark, table):
    from airbyte_spark.operators.merge import merge_into

    batch = spark.createDataFrame(
        [(4, "even", 70000, None), (14, "even", 70000, "del"), (99, "odd", 70000, None)],
        "id long, grp string, v long, _ab_cdc_deleted_at string",
    )
    merge_into(table, batch, cursor_col="v", cdc_col="_ab_cdc_deleted_at", mode="mor")
    before = _rows(table.scan(), ("id", "v"))
    assert len(table.delete_files()) == 1
    res = retire_equality_deletes(table)
    assert res.converted_delete_files == 1
    assert table.delete_files() == []
    pos = table.position_delete_files()
    assert len(pos) == 1
    # only the two files containing ids 4 and 14 actually matched
    assert res.referenced_files == 2
    assert _rows(table.scan(), ("id", "v")) == before
    # bloom pruning kept the scan proportional to the update: candidate
    # files are capped by the bloom probe, and the untouched 20-29 file
    # (plus the fresh MoR insert file for id 99) was never referenced
    assert pos[0].referenced is not None
    assert len(pos[0].referenced) == 2


def test_retire_noop_without_deletes(spark, table):
    head = table.current_snapshot_id()
    res = retire_equality_deletes(table)
    assert res.snapshot is None
    assert table.current_snapshot_id() == head


def test_retire_with_stale_deletes_only_drops_them(spark, table):
    from airbyte_spark.operators.merge import merge_into

    # a delete era whose keys hit nothing that is still live: upsert a new
    # key (no prior version) -> the MoR delete file's key has no older row
    batch = spark.createDataFrame([(500, "odd", 1)], "id long, grp string, v long")
    merge_into(table, batch, cursor_col="v", cdc_col=None, mode="mor")
    assert len(table.delete_files()) == 1
    before = _rows(table.scan())
    res = retire_equality_deletes(table)
    assert res.snapshot is not None
    assert table.delete_files() == []
    assert res.position_delete_rows == 0
    assert table.position_delete_files() == []
    assert _rows(table.scan()) == before


def test_dead_position_deletes_predicate(spark, table):
    delete_where(table, "id in (3, 13)")
    pos = table.position_delete_files()
    assert len(pos) == 1
    refs = pos[0].referenced
    data = table.data_files()
    # removing only one referenced file keeps the entry alive
    assert dead_position_deletes(
        table, pos, {refs[0]}, survivors=[e for e in data if e.path != refs[0]]
    ) == []
    # removing every referenced file retires it (driver path)
    survivors = [e for e in data if e.path not in set(refs)]
    assert dead_position_deletes(table, pos, set(refs), survivors=survivors) == [
        pos[0]
    ]
    # distributed path (no survivor list) agrees
    assert dead_position_deletes(table, pos, set(refs)) == [pos[0]]
    assert dead_position_deletes(table, pos, {refs[0]}) == []


def test_delete_where_after_schema_evolution(spark, table):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    table.evolve_schema(
        StructType(
            [
                StructField("id", LongType()),
                StructField("grp", StringType()),
                StructField("v", LongType()),
                StructField("extra", StringType()),
            ]
        )
    )
    table.append(
        spark.createDataFrame([(100, "even", 1, "x"), (101, "odd", 1, "y")],
                              "id long, grp string, v long, extra string")
    )
    # condition touches a column absent from the old files (aligned NULL)
    res = delete_where(table, "extra = 'y' or id = 5")
    assert res.matched_rows == 2
    got = _rows(table.scan())
    assert (101,) not in got and (5,) not in got and (100,) in got


def test_compact_folds_position_deletes(spark, table):
    from airbyte_spark.operators.compact import compact

    delete_where(table, "id in (1, 11, 21)")
    before = _rows(table.scan(), ("id", "v"))
    res = compact(table, target_file_bytes=1 << 20)
    assert res.snapshot is not None and res.files_after < 3
    # packed files carry new paths: tombstones were folded, not dropped
    assert _rows(table.scan(), ("id", "v")) == before
    # every referenced file was rewritten -> the tombstone entry retired
    assert table.position_delete_files() == []


def test_cluster_folds_position_deletes(spark, table):
    from airbyte_spark.operators.cluster import cluster

    delete_where(table, "grp = 'odd'")
    before = _rows(table.scan(), ("id", "v"))
    assert len(before) == 15
    res = cluster(table, dims=["id", "v"], curve="zorder")
    assert res.snapshot is not None
    assert _rows(table.scan(), ("id", "v")) == before
    assert table.position_delete_files() == []
    assert res.dropped_delete_files == 1


def test_cluster_dirty_keeps_live_position_deletes(spark, table):
    from airbyte_spark.operators.cluster import cluster

    # settle the table first (a never-clustered table rewrites everything)
    cluster(table, dims=["id", "v"], curve="zorder")
    delete_where(table, "id in (2, 3)")
    before = _rows(table.scan())
    # dirty pass with folding off: tombstoned files are NOT victims and the
    # tombstone entry stays live; scan stays correct via the anti-join
    res = cluster(
        table, dims=["id", "v"], curve="zorder", scope="dirty",
        fold_deletes="never",
    )
    assert table.position_delete_files() != []
    assert _rows(table.scan()) == before
    # forcing the fold rewrites the referenced files and retires the entry
    res = cluster(
        table, dims=["id", "v"], curve="zorder", scope="dirty",
        fold_deletes="always",
    )
    assert res.snapshot is not None
    assert res.victim_reasons.get("delete-hit", 0) >= 1
    assert table.position_delete_files() == []
    assert _rows(table.scan()) == before


def test_cow_merge_folds_position_deletes(spark, table):
    from airbyte_spark.operators.merge import merge_into

    delete_where(table, "id in (1, 3)")
    batch = spark.createDataFrame(
        [(2, "even", 77777)], "id long, grp string, v long"
    )
    merge_into(table, batch, cursor_col="v", cdc_col=None, mode="cow")
    got = {r["id"]: r["v"] for r in table.scan().collect()}
    assert got[2] == 77777
    assert 1 not in got and 3 not in got
    assert len(got) == 28


def test_rewrite_deletes_folds_both_kinds(spark, table):
    from airbyte_spark.operators.deletes import rewrite_deletes
    from airbyte_spark.operators.merge import merge_into

    delete_where(table, "id in (5, 15)")
    batch = spark.createDataFrame(
        [(6, "even", 88888, "del")],
        "id long, grp string, v long, _ab_cdc_deleted_at string",
    )
    merge_into(table, batch, cursor_col="v", cdc_col="_ab_cdc_deleted_at", mode="mor")
    before = _rows(table.scan())
    assert len(before) == 27
    res = rewrite_deletes(table)
    assert res.dropped_delete_files == 2  # one eq era + one pos entry
    assert table.delete_files() == [] and table.position_delete_files() == []
    assert _rows(table.scan()) == before


def test_victim_selectors_agree_on_position_deletes(spark, table):
    from airbyte_spark.operators.cluster import (
        cluster,
        select_cluster_victims,
        select_cluster_victims_distributed,
    )

    cluster(table, dims=["id", "v"], curve="zorder")
    delete_where(table, "id = 4")
    order_id = table.ensure_sort_order(["id", "v"], "zorder", 21)
    deletes = table.delete_files()
    pos = table.position_delete_files()
    driver, d_reasons = select_cluster_victims(
        table, table.data_files(), deletes, order_id, 1 << 20,
        fold_deletes=True, pos_deletes=pos,
    )
    dist, x_reasons, files_before, _ = select_cluster_victims_distributed(
        table, deletes, order_id, 1 << 20,
        fold_deletes=True, pos_deletes=pos,
    )
    assert {e.path for e in driver} == {e.path for e in dist}
    assert d_reasons == x_reasons
    assert d_reasons["delete-hit"] >= 1
    assert files_before == len(table.data_files())


def test_expired_tombstone_files_are_garbage_collected(spark, table):
    import os

    from airbyte_spark.operators.cluster import cluster

    delete_where(table, "id in (1, 11)")
    pos_path = table.position_delete_files()[0].path
    assert os.path.exists(pos_path)
    # full cluster folds + retires the tombstone entry; expire + GC must
    # then physically remove the now-unreachable file
    cluster(table, dims=["id", "v"], curve="zorder")
    assert table.position_delete_files() == []
    table.expire_snapshots(keep_last=1)
    removed = table.remove_orphan_files(grace_period_ms=0)
    assert not os.path.exists(pos_path)
    assert pos_path in set(removed)


def test_compact_position_deletes_folds_tombstone_files(spark, table):
    from airbyte_spark.operators.posdeletes import compact_position_deletes

    delete_where(table, "id = 1")
    delete_where(table, "id in (1, 12)")  # duplicate tombstone for id=1
    delete_where(table, "id = 23")
    before = _rows(table.scan())
    assert len(table.position_delete_files()) == 3
    res = compact_position_deletes(table)
    assert res.input_files == 3 and res.output_files == 1
    assert res.rows_after == 3  # the duplicate (file,pos) pair collapsed
    pos = table.position_delete_files()
    assert len(pos) == 1 and pos[0].rows == 3
    assert pos[0].referenced is not None and len(pos[0].referenced) == 3
    assert _rows(table.scan()) == before


def test_compact_position_deletes_drops_dead_path_rows(spark, table):
    from airbyte_spark.operators.compact import compact
    from airbyte_spark.operators.posdeletes import compact_position_deletes

    delete_where(table, "id in (2, 25)")  # spans files 0-9 and 20-29
    delete_where(table, "id = 13")
    # CoW merge on id=4 rewrites the 0-9 file: the tombstone entry stays
    # live (it still references 20-29) but its row for the dead path is
    # inert and must be dropped by the compaction
    from airbyte_spark.operators.merge import merge_into

    batch = spark.createDataFrame([(4, "even", 99999)], "id long, grp string, v long")
    merge_into(table, batch, cursor_col="v", cdc_col=None, mode="cow")
    after_merge = _rows(table.scan())
    assert len(table.position_delete_files()) == 2
    res = compact_position_deletes(table)
    assert res.snapshot is not None
    assert res.rows_before == 3 and res.rows_after == 2
    assert _rows(table.scan()) == after_merge
    pos = table.position_delete_files()
    assert len(pos) == 1
    # only the still-live referenced files remain in the inventory
    assert len(pos[0].referenced) == 2


def test_compact_position_deletes_noop_below_threshold(spark, table):
    from airbyte_spark.operators.posdeletes import compact_position_deletes

    delete_where(table, "id = 1")
    head = table.current_snapshot_id()
    res = compact_position_deletes(table)
    assert res.snapshot is None
    assert table.current_snapshot_id() == head


def test_delete_where_pruning_hints(spark, table):
    # key_range prunes by manifest stats: only the 10-19 file is opened
    res = delete_where(table, "grp = 'odd'", key_range=("id", 12, 17))
    assert res.scanned_files == 1
    assert _rows(table.scan()) == [
        (i,) for i in range(30) if not (12 <= i <= 17 and i % 2 == 1)
    ]
    # a hint is an ANDed predicate: a too-narrow range cannot over-delete
    res = delete_where(table, "id >= 0", key_range=("id", 25, 27))
    assert res.matched_rows == 3
    assert _rows(table.scan()) == [
        (i,)
        for i in range(30)
        if not (12 <= i <= 17 and i % 2 == 1) and not (25 <= i <= 27)
    ]


def test_delete_where_partition_filter_hint(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "p"),
        schema=StructType(
            [
                StructField("id", LongType(), False),
                StructField("grp", StringType()),
                StructField("v", LongType()),
            ]
        ),
        primary_key=["id"],
        partition_by=["grp"],
    )
    df = spark.range(0, 40).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
        (F.col("id") * 10).alias("v"),
    )
    t.append(df)
    total = len(t.data_files())
    res = delete_where(t, "id < 10", partition_filter={"grp": "odd"})
    assert res.scanned_files < total
    got = sorted(r["id"] for r in t.scan().collect())
    assert got == [i for i in range(40) if not (i < 10 and i % 2 == 1)]


def test_retire_distributed_matches_driver(spark, table):
    from airbyte_spark.operators.cluster import delete_may_hit
    from airbyte_spark.operators.merge import merge_into
    from airbyte_spark.operators.posdeletes import _affected_entries_distributed

    batch = spark.createDataFrame(
        [(4, "even", 70000), (14, "even", 70000)], "id long, grp string, v long"
    )
    merge_into(table, batch, cursor_col="v", cdc_col=None, mode="mor")
    deletes = table.delete_files()
    schema, pk = table.schema(), table.primary_key
    cache: dict = {}
    driver = {
        e.path
        for e in table.data_files()
        if any(delete_may_hit(e, d, pk, schema, cache=cache) for d in deletes)
    }
    dist = {
        e.path
        for e in _affected_entries_distributed(
            table, deletes, pk, schema, "main", table.current_snapshot_id()
        )
    }
    assert driver == dist and driver


def test_retire_end_to_end_past_distributed_threshold(spark, tmp_path):
    from airbyte_spark.operators.merge import merge_into

    t = LakeTable.create(
        spark,
        str(tmp_path / "d"),
        schema=StructType(
            [
                StructField("id", LongType(), False),
                StructField("grp", StringType()),
                StructField("v", LongType()),
            ]
        ),
        primary_key=["id"],
        properties={"cluster.planning.distributed-threshold": "1"},
    )
    for lo in (0, 10, 20):
        t.append(
            spark.range(lo, lo + 10)
            .select(F.col("id"), F.lit("g").alias("grp"), (F.col("id") * 100).alias("v"))
            .coalesce(1)
        )
    batch = spark.createDataFrame([(5, "g", 99999)], "id long, grp string, v long")
    merge_into(t, batch, cursor_col="v", cdc_col=None, mode="mor")
    before = _rows(t.scan(), ("id", "v"))
    res = retire_equality_deletes(t)
    assert res.snapshot is not None and res.scanned_files >= 1
    assert t.delete_files() == []
    assert _rows(t.scan(), ("id", "v")) == before
