"""Distributed merge planning (Iceberg DistributedDataScan analog):
past `merge.planning.distributed-threshold` live entries, manifests are
parsed on EXECUTORS (LakeTable.entries_df) and only candidate entries
come back to the driver — merge results must be byte-identical to the
driver-list planning path."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import merge_into

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("v", StringType()),
        StructField("cur", IntegerType()),
    ]
)


def _table(spark, root, threshold):
    return LakeTable.create(
        spark,
        root,
        SCHEMA,
        primary_key=["id"],
        properties={"merge.planning.distributed-threshold": threshold},
    )


def _seed(spark, t, n=60, files=4):
    for f in range(files):
        rows = [(i, f"v{i}", 0) for i in range(f * n, (f + 1) * n)]
        t.append(spark.createDataFrame(rows, SCHEMA))


def _batch(spark, ids):
    return spark.createDataFrame([(i, f"new{i}", 1) for i in ids], SCHEMA)


def test_entries_df_matches_driver_list(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, 10**9)
    _seed(spark, t, n=20, files=3)
    # a MoR merge adds an equality-delete entry too
    merge_into(t, _batch(spark, [5, 25]), cursor_col="cur", mode="mor")
    driver = {
        (e.path, e.content, e.sequence or 0, e.rows)
        for e in t.all_files()
    }
    dist = {
        (r["path"], r["content"], r["sequence"], r["rows"])
        for r in t.entries_df(stats_col="id").collect()
    }
    assert driver == dist


def test_entries_df_carries_castable_stats(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, 10**9)
    _seed(spark, t, n=20, files=2)
    rows = (
        t.entries_df(stats_col="id")
        .where(F.col("content") == "data")
        .select(
            F.col("stat_min").try_cast("int").alias("lo"),
            F.col("stat_max").try_cast("int").alias("hi"),
        )
        .collect()
    )
    assert rows and all(
        r["lo"] is not None and r["hi"] >= r["lo"] for r in rows
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_distributed_planning_matches_driver_planning(
    spark, tmp_table_dir, mode
):
    import os

    roots = [os.path.join(tmp_table_dir, d) for d in ("drv", "dist")]
    finals = []
    for root, threshold in zip(roots, [10**9, 0]):
        t = _table(spark, root, threshold)
        _seed(spark, t)
        # update a localized key range + insert new keys + a second pass
        merge_into(t, _batch(spark, [3, 7, 11, 300]), cursor_col="cur", mode=mode)
        merge_into(t, _batch(spark, [7, 301, 150]), cursor_col="cur", mode=mode)
        finals.append(
            sorted(
                (r["id"], r["v"], r["cur"])
                for r in t.scan().select("id", "v", "cur").collect()
            )
        )
    assert finals[0] == finals[1]
    assert any(v.startswith("new") for _, v, _ in finals[0])


@pytest.mark.parametrize("threshold", [10**9, 0])
def test_distributed_dead_delete_retirement_matches_driver(
    spark, tmp_table_dir, threshold
):
    """Partition-scoped cluster with the distributed survivor pass
    (threshold 0) must retire exactly the deletes the driver pass
    retires — and NEVER a delete that still hits another partition."""
    import os

    from airbyte_spark.operators.cluster import cluster

    part_schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("v", StringType()),
            StructField("cur", IntegerType()),
            StructField("p", StringType()),
        ]
    )
    root = os.path.join(tmp_table_dir, f"t{threshold}")
    t = LakeTable.create(
        spark,
        root,
        part_schema,
        primary_key=["id"],
        partition_by=["p"],
        properties={"cluster.planning.distributed-threshold": threshold},
    )
    rows = [(i, f"v{i}", 0, "eu" if i % 2 else "us") for i in range(40)]
    t.append(spark.createDataFrame(rows, part_schema))
    # one MoR batch updating keys in BOTH partitions -> one delete file
    # whose keys hit eu AND us
    batch = spark.createDataFrame(
        [(3, "new3", 1, "eu"), (4, "new4", 1, "us")], part_schema
    )
    merge_into(t, batch, cursor_col="cur", mode="mor")
    assert t.delete_files()
    # fold deletes in eu only: the delete still hits us -> must survive
    cluster(
        t, dims=["id"], partition_filter={"p": "eu"},
        scope="dirty", fold_deletes="always", bits=16,
    )
    assert t.delete_files(), "delete hitting another partition was retired"
    eu_state = sorted(
        (r["id"], r["v"]) for r in t.scan().select("id", "v").collect()
    )
    assert (3, "new3") in eu_state and (4, "new4") in eu_state
    # now fold us too: nothing left for the delete to hit -> retired
    cluster(
        t, dims=["id"], partition_filter={"p": "us"},
        scope="dirty", fold_deletes="always", bits=16,
    )
    assert not t.delete_files()
    final = sorted(
        (r["id"], r["v"]) for r in t.scan().select("id", "v").collect()
    )
    assert (3, "new3") in final and (4, "new4") in final
    assert len(final) == 40


def test_distributed_planning_with_partition_pruning(spark, tmp_table_dir):
    import os

    part_schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("v", StringType()),
            StructField("cur", IntegerType()),
            StructField("p", StringType()),
        ]
    )
    finals = []
    for sub, threshold in [("drv", 10**9), ("dist", 0)]:
        root = os.path.join(tmp_table_dir, sub)
        t = LakeTable.create(
            spark,
            root,
            part_schema,
            primary_key=["id"],
            partition_by=["p"],
            properties={
                "merge.planning.distributed-threshold": threshold,
                "merge.partition-pruning": True,
            },
        )
        rows = [(i, f"v{i}", 0, "eu" if i % 2 else "us") for i in range(80)]
        t.append(spark.createDataFrame(rows, part_schema))
        batch = spark.createDataFrame(
            [(3, "new3", 1, "eu"), (99, "new99", 1, "us")], part_schema
        )
        merge_into(t, batch, cursor_col="cur", mode="mor")
        finals.append(
            sorted(
                (r["id"], r["v"], r["p"])
                for r in t.scan().select("id", "v", "p").collect()
            )
        )
    assert finals[0] == finals[1]
    assert (3, "new3", "eu") in finals[0] and (99, "new99", "us") in finals[0]


def test_distributed_compact_candidates_match_driver(spark, tmp_table_dir):
    """driver ≡ distributed compact planning: same bins, same final
    state, same skipped accounting — past the threshold the driver
    collects only the small files' entry blobs."""
    import os

    from airbyte_spark.operators.compact import compact

    sch = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("v", StringType()),
        ]
    )
    results = []
    for sub, threshold in [("drv", 10**9), ("dist", 0)]:
        root = os.path.join(tmp_table_dir, f"c{sub}")
        t = LakeTable.create(
            spark, root, sch, primary_key=["id"],
            properties={"compact.planning.distributed-threshold": threshold},
        )
        for i in range(4):  # 4 small files + 1 "big" one
            t.append(
                spark.createDataFrame(
                    [(i * 10 + j, f"v{j}" * 3) for j in range(10)], sch
                ).coalesce(1)
            )
        t.append(
            spark.createDataFrame(
                [(1000 + j, "w" * 2000) for j in range(3000)], sch
            ).coalesce(1)
        )
        big = [e.path for e in t.data_files() if e.bytes >= 40 * 1024]
        res = compact(t, target_file_bytes=64 * 1024, small_file_threshold=0.75)
        results.append(
            (
                len(res.plan.bins),
                res.files_before,
                res.files_after,
                res.plan.skipped_files,
                sorted(
                    (r["id"], r["v"]) for r in t.scan().collect()
                ),
            )
        )
        # the big file was never a candidate and keeps its exact path
        assert set(big) <= {e.path for e in t.data_files()}
    assert results[0] == results[1]


def test_distributed_compact_partial_progress_validation(spark, tmp_table_dir):
    """Partial-progress chunk validation past the threshold runs the
    victims-live check as an entries_df semi-join — same abandon/keep
    behavior as the driver path when a victim disappears mid-pass."""
    import os

    from airbyte_spark.operators.compact import compact

    sch = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("v", StringType()),
        ]
    )
    root = os.path.join(tmp_table_dir, "pp")
    t = LakeTable.create(
        spark, root, sch, primary_key=["id"],
        properties={"compact.planning.distributed-threshold": 0},
    )
    for i in range(6):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, f"v{j}" * 50) for j in range(10)], sch
            ).coalesce(1)
        )
    # target sized to fit exactly two small files per bin -> >=3 bins,
    # so the partial path actually lands multiple independent commits
    sizes = sorted(e.bytes for e in t.data_files())
    res = compact(
        t, target_file_bytes=2 * sizes[-1] + 1, partial_progress=True,
        max_commits=3,
    )
    assert res.skipped_chunks == 0 and len(res.snapshots) >= 2
    assert res.files_after == len(t.data_files())
    assert sorted(r["id"] for r in t.scan().collect()) == sorted(
        i * 10 + j for i in range(6) for j in range(10)
    )
