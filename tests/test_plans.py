"""Physical-plan quality gates: predicate pushdown, column pruning,
broadcast dims, whole-stage codegen. These are the `.explain("formatted")`
checks the engine's scale story rests on — a regression here silently
turns a 100 TB scan into a full-table read."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = entry.q_s2_cursor_bounded_scan(spark, SF)
    p = plan_of(df)
    assert "PushedFilters: [" in p
    assert "IsNotNull(ts)" in p or "GreaterThan(ts" in p


def test_column_pruning_in_projection(spark):
    """A 4-column projection must not read all 6 event columns."""
    df = entry.q_s2_cursor_bounded_scan(spark, SF)
    p = plan_of(df)
    frag = p[p.index("ReadSchema") :][:300]
    assert "props" not in frag, f"props must be pruned: {frag}"


def test_broadcast_dims_join(spark):
    df = entry.q_j_broadcast_dims(spark, SF)
    p = plan_of(df)
    assert p.count("BroadcastHashJoin") >= 3, p[:500]
    assert "SortMergeJoin" not in p


def test_whole_stage_codegen_in_agg(spark):
    """Pre-execution AQE plans don't print WholeStageCodegen spans; run the
    query and assert the FINAL plan stayed inside codegen'd hash aggregates
    with a vectorized (Batched) parquet scan."""
    df = entry.q_q1_pricing_summary(spark, SF)
    df.collect()
    p = plan_of(df)
    assert "isFinalPlan=true" in p
    assert "HashAggregate" in p
    assert "Batched: true" in p  # vectorized parquet reader
    # whole-stage codegen shows as *(n) markers in the final simple plan
    assert "WholeStageCodegen" in p or "*(" in p


def test_merge_key_plan_prunes_payload(spark):
    """The dedup/window side of a merge must never materialize `bytes` —
    column pruning on the slim projection is what makes the W1 window
    affordable at 10^12 rows."""
    import tempfile

    from airbyte_spark.datagen import generate_update_batch
    from airbyte_spark.operators.merge import dedup_batch

    d = tempfile.mkdtemp(prefix="planchk-")
    generate_update_batch(spark, 100, 50, num_partitions=2).write.parquet(d + "/b")
    src = spark.read.parquet(d + "/b")  # staged batch, like a real sync
    slim = src.select("image_id", "updated_at", "_airbyte_extracted_at",
                      "_airbyte_raw_id")
    winners = dedup_batch(slim, ["image_id"], "updated_at")
    p = plan_of(winners)
    frag = p[p.index("ReadSchema") :][:400]
    assert "bytes" not in frag and "binary" not in frag, frag


def test_partial_aggregation_before_shuffle(spark):
    """groupBy must show two-phase agg (partial_ before the exchange)."""
    df = entry.q_a2_partition_histogram(spark, SF)
    p = plan_of(df)
    assert "partial_" in p, p


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key must sort-merge join with zero
    shuffles (the write-once/join-many co-location play)."""
    from airbyte_spark.sources.bucketed import bucketed_join, write_bucketed

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "b_orders", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    j = bucketed_join(spark, "b_lineitem", "b_orders", on=["l_orderkey"])
    p = plan_of(j)
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p
    if "SortMergeJoin" in p:
        assert "Exchange" not in p, p[:800]
    # and it's correct
    expect = li.join(o, "l_orderkey").count()
    assert j.count() == expect
    spark.sql("DROP TABLE b_lineitem")
    spark.sql("DROP TABLE b_orders")


def test_mor_scan_plan_broadcasts_deletes(spark, tmp_table_dir):
    """The MoR read path's scale contract: micro-batch-sized delete sets
    apply as a BROADCAST anti-join (never a shuffle of the data side), and
    a column-pruned scan over a delete-carrying table still prunes the
    payload out of the parquet read."""
    import datetime as dt

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.merge import merge_into

    schema = StructType(
        [
            StructField("image_id", StringType(), False),
            StructField("caption", StringType()),
            StructField("payload", StringType()),
            StructField("_airbyte_raw_id", StringType()),
            StructField("_airbyte_extracted_at", TimestampType()),
        ]
    )
    src_schema = StructType(
        list(schema.fields) + [StructField("updated_at", TimestampType())]
    )
    ts = dt.datetime(2026, 3, 1)
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["image_id"])
    t.append(
        spark.createDataFrame(
            [(f"k{i}", f"c{i}", "X" * 100, f"r{i}", ts) for i in range(200)], schema
        )
    )
    merge_into(
        t,
        spark.createDataFrame(
            [(f"k{i}", "upd", "Y" * 100, f"s{i}", ts, ts) for i in range(0, 200, 10)],
            src_schema,
        ),
        mode="mor",
    )
    assert t.delete_files()
    df = t.scan(columns=["image_id", "caption"])
    p = plan_of(df)
    assert "BroadcastHashJoin" in p and "LeftOuter" in p, p[:800]
    assert "SortMergeJoin" not in p
    frag = p[p.index("ReadSchema") :][:300]
    assert "payload" not in frag, f"payload must be pruned: {frag}"


def test_topk_uses_take_ordered(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject, not a
    global sort."""
    df = entry.q_o2_order_topk(spark, SF)
    p = plan_of(df)
    assert "TakeOrderedAndProject" in p


def test_mor_many_batches_plan_stays_flat(spark, tmp_table_dir):
    """Scale guard: after MANY MoR micro-batches the scan plan must remain
    ONE parquet scan per schema (file->sequence via map literal), not a
    per-batch union — and exactly one anti-join for all delete files."""
    import datetime as dt

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.merge import merge_into

    # cursor lives in the base schema: keeps this test single-schema so the
    # ONLY possible source of plan growth is the MoR batch count
    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("v", IntegerType()),
            StructField("_airbyte_raw_id", StringType()),
            StructField("_airbyte_extracted_at", TimestampType()),
            StructField("updated_at", TimestampType()),
        ]
    )
    ts0 = dt.datetime(2026, 5, 1)
    # delete-debt auto-fold OFF: this test pins the worst-case plan shape
    # when every delete era stays live (the policy-bounded case is
    # test_merge_mor.py::test_mor_delete_debt_auto_fold)
    t = LakeTable.create(
        spark, tmp_table_dir, schema, primary_key=["id"],
        properties={"merge.mor.max-delete-eras": "0"},
    )
    t.append(
        spark.createDataFrame(
            [(f"k{i}", 0, f"r{i}", ts0, ts0) for i in range(50)], schema
        )
    )
    for b in range(12):
        src = spark.createDataFrame(
            [(f"k{(b * 7 + j) % 50}", b + 1, f"s{b}-{j}",
              ts0, ts0 + dt.timedelta(days=b + 1)) for j in range(5)],
            schema,
        )
        merge_into(t, src, mode="mor")
    assert len(t.delete_files()) == 12
    df = t.scan()
    p = plan_of(df)
    # 13 data commits + 12 delete files, but: one schema -> ONE data scan,
    # one delete-keys scan, one aggregate, one join — independent of the
    # number of micro-batches
    assert p.count("Scan parquet") == 2, p[:1200]
    assert p.count("BroadcastHashJoin") == 1
    assert "Union" not in p
    # and it is still correct: latest version per key
    got = {r["id"]: r["v"] for r in df.collect()}
    assert len(got) == 50 and max(got.values()) == 12


def test_limit_compiles_to_incremental_collect(spark):
    """O3 adaptive LIMIT: Spark's CollectLimit executes incrementally (scan
    1 partition, then grow — SparkPlan.executeTake), which IS the
    reference's adaptive-LIMIT behavior; assert the plan uses it rather
    than a global sort/exchange."""
    df = spark.read.parquet(f"{SF}/lineitem.parquet").limit(7)
    p = plan_of(df)
    assert "CollectLimit" in p, p[:400]
    assert "Sort" not in p
    assert len(df.collect()) == 7


def test_position_delete_scan_plan(spark, tmp_table_dir):
    """Scale contract of the position-delete read path: tombstones apply
    as a BROADCAST left-anti join (the data side never shuffles for it),
    and only files in the tombstone's referenced inventory pay the probe —
    the clean group is a separate scan with no _metadata projection."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.posdeletes import delete_where

    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("grp", StringType()),
            StructField("payload", StringType()),
        ]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["id"])
    for lo in (0, 100):
        t.append(
            spark.range(lo, lo + 100)
            .select(
                F.col("id"),
                F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("grp"),
                F.lit("x" * 100).alias("payload"),
            )
            .coalesce(1)
        )
    delete_where(t, "id in (3, 5)")  # references only the first file
    df = t.scan()
    p = plan_of(df)
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p[:800]
    assert "SortMergeJoin" not in p
    # the un-referenced file reads without the metadata projection: two
    # data scans, only one of them carrying row_index
    assert p.count("row_index") >= 1
    data_scans = [
        ln for ln in p.splitlines() if "Scan parquet" in ln and "-g0" in ln
    ]
    assert len(data_scans) >= 2, p[:800]


def test_delete_where_count_scan_prunes_payload(spark, tmp_table_dir):
    """delete_where's per-file match-count job must read only the
    condition's columns plus the two identity columns — the payload never
    loads (Catalyst column pruning through the metadata projection)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from airbyte_spark.lake.table import LakeTable
    from airbyte_spark.operators.posdeletes import _pos_scan

    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("grp", StringType()),
            StructField("payload", StringType()),
        ]
    )
    t = LakeTable.create(spark, tmp_table_dir, schema, primary_key=["id"])
    t.append(
        spark.range(0, 100).select(
            F.col("id"),
            F.lit("g").alias("grp"),
            F.lit("x" * 100).alias("payload"),
        )
    )
    counts = (
        _pos_scan(t, t.data_files(), keep_mor_seq=False)
        .filter("grp = 'g' and id < 10")
        .groupBy("_pos_file")
        .count()
    )
    p = plan_of(counts)
    frag = p[p.index("ReadSchema") :][:300]
    assert "payload" not in frag, f"payload must be pruned: {frag}"


def test_sampling_filter_is_scan_local(spark):
    """Mixture sampling must compile to a pruned scan + filter — no
    shuffle, no UDF (functions/sampling.py md5-prefix predicate)."""
    df = entry.q_sample_stratified(spark, SF)
    p = plan_of(df)
    assert "Exchange" not in p, p[:800]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    frag = p[p.index("ReadSchema") :][:300]
    assert "text" not in frag, f"payload must be pruned: {frag}"


def test_upsample_explode_is_scan_local(spark):
    """Weighted upsampling is one codegen Generate over a pruned scan —
    no shuffle, no UDF."""
    df = entry.q_mixture_upsample(spark, SF)
    p = plan_of(df)
    assert "Generate" in p
    assert "Exchange" not in p, p[:800]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
