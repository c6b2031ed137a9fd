"""Hidden-partitioning transforms (lake/transforms.py): bucket/truncate/
temporal partition specs — layout, scan pruning, literal probes via the
writer's own Spark expressions, partition evolution fallback, and MERGE's
auto-safe bucket(pk) candidate pruning. Semantics model the Iceberg table
spec's "Partition Transforms" section (the reference's lakehouse
destination delegates layout to Iceberg)."""

import datetime
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable, partition_matches
from airbyte_spark.lake.transforms import (
    parse_partition_field,
    partition_expr,
    transform_literal,
    validate_partition_spec,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType()),
        StructField("ts", TimestampType()),
        StructField("v", IntegerType()),
    ]
)


def _rows(n):
    base = datetime.datetime(2024, 3, 10, 6, 30)
    return [
        (i, f"name-{i:04d}", base + datetime.timedelta(hours=i), i * 10)
        for i in range(n)
    ]


def _mk(spark, root, partition_by, n=40, pk=("id",)):
    t = LakeTable.create(
        spark, root, SCHEMA, primary_key=list(pk), partition_by=partition_by
    )
    t.append(spark.createDataFrame(_rows(n), SCHEMA))
    return t


# ---------------------------------------------------------------- grammar


def test_parse_grammar():
    f = parse_partition_field("bucket(16, id)")
    assert (f.source, f.transform, f.param, f.name) == ("id", "bucket", 16, "id_bucket")
    f = parse_partition_field("truncate(3, name)")
    assert (f.transform, f.param, f.name) == ("truncate", 3, "name_trunc")
    f = parse_partition_field("day(ts)")
    assert (f.transform, f.name) == ("day", "ts_day")
    f = parse_partition_field("ts")
    assert (f.transform, f.name) == ("identity", "ts")


@pytest.mark.parametrize(
    "spec",
    [
        "bucket(id)",  # missing N
        "bucket(0, id)",  # N < 1
        "shard(4, id)",  # unknown transform
        "day(ts, 2)",  # extra arg
        "day()",
        "bucket(4, no_such_col)",
        "day(id)",  # temporal over long
        "truncate(4, ts)",  # truncate over timestamp
        "hour(d)",  # hour over date
        "month(v, 2)",
    ],
)
def test_bad_specs_rejected(spec):
    schema = StructType(SCHEMA.fields + [StructField("d", DateType())])
    with pytest.raises(ValueError):
        validate_partition_spec([spec], schema)


def test_duplicate_field_names_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        validate_partition_spec(["day(ts)", "day(ts)"], SCHEMA)


def test_create_rejects_bad_spec(spark, tmp_table_dir):
    with pytest.raises(ValueError, match="partition spec"):
        LakeTable.create(
            spark, tmp_table_dir, SCHEMA, primary_key=["id"],
            partition_by=["bucket(id)"],
        )


# ---------------------------------------------------------------- layout


def test_bucket_layout_and_scan(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, ["bucket(4, id)"])
    entries = t.data_files()
    # every file sits in a _p_id_bucket=<k> dir with k in 0..3
    buckets = {e.partition["id_bucket"] for e in entries}
    assert buckets <= {"0", "1", "2", "3"} and len(buckets) > 1
    assert all("_p_id_bucket=" in e.path for e in entries)
    # probing by SOURCE literal prunes to that id's bucket — and the
    # bucket value matches Spark's own xxhash64 (the hash contract)
    want = (
        spark.createDataFrame([(7,)], "id long")
        .select(F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(4)).cast("string"))
        .first()[0]
    )
    assert transform_literal(spark, parse_partition_field("bucket(4, id)"), 7, LongType()) == want
    got = t.scan(partition_filter={"id": 7})
    ids = {r["id"] for r in got.collect()}
    assert 7 in ids
    # every returned row belongs to id 7's bucket (whole-bucket scan,
    # partition filters prune LAYOUT, they are not row filters)
    n_bad = got.filter(
        F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(4)).cast("string")
        != F.lit(want)
    ).count()
    assert n_bad == 0
    # pruning actually skipped the other buckets' files
    opened = {os.path.normpath(p.replace("file:", "")) for p in got.inputFiles()}
    assert opened <= {e.path for e in entries if e.partition["id_bucket"] == want}
    # field-name probe with an already-transformed value is equivalent
    assert t.scan(partition_filter={"id_bucket": want}).count() == got.count()


def test_day_partition_scan(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, ["day(ts)"], n=60)  # spans 2024-03-10..12
    days = {e.partition["ts_day"] for e in t.data_files()}
    assert days == {"2024-03-10", "2024-03-11", "2024-03-12"}
    got = t.scan(partition_filter={"ts": datetime.datetime(2024, 3, 11, 23, 59)})
    rows = got.collect()
    assert rows and all(r["ts"].date() == datetime.date(2024, 3, 11) for r in rows)
    # row parity with a plain row-level filter over the full scan
    want = t.scan().filter(F.to_date("ts") == F.lit("2024-03-11")).count()
    assert len(rows) == want


def test_truncate_string_and_int(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, ["truncate(6, name)", "truncate(100, id)"], n=25)
    e0 = t.data_files()[0]
    assert set(e0.partition) == {"name_trunc", "id_trunc"}
    assert all(e.partition["name_trunc"] == "name-0" for e in t.data_files())
    # int truncate floors to the multiple: ids 0..24 -> bucket "0"
    assert {e.partition["id_trunc"] for e in t.data_files()} == {"0"}
    got = t.scan(partition_filter={"name": "name-0007", "id": 7})
    assert {r["id"] for r in got.collect()} >= {7}


def test_null_source_lands_in_null_partition(spark, tmp_table_dir):
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, primary_key=["id"],
        partition_by=["bucket(4, name)"],
    )
    rows = [(1, None, datetime.datetime(2024, 1, 1), 1),
            (2, "x", datetime.datetime(2024, 1, 1), 2)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    parts = {e.partition["name_bucket"] for e in t.data_files()}
    assert None in parts  # __HIVE_DEFAULT_PARTITION__, not pmod(seed, N)
    got = t.scan(partition_filter={"name": None}).collect()
    assert {r["id"] for r in got} == {1}


def test_partition_evolution_identity_to_bucket(spark, tmp_table_dir):
    """Old identity-partitioned files stay row-exactly filterable after
    the spec moves to a transform (mixed-layout reads)."""
    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, primary_key=["id"], partition_by=["v"]
    )
    t.append(spark.createDataFrame(_rows(10), SCHEMA))
    t.update_partition_spec(["bucket(4, id)"])
    t.append(spark.createDataFrame(_rows(20)[10:], SCHEMA))
    # filter on the OLD spec column: new-spec files lack the layout value
    # and must be row-enforced; result is row-exact
    got = t.scan(partition_filter={"v": 130})
    assert {r["id"] for r in got.collect()} == {13}
    # filter on the NEW transformed field over mixed layout: old files
    # carry no id_bucket dir -> row-level twin of the bucket expression
    got = t.scan(partition_filter={"id": 3})
    ids = {r["id"] for r in got.collect()}
    assert 3 in ids
    b3 = transform_literal(spark, parse_partition_field("bucket(4, id)"), 3, LongType())
    bad = got.filter(
        F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(4)).cast("string")
        != F.lit(b3)
    ).count()
    assert bad == 0


def test_merge_bucket_auto_pruning(spark, tmp_table_dir):
    """bucket(N, pk) partition fields are pure functions of the PK, so
    merge enables partition pruning WITHOUT the merge.partition-pruning
    waiver: a CoW batch touching one bucket must leave every other
    bucket's files untouched."""
    from airbyte_spark.operators.merge import merge_into

    t = LakeTable.create(
        spark, tmp_table_dir,
        StructType(
            [
                StructField("id", LongType(), False),
                StructField("updated_at", LongType()),
                StructField("v", IntegerType()),
            ]
        ),
        primary_key=["id"],
        partition_by=["bucket(4, id)"],
    )
    sch = t.schema()
    t.append(spark.createDataFrame([(i, 1, i) for i in range(64)], sch))
    before = {e.path: e.partition["id_bucket"] for e in t.data_files()}
    assert len(set(before.values())) == 4
    # one upserted key -> its bucket only
    target = (
        spark.createDataFrame([(5,)], "id long")
        .select(F.pmod(F.xxhash64(F.col("id").cast("long")), F.lit(4)).cast("string"))
        .first()[0]
    )
    merge_into(
        t,
        spark.createDataFrame([(5, 2, 500)], sch),
        cursor_col="updated_at",
        cdc_col=None,
        mode="cow",
    )
    after = {e.path for e in t.data_files()}
    untouched = {p for p, b in before.items() if b != target}
    assert untouched <= after  # non-matching buckets never rewritten
    # within the target bucket, bloom/range candidate selection rewrote
    # at least the file holding id=5
    assert {p for p, b in before.items() if b == target} - after
    got = {r["id"]: r["v"] for r in t.scan().collect()}
    assert got[5] == 500 and len(got) == 64


def test_partitioned_maintenance_over_transformed_table(spark, tmp_table_dir):
    """run_partitioned_maintenance discovers transformed partitions from
    entry dicts and scopes rewrites per bucket (the internal field-name
    keyed filter path)."""
    from airbyte_spark.operators.maintenance import run_partitioned_maintenance

    t = _mk(spark, tmp_table_dir, ["bucket(2, id)"], n=30)
    # second append: no PK enforcement on raw append; maintenance just
    # needs multiple small files per partition
    t.append(spark.createDataFrame(_rows(30), SCHEMA))
    res = run_partitioned_maintenance(
        t, job_id="pt-maint", cluster_dims=["id", "v"], curve="zorder",
        target_file_bytes=1 << 20,
    )
    assert res.stages  # at least one partition visited
    assert t.scan().count() == 60
    for e in t.data_files():
        assert set(e.partition) == {"id_bucket"}


def test_resolve_filter_is_idempotent(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, ["bucket(4, id)", "day(ts)"], n=8)
    raw = {"id": 3, "ts": datetime.datetime(2024, 3, 10, 9, 0)}
    once = t.resolve_partition_filter(raw)
    assert set(once) == {"id_bucket", "ts_day"}
    assert t.resolve_partition_filter(once) == once
    e = t.data_files()[0]
    assert partition_matches(e, {k: once[k] for k in e.partition if k in once}) in (
        True,
        False,
    )


def test_distributed_planning_prunes_transformed_partitions(
    spark, tmp_table_dir
):
    """driver ≡ distributed planning over a bucket(N, pk) spec: the
    batch's bucket set feeds the executor-side canonical partition_key
    filter, and both plans converge to the same final state."""
    from airbyte_spark.operators.merge import merge_into

    sch = StructType(
        [
            StructField("id", LongType(), False),
            StructField("updated_at", LongType()),
            StructField("v", IntegerType()),
        ]
    )
    finals = []
    for sub, threshold in [("drv", 10**9), ("dist", 0)]:
        root = os.path.join(tmp_table_dir, sub)
        t = LakeTable.create(
            spark, root, sch, primary_key=["id"],
            partition_by=["bucket(4, id)"],
            properties={"merge.planning.distributed-threshold": threshold},
        )
        t.append(spark.createDataFrame([(i, 1, i) for i in range(64)], sch))
        merge_into(
            t,
            spark.createDataFrame([(5, 2, 500), (99, 2, 990)], sch),
            cursor_col="updated_at",
            cdc_col=None,
            mode="cow",
        )
        finals.append(
            sorted((r["id"], r["v"]) for r in t.scan().select("id", "v").collect())
        )
    assert finals[0] == finals[1]
    assert (5, 500) in finals[0] and (99, 990) in finals[0]
    assert len(finals[0]) == 65
