"""Native streaming read of a lake table (sources/lakestream.py):
Spark-4 Python DataSource with snapshot-sequence offsets — Iceberg
"Streaming Reads" semantics (append/MoR commits emit, maintenance
commits skip, delete-bearing commits fail unless on_delete=skip)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.sources.lakestream import LakeStreamDataSource

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("v", IntegerType()),
    ]
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakeStreamDataSource)


def _drain(spark, root, name, **options):
    """availableNow pass over the stream into a memory sink; returns the
    collected rows."""
    reader = spark.readStream.format("lake_stream").option("path", root)
    for k, v in options.items():
        reader = reader.option(k, v)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            reader.load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(ckpt, "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).collect()


def test_appends_stream_with_commit_lineage(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([(f"a{i}", i) for i in range(5)], SCHEMA))
    t.append(spark.createDataFrame([(f"b{i}", i) for i in range(3)], SCHEMA))
    rows = _drain(spark, tmp_table_dir, "s_appends")
    assert len(rows) == 8
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["_commit_sequence"], set()).add(r["id"])
    seqs = sorted(by_seq)
    assert len(seqs) == 2 and seqs[0] < seqs[1]
    assert by_seq[seqs[0]] == {f"a{i}" for i in range(5)}
    assert by_seq[seqs[1]] == {f"b{i}" for i in range(3)}
    # lineage column points at real snapshots
    sids = {r["_commit_snapshot_id"] for r in rows}
    assert sids <= {s.snapshot_id for s in t.history()}


def test_maintenance_commits_are_invisible(spark, tmp_table_dir):
    from airbyte_spark.operators.compact import compact

    t = LakeTable.create(
        spark, tmp_table_dir, SCHEMA, primary_key=["id"],
        properties={"write.target-file-size-bytes": 1 << 20},
    )
    for i in range(3):
        t.append(
            spark.createDataFrame(
                [(f"k{i}_{j}", j) for j in range(10)], SCHEMA
            )
        )
    compact(t)  # row-set invariant: must emit nothing new
    rows = _drain(spark, tmp_table_dir, "s_maint")
    assert len(rows) == 30
    assert len({r["_commit_sequence"] for r in rows}) == 3


def test_mor_merge_fails_by_default_and_skips_on_option(spark, tmp_table_dir):
    from airbyte_spark.operators.merge import merge_into

    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    merge_into(
        t,
        spark.createDataFrame([("a", 100), ("c", 3)], SCHEMA),
        cursor_col="v",
        mode="mor",
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="on_delete=skip"):
        _drain(spark, tmp_table_dir, "s_fail")
    rows = _drain(spark, tmp_table_dir, "s_skip", on_delete="skip")
    # post-images only: the merge's added file rows stream, the eq-delete
    # tombstone does not retract the stale ('a', 1)
    got = {(r["id"], r["v"]) for r in rows}
    assert got == {("a", 1), ("b", 2), ("a", 100), ("c", 3)}


def test_update_cherry_pick_and_import_commits_stream(spark, tmp_table_dir):
    """Commit ops beyond append/merge/delete must not wedge the stream:
    MoR update_where behaves like a MoR merge (raises without
    on_delete=skip, streams post-images with it); cherry-pick and
    add-files are plain appends."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from airbyte_spark.lake.import_files import add_files
    from airbyte_spark.operators.posdeletes import update_where

    t = LakeTable.create(spark, tmp_table_dir + "/t", SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    update_where(t, "id = 'a'", {"v": F.lit(100)})
    with pytest.raises(StreamingQueryException, match="on_delete=skip"):
        _drain(spark, tmp_table_dir + "/t", "s_upd_fail")
    rows = _drain(spark, tmp_table_dir + "/t", "s_upd_skip", on_delete="skip")
    assert {(r["id"], r["v"]) for r in rows} == {
        ("a", 1), ("b", 2), ("a", 100)
    }
    # cherry-pick (WAP rebase) and add-files stream as appends
    t.create_branch("wap")
    t.append(spark.createDataFrame([("staged", 7)], SCHEMA), branch="wap")
    staged = t.current_snapshot_id(branch="wap")
    t.append(spark.createDataFrame([("moved", 8)], SCHEMA))
    t.cherry_pick(staged)
    ext = tmp_table_dir + "/external"
    spark.createDataFrame([("imported", 9)], SCHEMA).coalesce(1).write.parquet(ext)
    add_files(t, ext)
    rows = _drain(spark, tmp_table_dir + "/t", "s_ops", on_delete="skip")
    ids = {r["id"] for r in rows}
    assert {"staged", "moved", "imported"} <= ids


def test_from_sequence_resumes_mid_chain(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    t.append(spark.createDataFrame([("old", 0)], SCHEMA))
    first_seq = t.snapshot().sequence
    t.append(spark.createDataFrame([("new", 1)], SCHEMA))
    rows = _drain(
        spark, tmp_table_dir, "s_resume", from_sequence=str(first_seq)
    )
    assert {r["id"] for r in rows} == {"new"}


def test_partition_values_and_evolved_schema_nullpad(spark, tmp_table_dir):
    part_schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("part", StringType()),
            StructField("v", IntegerType()),
        ]
    )
    t = LakeTable.create(
        spark, tmp_table_dir, part_schema, primary_key=["id"],
        partition_by=["part"],
    )
    t.append(
        spark.createDataFrame(
            [("a", "x", 1), ("b", "y", 2)], part_schema
        )
    )
    t.evolve_schema(
        StructType(list(part_schema.fields) + [StructField("extra", StringType())])
    )
    new_schema = t.schema()
    t.append(
        spark.createDataFrame([("c", "x", 3, "E")], new_schema)
    )
    rows = _drain(spark, tmp_table_dir, "s_parts")
    got = {(r["id"], r["part"], r["v"], r["extra"]) for r in rows}
    # hive partition columns are reconstructed; pre-evolution files
    # null-pad the new column
    assert got == {("a", "x", 1, None), ("b", "y", 2, None), ("c", "x", 3, "E")}


# ----------------------------------------------------------------------
# sink half (LakeStreamWriter)
# ----------------------------------------------------------------------


def test_sink_appends_one_snapshot_per_microbatch(spark, tmp_table_dir):
    import shutil

    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    src = tempfile.mkdtemp(prefix="sinksrc-")
    ckpt = tempfile.mkdtemp(prefix="sinkckpt-")
    try:
        # two source files + maxFilesPerTrigger=1 -> two micro-batches
        spark.createDataFrame([(f"a{i}", i) for i in range(4)], SCHEMA) \
            .coalesce(1).write.parquet(os.path.join(src, "f1"))
        spark.createDataFrame([(f"b{i}", i) for i in range(3)], SCHEMA) \
            .coalesce(1).write.parquet(os.path.join(src, "f2"))
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
            .writeStream.format("lake_stream")
            .option("path", tmp_table_dir)
            .option("stream_id", "q1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert t.scan().count() == 7
        appended = [
            s for s in t.history()
            if s.summary.get("stream_query_id") == "q1"
        ]
        assert len(appended) == 2
        assert sorted(s.summary["stream_batch_id"] for s in appended) == [0, 1]
        # footer stats made it into the manifests (pruning stays alive)
        assert all(
            "id" in e.stats for e in t.data_files() if e.rows
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_sink_replayed_batch_is_dropped(spark, tmp_table_dir):
    """At-least-once replay after a crash-before-ack must not
    double-append: commit() consults the (stream_id, batch_id) high-water
    mark and deletes the replayed files."""
    import pyarrow as pa

    from airbyte_spark.sources.lakestream import LakeStreamWriter

    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    w = LakeStreamWriter(
        root=tmp_table_dir, branch="main", stream_id="q1",
        stats_columns=["id"], schema_id=0,
    )
    batch = pa.RecordBatch.from_pydict({"id": ["x1", "x2"], "v": [1, 2]})
    msg = w.write(iter([batch]))
    w.commit([msg], batchId=0)
    assert t.scan().count() == 2
    # replay of batch 0 (same stream): dropped, file cleaned up
    msg2 = w.write(iter([batch]))
    w.commit([msg2], batchId=0)
    assert t.scan().count() == 2
    assert not os.path.exists(msg2.entry["path"])
    # the next batch still lands
    msg3 = w.write(iter([pa.RecordBatch.from_pydict({"id": ["y"], "v": [9]})]))
    w.commit([msg3], batchId=1)
    assert t.scan().count() == 3
    # a different stream_id has its own high-water mark
    w2 = LakeStreamWriter(
        root=tmp_table_dir, branch="main", stream_id="q2",
        stats_columns=["id"], schema_id=0,
    )
    m = w2.write(iter([pa.RecordBatch.from_pydict({"id": ["z"], "v": [0]})]))
    w2.commit([m], batchId=0)
    assert t.scan().count() == 4


def test_sink_refuses_partitioned_tables(spark, tmp_table_dir):
    part_schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("part", StringType()),
            StructField("v", IntegerType()),
        ]
    )
    LakeTable.create(
        spark, tmp_table_dir, part_schema, primary_key=["id"],
        partition_by=["part"],
    )
    src = tempfile.mkdtemp(prefix="sinksrc-")
    ckpt = tempfile.mkdtemp(prefix="sinkckpt-")
    try:
        spark.createDataFrame([("a", "x", 1)], part_schema) \
            .write.parquet(os.path.join(src, "f1"))
        from pyspark.errors.exceptions.captured import StreamingQueryException

        with pytest.raises(Exception, match="partitioned"):
            q = (
                spark.readStream.schema(part_schema)
                .parquet(f"{src}/*")
                .writeStream.format("lake_stream")
                .option("path", tmp_table_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        import shutil

        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_native_table_to_table_pipeline(spark, tmp_table_dir):
    """The full native loop: READ one lake table as a stream, transform,
    WRITE into a second lake table — offsets and the batch high-water
    mark make both halves exactly-once, with zero foreachBatch glue."""
    import shutil

    src_root = tmp_table_dir
    dst_root = tempfile.mkdtemp(prefix="lakedst-")
    ckpt = tempfile.mkdtemp(prefix="pipeckpt-")
    try:
        src = LakeTable.create(spark, src_root, SCHEMA, primary_key=["id"])
        src.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
        src.append(spark.createDataFrame([("c", 3)], SCHEMA))
        dst = LakeTable.create(spark, dst_root, SCHEMA, primary_key=["id"])
        q = (
            spark.readStream.format("lake_stream")
            .option("path", src_root)
            .load()
            .select("id", (F.col("v") * 10).cast("int").alias("v"))
            .writeStream.format("lake_stream")
            .option("path", dst_root)
            .option("stream_id", "pipe")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r["id"], r["v"]) for r in dst.scan().collect()}
        assert got == {("a", 10), ("b", 20), ("c", 30)}
        # second pass with the same checkpoint: nothing new, no dup rows
        src.append(spark.createDataFrame([("d", 4)], SCHEMA))
        q = (
            spark.readStream.format("lake_stream")
            .option("path", src_root)
            .load()
            .select("id", (F.col("v") * 10).cast("int").alias("v"))
            .writeStream.format("lake_stream")
            .option("path", dst_root)
            .option("stream_id", "pipe")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r["id"], r["v"]) for r in dst.scan().collect()}
        assert got == {("a", 10), ("b", 20), ("c", 30), ("d", 40)}
    finally:
        shutil.rmtree(dst_root, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_matches_model_over_random_op_sequences(spark):
    """Model-based: for ANY interleaving of appends, MoR merges and
    compactions, the stream (on_delete=skip) emits exactly the union of
    rows the appends and merge batches wrote (post-images), tagged with
    one distinct commit sequence per emitting commit — compactions and
    replays never duplicate or drop a row."""
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from airbyte_spark.operators.compact import compact
    from airbyte_spark.operators.merge import merge_into

    op = st.one_of(
        st.tuples(st.just("append"), st.integers(1, 3)),
        st.tuples(st.just("merge"), st.integers(1, 3)),
        st.tuples(st.just("update"), st.integers(0, 10**6)),
        st.tuples(st.just("compact"), st.just(0)),
    )

    @settings(
        max_examples=int(os.environ.get("SOAK_EXAMPLES", "5")),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(op, min_size=1, max_size=5))
    def run(ops):
        root = tempfile.mkdtemp(prefix="lake-prop-")
        try:
            t = LakeTable.create(
                spark, root, SCHEMA, primary_key=["id"],
                properties={"write.target-file-size-bytes": 1 << 20},
            )
            expected = set()
            state: dict[str, int] = {}  # live (id -> v) model
            emitting = 0
            serial = 0
            for kind, n in ops:
                if kind == "append":
                    rows = [(f"a{serial}_{j}", serial) for j in range(n)]
                    serial += 1
                    t.append(spark.createDataFrame(rows, SCHEMA))
                    expected.update(rows)
                    state.update(rows)
                    emitting += 1
                elif kind == "merge":
                    rows = [(f"m{serial}_{j}", serial) for j in range(n)]
                    serial += 1
                    merge_into(
                        t, spark.createDataFrame(rows, SCHEMA),
                        cursor_col="v", mode="mor",
                    )
                    expected.update(rows)
                    state.update(rows)
                    emitting += 1
                elif kind == "update":
                    # MoR UPDATE WHERE: with on_delete=skip the stream
                    # emits the post-image copies (old values stay in
                    # `expected` — earlier commits already streamed them)
                    from airbyte_spark.operators.posdeletes import (
                        update_where,
                    )

                    if not serial:
                        continue
                    tgt = n % serial
                    hit = [i for i, v in state.items() if v == tgt]
                    if not hit:
                        continue
                    newv = 1000 + serial
                    serial += 1
                    update_where(t, f"v = {tgt}", {"v": F.lit(newv)})
                    for i in hit:
                        state[i] = newv
                        expected.add((i, newv))
                    emitting += 1
                else:
                    compact(t)
            got = _drain(
                spark, root, f"s_prop_{serial}", on_delete="skip"
            )
            assert {(r["id"], r["v"]) for r in got} == expected
            assert len({r["_commit_sequence"] for r in got}) == emitting
        finally:
            shutil.rmtree(root, ignore_errors=True)

    run()


def test_backpressure_paces_the_backlog(spark, tmp_table_dir):
    """max_commits_per_trigger bounds each planned micro-batch to N
    commits of backlog (driven directly through the reader's offset
    protocol — the pacing only engages after the first commit())."""
    from airbyte_spark.sources.lakestream import LakeStreamReader

    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, primary_key=["id"])
    seqs = {}
    for i in range(5):
        t.append(spark.createDataFrame([(f"k{i}", i)], SCHEMA))
        seqs[i] = t.snapshot().sequence
    r = LakeStreamReader(
        root=tmp_table_dir, branch="main", on_delete="fail",
        from_sequence=0, schema_json=SCHEMA.json(),
        max_commits_per_trigger=2,
    )
    # fresh start: uncapped (the checkpointed offset is unknown)
    head = r.latestOffset()
    assert head["sequence"] == seqs[4]
    # once an end is committed, each next batch advances <= 2 commits
    r.commit({"sequence": seqs[0], "snapshot_id": t.history()[4].snapshot_id})
    step1 = r.latestOffset()
    assert step1["sequence"] == seqs[2]
    parts = r.partitions(
        {"sequence": seqs[0], "snapshot_id": ""}, step1
    )
    assert len(parts) == 2  # appends 1 and 2 only
    r.commit(step1)
    step2 = r.latestOffset()
    assert step2["sequence"] == seqs[4]  # remaining 2 commits
    # caught up: the capped answer equals the head and stays put
    r.commit(step2)
    assert r.latestOffset() == step2
