"""SparkSession factory tuned for the maintenance engine.

Defaults mirror what we would submit on a real multi-executor cluster via
``spark-submit --py-files``; in the sandbox we run ``local[N]``. All jobs are
pure DataFrame pipelines, so AQE + adaptive skew-join are turned on globally
(the explicit salting in operators/merge.py is the first line of defense,
AQE the backstop — SURVEY.md §4 "Hot-key mitigation").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "airbyte-spark-maintenance",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: local core count; defaults to $SPARK_GRAFT_CPUS or all cores.
    shuffle_partitions: defaults to 2x parallelism (small-data sandbox);
        on a real cluster this is sized so shuffle partitions fit in executor
        memory at the target scale (see BASELINE.md).
    """
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism * 2, 8)

    # Shuffle/spill scratch space: RAM-backed when it can safely hold a
    # local-mode job's shuffle (r6 A/B at the driver's sf1 shape: the
    # 8.5 GB clustering shuffle drops ~32% wall moving spark.local.dir
    # from ext4 to /dev/shm). Guarded by free space (>=48 GiB) so an
    # oversized job falls back to disk dirs instead of filling tmpfs;
    # override with SPARK_GRAFT_LOCAL_DIR (a real cluster sets its own
    # fast local disks via the deployment, not here).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None:
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 48 * 1024**3:
                local_dir = "/dev/shm/spark-local"
        except OSError:
            pass
    if local_dir:
        try:
            os.makedirs(local_dir, exist_ok=True)
        except OSError:
            local_dir = None

    builder = SparkSession.builder.appName(app_name)
    # under spark-submit the python process is launched BY the JVM gateway
    # (PYSPARK_GATEWAY_PORT set) and the master comes from the submit
    # command — forcing local[N] there would override the cluster master.
    # Standalone (tests, bench, scripts) builds its own local context.
    if os.environ.get("PYSPARK_GATEWAY_PORT") is None:
        builder = builder.master(f"local[{parallelism}]")
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        # The dominant shuffles here carry pre-compressed binary payloads
        # (JPEG/PNG image bytes): lz4-ing them is pure overhead (guide
        # §2.3 — "for already-compressed or high-entropy binary payloads,
        # compression can be pure overhead"; measured ~1-2 s off the sf1
        # cluster rewrite and ~25% off the MoR write phase). Slim text /
        # key shuffles are small enough either way. Spill compression
        # stays on (defaults). Flip for compressible-shuffle deployments:
        .config(
            "spark.shuffle.compress",
            os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"),
        )
        # AQE: runtime re-plan, partition coalescing, skew-join backstop.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas UDF exchange (the only Python in any job).
        # Batch size tuned for multi-KB binary payload rows: 1024 rows x
        # ~26KB ≈ 27MB per in-flight batch per worker keeps 32 concurrent
        # python workers' peak RSS bounded.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # vectorized parquet reader sizes column vectors per ROW COUNT; at
        # 4096 rows x ~26KB binary x 32 concurrent tasks that is >3 GB of
        # on-heap vectors (observed OOM in OnHeapColumnVector.reserve) —
        # shrink the columnar batch for the binary-payload workload
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        # local[] defaults to task maxFailures=1 — a single transient
        # python-worker crash kills the job; retry like a real cluster
        .config("spark.task.maxFailures", "4")
        # Binary image payloads are heavy per-row; cap scan partition bytes
        # so a 512MB parquet file still splits across tasks.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (the legacy default) carries NO parquet min/max statistics,
        # silently disabling manifest/row-group pruning on every timestamp
        # column (cursor scans!); micros is the modern standard
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.session.timeZone", "UTC")
        # RocksDB state store: the default HDFS-backed provider's checksum
        # file manager EOFs on local-FS commits under applyInPandasWithState
        # (Spark 4.1); RocksDB is the production choice anyway
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.execution.pyspark.udf.faulthandler.enabled", "true")
        # this box's virtualized Xeon SIGSEGVs in the JVM's AVX-512
        # arraycopy stubs under concurrent load (hs_err: ~StubRoutines::
        # jlong_disjoint_arraycopy_avx3) — cap the JIT at AVX2
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+IgnoreUnrecognizedVMOptions -XX:UseAVX=2",
        )
        # 16g heap (r6 re-measure at the driver's sf1 shape: 480k × ~17KB
        # binary rows, 32 concurrent scan/sort/shuffle tasks): quiet-box
        # cluster rewrite 8g ≈ 50 s vs 16g ≈ 43 s, and under co-tenant
        # load the gap widens to >2× (GC pressure amplifies contention);
        # at the 48k-image shape 8g/12g/16g are indistinguishable
        # (ab_results3/4 logs, OPTIMIZATION_r06.md). The old 8g-beats-16g
        # result predates the r6 write-path fixes and does not reproduce.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
