"""MERGE INTO — incremental upsert/dedup on the table's primary key.

Semantics mirror Airbyte's incremental-dedup sync mode end to end:

- batch window-dedup W1: ROW_NUMBER over (pk) ORDER BY cursor DESC NULLS
  LAST, _airbyte_extracted_at DESC, _airbyte_raw_id DESC keep rn=1
  (SnowflakeDirectLoadSqlGenerator.kt:247-296; JdbcSqlGenerator.kt:437-462)
  — realized as a salted two-phase window (operators/skew.py) so a hot
  image_id cannot pin a shuffle partition.
- cursor-newer resolution J2: a matched target row is replaced only when
  the source row is newer — target.cursor < src.cursor, or equal cursor
  and target.extracted_at <= src.extracted_at, or target cursor NULL and
  source non-NULL (SnowflakeDirectLoadSqlGenerator.kt:160-179).
- CDC delete P6: `_ab_cdc_deleted_at` non-null ⇒ matched row removed
  (hard delete) and not-matched row suppressed (IcebergUtil.kt:49,191-204;
  MERGE clauses SnowflakeDirectLoadSqlGenerator.kt:190-204).
- null-PK guard P7: any NULL in a PK field fails the job
  (BaseDeltaTaskWriter.java:38-39,70-84).

Execution is **copy-on-write file rewrite** scoped by manifest pruning:
only target files whose [min,max] PK range intersects the batch's key set
are rewritten; at 10^12-row scale a 100k-row batch touches a handful of
PK-sorted files, not the table. The resolve join is an explicit sort-merge
join (`hint("merge")`); both sides are distinct-per-key after W1 so the
join itself cannot skew — the skew lives in the raw batch and is absorbed
by the salted window. AQE skew-join stays on as backstop (session.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, TimestampType

from airbyte_spark.lake.evolve import merge_supertype
from airbyte_spark.lake.format import DataFileEntry, Snapshot
from airbyte_spark.lake.table import (
    MAIN,
    LakeTable,
    _align as _align_to,
    canonical_partition_key,
    coerce_stat_value,
    partition_str,
)
from airbyte_spark.operators.skew import salted_dedup_rank

EXTRACTED_COL = "_airbyte_extracted_at"
RAW_ID_COL = "_airbyte_raw_id"
CDC_DELETED_COL = "_ab_cdc_deleted_at"

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


class NullPrimaryKeyError(ValueError):
    """Null in a PK field is a hard config error (BaseDeltaTaskWriter.java:38)."""


@dataclass
class MergeResult:
    snapshot: Snapshot
    source_rows: int
    deduped_rows: int
    rewritten_files: int
    added_files: int
    phase_sec: dict | None = None  # wall time per internal phase
    rewritten_bytes: int = 0  # candidate bytes re-written (CoW write cost)
    added_bytes: int = 0  # bytes of new data+delete files


def dedup_order(
    cursor_col: str | None, available: list[str] | None = None
) -> list[Column]:
    """The W1 total order: cursor DESC NULLS LAST, extracted_at DESC, then
    raw_id DESC as the arbitrary-but-stable tiebreak (RecordDiffer sorts the
    same way, RecordDiffer.kt:87-110). No cursor ⇒ extracted_at only
    (testDedupNoCursor, BasicFunctionalityIntegrationTest.kt:3339).

    `available` restricts the order to columns the source actually carries
    — a source without Airbyte's meta columns (raw_id/extracted_at) still
    dedups on its cursor instead of failing the window with an
    unresolved-column error."""
    have = (lambda c: c in available) if available is not None else (lambda c: True)
    order: list[Column] = []
    if cursor_col and have(cursor_col):
        order.append(F.desc_nulls_last(cursor_col))
    if have(EXTRACTED_COL):
        order.append(F.desc(EXTRACTED_COL))
    if have(RAW_ID_COL):
        order.append(F.desc(RAW_ID_COL))
    if not order:
        raise ValueError(
            "merge source has no dedup-order column: need a cursor, "
            f"{EXTRACTED_COL}, or {RAW_ID_COL}"
        )
    return order


def _orderable(dt) -> bool:
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    return True


def dedup_batch(
    source: DataFrame,
    pk: list[str],
    cursor_col: str | None,
    salt_buckets: int = 16,
) -> DataFrame:
    """W1 dedup of a MERGE source batch (keep newest per PK).

    r6: executed as `max(struct(order cols…, rest))` per PK — every dedup
    order column is DESC NULLS LAST and struct comparison puts null
    smallest, so the max tuple IS the first row of the window order, and
    a hash aggregate partial-aggregates map-side (one surviving row per
    (map partition, key) crosses the exchange; a hot key collapses before
    it can pin a reducer — stronger than the old two-phase salted window,
    with no per-partition sort). Rows that tie on the full order key are
    identical at-least-once replays or resolve by the remaining columns —
    deterministic either way. Sources carrying an unorderable column
    (maps) keep the salted-window path."""
    order_names = [
        c
        for c in ((cursor_col,) if cursor_col else ())
        if c in source.columns and c not in pk
    ] + [
        c
        for c in (EXTRACTED_COL, RAW_ID_COL)
        if c in source.columns and c not in pk
    ]
    order_names = list(dict.fromkeys(order_names))
    rest = [c for c in source.columns if c not in pk and c not in order_names]
    if order_names and all(
        _orderable(source.schema[c].dataType) for c in order_names + rest
    ):
        agg = source.groupBy(*pk).agg(
            F.max(F.struct(*order_names, *rest)).alias("_w1max")
        )
        out_cols = [c for c in source.columns if c in pk] + [
            F.col(f"_w1max.{c}").alias(c) for c in order_names + rest
        ]
        return agg.select(
            *[c if isinstance(c, Column) else F.col(c) for c in out_cols]
        ).select(*source.columns)
    return salted_dedup_rank(
        source,
        keys=pk,
        order_by=dedup_order(cursor_col, available=source.columns),
        salt_buckets=salt_buckets,
        salt_on=RAW_ID_COL if RAW_ID_COL in source.columns else None,
    )


def _cursor_newer(
    t_pfx: str, s_pfx: str, cursor_col: str | None, has_extracted: bool = True
) -> Column:
    """src-wins predicate (SnowflakeDirectLoadSqlGenerator.kt:160-179).

    `has_extracted=False` (table without Airbyte meta columns — the same
    sources dedup_order tolerates): ties resolve to the SOURCE, never to a
    NULL comparison that would silently keep the target."""
    if has_extracted:
        tie = F.col(f"{t_pfx}.{EXTRACTED_COL}") <= F.col(f"{s_pfx}.{EXTRACTED_COL}")
    else:
        tie = F.lit(True)
    if not cursor_col:
        return tie
    t_c, s_c = F.col(f"{t_pfx}.{cursor_col}"), F.col(f"{s_pfx}.{cursor_col}")
    return (
        (t_c.isNull() & s_c.isNotNull())
        | (t_c.isNull() & s_c.isNull() & tie)
        | (t_c < s_c)
        | ((t_c == s_c) & tie)
    )


def _candidate_entries(
    table: LakeTable,
    src_keys: DataFrame,
    entries: list[DataFileEntry],
    pk0: str,
    pk_type=None,
) -> list[DataFileEntry]:
    """Manifest-level pruning: keep only target files whose [min,max] range
    of the leading PK column intersects the batch key set. The files list is
    metadata-sized → broadcast to a range-join against the distinct keys;
    only matching paths come back to the driver (S5 planFiles semantics,
    IcebergTableCleaner.kt:45-72). Bounds are compared in the TABLE's PK
    type, and the batch key is cast to it — a source that carries the PK as
    a different type (string-typed JSON sources) must not flip the compare
    to lexicographic ('10' < '9' would resurrect duplicate PKs)."""
    from pyspark.sql.types import StringType as _Str
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    spark = table.spark
    if pk_type is None:
        pk_type = table.schema()[pk0].dataType
    with_stats, no_stats = [], []
    for e in entries:
        st = e.stats.get(pk0, {})
        try:
            lo = coerce_stat_value(st.get("min"), pk_type)
            hi = coerce_stat_value(st.get("max"), pk_type)
            with_stats.append((e.path, lo, hi))
        except (ValueError, TypeError, ArithmeticError):
            no_stats.append(e)

    # r6: ONE capped collect fetches the distinct batch keys AND their
    # xxhash64 (the bloom probe's hash contract) together; range pruning
    # then runs driver-side via bisect over the sorted key list — no
    # broadcast range join (a nested-loop over keys × files) and no
    # second per-type hash job for the common same-type blooms. Over the
    # cap, fall back to the Spark-side range join exactly as before
    # (pruning keys is metadata-sized by construction in micro-batch
    # merges, so the fallback is the exception).
    cap = int(table.properties.get("merge.bloom.max-probe-keys", 2_000_000))
    k = F.col(pk0).try_cast(pk_type)
    key_rows = None
    if cap > 0:
        rows = (
            src_keys.select(k.alias("_k"), F.xxhash64(k).alias("_h"))
            .distinct()
            .limit(cap + 1)
            .collect()
        )
        if len(rows) <= cap:
            key_rows = rows
    if key_rows is not None:
        import bisect

        import numpy as np

        keys = sorted(r["_k"] for r in key_rows if r["_k"] is not None)
        hit_paths: set[str] = set()
        try:
            for path, lo, hi in with_stats:
                i = bisect.bisect_left(keys, lo)
                if i < len(keys) and keys[i] <= hi:
                    hit_paths.add(path)
        except TypeError:
            # incomparable python/type mix — give the compare back to Spark
            key_rows = None
        if key_rows is not None:
            by_path = {e.path: e for e in entries}
            candidates = [by_path[p] for p in sorted(hit_paths)] + no_stats
            hashes = np.array(
                [r["_h"] for r in key_rows if r["_k"] is not None],
                dtype=np.int64,
            ).view(np.uint64)
            return _bloom_prune_candidates(
                table, src_keys, candidates, pk0,
                precomputed={pk_type.simpleString(): hashes},
                key_count=len(keys),
            )
    hit_paths = set()
    if with_stats:
        files_df = spark.createDataFrame(
            with_stats,
            schema=_ST(
                [
                    _SF("path", _Str()),
                    _SF("kmin", pk_type),
                    _SF("kmax", pk_type),
                ]
            ),
        )
        # try_cast: an unparseable key simply matches no file range (the
        # row would fail alignment later anyway); never a runtime error
        hits = (
            src_keys.join(
                F.broadcast(files_df),
                (k >= F.col("kmin")) & (k <= F.col("kmax")),
                "inner",
            )
            .select("path")
            .distinct()
            .collect()
        )
        hit_paths = {r["path"] for r in hits}
    by_path = {e.path: e for e in entries}
    candidates = [by_path[p] for p in sorted(hit_paths)] + no_stats
    return _bloom_prune_candidates(table, src_keys, candidates, pk0)


#: above this many bloom-bearing candidates the membership probe runs as
#: a Spark job over the sidecar files instead of driver-side reads
#: (mirrors LakeTable.DISTRIBUTED_LISTING_THRESHOLD — the driver never
#: pays O(files) I/O on a large table)
BLOOM_PROBE_DISTRIBUTED_THRESHOLD = 256


#: above this many live manifest entries (known from the snapshot's
#: manifest-list summaries WITHOUT parsing a manifest), merge planning
#: runs distributed: manifests are parsed on executors and only the
#: candidate entries come back to the driver (Iceberg
#: DistributedDataScan). Below it, the driver-list path is faster (no
#: Spark job latency). Override: merge.planning.distributed-threshold.
DISTRIBUTED_PLANNING_THRESHOLD = 100_000


def _plan_candidates_distributed(
    table: LakeTable,
    src_keys: DataFrame,
    pk0: str,
    pk_type,
    branch: str,
    batch_parts: set[str] | None,
    snapshot_id: str | None = None,
) -> tuple[list[DataFileEntry], list[DataFileEntry]]:
    """Candidate data files + live delete files for a merge, planned
    WITHOUT an O(table) driver entry list: LakeTable.entries_df parses
    manifests on executors; Catalyst filters keep (a) every delete entry,
    equality AND position (they must all apply during the rewrite,
    whatever their key range), (b) data entries whose partition is in
    the batch (only under merge.partition-pruning), and (c) data entries
    whose [min,max] PK range intersects the batch's overall [lo,hi].
    Only the kept rows' entry_json is collected; the bloom sidecar probe
    then refines membership exactly as in the driver path."""
    import json as _json

    k0 = F.col(pk0).try_cast(pk_type)
    b = src_keys.select(F.min(k0).alias("lo"), F.max(k0).alias("hi")).first()
    is_data = F.col("content") == "data"
    cond = is_data
    if batch_parts is not None:
        import re as _re

        # keep: exact partition match, OR a layout that does not cover
        # every CURRENT partition column — "" (unpartitioned) and
        # pre-evolution specs (partition evolution) may hold any key.
        # partition_key is the canonical sorted "k=v/..." form, so column
        # coverage is the anchored (^|/)<col>= pattern.
        part_ok = F.col("partition_key") == ""
        if batch_parts:
            part_ok = part_ok | F.col("partition_key").isin(*sorted(batch_parts))
            cols = sorted(
                {seg.split("=", 1)[0] for key in batch_parts for seg in key.split("/")}
            )
            for c in cols:
                part_ok = part_ok | ~F.col("partition_key").rlike(
                    f"(^|/){_re.escape(c)}="
                )
        cond = cond & part_ok
    if b["lo"] is not None:
        kmin = F.col("stat_min").try_cast(pk_type)
        kmax = F.col("stat_max").try_cast(pk_type)
        cond = cond & (
            kmin.isNull()
            | kmax.isNull()
            | ((kmax >= F.lit(b["lo"])) & (kmin <= F.lit(b["hi"])))
        )
    edf = table.entries_df(branch=branch, snapshot_id=snapshot_id, stats_col=pk0)
    rows = (
        edf.where(
            F.col("content").isin("equality-deletes", "position-deletes") | cond
        )
        .select("content", "entry_json")
        .collect()
    )
    cands = [
        DataFileEntry.from_json(_json.loads(r["entry_json"]))
        for r in rows
        if r["content"] == "data"
    ]
    deletes = [
        DataFileEntry.from_json(_json.loads(r["entry_json"]))
        for r in rows
        if r["content"] != "data"
    ]
    return _bloom_prune_candidates(table, src_keys, cands, pk0), deletes


def _bloom_prune_candidates(
    table: LakeTable,
    src_keys: DataFrame,
    candidates: list[DataFileEntry],
    pk0: str,
    precomputed: dict | None = None,
    key_count: int | None = None,
) -> list[DataFileEntry]:
    """Second-stage candidate pruning by PK bloom membership
    (lake/bloom.py sidecars). Range pruning is the first stage but is
    useless on a Z-order/Hilbert-clustered table — every file spans
    nearly the full PK range — so this is what keeps a micro-batch merge
    from key-scanning the whole table there. A file survives when its
    bloom (probably) contains at least one batch key; blooms have no
    false negatives, so dropping a file is always safe, and a false
    positive only costs the key scan the range stage would have done
    anyway.

    Hash contract: probe keys are cast to the PK type each bloom was
    BUILT under (entry.bloom["type"]) and hashed with the same Spark
    xxhash64 — a key that does not fit the file's stored type can't be in
    the file, which try_cast's null encodes correctly. Files whose bloom
    column/type can't be probed (PK evolution, missing sidecar) are kept.
    """
    import os as _os

    import numpy as np
    from pyspark.sql.types import DataType as _DT

    from airbyte_spark.lake import bloom as _bl

    probeable = [
        e
        for e in candidates
        if e.bloom
        and e.bloom.get("kind") is None
        and e.bloom.get("col") == pk0
    ]
    if not probeable:
        return candidates
    cap = int(table.properties.get("merge.bloom.max-probe-keys", 2_000_000))
    if cap <= 0:
        return candidates
    # hashes the caller already collected (same capped distinct-key job
    # that fed range pruning) — skip the per-type Spark job for them
    hashes_by_type: dict[str, np.ndarray] = dict(precomputed or {})
    for tname in sorted({e.bloom["type"] for e in probeable}):
        if tname in hashes_by_type:
            continue
        try:
            dt = _DT.fromDDL(tname)
        except Exception:
            continue  # unparseable recorded type: keep those files
        rows = (
            src_keys.select(F.xxhash64(F.col(pk0).try_cast(dt)).alias("h"))
            .distinct()
            .limit(cap + 1)
            .collect()
        )
        if len(rows) > cap:
            return candidates  # batch too large to probe: range-only
        hashes_by_type[tname] = np.array(
            [r["h"] for r in rows], dtype=np.int64
        ).view(np.uint64)
    probeable = [e for e in probeable if e.bloom["type"] in hashes_by_type]
    drop: set[str] = set()
    if len(probeable) > BLOOM_PROBE_DISTRIBUTED_THRESHOLD:
        drop = _bloom_probe_distributed(table, probeable, hashes_by_type)
    else:
        for e in probeable:
            side = e.path + _bl.BLOOM_SUFFIX
            if not _os.path.exists(side):
                continue
            if not _bl.might_contain_any(
                _bl.read_bitmap_sidecar(side),
                hashes_by_type[e.bloom["type"]],
                int(e.bloom["k"]),
            ):
                drop.add(e.path)
    return [e for e in candidates if e.path not in drop]


def _bloom_probe_distributed(
    table: LakeTable,
    probeable: list[DataFileEntry],
    hashes_by_type: dict,
) -> set[str]:
    """Bloom membership probes as a Spark job: one row per candidate
    file, sidecars read by the workers, probe hashes shipped once via
    broadcast (≤16 MB at the 2M-key cap). Only non-hit paths return to
    the driver."""
    spark = table.spark
    bc = spark.sparkContext.broadcast(
        {t: a.tobytes() for t, a in hashes_by_type.items()}
    )
    meta = [(e.path, e.bloom["type"], int(e.bloom["k"])) for e in probeable]
    pdf = spark.createDataFrame(meta, schema="path string, btype string, k int")

    def probe(batches):
        import os as _os

        import numpy as _np
        import pandas as _pd

        from airbyte_spark.lake import bloom as _b

        for batch in batches:
            hit = []
            for path, btype, k in zip(batch["path"], batch["btype"], batch["k"]):
                side = path + _b.BLOOM_SUFFIX
                if not _os.path.exists(side):
                    hit.append(True)
                    continue
                hs = _np.frombuffer(bc.value[btype], dtype=_np.uint64)
                hit.append(
                    _b.might_contain_any(
                        _b.read_bitmap_sidecar(side), hs, int(k)
                    )
                )
            yield _pd.DataFrame({"path": batch["path"], "hit": hit})

    n_parts = min(len(probeable), 4 * (spark.sparkContext.defaultParallelism or 8))
    rows = (
        pdf.repartition(n_parts)
        .mapInPandas(probe, schema="path string, hit boolean")
        .collect()
    )
    return {r["path"] for r in rows if not r["hit"]}


def _plan_merge_candidates(
    table: LakeTable,
    slim: DataFrame,
    pk: list[str],
    target_schema: StructType,
    branch: str,
    part_fields: list,
    planned_parent: str | None,
) -> tuple[list[DataFileEntry], list[DataFileEntry]]:
    """Manifest-pruned candidate file set + live delete files for a merge.

    Runs CONCURRENTLY with the batch dedup (merge_into launches it in a
    thread): the key set used for range/bloom pruning is the batch's
    distinct PK set, which dedup does not change (W1 keeps one row per
    PK), and the partition-tuple set of the pre-dedup batch is a superset
    of the winners' — pruning with it is conservative, never lossy. The
    snapshot planned against is pinned by `planned_parent`: a concurrent
    commit moving the branch between planning and commit raises
    CommitConflict (optimistic concurrency — caller retries).

    Partition pruning: a batch touching K partitions skips the other
    partitions' files entirely. ONLY valid when partition values are
    immutable per PK — otherwise an update that moves a row across
    partitions would leave the old copy stranded (duplicate PKs). The
    table owner asserts immutability via the `merge.partition-pruning`
    property; default off (PK-range manifest pruning is always safe) —
    EXCEPT when every matched partition field is a pure function of PK
    columns (bucket/truncate/identity/temporal OF a pk column): a PK can
    never change its own transform value, so pruning is auto-enabled."""
    key_set = slim.select(*pk).distinct()
    part_pruning = bool(part_fields) and (
        str(
            table.properties.get("merge.partition-pruning", "")
        ).lower() in ("1", "true")
        or all(f.source in pk for f in part_fields)
    )

    def _batch_partition_tuples() -> list:
        """Distinct transformed partition tuples of the batch, computed
        by Spark with the writer's own expressions (hash contract:
        bucket values come from JVM xxhash64, never Python)."""
        from airbyte_spark.lake.transforms import partition_expr

        exprs = [
            partition_expr(f, target_schema[f.source].dataType).alias(f.name)
            for f in part_fields
        ]
        return slim.select(*exprs).distinct().collect()

    # entry count comes from the manifest-list summaries — deciding
    # HOW to plan must not itself cost an O(table) manifest parse
    infos = table.snapshot(branch=branch).manifest_infos
    total_entries = (
        sum(i.get("entry_count", 0) for i in infos) if infos else None
    )
    dist_threshold = int(
        table.properties.get(
            "merge.planning.distributed-threshold",
            DISTRIBUTED_PLANNING_THRESHOLD,
        )
    )
    if total_entries is not None and total_entries > dist_threshold:
        batch_parts = None
        if part_pruning:
            batch_parts = {
                canonical_partition_key(
                    {f.name: partition_str(r[f.name]) for f in part_fields}
                )
                for r in _batch_partition_tuples()
            }
        return _plan_candidates_distributed(
            table, key_set, pk[0], target_schema[pk[0]].dataType,
            branch, batch_parts, snapshot_id=planned_parent,
        )
    entries = table.data_files(branch=branch)
    prunable = entries
    if part_pruning:
        names = [f.name for f in part_fields]
        batch_parts = {
            tuple(partition_str(r[n]) for n in names)
            for r in _batch_partition_tuples()
        }
        prunable = [
            e
            for e in entries
            if tuple(e.partition.get(n) for n in names) in batch_parts
            # unpartitioned files AND files written under an older
            # partition spec (partition evolution) carry no layout
            # value for some current field — they may hold any key
            or not all(n in e.partition for n in names)
        ]
    candidates = _candidate_entries(
        table, key_set, prunable, pk[0],
        pk_type=target_schema[pk[0]].dataType,
    )
    # position deletes ride the same list: read_entries dispatches
    # by content, and a CoW candidate rewrite must fold them in
    live_deletes = table.delete_files(
        branch=branch
    ) + table.position_delete_files(branch=branch)
    return candidates, live_deletes


def merge_into(
    table: LakeTable,
    source: DataFrame,
    cursor_col: str | None = "updated_at",
    cdc_col: str | None = CDC_DELETED_COL,
    salt_buckets: int = 16,
    target_file_bytes: int | None = None,
    branch: str = MAIN,
    generation_id: int = 0,
    broadcast_threshold_bytes: int = 256 * 1024 * 1024,
    mode: str = "cow",
    cdc_mode: str = "hard",
    sort_spec: dict | None = None,
) -> MergeResult:
    """MERGE of a source batch into the lake table.

    sort_spec ({"dims", "curve", "bits", "order_id"} — the table's
    registered sort order, see LakeTable.ensure_sort_order): write the
    output data files ALREADY sorted by the clustering curve key and stamp
    them with the order id, instead of pk-range-bucketed. The downstream
    cluster pass then skips these files entirely (its "unsorted" victim
    criterion keys off the stamp) — the Iceberg sorted-write /
    write.distribution-mode idea (guide §6: partitioning and sort order ON
    WRITE determine how much later rewrites can skip). PK manifest ranges
    per file get wider, but PK bloom sidecars keep candidate membership
    pruning exact. Used by run_maintenance so the steady-state cluster
    stage is metadata-only.

    cdc_mode (the reference's CdcDeletionMode, DatabricksSqlGenerator.kt:
    140; behavior pinned by BasicFunctionalityIntegrationTest.kt:260-276,
    3251-3262): "hard" (default) removes the matched row when the winning
    source record is a CDC delete (`cdc_col` non-null); "soft" upserts the
    deletion record WHOLESALE — the tombstone row (source-nulled fields,
    `_ab_cdc_*` columns kept) becomes the new row version, retained in the
    table. The CDC column still participates in dedup/fetch identity in
    both modes; only the drop-vs-keep decision changes.

    mode="cow" (default): copy-on-write — candidate files are rewritten
    with the batch folded in. Scan-cheap, write-amplified.

    mode="mor": merge-on-read — the reference's actual S13 path
    (insert + equality-delete files resolved at scan time,
    BaseDeltaTaskWriter.java:86-98, S3DataLakeAggregate.kt:53-58
    `newRowDelta()`). The batch resolves against a COLUMN-PRUNED key scan
    of the candidate files (cursor-newer semantics identical to CoW), then
    writes one equality-delete file (winning keys) + new data files
    (winning non-CDC-delete rows). Write cost is O(batch) — no candidate
    rewrite — so frequent micro-batches over a 100 TB table stop
    write-amplifying; reads pay one broadcast anti-join until
    `rewrite_deletes`/compaction folds the deletes in."""
    import time as _time

    _ph: dict = {}
    _t0 = _time.monotonic()

    def _tick(name: str) -> None:
        nonlocal _t0
        _ph[name] = round(_time.monotonic() - _t0, 3)
        _t0 = _time.monotonic()

    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    if cdc_mode not in ("hard", "soft"):
        raise ValueError(f"cdc_mode must be 'hard' or 'soft', got {cdc_mode!r}")
    if sort_spec is not None and not all(
        k in sort_spec for k in ("dims", "curve", "bits", "order_id")
    ):
        raise ValueError("sort_spec needs dims/curve/bits/order_id")
    spark = table.spark
    pk = table.primary_key
    if cursor_col and cursor_col not in source.columns:
        cursor_col = None
    if cdc_col and cdc_col not in source.columns:
        cdc_col = None
    target_file_bytes = target_file_bytes or int(
        table.properties.get("write.target-file-size-bytes", DEFAULT_TARGET_FILE_BYTES)
    )

    # -- slim projection for all key-side work: windows and guards shuffle
    # ~40 B/row instead of the multi-KB image payload (the payload crosses
    # the wire exactly once, in the final fetch join below)
    part_fields = [f for f in table.partition_fields() if f.source in source.columns]
    part_cols = list(dict.fromkeys(f.source for f in part_fields))
    slim_cols = list(dict.fromkeys(
        pk
        + ([cursor_col] if cursor_col else [])
        + [c for c in (EXTRACTED_COL, RAW_ID_COL, cdc_col) if c and c in source.columns]
        + part_cols
    ))
    slim = source.select(*slim_cols).persist()
    winners = None
    src = None
    # the whole body runs under try so a failure at ANY phase (guard,
    # evolve conflict, dedup count) unpersists the cached frames — retried
    # merges must not accumulate cached copies
    try:
        # -- P7 null-PK guard + source size, one cheap action on the slim
        # side. The same pass counts distinct full-identity tuples: when
        # every source row is unique on the dedup-order key set there are
        # no at-least-once replays, so the payload fetch below can skip
        # its dropDuplicates — one full payload shuffle gone (guide §2.3
        # "shuffle keys and metadata instead of payloads"). struct() keeps
        # null-bearing tuples countable with dropDuplicates' null==null
        # grouping semantics.
        null_pk = F.lit(False)
        for c in pk:
            null_pk = null_pk | F.col(c).isNull()
        ident_cols = None
        if RAW_ID_COL in source.columns:
            ident_cols = list(dict.fromkeys(
                pk
                + [RAW_ID_COL]
                + [
                    c
                    for c in (cursor_col, EXTRACTED_COL, cdc_col)
                    if c and c in source.columns and c not in pk
                ]
            ))
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(null_pk.cast("long")).alias("bad"),
        ]
        if ident_cols:
            aggs.append(
                F.count_distinct(F.struct(*ident_cols)).alias("uniq")
            )
        counts = slim.select(*aggs).first()
        _tick("guard")
        if counts["bad"]:
            raise NullPrimaryKeyError(
                f"{counts['bad']} source rows have NULL in primary key {pk}"
            )

        # -- schema evolution: source may carry new columns (cursor, cdc,
        # ...), new NESTED fields inside struct columns, or wider leaf
        # types — evolve the table to the union supertype before writing
        # (IcebergSuperTypeFinder.kt:89-121 semantics; nothing is dropped)
        target_schema = table.schema(branch=branch)
        evolved = merge_supertype(target_schema, source.schema)
        if evolved != target_schema:
            table.evolve_schema(evolved, branch=branch)
            target_schema = table.schema(branch=branch)
        _tick("evolve")

        # -- candidate planning starts NOW, concurrent with the dedup
        # below (guide §2.6): it only needs the batch's DISTINCT PK set,
        # which dedup does not change (W1 keeps one row per PK), and the
        # batch's partition tuples, where the pre-dedup set is a superset
        # (conservative pruning keeps correctness). Both phases are
        # slim-side Spark jobs; FIFO scheduling lets them share the cores.
        from concurrent.futures import ThreadPoolExecutor as _TPE

        planned_parent = table.current_snapshot_id(branch)
        _plan_pool = _TPE(max_workers=1)
        f_plan = _plan_pool.submit(
            _plan_merge_candidates,
            table, slim, pk, target_schema, branch, part_fields,
            planned_parent,
        )

        # -- W1 salted window dedup on the slim keys, then fetch the winning
        # payload rows with one join on the unique raw id (AQE turns it into a
        # broadcast when the winner set is small)
        if RAW_ID_COL in source.columns:
            winners = dedup_batch(slim, pk, cursor_col, salt_buckets).persist()
            # the count runs on the slim/cached side only — the payload-side
            # semi join below stays lazy until the single output write
            deduped_rows = winners.count()
            # fetch keys = the FULL dedup-order key set, not just
            # (pk, raw_id): a source that reuses one raw_id for different
            # records (two updates to the same PK in one batch) would
            # otherwise match BOTH payload rows and dropDuplicates would
            # keep an arbitrary one — the payload row could then disagree
            # with the slim winner (observed: the stale CDC-delete row's
            # payload landing while the winner was the newer upsert).
            # Joining on cursor/extracted/cdc too pins the winner's exact
            # row; rows identical on every key are interchangeable, so the
            # remaining dropDuplicates only absorbs true at-least-once
            # replays.
            # dict.fromkeys: cursor_col may legally BE _airbyte_extracted_at
            # (slim_cols dedups the same way) — a repeat here would project
            # the column twice and make every later reference ambiguous
            extra = list(dict.fromkeys(
                c for c in (cursor_col, EXTRACTED_COL, cdc_col)
                if c and c in source.columns and c not in pk
            ))
            # the extra keys are nullable (an upsert's deleted_at, a
            # meta-less cursor); a plain equi-join would never match the
            # null rows, so both sides join on a null-free string
            # surrogate instead (name-based `on` keeps the self-derived
            # join unambiguous)
            sur = {c: f"__fetch_{c}" for c in extra}
            src_side, win_side = source, winners.select(*pk, RAW_ID_COL, *extra)
            for c, sc in sur.items():
                # tagged surrogate ("n" vs "v:<x>") is injective: a value
                # whose string form is any sentinel byte can never collide
                # with NULL (a plain coalesce-to-sentinel would)
                k = F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                    F.concat(F.lit("v:"), F.col(c).cast("string"))
                )
                src_side = src_side.withColumn(sc, k)
                win_side = win_side.withColumn(sc, k).drop(c)
            join_keys = pk + [RAW_ID_COL] + list(sur.values())
            src = src_side.join(
                F.broadcast(win_side)
                if deduped_rows <= 2_000_000
                else win_side,
                on=join_keys,
                how="left_semi",
            ).drop(*sur.values())
            # absorbs true at-least-once replays (identical rows);
            # dropDuplicates treats nulls as equal, unlike the join.
            # Skipped when the guard pass proved the batch replay-free
            # (every row unique on the full identity): the semi join then
            # emits at most one payload row per winner already, and the
            # payload never pays this extra full-width shuffle.
            if counts["uniq"] != counts["n"]:
                src = src.dropDuplicates(pk + [RAW_ID_COL] + extra)
        else:
            src = dedup_batch(source, pk, cursor_col, salt_buckets).persist()
            deduped_rows = src.count()
        _tick("dedup")

        # -- join the concurrent candidate planning (launched before the
        # dedup above; `infos` is re-derived for the CoW sizing below)
        keyed = winners if winners is not None else src
        try:
            candidates, live_deletes = f_plan.result()
        finally:
            _plan_pool.shutdown(wait=True)
        infos = table.snapshot(branch=branch).manifest_infos
        _tick("candidates")

        if mode == "mor":
            return _merge_mor(
                table=table,
                src=src,
                keyed=keyed,
                candidates=candidates,
                live_deletes=live_deletes,
                target_schema=target_schema,
                pk=pk,
                cursor_col=cursor_col,
                cdc_col=cdc_col,
                cdc_mode=cdc_mode,
                branch=branch,
                generation_id=generation_id,
                planned_parent=planned_parent,
                source_rows=int(counts["n"]),
                deduped_rows=int(deduped_rows),
                target_file_bytes=target_file_bytes,
                phases=_ph,
                tick=_tick,
                sort_spec=sort_spec,
            )

        touched = table.read_entries(
            candidates, target_schema, deletes=live_deletes
        ).alias("t")
        s = _align_to(src, target_schema).alias("s")

        # -- resolve strategy. Airbyte micro-batches cap at 100k rows /
        # 50 MB (AggregatePublishingConfig.kt:36-38), so the deduped batch
        # is normally broadcastable: resolve as target LEFT JOIN
        # broadcast(source) + a key-only anti join for inserts — the
        # candidate payload is scanned once and shuffled only by the
        # output bucketing, never for the join. Oversized batches fall
        # back to an explicit sort-merge full-outer (both sides are
        # distinct-per-key post-W1, so the join cannot skew).
        cand_rows = sum(e.rows for e in candidates)
        cand_bytes = sum(e.bytes for e in candidates)
        if cand_rows:
            avg_row = cand_bytes / cand_rows
        elif infos:
            # distributed planning never lists the table driver-side;
            # the manifest summaries carry the same totals
            avg_row = sum(i.get("bytes", 0) for i in infos) / max(
                1, sum(i.get("rows", 0) for i in infos)
            )
        else:
            all_entries = table.data_files(branch=branch)
            avg_row = (
                sum(e.bytes for e in all_entries)
                / max(1, sum(e.rows for e in all_entries))
                if all_entries
                else 1024.0
            )
        src_bytes_est = deduped_rows * avg_row
        cond = F.lit(True)
        for c in pk:
            cond = cond & (F.col(f"t.{c}") == F.col(f"s.{c}"))
        src_present = F.col(f"s.{pk[0]}").isNotNull()
        newer = _cursor_newer(
            "t", "s", cursor_col,
            has_extracted=EXTRACTED_COL in target_schema.fieldNames(),
        )
        src_is_delete = (
            F.col(f"s.{cdc_col}").isNotNull()
            if cdc_col and cdc_mode == "hard"
            else F.lit(False)
        )
        if src_bytes_est <= broadcast_threshold_bytes:
            j = touched.join(F.broadcast(s), cond, "left")
            use_src = src_present & newer
            keep = F.when(use_src, ~src_is_delete).otherwise(F.lit(True))
            out_cols = [
                F.when(use_src, F.col(f"s.{f.name}"))
                .otherwise(F.col(f"t.{f.name}"))
                .alias(f.name)
                for f in target_schema.fields
            ]
            updates = j.filter(keep).select(*out_cols)
            # inserts: batch keys absent from the candidate files — the
            # anti join probes a column-pruned key-only scan (no payload)
            key_scan = table.read_entries(
                candidates, target_schema, deletes=live_deletes
            ).select(*pk)
            not_deleted = (
                ~F.col(cdc_col).isNotNull()
                if cdc_col and cdc_mode == "hard"
                else F.lit(True)
            )
            inserts = (
                s.join(key_scan, on=pk, how="left_anti")
                .filter(not_deleted)
                .select(*[F.col(f.name) for f in target_schema.fields])
            )
            merged = updates.unionByName(inserts)
        else:
            j = touched.hint("merge").join(s, cond, "full_outer")
            tgt_present = F.col(f"t.{pk[0]}").isNotNull()
            use_src = src_present & (~tgt_present | newer)
            # row survives unless the winning version is a CDC delete
            keep = F.when(use_src, ~src_is_delete).otherwise(tgt_present)
            out_cols = [
                F.when(use_src, F.col(f"s.{f.name}"))
                .otherwise(F.col(f"t.{f.name}"))
                .alias(f.name)
                for f in target_schema.fields
            ]
            merged = j.filter(keep).select(*out_cols)

        # -- O1: keep the table PK-sorted; size output files to target
        est_bytes = int(cand_bytes + src_bytes_est)
        n_out = max(1, -(-est_bytes // target_file_bytes))
        # single-pass range-bucketed write (see operators/rangewrite.py):
        # boundaries interpolate from candidate manifest stats (zero extra
        # jobs); fallback to a column-pruned sample when no stats exist.
        # repartitionByRange would instead sample the full merge plan and
        # execute the payload join twice.
        from airbyte_spark.operators.rangewrite import (
            manifest_boundaries,
            range_bucketed,
            sampled_boundaries,
        )

        est_rows = cand_rows + deduped_rows
        stamp_order = None
        if sort_spec is not None and all(
            d in target_schema.fieldNames() for d in sort_spec["dims"]
        ):
            # sorted write (see merge_into docstring): the rewritten
            # candidates + batch come out curve-sorted and stamped, so the
            # cluster stage downstream skips every file this merge touched
            out = _curve_sorted_out(
                table, merged, sort_spec, candidates,
                merged.select(*sort_spec["dims"]), est_rows, n_out,
            )
            stamp_order = int(sort_spec["order_id"])
        else:
            bounds = manifest_boundaries(candidates, pk[0], n_out)
            if not bounds and n_out > 1:
                bounds = sampled_boundaries(
                    merged.select(pk[0]), pk[0], n_out, est_rows
                )
            out = range_bucketed(
                merged,
                F.col(pk[0]),
                bounds,
                sort_cols=list(pk),
                min_tasks=spark.sparkContext.defaultParallelism,
            )
        new_entries = table.write_dataframe(
            out, generation_id=generation_id, partition_by="_pid", phases=_ph
        )
        if stamp_order is not None:
            for e in new_entries:
                e.sort_order_id = stamp_order
        _tick("write_total")
        # rewritten candidates may exhaust a position-delete file's
        # referenced inventory — retire it in the same commit
        from airbyte_spark.operators.posdeletes import dead_position_deletes

        remove = {e.path for e in candidates}
        dead_pos = dead_position_deletes(
            table,
            [d for d in live_deletes if d.content == "position-deletes"],
            remove,
            branch=branch,
            snapshot_id=planned_parent,
        )
        snap = table.commit(
            "merge",
            new_entries,
            remove_paths=remove | {d.path for d in dead_pos},
            branch=branch,
            expected_parent=planned_parent,
            summary={
                "source_rows": int(counts["n"]),
                "deduped_rows": int(deduped_rows),
                "candidate_files": len(candidates),
            },
        )
        return MergeResult(
            snapshot=snap,
            source_rows=int(counts["n"]),
            deduped_rows=int(deduped_rows),
            rewritten_files=len(candidates),
            added_files=len(new_entries),
            phase_sec=_ph,
            rewritten_bytes=sum(e.bytes for e in candidates),
            added_bytes=sum(e.bytes for e in new_entries),
        )
    finally:
        if winners is not None:
            winners.unpersist()
        elif src is not None:
            src.unpersist()
        slim.unpersist()


def _curve_sorted_out(
    table: LakeTable,
    df: DataFrame,
    sort_spec: dict,
    bounds_entries: list[DataFileEntry],
    slim_dims_df: DataFrame,
    est_rows: int,
    n_out: int,
):
    """Range-bucket `df` by the registered clustering curve key (guide §6
    sorted write — see merge_into sort_spec). `slim_dims_df` is a
    column-pruned frame of just the clustered dims used for dim-bound
    fallback and bucket-boundary quantiles (sampled BEFORE the key UDF, so
    the boundary pass is bounded at ~200k UDF rows)."""
    from airbyte_spark.operators.cluster import _dim_bounds_entries, curve_key_udf
    from airbyte_spark.operators.rangewrite import numeric_boundaries, range_bucketed

    dims = sort_spec["dims"]
    key = curve_key_udf(
        dims,
        _dim_bounds_entries(bounds_entries, slim_dims_df, dims),
        sort_spec["curve"],
        int(sort_spec["bits"]),
    )
    keyed = df.withColumn("_ck", key(*[F.col(d) for d in dims]))
    sl = slim_dims_df
    frac = min(1.0, 200_000 / max(1, est_rows))
    if frac < 1.0:
        sl = sl.sample(fraction=frac, seed=42)
    sl = sl.withColumn("_ck", key(*[F.col(d) for d in dims]))
    bounds = numeric_boundaries(sl, "_ck", n_out)
    return range_bucketed(
        keyed,
        F.col("_ck"),
        bounds,
        sort_cols=["_ck"] + list(table.primary_key),
        min_tasks=table.spark.sparkContext.defaultParallelism,
    ).drop("_ck")


def _merge_mor(
    *,
    table: LakeTable,
    src: DataFrame,
    keyed: DataFrame,
    candidates: list[DataFileEntry],
    live_deletes: list[DataFileEntry],
    target_schema: StructType,
    pk: list[str],
    cursor_col: str | None,
    cdc_col: str | None,
    cdc_mode: str,
    branch: str,
    generation_id: int,
    planned_parent: str,
    source_rows: int,
    deduped_rows: int,
    target_file_bytes: int,
    phases: dict,
    tick,
    sort_spec: dict | None = None,
) -> MergeResult:
    """Merge-on-read execution: resolve the deduped batch against a
    column-pruned key scan of the candidate files (same cursor-newer
    semantics as CoW), then write ONE equality-delete file (all winning
    keys) + new data files (winning non-CDC-delete rows). Candidate files
    are never rewritten; the per-batch write cost is O(batch)."""
    spark = table.spark
    cast_map = {f.name: f.dataType for f in target_schema.fields}
    resolve_cols = list(
        dict.fromkeys(pk + ([cursor_col] if cursor_col else []) + [EXTRACTED_COL])
    )
    # target side: key/cursor columns only — Catalyst prunes the payload
    # out of the parquet scan; live deletes from earlier MoR batches apply
    tgt = table.read_entries(candidates, target_schema, deletes=live_deletes)
    tgt = tgt.select(*[c for c in resolve_cols if c in tgt.columns])
    # source side: the slim winner keys; align dtypes to the table's so the
    # resolve join and the delete file compare in table types
    s = keyed
    for c in resolve_cols + ([cdc_col] if cdc_col else []):
        # backfill type comes from the TABLE schema: a non-timestamp cursor
        # on a meta-less source must not become a mistyped timestamp null
        # (falls back to timestamp only for _airbyte_* bookkeeping columns
        # absent from a meta-less table's schema)
        typ = cast_map.get(c, TimestampType())
        if c not in s.columns:
            s = s.withColumn(c, F.lit(None).cast(typ))
        if c not in tgt.columns:
            tgt = tgt.withColumn(c, F.lit(None).cast(typ))
    s = s.select(
        *[
            F.col(c).cast(cast_map[c]).alias(c) if c in cast_map else F.col(c)
            for c in s.columns
        ]
    )
    j = s.alias("s").join(
        tgt.alias("t"),
        [F.col(f"t.{c}") == F.col(f"s.{c}") for c in pk],
        "left",
    )
    tgt_present = F.col(f"t.{pk[0]}").isNotNull()
    win = (~tgt_present) | _cursor_newer(
        "t", "s", cursor_col,
        has_extracted=EXTRACTED_COL in target_schema.fieldNames(),
    )
    src_is_delete = (
        F.col(f"s.{cdc_col}").isNotNull()
        if cdc_col and cdc_mode == "hard"
        else F.lit(False)
    )
    winners = (
        j.filter(win)
        .select(
            *[F.col(f"s.{c}").alias(c) for c in pk],
            src_is_delete.alias("_is_del"),
        )
        .persist()
    )
    try:
        ins_keys = winners.filter(~F.col("_is_del")).select(*pk)
        inserts = _align_to(src, target_schema).join(
            F.broadcast(ins_keys) if deduped_rows <= 2_000_000 else ins_keys,
            on=pk,
            how="left_semi",
        )
        from airbyte_spark.operators.rangewrite import (
            range_bucketed,
            sampled_boundaries,
        )

        all_entries = candidates or table.data_files(branch=branch)
        avg_row = (
            sum(e.bytes for e in all_entries)
            / max(1, sum(e.rows for e in all_entries))
            if all_entries
            else 1024.0
        )
        n_out = max(1, -(-int(deduped_rows * avg_row) // target_file_bytes))
        # the resolve join must materialize its cache 32-wide ONCE so the
        # two concurrent writers below only drain it. When a boundary
        # quantile job runs (n_out > 1) its collect IS that
        # materialization — an explicit count() would be a redundant
        # sequential job; single-bucket batches keep it.
        if n_out <= 1:
            winners.count()
        tick("mor_resolve")
        stamp_order = None
        if sort_spec is not None and all(
            d in target_schema.fieldNames() for d in sort_spec["dims"]
        ):
            # sorted write: bucket + sort by the registered curve key so
            # the cluster stage skips these files (see merge_into
            # docstring). Boundary quantiles sample the WINNER rows
            # (`inserts`, a dims-pruned pass over the cached source):
            # sampling the raw batch instead overweights hot-key curve
            # regions (intra-batch duplicates) and yields undersized
            # output files the next cluster pass repacks.
            slim_dims = inserts.select(*sort_spec["dims"])
            out = _curve_sorted_out(
                table, inserts, sort_spec, all_entries, slim_dims,
                deduped_rows, n_out,
            )
            stamp_order = int(sort_spec["order_id"])
        else:
            # boundaries from the persisted winner keys (same key set as
            # `inserts`, minus nothing that moves a quantile): sampling
            # `inserts` would re-run the payload-side semi join once more
            bounds = sampled_boundaries(ins_keys, pk[0], n_out, deduped_rows)
            out = range_bucketed(
                inserts,
                F.col(pk[0]),
                bounds,
                sort_cols=list(pk),
                min_tasks=spark.sparkContext.defaultParallelism,
            )
        # one delete file covers every winning key — upserts AND CDC
        # deletes; keys with no current target row are harmless (the
        # reference also writes deletes blindly, BaseDeltaTaskWriter.java:
        # 86-98 delete-then-insert per record). The delete write is a
        # single-file drain of the winner cache, so it runs CONCURRENTLY
        # with the big data write (guide §2.6 — independent jobs backfill
        # the tail; FIFO scheduling lets the small job use freed cores).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            f_del = pool.submit(
                table.write_delete_files, winners.select(*pk), generation_id
            )
            try:
                data_entries = table.write_dataframe(
                    out, generation_id=generation_id, partition_by="_pid",
                    phases=phases,
                )
            finally:
                del_entries = f_del.result()
        if stamp_order is not None:
            for e in data_entries:
                e.sort_order_id = stamp_order
        tick("mor_writes")
        snap = table.commit(
            "merge",
            data_entries + del_entries,
            branch=branch,
            expected_parent=planned_parent,
            summary={
                "mode": "mor",
                "source_rows": source_rows,
                "deduped_rows": deduped_rows,
                "candidate_files": len(candidates),
                "delete_files": len(del_entries),
            },
        )
        # -- delete-debt policy (Iceberg's rewrite_data_files
        # delete-threshold analog): every MoR batch adds one delete era the
        # scan-side anti-join must fold in; past `merge.mor.max-delete-eras`
        # live eras the debt is folded into the data files HERE, so
        # unattended micro-batch loops keep bounded read plans without a
        # manual maintenance call. 0 disables (caller owns maintenance).
        max_eras = int(table.properties.get("merge.mor.max-delete-eras", 8) or 0)
        if max_eras:
            eras = {d.sequence or 0 for d in table.delete_files(branch=branch)}
            if len(eras) > max_eras:
                from airbyte_spark.operators.deletes import rewrite_deletes

                fold = rewrite_deletes(table, branch=branch)
                tick("mor_delete_fold")
                snap = fold.snapshot or snap
        return MergeResult(
            snapshot=snap,
            source_rows=source_rows,
            deduped_rows=deduped_rows,
            rewritten_files=0,
            added_files=len(data_entries) + len(del_entries),
            phase_sec=phases,
            rewritten_bytes=0,
            added_bytes=sum(e.bytes for e in data_entries + del_entries),
        )
    finally:
        winners.unpersist()
