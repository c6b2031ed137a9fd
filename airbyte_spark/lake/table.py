"""LakeTable — snapshot/branch/manifest table over Parquet.

Semantics mirrored from the reference (SURVEY.md §2.1, §2.11):

- append           -> S12 `table.newAppend().appendFile(f).toBranch(staging)`
                      (S3DataLakeAggregate.kt:60-64)
- overwrite_files  -> S13 rowDelta / RewriteFiles (we are copy-on-write:
                      remove + add file sets in one atomic snapshot)
- branches + replace_branch -> staging-branch isolation and atomic swap
                      (S3DataLakeStreamLoader.kt:74-133)
- expire_snapshots + remove_orphan_files -> IcebergTableCleaner.kt:33-72
- generation ids on file dirs -> S14 generation-tagged naming
                      (IcebergUtil.kt:58-69)
- scan(..) with key-range pruning over manifest min/max stats -> Iceberg
  manifest filtering / S5 planFiles path predicates

All data movement is Spark DataFrames; only metadata (JSON, ~KB per commit)
is handled on the driver. At 10^12-row scale, manifests shard per commit and
stat collection is distributed (lake/stats.py).
"""

from __future__ import annotations

import glob
import os
import threading
import time
from collections import OrderedDict

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.lake.format import (
    DataFileEntry,
    Snapshot,
    atomic_write_json,
    manifest_summary,
    new_id,
    now_ms,
    read_json,
)
from airbyte_spark.lake.stats import collect_file_entries

MAIN = "main"

# One lock per table root: the refs.json read-check-write in _swap_ref /
# replace_branch must be atomic against concurrent committers in THIS
# process (run_partitioned_maintenance's thread pool) — without it two
# threads can both pass the expected_parent check and the second write
# silently discards the first commit, and no CommitConflict ever fires.
# Cross-process atomicity comes from the catalog in a real deployment
# (Iceberg: catalog compare-and-swap); separate processes here operate on
# separate tables (scripts/weak_scaling.py).
_REFS_LOCKS: dict[str, threading.Lock] = {}
_REFS_LOCKS_GUARD = threading.Lock()

# Manifest files are immutable and uuid-named, so their parsed contents can
# be cached process-wide: planning reads the same manifests on every scan /
# commit / maintenance pass, and with manifest REUSE (commit() below) the
# same physical manifest stays live across many snapshots. Bounded FIFO;
# expire_snapshots evicts what it unlinks.
_MANIFEST_CACHE: OrderedDict[str, list[dict]] = OrderedDict()
_MANIFEST_CACHE_CAP = 256
_MANIFEST_CACHE_LOCK = threading.Lock()


def _read_manifest_raw(path: str) -> list[dict]:
    with _MANIFEST_CACHE_LOCK:
        if path in _MANIFEST_CACHE:
            _MANIFEST_CACHE.move_to_end(path)
            return _MANIFEST_CACHE[path]
    raw = read_json(path)["entries"]
    with _MANIFEST_CACHE_LOCK:
        _MANIFEST_CACHE[path] = raw
        while len(_MANIFEST_CACHE) > _MANIFEST_CACHE_CAP:
            _MANIFEST_CACHE.popitem(last=False)
    return raw


def _evict_manifest(path: str) -> None:
    with _MANIFEST_CACHE_LOCK:
        _MANIFEST_CACHE.pop(path, None)


def _manifest_may_match(
    info: dict, partition_filter: dict | None, key_range, dt
) -> bool:
    """Manifest-level pruning from the manifest-list summary (Iceberg
    manifest filtering): False only when NO entry in the manifest can
    survive scan()'s own entry-level filters — so skipping the manifest
    is exactly equivalent to reading and filtering it.

    Partition pruning applies only to pure-data manifests because scan()
    partition-filters data entries but keeps delete entries; stats-range
    pruning applies to both kinds because scan() range-prunes both.
    """
    if partition_filter and info.get("content") == ["data"]:
        parts = info.get("partitions")
        # a partition dict LACKING a filter column is an entry written
        # under an older partition spec (partition evolution): its rows
        # can only be filtered row-level, so the manifest must be kept —
        # mirrors scan()'s entry rule exactly (missing column -> keep)
        if parts is not None and not any(
            all(
                c not in p or p.get(c) == partition_str(v)
                for c, v in partition_filter.items()
            )
            for p in parts
        ):
            return False
    if key_range is not None and dt is not None:
        col, lo, hi = key_range
        s = (info.get("stats") or {}).get(col)
        if s is not None and not _intersects(s, lo, hi, dt):
            return False
    return True


def _group_add_entries(
    add_entries: list[DataFileEntry], target_entries: int = 8192
) -> list[list[DataFileEntry]]:
    """Split a commit's added entries into manifest groups by (content,
    partition) so a partition-filtered scan can skip whole manifests.
    Falls back to content-only grouping past 16 groups, and slices any
    group larger than `target_entries` — one giant manifest would defeat
    removal targeting (its dir set blows the summary cap) and can never
    be rebalanced by commit-time merging (merging only folds SMALL
    manifests)."""
    if not add_entries:
        return []
    groups: dict[tuple, list[DataFileEntry]] = {}
    for e in add_entries:
        groups.setdefault(
            (e.content, tuple(sorted(e.partition.items()))), []
        ).append(e)
    if len(groups) > 16:
        groups = {}
        for e in add_entries:
            groups.setdefault((e.content,), []).append(e)
    out: list[list[DataFileEntry]] = []
    for _, g in sorted(groups.items(), key=lambda kv: str(kv[0])):
        for i in range(0, len(g), target_entries):
            out.append(g[i : i + target_entries])
    return out


def _refs_lock(root: str) -> threading.Lock:
    with _REFS_LOCKS_GUARD:
        return _REFS_LOCKS.setdefault(os.path.abspath(root), threading.Lock())


class CommitConflict(Exception):
    """Optimistic-concurrency failure: branch moved since we loaded it."""


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------------
    # create / load
    # ------------------------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: StructType,
        primary_key: list[str],
        stats_columns: list[str] | None = None,
        properties: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> "LakeTable":
        # spec-gate the engine-reserved properties (lake/spec.py): a typo
        # like "cluster.max-delete-era" is a config error the user must
        # see at create time, not a silently applied default
        from airbyte_spark.lake.spec import (
            ConfigValidationError,
            validate_table_properties,
        )

        prop_errors = validate_table_properties(properties or {})
        if prop_errors:
            raise ConfigValidationError(prop_errors)
        # float/double identifier fields are forbidden by Iceberg; the
        # reference silently converts them to string at table creation
        # (AirbyteTypeToIcebergSchema.kt:111-117, documented in
        # docs/integrations/destinations/s3-data-lake.md:331-334). Same
        # here — range/bloom pruning semantics on a float PK would
        # otherwise be silently wrong (NaN ordering, JSON round-trip).
        from pyspark.sql.types import DoubleType, FloatType

        forced = [
            f.name
            for f in schema.fields
            if f.name in primary_key
            and isinstance(f.dataType, (FloatType, DoubleType))
        ]
        if forced:
            schema = StructType(
                [
                    StructField(f.name, StringType(), f.nullable, f.metadata)
                    if f.name in forced
                    else f
                    for f in schema.fields
                ]
            )
        # partition spec grammar + type check (lake/transforms.py): a
        # typo'd transform or a temporal transform over an int column is
        # a create-time error, never a garbage directory layout (checked
        # AFTER the float-PK override so a forced-to-string PK validates
        # against the type that will actually be stored)
        from airbyte_spark.lake.transforms import validate_partition_spec

        validate_partition_spec(partition_by or [], schema)
        t = LakeTable(spark, root)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        snap = Snapshot(
            snapshot_id=new_id(),
            parent_id=None,
            sequence=0,
            timestamp_ms=now_ms(),
            operation="create",
            manifests=[],
            schema_json=schema.json(),
            summary={},
        )
        t._write_snapshot(snap)
        atomic_write_json(
            os.path.join(t.meta_dir, "refs.json"),
            {
                "branches": {MAIN: snap.snapshot_id},
                "table": {
                    "primary_key": primary_key,
                    "stats_columns": stats_columns
                    or [c for c in schema.fieldNames() if c != "bytes"],
                    "properties": properties or {},
                    # schema registry: id -> schema JSON. Files are stamped
                    # with the schema id they were written under so old files
                    # stay readable after evolution (IcebergTableSynchronizer
                    # semantics, SURVEY.md §2.11 / build-plan step 7).
                    "schemas": {"0": schema.json()},
                    "current_schema_id": 0,
                    # identity partition columns: files are laid out and
                    # pruned per partition; maintenance jobs scope to one
                    # partition (bounded rewrites + independent commits at
                    # 10^12-row scale)
                    "partition_by": partition_by or [],
                },
            },
        )
        return t

    @staticmethod
    def load(spark: SparkSession, root: str) -> "LakeTable":
        t = LakeTable(spark, root)
        if not os.path.exists(os.path.join(t.meta_dir, "refs.json")):
            raise FileNotFoundError(f"no lake table at {root}")
        return t

    # ------------------------------------------------------------------
    # metadata accessors
    # ------------------------------------------------------------------

    def _refs(self) -> dict:
        return read_json(os.path.join(self.meta_dir, "refs.json"))

    @property
    def primary_key(self) -> list[str]:
        return self._refs()["table"]["primary_key"]

    @property
    def stats_columns(self) -> list[str]:
        return self._refs()["table"]["stats_columns"]

    @property
    def properties(self) -> dict:
        return self._refs()["table"]["properties"]

    def set_properties(self, updates: dict) -> None:
        """Merge property updates under the per-table lock (None deletes
        a key). Engine-reserved prefixes stay validated like create()."""
        from airbyte_spark.lake.spec import (
            ConfigValidationError,
            validate_table_properties,
        )

        errors = validate_table_properties(
            {k: v for k, v in updates.items() if v is not None}
        )
        if errors:
            raise ConfigValidationError(errors)
        with _refs_lock(self.root):
            refs = self._refs()
            props = refs["table"].setdefault("properties", {})
            for k, v in updates.items():
                if v is None:
                    props.pop(k, None)
                else:
                    props[k] = v
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    @property
    def current_schema_id(self) -> int:
        return int(self._refs()["table"].get("current_schema_id", 0))

    @property
    def partition_by(self) -> list[str]:
        return self._refs()["table"].get("partition_by", [])

    def partition_fields(self) -> list:
        """Parsed partition spec (lake/transforms.py PartitionField);
        identity entries keep field.name == column, so pre-transform
        tables resolve unchanged."""
        from airbyte_spark.lake.transforms import parse_partition_spec

        return parse_partition_spec(self.partition_by)

    def resolve_partition_filter(self, pf: dict | None) -> dict | None:
        """Normalize a user-facing partition filter to the layout form:
        {field_name: layout_string_value}. A key may be a partition
        FIELD name (value is already a layout string — internal callers
        echo entry.partition dicts back) or a SOURCE column name (the
        raw literal runs through the field's transform via the same
        Spark expression the writer used). Unknown keys pass through
        stringified — partition evolution may leave filters naming
        old-spec columns that only row-level enforcement can honor."""
        if not pf:
            return pf
        from airbyte_spark.lake.transforms import fields_by_key, transform_literal

        fmap = fields_by_key(self.partition_fields())
        schema = self.schema()
        out: dict = {}
        for k, v in pf.items():
            f = fmap.get(k)
            if f is None or k == f.name and f.transform != "identity":
                out[k] = partition_str(v)
            elif f.transform == "identity":
                out[f.name] = partition_str(v)
            else:
                out[f.name] = transform_literal(
                    self.spark, f, v, schema[f.source].dataType
                )
        return out

    def registered_schema(self, schema_id: int) -> StructType:
        import json as _json

        refs = self._refs()
        schemas = refs["table"].get("schemas")
        if schemas is None:  # pre-registry table: fall back to snapshot schema
            return self.schema()
        return StructType.fromJson(_json.loads(schemas[str(schema_id)]))

    # ------------------------------------------------------------------
    # sort-order registry (Iceberg sort_orders / data-file sort_order_id)
    # ------------------------------------------------------------------

    def sort_orders(self) -> dict[int, dict]:
        """Registered sort orders: id -> {dims, curve, bits}. Id 0 is
        reserved for "unsorted" and never appears here."""
        return {
            int(k): v
            for k, v in self._refs()["table"].get("sort_orders", {}).items()
        }

    def ensure_sort_order(
        self, dims: list[str], curve: str, bits: int
    ) -> int:
        """Return the id of the (dims, curve, bits) sort order, registering
        it if new. Ids are allocated monotonically and NEVER reused: a PK
        change clears the registry (`invalidate_sort_orders`), so the same
        order re-registered afterwards gets a FRESH id and every file
        stamped under the old id reads as dirty — the
        IcebergTableSynchronizer.kt:314-378 "identifier change rebuilds the
        sort order" contract expressed through victim selection."""
        want = {"dims": list(dims), "curve": curve, "bits": int(bits)}
        with _refs_lock(self.root):
            refs = self._refs()
            tbl = refs["table"]
            orders = tbl.setdefault("sort_orders", {})
            for k, v in orders.items():
                if v == want:
                    return int(k)
            nid = int(tbl.get("next_sort_order_id", 1))
            orders[str(nid)] = want
            tbl["next_sort_order_id"] = nid + 1
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)
            return nid

    def invalidate_sort_orders(self) -> None:
        """Drop every registered sort order (ids are not reused). Called on
        identifier-field change: previously clustered files keep their old
        stamp, which no longer matches any current order -> all dirty."""
        with _refs_lock(self.root):
            refs = self._refs()
            tbl = refs["table"]
            n = len(tbl.get("sort_orders", {}))
            tbl["next_sort_order_id"] = int(tbl.get("next_sort_order_id", 1)) + n
            tbl["sort_orders"] = {}
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    def branches(self) -> dict[str, str]:
        return self._refs()["branches"]

    def current_snapshot_id(self, branch: str = MAIN) -> str:
        return self._refs()["branches"][branch]

    def snapshot(self, snapshot_id: str | None = None, branch: str = MAIN) -> Snapshot:
        sid = snapshot_id or self.current_snapshot_id(branch)
        # `snapshot_id` may be a TAG name (Iceberg `VERSION AS OF 'tag'`
        # resolves named refs): resolve it when it isn't a snapshot id
        path = os.path.join(self.meta_dir, f"snap-{sid}.json")
        if not os.path.exists(path):
            tagged = self.tags.get(sid)
            if tagged is not None:
                path = os.path.join(self.meta_dir, f"snap-{tagged}.json")
        return Snapshot.from_json(read_json(path))

    @property
    def tags(self) -> dict[str, str]:
        """Named immutable snapshot references (Iceberg tags): unlike a
        branch, a tag never moves; expire_snapshots keeps every tagged
        snapshot (and, transitively, its files from GC) until the tag is
        dropped — the audit/reproducibility pin for training-data runs."""
        return self._refs().get("tags", {})

    def create_tag(self, name: str, snapshot_id: str | None = None) -> None:
        with _refs_lock(self.root):
            refs = self._refs()
            sid = snapshot_id or refs["branches"][MAIN]
            if not os.path.exists(
                os.path.join(self.meta_dir, f"snap-{sid}.json")
            ):
                raise ValueError(f"unknown snapshot: {sid}")
            tags = refs.setdefault("tags", {})
            if name in tags:
                raise ValueError(f"tag exists: {name}")
            if name in refs["branches"]:
                raise ValueError(f"name collides with a branch: {name}")
            tags[name] = sid
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    def drop_tag(self, name: str) -> None:
        with _refs_lock(self.root):
            refs = self._refs()
            refs.get("tags", {}).pop(name, None)
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    def snapshot_as_of(self, timestamp_ms: int, branch: str = MAIN) -> Snapshot:
        """Time travel (Iceberg `FOR SYSTEM_TIME AS OF`): the newest
        snapshot on `branch` committed at or before `timestamp_ms`. Walks
        the branch ancestry, so it respects rollbacks and never returns a
        snapshot from another branch's history."""
        sid = self.current_snapshot_id(branch)
        while sid is not None:
            s = self.snapshot(sid)
            if s.timestamp_ms <= timestamp_ms:
                return s
            sid = s.parent_id
        raise ValueError(
            f"no snapshot on {branch} at or before {timestamp_ms} "
            "(history may have been expired)"
        )

    def schema(self, branch: str = MAIN, snapshot_id: str | None = None) -> StructType:
        return StructType.fromJson(
            __import__("json").loads(self.snapshot(snapshot_id, branch).schema_json)
        )

    def _live_manifests(self, snap: Snapshot) -> list[tuple[str, dict | None]]:
        """(name, manifest-list summary) pairs; summary None for snapshots
        written before summaries existed (readers then open the manifest)."""
        if len(snap.manifest_infos) == len(snap.manifests):
            return list(zip(snap.manifests, snap.manifest_infos))
        return [(m, None) for m in snap.manifests]

    def _read_entries_of(self, manifest_name: str) -> list[DataFileEntry]:
        return [
            DataFileEntry.from_json(d)
            for d in _read_manifest_raw(os.path.join(self.meta_dir, manifest_name))
        ]

    def all_files(
        self,
        branch: str = MAIN,
        snapshot_id: str | None = None,
        partition_filter: dict | None = None,
        key_range: tuple[str, object, object] | None = None,
    ) -> list[DataFileEntry]:
        """Every manifest entry at a snapshot — data AND delete files.

        `partition_filter` / `key_range` enable MANIFEST-level pruning
        from the manifest-list summaries: a manifest whose summary proves
        no entry can survive scan()'s entry-level filters is never opened
        (Iceberg manifest filtering). Callers must still apply the same
        entry-level filters — pruning here only skips whole manifests.
        """
        snap = self.snapshot(snapshot_id, branch)
        dt = None
        if key_range is not None:
            schema = self.schema(branch=branch, snapshot_id=snap.snapshot_id)
            col = key_range[0]
            dt = schema[col].dataType if col in schema.fieldNames() else None
        entries: list[DataFileEntry] = []
        for name, info in self._live_manifests(snap):
            if info is not None and not _manifest_may_match(
                info, partition_filter, key_range, dt
            ):
                continue
            entries.extend(self._read_entries_of(name))
        return entries

    def data_files(
        self,
        branch: str = MAIN,
        snapshot_id: str | None = None,
        partition_filter: dict | None = None,
        key_range: tuple[str, object, object] | None = None,
    ) -> list[DataFileEntry]:
        """Data-file entries; `partition_filter`/`key_range` only PRUNE
        MANIFESTS (see all_files) — callers still entry-filter."""
        return [
            e
            for e in self.all_files(
                branch,
                snapshot_id,
                partition_filter=partition_filter,
                key_range=key_range,
            )
            if e.content == "data"
        ]

    def delete_files(
        self, branch: str = MAIN, snapshot_id: str | None = None
    ) -> list[DataFileEntry]:
        """Live equality-delete files (merge-on-read path, S13 rowDelta)."""
        return [
            e
            for e in self.all_files(branch, snapshot_id)
            if e.content == "equality-deletes"
        ]

    def position_delete_files(
        self, branch: str = MAIN, snapshot_id: str | None = None
    ) -> list[DataFileEntry]:
        """Live position-delete files (Iceberg v2 'Position Delete Files':
        each (file_path, pos) row removes the pos-th row of the named data
        file). Written by operators/posdeletes.py (delete_where,
        retire_equality_deletes); applied by read_entries/scan."""
        return [
            e
            for e in self.all_files(branch, snapshot_id)
            if e.content == "position-deletes"
        ]

    def history(self, branch: str = MAIN) -> list[Snapshot]:
        out = []
        sid = self.current_snapshot_id(branch)
        while sid is not None:
            s = self.snapshot(sid)
            out.append(s)
            sid = s.parent_id
        return out

    # ------------------------------------------------------------------
    # write paths
    # ------------------------------------------------------------------

    def _write_snapshot(self, snap: Snapshot) -> None:
        atomic_write_json(
            os.path.join(self.meta_dir, f"snap-{snap.snapshot_id}.json"), snap.to_json()
        )

    def _write_manifest(self, entries: list[DataFileEntry]) -> tuple[str, dict]:
        name = f"manifest-{new_id()}.json"
        atomic_write_json(
            os.path.join(self.meta_dir, name), {"entries": [e.to_json() for e in entries]}
        )
        return name, manifest_summary(entries)

    def _swap_ref(self, branch: str, expected_parent: str | None, new_sid: str) -> None:
        with _refs_lock(self.root):
            refs = self._refs()
            cur = refs["branches"].get(branch)
            if expected_parent is not None and cur != expected_parent:
                raise CommitConflict(
                    f"branch {branch} moved: expected {expected_parent}, found {cur}"
                )
            refs["branches"][branch] = new_sid
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    def write_dataframe(
        self,
        df: DataFrame,
        generation_id: int = 0,
        partition_by: str | None = None,
        phases: dict | None = None,
    ) -> list[DataFileEntry]:
        """Materialize a DataFrame as parquet data files; no commit yet.

        One commit-scoped subdir per write, generation-tagged (S14). The
        caller controls partitioning/ordering of `df` — this is where
        target-file-size binning (compaction) or range-bucketed writes
        (merge/clustering, operators/rangewrite.py) have already been
        applied upstream. `partition_by` names a transient bucket column:
        the writer emits exactly one file per bucket value and the column
        is not stored.

        Table-level partition fields (`self.partition_fields()` — identity
        columns or hidden-partitioning transforms, lake/transforms.py) are
        written as `_p_<field>=<value>` directory levels via derived
        columns, so the data file keeps the real source column (files stay
        self-contained for schema-aligned reads) while the layout carries
        transformed partition values for pruning."""
        from airbyte_spark.lake.transforms import partition_expr

        _t0 = time.monotonic()

        def _tick(name: str) -> None:
            nonlocal _t0
            if phases is None:
                return
            now = time.monotonic()
            phases[name] = round(phases.get(name, 0.0) + (now - _t0), 3)
            _t0 = now

        commit_dir = os.path.join(self.data_dir, f"{new_id()}-g{generation_id}")
        schema = self.schema()
        fields = [f for f in self.partition_fields() if f.source in df.columns]
        part_names = [f.name for f in fields]
        write_parts = [f"_p_{f.name}" for f in fields]
        for f in fields:
            dt = (
                schema[f.source].dataType
                if f.source in schema.fieldNames()
                else df.schema[f.source].dataType
            )
            df = df.withColumn(f"_p_{f.name}", partition_expr(f, dt))
        if partition_by:
            write_parts.append(partition_by)
        w = df.write.mode("errorifexists")
        if write_parts:
            w = w.partitionBy(*write_parts)
        w.parquet(commit_dir)
        _tick("write")
        _drop_markers(commit_dir)
        paths = sorted(
            glob.glob(os.path.join(commit_dir, "**", "part-*.parquet"), recursive=True)
        )
        # bloom sidecar build (slim PK-column Spark scan) and footer-stat
        # collection are independent passes over the just-written files —
        # overlap them (guide §2.6: independent jobs back-fill each
        # other's stragglers)
        bloom_future = None
        pool = None
        if self.primary_key and self.primary_key[0] in df.columns and paths:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
            bloom_future = pool.submit(self._build_pk_blooms, paths)
        try:
            entries = collect_file_entries(
                self.spark,
                paths,
                self.stats_columns,
                generation_id,
                schema_id=self.current_schema_id,
            )
            _tick("stats")
            built = bloom_future.result() if bloom_future is not None else None
            if bloom_future is not None:
                _tick("bloom-join")
        finally:
            if pool is not None:
                pool.shutdown(wait=True)
        for e in entries:
            e.partition = _partition_values(e.path, part_names)
        # drop zero-row part files (Spark emits one per empty partition) —
        # they carry no data and would defeat manifest-stat pruning.
        # (AFTER the bloom scan has joined: never unlink under a live scan)
        for e in entries:
            if e.rows == 0:
                os.unlink(e.path)
        live = [e for e in entries if e.rows > 0]
        if built:
            self._stamp_pk_blooms(live, built)
        return live

    def _attach_pk_blooms(self, entries: list[DataFileEntry]) -> None:
        """Build + attach per-file PK bloom sidecars for freshly written
        data files (see _build_pk_blooms for the pass shape)."""
        built = self._build_pk_blooms([e.path for e in entries])
        if built:
            self._stamp_pk_blooms(entries, built)

    def _stamp_pk_blooms(self, entries: list[DataFileEntry], built: dict) -> None:
        from airbyte_spark.operators.fileid import file_tail

        m_by_tail, k, tname, n = (
            built["m_by_tail"], built["k"], built["type"], built["depth"],
        )
        pk0 = self.primary_key[0]
        for e in entries:
            m = m_by_tail.get(file_tail(e.path, n))
            if m:
                e.bloom = {"col": pk0, "type": tname, "m": int(m), "k": k}

    def _build_pk_blooms(self, paths: list[str]) -> dict | None:
        """Build per-file PK bloom sidecars (lake/bloom.py) for freshly
        written data files. ONE slim Spark pass: read only the leading PK
        column of the new files (column-pruned scan), hash with Spark's
        `xxhash64` — the same hash every probe side uses — group rows by
        source file, and write `<file>.bloom` bitmaps from the workers.
        The shuffle moves (file-tail, int64) pairs only: ~16 B/row
        regardless of payload width. Manifest entries carry just
        {col, type, m, k}; the bitmap never enters the manifest.
        Returns the {tail: m} map + hash parameters for _stamp_pk_blooms
        (split out so the build can run CONCURRENTLY with footer-stat
        collection in write_dataframe — guide §2.6)."""
        from airbyte_spark.lake import bloom as _bl
        from airbyte_spark.operators.fileid import (
            _suffix_depth,
            file_tail,
            input_file_tail,
        )

        props = self.properties
        if str(props.get("write.pk-bloom.enabled", "true")).lower() not in (
            "1",
            "true",
        ):
            return None
        pk0 = self.primary_key[0]
        bits_per_key = int(
            props.get("write.pk-bloom.bits-per-key", _bl.DEFAULT_BITS_PER_KEY)
        )
        k = _bl.optimal_k(bits_per_key)
        if not paths:
            return None
        n = _suffix_depth(paths)
        tail_to_path = {file_tail(p, n): p for p in paths}
        raw = self.spark.read.parquet(*paths)
        pk_type = raw.schema[pk0].dataType
        scan = raw.select(
            input_file_tail(n).alias("_f"), F.xxhash64(F.col(pk0)).alias("_h")
        )

        def _build(pdf):
            import numpy as _np
            import pandas as _pd

            from airbyte_spark.lake import bloom as _b

            tail = pdf["_f"].iloc[0]
            h = pdf["_h"].to_numpy(dtype=_np.int64).view(_np.uint64)
            m = _b.bloom_bits(len(h), bits_per_key)
            _b.write_bitmap_sidecar(tail_to_path[tail], _b.build_bitmap(h, m, k))
            return _pd.DataFrame({"tail": [tail], "m": [m]})

        out = (
            scan.groupBy("_f")
            .applyInPandas(_build, schema="tail string, m long")
            .collect()
        )
        return {
            "m_by_tail": {r["tail"]: r["m"] for r in out},
            "k": k,
            "type": pk_type.simpleString(),
            "depth": n,
        }

    def backfill_pk_blooms(self, branch: str = MAIN) -> int:
        """Stamp PK bloom sidecars onto live data files that lack them.

        The streaming sink (sources/lakestream.py) writes from Python
        DataSource workers with no SparkSession, so it cannot honor the
        sidecar hash contract (SPARK's xxhash64 — bloom.py); its files
        land bloom-less and every probe conservatively keeps them. This
        backfill — run as a maintenance stage — restores tight membership
        pruning: one column-pruned Spark pass per schema generation over
        ONLY the bloom-less files, then a METADATA-ONLY commit that
        re-adds the same entries (same path, same ORIGINAL sequence, same
        sort_order_id) with the bloom descriptor attached, so
        equality-delete applicability, position-delete references, and
        cluster cleanliness are all unchanged. Incremental by
        construction: steady state has zero bloom-less files and this is
        a metadata-only no-op (no Spark job, no commit).

        Files whose recorded schema lacks the leading PK column (written
        before the column existed) are skipped — hashing a null-padded
        column would build a bloom of the null hash only, and a later
        probe for a real key would FALSELY prune the file (row loss).
        Returns the number of files stamped."""
        if not self.primary_key:
            return 0
        props = self.properties
        if str(props.get("write.pk-bloom.enabled", "true")).lower() not in (
            "1",
            "true",
        ):
            return 0
        pk0 = self.primary_key[0]
        todo = [
            e
            for e in self.data_files(branch=branch)
            if e.bloom is None and e.rows > 0
        ]
        if not todo:
            return 0
        by_schema: dict[int, list[DataFileEntry]] = {}
        for e in todo:
            by_schema.setdefault(e.schema_id or 0, []).append(e)
        stamped: list[DataFileEntry] = []
        for sid, group in sorted(by_schema.items()):
            try:
                fields = set(self.registered_schema(sid).fieldNames())
            except Exception:
                fields = {f.name for f in self.spark.read.parquet(
                    group[0].path).schema.fields}
            if pk0 not in fields:
                continue
            self._attach_pk_blooms(group)
            stamped.extend(e for e in group if e.bloom)
        if not stamped:
            return 0
        self.commit(
            "attach-blooms",
            add_entries=stamped,
            remove_paths={e.path for e in stamped},
            branch=branch,
            summary={"backfilled_blooms": len(stamped)},
        )
        return len(stamped)

    def write_delete_files(
        self, keys: DataFrame, generation_id: int = 0
    ) -> list[DataFileEntry]:
        """Materialize an equality-delete file set: ONLY the table's
        primary-key columns, stats collected on the keys so scans and the
        delete-fold rewrite can prune by key range. Micro-batch key sets
        coalesce to a single file (the reference writes one delete file per
        batch aggregate, S3DataLakeAggregate.kt:53-58). No commit yet —
        pass the entries to `commit(add_entries=...)`."""
        pk = self.primary_key
        commit_dir = os.path.join(self.data_dir, f"{new_id()}-g{generation_id}-del")
        # repartition(1), NOT coalesce(1): coalesce collapses the WHOLE
        # upstream pipeline (the MoR resolve join included) into one task;
        # the extra shuffle of slim key rows is noise next to running the
        # resolve reduce side 32-wide (optimization guide §2.4/§2.6)
        keys.select(*pk).repartition(1).write.mode("errorifexists").parquet(commit_dir)
        _drop_markers(commit_dir)
        paths = sorted(glob.glob(os.path.join(commit_dir, "part-*.parquet")))
        entries = collect_file_entries(
            self.spark, paths, pk, generation_id, schema_id=self.current_schema_id
        )
        for e in entries:
            e.content = "equality-deletes"
            if e.rows == 0:
                os.unlink(e.path)
        live = [e for e in entries if e.rows > 0]
        self._attach_delete_key_hashes(live)
        return live

    def write_position_delete_files(
        self,
        pairs: DataFrame,
        referenced: list[str] | None,
        generation_id: int = 0,
    ) -> list[DataFileEntry]:
        """Materialize a position-delete file (Iceberg v2 'Position Delete
        Files'): rows are (file_path, pos) where `file_path` is the
        depth-POS_KEY_DEPTH path tail of a live data file (the same
        <...>/<dir>/<file> identity every rewrite operator keys on —
        operators/fileid.py; the commit-uuid dir segment makes it unique
        table-wide) and `pos` is the parquet row ordinal within that file
        (Spark's `_metadata.row_index`). `referenced` lists the FULL paths
        of the data files the rows name, so retirement and victim selection
        never open the delete file; above REFERENCED_PATHS_CAP it is
        stored as None = "references everything" (conservative). No commit
        yet — pass the entries to `commit(add_entries=...)`."""
        from airbyte_spark.lake.format import REFERENCED_PATHS_CAP

        commit_dir = os.path.join(
            self.data_dir, f"{new_id()}-g{generation_id}-posdel"
        )
        (
            pairs.select(
                F.col("file_path").cast("string").alias("file_path"),
                F.col("pos").cast("long").alias("pos"),
            )
            # repartition, not coalesce: keep the upstream position scan
            # parallel (see write_delete_files)
            .repartition(1)
            .write.mode("errorifexists")
            .parquet(commit_dir)
        )
        _drop_markers(commit_dir)
        paths = sorted(glob.glob(os.path.join(commit_dir, "part-*.parquet")))
        entries = collect_file_entries(
            self.spark, paths, [], generation_id, schema_id=self.current_schema_id
        )
        if referenced is not None:
            referenced = sorted(set(referenced))
            if len(referenced) > REFERENCED_PATHS_CAP:
                referenced = None
        for e in entries:
            e.content = "position-deletes"
            e.referenced = referenced
            if e.rows == 0:
                os.unlink(e.path)
        return [e for e in entries if e.rows > 0]

    def _attach_delete_key_hashes(self, entries: list[DataFileEntry]) -> None:
        """Write `<file>.keyhashes` next to each fresh equality-delete
        file: the raw Spark-xxhash64 hashes of its leading-PK keys. The
        cluster victim test (operators/cluster.py delete_may_hit) probes
        data-file blooms with these DRIVER-side — pure numpy, no Spark job
        and no Python re-implementation of Spark's hash. Delete files are
        micro-batch-sized by construction (one per merge batch), so the
        hash array is bounded by the batch cap, not the table."""
        from airbyte_spark.lake import bloom as _bl

        props = self.properties
        if not entries or str(
            props.get("write.pk-bloom.enabled", "true")
        ).lower() not in ("1", "true"):
            return
        import numpy as np

        pk0 = self.primary_key[0]
        for e in entries:
            part = self.spark.read.parquet(e.path)
            tname = part.schema[pk0].dataType.simpleString()
            hs = [
                r["h"]
                for r in part.select(F.xxhash64(F.col(pk0)).alias("h")).collect()
            ]
            _bl.write_hashes_sidecar(e.path, np.array(hs, dtype=np.int64))
            e.bloom = {"kind": "hashes", "col": pk0, "type": tname, "n": len(hs)}

    def commit(
        self,
        operation: str,
        add_entries: list[DataFileEntry],
        remove_paths: set[str] | None = None,
        branch: str = MAIN,
        schema: StructType | None = None,
        summary: dict | None = None,
        expected_parent: str | None = None,
    ) -> Snapshot:
        """Atomic snapshot commit: (existing - removed) + added files.

        Added entries with `sequence=None` are stamped with the new
        snapshot's sequence; metadata-only rewrites pass entries with their
        original sequence so equality-delete applicability is unchanged.

        Metadata cost is O(change), not O(table) (Iceberg fast-append /
        manifest-reuse semantics): parent manifests are carried forward BY
        NAME; only manifests that actually contain a removed path are
        rewritten (targeted via the commit-dir prefixes in the manifest
        summaries — a removed path can only live in a manifest covering
        its directory), and added entries go into fresh manifests grouped
        by (content, partition). Commit-time merging then folds small
        manifests once the list exceeds commit.manifest-min-count-to-merge
        so planning stays O(live manifests), amortized O(batch) per
        commit."""
        parent = self.snapshot(branch=branch)
        if expected_parent is not None and parent.snapshot_id != expected_parent:
            raise CommitConflict(
                f"expected parent {expected_parent}, found {parent.snapshot_id}"
            )
        remove_paths = set(remove_paths or ())
        for e in add_entries:
            if e.sequence is None:
                e.sequence = parent.sequence + 1
        target_entries = int(
            self.properties.get("commit.manifest-target-entries", 8192)
        )
        manis: list[tuple[str, dict | None]] = []
        if remove_paths:
            remove_dirs = {os.path.dirname(p) for p in remove_paths}
            remaining = set(remove_paths)
            survivors: list[DataFileEntry] = []
            for name, info in self._live_manifests(parent):
                may_contain = remaining and (
                    info is None
                    or info.get("dirs") is None
                    or any(d in remove_dirs for d in info["dirs"])
                )
                if not may_contain:
                    manis.append((name, info))
                    continue
                entries = self._read_entries_of(name)
                hit = {e.path for e in entries} & remaining
                if not hit:
                    manis.append((name, info))
                    continue
                remaining -= hit
                survivors.extend(e for e in entries if e.path not in remove_paths)
            # survivors of a removal that spanned many manifests must NOT
            # fold into one giant manifest: an oversized manifest never
            # rebalances (commit-time merging only folds SMALL manifests)
            # and its dir set blows SUMMARY_DIRS_CAP, so every later
            # removal would reopen it — metadata cost creeping back toward
            # O(table). Slice by (content, partition) like added entries.
            for group in _group_add_entries(survivors, target_entries):
                manis.append(self._write_manifest(group))
        else:
            manis = self._live_manifests(parent)
        for group in _group_add_entries(add_entries, target_entries):
            manis.append(self._write_manifest(group))
        manis = self._maybe_merge_manifests(manis)
        # one-time upgrade: summarize legacy manifests so every snapshot
        # from here on carries a complete manifest list
        manis = [
            (n, i if i is not None else manifest_summary(self._read_entries_of(n)))
            for n, i in manis
        ]
        snap = Snapshot(
            snapshot_id=new_id(),
            parent_id=parent.snapshot_id,
            sequence=parent.sequence + 1,
            timestamp_ms=now_ms(),
            operation=operation,
            manifests=[n for n, _ in manis],
            manifest_infos=[i for _, i in manis],
            schema_json=(schema or self.schema(branch=branch)).json(),
            summary={
                "added_files": len(add_entries),
                "removed_files": len(remove_paths),
                "added_rows": sum(e.rows for e in add_entries),
                "added_bytes": sum(e.bytes for e in add_entries),
                **(summary or {}),
            },
        )
        self._write_snapshot(snap)
        self._swap_ref(branch, parent.snapshot_id, snap.snapshot_id)
        return snap

    def _maybe_merge_manifests(
        self, manis: list[tuple[str, dict | None]]
    ) -> list[tuple[str, dict | None]]:
        """Commit-time manifest merging (Iceberg
        `commit.manifests.min-count-to-merge` semantics): once the live
        manifest list outgrows the threshold, fold small manifests —
        binned per content kind so pure-data manifests stay
        partition-prunable — into ones of up to
        commit.manifest-target-entries entries. Amortized O(batch): each
        entry is rewritten O(log) times over the table's life, and
        planning stays O(bounded manifest count) forever."""
        min_count = int(
            self.properties.get("commit.manifest-min-count-to-merge", 32)
        )
        target = int(self.properties.get("commit.manifest-target-entries", 8192))
        if len(manis) <= min_count:
            return manis
        out: list[tuple[str, dict | None]] = []
        bins: dict[tuple, list[tuple[str, dict]]] = {}
        for name, info in manis:
            if info is None:
                info = manifest_summary(self._read_entries_of(name))
            if info["entry_count"] >= target:
                out.append((name, info))
                continue
            bins.setdefault(tuple(info["content"]), []).append((name, info))
        for _sig, small in sorted(bins.items()):
            small.sort(key=lambda t: t[1]["entry_count"])
            def flush(group: list[tuple[str, dict]]) -> None:
                if len(group) == 1:
                    out.append(group[0])  # lone manifest: keep, don't rewrite
                elif group:
                    merged: list[DataFileEntry] = []
                    for n, _ in group:
                        merged.extend(self._read_entries_of(n))
                    out.append(self._write_manifest(merged))

            cur: list[tuple[str, dict]] = []
            cur_n = 0
            for name, info in small:
                n = info["entry_count"]
                if cur and cur_n + n > target:
                    flush(cur)
                    cur, cur_n = [], 0
                cur.append((name, info))
                cur_n += n
            flush(cur)
        return out

    def append(
        self, df: DataFrame, generation_id: int = 0, branch: str = MAIN
    ) -> Snapshot:
        # same column names, different types (e.g. a double-typed source
        # PK against the create-time string override, or a pre-widening
        # source): cast to the registered schema so the written files
        # always match the schema id they are stamped with
        tgt = self.schema(branch=branch)
        if set(df.columns) == set(tgt.fieldNames()) and [
            (f.name, f.dataType) for f in df.schema.fields
        ] != [(f.name, f.dataType) for f in tgt.fields]:
            df = df.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in tgt.fields]
            )
        entries = self.write_dataframe(df, generation_id)
        return self.commit("append", entries, branch=branch)

    # ------------------------------------------------------------------
    # schema evolution + manifest rewrite
    # ------------------------------------------------------------------

    def evolve_schema(
        self,
        new_schema: StructType,
        new_primary_key: list[str] | None = None,
        branch: str = MAIN,
        drop_behavior: str = "drop",
    ) -> Snapshot:
        """Validate and commit a schema change (see lake/evolve.py). Data
        files are untouched; old files stay readable via the schema registry.
        A PK change flags a sort-order rebuild in the snapshot summary
        (the caller should run a clustering rewrite to restore O1 order).

        `drop_behavior` is the reference's ColumnDropBehavior
        (BasicFunctionalityIntegrationTest.kt:246-258): "drop" (default)
        removes top-level columns missing from `new_schema`; "retain"
        keeps them in the registered schema — readable with their old
        values, NULL for rows written afterwards — while writers simply
        stop providing them. Nested (struct-field) drops always follow
        `new_schema` — the reference models the behavior per top-level
        column only."""
        from airbyte_spark.lake.evolve import diff_schemas

        if drop_behavior not in ("drop", "retain"):
            raise ValueError(
                f"drop_behavior must be 'drop' or 'retain': {drop_behavior!r}"
            )
        old_schema = self.schema(branch=branch)
        if drop_behavior == "retain":
            names = set(new_schema.fieldNames())
            retained = [
                StructField(f.name, f.dataType, True, f.metadata)
                for f in old_schema.fields
                if f.name not in names
            ]
            if retained:
                new_schema = StructType(list(new_schema.fields) + retained)
        if new_primary_key:
            from pyspark.sql.types import DoubleType, FloatType

            bad = [
                c
                for c in new_primary_key
                if c in new_schema.fieldNames()
                and isinstance(
                    new_schema[c].dataType, (FloatType, DoubleType)
                )
            ]
            if bad:
                from airbyte_spark.lake.spec import ConfigValidationError

                raise ConfigValidationError(
                    [
                        {
                            "field": c,
                            "error": "float-identifier",
                            "message": (
                                "float/double identifier fields are not "
                                "supported; the reference converts them to "
                                "string AT TABLE CREATION (AirbyteType"
                                "ToIcebergSchema.kt:111-117, s3-data-lake"
                                ".md:331-334) — an existing float column "
                                "cannot become a key without retyping it "
                                "first (evolve_schema to string)"
                            ),
                        }
                        for c in bad
                    ]
                )
        d = diff_schemas(old_schema, new_schema)
        with _refs_lock(self.root):
            # whole-dict rewrite: must not interleave with a concurrent
            # commit's branch swap (it would silently revert the swap)
            refs = self._refs()
            tbl = refs["table"]
            if new_schema == old_schema:
                # identifier-only change: no new schema registration
                new_id_ = int(tbl.get("current_schema_id", 0))
            else:
                new_id_ = max(int(k) for k in tbl["schemas"]) + 1
                tbl["schemas"][str(new_id_)] = new_schema.json()
                tbl["current_schema_id"] = new_id_
            pk_changed = bool(new_primary_key and new_primary_key != tbl["primary_key"])
            if new_primary_key:
                tbl["primary_key"] = new_primary_key
            if pk_changed:
                # identifier change rebuilds the sort order (inline — the
                # refs lock is not reentrant): clear the registry without
                # reusing ids so every stamped file reads as dirty on the
                # next maintenance pass (IcebergTableSynchronizer.kt:314-378)
                n = len(tbl.get("sort_orders", {}))
                tbl["next_sort_order_id"] = (
                    int(tbl.get("next_sort_order_id", 1)) + n
                )
                tbl["sort_orders"] = {}
            tbl["stats_columns"] = [
                c for c in tbl["stats_columns"] if c in new_schema.fieldNames()
            ] + [c for c in d.added_top_level if c != "bytes"]
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)
        return self.commit(
            "evolve-schema",
            [],
            branch=branch,
            schema=new_schema,
            summary={
                "schema_id": new_id_,
                "added": d.added,
                "dropped": d.dropped,
                "widened": [list(x) for x in d.widened],
                "sort_order_rebuild_required": pk_changed,
            },
        )

    def update_primary_key(self, new_primary_key: list[str], branch: str = MAIN) -> Snapshot:
        """Change the table's identifier fields between syncs
        (testDedupChangePk, BasicFunctionalityIntegrationTest.kt:3483):
        subsequent merges dedup on the NEW key — an incoming row replaces
        every existing row sharing its new-PK value, which collapses
        old-key-era duplicates as they are touched. The sort order is
        invalidated (IcebergTableSynchronizer.kt:314-378), so the next
        dirty-scoped maintenance pass re-clusters every file. Data files
        are untouched here (metadata-only commit)."""
        missing = [c for c in new_primary_key if c not in self.schema(branch=branch).fieldNames()]
        if missing:
            raise ValueError(f"primary key columns not in schema: {missing}")
        return self.evolve_schema(
            self.schema(branch=branch),
            new_primary_key=new_primary_key,
            branch=branch,
        )

    def update_partition_spec(self, new_partition_by: list[str]) -> None:
        """Change the table's partition spec — identity columns or
        hidden-partitioning transforms like ``bucket(16, id)`` /
        ``day(ts)`` (lake/transforms.py) — (Iceberg
        'Partition Evolution', format spec: specs are additive metadata —
        existing data files are NEVER rewritten; they keep the layout of
        the spec they were written under, new writes use the new spec,
        and split planning handles both). Here likewise: metadata-only.
        Readers handle mixed layouts: scan()'s `partition_filter` prunes
        files whose parsed partition values carry the filter column and
        enforces the predicate ROW-LEVEL for files written under a spec
        that lacked it (the real column is always stored in the file);
        maintenance rewrites migrate old files to the current spec
        lazily, exactly like Iceberg's rewrite_data_files after a spec
        change."""
        from airbyte_spark.lake.transforms import validate_partition_spec

        schema = self.schema()
        new_fields = validate_partition_spec(list(new_partition_by), schema)
        with _refs_lock(self.root):
            refs = self._refs()
            old = refs["table"].get("partition_by", [])
            if list(new_partition_by) == list(old):
                return
            # Iceberg's unique-partition-name rule, enforced across the
            # WHOLE spec history: layout dirs and entry.partition are
            # keyed by derived field NAME (id_bucket), which does not
            # encode the transform parameter — if bucket(8, id) reused a
            # name that bucket(4, id) files already carry, scan's
            # partition pruning would compare old-spec values against
            # new-spec literals and silently drop matching rows. Refuse;
            # migrating a transform parameter needs a rewrite
            # (snapshot_table clone or compaction into a fresh table).
            from airbyte_spark.lake.transforms import parse_partition_spec

            seen: dict[str, str] = {}
            for spec in refs["table"].get(
                "partition_spec_history", [old]
            ) + [old]:
                for f in parse_partition_spec(spec):
                    seen[f.name] = f.spec
            for f in new_fields:
                prior = seen.get(f.name)
                if prior is not None and prior != f.spec:
                    raise ValueError(
                        f"partition field name {f.name!r} ({f.spec}) "
                        f"collides with historical spec {prior!r}: layout "
                        "dirs are keyed by derived name, so files written "
                        "under the old transform would be mis-pruned. "
                        "Rewrite the table (snapshot_table + compact) to "
                        "change a transform's parameters."
                    )
            hist = refs["table"].setdefault("partition_spec_history", [old])
            hist.append(list(new_partition_by))
            refs["table"]["partition_by"] = list(new_partition_by)
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    def rewrite_manifests(self, branch: str = MAIN, mode: str = "missing") -> Snapshot:
        """Recompute per-file min/max stats from parquet footers and commit
        fresh manifests (SURVEY.md §2.11 "Manifest rewrite w/ stats"; stat
        source = writer config IcebergTableWriterFactory.kt:108-136).
        Distributed footer reads.

        mode="missing" (default, r6): only data files whose entry LACKS a
        stat for some stats-column present in their schema are re-read —
        files this engine wrote already carry footer-exact stats from
        collect_file_entries, so the steady maintenance pass is a pure
        manifest consolidation with zero file I/O; imported or
        stat-stripped entries still get their footer pass. mode="full"
        forces the O(table) recompute (diagnostics, stats-column changes
        on all-null columns)."""
        old = self.all_files(branch=branch)
        stats_cols = self.stats_columns
        if mode == "full":
            need = list(old)
        else:
            need = []
            for e in old:
                if e.content != "data":
                    continue  # delete-file stats are written with the keys
                try:
                    fields = set(
                        self.registered_schema(e.schema_id or 0).fieldNames()
                    )
                except Exception:
                    need.append(e)
                    continue
                want = [c for c in stats_cols if c in fields]
                if any(c not in e.stats for c in want):
                    need.append(e)
        by_key: dict[tuple[int, int], list[str]] = {}
        for e in need:
            by_key.setdefault((e.generation_id, e.schema_id), []).append(e.path)
        fresh: list[DataFileEntry] = [
            e for e in old if e.path not in {n.path for n in need}
        ]
        for (gen, sid), paths in sorted(by_key.items()):
            fresh.extend(
                collect_file_entries(
                    self.spark, paths, stats_cols, gen, schema_id=sid
                )
            )
        # metadata-only rewrite: carry over identity that stats recomputation
        # must not disturb — partition values, content kind, and the commit
        # sequence (delete applicability depends on it)
        old_by_path = {e.path: e for e in old}
        for e in fresh:
            o = old_by_path[e.path]
            e.partition = o.partition
            e.content = o.content
            e.sequence = o.sequence
            e.sort_order_id = o.sort_order_id
            e.bloom = o.bloom  # sidecar is untouched; keep its descriptor
            e.referenced = o.referenced  # position-delete file inventory
        return self.commit(
            "rewrite-manifests",
            fresh,
            remove_paths={e.path for e in old},
            branch=branch,
            summary={"rewritten_entries": len(fresh)},
        )

    # ------------------------------------------------------------------
    # branches (staging isolation)
    # ------------------------------------------------------------------

    def create_branch(self, name: str, from_branch: str = MAIN) -> None:
        with _refs_lock(self.root):
            refs = self._refs()
            refs["branches"][name] = refs["branches"][from_branch]
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    def replace_branch(
        self, target: str, source: str, require_ancestor: bool = True
    ) -> None:
        """Atomically point `target` at `source`'s snapshot (the teardown
        `replaceBranch(main <- staging)` of S3DataLakeStreamLoader.kt:96-133).

        With `require_ancestor` (default), the swap is fast-forward-only:
        the target's current head must be an ancestor of (or equal to) the
        source head, else a commit that landed on the target since the
        source branched off would be silently discarded — raise
        CommitConflict and let the caller rebase/retry instead."""
        with _refs_lock(self.root):
            self._replace_branch_locked(target, source, require_ancestor)

    def _replace_branch_locked(
        self, target: str, source: str, require_ancestor: bool
    ) -> None:
        refs = self._refs()
        src_head = refs["branches"][source]
        tgt_head = refs["branches"].get(target)
        if require_ancestor and tgt_head is not None:
            sid, ok = src_head, False
            while sid is not None:
                if sid == tgt_head:
                    ok = True
                    break
                p = os.path.join(self.meta_dir, f"snap-{sid}.json")
                if not os.path.exists(p):
                    break  # history trimmed by expire — cannot verify further
                sid = Snapshot.from_json(read_json(p)).parent_id
            if not ok:
                raise CommitConflict(
                    f"branch {target} moved to {tgt_head}, which is not an "
                    f"ancestor of {source} head {src_head}; replace would "
                    "discard that commit"
                )
        refs["branches"][target] = src_head
        atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    def rollback(self, snapshot_id: str, branch: str = MAIN) -> None:
        """Point `branch` back at one of its own ancestors (Iceberg
        `rollback_to_snapshot`). The target must be reachable from the
        current head — rolling back to an unrelated snapshot would orphan
        the branch's file accounting."""
        sid = self.current_snapshot_id(branch)
        while sid is not None:
            if sid == snapshot_id:
                with _refs_lock(self.root):
                    refs = self._refs()
                    refs["branches"][branch] = snapshot_id
                    atomic_write_json(
                        os.path.join(self.meta_dir, "refs.json"), refs
                    )
                return
            p = os.path.join(self.meta_dir, f"snap-{sid}.json")
            if not os.path.exists(p):
                break
            sid = Snapshot.from_json(read_json(p)).parent_id
        raise ValueError(
            f"snapshot {snapshot_id} is not an ancestor of {branch}'s head"
        )

    def drop_branch(self, name: str) -> None:
        with _refs_lock(self.root):
            refs = self._refs()
            refs["branches"].pop(name, None)
            atomic_write_json(os.path.join(self.meta_dir, "refs.json"), refs)

    def cherry_pick(self, snapshot_id: str, branch: str = MAIN) -> "Snapshot":
        """Re-apply an APPEND-ONLY snapshot's added data files onto the
        current head of `branch` (Iceberg `cherrypick_snapshot`): the WAP
        rebase path when a concurrent commit moved the target off the
        staged lineage and fast-forward publish raises CommitConflict.

        Same restriction Iceberg documents: only snapshots whose delta
        vs their parent is purely ADDED DATA files qualify — a snapshot
        that removed files or added delete tombstones depends on its
        parent's file set, and re-applying it against a different head
        could resurrect or double-delete rows. Added entries are
        re-stamped at the new head's sequence (MoR delete applicability
        follows the NEW lineage).

        Scale note: the delta is computed as anti-joins over
        executor-parsed `entries_df` at the source/parent/target
        snapshots, and only the O(delta) added entries' JSON is ever
        collected — no O(table) driver list."""
        import json as _json

        from airbyte_spark.lake.retry import retry_on_conflict

        src = self.snapshot(snapshot_id)
        if src.parent_id is None:
            raise ValueError("cannot cherry-pick the root snapshot")
        cur = self.entries_df(snapshot_id=src.snapshot_id)
        par = self.entries_df(snapshot_id=src.parent_id)
        removed_n = (
            par.select("path").join(cur.select("path"), "path", "left_anti").count()
        )
        if removed_n:
            raise ValueError(
                f"cherry-pick supports append-only snapshots; {snapshot_id} "
                f"removed {removed_n} file(s) vs its parent"
            )
        added = (
            cur.join(par.select("path"), "path", "left_anti")
            .select("path", "content", "entry_json")
            .collect()
        )
        if not added:
            raise ValueError(f"snapshot {snapshot_id} added no files")
        non_data = [r for r in added if r["content"] != "data"]
        if non_data:
            raise ValueError(
                f"cherry-pick supports data appends only; {snapshot_id} added "
                f"{len(non_data)} delete/tombstone file(s)"
            )

        def attempt():
            head = self.snapshot(branch=branch)
            # already-applied guard: any added path live on the target
            # means this snapshot (or a copy) is in the head's lineage
            live = self.entries_df(branch=branch).select("path")
            adf = self.spark.createDataFrame(
                [(r["path"],) for r in added], "path string"
            )
            dup = live.join(F.broadcast(adf), "path", "left_semi").count()
            if dup:
                raise ValueError(
                    f"cherry-pick: {dup} of {snapshot_id}'s files are already "
                    f"live on {branch!r} (already applied?)"
                )
            entries = [
                DataFileEntry.from_json(_json.loads(r["entry_json"]))
                for r in added
            ]
            for e in entries:
                e.sequence = None  # restamp at the new head
            return self.commit(
                "cherry-pick",
                entries,
                branch=branch,
                expected_parent=head.snapshot_id,
                summary={
                    "source-snapshot": snapshot_id,
                    "files": len(entries),
                },
            )

        return retry_on_conflict(attempt)

    # ------------------------------------------------------------------
    # scan
    # ------------------------------------------------------------------

    def scan(
        self,
        branch: str = MAIN,
        snapshot_id: str | None = None,
        columns: list[str] | None = None,
        key_range: tuple[str, object, object] | None = None,
        partition_filter: dict | None = None,
    ) -> DataFrame:
        """Read the table at a snapshot. `key_range=(col, lo, hi)` prunes
        files whose manifest [min,max] does not intersect [lo,hi];
        `partition_filter={col: value}` prunes whole partitions — both
        happen before Spark ever opens a file, on top of parquet
        row-group pruning. Equality-delete files (merge-on-read commits)
        are applied automatically."""
        partition_filter = self.resolve_partition_filter(partition_filter)
        live = self.all_files(
            branch=branch,
            snapshot_id=snapshot_id,
            partition_filter=partition_filter,
            key_range=key_range,
        )
        entries = [e for e in live if e.content == "data"]
        deletes = [e for e in live if e.content == "equality-deletes"]
        # position deletes carry no key stats and match by exact file path,
        # so read_entries' referenced-path intersection is their pruning
        pos_deletes = [e for e in live if e.content == "position-deletes"]
        enforce_partition_rows = False
        if partition_filter:
            kept = []
            for e in entries:
                if all(c in e.partition for c in partition_filter):
                    if partition_matches(e, partition_filter):
                        kept.append(e)
                else:
                    # written under an older partition spec (partition
                    # evolution): the layout can't prune it — keep the
                    # file and enforce the predicate row-level below
                    kept.append(e)
                    enforce_partition_rows = True
            entries = kept
        schema = self.schema(branch=branch, snapshot_id=snapshot_id)
        if key_range is not None:
            col, lo, hi = key_range
            dt = schema[col].dataType
            entries = [e for e in entries if _intersects(e.stats.get(col), lo, hi, dt)]
            # a delete file whose key range misses [lo,hi] cannot affect the
            # surviving rows — prune it from the anti-join too
            deletes = [d for d in deletes if _intersects(d.stats.get(col), lo, hi, dt)]
        if not entries:
            return self.spark.createDataFrame([], schema)
        df = self.read_entries(entries, schema, deletes=deletes + pos_deletes)
        if key_range is not None:
            col, lo, hi = key_range
            df = df.filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
        if enforce_partition_rows:
            # row-level twin of the layout rule, using the SAME partition
            # expression the writer lays dirs out with (identity cast or
            # hidden-partitioning transform) — pre-evolution files contain
            # the real source column, so the filter is exact; rows of
            # exactly-matched files satisfy it trivially
            from airbyte_spark.lake.transforms import fields_by_key, partition_expr

            fmap = fields_by_key(self.partition_fields())
            for c, v in partition_filter.items():
                fld = fmap.get(c)
                if fld is not None and fld.source in schema.fieldNames():
                    expr = partition_expr(fld, schema[fld.source].dataType)
                else:
                    # old-spec column no current field covers: the writer
                    # that laid it out used the identity cast
                    expr = F.col(c).cast("string")
                sv = partition_str(v)
                df = df.filter(
                    expr.isNull() if sv is None else expr == F.lit(sv)
                )
        if columns:
            df = df.select(*columns)
        return df

    def read_entries(
        self,
        entries: list[DataFileEntry],
        schema: StructType | None = None,
        deletes: list[DataFileEntry] | None = None,
    ) -> DataFrame:
        """Read a specific set of data files, aligned to `schema` (default:
        current). Files are grouped by write-time schema id, each group is
        read with its physical schema, cast/null-padded to the logical
        schema and unioned — keeps pre-evolution files readable after
        add-column / int->long widening (IcebergSuperTypeFinder.kt:89-121).

        `deletes`: delete entries to apply — a MIXED list is fine, kinds
        are dispatched by `content`. Equality deletes (Iceberg semantics:
        a delete key removes matching rows from every data file whose
        commit sequence is STRICTLY smaller than the delete file's) apply
        as one anti-join against the max delete sequence per key —
        broadcast when the delete set is micro-batch-sized, which it is by
        construction in the MoR merge path. Position deletes (Iceberg v2)
        apply as a (file, row-ordinal) anti-join over ONLY the data files
        their `referenced` lists name — unreferenced files never pay the
        probe, and the extra columns are a metadata projection
        (`_metadata.row_index`) plus a codegen'd path-tail concat."""
        schema = schema or self.schema()
        entries = [e for e in entries if e.content == "data"]
        if not entries:
            return self.spark.createDataFrame([], schema)
        all_deletes = [d for d in (deletes or []) if d.rows > 0]
        eq_deletes = [d for d in all_deletes if d.content == "equality-deletes"]
        pos_deletes = [d for d in all_deletes if d.content == "position-deletes"]
        # an equality delete only bites data files with a smaller sequence —
        # if every requested file is at least as new as every delete, skip
        min_data_seq = min(e.sequence or 0 for e in entries)
        eq_deletes = [d for d in eq_deletes if (d.sequence or 0) > min_data_seq]
        # a position delete names exact file paths: drop delete files that
        # reference none of the requested entries (referenced=None means
        # "unknown — applies everywhere", the writer's over-cap fallback)
        paths = {e.path for e in entries}
        pos_deletes = [
            d
            for d in pos_deletes
            if d.referenced is None or paths & set(d.referenced)
        ]
        ref_union: set[str] | None = set()
        for d in pos_deletes:
            if d.referenced is None:
                ref_union = None
                break
            ref_union.update(d.referenced)

        def _pos_dirty(e: DataFileEntry) -> bool:
            return bool(pos_deletes) and (
                ref_union is None or e.path in ref_union
            )

        by_schema: dict[tuple[int, bool], list[DataFileEntry]] = {}
        for e in entries:
            by_schema.setdefault((e.schema_id, _pos_dirty(e)), []).append(e)
        parts: list[DataFrame] = []
        for (sid, dirty), group in sorted(by_schema.items()):
            physical = self.registered_schema(sid)
            part = self.spark.read.schema(physical).parquet(*(e.path for e in group))
            keep: list[str] = []
            if eq_deletes:
                # per-row commit sequence via the <dir>/<file>-keyed map
                # (operators/fileid.py): ONE multi-path scan per schema, not
                # one scan node per (schema, sequence) — after thousands of
                # MoR micro-batches a per-sequence union would explode the
                # plan while this stays a single codegen'd projection
                from airbyte_spark.operators.fileid import tail_map

                part = part.withColumn(
                    "_mor_seq", tail_map({e.path: e.sequence or 0 for e in group})
                )
                keep.append("_mor_seq")
            if dirty:
                from airbyte_spark.operators.fileid import input_file_tail

                part = part.withColumn(
                    "_pos_file", input_file_tail(POS_KEY_DEPTH)
                ).withColumn("_pos_idx", F.col("_metadata.row_index"))
                part = _align_keep(part, schema, keep + ["_pos_file", "_pos_idx"])
                part = apply_position_deletes(self, part, pos_deletes).drop(
                    "_pos_file", "_pos_idx"
                )
            else:
                part = _align_keep(part, schema, keep)
            parts.append(part)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if not eq_deletes:
            return df
        return apply_equality_deletes(self, df, eq_deletes)

    def scan_incremental(
        self,
        from_snapshot_id: str,
        branch: str = MAIN,
        to_snapshot_id: str | None = None,
    ) -> DataFrame:
        """Changelog-style incremental read (Iceberg incremental append
        scan): rows in data files committed AFTER `from_snapshot_id` up to
        `to_snapshot_id`/head. Selected purely from manifest sequence
        numbers — no diffing of row contents. Note: CoW rewrites
        (compact/cluster/merge) re-add rows with a new sequence, so run
        incremental consumers against append/MoR-merge windows or between
        maintenance passes, same as Iceberg's append-scan caveat."""
        from_seq = self.snapshot(from_snapshot_id).sequence
        to_snap = self.snapshot(to_snapshot_id, branch)
        entries = [
            e
            for e in self.data_files(branch=branch, snapshot_id=to_snap.snapshot_id)
            if (e.sequence or 0) > from_seq
        ]
        deletes = self.delete_files(
            branch=branch, snapshot_id=to_snap.snapshot_id
        ) + self.position_delete_files(
            branch=branch, snapshot_id=to_snap.snapshot_id
        )
        schema = self.schema(branch=branch, snapshot_id=to_snap.snapshot_id)
        if not entries:
            return self.spark.createDataFrame([], schema)
        return self.read_entries(entries, schema, deletes=deletes)

    #: snapshot operations whose row set is PROVABLY unchanged (pinned by
    #: the maintenance scan-invariance tests): a changelog emits nothing
    #: for them — exactly Iceberg's "ignore REPLACE snapshots" rule.
    _ROWSET_INVARIANT_OPS = frozenset(
        {
            "compact",
            "cluster",
            "rewrite-deletes",
            "retire-deletes",
            "rewrite-manifests",
            "rewrite-tombstones",
            "attach-blooms",
            "evolve-schema",
            "create",
        }
    )

    def scan_changelog(
        self,
        from_snapshot_id: str,
        branch: str = MAIN,
        to_snapshot_id: str | None = None,
    ) -> DataFrame:
        """Row-level changelog between two snapshots (Iceberg changelog
        scan / Delta CDF analog): current schema plus `_change_type`
        ('insert' | 'delete'; an update appears as its delete+insert
        pair) and `_change_snapshot_id`. Walks the commit chain and emits
        per snapshot:

        * append — added files as inserts;
        * MoR merge — added files as inserts (post-images), plus the
          batch's equality-delete keys semi-joined against a PRUNED
          as-of-parent read (range+bloom candidate test, the same
          delete_may_hit the maintenance ops use) as deletes
          (pre-images);
        * delete_where / MoR update_where — the new tombstones
          inner-joined at (file, pos) against the as-of-parent read of
          just the referenced files, plus whole removed files, as
          deletes (rows an older delete already hid are excluded: the
          as-of-parent read applies them); update_where additionally
          emits its post-image copies as inserts via the added-files
          rule;
        * cherry-pick / add-files — added data files as inserts (both
          ops are append-only by construction);
        * snapshot-table — the clone's full corpus as inserts, with the
          commit's own cloned position tombstones applied (the clone's
          live rows, not its raw files);
        * maintenance ops (_ROWSET_INVARIANT_OPS) — nothing, which is
          sound precisely because their scan-invariance is test-pinned;
        * CoW merges / truncate — ValueError: a CoW row diff is not
          recoverable from metadata (Iceberg's overwrite-snapshot
          changelog limitation), and a truncate's "diff" is the whole
          table twice — silently turning an O(batch) consumer into
          O(table). Run changelog consumers on MoR tables.
        """
        chain: list[Snapshot] = []
        s = self.snapshot(to_snapshot_id, branch)
        while s.snapshot_id != from_snapshot_id:
            chain.append(s)
            if s.parent_id is None:
                raise ValueError(
                    f"{from_snapshot_id} is not an ancestor of "
                    f"{s.snapshot_id} (expired history?)"
                )
            s = self.snapshot(s.parent_id)
        chain.reverse()
        schema = self.schema(branch=branch, snapshot_id=self.snapshot(
            to_snapshot_id, branch).snapshot_id)
        out_schema = StructType(
            list(schema.fields)
            + [
                StructField("_change_type", StringType()),
                StructField("_change_snapshot_id", StringType()),
            ]
        )
        parts: list[DataFrame] = []

        def tag(df: DataFrame, kind: str, sid: str) -> DataFrame:
            return _align_keep(df, schema, []).select(
                "*",
                F.lit(kind).alias("_change_type"),
                F.lit(sid).alias("_change_snapshot_id"),
            )

        for s in chain:
            if s.operation in self._ROWSET_INVARIANT_OPS:
                continue
            if s.operation not in (
                "append",
                "merge",
                "delete",
                "update",
                "cherry-pick",
                "add-files",
                "snapshot-table",
            ):
                raise ValueError(
                    f"changelog cannot reconstruct op {s.operation!r} "
                    f"(snapshot {s.snapshot_id})"
                )
            live = self.all_files(branch=branch, snapshot_id=s.snapshot_id)
            added_data = [
                e
                for e in live
                if e.content == "data" and (e.sequence or 0) == s.sequence
            ]
            if s.operation == "merge" and s.summary.get("mode") != "mor":
                raise ValueError(
                    "changelog requires MoR merges: a CoW overwrite's row "
                    f"diff is not recoverable (snapshot {s.snapshot_id})"
                )
            if added_data:
                # a commit's inserts are its live added rows: apply the
                # SAME commit's position tombstones (snapshot-table clones
                # its source's pos-deletes alongside the files they
                # reference; for every other op they reference only older
                # files, so this is a path-mismatch no-op)
                same_pos = [
                    e
                    for e in live
                    if e.content == "position-deletes"
                    and (e.sequence or 0) == s.sequence
                ]
                parts.append(
                    tag(
                        self.read_entries(added_data, schema, deletes=same_pos),
                        "insert",
                        s.snapshot_id,
                    )
                )
            parent_live = self.all_files(branch=branch, snapshot_id=s.parent_id)
            parent_data = [e for e in parent_live if e.content == "data"]
            parent_dels = [e for e in parent_live if e.content != "data"]
            if s.operation == "merge":
                new_dels = [
                    e
                    for e in live
                    if e.content == "equality-deletes"
                    and (e.sequence or 0) == s.sequence
                ]
                if new_dels:
                    from airbyte_spark.operators.cluster import delete_may_hit

                    pk = self.primary_key
                    cache: dict = {}
                    cands = [
                        e
                        for e in parent_data
                        if any(
                            delete_may_hit(e, d, pk, schema, cache=cache)
                            for d in new_dels
                        )
                    ]
                    if cands:
                        pre = self.read_entries(
                            cands, schema, deletes=parent_dels
                        )
                        keys = F.broadcast(
                            equality_delete_keys(self, new_dels).select(*pk)
                        )
                        parts.append(
                            tag(
                                pre.join(keys, on=pk, how="left_semi"),
                                "delete",
                                s.snapshot_id,
                            )
                        )
            else:  # delete_where / update_where / append-like ops
                new_pos = [
                    e
                    for e in live
                    if e.content == "position-deletes"
                    and (e.sequence or 0) == s.sequence
                ]
                if new_pos:
                    ref = set()
                    for d in new_pos:
                        ref.update(d.referenced or [e.path for e in parent_data])
                    refd = [e for e in parent_data if e.path in ref]
                    if refd:
                        from airbyte_spark.operators.fileid import (
                            input_file_tail,
                        )

                        by_schema: dict[int, list[DataFileEntry]] = {}
                        for e in refd:
                            by_schema.setdefault(e.schema_id, []).append(e)
                        raws = []
                        for sid_, group in sorted(by_schema.items()):
                            physical = self.registered_schema(sid_)
                            raw = (
                                self.spark.read.schema(physical)
                                .parquet(*(e.path for e in group))
                                .withColumn(
                                    "_pos_file", input_file_tail(POS_KEY_DEPTH)
                                )
                                .withColumn(
                                    "_pos_idx", F.col("_metadata.row_index")
                                )
                            )
                            raws.append(
                                _align_keep(
                                    raw, schema, ["_pos_file", "_pos_idx"]
                                )
                            )
                        pre = raws[0]
                        for r in raws[1:]:
                            pre = pre.unionByName(r)
                        # rows an OLDER delete already hid were not live at
                        # the parent — they must not appear as deletes.
                        # _mor_seq (input_file_name-derived) MUST attach
                        # before the first join (CLAUDE.md note 21).
                        eq_older = [
                            d
                            for d in parent_dels
                            if d.content == "equality-deletes"
                        ]
                        pos_older = [
                            d
                            for d in parent_dels
                            if d.content == "position-deletes"
                        ]
                        if eq_older:
                            from airbyte_spark.operators.fileid import (
                                tail_map,
                            )

                            pre = pre.withColumn(
                                "_mor_seq",
                                tail_map(
                                    {e.path: e.sequence or 0 for e in refd}
                                ),
                            )
                        if pos_older:
                            pre = apply_position_deletes(self, pre, pos_older)
                        if eq_older:
                            pre = apply_equality_deletes(self, pre, eq_older)
                        pairs = (
                            self.spark.read.schema("file_path string, pos long")
                            .parquet(*(d.path for d in new_pos))
                            .select(
                                F.col("file_path").alias("_pos_file"),
                                F.col("pos").alias("_pos_idx"),
                            )
                        )
                        pre = pre.join(
                            F.broadcast(pairs),
                            on=["_pos_file", "_pos_idx"],
                            how="left_semi",
                        ).drop("_pos_file", "_pos_idx")
                        parts.append(tag(pre, "delete", s.snapshot_id))
                # whole files dropped metadata-only by the DELETE
                live_paths = {e.path for e in live}
                removed = [
                    e for e in parent_data if e.path not in live_paths
                ]
                if removed:
                    parts.append(
                        tag(
                            self.read_entries(
                                removed, schema, deletes=parent_dels
                            ),
                            "delete",
                            s.snapshot_id,
                        )
                    )
        if not parts:
            return self.spark.createDataFrame([], out_schema)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # ------------------------------------------------------------------
    # metadata tables (Iceberg `db.table.snapshots` / `.files` analogs)
    # ------------------------------------------------------------------

    def entries_df(
        self,
        branch: str = MAIN,
        snapshot_id: str | None = None,
        stats_col: str | None = None,
    ) -> DataFrame:
        """Manifest entries at a snapshot, parsed ON EXECUTORS (Iceberg
        DistributedDataScan analog). The driver ships only the manifest
        PATH list (bounded by commit-time manifest merging); each worker
        opens and parses its manifests and emits one row per entry, so
        planning never materializes an O(table) python list on the driver.
        `stats_col` additionally projects that column's per-file min/max
        (stringified — `try_cast` to the column type for range compares;
        NULL means "no stats", i.e. unprunable). `entry_json` carries the
        complete manifest entry so a planner can reconstruct
        DataFileEntry objects for just the rows it keeps."""
        import pandas as pd
        from pyspark.sql.types import LongType, StringType, StructField

        snap = self.snapshot(snapshot_id, branch)
        paths = [os.path.join(self.meta_dir, m) for m in snap.manifests]
        schema = StructType(
            [
                StructField("path", StringType()),
                StructField("content", StringType()),
                StructField("rows", LongType()),
                StructField("bytes", LongType()),
                StructField("sequence", LongType()),
                StructField("generation_id", LongType()),
                StructField("schema_id", LongType()),
                StructField("sort_order_id", LongType()),
                StructField("partition_key", StringType()),
                StructField("stat_min", StringType()),
                StructField("stat_max", StringType()),
                StructField("entry_json", StringType()),
            ]
        )
        if not paths:
            return self.spark.createDataFrame([], schema)
        col = stats_col

        def parse(batches):
            import json as _json

            for pdf in batches:
                out = []
                for mp in pdf["manifest"]:
                    with open(mp) as f:
                        for d in _json.load(f)["entries"]:
                            st = (d.get("stats") or {}).get(col) or {}
                            mn, mx = st.get("min"), st.get("max")
                            out.append(
                                (
                                    d["path"],
                                    d.get("content", "data"),
                                    d.get("rows", 0),
                                    d.get("bytes", 0),
                                    d.get("sequence", 0) or 0,
                                    d.get("generation_id", 0),
                                    d.get("schema_id", 0),
                                    d.get("sort_order_id", 0),
                                    canonical_partition_key(
                                        d.get("partition", {})
                                    ),
                                    None if mn is None else str(mn),
                                    None if mx is None else str(mx),
                                    _json.dumps(d),
                                )
                            )
                yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

        pdf = self.spark.createDataFrame(
            [(p,) for p in paths], "manifest string"
        ).repartition(min(len(paths), 64))
        return pdf.mapInPandas(parse, schema)

    def snapshots_df(self) -> DataFrame:
        """All snapshots as a DataFrame (inspection/SQL surface)."""
        import json as _json

        rows = []
        for p in sorted(glob.glob(os.path.join(self.meta_dir, "snap-*.json"))):
            s = Snapshot.from_json(read_json(p))
            rows.append(
                (
                    s.snapshot_id,
                    s.parent_id,
                    s.sequence,
                    s.timestamp_ms,
                    s.operation,
                    _json.dumps(s.summary),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "snapshot_id string, parent_id string, sequence long, "
            "timestamp_ms long, operation string, summary string",
        )

    def files_df(self, branch: str = MAIN, snapshot_id: str | None = None) -> DataFrame:
        """Live manifest entries as a DataFrame: one row per data/delete
        file with counts, sizes, identity and partition values. Projected
        from the executor-parsed `entries_df`, so the driver never holds
        an O(table) entry list (Iceberg `$files` via DistributedDataScan)."""
        e = self.entries_df(branch=branch, snapshot_id=snapshot_id)
        return e.select(
            "path",
            "content",
            "rows",
            "bytes",
            F.coalesce("sequence", F.lit(0)).alias("sequence"),
            "generation_id",
            "schema_id",
            F.coalesce(
                F.get_json_object("entry_json", "$.partition"), F.lit("{}")
            ).alias("partition"),
        )

    def partitions_df(
        self, branch: str = MAIN, snapshot_id: str | None = None
    ) -> DataFrame:
        """Per-partition aggregates (Iceberg `$partitions` analog): file /
        row / byte counts split by content kind, plus the highest commit
        sequence that touched the partition (a freshness cursor for
        partition-scoped maintenance). Built on `entries_df`, so manifests
        parse on EXECUTORS and the driver never holds an O(table) entry
        list — the result is one row per (partition, content)."""
        e = self.entries_df(branch=branch, snapshot_id=snapshot_id)
        return (
            e.groupBy("partition_key", "content")
            .agg(
                F.count(F.lit(1)).alias("file_count"),
                F.sum("rows").alias("row_count"),
                F.sum("bytes").alias("total_bytes"),
                F.max("sequence").alias("last_sequence"),
                F.countDistinct("schema_id").alias("schema_ids"),
            )
            .withColumnRenamed("partition_key", "partition")
        )

    def manifests_df(
        self, branch: str = MAIN, snapshot_id: str | None = None
    ) -> DataFrame:
        """Live manifests at a snapshot (Iceberg `$manifests` analog):
        one row per manifest file with per-content entry counts — the
        shape commit-time manifest folding is tuned against. Parsed on
        executors; the driver ships only the (bounded) path list."""
        import pandas as pd
        from pyspark.sql.types import LongType, StringType, StructField

        snap = self.snapshot(snapshot_id, branch)
        paths = [os.path.join(self.meta_dir, m) for m in snap.manifests]
        schema = StructType(
            [
                StructField("manifest", StringType()),
                StructField("length_bytes", LongType()),
                StructField("entries", LongType()),
                StructField("data_entries", LongType()),
                StructField("eq_delete_entries", LongType()),
                StructField("pos_delete_entries", LongType()),
                StructField("rows", LongType()),
                StructField("bytes", LongType()),
            ]
        )
        if not paths:
            return self.spark.createDataFrame([], schema)

        def parse(batches):
            import json as _json

            for pdf in batches:
                out = []
                for mp in pdf["manifest"]:
                    with open(mp) as f:
                        ents = _json.load(f)["entries"]
                    by = {"data": 0, "equality-deletes": 0, "position-deletes": 0}
                    for d in ents:
                        by[d.get("content", "data")] = (
                            by.get(d.get("content", "data"), 0) + 1
                        )
                    out.append(
                        (
                            os.path.basename(mp),
                            os.path.getsize(mp),
                            len(ents),
                            by["data"],
                            by["equality-deletes"],
                            by["position-deletes"],
                            sum(d.get("rows", 0) or 0 for d in ents),
                            sum(d.get("bytes", 0) or 0 for d in ents),
                        )
                    )
                yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

        pdf = self.spark.createDataFrame(
            [(p,) for p in paths], "manifest string"
        ).repartition(min(len(paths), 64))
        return pdf.mapInPandas(parse, schema)

    def refs_df(self) -> DataFrame:
        """Branches and tags as a DataFrame (Iceberg `$refs` analog)."""
        refs = self._refs()
        rows = [
            (name, "branch", sid) for name, sid in refs["branches"].items()
        ] + [
            (name, "tag", sid)
            for name, sid in refs.get("tags", {}).items()
        ]
        return self.spark.createDataFrame(
            rows, "name string, type string, snapshot_id string"
        )

    # ------------------------------------------------------------------
    # maintenance: expiry + orphan GC (IcebergTableCleaner semantics)
    # ------------------------------------------------------------------

    def expire_snapshots(
        self,
        keep_last: int = 1,
        older_than_ms: int | None = None,
        max_ref_age_ms: int | None = None,
    ) -> list[str]:
        """Delete snapshot+manifest metadata unreachable within the retention
        window. Keeps, per branch: the head and its `keep_last-1` nearest
        ancestors (and anything newer than older_than_ms). With
        `max_ref_age_ms` (Iceberg's MAX_REF_AGE_MS), tags and non-main
        branches whose pinned snapshot committed longer ago than that are
        DROPPED first, releasing their retention pins — `main` never ages
        out. Holds the refs lock for the whole sweep: a commit landing
        between the keep-set computation and the unlinks would otherwise
        have its brand-new snapshot+manifests deleted, leaving the branch
        head dangling."""
        with _refs_lock(self.root):
            return self._expire_snapshots_locked(
                keep_last, older_than_ms, max_ref_age_ms
            )

    def expire_snapshots_by_policy(
        self, keep_last: int | None = None
    ) -> list[str]:
        """expire_snapshots driven by the table's retention properties
        (Iceberg's HISTORY_EXPIRE-style table properties,
        TableProperties.java MIN_SNAPSHOTS_TO_KEEP / MAX_SNAPSHOT_AGE_MS /
        MAX_REF_AGE_MS): ``history.expire.min-snapshots-to-keep`` supplies
        keep_last when the caller passes None, ``max-snapshot-age-ms`` > 0
        turns into an older_than cutoff relative to now, and
        ``max-ref-age-ms`` > 0 ages out tags/non-main branches. The
        maintenance pipeline's expire stage goes through here so retention
        is governed per-table instead of per-job-invocation."""
        props = self.properties
        if keep_last is None:
            keep_last = int(
                props.get("history.expire.min-snapshots-to-keep", 2)
            )
        age = int(props.get("history.expire.max-snapshot-age-ms", 0))
        older_than_ms = (now_ms() - age) if age > 0 else None
        ref_age = int(props.get("history.expire.max-ref-age-ms", 0))
        return self.expire_snapshots(
            keep_last=keep_last,
            older_than_ms=older_than_ms,
            max_ref_age_ms=ref_age if ref_age > 0 else None,
        )

    def _expire_snapshots_locked(
        self,
        keep_last: int,
        older_than_ms: int | None,
        max_ref_age_ms: int | None = None,
    ) -> list[str]:
        refs = self._refs()
        if max_ref_age_ms is not None:
            cutoff = now_ms() - max_ref_age_ms
            stale = False
            for kind in ("tags", "branches"):
                for name, sid in list(refs.get(kind, {}).items()):
                    if kind == "branches" and name == MAIN:
                        continue
                    if self.snapshot(sid).timestamp_ms < cutoff:
                        del refs[kind][name]
                        stale = True
            if stale:
                atomic_write_json(
                    os.path.join(self.meta_dir, "refs.json"), refs
                )
        keep: set[str] = set()
        # tagged snapshots are pinned until the tag is dropped (Iceberg
        # tag retention): keep the snapshot itself — not its ancestry —
        # so a tag costs exactly one snapshot of metadata
        keep.update(refs.get("tags", {}).values())
        for head in refs["branches"].values():
            sid, n = head, 0
            while sid is not None:
                s = self.snapshot(sid)
                recent = older_than_ms is not None and s.timestamp_ms >= older_than_ms
                if n < keep_last or recent:
                    keep.add(sid)
                    sid, n = s.parent_id, n + 1
                else:
                    break
        expired = []
        for p in glob.glob(os.path.join(self.meta_dir, "snap-*.json")):
            sid = os.path.basename(p)[len("snap-") : -len(".json")]
            if sid not in keep:
                os.unlink(p)
                expired.append(sid)
        # rewrite parent pointers that now dangle
        for sid in keep:
            s = self.snapshot(sid)
            if s.parent_id is not None and s.parent_id not in keep:
                s.parent_id = None
                self._write_snapshot(s)
        # drop manifests no longer referenced by any kept snapshot
        live_manifests: set[str] = set()
        for sid in keep:
            live_manifests.update(self.snapshot(sid).manifests)
        for p in glob.glob(os.path.join(self.meta_dir, "manifest-*.json")):
            if os.path.basename(p) not in live_manifests:
                os.unlink(p)
                _evict_manifest(p)
        return expired

    def reachable_files(self) -> set[str]:
        """Every data file referenced by any live snapshot of any branch."""
        out: set[str] = set()
        for p in glob.glob(os.path.join(self.meta_dir, "snap-*.json")):
            snap = Snapshot.from_json(read_json(p))
            for m in snap.manifests:
                mp = os.path.join(self.meta_dir, m)
                if os.path.exists(mp):
                    out.update(e["path"] for e in _read_manifest_raw(mp))
        return out

    #: above this many physical files, orphan listing runs as a Spark job
    #: instead of a driver glob (mirrors the >16-file distributed
    #: footer-stat reads in lake/stats.py)
    DISTRIBUTED_LISTING_THRESHOLD = 4096

    def _data_file_count_exceeds(self, limit: int) -> bool:
        """Early-exit physical file count: stop walking the moment the
        limit is crossed — the 10^6-file table never pays a full driver
        walk just to LEARN it should not have walked."""
        n = 0
        for _root, _dirs, files in os.walk(self.data_dir):
            n += sum(1 for f in files if f.endswith(".parquet"))
            if n > limit:
                return True
        return False

    def _list_data_files_driver(self) -> list[tuple[str, float | None]]:
        """(path, mtime_sec) via driver glob — fine up to a few thousand
        files. Recursive: merge/compact/cluster outputs are written NESTED
        under `_pid=N/` and `_p_<col>=<v>/` partitionBy levels — a
        one-level glob would leak every CoW-replaced file forever."""
        return [
            (p, None)  # mtime fetched lazily only when a grace period is set
            for p in glob.glob(
                os.path.join(self.data_dir, "**", "*.parquet"), recursive=True
            )
        ]

    def _orphans_distributed(self, cutoff: float | None) -> list[str]:
        """Orphan paths via a Spark anti-join — the 10^5–10^6-file path
        real Iceberg's remove_orphan_files takes (its listing is itself a
        Spark action). The PHYSICAL side is a `binaryFile` scan selecting
        only (path, modificationTime) — content pruned, directory
        discovery parallelized. The REACHABLE side parses every live
        snapshot's manifests on executors (manifest reuse dedups the set
        heavily across snapshots). Both sides realpath-normalize
        worker-side, and only the orphans return to the driver — neither
        side is ever an O(table) driver list.

        NOTE: unlike `input_file_name()` (percent-RE-encoded, CLAUDE.md
        gotcha #13), binaryFile's `path` column is the raw filesystem path
        with only a `file:` scheme prefix — spaces, '%', unicode all
        literal. Stripping the prefix is the whole decode; running
        unquote() here would corrupt names containing literal '%'."""
        import datetime as _dt

        import pandas as pd

        manifest_paths = sorted(
            {
                os.path.join(self.meta_dir, m)
                for sp in glob.glob(os.path.join(self.meta_dir, "snap-*.json"))
                for m in Snapshot.from_json(read_json(sp)).manifests
                if os.path.exists(os.path.join(self.meta_dir, m))
            }
        )

        def parse_manifests(batches):
            import json as _json

            for pdf in batches:
                paths: list[str] = []
                for mp in pdf["manifest"]:
                    with open(mp) as f:
                        paths.extend(
                            os.path.realpath(d["path"])
                            for d in _json.load(f)["entries"]
                        )
                yield pd.DataFrame({"path": paths})

        if manifest_paths:
            reachable = (
                self.spark.createDataFrame(
                    [(p,) for p in manifest_paths], "manifest string"
                )
                .repartition(min(len(manifest_paths), 64))
                .mapInPandas(parse_manifests, "path string")
                .distinct()
            )
        else:
            reachable = self.spark.createDataFrame([], "path string")

        listing = (
            self.spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .load(self.data_dir)
            .select("path", "modificationTime")
        )
        if cutoff is not None:
            # epoch-based cutoff: timestamp_seconds is timezone-independent,
            # unlike a naive datetime literal (which would be read in the
            # session timezone — correct only while the tz pin is UTC)
            listing = listing.where(
                F.col("modificationTime") < F.timestamp_seconds(F.lit(cutoff))
            )

        def norm(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "path": [
                            os.path.realpath(p.removeprefix("file:"))
                            for p in pdf["path"]
                        ]
                    }
                )

        phys = listing.select("path").mapInPandas(norm, "path string")
        return sorted(
            r["path"]
            for r in phys.join(reachable, on="path", how="left_anti").collect()
        )

    def remove_orphan_files(
        self, dry_run: bool = False, grace_period_ms: int = 0
    ) -> list[str]:
        """Delete physical files under data/ not reachable from any live
        snapshot (run AFTER expire_snapshots). Prefix-scoped like Airbyte's
        `deletePrefix` GC (IcebergTableCleaner.kt:33-43).

        Strategy: a driver walk + set-membership below
        DISTRIBUTED_LISTING_THRESHOLD physical files; above it, a Spark
        anti-join of the physical listing against the reachable set with
        BOTH sides computed on executors (_orphans_distributed) — a
        100 TB table with 10^6+ files must not serialize its LIST calls
        OR its reachable-path set through the driver.

        Paths are compared through os.path.realpath so loading the table
        under a different root spelling (relative vs absolute, symlink)
        cannot misclassify every live file as an orphan.

        `grace_period_ms` skips files younger than now-grace (Iceberg's
        remove_orphan_files `older_than`, default 3 days there): a writer
        mid-commit has data files on disk that no manifest references YET —
        concurrent GC must not reap them. 0 (default) is for tests and
        exclusive maintenance windows; set a real grace when syncs and GC
        overlap."""
        cutoff = (now_ms() - grace_period_ms) / 1000.0
        if self._data_file_count_exceeds(self.DISTRIBUTED_LISTING_THRESHOLD):
            orphans = self._orphans_distributed(
                cutoff if grace_period_ms else None
            )
        else:
            reachable = {os.path.realpath(p) for p in self.reachable_files()}
            orphans = [
                p
                for p, mtime in self._list_data_files_driver()
                if os.path.realpath(p) not in reachable
                and (
                    grace_period_ms == 0
                    or (mtime if mtime is not None else os.path.getmtime(p))
                    < cutoff
                )
            ]
        if not dry_run:
            def _reap(p: str) -> None:
                os.unlink(p)
                crc = os.path.join(
                    os.path.dirname(p), f".{os.path.basename(p)}.crc"
                )
                if os.path.exists(crc):  # pre-marker-cleanup writes
                    os.unlink(crc)
                # PK-filter sidecars (lake/bloom.py) share their data
                # file's lifetime: invisible to the *.parquet listing, so
                # they are removed here, with the file they describe
                for suf in (".bloom", ".keyhashes"):
                    if os.path.exists(p + suf):
                        os.unlink(p + suf)

            # unlink releases the GIL and ext4 extent-freeing of multi-GB
            # rewritten files runs ~10-30 ms per file — a serial sweep of
            # a few hundred orphans is seconds of the GC stage; threads
            # overlap the syscalls
            if len(orphans) > 16:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=8) as _pool:
                    list(_pool.map(_reap, orphans))
            else:
                for p in orphans:
                    _reap(p)
            # bottom-up sweep (deepest first so emptied parents are caught
            # in the same pass); dirs holding only _SUCCESS/.crc markers
            # count as empty — the manifest, not the marker, is the commit
            # authority
            for d, _dirs, files in sorted(
                os.walk(self.data_dir), key=lambda t: -t[0].count(os.sep)
            ):
                if d == self.data_dir:
                    continue
                entries_left = os.listdir(d)
                if all(_is_marker(f) for f in entries_left):
                    for f in entries_left:
                        os.unlink(os.path.join(d, f))
                    os.rmdir(d)
        return orphans


def partition_str(v) -> str | None:
    """Canonical string form of a partition value — matches Spark's
    cast-to-string used at write time (booleans render 'true'/'false',
    never Python's 'True'/'False')."""
    if v is None:
        return None
    if v is True:
        return "true"
    if v is False:
        return "false"
    return str(v)


def canonical_partition_key(partition: dict) -> str:
    """Deterministic string form of an identity-partition dict — the
    same on driver and executors, so distributed planners can compare
    partition tuples without relying on dict or JSON key order."""
    if not partition:
        return ""
    return "/".join(f"{k}={partition[k]}" for k in sorted(partition))


def partition_matches(entry: DataFileEntry, partition_filter: dict) -> bool:
    """Entry-vs-filter comparison that survives NULL partition values
    (written as __HIVE_DEFAULT_PARTITION__, parsed back to None) and
    python-vs-Spark boolean rendering."""
    for c, v in partition_filter.items():
        if entry.partition.get(c) != partition_str(v):
            return False
    return True


def _is_marker(name: str) -> bool:
    return name == "_SUCCESS" or (name.startswith(".") and name.endswith(".crc"))


def _drop_markers(commit_dir: str) -> None:
    """Delete Spark's _SUCCESS/.crc markers right after a write: the
    manifest is the commit authority here, and markers left behind (a)
    strand otherwise-empty commit dirs past the GC empty-dir sweep and (b)
    leak one hidden .crc per data file the GC later deletes."""
    for d, _dirs, files in os.walk(commit_dir):
        for f in files:
            if _is_marker(f):
                os.unlink(os.path.join(d, f))


#: path-tail depth used as the file identity in position-delete rows: 6
#: trailing segments always include the commit-uuid data dir
#: (`<table>/data/<uuid>-g<gen>/[partition dirs]/part-*.parquet`), which is
#: unique table-wide, so a fixed depth never aliases two files and both the
#: writer (file_tail) and the reader (input_file_tail) agree by construction.
POS_KEY_DEPTH = 6


def apply_position_deletes(
    table: "LakeTable",
    df: DataFrame,
    pos_deletes: list[DataFileEntry],
) -> DataFrame:
    """Remove rows named by position-delete files (Iceberg v2 semantics:
    a (file, pos) pair removes the pos-th row of that data file; path
    identity subsumes the sequence rule because rewrites mint new paths).
    `df` must carry `_pos_file` (depth-POS_KEY_DEPTH path tail) and
    `_pos_idx` (`_metadata.row_index`). One anti-join; the delete side is
    two slim columns and broadcast below 10M rows (a delete_where pass
    names O(matched rows), micro-batch-scale by construction)."""
    keys = (
        table.spark.read.schema("file_path string, pos long")
        .parquet(*(d.path for d in pos_deletes))
        .select(
            F.col("file_path").alias("_pos_file"), F.col("pos").alias("_pos_idx")
        )
    )
    if sum(d.rows for d in pos_deletes) <= 10_000_000:
        keys = F.broadcast(keys)
    return df.join(keys, on=["_pos_file", "_pos_idx"], how="left_anti")


def apply_equality_deletes(
    table: "LakeTable",
    df: DataFrame,
    deletes: list[DataFileEntry],
) -> DataFrame:
    """Remove rows matched by equality-delete keys. `df` must carry a
    `_mor_seq` column (each row's data-file commit sequence); a delete key
    removes rows whose sequence is strictly smaller than the delete file's.
    One left join against the max delete sequence per key — broadcast for
    micro-batch-sized delete sets. Delete files are read in one multi-path
    scan PER WRITE-TIME SCHEMA (key columns typed per era, cast to the
    current pk types — an id int->long evolution must not misread older
    delete files), with per-file sequences from the tail map (no per-batch
    union nodes as delete files accumulate)."""
    newest = equality_delete_keys(table, deletes)
    if sum(d.rows for d in deletes) <= 2_000_000:
        newest = F.broadcast(newest)
    return (
        df.join(newest, on=table.primary_key, how="left")
        .filter(F.col("_del_seq").isNull() | (F.col("_mor_seq") >= F.col("_del_seq")))
        .drop("_mor_seq", "_del_seq")
    )


def equality_delete_keys(
    table: "LakeTable", deletes: list[DataFileEntry]
) -> DataFrame:
    """(pk..., _del_seq=max delete sequence per key) over a set of
    equality-delete files — the slim key side of every delete anti-join.
    Delete files are read in one multi-path scan PER WRITE-TIME SCHEMA and
    cast to the current pk types (see apply_equality_deletes)."""
    from airbyte_spark.operators.fileid import tail_map

    spark = table.spark
    pk = table.primary_key
    current = {f.name: f.dataType for f in table.schema().fields}
    by_schema: dict[int, list[DataFileEntry]] = {}
    for d in deletes:
        by_schema.setdefault(d.schema_id, []).append(d)
    key_parts: list[DataFrame] = []
    for sid, group in sorted(by_schema.items()):
        era = table.registered_schema(sid)
        era_pk = StructType([f for f in era.fields if f.name in pk])
        part = (
            spark.read.schema(era_pk)
            .parquet(*(d.path for d in group))
            .withColumn(
                "_del_seq", tail_map({d.path: d.sequence or 0 for d in group})
            )
            .select(
                *[F.col(c).cast(current[c]).alias(c) for c in pk], "_del_seq"
            )
        )
        key_parts.append(part)
    keys = key_parts[0]
    for p in key_parts[1:]:
        keys = keys.unionByName(p)
    return keys.groupBy(*pk).agg(F.max("_del_seq").alias("_del_seq"))


def _partition_values(path: str, part_cols: list[str]) -> dict:
    """Parse `_p_<col>=<value>` directory levels out of a data-file path.

    Spark percent-escapes partition-dir values (ExternalCatalogUtils
    .escapePathName: ':', ' ', '/', '%', ...), so the raw segment must be
    unescaped or `scan(partition_filter={col: value})` comparisons against
    `str(value)` would silently never match for e.g. timestamp values."""
    from urllib.parse import unquote

    out: dict = {}
    for seg in path.split(os.sep):
        if "=" in seg and seg.startswith("_p_"):
            k, _, v = seg.partition("=")
            col = k[len("_p_") :]
            if col in part_cols:
                out[col] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    return out


def coerce_stat_value(v, dt):
    """Manifest stat (JSON-typed: numbers survive, temporals/decimals come
    back as strings via atomic_write_json's default=str) -> python value of
    the column's Spark type. Raises on anything unconvertible — callers
    treat that as unprunable rather than risking a mistyped comparison."""
    import datetime
    import decimal

    from pyspark.sql.types import (
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    if v is None:
        raise ValueError("null stat")
    if isinstance(dt, StringType):
        return str(v)
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return int(v)
    if isinstance(dt, (FloatType, DoubleType)):
        return float(v)
    if isinstance(dt, DecimalType):
        return decimal.Decimal(str(v))
    if isinstance(dt, DateType):
        return v if isinstance(v, datetime.date) else datetime.date.fromisoformat(str(v))
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        ts = (
            v
            if isinstance(v, datetime.datetime)
            else datetime.datetime.fromisoformat(str(v))
        )
        # parquet micros stats are tz-AWARE (UTC); Spark collects/compares
        # naive session-local (= UTC here) — normalize so aware stats and
        # naive caller bounds compare instead of raising
        if ts.tzinfo is not None:
            ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ts
    raise ValueError(f"unprunable type {dt}")


def _intersects(stat: dict | None, lo, hi, dt=None) -> bool:
    """Range-overlap predicate over manifest stats. With `dt`, stat bounds
    are coerced to the column's type first (temporal/decimal stats are
    strings after the JSON round-trip — comparing those against typed
    bounds would raise or mis-prune); coercion failure -> unprunable."""
    if not stat or stat.get("min") is None:
        return True  # no stats -> cannot prune
    mn, mx = stat["min"], stat["max"]
    if dt is not None:
        try:
            mn, mx = coerce_stat_value(mn, dt), coerce_stat_value(mx, dt)
            lo, hi = coerce_stat_value(lo, dt), coerce_stat_value(hi, dt)
        except (ValueError, TypeError, ArithmeticError):
            return True
    try:
        return not (mx < lo or mn > hi)
    except TypeError:
        return True  # incomparable -> never prune on a guess


def _align(df: DataFrame, target: StructType) -> DataFrame:
    """Project/cast a physically-typed DataFrame to the logical schema:
    missing columns become NULL, widened columns are cast, dropped columns
    are pruned — recursively through nested struct/array/map columns
    (schema-evolution read path)."""
    return _align_keep(df, target, [])


def align_expr(col: Column, src: DataType, dst: DataType) -> Column:
    """One column of physical type `src` re-expressed in logical type
    `dst`. A plain Spark cast cannot change a struct's field COUNT, so
    struct evolution (nested add/drop — the most common real-world change:
    a field appears inside a JSON object column) rebuilds the struct field
    by field: present subfields recurse, missing ones become typed NULLs,
    dropped ones are omitted; NULL structs stay NULL. Arrays/maps recurse
    through transform/transform_values only when the element/value type
    actually changed — unchanged branches stay a no-op passthrough."""
    if src == dst:
        return col
    if isinstance(src, StructType) and isinstance(dst, StructType):
        have = {f.name: f for f in src.fields}
        rebuilt = F.struct(
            *[
                align_expr(col[f.name], have[f.name].dataType, f.dataType).alias(f.name)
                if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in dst.fields
            ]
        )
        # F.struct() of nulls is a non-null struct — preserve row-level null
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(rebuilt)
    if isinstance(src, ArrayType) and isinstance(dst, ArrayType):
        if src.elementType == dst.elementType:
            return col.cast(dst)
        return F.transform(
            col, lambda x: align_expr(x, src.elementType, dst.elementType)
        )
    if isinstance(src, MapType) and isinstance(dst, MapType):
        if src.valueType == dst.valueType:
            return col.cast(dst)
        return F.transform_values(
            col, lambda _k, v: align_expr(v, src.valueType, dst.valueType)
        )
    return col.cast(dst)


def _align_keep(df: DataFrame, target: StructType, keep: list[str]) -> DataFrame:
    """_align plus pass-through of transient bookkeeping columns."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(
                align_expr(F.col(f.name), have[f.name].dataType, f.dataType).alias(
                    f.name
                )
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols, *[F.col(c) for c in keep if c in have])
