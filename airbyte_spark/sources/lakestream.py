"""Native Structured-Streaming READ of a lake table: the Spark-4 Python
DataSource API turned loose on our own metadata, so a table becomes a
first-class `spark.readStream.format(...)` source.

Semantics mirror Iceberg's Spark streaming read (public docs "Streaming
Reads" / SparkMicroBatchStream): the stream tails the branch's commit
chain and emits the DATA FILES EACH COMMIT ADDED — append and MoR-merge
commits produce rows (post-images), row-set-invariant maintenance
commits (compact / cluster / rewrites) are silently skipped, and
delete-bearing or overwrite commits FAIL the stream unless
`on_delete=skip` (Iceberg's `streaming-skip-delete-snapshots` /
`streaming-skip-overwrite-snapshots` knobs collapsed into one option).

Scale shape:

* Offsets are `{sequence, snapshot_id}` — pure metadata; exactly-once
  replay is Spark's checkpointed offset log + deterministic
  `partitions(start, end)` (the snapshot chain is immutable).
* Planning opens ONLY the manifests a commit ADDED (`set(snap.manifests)
  - set(parent.manifests)` — manifest reuse makes this O(batch), never
  O(table)).
* One InputPartition per added data file; `read()` runs ON EXECUTORS
  with plain pyarrow — the driver never touches row data. Partition
  values (hive-dir columns) and commit lineage ride the partition task
  as constants; files written under an older schema are null-padded /
  cast to the stream schema executor-side (same alignment rule as
  `read_entries`).

Retention contract: the stream must not lag behind snapshot expiry
(`expire_snapshots` keeping fewer snapshots than the stream's backlog
breaks the chain walk) — same rule as Iceberg.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

ROWSET_INVARIANT_OPS = frozenset(
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

COMMIT_SEQ_COL = "_commit_sequence"
COMMIT_SID_COL = "_commit_snapshot_id"


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


@dataclass
class _FileSlice(InputPartition):
    path: str
    partition: str  # json dict of partition-col -> value
    sequence: int
    snapshot_id: str
    schema_json: str  # stream TABLE schema (without commit columns)


class LakeStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, branch: str, on_delete: str,
                 from_sequence: int, schema_json: str,
                 max_commits_per_trigger: int | None = None):
        self.meta_dir = os.path.join(root, "metadata")
        self.branch = branch
        self.on_delete = on_delete
        self.from_sequence = from_sequence
        self.schema_json = schema_json
        self.max_commits = max_commits_per_trigger
        # last offset Spark planned up to (advanced via commit()):
        # latestOffset caps its answer relative to this for backpressure
        self._last_end: dict | None = None

    # -- metadata helpers (plain JSON; no SparkSession on purpose) -----

    def _snap(self, sid: str) -> dict:
        p = os.path.join(self.meta_dir, f"snap-{sid}.json")
        if not os.path.exists(p):
            raise ValueError(
                f"snapshot {sid} expired while the stream still needed it "
                "— keep snapshot retention longer than the stream's backlog"
            )
        return _read_json(p)

    def _head(self) -> dict:
        refs = _read_json(os.path.join(self.meta_dir, "refs.json"))
        sid = refs["branches"][self.branch]
        return self._snap(sid)

    # -- DataSourceStreamReader contract -------------------------------

    def initialOffset(self) -> dict:
        return {"sequence": self.from_sequence, "snapshot_id": ""}

    def latestOffset(self) -> dict:
        head = self._head()
        offset = {
            "sequence": int(head["sequence"]),
            "snapshot_id": head["snapshot_id"],
        }
        if self.max_commits is None or self._last_end is None:
            # no cap, or (re)start: before the first commit() we do not
            # know Spark's checkpointed offset — a capped answer could
            # land BEHIND it and make the offset log step backward
            # (replaying rows into the next window). First batch after a
            # restart is therefore uncapped; every later one is bounded.
            return offset
        # backpressure (Iceberg streaming-max-files-per-micro-batch
        # analog, at commit granularity): cap each micro-batch at
        # `max_commits` commits past the last planned offset, so a
        # stream catching up on a long backlog emits bounded batches
        # instead of one giant one — take the OLDEST max_commits of the
        # backlog above the floor.
        floor = self._last_end["sequence"]
        backlog = []
        s = head
        while int(s["sequence"]) > floor:
            backlog.append(s)
            if s["parent_id"] is None:
                break
            s = self._snap(s["parent_id"])
        if len(backlog) <= self.max_commits:
            return offset
        pick = backlog[-self.max_commits]  # oldest `max_commits` commits
        return {
            "sequence": int(pick["sequence"]),
            "snapshot_id": pick["snapshot_id"],
        }

    def partitions(self, start: dict, end: dict):
        if start["sequence"] >= end["sequence"]:
            return []
        # walk (start, end] newest -> oldest along parent pointers
        chain = []
        s = self._snap(end["snapshot_id"])
        while int(s["sequence"]) > start["sequence"]:
            chain.append(s)
            if s["parent_id"] is None:
                break
            s = self._snap(s["parent_id"])
        chain.reverse()

        out: list[_FileSlice] = []
        for s in chain:
            op = s["operation"]
            if op in ROWSET_INVARIANT_OPS:
                continue
            if op not in (
                "append",
                "merge",
                "delete",
                "truncate",
                "update",
                "cherry-pick",
                "add-files",
                "snapshot-table",
            ):
                raise ValueError(
                    f"lake_stream cannot interpret commit op {op!r} "
                    f"(snapshot {s['snapshot_id']}) — refusing rather "
                    "than guessing its row-set effect"
                )
            deletish = op in ("delete", "truncate", "update") or (
                op == "merge" and s.get("summary", {}).get("mode") == "cow"
            )
            parent_manifests = (
                set(self._snap(s["parent_id"])["manifests"])
                if s["parent_id"]
                else set()
            )
            added = [m for m in s["manifests"] if m not in parent_manifests]
            slices_before = len(out)
            for m in added:
                for e in _read_json(os.path.join(self.meta_dir, m))["entries"]:
                    if (e.get("sequence") or 0) != int(s["sequence"]):
                        continue  # carried-forward survivor of a rewrite
                    if e.get("content", "data") != "data":
                        deletish = True
                        continue
                    out.append(
                        _FileSlice(
                            path=e["path"],
                            partition=json.dumps(e.get("partition") or {}),
                            sequence=int(s["sequence"]),
                            snapshot_id=s["snapshot_id"],
                            schema_json=self.schema_json,
                        )
                    )
            if op == "snapshot-table" and deletish:
                # the clone's tombstones reference the files THIS commit
                # adds — a raw per-file read would resurrect dead rows,
                # so even on_delete=skip cannot emit exact post-images
                del out[slices_before:]
                raise ValueError(
                    f"snapshot {s['snapshot_id']} cloned position "
                    "tombstones alongside the files they hit; raw file "
                    "reads cannot honor them — fold tombstones before "
                    "snapshot_table, or start the stream past it "
                    "(from_sequence)"
                )
            if deletish and self.on_delete != "skip":
                raise ValueError(
                    f"snapshot {s['snapshot_id']} (op={op}) removes or "
                    "tombstones rows; an append-only stream cannot emit "
                    "that — pass on_delete=skip to stream post-images "
                    "only, or consume scan_changelog instead"
                )
        return out

    def read(self, partition: _FileSlice):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = StructType.fromJson(json.loads(partition.schema_json))
        arrow_target = to_arrow_schema(target)
        tbl = pq.read_table(partition.path)
        part_vals = json.loads(partition.partition)
        n = tbl.num_rows
        cols = []
        for field in arrow_target:
            if field.name in tbl.column_names:
                col = tbl.column(field.name)
                if col.type != field.type:
                    col = col.cast(field.type)
            elif field.name in part_vals:
                col = pa.array([part_vals[field.name]] * n).cast(field.type)
            else:  # added after this file was written: null-pad
                col = pa.nulls(n, type=field.type)
            cols.append(col)
        cols.append(pa.array([partition.sequence] * n, type=pa.int64()))
        cols.append(pa.array([partition.snapshot_id] * n, type=pa.string()))
        names = [f.name for f in arrow_target] + [COMMIT_SEQ_COL, COMMIT_SID_COL]
        yield from pa.Table.from_arrays(cols, names=names).to_batches()

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; remember the planned end so
        # the backpressure cap advances from it
        self._last_end = end


@dataclass
class _FileCommit(WriterCommitMessage):
    entry: dict  # DataFileEntry as a plain dict


class LakeStreamWriter(DataSourceStreamArrowWriter):
    """Streaming SINK half: each task streams its Arrow batches into one
    parquet file under the table's data dir and reports a manifest entry
    (footer-derived min/max stats included); the driver-side `commit`
    turns the collected entries into ONE atomic snapshot per micro-batch.

    Exactly-once: the commit summary records `(stream_id, batch_id)`;
    after a restart Spark replays the last unacknowledged micro-batch,
    `commit` sees `batch_id <=` the recorded high-water mark for this
    stream_id and drops the replayed files instead of double-appending —
    the same idempotent-effects-over-at-least-once-execution rule as the
    checkpoint ledger (T5). Empty partitions write NO file (empty part
    files poison manifest pruning). Sink files carry footer min/max
    stats but no PK bloom sidecars (the Spark-xxhash64 contract needs a
    JVM; every bloom probe treats a sidecar-less file as
    conservative-keep, so pruning degrades gracefully). The next
    maintenance cycle's `attach-blooms` stage
    (LakeTable.backfill_pk_blooms) stamps them in one column-pruned
    Spark pass + a metadata-only commit, restoring tight pruning without
    rewriting any data file."""

    def __init__(self, root: str, branch: str, stream_id: str,
                 stats_columns: list[str], schema_id: int):
        self.root = root
        self.branch = branch
        self.stream_id = stream_id
        self.stats_columns = stats_columns
        self.schema_id = schema_id
        # memoized high-water mark: the chain walk runs once per QUERY
        # (driver-side writer instance lives across micro-batches), not
        # once per batch — a fresh stream over a long-history table
        # would otherwise re-walk O(history) snapshots every commit
        self._hwm: int | None = None
        self._hwm_known = False

    def _target_arrow_schema(self):
        """The REGISTERED schema (by this writer's schema_id) as an Arrow
        schema. Incoming batches are cast to it before hitting parquet:
        Spark hands the sink whatever physical types the stream carries
        (a long-typed source into an int column, for example), and a file
        whose parquet types diverge from the registered schema would fail
        every later JVM read (PARQUET_COLUMN_DATA_TYPE_MISMATCH — the
        vectorized reader refuses INT64 data under an int32 read schema).
        Pure metadata: refs.json + a pyspark-types conversion, no
        SparkSession (DataSource workers have none)."""
        from pyspark.sql.pandas.types import to_arrow_schema

        from airbyte_spark.lake.table import LakeTable

        st = LakeTable(None, self.root).registered_schema(self.schema_id)
        return to_arrow_schema(st)

    def write(self, iterator):
        import uuid

        import pyarrow.parquet as pq

        from airbyte_spark.lake.stats import _footer_stats_batch

        path = os.path.join(
            self.root, "data", f"stream-{uuid.uuid4().hex}.parquet"
        )
        writer = None
        target = None
        rows = 0
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                if target is None:
                    target = self._target_arrow_schema()
                if batch.schema != target:
                    batch = batch.select(target.names).cast(target)
                if writer is None:
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    writer = pq.ParquetWriter(path, batch.schema)
                writer.write_batch(batch)
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        if rows == 0:
            return None
        raw = _footer_stats_batch([path], self.stats_columns)[0]
        return _FileCommit(
            entry={
                "path": path,
                "rows": raw["rows"],
                "bytes": raw["bytes"],
                "schema_id": self.schema_id,
                "stats": raw["stats"],
            }
        )

    def _last_batch_id(self) -> int | None:
        refs = _read_json(os.path.join(self.root, "metadata", "refs.json"))
        sid = refs["branches"][self.branch]
        while sid is not None:
            p = os.path.join(self.root, "metadata", f"snap-{sid}.json")
            if not os.path.exists(p):
                return None  # expired past the marker: treat as fresh
            s = _read_json(p)
            summ = s.get("summary") or {}
            if summ.get("stream_query_id") == self.stream_id:
                return int(summ["stream_batch_id"])
            sid = s["parent_id"]
        return None

    def commit(self, messages, batchId: int) -> None:
        files = [m.entry for m in messages if m is not None]
        if not files:
            return
        if not self._hwm_known:
            self._hwm = self._last_batch_id()
            self._hwm_known = True
        last = self._hwm
        if last is not None and batchId <= last:
            for e in files:  # replayed batch: already committed
                try:
                    os.remove(e["path"])
                except OSError:
                    pass
            return
        from airbyte_spark.lake.format import DataFileEntry
        from airbyte_spark.lake.table import LakeTable

        # metadata-only commit: LakeTable's commit path never touches the
        # SparkSession (this runs inside the DataSource driver worker,
        # which has none)
        table = LakeTable(None, self.root)
        table.commit(
            "append",
            [DataFileEntry(**e) for e in files],
            branch=self.branch,
            summary={
                "stream_query_id": self.stream_id,
                "stream_batch_id": int(batchId),
            },
        )
        self._hwm = int(batchId)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.entry["path"])
                except OSError:
                    pass


class LakeStreamDataSource(DataSource):
    """`spark.readStream.format("lake_stream").option("path", root)`.

    Options: `path` (table root, required), `branch` (default main),
    `from_sequence` (exclusive low-water mark, default 0 = from the
    table's first commit), `on_delete` = fail (default) | skip,
    `max_commits_per_trigger` (backpressure: bound each micro-batch to
    that many commits of backlog; the first batch after a (re)start is
    uncapped — see latestOffset).

    Register per-session with
    `spark.dataSource.register(LakeStreamDataSource)`.
    """

    @classmethod
    def name(cls) -> str:
        return "lake_stream"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("lake_stream requires .option('path', <table root>)")
        return root

    def _table_schema(self) -> StructType:
        refs = _read_json(os.path.join(self._root(), "metadata", "refs.json"))
        tbl = refs["table"]
        sid = str(tbl.get("current_schema_id", 0))
        return StructType.fromJson(json.loads(tbl["schemas"][sid]))

    def schema(self) -> StructType:
        base = self._table_schema()
        return StructType(
            list(base.fields)
            + [
                StructField(COMMIT_SEQ_COL, LongType()),
                StructField(COMMIT_SID_COL, StringType()),
            ]
        )

    def streamWriter(self, schema: StructType, overwrite: bool) -> LakeStreamWriter:
        """`df.writeStream.format("lake_stream").option("path", root)`:
        append-mode sink, one atomic snapshot per micro-batch, exactly-once
        via the `(stream_id, batch_id)` high-water mark. Options: `path`
        (required), `branch` (default main), `stream_id` (logical writer
        identity for idempotent replay — set it when several independent
        queries append to one table; default "default").

        Guard rails: overwrite output mode and partitioned tables are
        refused (partition-dir layout + hive values need the full
        write_dataframe path — use foreachBatch with table.append there);
        the frame's columns must match the registered schema exactly so
        the committed schema_id never lies about file contents."""
        if overwrite:
            raise ValueError("lake_stream sink is append-only")
        refs = _read_json(os.path.join(self._root(), "metadata", "refs.json"))
        tbl = refs["table"]
        if tbl.get("partition_by"):
            raise ValueError(
                "lake_stream sink does not write partitioned tables — "
                "use foreachBatch with LakeTable.append instead"
            )
        base = self._table_schema()
        if [f.name for f in schema.fields] != [f.name for f in base.fields]:
            raise ValueError(
                f"stream schema {[f.name for f in schema.fields]} must match "
                f"table schema {[f.name for f in base.fields]} exactly"
            )
        return LakeStreamWriter(
            root=self._root(),
            branch=self.options.get("branch", "main"),
            stream_id=self.options.get("stream_id", "default"),
            stats_columns=tbl.get("stats_columns") or [],
            schema_id=int(tbl.get("current_schema_id", 0)),
        )

    def streamReader(self, schema: StructType) -> LakeStreamReader:
        base = StructType(
            [f for f in schema.fields
             if f.name not in (COMMIT_SEQ_COL, COMMIT_SID_COL)]
        )
        mc = self.options.get("max_commits_per_trigger")
        return LakeStreamReader(
            root=self._root(),
            branch=self.options.get("branch", "main"),
            on_delete=self.options.get("on_delete", "fail"),
            from_sequence=int(self.options.get("from_sequence", 0)),
            schema_json=base.json(),
            max_commits_per_trigger=int(mc) if mc is not None else None,
        )
