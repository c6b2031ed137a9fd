"""ConnectionSync — the multi-stream `destination --write` lifecycle.

The reference runs one DataFlowPipeline PER INPUT STREAM concurrently
(DestinationLifecycle.kt:32-106, PipelineRunner.kt:39-76): setup checks
table-name conflicts (S3DataLakeWriter.kt:32-63), each stream gets its own
StreamLoader + staging branch, pipelines flush independently, teardown
swaps every staging branch atomically. Spark realization: one
ConnectionSync owns N StreamLoaders; stream writes run on driver threads
(each write is a sequence of Spark jobs — the JVM parallelizes across
them; commits are thread-safe via the per-table refs lock) and teardown
finishes every stream, failing loudly if any stream failed (the
lifecycle's fail-the-sync contract).

State modes (airbyte-protocol.md:516, CheckpointMessage.kt:29-91):

- ``per-stream`` (default): each stream checkpoints independently — the
  STREAM state type; streams flush and resume on their own cursors.
- ``global``: ONE ordered checkpoint ledger covers every stream (the
  GLOBAL state type CDC sources emit — a single log position spans all
  tables). A global checkpoint commits only after EVERY stream's batch
  for it landed; stream DATA still flushes in parallel, but state cannot
  be split per stream. Resume replays from the global cursor: a
  committed global checkpoint is skipped wholesale; a half-finished one
  re-runs, with each stream's own ledger skipping the sub-batches that
  already committed (no dup, no loss).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from airbyte_spark.checkpoints import JobCheckpointer
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.streaming.loader import StreamLoader


@dataclass
class StreamSpec:
    name: str
    table: LakeTable
    mode: str = "dedup"  # dedup | append | truncate
    cursor_col: str | None = "updated_at"
    generation_id: int = 0
    merge_mode: str = "cow"
    #: catalog field selection (fieldselect.py) applied per batch
    selected_fields: tuple | None = None
    #: stream mapper list (functions/mappers.py) applied per batch
    mappers: tuple = ()


@dataclass
class ConnectionReport:
    streams: dict = field(default_factory=dict)  # name -> loader stats
    #: STREAM_STATUS trace events in emission order
    #: (AirbyteStreamStatusTraceMessage: STARTED -> RUNNING on first
    #: record -> COMPLETE / INCOMPLETE)
    status_events: list = field(default_factory=list)


class ConnectionSync:
    def __init__(self, sync_id: str, streams: list[StreamSpec],
                 max_concurrent: int = 4, state_mode: str = "per-stream",
                 checkpoint_dir: str | None = None):
        names = [s.name for s in streams]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stream names: {names}")
        if state_mode not in ("per-stream", "global"):
            raise ValueError(f"state_mode must be per-stream|global: {state_mode!r}")
        # table-name conflict check (S3DataLakeWriter.kt:32-63): two streams
        # writing one table root would corrupt each other's staging
        # branches — compare normalized paths so aliases don't slip through
        roots = [os.path.abspath(s.table.root) for s in streams]
        if len(set(roots)) != len(roots):
            raise ValueError(f"streams share a table root: {roots}")
        self.sync_id = sync_id
        self.specs = {s.name: s for s in streams}
        self.max_concurrent = max_concurrent
        self.state_mode = state_mode
        self.loaders: dict[str, StreamLoader] = {}
        self._failed: dict[str, Exception] = {}
        #: STREAM_STATUS trace ledger (StreamStatusUtils.kt semantics:
        #: STARTED at open, RUNNING once on first record, then
        #: COMPLETE/INCOMPLETE at teardown)
        self.status_events: list[dict] = []
        self._running: set[str] = set()
        self._global_ckpt: JobCheckpointer | None = None
        if state_mode == "global":
            # the global ledger needs ONE durable home; default to the
            # first stream's table root (callers spanning storage systems
            # pass an explicit checkpoint_dir)
            self._global_ckpt = JobCheckpointer(
                checkpoint_dir or os.path.join(streams[0].table.root, "checkpoints"),
                f"global-{sync_id}",
            )

    def _emit_status(self, name: str, status: str) -> None:
        self.status_events.append(
            {"type": "STREAM_STATUS", "stream": name, "status": status,
             "ts": time.time()}
        )

    def _emit_error(self, name: str, exc: Exception) -> None:
        """AirbyteTraceMessage-ERROR analog (protocol trace section):
        typed failure (config/system/transient) recorded in the same
        ledger as STREAM_STATUS, at the point of failure — teardown adds
        the INCOMPLETE status separately."""
        from airbyte_spark.streaming.traces import error_trace

        self.status_events.append(error_trace(name, exc))

    def start(self) -> None:
        for name, s in self.specs.items():
            loader = StreamLoader(
                s.table,
                sync_id=f"{self.sync_id}-{name}",
                mode=s.mode,
                cursor_col=s.cursor_col,
                generation_id=s.generation_id,
                merge_mode=s.merge_mode,
                selected_fields=s.selected_fields,
                mappers=s.mappers,
            )
            loader.start()
            self.loaders[name] = loader
            self._emit_status(name, "STARTED")

    def write(self, batches: dict[str, tuple[DataFrame, int]]) -> dict:
        """One round of per-stream micro-batches, streams in parallel:
        {stream: (batch_df, checkpoint_id)} -> {stream: metrics}. A stream
        that failed an earlier checkpoint stops accepting later ones — a
        committed checkpoint N+1 above an uncommitted N would make the
        kept-for-resume staging branch out of order."""
        unknown = set(batches) - set(self.loaders)
        if unknown:
            raise KeyError(f"unknown streams: {sorted(unknown)}")

        def one(item):
            name, (df, ckpt) = item
            if name in self._failed:
                return name, {"skipped": "stream already failed"}
            try:
                return name, self.loaders[name].write(df, ckpt)
            except Exception as e:  # noqa: BLE001 — recorded, re-raised at finish
                self._failed[name] = e
                self._emit_error(name, e)
                return name, {"error": str(e)}

        with ThreadPoolExecutor(max_workers=self.max_concurrent) as pool:
            res = dict(pool.map(one, batches.items()))
        for name, m in res.items():
            # RUNNING once, on the first delivered record
            # (StreamStatusUtils.kt "emit running" semantics)
            if "error" not in m and "skipped" not in m and name not in self._running:
                self._running.add(name)
                self._emit_status(name, "RUNNING")
        return res

    def write_global(
        self, batches: dict[str, DataFrame], checkpoint_id: int
    ) -> dict:
        """One GLOBAL checkpoint (state_mode="global"): every stream's
        batch for `checkpoint_id` flushes (in parallel), then the single
        connection-wide ledger entry commits. Ordering is strict across
        checkpoints (a global state message cannot be reordered or split);
        an already-committed checkpoint returns its recorded metrics
        without touching any table (idempotent resume)."""
        if self._global_ckpt is None:
            raise RuntimeError("write_global requires state_mode='global'")

        out: dict = {}

        def _do() -> dict:
            res = self.write({n: (df, checkpoint_id) for n, df in batches.items()})
            bad = sorted(n for n, m in res.items() if "error" in m or "skipped" in m)
            if bad:
                # global state is all-or-nothing: one failed stream holds
                # back the WHOLE checkpoint (no per-stream progress record)
                raise RuntimeError(
                    f"global checkpoint {checkpoint_id} incomplete — failed "
                    f"streams {bad}: { {n: res[n] for n in bad} }"
                )
            out.update(res)
            return {
                "streams": {
                    n: {"rows": int(m.get("rows", 0))} for n, m in res.items()
                }
            }

        metrics, ran = self._global_ckpt.run_step(
            checkpoint_id, f"global-{checkpoint_id}", _do
        )
        if not ran:  # replayed, skipped wholesale
            return {
                n: {"skipped": "global checkpoint already committed", **m}
                for n, m in metrics.get("streams", {}).items()
            }
        return out

    def finish(self) -> ConnectionReport:
        """Teardown: every HEALTHY stream swaps main <- staging; a failed
        stream keeps its staging branch for resume and fails the sync.

        In global state mode teardown is ALL-or-nothing: one failed stream
        keeps EVERY staging branch (no stream may publish past the last
        committed global checkpoint — the streams share one state)."""
        report = ConnectionReport(status_events=self.status_events)
        if self._failed and self.state_mode == "global":
            for name in self.loaders:
                self._emit_status(name, "INCOMPLETE")
            raise RuntimeError(
                f"sync {self.sync_id} failed for streams "
                f"{sorted(self._failed)} — global state: all staging "
                f"branches kept for resume: {self._failed}"
            )
        for name, loader in self.loaders.items():
            if name in self._failed:
                self._emit_status(name, "INCOMPLETE")
                continue
            report.streams[name] = loader.finish()
            self._emit_status(name, "COMPLETE")
        if self._failed:
            raise RuntimeError(
                f"sync {self.sync_id} failed for streams "
                f"{sorted(self._failed)}: {self._failed}"
            )
        return report
