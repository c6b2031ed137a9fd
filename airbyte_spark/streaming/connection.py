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
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

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


@dataclass
class ConnectionReport:
    streams: dict = field(default_factory=dict)  # name -> loader stats


class ConnectionSync:
    def __init__(self, sync_id: str, streams: list[StreamSpec],
                 max_concurrent: int = 4):
        names = [s.name for s in streams]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stream names: {names}")
        # table-name conflict check (S3DataLakeWriter.kt:32-63): two streams
        # writing one table root would corrupt each other's staging
        # branches — compare normalized paths so aliases don't slip through
        import os

        roots = [os.path.abspath(s.table.root) for s in streams]
        if len(set(roots)) != len(roots):
            raise ValueError(f"streams share a table root: {roots}")
        self.sync_id = sync_id
        self.specs = {s.name: s for s in streams}
        self.max_concurrent = max_concurrent
        self.loaders: dict[str, StreamLoader] = {}
        self._failed: dict[str, Exception] = {}

    def start(self) -> None:
        for name, s in self.specs.items():
            loader = StreamLoader(
                s.table,
                sync_id=f"{self.sync_id}-{name}",
                mode=s.mode,
                cursor_col=s.cursor_col,
                generation_id=s.generation_id,
                merge_mode=s.merge_mode,
            )
            loader.start()
            self.loaders[name] = loader

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
                return name, {"error": str(e)}

        with ThreadPoolExecutor(max_workers=self.max_concurrent) as pool:
            return dict(pool.map(one, batches.items()))

    def finish(self) -> ConnectionReport:
        """Teardown: every HEALTHY stream swaps main <- staging; a failed
        stream keeps its staging branch for resume and fails the sync."""
        report = ConnectionReport()
        for name, loader in self.loaders.items():
            if name in self._failed:
                continue
            report.streams[name] = loader.finish()
        if self._failed:
            raise RuntimeError(
                f"sync {self.sync_id} failed for streams "
                f"{sorted(self._failed)}: {self._failed}"
            )
        return report
