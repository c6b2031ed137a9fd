"""StreamLoader — the sync lifecycle, mirrored from the reference.

`destination --write` lifecycle (SURVEY.md §3.1, DestinationLifecycle.kt:
32-106, S3DataLakeStreamLoader.kt:53-133):

  start()   -> create staging branch off main (snapshot isolation)
  write(batch, checkpoint_id)
            -> per micro-batch: MERGE (dedup mode) or append to STAGING;
               ledger entry committed only after the snapshot lands, in
               strict checkpoint order (StateStore.kt:69-116)
  finish()  -> atomically replaceBranch(main <- staging), drop staging;
               for truncate syncs, first delete all files of older
               generations (generation filter P5, IcebergTableCleaner.kt:
               45-72)
  on failure: staging branch is kept for resume (resumability.md:14-34) —
               re-running the same checkpoint ids skips committed batches.

Airbyte triggers a flush at 100k records / 50 MB (AggregatePublishingConfig
.kt:36-38); here the caller owns batch boundaries and this class owns
ordering + idempotency + lineage metrics.

Catalog-configured record transforms run INSIDE the lifecycle, per batch,
in the reference's order: field selection first (the catalog prunes the
stream schema — CatalogClientConverters.kt:45-100), then the stream's
mapper list (mappings.md). The PK + cursor are protected from both
(de-select guards / protected-field refusal) because this loader's dedup
mode depends on them.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame

from airbyte_spark.checkpoints import JobCheckpointer, histogram_metrics
from airbyte_spark.functions.mappers import apply_mappers
from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.operators.merge import merge_into
from airbyte_spark.sources.fieldselect import select_fields


class StreamLoader:
    def __init__(
        self,
        table: LakeTable,
        sync_id: str,
        mode: str = "dedup",  # dedup | append | truncate
        cursor_col: str | None = "updated_at",
        generation_id: int = 0,
        merge_mode: str = "cow",  # cow | mor (S13 rowDelta path)
        selected_fields: Sequence[Sequence[str]] | None = None,
        mappers: Sequence = (),
    ):
        if mode not in ("dedup", "append", "truncate"):
            raise ValueError(mode)
        self.table = table
        self.mode = mode
        self.cursor_col = cursor_col
        self.generation_id = generation_id
        self.merge_mode = merge_mode
        self.selected_fields = selected_fields
        self.mappers = tuple(mappers)
        self.staging = f"staging-{sync_id}"
        self.ckpt = JobCheckpointer(
            os.path.join(table.root, "checkpoints"), sync_id
        )

    def _transform(self, batch: DataFrame) -> DataFrame:
        """Field selection + mappers, with the PK/cursor protected."""
        if self.selected_fields is not None:
            batch = select_fields(
                batch,
                self.selected_fields,
                sync_mode="incremental" if self.cursor_col else "full_refresh",
                cursor_field=[self.cursor_col] if self.cursor_col else (),
                primary_key=[[c] for c in self.table.primary_key],
                dedup=self.mode == "dedup",
            )
        if self.mappers:
            protected = list(self.table.primary_key)
            if self.cursor_col:
                protected.append(self.cursor_col)
            batch = apply_mappers(batch, self.mappers, protected_fields=protected)
        return batch

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        if self.staging not in self.table.branches():
            self.table.create_branch(self.staging, from_branch=MAIN)

    def write(self, raw_batch: DataFrame, checkpoint_id: int) -> dict:
        """Write one micro-batch to staging, exactly-once by checkpoint id."""

        def _do() -> dict:
            batch = self._transform(raw_batch)
            if self.mode == "dedup":
                res = merge_into(
                    self.table,
                    batch,
                    cursor_col=self.cursor_col,
                    branch=self.staging,
                    generation_id=self.generation_id,
                    mode=self.merge_mode,
                )
                m = {"snapshot": res.snapshot.snapshot_id,
                     "rows": res.source_rows,
                     "deduped_rows": res.deduped_rows}
            else:
                snap = self.table.append(
                    batch, generation_id=self.generation_id, branch=self.staging
                )
                m = {"snapshot": snap.snapshot_id,
                     "rows": snap.summary.get("added_rows", 0)}
            m.update({k: v for k, v in histogram_metrics(batch).items()
                      if k in ("bytes", "partitions", "histogram")})
            return m

        metrics, _ran = self.ckpt.run_step(checkpoint_id, f"batch-{checkpoint_id}", _do)
        return metrics

    def finish(self) -> dict:
        """Teardown: truncate old generations (if truncate sync), then the
        atomic main<-staging swap (S3DataLakeStreamLoader.kt:96-133)."""
        if self.mode == "truncate":
            stale = [
                e
                for e in self.table.data_files(branch=self.staging)
                if e.generation_id != self.generation_id
            ]
            if stale:
                self.table.commit(
                    "truncate",
                    [],
                    remove_paths={e.path for e in stale},
                    branch=self.staging,
                    summary={"truncated_generations": True},
                )
        self.table.replace_branch(MAIN, self.staging)
        self.table.drop_branch(self.staging)
        return self.ckpt.cumulative_stats()
