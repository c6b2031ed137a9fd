"""Per-partition checkpointing, lineage, and ordered commit.

Reference semantics (SURVEY.md §2.9):

- T4 ordered checkpoint commit: states flush strictly in id order, only
  when complete (StateStore.kt:69-116).
- A2 partition histograms: record counts/bytes per partition key, merged
  downstream (StateHistogram.kt:11-44, AggregateStore.kt:28-37).
- A3 completeness: a state is flushable iff flushed == expected counts
  (StateHistogramStore.kt).
- A4 committed stats: cumulative rows/bytes per stream emitted with each
  state (CommitedStatsStore.kt, StateStage.kt:24-33).
- T5 at-least-once + idempotent resume: a re-run of a completed step is a
  no-op; a half-finished step re-runs from scratch against the unchanged
  parent snapshot (resumability.md:14-34).

Implementation: a JSON ledger per job (`<dir>/job-<id>/step-<seq>.json`)
written atomically AFTER the step's table commit succeeds. Because every
table mutation is itself an atomic snapshot swap, the pair (ledger entry,
snapshot id) gives exactly-once *effects* over at-least-once *execution*:
on resume, a step whose ledger entry exists is skipped and its recorded
result is returned; a step that crashed mid-write left only unreferenced
data files, which orphan-GC reclaims.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.lake.format import atomic_write_json, now_ms, read_json


class OutOfOrderStepError(RuntimeError):
    """A step ran before its predecessor committed (violates T4)."""


@dataclass
class StepRecord:
    seq: int
    name: str
    status: str  # committed
    started_ms: int
    committed_ms: int
    metrics: dict

    def to_json(self) -> dict:
        return self.__dict__.copy()


class JobCheckpointer:
    """Ordered, resumable step ledger for one maintenance job."""

    def __init__(self, root: str, job_id: str):
        self.dir = os.path.join(root, f"job-{job_id}")
        os.makedirs(self.dir, exist_ok=True)

    def _step_path(self, seq: int) -> str:
        return os.path.join(self.dir, f"step-{seq:05d}.json")

    def completed(self) -> list[StepRecord]:
        out = []
        for p in sorted(glob.glob(os.path.join(self.dir, "step-*.json"))):
            d = read_json(p)
            out.append(StepRecord(**d))
        return out

    def last_seq(self) -> int:
        done = self.completed()
        return done[-1].seq if done else -1

    def run_step(
        self,
        seq: int,
        name: str,
        fn: Callable[[], dict],
    ) -> tuple[dict, bool]:
        """Run step `seq` exactly-once-by-effect. Returns (metrics, ran).

        - already committed -> skip, return recorded metrics (idempotent
          resume; fn not called).
        - predecessor missing -> OutOfOrderStepError (ordered commit T4).
        - else run fn(), then atomically write the ledger entry.
        """
        p = self._step_path(seq)
        if os.path.exists(p):
            rec = read_json(p)
            if rec["name"] != name:
                raise OutOfOrderStepError(
                    f"step {seq} committed as {rec['name']!r}, replay wants {name!r}"
                )
            return rec["metrics"], False
        if seq > 0 and not os.path.exists(self._step_path(seq - 1)):
            raise OutOfOrderStepError(
                f"step {seq} ({name}) cannot commit before step {seq - 1}"
            )
        started = now_ms()
        metrics = fn() or {}
        rec = StepRecord(
            seq=seq,
            name=name,
            status="committed",
            started_ms=started,
            committed_ms=now_ms(),
            metrics=metrics,
        )
        atomic_write_json(p, rec.to_json())
        return metrics, True

    def cumulative_stats(self) -> dict:
        """A4 committed-stats aggregation over all committed steps."""
        rows = bytes_ = 0
        for rec in self.completed():
            rows += int(rec.metrics.get("rows", 0))
            bytes_ += int(rec.metrics.get("bytes", 0))
        return {"rows": rows, "bytes": bytes_, "steps": self.last_seq() + 1}


def partition_histogram(df: DataFrame, payload_col: str | None = "bytes") -> DataFrame:
    """A2: per-partition (task) row/byte counts — the lineage record each
    step attaches to its checkpoint. Pure partial aggregation: one count
    per task, merged by a tiny final shuffle."""
    size = (
        F.sum(F.length(F.col(payload_col)).cast("long"))
        if payload_col and payload_col in df.columns
        else F.lit(None).cast("long")
    )
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"), size.alias("bytes"))
        .orderBy("partition_id")
    )


def histogram_metrics(df: DataFrame, payload_col: str | None = "bytes") -> dict:
    """Collect the A2 histogram into checkpoint metrics (metadata-sized:
    one row per task)."""
    hist = partition_histogram(df, payload_col).collect()
    return {
        "rows": int(sum(r["rows"] for r in hist)),
        "bytes": int(sum(r["bytes"] or 0 for r in hist)),
        "partitions": len(hist),
        "histogram": {str(r["partition_id"]): int(r["rows"]) for r in hist},
    }
