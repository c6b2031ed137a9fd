"""Custom stateful streaming operators + event-time windows.

The reference is micro-batch streaming without event-time watermarks
(SURVEY.md §2.9); these are the Spark-native extensions a training-data
ingest pipeline needs on top:

- `sessionize_stream`: per-user session assembly with an inactivity gap,
  implemented with `applyInPandasWithState` (GroupState timeouts carry
  open sessions across micro-batches). Arrow-batched — the per-group
  Python handles only that group's rows.
- `windowed_event_counts`: tumbling event-time window aggregation with a
  watermark for late data — late rows inside the watermark still land in
  their window; rows later than the watermark are dropped (bounded
  state, the property Airbyte lacks and compensates for with cursor
  resolution, T6).

Batch twins of both exist (the `sessionization` query in
__spark_entry__.py and plain groupBy time-bucket aggs) — the streaming
forms are for unbounded ingest.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("events", LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_ms: int,
) -> Iterable[pd.DataFrame]:
    """Fold this group's new events into the open session; emit every
    session closed by a gap-crossing event. Open sessions persist in
    GroupState across micro-batches."""
    user_id = key[0]
    closed: list[tuple] = []

    ts_ms: list[int] = []
    for b in batches:
        ts_ms.extend(int(v.value // 10**6) for v in pd.to_datetime(b["ts"]))
    ts_ms.sort()
    if state.exists:
        start_ms, last_ms, n = state.get
    else:
        start_ms, last_ms, n = None, None, 0
    for t in ts_ms:
        if start_ms is None:
            start_ms, last_ms, n = t, t, 1
        elif t - last_ms > gap_ms:
            closed.append((user_id, start_ms, last_ms, n))
            start_ms, last_ms, n = t, t, 1
        else:
            last_ms, n = t, n + 1
    if start_ms is not None:
        state.update((int(start_ms), int(last_ms), int(n)))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="ms") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="ms") for c in closed],
                "events": [c[3] for c in closed],
            }
        )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
) -> DataFrame:
    """events(user_id long, ts timestamp) stream -> closed sessions."""
    gap_ms = gap_seconds * 1000

    def fn(key, pdf_iter, state):
        return _sessionize_group(key, pdf_iter, state, gap_ms)

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            # NoTimeout: sessions close when a gap-crossing event arrives;
            # an idle key's open session stays in state (flushed by the
            # caller on sync end). ProcessingTimeTimeout + availableNow
            # makes the engine schedule timeout micro-batches forever.
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time windows with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "events",
            F.round("total_value", 4).alias("total_value"),
        )
    )
