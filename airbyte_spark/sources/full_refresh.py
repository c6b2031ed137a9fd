"""Resumable Full Refresh — artificial-cursor chunked scans.

The reference's resumability model
(docs/platform/understanding-airbyte/resumability.md): a full-refresh
stream without a user cursor is paginated by an ARTIFICIAL cursor into
range queries — ``select * from users where CTID >= X AND CTID < Y`` —
so the sync can resume mid-table; a partially-delivered chunk is re-sent
on the next attempt ("Airbyte is a deliver at-least-once system").
Tables without a primary key don't support it (resumability.md:66-70) —
the PK (or any stable unique column set) is our artificial cursor.

Spark realization: boundaries are planned ONCE from a sample
(``plan_range_partitions`` — the JdbcPartitionsCreator.kt:196-282
analog) and frozen into the state token, exactly like the reference
freezes its CTID ranges per attempt; each chunk is then a pure Catalyst
composite-range predicate pushed to the parquet scan. No global sort, no
LIMIT/OFFSET: chunk cost is O(rows in range) regardless of table size,
and a resume re-reads only the one unfinished chunk.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.sources.incremental import (
    composite_range_filter,
    plan_range_partitions,
)


@dataclass(frozen=True)
class FullRefreshState:
    """Serializable artificial-cursor state: the frozen chunk boundaries
    plus the index of the next chunk to deliver. ``boundaries`` are
    exclusive upper-bound tuples over the PK columns."""

    pk_cols: tuple
    boundaries: tuple  # tuple of tuples
    next_chunk: int = 0

    def to_json(self) -> dict:
        return {
            "pk_cols": list(self.pk_cols),
            "boundaries": [list(b) for b in self.boundaries],
            "next_chunk": self.next_chunk,
        }

    @classmethod
    def from_json(cls, d: dict) -> "FullRefreshState":
        return cls(
            pk_cols=tuple(d["pk_cols"]),
            boundaries=tuple(tuple(b) for b in d["boundaries"]),
            next_chunk=int(d["next_chunk"]),
        )

    @property
    def n_chunks(self) -> int:
        return len(self.boundaries) + 1

    @property
    def done(self) -> bool:
        return self.next_chunk >= self.n_chunks


def chunk_filter(state: FullRefreshState, i: int):
    """Catalyst predicate for chunk ``i``: ``pk >= boundaries[i-1] AND
    pk < boundaries[i]`` (first chunk unbounded below, last unbounded
    above) — the CTID-range query shape."""
    if not 0 <= i < state.n_chunks:
        raise IndexError(f"chunk {i} out of range 0..{state.n_chunks - 1}")
    cols = list(state.pk_cols)
    pred = F.lit(True)
    if i > 0:
        pred = composite_range_filter(cols, state.boundaries[i - 1], inclusive=True)
    if i < len(state.boundaries):
        pred = pred & ~composite_range_filter(
            cols, state.boundaries[i], inclusive=True
        )
    return pred


def plan_full_refresh(
    df: DataFrame,
    pk_cols: list[str],
    target_rows_per_chunk: int,
    boundaries: list[tuple] | None = None,
    sample_fraction: float = 0.05,
    seed: int = 42,
) -> FullRefreshState:
    """Freeze the artificial cursor: sample-planned boundaries (or
    caller-provided ones, e.g. replayed from a prior attempt's state)."""
    if not pk_cols:
        raise ValueError(
            "resumable full refresh requires a primary key "
            "(resumability.md: tables without PKs do not support it)"
        )
    if boundaries is None:
        boundaries = plan_range_partitions(
            df, pk_cols, target_rows_per_chunk,
            sample_fraction=sample_fraction, seed=seed,
        )
    return FullRefreshState(
        pk_cols=tuple(pk_cols), boundaries=tuple(tuple(b) for b in boundaries)
    )


def chunks(
    df: DataFrame, state: FullRefreshState
) -> Iterator[tuple[DataFrame, FullRefreshState]]:
    """Yield ``(chunk_df, state_after_chunk)`` from ``state.next_chunk``
    on. The caller commits ``state_after_chunk`` only AFTER the chunk is
    durably written — re-running from the last committed state re-sends
    the unfinished chunk (at-least-once, resumability.md:17)."""
    for i in range(state.next_chunk, state.n_chunks):
        yield (
            df.filter(chunk_filter(state, i)),
            FullRefreshState(state.pk_cols, state.boundaries, i + 1),
        )


def run_resumable_full_refresh(
    df: DataFrame,
    state: FullRefreshState,
    deliver,
) -> FullRefreshState:
    """Drive the chunk loop: ``deliver(chunk_df, chunk_index)`` is the
    destination write; state advances only after each delivery returns.
    Raise inside ``deliver`` -> the returned state from a wrapping
    try/except (or the caller's checkpoint store) resumes at the failed
    chunk."""
    for chunk_df, next_state in chunks(df, state):
        deliver(chunk_df, next_state.next_chunk - 1)
        state = next_state
    return state
