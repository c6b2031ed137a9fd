"""Optimistic-concurrency retry for maintenance operators.

Every commit in this engine is optimistic: operators pin the snapshot they
planned against (`expected_parent`) and a concurrent commit raises
CommitConflict instead of silently dropping either side's files. Iceberg
resolves the same race by retrying the whole operation against the new
table state (`commit.retry.num-retries`, default 4 — Tables re-plan and
re-validate on each attempt); this helper is that loop. The operation
callable must RE-PLAN from the table's current state on each call — which
every operator here does, because each reads `table.data_files()` /
`current_snapshot_id()` fresh at entry.
"""

from __future__ import annotations

import logging
import random
import time
from typing import Callable, TypeVar

from airbyte_spark.lake.table import CommitConflict

log = logging.getLogger("airbyte_spark.retry")

T = TypeVar("T")


def retry_on_conflict(
    op: Callable[[], T],
    attempts: int = 4,
    base_backoff_s: float = 0.1,
    rng: random.Random | None = None,
) -> T:
    """Run `op()` until it commits; on CommitConflict re-run it (the
    operator re-plans against the moved branch) with jittered exponential
    backoff. Re-raises after `attempts` consecutive conflicts."""
    rng = rng or random.Random()
    last: CommitConflict | None = None
    for attempt in range(attempts):
        try:
            return op()
        except CommitConflict as e:
            last = e
            if attempt == attempts - 1:
                break
            sleep_s = base_backoff_s * (2**attempt) * (0.5 + rng.random())
            log.warning(
                "commit conflict (attempt %d/%d), re-planning in %.2fs: %s",
                attempt + 1, attempts, sleep_s, e,
            )
            time.sleep(sleep_s)
    raise last  # type: ignore[misc]
