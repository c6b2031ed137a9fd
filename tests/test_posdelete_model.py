"""Randomized model check of the DML lifecycle: interleaved
delete_where / update_where / MoR merge / retire / tombstone-compaction / fold /
compact / cluster sequences replayed against a pure-python dict model
(pk -> row, deletes = predicate filters, merges = upserts). Whatever the
operator sequence, the scan must equal the model — this is the north
rule's identical-scan-output invariant under randomized schedules that
the hand-written tests can't enumerate (e.g. delete_where over a file a
MoR delete already hides, retirement between two DELETEs, maintenance in
the middle of tombstone debt)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.cluster import cluster
from airbyte_spark.operators.compact import compact
from airbyte_spark.operators.deletes import rewrite_deletes
from airbyte_spark.operators.merge import merge_into
from airbyte_spark.operators.posdeletes import (
    compact_position_deletes,
    delete_where,
    retire_equality_deletes,
    update_where,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("bucket", LongType()),
        StructField("v", LongType()),
    ]
)

N_IDS = 60


def _scan(t):
    return sorted(
        (r["id"], r["bucket"], r["v"]) for r in t.scan().collect()
    )


def _model_rows(model):
    return sorted((k, b, v) for k, (b, v) in model.items())


# SOAK_SEEDS="101 102 ..." extends the pinned seeds for soak runs
# (scripts/soak_models.sh) without touching the checked-in defaults.
_SOAK = [int(s) for s in os.environ.get("SOAK_SEEDS", "").split()]


@pytest.mark.parametrize("seed", [1, 7, 23] + _SOAK)
def test_random_delete_lifecycle_matches_model(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    t = LakeTable.create(
        spark, str(tmp_path / f"m{seed}"), SCHEMA, primary_key=["id"]
    )
    model: dict[int, tuple[int, int]] = {}
    # three initial files
    rows = [(i, i % 7, i * 10) for i in range(N_IDS)]
    for lo in range(0, N_IDS, 20):
        chunk = rows[lo : lo + 20]
        t.append(spark.createDataFrame(chunk, SCHEMA).coalesce(1))
        model.update({i: (b, v) for i, b, v in chunk})

    cursor = N_IDS * 10  # strictly increasing merge cursor: src always wins
    for step in range(12):
        op = rng.integers(0, 7)
        if op == 0:  # DELETE WHERE bucket = b AND id < cut
            b = int(rng.integers(0, 7))
            cut = int(rng.integers(0, N_IDS + 20))
            delete_where(t, f"bucket = {b} and id < {cut}")
            model = {
                k: (bb, v)
                for k, (bb, v) in model.items()
                if not (bb == b and k < cut)
            }
        elif op == 1:  # MoR upsert batch (some new ids, some updates)
            ids = rng.choice(N_IDS + 10, size=8, replace=False)
            cursor += 1
            batch = [(int(i), int(i % 7), cursor) for i in ids]
            merge_into(
                t,
                spark.createDataFrame(batch, SCHEMA),
                cursor_col="v",
                cdc_col=None,
                mode="mor",
            )
            model.update({i: (b, v) for i, b, v in batch})
        elif op == 2:
            retire_equality_deletes(t)
        elif op == 3:
            compact_position_deletes(t, min_input_files=2)
        elif op == 4:
            rewrite_deletes(t)
        elif op == 5:  # UPDATE WHERE bucket = b AND id >= cut (non-cursor
            # column only: v is the merge cursor, and bumping it would
            # change later merge winners in ways the model doesn't track)
            b = int(rng.integers(0, 7))
            cut = int(rng.integers(0, N_IDS + 20))
            update_where(
                t, f"bucket = {b} and id >= {cut}",
                {"bucket": F.col("bucket") + 7},
            )
            model = {
                k: ((bb + 7, v) if (bb == b and k >= cut) else (bb, v))
                for k, (bb, v) in model.items()
            }
        else:
            if rng.random() < 0.5:
                compact(t, target_file_bytes=1 << 20)
            else:
                cluster(t, dims=["id", "v"], curve="zorder", scope="dirty",
                        fold_deletes="always")
        assert _scan(t) == _model_rows(model), f"diverged at step {step} op {op}"
