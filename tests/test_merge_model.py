"""Randomized model check of MERGE semantics: every (mode x cdc_mode)
combination is replayed against an independent pure-python dict model of
the documented resolution rules (dedup_order cursor DESC NULLS LAST ->
extracted DESC -> raw_id DESC, RecordDiffer.kt:87-110; src-wins tie
predicate SnowflakeDirectLoadSqlGenerator.kt:160-179; hard vs soft CDC
deletion DatabricksSqlGenerator.kt:140). Randomized ids/cursors force PK
collisions, cursor ties, null cursors, intra-batch duplicates and stale
deletes — the hand-written matrix can't enumerate those combinations."""

import datetime as dt
import itertools
import os

import numpy as np
import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.merge import merge_into

UTC = dt.timezone.utc

SCHEMA = StructType(
    [
        StructField("k", StringType(), False),
        StructField("v", IntegerType()),
        StructField("updated_at", TimestampType()),
        StructField("_airbyte_raw_id", StringType()),
        StructField("_airbyte_extracted_at", TimestampType()),
        StructField("_ab_cdc_deleted_at", TimestampType()),
    ]
)

T0 = dt.datetime(2026, 3, 1, tzinfo=UTC)


def _ts(h):
    return T0 + dt.timedelta(hours=int(h))


def _gen_batch(rng, batch_idx, n=15):
    rows = []
    for j in range(n):
        rows.append(
            {
                "k": f"k{int(rng.integers(0, 12))}",
                "v": int(rng.integers(0, 1000)),
                # small cursor pool -> ties; 15% null cursors
                "updated_at": None
                if rng.random() < 0.15
                else _ts(rng.integers(0, 4)),
                "_airbyte_raw_id": f"r{batch_idx}-{j:03d}",
                "_airbyte_extracted_at": _ts(rng.integers(0, 4)),
                "_ab_cdc_deleted_at": _ts(9) if rng.random() < 0.25 else None,
            }
        )
    return rows


def _order_key(r):
    """dedup_order: cursor DESC NULLS LAST, extracted DESC, raw_id DESC —
    as a max() key."""
    c = r["updated_at"]
    return (c is not None, c or T0, r["_airbyte_extracted_at"], r["_airbyte_raw_id"])


def _model_merge(state, batch, cdc_mode):
    # W1 batch dedup: newest row per PK
    winners = {}
    for r in batch:
        if r["k"] not in winners or _order_key(r) > _order_key(winners[r["k"]]):
            winners[r["k"]] = r
    for k, w in winners.items():
        cur = state.get(k)
        if cur is not None:
            t_c, s_c = cur["updated_at"], w["updated_at"]
            tie = cur["_airbyte_extracted_at"] <= w["_airbyte_extracted_at"]
            wins = (
                (t_c is None and s_c is not None)
                or (t_c is None and s_c is None and tie)
                or (t_c is not None and s_c is not None and t_c < s_c)
                or (t_c is not None and s_c is not None and t_c == s_c and tie)
            )
            if not wins:
                continue
            if cdc_mode == "hard" and w["_ab_cdc_deleted_at"] is not None:
                del state[k]
            else:
                state[k] = w
        else:
            if cdc_mode == "hard" and w["_ab_cdc_deleted_at"] is not None:
                continue  # delete for an unseen PK never lands
            state[k] = w
    return state


def _naive(t):
    if t is None:
        return None
    return t.astimezone(UTC).replace(tzinfo=None) if t.tzinfo else t


def _row_tuple(r):
    return (
        r["v"],
        _naive(r["updated_at"]),
        r["_airbyte_raw_id"],
        _naive(r["_airbyte_extracted_at"]),
        _naive(r["_ab_cdc_deleted_at"]),
    )


# SOAK_SEEDS adds extra rng salts per (mode, cdc_mode) for soak runs
_SOAK = [int(s) for s in os.environ.get("SOAK_SEEDS", "").split()]


@pytest.mark.parametrize("mode,cdc_mode,salt", list(
    itertools.product(("cow", "mor"), ("hard", "soft"), [0] + _SOAK)
))
def test_random_batches_match_dict_model(
    spark, tmp_table_dir, mode, cdc_mode, salt
):
    rng = np.random.default_rng(
        [2026, hash(mode) % 97, hash(cdc_mode) % 97, salt]
    )
    root = os.path.join(tmp_table_dir, f"{mode}-{cdc_mode}-{salt}")
    t = LakeTable.create(spark, root, SCHEMA, primary_key=["k"])
    state: dict = {}
    for b in range(3):
        batch = _gen_batch(rng, b)
        merge_into(
            t,
            spark.createDataFrame(
                [tuple(r[f.name] for f in SCHEMA.fields) for r in batch],
                SCHEMA,
            ),
            mode=mode,
            cdc_mode=cdc_mode,
        )
        state = _model_merge(state, batch, cdc_mode)
        got = {r["k"]: _row_tuple(r.asDict()) for r in t.scan().collect()}
        want = {k: _row_tuple(r) for k, r in state.items()}
        assert got == want, f"{mode}/{cdc_mode} diverged at batch {b}"
