"""Randomized model check for the incremental near-dup index: across
arbitrary append / upsert / delete interleavings (seeded, deterministic),
after EVERY update window

1. state parity — the index's stored (id, hash) set equals the hashes
   of the live source payloads recomputed from scratch, and
2. emission spec — the window's probe-emitted pairs are exactly the
   from-scratch pair set over the post-window state restricted to pairs
   touching an id upserted in that window (text updates rebind: pairs
   reflect the NEW hash; tombstoned pre-images never pair).

This is the executable spec the three flavors share; the simhash-md5
flavor runs here because it needs no image codec."""

import datetime
import os
import random

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.functions.dedup import simhash_near_dup_pairs
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.dedup_index import (
    create_near_dup_index,
    update_near_dup_index,
)
from airbyte_spark.operators.merge import merge_into
from airbyte_spark.operators.posdeletes import delete_where

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType()),
        StructField("updated_at", TimestampType()),
    ]
)
TS = datetime.datetime(2026, 1, 1)
N_GROUPS = 6


def _text(grp):
    rng = random.Random(7000 + grp)
    return " ".join(f"w{rng.randrange(2000)}" for _ in range(30))


TEXTS = [_text(g) for g in range(N_GROUPS)]


def _pairset(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


def _oneshot(source):
    return _pairset(
        simhash_near_dup_pairs(
            source.scan().select("doc_id", "text"),
            max_hamming=8,
            hasher="md5",
            max_bucket_size=None,
        )
    )


# SOAK_SEEDS extends the pinned seeds for soak runs (scripts/soak_models.sh)
_SOAK = [int(s) for s in os.environ.get("SOAK_SEEDS", "").split()]


@pytest.mark.parametrize("seed", [11, 23] + _SOAK)
def test_random_dml_interleavings_respect_the_index_spec(
    spark, tmp_table_dir, seed
):
    rng = random.Random(seed)
    src = LakeTable.create(
        spark, f"{tmp_table_dir}/src{seed}", SCHEMA, primary_key=["doc_id"]
    )
    idx = create_near_dup_index(
        src, f"{tmp_table_dir}/idx{seed}", "text", "doc_id",
        hasher="simhash-md5", max_hamming=8,
    )
    group_of: dict[int, int] = {}
    next_id = 0

    def rows(ids, day):
        return [
            (i, TEXTS[group_of[i]], TS + datetime.timedelta(days=day))
            for i in ids
        ]

    # window 0: initial corpus
    for _ in range(10):
        group_of[next_id] = rng.randrange(N_GROUPS)
        next_id += 1
    src.append(spark.createDataFrame(rows(list(group_of), 0), SCHEMA))
    res = update_near_dup_index(src, idx)
    assert res.mode == "initial"
    assert _pairset(res.pairs) == _oneshot(src)

    for day in range(1, 5):
        alive = sorted(group_of)
        upserted: set[int] = set()
        # appends
        fresh = []
        for _ in range(rng.randrange(1, 4)):
            group_of[next_id] = rng.randrange(N_GROUPS)
            fresh.append(next_id)
            upserted.add(next_id)
            next_id += 1
        if fresh:
            src.append(spark.createDataFrame(rows(fresh, day), SCHEMA))
        # text updates via MoR merge (rebind to a new random group)
        upd = rng.sample(alive, k=min(2, len(alive)))
        for i in upd:
            group_of[i] = rng.randrange(N_GROUPS)
            upserted.add(i)
        if upd:
            merge_into(
                src,
                spark.createDataFrame(rows(upd, day), SCHEMA),
                mode="mor",
            )
        # deletes (never a doc upserted this window — keeps the spec
        # readable; the updater resolves mixed cases by head ordinal,
        # pinned separately in the flavor tests)
        victims = [
            i for i in rng.sample(alive, k=min(2, len(alive)))
            if i not in upserted
        ]
        for i in victims:
            del group_of[i]
        if victims:
            delete_where(
                src, f"doc_id IN ({', '.join(str(v) for v in victims)})"
            )

        res = update_near_dup_index(src, idx)
        assert res.mode == "incremental"
        assert res.images_upserted == len(upserted)
        assert res.images_removed == len(victims)

        final_pairs = _oneshot(src)
        want = {
            (a, b, h)
            for a, b, h in final_pairs
            if a in upserted or b in upserted
        }
        got = _pairset(res.pairs) if res.pairs is not None else set()
        assert got == want, f"window {day} emission spec violated"

        # full state parity: stored hashes == recomputed live hashes
        from airbyte_spark.functions.dedup import simhash_md5_udf
        from pyspark.sql import functions as F

        stored = {
            (r["doc_id"], r["phash"])
            for r in idx.scan().select("doc_id", "phash").distinct().collect()
        }
        truth = {
            (r["doc_id"], r["_h"])
            for r in src.scan()
            .select("doc_id", simhash_md5_udf(F.col("text")).alias("_h"))
            .collect()
        }
        assert stored == truth, f"window {day} state parity violated"
