"""Changelog-advanced per-row feature tables (operators/feature_table.py).
The invariant: advancing through ANY DML interleaving equals one full
recompute over the final alive rows."""

import datetime
import os
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.feature_table import (
    create_feature_table,
    reset_feature_table,
    update_feature_table,
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
TEXTS = [
    "alpha beta gamma delta epsilon zeta",
    "spam spam spam spam spam ham",
    "one two three one two three one two",
    "unique varied tokens everywhere always",
]


def _rows(pairs, day=0):
    return [
        (i, TEXTS[g % len(TEXTS)] + f" tail{g}", TS + datetime.timedelta(days=day))
        for i, g in pairs
    ]


def _oneshot(spark, source, feature):
    """Full recompute over the alive rows — the ground truth."""
    from airbyte_spark.operators.feature_table import EXTRACTORS

    df = EXTRACTORS[feature](source.scan(), "doc_id", "text")
    return {tuple(r) for r in df.collect()}


def _state(feat):
    # exclude the service columns (cursor + the CDC marker merge_into
    # evolves in on the first incremental window, as with every MoR
    # artifact kind)
    cols = [
        c
        for c in feat.scan().columns
        if c not in ("_feat_seq", "_ab_cdc_deleted_at")
    ]
    return {tuple(r) for r in feat.scan().select(*cols).collect()}


# SOAK_SEEDS extends the pinned seed for soak runs (scripts/soak_models.sh)
_SOAK = [int(s) for s in os.environ.get("SOAK_SEEDS", "").split()]


@pytest.mark.parametrize("seed", [31] + _SOAK)
@pytest.mark.parametrize("feature", ["quality", "fingerprint"])
def test_random_dml_matches_oneshot_recompute(spark, tmp_table_dir, feature, seed):
    rng = random.Random(seed)
    src = LakeTable.create(
        spark, f"{tmp_table_dir}/src-{feature}-{seed}", SCHEMA, primary_key=["doc_id"]
    )
    feat = create_feature_table(
        src, f"{tmp_table_dir}/feat-{feature}-{seed}", feature, "doc_id", "text"
    )
    group_of = {i: rng.randrange(4) for i in range(8)}
    src.append(spark.createDataFrame(_rows(group_of.items(), 0), SCHEMA))
    res = update_feature_table(src, feat)
    assert res.mode == "initial" and res.rows_upserted == 8
    assert _state(feat) == _oneshot(spark, src, feature)

    next_id = 8
    for day in range(1, 4):
        alive = sorted(group_of)
        upserted = set()
        fresh = {}
        for _ in range(rng.randrange(1, 3)):
            fresh[next_id] = rng.randrange(4)
            upserted.add(next_id)
            next_id += 1
        group_of.update(fresh)
        src.append(spark.createDataFrame(_rows(fresh.items(), day), SCHEMA))
        upd = rng.sample(alive, k=2)
        for i in upd:
            group_of[i] = rng.randrange(4)
            upserted.add(i)
        merge_into(
            src,
            spark.createDataFrame(_rows([(i, group_of[i]) for i in upd], day), SCHEMA),
            mode="mor",
        )
        victims = [i for i in rng.sample(alive, k=2) if i not in upserted]
        for i in victims:
            del group_of[i]
        if victims:
            delete_where(src, f"doc_id IN ({', '.join(map(str, victims))})")

        res = update_feature_table(src, feat)
        assert res.mode == "incremental"
        assert res.rows_upserted == len(upserted)
        assert res.rows_removed == len(victims)
        assert _state(feat) == _oneshot(spark, src, feature)
        assert feat.scan().count() == len(group_of)


def test_noop_at_head_and_reset_rebuild(spark, tmp_table_dir):
    src = LakeTable.create(spark, f"{tmp_table_dir}/s", SCHEMA, primary_key=["doc_id"])
    feat = create_feature_table(src, f"{tmp_table_dir}/f", "fingerprint", "doc_id", "text")
    src.append(spark.createDataFrame(_rows([(0, 0), (1, 1)]), SCHEMA))
    assert update_feature_table(src, feat).mode == "initial"
    assert update_feature_table(src, feat).mode == "noop"

    # source moves on: one doc deleted; a reset must rebuild idempotently
    # (no duplicate ids, stale id tombstoned)
    delete_where(src, "doc_id = 1")
    reset_feature_table(feat)
    res = update_feature_table(src, feat)
    assert res.mode == "rebuild"
    rows = feat.scan().collect()
    assert sorted(r["doc_id"] for r in rows) == [0]
    assert update_feature_table(src, feat).mode == "noop"


def test_image_stats_feature(spark, tmp_table_dir):
    from airbyte_spark.datagen import generate_images
    from airbyte_spark.functions.images import image_feature_df

    imgs = generate_images(spark, 6, seed=9)
    src = LakeTable.create(
        spark, f"{tmp_table_dir}/isrc", imgs.schema, primary_key=["image_id"]
    )
    src.append(imgs)
    feat = create_feature_table(
        src, f"{tmp_table_dir}/ifeat", "image-stats", "image_id", "bytes"
    )
    res = update_feature_table(src, feat)
    assert res.mode == "initial" and res.rows_upserted == 6
    want = {tuple(r) for r in image_feature_df(src.scan(), "image_id").collect()}
    got = {
        tuple(r)
        for r in feat.scan()
        .select("image_id", "dec_w", "dec_h", "luma_mean", "luma_std")
        .collect()
    }
    assert got == want


def test_create_validates_config(spark, tmp_table_dir):
    src = LakeTable.create(spark, f"{tmp_table_dir}/v", SCHEMA, primary_key=["doc_id"])
    with pytest.raises(ValueError, match="feature must be one of"):
        create_feature_table(src, f"{tmp_table_dir}/x", "nope", "doc_id", "text")
    with pytest.raises(ValueError, match="unknown source column"):
        create_feature_table(src, f"{tmp_table_dir}/y", "quality", "doc_id", "body")
    with pytest.raises(ValueError, match="not a feature table"):
        update_feature_table(src, src)


def test_registered_as_maintenance_artifact(spark, tmp_table_dir):
    from airbyte_spark.operators.derived import (
        register_derived_table,
        update_derived_tables,
    )

    src = LakeTable.create(spark, f"{tmp_table_dir}/ms", SCHEMA, primary_key=["doc_id"])
    feat = create_feature_table(
        src, f"{tmp_table_dir}/mf", "fingerprint", "doc_id", "text"
    )
    register_derived_table(src, "feature", feat.root)
    src.append(spark.createDataFrame(_rows([(0, 0), (1, 1), (2, 2)]), SCHEMA))
    reports = update_derived_tables(src)
    assert reports == [
        {
            "kind": "feature",
            "root": feat.root,
            "mode": "initial",
            "upserted": 3,
            "removed": 0,
        }
    ]
    assert feat.scan().count() == 3


def test_initial_append_writes_no_ghost_cdc_column(spark, tmp_table_dir):
    """The initial build must not persist _ab_cdc_deleted_at into the
    feature table's parquet files (it is not in the registered schema)."""
    import glob as _glob

    import pyarrow.parquet as pq

    src = LakeTable.create(spark, f"{tmp_table_dir}/gs", SCHEMA, primary_key=["doc_id"])
    feat = create_feature_table(src, f"{tmp_table_dir}/gf", "fingerprint", "doc_id", "text")
    src.append(spark.createDataFrame(_rows([(0, 0), (1, 1)]), SCHEMA))
    assert update_feature_table(src, feat).mode == "initial"
    for p in _glob.glob(f"{tmp_table_dir}/gf/data/**/*.parquet", recursive=True):
        assert "_ab_cdc_deleted_at" not in pq.read_schema(p).names


def test_image_stats_content_col_alongside_bytes_column(spark, tmp_table_dir):
    """content_col != 'bytes' while a 'bytes' column also exists must
    not create an ambiguous duplicate column."""
    from pyspark.sql import functions as F2

    from airbyte_spark.datagen import generate_images

    imgs = generate_images(spark, 3, seed=4).select(
        "image_id", F.col("bytes").alias("thumb"), F2.lit(b"x").alias("bytes")
    )
    src = LakeTable.create(
        spark, f"{tmp_table_dir}/bsrc", imgs.schema, primary_key=["image_id"]
    )
    src.append(imgs)
    feat = create_feature_table(
        src, f"{tmp_table_dir}/bfeat", "image-stats", "image_id", "thumb"
    )
    res = update_feature_table(src, feat)
    assert res.mode == "initial" and res.rows_upserted == 3
    assert feat.scan().filter("dec_w > 0").count() == 3
