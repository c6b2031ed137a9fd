"""End-to-end fidelity: the per-row invariant from BASELINE.json —
decoded-pixel allclose (PSNR >= 40 dB for lossy fmt, bit-exact for png) +
exact caption equality per image_id, preserved across the full maintenance
pipeline. Plus codec/phash unit checks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from airbyte_spark.codecs import decode_image, encode_image, hamming64, phash64, psnr
from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images, generate_update_batch
from airbyte_spark.functions.images import (
    image_feature_df,
    phash_udf,
    verify_fidelity,
)
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.maintenance import run_maintenance


def _img(seed, h=64, w=48):
    rng = np.random.default_rng(seed)
    base = 127 + 80 * np.sin(np.arange(w) / 5.0)
    img = np.stack([np.tile(base, (h, 1))] * 3, axis=-1)
    return (img + rng.integers(-10, 10, (h, w, 3))).clip(0, 255).astype(np.uint8)


def test_codec_png_lossless():
    px = _img(1)
    assert np.array_equal(decode_image(encode_image(px, "png")), px)


def test_codec_jpeg_lossy_above_40db():
    px = _img(2)
    dec = decode_image(encode_image(px, "jpeg"))
    assert psnr(px, dec) >= 40.0
    assert not np.array_equal(dec, px)  # genuinely lossy


def test_codec_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_phash_similar_images_close():
    px = _img(3)
    near = px.copy()
    near[::7, ::7] ^= 3  # tiny perturbation
    far = _img(4).T.copy().T  # different content
    far = np.rot90(_img(4), 1, axes=(0, 1)).copy()
    h0, h1 = phash64(px), phash64(near)
    h2 = phash64(far[: px.shape[0], : px.shape[1]])
    assert hamming64(h0, h1) <= 6
    assert hamming64(h0, h2) > hamming64(h0, h1)


def test_phash_udf_matches_stored_column(spark):
    df = generate_images(spark, 32, num_partitions=2)
    bad = df.withColumn("re", phash_udf("bytes")).filter("re != phash")
    assert bad.isEmpty()


def test_image_features(spark):
    df = generate_images(spark, 16, num_partitions=2)
    feats = image_feature_df(df).join(df.select("image_id", "w", "h"), "image_id")
    mismatched = feats.filter("dec_w != w OR dec_h != h")
    assert mismatched.isEmpty()
    assert feats.filter("luma_std <= 0").isEmpty()


def test_maintenance_preserves_fidelity(spark, tmp_table_dir):
    """The CAT golden-record analog: after MERGE+compact+cluster+GC, every
    surviving image passes the PSNR/caption invariant against the expected
    post-merge state computed independently."""
    t = LakeTable.create(
        spark, tmp_table_dir, IMAGES_SCHEMA, primary_key=["image_id"],
        properties={"write.target-file-size-bytes": 2 * 1024 * 1024},
    )
    base = generate_images(spark, 150, num_partitions=4)
    t.append(base)
    src = generate_update_batch(spark, 150, 60, num_partitions=4)
    src_p = src.persist()

    run_maintenance(t, "fidelity-job", merge_source=src_p, curve="hilbert")

    # independent expected state: window-dedup source, apply over base
    from pyspark.sql import Window
    w = Window.partitionBy("image_id").orderBy(
        F.desc_nulls_last("updated_at"),
        F.desc("_airbyte_extracted_at"),
        F.desc("_airbyte_raw_id"),
    )
    best = (
        src_p.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    kept_updates = best.filter(F.col("_ab_cdc_deleted_at").isNull())
    deleted_ids = best.filter(F.col("_ab_cdc_deleted_at").isNotNull()).select("image_id")
    expected = (
        base.join(best.select("image_id"), "image_id", "left_anti")
        .select("image_id", "bytes", "caption", "fmt")
        .unionByName(kept_updates.select("image_id", "bytes", "caption", "fmt"))
    )

    actual = t.scan().select("image_id", "bytes", "caption")
    verdict = verify_fidelity(expected, actual).persist()
    failures = verdict.filter(~F.col("passes"))
    assert failures.isEmpty(), failures.limit(5).collect()
    assert verdict.count() == expected.count() == actual.count()
    src_p.unpersist()
    verdict.unpersist()


def test_resize_matches_numpy_reference(spark):
    """resize_images == the straightforward numpy area-mean on decoded
    pixels, for arbitrary (non-multiple) sizes; undersized images drop."""
    import numpy as np
    import pandas as pd

    from airbyte_spark.codecs import decode_image, encode_image
    from airbyte_spark.functions.images import resize_images

    rng = np.random.default_rng(3)
    imgs = {
        f"i{k}": rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        for k, (h, w) in enumerate([(7, 9), (8, 8), (33, 17), (2, 5), (1, 1)])
    }
    pdf = pd.DataFrame(
        [{"image_id": k, "bytes": encode_image(px, "png")} for k, px in imgs.items()]
    )
    got = {
        r["image_id"]: r
        for r in resize_images(
            spark.createDataFrame(pdf), factor=3
        ).collect()
    }
    for k, px in imgs.items():
        oh, ow = px.shape[0] // 3, px.shape[1] // 3
        if oh == 0 or ow == 0:
            assert k not in got  # sub-block images drop, not crash
            continue
        ref = np.round(
            px[: oh * 3, : ow * 3]
            .astype(np.float64)
            .reshape(oh, 3, ow, 3, 3)
            .mean(axis=(1, 3))
        ).astype(np.uint8)
        out = decode_image(bytes(got[k]["bytes"]))
        assert got[k]["w"] == ow and got[k]["h"] == oh
        assert np.array_equal(out, ref)


def test_resize_factor_one_is_identity(spark):
    import numpy as np
    import pandas as pd

    from airbyte_spark.codecs import encode_image
    from airbyte_spark.functions.images import resize_images

    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    data = encode_image(px, "png")
    pdf = pd.DataFrame([{"image_id": "a", "bytes": data}])
    row = resize_images(spark.createDataFrame(pdf), factor=1).first()
    assert bytes(row["bytes"]) == data
    assert (row["w"], row["h"]) == (6, 4)
