"""Perceptual-hash image near-dup dedup (functions/images.py::
phash_near_dup_pairs) — the image-payload analog of SimHash dedup.

Three layers:
1. Brute-force parity: Spark's banded pipeline over encoded payloads
   returns EXACTLY the pairs a pure-Python phash64 + hamming64 O(n^2)
   scan finds, at hamming radii that exercise multi-band candidate
   union (radius > 0, perturbed images).
2. Oracle-fixture invariants that q_dedup_phash's closed-form DuckDB
   oracle depends on: power-of-two contrast scaling is phash-exact,
   the 8 fixed patterns are pairwise > radius apart.
3. The star-cap guard path (degenerate identical-image buckets).
"""

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from airbyte_spark.codecs import decode_image, encode_image, hamming64, phash64
from airbyte_spark.functions.images import phash_near_dup_pairs

S = 64


def _wave_family():
    yy, xx = np.mgrid[0:S, 0:S]
    return [
        (xx // 32) % 2, (xx // 16) % 2,
        (yy // 32) % 2, (yy // 16) % 2,
        ((xx + yy) // 32) % 2, ((xx // 32) + (yy // 32)) % 2,
        ((xx // 16) + (yy // 16)) % 2, ((xx + yy) // 16) % 2,
    ]


def _img(pixels2d):
    return np.stack([pixels2d.astype(np.uint8)] * 3, axis=-1)


def _perturbed_corpus(n=48, seed=7):
    """Deterministic images with a spread of pairwise hamming distances:
    smooth low-frequency bases plus per-image noise patches, so the
    brute-force pair set at radius r is non-trivial (some 0 < d <= r)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:S, 0:S]
    imgs = {}
    for i in range(n):
        base = (
            100
            + 80 * np.sin(2 * np.pi * (i % 5 + 1) * xx / S)
            + 60 * np.cos(2 * np.pi * (i % 3 + 1) * yy / S)
        )
        # patch perturbation: flips a few low-frequency bits for nearby i
        px = base.copy()
        patch = (i // 8) * 7 % 48
        px[patch : patch + 16, patch : patch + 16] += 10 * (i % 4)
        px = np.clip(px, 0, 255)
        imgs[i] = _img(px)
    return imgs


@pytest.fixture(scope="module")
def corpus(spark):
    imgs = _perturbed_corpus()
    pdf = pd.DataFrame(
        [
            {"image_id": i, "bytes": encode_image(px, "png")}
            for i, px in imgs.items()
        ]
    )
    df = spark.createDataFrame(pdf).repartition(4)
    return imgs, df


@pytest.mark.parametrize("radius", [2, 6, 10])
def test_banded_pairs_match_bruteforce(spark, corpus, radius):
    imgs, df = corpus
    hashes = {i: phash64(decode_image(encode_image(px, "png"))) for i, px in imgs.items()}
    expected = {
        (a, b, hamming64(hashes[a], hashes[b]))
        for a, b in itertools.combinations(sorted(imgs), 2)
        if hamming64(hashes[a], hashes[b]) <= radius
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup_pairs(
            df, max_hamming=radius, max_bucket_size=None
        ).collect()
    }
    assert got == expected
    # the fixture must actually exercise near-dup recall (distinct
    # images within radius), not only the trivial empty/equal cases;
    # phash distances here are even and >= 6 (both hashes carry ~31 set
    # bits, so |A xor B| is even), hence the 6/10 radii
    if radius >= 6:
        assert any(0 < h for (_, _, h) in expected), "fixture degenerate"


def test_oracle_fixture_contrast_invariance():
    """q_dedup_phash's oracle rests on this: scaling every pixel by a
    power of two is exact in float64 through luma/pool/DCT/median, so the
    three contrast variants of each pattern share one phash."""
    for w in _wave_family():
        hs = {
            phash64(decode_image(encode_image(_img((32 << s) * w), "png")))
            for s in range(3)
        }
        assert len(hs) == 1


def test_oracle_fixture_pattern_separation():
    """...and on this: the 8 fixed patterns sit strictly farther apart
    than the query radius (4), so cross-group pairs are impossible."""
    base = [
        phash64(decode_image(encode_image(_img(32 * w), "png")))
        for w in _wave_family()
    ]
    assert len(set(base)) == 8
    dists = [hamming64(a, b) for a, b in itertools.combinations(base, 2)]
    assert min(dists) >= 10


def test_star_cap_keeps_connectivity(spark):
    """A degenerate bucket (many identical images) past max_bucket_size
    star-expands around its min id: completeness is traded but every
    member still pairs with the representative."""
    px = _img(32 * _wave_family()[0])
    pdf = pd.DataFrame(
        [{"image_id": i, "bytes": encode_image(px, "png")} for i in range(20)]
    )
    df = spark.createDataFrame(pdf)
    got = phash_near_dup_pairs(df, max_hamming=4, max_bucket_size=8)
    rows = got.collect()
    ids = set(range(20))
    # star around min id 0: every other id reachable in one hop
    touched = {r["id_a"] for r in rows} | {r["id_b"] for r in rows}
    assert touched == ids
    assert all(r["hamming"] == 0 for r in rows)
    paired_with_rep = {r["id_b"] for r in rows if r["id_a"] == 0}
    assert paired_with_rep == ids - {0}


def test_no_pixels_cross_the_shuffle(spark, corpus):
    """Scale guard: the banded self-join's plan reads only (id, hash) —
    the binary payload column must not appear past the Arrow hash pass."""
    _, df = corpus
    plan = (
        phash_near_dup_pairs(df, max_hamming=4, max_bucket_size=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the payload may (must) feed the Arrow hash pass on each side, but
    # every shuffle partitioning expression and join header must be over
    # slim (id, hash, band) columns only
    suspect = [
        ln
        for ln in plan.splitlines()
        if ("Exchange" in ln or "Join" in ln or "Sort " in ln)
        and "bytes" in ln
    ]
    assert not suspect, suspect
