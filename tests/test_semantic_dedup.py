"""SemDeDup semantic dedup (functions/similarity.py::semantic_dedup):
within-cell lower-id-neighbor drop over k-means on unit vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from airbyte_spark.functions.similarity import l2_normalize, semantic_dedup


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _base_rows(n=24, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    return [(i, rng.normal(size=dim)) for i in range(n)]


def test_duplicate_star_keeps_lowest_id(spark):
    rows = _base_rows()
    v = np.asarray(rows[5][1])
    # a 3-star of exact semantic duplicates of row 5 (scaled copies)
    rows += [(100, v * 2.0), (101, v * 0.5), (102, v * 4.0)]
    out = semantic_dedup(_corpus(spark, rows), k=3, threshold=0.99)
    keep = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert len(keep) == 27
    assert keep[5] is True
    assert keep[100] is False and keep[101] is False and keep[102] is False
    # every non-duplicated base row survives
    assert all(keep[i] for i in range(24))


def test_scale_invariance(spark):
    """Scaling any input vector changes nothing: clustering and cosine
    both run on unit vectors."""
    rows = _base_rows(n=16, seed=7)
    v = np.asarray(rows[2][1])
    rows.append((200, v * 3.0))
    base = semantic_dedup(_corpus(spark, rows), k=2, threshold=0.98)
    scaled_rows = [(i, np.asarray(v) * (1.0 + (i % 3))) for i, v in rows]
    scaled = semantic_dedup(_corpus(spark, scaled_rows), k=2, threshold=0.98)
    a = {(r["vec_id"], r["cell"], r["keep"]) for r in base.collect()}
    b = {(r["vec_id"], r["cell"], r["keep"]) for r in scaled.collect()}
    assert a == b
    assert {r["vec_id"] for r in base.collect() if not r["keep"]} == {200}


def test_orthogonal_vectors_all_survive(spark):
    dim = 8
    rows = [(i, np.eye(dim)[i]) for i in range(dim)]
    out = semantic_dedup(_corpus(spark, rows), k=2, threshold=0.5)
    assert all(r["keep"] for r in out.collect())


def test_l2_normalize_unit_norm(spark):
    df = l2_normalize(_corpus(spark, _base_rows(n=6)))
    norms = df.select(
        F.aggregate(
            F.transform("embedding", lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("n2")
    ).collect()
    assert all(abs(r["n2"] - 1.0) < 1e-12 for r in norms)


def test_pair_join_is_cell_bucketed(spark):
    """The self-join must be an equi-join on cell — no cartesian stage
    (the property that keeps pairwise work confined to clusters)."""
    out = semantic_dedup(_corpus(spark, _base_rows()), k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
