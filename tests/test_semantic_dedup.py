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


def test_int8_quantization_roundtrip_error_bound(spark):
    """Reconstruction error <= scale/2 per component; zero vectors
    survive; codes stay in [-127, 127]."""
    from airbyte_spark.functions.similarity import dequantize_int8, quantize_int8

    rng = np.random.default_rng(11)
    rows = [(i, (rng.normal(size=16) * (10.0 ** (i % 4 - 2))).tolist()) for i in range(20)]
    rows.append((99, [0.0] * 16))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize_int8(df)
    back = dequantize_int8(q)
    orig = {r["vec_id"]: r["embedding"] for r in df.collect()}
    scales = {r["vec_id"]: r["scale"] for r in q.collect()}
    codes = {r["vec_id"]: r["qvec"] for r in q.collect()}
    for r in back.collect():
        i = r["vec_id"]
        assert all(-127 <= c <= 127 for c in codes[i])
        for a, b in zip(orig[i], r["embedding"]):
            assert abs(a - b) <= scales[i] / 2 + 1e-12
    assert scales[99] == 0.0 and all(c == 0 for c in codes[99])
    assert all(x == 0.0 for x in {r["vec_id"]: r for r in back.collect()}[99]["embedding"])


def test_quantized_ann_recall(spark):
    """Brute-force top-k over dequantized int8 vectors recalls >=80% of
    the exact float top-10 on the fixture corpus — the storage path is
    usable for re-ranking."""
    from airbyte_spark.functions.similarity import (
        brute_force_topk,
        dequantize_int8,
        quantize_int8,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = brute_force_topk(emb, queries, k=10, exact=True)
    deq = dequantize_int8(quantize_int8(emb))
    approx = brute_force_topk(deq, queries, k=10, exact=True)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.8


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=64),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=12, deadline=None)
def test_quantize_matches_numpy_reference(spark, vecs):
    """quantize_int8 == the numpy replica for ANY finite vectors
    (identical IEEE ops: max/127 scale, floor(x/s + 0.5), clamp)."""
    from airbyte_spark.functions.similarity import quantize_int8

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["scale"], list(r["qvec"]))
        for r in quantize_int8(df).collect()
    }
    want = {}
    for i, v in rows:
        a = np.asarray(v, dtype=np.float64)
        s = np.abs(a).max() / 127.0
        if s == 0.0:
            q = [0] * len(v)
        else:
            q = [int(min(127.0, max(-127.0, np.floor(x / s + 0.5)))) for x in a]
        want[i] = (s, q)
    assert got == want


def test_zero_vector_is_never_a_duplicate(spark):
    """An all-zero embedding (failed encoder output) must neither
    poison k-means with NaN nor read as a duplicate of anything."""
    rows = _base_rows(n=12, seed=5)
    rows.append((300, np.zeros(8)))
    out = {r["vec_id"]: r for r in
           semantic_dedup(_corpus(spark, rows), k=2, threshold=0.9).collect()}
    assert out[300]["keep"] is True
    assert all(out[i]["keep"] for i in range(12))


def test_semantic_dedup_cell_cap_no_quadratic_stage(spark):
    """r6 skew guard: a degenerate corpus collapsing into one giant cell
    must not plan an all-pairs self-join. With the cap, every duplicate of
    the cell's min id is still dropped (star compare), the survivor count
    stays 1 for an all-duplicates corpus, and the executed plan's join
    output is O(cell), not O(cell^2)."""
    n = 400
    base = np.ones(8)
    rows = [(i, base * (1.0 + i)) for i in range(n)]  # all same direction
    out = semantic_dedup(_corpus(spark, rows), k=2, threshold=0.99,
                         max_cell_size=50)
    got = out.collect()
    assert len(got) == n
    keep = {r["vec_id"] for r in got if r["keep"]}
    # every member is an exact semantic duplicate of id 0 -> star around
    # the min id drops all others
    assert keep == {0}
    # uncapped and capped agree on this corpus (star == all-pairs when
    # everything duplicates the representative)
    unc = semantic_dedup(_corpus(spark, rows), k=2, threshold=0.99,
                         max_cell_size=None).collect()
    assert {r["vec_id"]: r["keep"] for r in unc} == {
        r["vec_id"]: r["keep"] for r in got
    }
