"""Deterministic sampling + sequence packing (functions/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from airbyte_spark.functions.sampling import (
    fraction_threshold,
    hash_keep,
    pack_documents,
    stratified_sample,
)


def _py_keep(key, fraction, seed=""):
    thr = fraction_threshold(fraction)
    if thr is None:
        return True
    return hashlib.md5(f"{key}{seed}".encode()).hexdigest()[:8] < thr


def test_hash_keep_matches_python_reference(spark):
    df = spark.range(2000).select(F.col("id"))
    got = {
        r["id"] for r in df.filter(hash_keep(F.col("id"), 0.3, "s1")).collect()
    }
    want = {i for i in range(2000) if _py_keep(i, 0.3, "s1")}
    assert got == want
    # rate is within binomial noise of the target
    assert abs(len(got) / 2000 - 0.3) < 0.05


def test_hash_keep_edges_and_seed_independence(spark):
    df = spark.range(500)
    assert df.filter(hash_keep(F.col("id"), 1.0)).count() == 500
    assert df.filter(hash_keep(F.col("id"), 0.0)).count() == 0
    a = {r["id"] for r in df.filter(hash_keep(F.col("id"), 0.5, "a")).collect()}
    b = {r["id"] for r in df.filter(hash_keep(F.col("id"), 0.5, "b")).collect()}
    assert a != b  # different seed, different subset
    a2 = {r["id"] for r in df.filter(hash_keep(F.col("id"), 0.5, "a")).collect()}
    assert a == a2  # same seed, same subset


def test_stratified_sample_respects_per_stratum_fractions(spark):
    df = spark.range(3000).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("xx")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    out = stratified_sample(
        df, "id", "lang", {"en": 0.8, "de": 0.2}, seed="mix"
    ).groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in out}
    assert abs(by_lang["en"] / 1000 - 0.8) < 0.06
    assert abs(by_lang["de"] / 1000 - 0.2) < 0.06
    assert "xx" not in by_lang  # default fraction 0 drops unknown strata


def _py_copies(key, weight, seed=""):
    base = int(weight)
    frac = weight - base
    return base + (1 if frac > 0 and _py_keep(key, frac, seed) else 0)


def test_weighted_upsample_matches_python_reference(spark):
    from airbyte_spark.functions.sampling import weighted_upsample

    df = spark.range(1500).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("zh"), F.lit("xx")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )
    weights = {"en": 2.5, "zh": 0.4, "xx": 0.0}
    out = weighted_upsample(df, "id", "lang", weights, seed="up").collect()
    langs = ["en", "zh", "xx"]
    want = {}
    for i in range(1500):
        n = _py_copies(i, weights[langs[i % 3]], "up")
        if n:
            want[i] = n
    got = {}
    for r in out:
        got[r["id"]] = got.get(r["id"], 0) + 1
        assert 0 <= r["copy_id"] < want[r["id"]]
    assert got == want
    # expected total ~ sum of weights: 500*2.5 + 500*0.4 + 0 = 1450
    assert abs(len(out) - 1450) < 80


def test_weighted_upsample_default_weight_passthrough(spark):
    from airbyte_spark.functions.sampling import weighted_upsample

    df = spark.range(100).select(F.col("id"), F.lit("other").alias("lang"))
    out = weighted_upsample(df, "id", "lang", {"en": 3.0}).collect()
    assert len(out) == 100  # default weight 1.0: one copy each
    assert all(r["copy_id"] == 0 for r in out)


def test_repeat_count_rejects_negative_weight():
    from airbyte_spark.functions.sampling import repeat_count

    with pytest.raises(ValueError):
        repeat_count(F.lit(1), -0.5)


def _py_pack(rows, budget):
    rows = sorted(rows)
    out, run = {}, 0
    for oid, w in rows:
        w = max(0, w or 0)
        out[oid] = (run, run // budget)
        run += w
    return out


@pytest.mark.parametrize("n_ranges", [1, 3, 16])
def test_pack_documents_matches_python_prefix_sum(spark, n_ranges):
    rows = [(i, (i * 37) % 90 + 1) for i in range(400)]
    rows[7] = (7, None)  # null weight counts as 0
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["start_offset"], r["bin_id"])
        for r in pack_documents(
            df, "doc_id", "w", budget=512, num_ranges=n_ranges
        ).collect()
    }
    assert got == _py_pack(rows, 512)


def test_pack_documents_bins_and_determinism(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97 + 3).alias("w")
    )
    out = pack_documents(df, "id", "w", budget=1000)
    a = sorted(out.collect())
    b = sorted(out.collect())  # lazy recompute reproduces exactly
    assert a == b
    # bin ids are exactly floor(offset/budget) and non-decreasing in order
    prev = -1
    for r in a:
        assert r["bin_id"] == r["start_offset"] // 1000
        assert r["start_offset"] > prev
        prev = r["start_offset"]


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    weights=st.lists(
        st.one_of(st.integers(0, 500), st.none()), min_size=1, max_size=50
    ),
    budget=st.integers(1, 300),
    n_ranges=st.integers(1, 8),
)
@settings(max_examples=12, deadline=None)
def test_pack_documents_property(spark, weights, budget, n_ranges):
    """pack_documents == the sequential python prefix sum for ANY
    weights (incl. nulls/zeros), budget, and range count."""
    rows = list(enumerate(weights))
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["start_offset"], r["bin_id"])
        for r in pack_documents(
            df, "doc_id", "w", budget=budget, num_ranges=n_ranges
        ).collect()
    }
    assert got == _py_pack(rows, budget)


def test_pack_documents_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, w long")
    assert pack_documents(df, "doc_id", "w", budget=10).count() == 0


def test_assign_splits_group_cohesion_and_proportions(spark):
    """Every row of a group gets the same split; proportions track the
    fractions; assignment is deterministic and seed-sensitive."""
    from airbyte_spark.functions.sampling import assign_splits

    df = spark.range(20000).select(
        F.col("id").alias("row_id"), (F.col("id") % 2000).alias("user_id")
    )
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(df, "user_id", splits, seed="s1")
    per_group = (
        out.groupBy("user_id")
        .agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert per_group == 1  # leakage-safe: one split per group
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.8) < 0.05
    assert abs(counts["val"] / 20000 - 0.1) < 0.03
    # deterministic across invocations, different under another seed
    again = assign_splits(df, "user_id", splits, seed="s1")
    assert out.exceptAll(again).count() == 0
    other = assign_splits(df, "user_id", splits, seed="s2")
    assert out.exceptAll(other).count() > 0


def test_assign_splits_validation(spark):
    from airbyte_spark.functions.sampling import assign_splits

    df = spark.range(4).select(F.col("id").alias("g"))
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "g", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match=">= 0"):
        assign_splits(df, "g", {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="at least two"):
        assign_splits(df, "g", {"a": 1.0})


def test_exact_sample_size_order_and_plan(spark):
    from airbyte_spark.functions.sampling import exact_sample

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    s = exact_sample(df, "doc_id", 100, seed="es")
    rows = s.collect()
    assert len(rows) == 100
    # deterministic: identical across invocations
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in exact_sample(df, "doc_id", 100, seed="es").collect()
    }
    # different seed -> different sample
    assert {r["doc_id"] for r in rows} != {
        r["doc_id"] for r in exact_sample(df, "doc_id", 100, seed="zz").collect()
    }
    # k > n degrades to all rows
    assert exact_sample(df.limit(7), "doc_id", 100).count() == 7
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort
    with pytest.raises(ValueError, match="k must be"):
        exact_sample(df, "doc_id", 0)


def test_balanced_sample_per_stratum_exactness(spark):
    from airbyte_spark.functions.sampling import balanced_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("common").alias("lang"),
    )
    s = balanced_sample(df, "doc_id", "lang", 50, seed="bs")
    counts = {r["lang"]: r["count"] for r in s.groupBy("lang").count().collect()}
    assert counts == {"rare": 50, "common": 50}
    # a stratum smaller than k keeps all its rows
    tiny = balanced_sample(df.filter("doc_id < 25"), "doc_id", "lang", 50)
    got = {r["lang"]: r["count"] for r in tiny.groupBy("lang").count().collect()}
    assert got == {"rare": 3, "common": 22}


@given(
    fracs=st.lists(st.integers(1, 100), min_size=2, max_size=5),
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True),
    seed=st.text(alphabet="abcxyz", max_size=6),
)
@settings(max_examples=12, deadline=None)
def test_split_expr_matches_python_reference(spark, fracs, keys, seed):
    """split_expr == the hashlib replica for ANY normalized fraction
    vector, key set, and seed (band edges included)."""
    from airbyte_spark.functions.sampling import assign_splits

    total = sum(fracs)
    splits = {f"s{i}": f / total for i, f in enumerate(fracs)}
    # renormalize drift so the operator's sum-to-1 check passes
    splits[f"s{len(fracs) - 1}"] += 1.0 - sum(splits.values())

    def py_label(k):
        h = hashlib.md5((str(k) + seed).encode()).hexdigest()[:8]
        cum = 0.0
        for name in list(splits)[:-1]:
            cum += splits[name]
            thr = format(int(min(cum, 1.0 - 1e-12) * 16**8), "08x")
            if h < thr:
                return name
        return list(splits)[-1]

    df = spark.createDataFrame([(k,) for k in keys], "g long")
    got = {
        r["g"]: r["split"]
        for r in assign_splits(df, "g", splits, seed=seed).collect()
    }
    assert got == {k: py_label(k) for k in keys}


def test_samples_exclude_null_keys(spark):
    from airbyte_spark.functions.sampling import balanced_sample, exact_sample

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "a"), (None, "b"), (3, "b")],
        "doc_id long, lang string",
    )
    assert {r["doc_id"] for r in exact_sample(df, "doc_id", 10).collect()} == {1, 2, 3}
    got = {r["doc_id"] for r in balanced_sample(df, "doc_id", "lang", 10).collect()}
    assert got == {1, 2, 3}


def test_split_expr_null_key_goes_to_last_split(spark):
    from airbyte_spark.functions.sampling import assign_splits

    df = spark.createDataFrame([(None,), (1,)], "g long")
    got = {r["g"]: r["split"] for r in
           assign_splits(df, "g", {"train": 0.5, "test": 0.5}).collect()}
    assert got[None] == "test"
