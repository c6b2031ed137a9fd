"""Cluster-level dedup (functions/dedup.py::connected_components /
dedup_representatives): near-dup candidate PAIRS -> duplicate CLUSTERS
via distributed min-label propagation, one representative kept per
cluster."""


def test_connected_components_chains_and_singletons(spark):
    from airbyte_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 6)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["comp"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        5: 5, 6: 5,
    }


def test_connected_components_long_path_converges(spark):
    """A path graph is the worst case for min propagation (diameter =
    n-1); localCheckpoint keeps the plan bounded across rounds."""
    from airbyte_spark.functions.dedup import connected_components

    n = 30
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    got = connected_components(pairs, max_iterations=40).collect()
    assert all(r["comp"] == 0 for r in got) and len(got) == n + 1


def test_connected_components_string_and_hash_sized_ids(spark):
    """Convergence must not depend on summing the label column: string
    doc ids can't be summed at all, and xxhash64-derived long ids
    overflow a long SUM under ANSI mode (regression for the exact
    changed-label probe)."""
    from airbyte_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("doc_x", "doc_y")],
        "id_a string, id_b string",
    )
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {
        "doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a",
        "doc_x": "doc_x", "doc_y": "doc_x",
    }
    big = 2**63 - 1  # two of these in one component would overflow SUM
    pairs = spark.createDataFrame(
        [(big, big - 1), (big - 1, big - 2), (-big, -big + 1)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {
        big: big - 2, big - 1: big - 2, big - 2: big - 2,
        -big: -big, -big + 1: -big,
    }


def test_connected_components_nonconvergence_raises(spark):
    from airbyte_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=2)


def test_dedup_representatives_chain_keeps_exactly_one(spark):
    """Pair-level dedup on a chain A-B-C either over- or under-keeps;
    cluster-level keeps exactly the min id, and unpaired docs survive."""
    from airbyte_spark.functions.dedup import dedup_representatives

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in dedup_representatives(docs, pairs).collect())
    assert kept == [0, 1, 4, 5, 7]
