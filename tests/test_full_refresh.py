"""Resumable Full Refresh — artificial-cursor chunked scans
(docs/platform/understanding-airbyte/resumability.md)."""

import pytest
from pyspark.sql import functions as F

from airbyte_spark.sources.full_refresh import (
    FullRefreshState,
    chunk_filter,
    chunks,
    plan_full_refresh,
    run_resumable_full_refresh,
)


@pytest.fixture()
def table(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("pk"), (F.col("id") * 2).alias("v")
    )


def test_chunks_cover_table_exactly_once(table):
    st = plan_full_refresh(table, ["pk"], target_rows_per_chunk=200)
    assert st.n_chunks > 1
    seen = []
    for chunk_df, _ in chunks(table, st):
        seen.extend(r["pk"] for r in chunk_df.collect())
    assert sorted(seen) == list(range(1000))  # disjoint + complete


def test_explicit_boundaries_and_ranges(table):
    st = plan_full_refresh(table, ["pk"], 0, boundaries=[(300,), (600,)])
    got = [sorted(r["pk"] for r in c.collect()) for c, _ in chunks(table, st)]
    assert [g[0] for g in got] == [0, 300, 600]
    assert [g[-1] for g in got] == [299, 599, 999]


def test_resume_skips_committed_and_resends_partial(table):
    st = plan_full_refresh(table, ["pk"], 0, boundaries=[(300,), (600,)])
    delivered = []

    def deliver(chunk_df, i):
        if i == 1 and len(delivered) == 1:
            # simulate dying mid-chunk AFTER partial delivery
            delivered.append(("partial", i, chunk_df.count()))
            raise RuntimeError("executor lost")
        delivered.append(("full", i, chunk_df.count()))

    with pytest.raises(RuntimeError):
        run_resumable_full_refresh(table, st, deliver)
    committed = FullRefreshState(st.pk_cols, st.boundaries, next_chunk=1)
    # resume from last COMMITTED state: chunk 1 re-sent (at-least-once)
    final = run_resumable_full_refresh(table, committed, deliver)
    assert final.done
    assert [d[1] for d in delivered] == [0, 1, 1, 2]  # chunk 1 twice


def test_state_roundtrips_json(table):
    st = plan_full_refresh(table, ["pk"], 0, boundaries=[(300,), (600,)])
    st2 = FullRefreshState.from_json(st.to_json())
    assert st2 == st


def test_composite_pk_chunks_are_disjoint(spark):
    df = spark.createDataFrame(
        [(a, b) for a in range(10) for b in range(10)], "a int, b int"
    )
    st = plan_full_refresh(df, ["a", "b"], 0, boundaries=[(3, 5), (7, 2)])
    got = [sorted((r["a"], r["b"]) for r in c.collect()) for c, _ in chunks(df, st)]
    assert sum(len(g) for g in got) == 100
    assert got[0][-1] == (3, 4) and got[1][0] == (3, 5)
    assert got[1][-1] == (7, 1) and got[2][0] == (7, 2)


def test_requires_primary_key(table):
    with pytest.raises(ValueError, match="primary key"):
        plan_full_refresh(table, [], 100)


def test_chunk_filter_pushed_to_scan(spark, tmp_table_dir):
    spark.range(0, 1000).select(F.col("id").alias("pk")).write.parquet(
        f"{tmp_table_dir}/t"
    )
    df = spark.read.parquet(f"{tmp_table_dir}/t")
    st = plan_full_refresh(df, ["pk"], 0, boundaries=[(500,)])
    plan = (
        df.filter(chunk_filter(st, 1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(pk), GreaterThanOrEqual(pk,500)]" in plan
