"""Field selection (CatalogClientConverters.kt:45-100 semantics)."""

import pytest

from airbyte_spark.sources.fieldselect import FieldSelectionError, select_fields


@pytest.fixture()
def stream(spark):
    return spark.createDataFrame(
        [(1, "a", "x", 1.0)], "id int, name string, payload string, v double"
    )


def test_projects_in_stream_order(stream):
    out = select_fields(stream, [["name"], ["id"]])
    assert out.columns == ["id", "name"]  # stream order, not selection order


def test_none_selection_rejected(stream):
    with pytest.raises(FieldSelectionError, match="no selected fields"):
        select_fields(stream, None)


def test_empty_path_rejected(stream):
    with pytest.raises(FieldSelectionError, match="cannot be empty"):
        select_fields(stream, [[]])


def test_nested_path_unsupported(stream):
    with pytest.raises(FieldSelectionError, match="Nested"):
        select_fields(stream, [["meta", "inner"]])


def test_cursor_cannot_be_deselected_incremental(stream):
    with pytest.raises(FieldSelectionError, match="Cursor"):
        select_fields(
            stream, [["id"]], sync_mode="incremental", cursor_field=["v"]
        )
    out = select_fields(
        stream, [["id"], ["v"]], sync_mode="incremental", cursor_field=["v"]
    )
    assert out.columns == ["id", "v"]


def test_pk_cannot_be_deselected_in_dedup(stream):
    with pytest.raises(FieldSelectionError, match="Primary key"):
        select_fields(stream, [["name"]], primary_key=[["id"]], dedup=True)


def test_unknown_field_rejected(stream):
    with pytest.raises(FieldSelectionError, match="not in stream schema"):
        select_fields(stream, [["nope"]])


def test_projection_reaches_the_scan(spark, tmp_table_dir):
    spark.createDataFrame(
        [(1, "a", "B" * 100)], "id int, name string, payload string"
    ).write.parquet(f"{tmp_table_dir}/t")
    df = spark.read.parquet(f"{tmp_table_dir}/t")
    plan = (
        select_fields(df, [["id"], ["name"]])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "payload" not in plan  # pruned out of ReadSchema
