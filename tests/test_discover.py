"""`discover` operation — catalog discovery over parquet sources and lake
roots (DiscoverOperation.kt:16-49; type vocabulary
supported-data-types.md:13-26)."""

import os

import pytest

from airbyte_spark.datagen import IMAGES_SCHEMA, generate_images
from airbyte_spark.lake.discover import (
    catalog_df,
    discover_lake,
    discover_parquet_source,
    spark_type_to_json_type,
)
from airbyte_spark.lake.table import LakeTable

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_parquet_source_discovers_all_streams(spark):
    streams = discover_parquet_source(spark, SF_DIR)
    names = [s.name for s in streams]
    assert names == sorted(names)  # deterministic order
    for expected in ("region", "nation", "customer", "orders", "lineitem",
                     "events", "documents", "embeddings"):
        assert expected in names
    ev = next(s for s in streams if s.name == "events")
    by_name = {f.name: f for f in ev.fields}
    assert by_name["event_id"].json_type == "integer"
    assert by_name["value"].json_type == "number"
    assert by_name["event_type"].json_type == "string"
    assert by_name["ts"].json_type == "timestamp_without_timezone"
    # positions are 1-based source column order
    assert [f.position for f in ev.fields] == list(range(1, len(ev.fields) + 1))
    emb = next(s for s in streams if s.name == "embeddings")
    assert {f.name: f.json_type for f in emb.fields}["embedding"] == "array"
    # parquet sources define no PK
    assert ev.primary_key == []


def test_empty_and_unreadable_streams_are_skipped(spark, tmp_table_dir):
    import shutil

    src = os.path.join(SF_DIR, "region.parquet")
    shutil.copy(src, os.path.join(tmp_table_dir, "good.parquet"))
    with open(os.path.join(tmp_table_dir, "broken.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    with open(os.path.join(tmp_table_dir, "notes.txt"), "w") as f:
        f.write("ignored")
    streams = discover_parquet_source(spark, tmp_table_dir)
    assert [s.name for s in streams] == ["good"]


def test_lake_discover_reports_pk_and_cursor(spark, tmp_table_dir):
    root = os.path.join(tmp_table_dir, "lake")
    os.makedirs(root)
    t = LakeTable.create(
        spark, os.path.join(root, "images"), IMAGES_SCHEMA,
        primary_key=["image_id"],
    )
    t.append(generate_images(spark, 5, num_partitions=1))
    streams = discover_lake(spark, root)
    assert len(streams) == 1
    s = streams[0]
    assert (s.namespace, s.name) == ("lake", "images")
    assert s.primary_key == ["image_id"]
    assert s.source_defined_cursor == "_airbyte_extracted_at"
    types = {f.name: f.json_type for f in s.fields}
    assert types["bytes"] == "string"  # binary -> base64 string (protocol)
    assert types["phash"] == "integer"
    assert types["_airbyte_extracted_at"] == "timestamp_with_timezone"


def test_catalog_df_flattens_with_pk_flag(spark, tmp_table_dir):
    root = os.path.join(tmp_table_dir, "lake")
    os.makedirs(root)
    t = LakeTable.create(
        spark, os.path.join(root, "imgs"), IMAGES_SCHEMA,
        primary_key=["image_id"],
    )
    t.append(generate_images(spark, 3, num_partitions=1))
    df = catalog_df(spark, discover_lake(spark, root))
    rows = {r["field"]: r for r in df.collect()}
    assert rows["image_id"]["is_pk"] is True
    assert rows["caption"]["is_pk"] is False
    assert df.count() == len(IMAGES_SCHEMA.fields)


@pytest.mark.parametrize(
    "ddl,expected",
    [
        ("a int", "integer"), ("a bigint", "integer"), ("a double", "number"),
        ("a decimal(10,2)", "number"), ("a string", "string"),
        ("a binary", "string"), ("a boolean", "boolean"), ("a date", "date"),
        ("a timestamp", "timestamp_with_timezone"),
        ("a timestamp_ntz", "timestamp_without_timezone"),
        ("a array<int>", "array"), ("a struct<x:int>", "object"),
        ("a map<string,int>", "object"),
    ],
)
def test_json_type_mapping(ddl, expected):
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(ddl)
    assert spark_type_to_json_type(schema.fields[0].dataType) == expected
