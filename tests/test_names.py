"""Name sanitization (Transformations.kt:20-66) + the Avro writer gate's
error path (S8 — spark-avro jar absent in this container)."""

import pytest

from airbyte_spark.functions.names import (
    to_alphanumeric_and_underscore,
    to_avro_safe_name,
    to_avro_safe_namespace,
    to_azure_blob_safe_path,
    to_s3_safe_characters,
)


def test_alphanumeric_and_underscore():
    # unicode NFKD + combining-mark strip, whitespace + punctuation -> '_'
    # NFKD strips the umlaut's combining mark; ß does NOT decompose under
    # NFKD (same in Java's Normalizer) so it falls to '_'
    assert to_alphanumeric_and_underscore("Müller Straße") == "Muller_Stra_e"
    assert to_alphanumeric_and_underscore("café-menu") == "cafe_menu"
    assert to_alphanumeric_and_underscore("a  b\tc") == "a_b_c"
    assert to_alphanumeric_and_underscore("order:items,v2") == "order_items_v2"
    assert to_alphanumeric_and_underscore("héllo_wörld") == "hello_world"


def test_avro_safe_name_leading_digit():
    assert to_avro_safe_name("2fast2furious") == "_2fast2furious"
    assert to_avro_safe_name("_ok") == "_ok"
    assert to_avro_safe_name("Ok name") == "Ok_name"
    assert to_avro_safe_name("") == "_"
    assert to_avro_safe_name("9") == "_9"


def test_avro_safe_namespace():
    assert to_avro_safe_namespace("com.example.my-app") == "com.example.my_app"
    assert to_avro_safe_namespace("a.b.") == "a.b"
    assert to_avro_safe_namespace("1a.b c") == "1a.b_c"


def test_s3_safe_characters():
    # S3-safe set includes / ! _ . * ' ) ( and the special set &$@=;:+,?-
    assert to_s3_safe_characters("path/to/fïle.txt") == "path/to/file.txt"
    assert to_s3_safe_characters("a b") == "a_b"
    assert to_s3_safe_characters("x%y#z") == "x_y_z"
    assert to_s3_safe_characters("k=v;q?r-s") == "k=v;q?r-s"  # specials kept


def test_azure_trailing_dots():
    assert to_azure_blob_safe_path("dir.../file...") == "dir_/file_"
    assert to_azure_blob_safe_path("ok/also.ok") == "ok/also.ok"


def test_avro_gate_error_path(spark, tmp_table_dir):
    """S8: without the spark-avro jar, the hard-gated mode must fail with
    the gated ValueError, not an opaque Py4J stack."""
    from airbyte_spark.sources.files import write_avro

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError, match="spark-avro"):
        write_avro(df, f"{tmp_table_dir}/avro-out", allow_fallback=False)
