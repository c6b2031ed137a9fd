"""Object-storage format writers/readers (SURVEY.md §2.1 S6-S9).

Mirrors ObjectStorageFormattingWriter.kt:149-252: JSONL (+gzip), CSV with
header + flattening, Avro, Parquet. Binary columns are base64-encoded for
text formats (JSONL/CSV have no binary type — same choice Airbyte's Avro/
JSON serializers make for unknown types: stringify). Avro is gated on the
spark-avro package being present (it ships with the Spark distribution in
this container or not; we degrade to an ImportError-style ValueError).

All writers are `df.write.*` — distributed, one file per task, no driver
row traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructType


def _encode_binary_cols(df: DataFrame) -> DataFrame:
    for f in df.schema.fields:
        if isinstance(f.dataType, BinaryType):
            df = df.withColumn(f.name, F.base64(F.col(f.name)))
    return df


def _flatten_structs(df: DataFrame) -> DataFrame:
    """CSV flattening option (ObjectStorageFormattingWriter.kt:179-210):
    root-level structs become dotted columns; arrays/maps stringify."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, StructType):
            for sub in f.dataType.fields:
                cols.append(F.col(f"{f.name}.{sub.name}").alias(f"{f.name}.{sub.name}"))
        elif f.dataType.typeName() in ("array", "map"):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def write_jsonl(df: DataFrame, path: str, gzip: bool = False) -> None:
    w = _encode_binary_cols(df).write.mode("overwrite")
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_csv(df: DataFrame, path: str, flatten: bool = True) -> None:
    out = _encode_binary_cols(df)
    if flatten:
        out = _flatten_structs(out)
    out.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    r = spark.read.option("header", "true")
    r = r.schema(schema) if schema is not None else r.option("inferSchema", "true")
    return r.csv(path)


def write_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def write_avro(df: DataFrame, path: str, allow_fallback: bool = True) -> None:
    """S8: spark-avro when the jar is present; otherwise the pure-Python
    OCF writer (sources/avro_py.py — same spec, executor-local part
    files). `allow_fallback=False` preserves the hard gate for callers
    that require the JVM writer's codecs."""
    try:
        df.write.mode("overwrite").format("avro").save(path)
    except Exception as e:  # spark-avro jar not on classpath in this container
        if not allow_fallback:
            raise ValueError(
                "avro writer requires the spark-avro package on the classpath"
            ) from e
        from airbyte_spark.sources.avro_py import write_avro_py

        import shutil as _sh

        _sh.rmtree(path, ignore_errors=True)  # mirror mode("overwrite")
        write_avro_py(df, path)
