"""`check` operation — destination connectivity validation.

The reference's CHECK lifecycle (CheckOperation.kt:18-41): run the
destination checker, emit a CONNECTION_STATUS message with SUCCEEDED, or
FAILED with the error message. The lakehouse checker
(S3DataLakeChecker.kt:50-106) validates catalog + storage access by
creating a uniquely-named probe table (UUID suffix so concurrent checks
and stale metadata can't conflict) with the fixed two-field schema
(id:int required, data:string optional), and ALWAYS cleans it up via
try/finally, even when creation fails half-way.

Ours additionally writes and reads back one probe row — the destination
must prove append + scan round-trip, not just namespace create (a
catalog can be reachable while the data prefix is read-only)."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from airbyte_spark.lake.table import LakeTable

#: S3DataLakeChecker.kt:79-83 probe schema
CHECK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), nullable=False),
        T.StructField("data", T.StringType(), nullable=True),
    ]
)


def check_destination(
    spark: SparkSession,
    lake_root: str,
    namespace: str | None = None,
    table_properties: dict | None = None,
) -> dict:
    """Returns the CONNECTION_STATUS payload:
    ``{"status": "SUCCEEDED"}`` or ``{"status": "FAILED", "message": ...}``.
    Never raises — a check failure IS the result (CheckOperation.kt:36-38
    logs and reports; the probe table is removed either way).

    `table_properties` is the user's engine-property config; it is
    validated against the spec registry (lake/spec.py) BEFORE any storage
    probe, so a typo'd property fails the check as a config_error without
    touching the destination — the platform's validate-config-against-spec
    step that precedes every check."""
    from airbyte_spark.lake.spec import validate_table_properties
    from airbyte_spark.streaming.traces import error_trace

    prop_errors = validate_table_properties(table_properties or {})
    if prop_errors:
        from airbyte_spark.lake.spec import ConfigValidationError

        exc = ConfigValidationError(prop_errors)
        return {
            "status": "FAILED",
            "message": f"{type(exc).__name__}: {exc}",
            "trace": error_trace(None, exc),
            "config_errors": prop_errors,
        }
    probe_name = f"_airbyte_check_{uuid.uuid4().hex}"
    parts = [lake_root] + ([namespace] if namespace else []) + [probe_name]
    probe_root = os.path.join(*parts)
    try:
        table = LakeTable.create(
            spark, probe_root, CHECK_SCHEMA, primary_key=["id"]
        )
        table.append(spark.createDataFrame([(1, "check")], CHECK_SCHEMA))
        rows = table.scan().collect()
        if [(r["id"], r["data"]) for r in rows] != [(1, "check")]:
            raise RuntimeError(f"probe round-trip mismatch: {rows}")
        return {"status": "SUCCEEDED"}
    except Exception as e:  # noqa: BLE001 — the status message IS the report
        from airbyte_spark.streaming.traces import error_trace

        return {
            "status": "FAILED",
            "message": f"{type(e).__name__}: {e}",
            # typed ERROR trace, same shape ConnectionSync records
            # (protocol trace section: failureType tells a config error
            # from a system error without reading logs)
            "trace": error_trace(None, e),
        }
    finally:
        shutil.rmtree(probe_root, ignore_errors=True)
