"""Manifest-tracked Parquet lakehouse table format.

A minimal, from-scratch Iceberg-like table layer: immutable snapshots, JSON
manifests carrying per-file row/byte counts and min/max column stats,
named branches with atomic swap (the staging-branch isolation pattern of
destination-s3-data-lake/.../S3DataLakeStreamLoader.kt:74-133), snapshot
expiry, and reachability-based orphan-file GC
(IcebergTableCleaner.kt:33-72 semantics).

No Iceberg runtime jars exist in this container; at deploy time the same
operator code paths can commit through the real Iceberg Spark runtime —
the operators only touch the LakeTable interface.
"""

from airbyte_spark.lake.format import DataFileEntry, Snapshot, TableMetadata
from airbyte_spark.lake.table import LakeTable

__all__ = ["DataFileEntry", "Snapshot", "TableMetadata", "LakeTable"]
