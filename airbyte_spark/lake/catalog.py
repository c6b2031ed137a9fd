"""Directory-based table catalog over a warehouse root.

Iceberg ``HadoopCatalog`` semantics (the filesystem catalog Airbyte's
S3DataLakeWriter targets when no REST catalog is configured — reference
behavior documented in
``destination-s3-data-lake/src/main/kotlin/.../S3DataLakeWriter.kt:32-63``
and ``docs/integrations/destinations/s3-data-lake.md``): a table IS a
directory containing ``metadata/refs.json`` under the warehouse root, a
namespace IS an intermediate directory, and there is no central registry
file — existence/listing are pure filesystem probes, so concurrent
creators in different namespaces never contend on shared state, and the
catalog itself holds nothing a crash could corrupt. The trade-off is the
same one HadoopCatalog makes: no atomic ``rename_table`` (a directory
move is not atomic on object stores), so rename is intentionally absent.

``maintain_all`` is the warehouse-scale entry point: one maintenance
pass per table (each already checkpointed + staged-branch isolated),
fanned out across a bounded thread pool — tables are independent, so a
1000-table warehouse sweep parallelizes trivially and one table's
failure never blocks the rest (per-table errors are captured, mirroring
ConnectionSync's per-stream INCOMPLETE semantics).
"""

from __future__ import annotations

import os
import re
import shutil
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from airbyte_spark.lake.table import LakeTable

#: one path segment of a table identifier — already-sanitized names only;
#: mapping arbitrary stream names onto this alphabet is NamespaceMapper's
#: job (streaming/namespaces.py::table_identifier)
_SEGMENT = re.compile(r"^[A-Za-z0-9_]+$")


class NoSuchTableError(KeyError):
    """load/drop of a table the warehouse does not contain."""


class TableAlreadyExistsError(ValueError):
    """create_table over an existing table directory."""


def _segments(identifier: str | tuple | list) -> list[str]:
    parts = (
        identifier.split(".")
        if isinstance(identifier, str)
        else list(identifier)
    )
    if not parts or not all(_SEGMENT.match(p or "") for p in parts):
        raise ValueError(
            f"invalid table identifier {identifier!r}: dot-separated "
            "[A-Za-z0-9_]+ segments (sanitize stream names through "
            "NamespaceMapper.table_identifier first)"
        )
    return parts


class Catalog:
    """Namespace -> LakeTable resolution rooted at ``warehouse``."""

    def __init__(self, spark: SparkSession | None, warehouse: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    # -- path mapping ---------------------------------------------------
    def table_path(self, identifier) -> str:
        return os.path.join(self.warehouse, *_segments(identifier))

    @staticmethod
    def _is_table_dir(path: str) -> bool:
        return os.path.exists(os.path.join(path, "metadata", "refs.json"))

    # -- table lifecycle ------------------------------------------------
    def create_table(
        self,
        identifier,
        schema: StructType,
        primary_key: list[str],
        **create_kwargs,
    ) -> LakeTable:
        path = self.table_path(identifier)
        if self._is_table_dir(path):
            raise TableAlreadyExistsError(str(identifier))
        return LakeTable.create(
            self.spark, path, schema, primary_key=primary_key,
            **create_kwargs,
        )

    def load_table(self, identifier) -> LakeTable:
        path = self.table_path(identifier)
        if not self._is_table_dir(path):
            raise NoSuchTableError(str(identifier))
        return LakeTable(self.spark, path)

    def table_exists(self, identifier) -> bool:
        return self._is_table_dir(self.table_path(identifier))

    def drop_table(self, identifier, purge: bool = False) -> None:
        """purge=True removes the whole table directory (metadata AND
        data); purge=False unlinks only the metadata tree, leaving data
        files in place for external readers — Iceberg's
        ``dropTable(ident, purge)`` split."""
        path = self.table_path(identifier)
        if not self._is_table_dir(path):
            raise NoSuchTableError(str(identifier))
        shutil.rmtree(path if purge else os.path.join(path, "metadata"))

    # -- listing ----------------------------------------------------------
    def list_tables(self, namespace: str | None = None) -> list[str]:
        """Dotted identifiers of every table under ``namespace`` (all
        namespaces when None), discovered by walking for
        ``metadata/refs.json`` markers — never descending INTO a table
        directory (its data/ tree can be huge)."""
        base = (
            os.path.join(self.warehouse, *_segments(namespace))
            if namespace
            else self.warehouse
        )
        found: list[str] = []
        for dirpath, dirnames, _ in os.walk(base):
            if self._is_table_dir(dirpath):
                rel = os.path.relpath(dirpath, self.warehouse)
                found.append(rel.replace(os.sep, "."))
                dirnames[:] = []  # don't walk the table's own subtree
        return sorted(found)

    def list_namespaces(self) -> list[str]:
        """First-level namespaces (directories that are not themselves
        tables)."""
        out = []
        for name in sorted(os.listdir(self.warehouse)):
            p = os.path.join(self.warehouse, name)
            if os.path.isdir(p) and not self._is_table_dir(p):
                out.append(name)
        return out

    # -- warehouse-wide maintenance ---------------------------------------
    def maintain_all(
        self,
        job_id: str,
        sources: dict[str, DataFrame] | None = None,
        max_concurrent: int = 4,
        continue_on_error: bool = True,
        **maintenance_kwargs,
    ) -> dict[str, object]:
        """One run_maintenance pass per table in the warehouse, fanned out
        over ``max_concurrent`` threads (each table's pass is internally
        staged+checkpointed, so re-running with the same job_id resumes).
        ``sources`` optionally maps identifier -> merge-source DataFrame.
        Returns identifier -> MaintenanceReport, or the raised exception
        when continue_on_error captured one."""
        from airbyte_spark.operators.maintenance import run_maintenance

        idents = self.list_tables()

        def one(ident: str):
            try:
                return ident, run_maintenance(
                    self.load_table(ident),
                    job_id=f"{job_id}-{ident}",
                    merge_source=(sources or {}).get(ident),
                    **maintenance_kwargs,
                )
            except Exception as exc:  # noqa: BLE001 - per-table isolation
                if not continue_on_error:
                    raise
                return ident, exc

        with ThreadPoolExecutor(max_workers=max(1, max_concurrent)) as ex:
            return dict(ex.map(one, idents))
