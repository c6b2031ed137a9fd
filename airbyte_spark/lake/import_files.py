"""In-place parquet import (Iceberg `add_files` / `migrate` analog):
register EXISTING parquet files into a lake table as a metadata-only
commit — per-file footer stats, optional bloom sidecars, zero data
movement. At 100 TB this is the onboarding story: a day-one user points
the engine at their existing parquet estate and gets snapshots, MERGE,
time travel, and maintenance without rewriting a byte; the commit cost
is O(files) footer reads fanned out on executors (lake/stats.py), never
a data pass.

Contracts (each one is the difference between "works at demo scale" and
"silently corrupts at 100 TB"):

- **Schema validation is strict, per file, from footers.** Files are
  stamped with the CURRENT schema id, and the JVM parquet reader fails
  (or worse, silently mis-prunes) when physical types diverge from the
  read schema (PARQUET_COLUMN_DATA_TYPE_MISMATCH — CLAUDE.md gotcha 22).
  Every registered column present in a file must match its arrow type
  (timestamps: tz-ness must agree, unit is free; string/large_string and
  binary/large_binary unify); a registered column a file lacks must be
  nullable AND be neither a primary-key column nor a partition source —
  null-padding a PK would poison merge identity, and null-padding a
  partition source would contradict the layout value next to it.

- **Imported files are never deleted.** Orphan GC lists only the
  table's own data_dir, so external files a later rewrite strands stay
  on disk untouched (they are the user's files — the Iceberg add_files
  caveat, documented rather than "fixed"). Paths already under data_dir
  are refused: those are engine-managed and would double-register.

- **Partition values come from the layout only when they are also in
  the file.** Identity partition sources found as Hive `col=value` dir
  segments populate `entry.partition` for pruning; transformed fields
  (lake/transforms.py) can never be trusted from a foreign layout and
  stay unset — such entries read as pre-evolution files (row-level
  enforcement, lazily migrated by maintenance rewrites). Files are
  required to physically carry their partition-source columns because
  this engine's read path treats files as self-contained (the writer
  stores real columns alongside `_p_*` dirs for the same reason).

Reference anchor: Iceberg SparkActions `add_files` / `migrate`
procedures; the reference's destinations assume Iceberg-managed tables
and get this from the library.
"""

from __future__ import annotations

import glob as _glob
import os

from airbyte_spark.lake.format import DataFileEntry, Snapshot
from airbyte_spark.lake.stats import collect_file_entries
from airbyte_spark.lake.table import MAIN, LakeTable


def _resolve_paths(paths) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            found = _glob.glob(
                os.path.join(paths, "**", "*.parquet"), recursive=True
            )
        else:
            found = _glob.glob(paths)
        paths = found
    out = sorted({os.path.abspath(p) for p in paths})
    if not out:
        raise ValueError("add_files: no parquet files to import")
    return out


def _type_compatible(ft, et) -> bool:
    import pyarrow as pa

    if ft.equals(et):
        return True
    if pa.types.is_timestamp(ft) and pa.types.is_timestamp(et):
        return (ft.tz is None) == (et.tz is None)
    if pa.types.is_string(ft) or pa.types.is_large_string(ft):
        return pa.types.is_string(et) or pa.types.is_large_string(et)
    if pa.types.is_binary(ft) or pa.types.is_large_binary(ft):
        return pa.types.is_binary(et) or pa.types.is_large_binary(et)
    return False


def _file_schema_errors(
    path: str, expected, pk: set[str], part_sources: set[str]
) -> list[str]:
    """Validate one file footer against the registered arrow schema.
    Runs on executors — must not touch any SparkSession."""
    import pyarrow.parquet as pq

    fs = pq.read_schema(path)
    errs = []
    for ef in expected:
        idx = fs.get_field_index(ef.name)
        if idx == -1:
            if ef.name in pk:
                errs.append(f"missing primary-key column {ef.name!r}")
            elif ef.name in part_sources:
                errs.append(f"missing partition-source column {ef.name!r}")
            elif not ef.nullable:
                errs.append(f"missing non-nullable column {ef.name!r}")
            continue
        ft = fs.field(idx).type
        if not _type_compatible(ft, ef.type):
            errs.append(
                f"column {ef.name!r}: file type {ft} incompatible with "
                f"registered {ef.type}"
            )
    return errs


def _hive_partition_values(path: str, identity_sources: set[str]) -> dict:
    """Identity partition values from Hive-style `col=value` dir
    segments (the foreign-layout twin of table._partition_values, which
    reads this engine's own `_p_<field>=` convention)."""
    from urllib.parse import unquote

    out: dict = {}
    for seg in path.split(os.sep)[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in identity_sources:
                out[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
                )
    return out


def add_files(
    table: LakeTable,
    paths,
    branch: str = MAIN,
    partition_from_layout: bool = True,
    attach_blooms: bool | None = None,
    generation_id: int = 0,
) -> Snapshot:
    """Register existing parquet files into `table` (metadata-only
    commit, operation "add-files"). `paths` is a list of files, a
    directory (recursed), or a glob. See module docstring for the
    validation / GC / partition contracts."""
    from pyspark.sql.pandas.types import to_arrow_schema

    paths = _resolve_paths(paths)
    data_root = os.path.abspath(table.data_dir) + os.sep
    inside = [p for p in paths if p.startswith(data_root)]
    if inside:
        raise ValueError(
            f"add_files: {len(inside)} path(s) are under the table's own "
            f"data dir (engine-managed; would double-register): {inside[:3]}"
        )
    live = {e.path for e in table.all_files(branch=branch)}
    dupes = [p for p in paths if p in live]
    if dupes:
        raise ValueError(
            f"add_files: {len(dupes)} path(s) already live in the table: "
            f"{dupes[:3]}"
        )

    schema = table.schema(branch=branch)
    expected = to_arrow_schema(schema)
    pk = set(table.primary_key)
    fields = table.partition_fields()
    part_sources = {f.source for f in fields}
    identity_sources = {f.source for f in fields if f.transform == "identity"}

    # footer-schema validation, distributed past a driver-friendly batch
    if len(paths) <= 16:
        failures = [
            (p, errs)
            for p in paths
            if (errs := _file_schema_errors(p, expected, pk, part_sources))
        ]
    else:
        sc = table.spark.sparkContext
        n_slices = min(len(paths), sc.defaultParallelism * 2)
        failures = (
            sc.parallelize(paths, n_slices)
            .map(
                lambda p: (p, _file_schema_errors(p, expected, pk, part_sources))
            )
            .filter(lambda t: bool(t[1]))
            .collect()
        )
    if failures:
        lines = "; ".join(f"{p}: {', '.join(errs)}" for p, errs in failures[:5])
        raise ValueError(
            f"add_files: {len(failures)} file(s) failed schema validation "
            f"against the registered schema — {lines}"
        )

    entries = collect_file_entries(
        table.spark,
        paths,
        table.stats_columns,
        generation_id,
        schema_id=table.current_schema_id,
    )
    # empty files carry no data and would defeat manifest pruning — but
    # they are the USER's files: excluded, never deleted
    entries = [e for e in entries if e.rows > 0]
    if partition_from_layout and identity_sources:
        for e in entries:
            e.partition = _hive_partition_values(e.path, identity_sources)

    if attach_blooms is None:
        attach_blooms = str(
            table.properties.get("write.pk-bloom.enabled", "true")
        ).lower() in ("true", "1")
    if attach_blooms and pk and entries:
        table._attach_pk_blooms(entries)

    return table.commit(
        "add-files",
        entries,
        branch=branch,
        summary={
            "imported-files": len(entries),
            "imported-bytes": sum(e.bytes for e in entries),
            "source-prefix": os.path.commonpath(paths) if len(paths) > 1 else paths[0],
        },
    )


def snapshot_table(
    src: LakeTable,
    root: str,
    branch: str = MAIN,
    snapshot_id: str | None = None,
    properties: dict | None = None,
) -> LakeTable:
    """Shallow zero-copy table from another table's live files (Iceberg
    `snapshot` procedure): a NEW independent lake table at `root` whose
    first commit references `src`'s data files in place — schema, primary
    key, partition spec, and per-file stats/partition/bloom metadata all
    carried over, no data movement. The copy then evolves independently
    (its rewrites land under its own data_dir).

    Sequence semantics: position deletes apply by exact PATH (not
    sequence), so live position tombstones clone safely into the first
    commit. Live EQUALITY deletes are refused — their meaning depends on
    the source's commit-sequence lattice, which a single-commit clone
    cannot reproduce; fold them first (rewrite_deletes /
    retire_equality_deletes) and re-run.

    GC caveat (same as Iceberg's): the clone references files the SOURCE
    table owns. The clone's own orphan GC never touches them (it lists
    only its own data_dir), but the source's expire+GC can delete files
    the clone still needs — treat the source as retention-pinned while
    clones exist."""
    snap = src.snapshot(snapshot_id, branch)
    live = src.all_files(branch=branch, snapshot_id=snap.snapshot_id)
    eq = [e for e in live if e.content == "equality-deletes"]
    if eq:
        raise ValueError(
            f"snapshot_table: source has {len(eq)} live equality-delete "
            "file(s); their sequence semantics cannot be cloned — fold them "
            "first (operators/deletes.py rewrite_deletes or "
            "posdeletes.retire_equality_deletes)"
        )
    props = dict(src.properties)
    props.update(properties or {})
    t = LakeTable.create(
        src.spark,
        root,
        src.schema(branch=branch, snapshot_id=snap.snapshot_id),
        primary_key=list(src.primary_key),
        stats_columns=list(src.stats_columns),
        properties=props,
        partition_by=list(src.partition_by),
    )
    # cloned entries keep their write-time schema_id and sort_order_id
    # stamps — inherit the source's registries so mixed-era files read
    # aligned and clustered files stay recognized as clean
    from airbyte_spark.lake.format import atomic_write_json
    from airbyte_spark.lake.table import _refs_lock

    src_tbl = src._refs()["table"]
    with _refs_lock(t.root):
        refs = t._refs()
        for key in (
            "schemas",
            "current_schema_id",
            "sort_orders",
            "next_sort_order_id",
            "partition_spec_history",
        ):
            if key in src_tbl:
                refs["table"][key] = src_tbl[key]
        atomic_write_json(os.path.join(t.meta_dir, "refs.json"), refs)
    clones = []
    for e in live:
        c = DataFileEntry.from_json(e.to_json())
        c.sequence = None  # restamped into the clone's own lattice
        clones.append(c)
    t.commit(
        "snapshot-table",
        clones,
        summary={
            "source-root": src.root,
            "source-snapshot": snap.snapshot_id,
            "files": len(clones),
        },
    )
    return t


def migrate_parquet_dir(
    spark,
    src_dir: str,
    root: str,
    primary_key: list[str],
    properties: dict | None = None,
    partition_by: list[str] | None = None,
) -> LakeTable:
    """Create a lake table at `root` whose schema is read from the flat
    parquet directory `src_dir`, then add_files its files in place
    (Iceberg `migrate` without the catalog rename). Hive-partitioned
    sources whose files do not physically carry the partition columns
    are rejected by add_files' validation — rewrite those through
    append() instead."""
    df = spark.read.parquet(src_dir)
    t = LakeTable.create(
        spark,
        root,
        df.schema,
        primary_key=primary_key,
        properties=properties,
        partition_by=partition_by,
    )
    add_files(t, src_dir)
    return t
