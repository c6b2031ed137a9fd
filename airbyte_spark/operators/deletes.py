"""Fold equality-delete files into data files (MoR -> clean CoW state).

The analog of Iceberg's rewrite-data-files with delete compaction: after a
run of merge-on-read batches, data files older than live delete files still
carry logically-deleted rows that every scan must anti-join away. This
operator rewrites exactly the AFFECTED data files (manifest key-range
intersection against the delete files' key stats) with the deletes applied,
then drops every delete entry in the same atomic commit.

Dropping all deletes is safe: any data file left unrewritten either has a
commit sequence >= every delete file (no delete applies to it), or its
PK range does not intersect any applicable delete file's range (range
intersection is a superset of key membership).

File layout is preserved: each victim file maps to one output file via the
same input_file_name() -> id map used by compaction, so the fold never
degrades the table's size distribution or clustering.

Reference anchor: the reference leaves delete compaction to the Iceberg
maintenance engine (docs/integrations/destinations/s3-data-lake.md:359-369);
this module is that engine's rewriteDataFiles(delete-compaction) role.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import functions as F

from airbyte_spark.lake.format import DataFileEntry, Snapshot
from airbyte_spark.lake.table import (
    MAIN,
    LakeTable,
    _intersects,
    apply_equality_deletes,
)
from airbyte_spark.operators.fileid import tail_map


@dataclass
class DeleteFoldResult:
    snapshot: Snapshot | None
    rewritten_files: int
    dropped_delete_files: int


def _ranges_intersect(a: dict | None, b: dict | None) -> bool:
    """Conservative: missing stats on either side -> assume intersecting
    (delegates to the manifest-pruning predicate, lake/table.py)."""
    if not b or b.get("min") is None:
        return True
    return _intersects(a, b["min"], b["max"])


def rewrite_deletes(
    table: LakeTable,
    branch: str = MAIN,
) -> DeleteFoldResult:
    """Rewrite delete-affected data files with deletes applied; drop all
    delete entries atomically. No-op when the table has no delete files."""
    deletes = table.delete_files(branch=branch)
    pos_deletes = table.position_delete_files(branch=branch)
    if not deletes and not pos_deletes:
        return DeleteFoldResult(None, 0, 0)
    planned_parent = table.current_snapshot_id(branch)
    pk = table.primary_key
    pk0 = pk[0]
    data = table.data_files(branch=branch)
    from airbyte_spark.operators.cluster import pos_ref_union

    pref = pos_ref_union(pos_deletes) if pos_deletes else set()
    victims = [
        e
        for e in data
        if any(
            (d.sequence or 0) > (e.sequence or 0)
            and _ranges_intersect(e.stats.get(pk0), d.stats.get(pk0))
            for d in deletes
        )
        # position deletes name exact files; folding every referenced file
        # lets the commit drop ALL tombstone entries (None inventory means
        # "unknown" -> every data file joins the rewrite)
        or (pos_deletes and (pref is None or e.path in pref))
    ]
    new_entries: list[DataFileEntry] = []
    if victims:
        spark = table.spark
        # per-victim-file identity: one output file per input file keeps the
        # size/clustering layout intact (<dir>/<file>-keyed map literal,
        # operators/fileid.py). Victims are read and written in their
        # PHYSICAL schema and the new entries keep the victims' schema_id
        # AND generation_id — this is a row-removal rewrite, not a schema
        # migration or a refresh.
        orders = table.sort_orders()
        by_schema: dict[tuple[int, int, int], list[DataFileEntry]] = {}
        for e in victims:
            by_schema.setdefault(
                (e.schema_id, e.generation_id, e.sort_order_id), []
            ).append(e)
        for (sid, gen, oid), group in sorted(by_schema.items()):
            physical = table.registered_schema(sid)
            df = (
                spark.read.schema(physical)
                .parquet(*[e.path for e in group])
                .withColumn(
                    "_fold_bin",
                    tail_map({e.path: i for i, e in enumerate(group)}),
                )
                .withColumn(
                    "_mor_seq",
                    tail_map({e.path: e.sequence or 0 for e in group}),
                )
            )
            gpaths = {e.path for e in group}
            applicable_pos = [
                d
                for d in pos_deletes
                if d.referenced is None or gpaths & set(d.referenced)
            ]
            if applicable_pos:
                from airbyte_spark.lake.table import (
                    POS_KEY_DEPTH,
                    apply_position_deletes,
                )
                from airbyte_spark.operators.fileid import input_file_tail

                df = df.withColumn(
                    "_pos_file", input_file_tail(POS_KEY_DEPTH)
                ).withColumn("_pos_idx", F.col("_metadata.row_index"))
                df = apply_position_deletes(table, df, applicable_pos).drop(
                    "_pos_file", "_pos_idx"
                )
            if deletes:
                df = apply_equality_deletes(table, df, deletes)
            else:
                df = df.drop("_mor_seq")
            out = df.repartition(
                max(len(group), spark.sparkContext.defaultParallelism), "_fold_bin"
            )
            # the repartition shuffle does NOT preserve intra-file row
            # order (map outputs interleave, splits of one file can land
            # in reducer order), so a clustered victim's rows must be
            # RE-SORTED by its registered curve key before the write or
            # the file would carry a sort-order stamp it no longer
            # satisfies (read as clean forever, never repaired by
            # dirty-scope clustering). sortWithinPartitions(_fold_bin, key)
            # also satisfies the partitionBy writer's required ordering,
            # so no extra sort is inserted downstream.
            spec = orders.get(oid)
            sorted_ok = False
            if oid != 0 and spec is not None and all(
                d in physical.fieldNames() for d in spec["dims"]
            ):
                from airbyte_spark.operators.cluster import (
                    _dim_bounds_entries,
                    curve_key_udf,
                )

                dims = spec["dims"]
                key = curve_key_udf(
                    dims,
                    _dim_bounds_entries(group, out.select(*dims), dims),
                    spec["curve"],
                    spec["bits"],
                )
                out = (
                    out.withColumn("_ck", key(*[F.col(d) for d in dims]))
                    .sortWithinPartitions("_fold_bin", "_ck")
                    .drop("_ck")
                )
                sorted_ok = True
            ents = table.write_dataframe(
                out, generation_id=gen, partition_by="_fold_bin"
            )
            for e in ents:
                if sid != table.current_schema_id:
                    e.schema_id = sid
                # one output per input -> the fold keeps the victim's
                # file layout; the sort-order stamp is carried only when
                # the write path actually enforced that order (above) —
                # otherwise the file is honestly re-stamped unsorted.
                m = re.search(r"_fold_bin=(\d+)/", e.path)
                if m:
                    victim = group[int(m.group(1))]
                    e.sort_order_id = oid if sorted_ok else 0
                    e.partition = victim.partition
            new_entries.extend(ents)
    snap = table.commit(
        "rewrite-deletes",
        new_entries,
        remove_paths={e.path for e in victims}
        | {d.path for d in deletes}
        | {d.path for d in pos_deletes},
        branch=branch,
        expected_parent=planned_parent,
        summary={
            "rewritten_files": len(victims),
            "dropped_delete_files": len(deletes) + len(pos_deletes),
        },
    )
    return DeleteFoldResult(
        snapshot=snap,
        rewritten_files=len(victims),
        dropped_delete_files=len(deletes) + len(pos_deletes),
    )


