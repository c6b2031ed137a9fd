"""Changelog-advanced per-row FEATURE tables: derived columns (quality
signals, image stats, fingerprints — anything computed row-locally from
a content column) maintained incrementally as the base table moves.

The third derived-table shape next to rollups (cross-row aggregates)
and near-dup/ANN indexes (cross-row structure): a feature table is a
PURE PROJECTION of the base table — one output row per alive base row,
computed only from that row. That makes incremental maintenance exact
and O(batch) by construction: resolve the (watermark, head] changelog
to last-event-per-id (operators/dedup_index.py::resolve_changelog_window,
shared with the indexes), recompute features for upserted ids only,
tombstone removed ids, MoR-merge. The invariant every test leans on:
advancing through any DML interleaving equals one full recompute over
the final alive rows.

Extractors are registered by name so the feature definition is pinned
IN the artifact's table properties (same discipline as rollup/index
configs — two writers can't maintain diverging definitions):

- "quality":     Gopher repetition signals over a text column
                 (functions/curation.py::repetition_signals)
- "image-stats": decoded dimensions + luminance mean/std over an image
                 bytes column (functions/images.py::image_feature_df)
- "fingerprint": normalized-text fingerprint64 + char length (pure
                 codegen — no Python at all)

At 10^12 rows: the initial build is one full Arrow pass (unavoidable);
every later cycle touches only the window's changed ids. Registered in
maintenance via kind="feature" (operators/derived.py), advanced after
each branch swap like every other artifact.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.operators.merge import CDC_DELETED_COL, merge_into

CONF_PROP = "feature-table.config"
WATERMARK_PROP = "feature-table.source-snapshot-watermark"


def _extract_quality(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    from airbyte_spark.functions.curation import repetition_signals

    return repetition_signals(df, id_col, content_col)


def _extract_image_stats(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    from airbyte_spark.functions.images import image_feature_df

    df = df.select(id_col, content_col)  # drop any pre-existing 'bytes'
    if content_col != "bytes":
        df = df.withColumnRenamed(content_col, "bytes")
    return image_feature_df(df, id_col)


def _extract_fingerprint(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    from airbyte_spark.functions.text import fingerprint64

    return df.select(
        F.col(id_col),
        fingerprint64(F.col(content_col)).alias("fingerprint"),
        F.length(F.col(content_col)).cast("long").alias("n_chars"),
    )


EXTRACTORS = {
    "quality": _extract_quality,
    "image-stats": _extract_image_stats,
    "fingerprint": _extract_fingerprint,
}


@dataclass
class FeatureTableResult:
    mode: str  # noop | initial | rebuild | incremental
    watermark: str | None
    rows_upserted: int = 0
    rows_removed: int = 0


def _compute(source_df: DataFrame, conf: dict, seq: int) -> DataFrame:
    fn = EXTRACTORS[conf["feature"]]
    out = fn(source_df, conf["id_col"], conf["content_col"])
    return out.withColumn("_feat_seq", F.lit(seq).cast("long")).withColumn(
        CDC_DELETED_COL, F.lit(None).cast("timestamp")
    )


def _tombstones(
    feat: LakeTable, ids_df: DataFrame, id_col: str, seq: int, branch: str
) -> DataFrame:
    """Null-feature deletion records for removed ids — built from the
    feature table's own schema (extractors never run on absent content)."""
    cols = [F.col(id_col)]
    for f in feat.schema(branch=branch).fields:
        if f.name in (id_col, "_feat_seq", CDC_DELETED_COL):
            continue
        cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    cols.append(F.lit(seq).cast("long").alias("_feat_seq"))
    cols.append(F.current_timestamp().alias(CDC_DELETED_COL))
    return ids_df.select(*cols)


def create_feature_table(
    source: LakeTable,
    root: str,
    feature: str,
    id_col: str,
    content_col: str,
    branch: str = MAIN,
) -> LakeTable:
    """Create the (empty) feature table: PK = id_col, one column per
    feature output, `_feat_seq` cursor. The feature name + columns are
    pinned in properties; update validates against them."""
    if feature not in EXTRACTORS:
        raise ValueError(f"feature must be one of {sorted(EXTRACTORS)}: {feature!r}")
    src_schema = source.schema(branch=branch)
    for c in (id_col, content_col):
        if c not in src_schema.fieldNames():
            raise ValueError(f"unknown source column {c!r}")
    empty = source.spark.createDataFrame([], src_schema)
    feat_schema = EXTRACTORS[feature](empty, id_col, content_col).schema
    if feat_schema.fieldNames()[0] != id_col:
        raise ValueError(f"extractor must lead with {id_col!r}")
    fields = [StructField(id_col, feat_schema[id_col].dataType, False)] + [
        StructField(f.name, f.dataType, True)
        for f in feat_schema.fields
        if f.name != id_col
    ] + [StructField("_feat_seq", LongType(), True)]
    t = LakeTable.create(source.spark, root, StructType(fields), primary_key=[id_col])
    t.set_properties(
        {
            CONF_PROP: json.dumps(
                {"feature": feature, "id_col": id_col, "content_col": content_col}
            )
        }
    )
    return t


def _conf(feat: LakeTable) -> dict:
    try:
        return json.loads(feat.properties[CONF_PROP])
    except KeyError as e:
        raise ValueError(
            "not a feature table (create it with create_feature_table)"
        ) from e


def update_feature_table(
    source: LakeTable, feat: LakeTable, branch: str = MAIN
) -> FeatureTableResult:
    """Advance `feat` to `source`'s head on `branch` (see module doc)."""
    conf = _conf(feat)
    id_col, content_col = conf["id_col"], conf["content_col"]
    head = source.snapshot(branch=branch)
    wm = feat.properties.get(WATERMARK_PROP)
    if wm == head.snapshot_id:
        return FeatureTableResult("noop", wm)

    if wm is None:
        full = source.scan(branch=branch, snapshot_id=head.snapshot_id).select(
            id_col, content_col
        )
        rows = _compute(full, conf, head.sequence)
        mode = "initial"
        if feat.data_files(branch):
            # at-least-once replay guard (same shape as rollup/index
            # rebuilds): a crashed initial build may have appended before
            # stamping the watermark — re-appending would duplicate ids.
            # MoR-merge the full recompute and tombstone stale ids.
            mode = "rebuild"
            stale = (
                feat.scan(branch=branch)
                .select(id_col)
                .distinct()
                .join(full.select(id_col), id_col, "left_anti")
            )
            tomb = _tombstones(feat, stale, id_col, head.sequence, branch)
            merge_into(
                feat,
                rows.unionByName(tomb),
                cursor_col="_feat_seq",
                mode="mor",
                branch=branch,
            )
        else:
            # the CDC column only exists for the merge paths — appending
            # it would write a ghost column absent from the registered
            # schema into the data files
            feat.append(rows.drop(CDC_DELETED_COL))
        feat.set_properties({WATERMARK_PROP: head.snapshot_id})
        n = feat.scan(branch=branch).count()
        return FeatureTableResult(mode, head.snapshot_id, rows_upserted=int(n))

    # ---- incremental window ------------------------------------------
    from airbyte_spark.operators.dedup_index import resolve_changelog_window

    ups, removed = resolve_changelog_window(
        source, wm, head, id_col, content_col, branch=branch
    )
    up_rows = _compute(ups, conf, head.sequence).persist()
    try:
        n_up = up_rows.count()
        tomb = _tombstones(feat, removed, id_col, head.sequence, branch)
        n_rm = removed.count()
        if n_up or n_rm:
            merge_into(
                feat,
                up_rows.unionByName(tomb),
                cursor_col="_feat_seq",
                mode="mor",
                branch=branch,
            )
    finally:
        up_rows.unpersist()
    feat.set_properties({WATERMARK_PROP: head.snapshot_id})
    return FeatureTableResult(
        "incremental", head.snapshot_id, rows_upserted=int(n_up), rows_removed=int(n_rm)
    )


def reset_feature_table(feat: LakeTable) -> None:
    """Clear the watermark: the next update runs an idempotent rebuild."""
    feat.set_properties({WATERMARK_PROP: None})
