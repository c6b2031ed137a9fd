"""Incrementally-maintained near-duplicate index (phash / simhash).

One-shot near-dup detection (`phash_near_dup_pairs`,
`simhash_near_dup_pairs`) re-hashes and re-joins the WHOLE corpus every
run — at 10⁹ documents that is a full decode + shuffle per sync. This
operator keeps the banded 64-bit-hash index AS A LAKE TABLE and
advances it O(batch) from the source table's changelog, the
continuous-ingest shape a web-scale pipeline actually runs. The hash
pass is pluggable (`hasher="phash"` over image bytes,
`"simhash-md5"`/`"simhash-fnv"` over text); everything downstream —
radius-complete banding, bucket layout, merge, probe — is hash-agnostic:

- index rows are `(image_id, band, phash, bh)` — one row per
  radius-complete sub-band (`simhash_band_layout` pigeonhole property:
  a pair within `max_hamming` MUST collide on at least one band), PK
  `(image_id, band)`, hidden-partitioned `bucket(N, bh)` so a probe
  touches only the buckets the batch hashes into;
- each update identifies the window's touched ids from
  `scan_changelog`, resolves the LAST event per id by snapshot ordinal
  (insert at the head ordinal => upsert, else removal), re-hashes only
  surviving payloads (one Arrow pass over the batch), and lands the
  rows via a MoR merge keyed by the source commit sequence —
  idempotent replay, tombstones through the CDC path;
- the probe then joins ONLY the batch's band rows against the index
  files whose `bh_bucket` partition value the batch actually produced
  (manifest-level pruning via the writer's own transform expression) —
  emitted pairs are exact (popcount-verified), and the stream of pairs
  across updates equals a from-scratch pass over the final state for
  every pair whose endpoints are still alive (pinned by tests).

The index table is ordinary: compaction folds the per-merge bucket
files, time travel pins a probe, expire/GC applies.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.functions.dedup import simhash_band_layout
from airbyte_spark.lake.table import MAIN, LakeTable
from airbyte_spark.lake.transforms import fields_by_key
from airbyte_spark.operators.merge import CDC_DELETED_COL, merge_into

CONF_PROP = "phash-index.config"
WATERMARK_PROP = "phash-index.source-snapshot-watermark"

#: hasher name -> required content-column type. "hyperplane" is the
#: embedding flavor: 64 fixed ±1 sign planes (signed_planes — the
#: engine-portable SRP family q_ann_lsh_topk's oracle already pins)
#: fold an array<float> into a 64-bit signature whose hamming distance
#: estimates angular distance.
HASHER_TYPES = {
    "phash": BinaryType,
    "simhash-md5": StringType,
    "simhash-fnv": StringType,
    "hyperplane": ArrayType,
}


def _hash_udf(conf: dict):
    """The configured content -> int64 signature pandas UDF."""
    h = conf.get("hasher", "phash")
    if h == "phash":
        from airbyte_spark.functions.images import phash_udf

        return phash_udf
    if h in ("simhash-md5", "simhash-fnv"):
        from airbyte_spark.functions.dedup import simhash_md5_udf, simhash_udf

        return simhash_md5_udf if h == "simhash-md5" else simhash_udf
    from airbyte_spark.functions.similarity import (
        fixed_plane_bucket_udf,
        signed_planes,
    )

    planes = signed_planes(
        1, 64, int(conf["dim"]), seed=int(conf.get("seed", 777))
    )
    return fixed_plane_bucket_udf(planes[0])


@dataclass
class PhashIndexResult:
    mode: str  # "initial" | "rebuild" | "incremental" | "noop"
    watermark: str
    images_upserted: int = 0
    images_removed: int = 0
    #: exact near-dup pairs (id_a, id_b, hamming) THIS window introduced
    #: (both batch-vs-corpus and batch-internal); None when probe=False
    pairs: DataFrame | None = None
    probed_files: int = 0  # index files the probe opened...
    total_files: int = 0  # ...out of this many live


def create_near_dup_index(
    source: LakeTable,
    root: str,
    content_col: str,
    id_col: str,
    hasher: str = "simhash-md5",
    max_hamming: int = 8,
    bucket_count: int = 32,
    branch: str = MAIN,
    dim: int | None = None,
    seed: int = 777,
) -> LakeTable:
    """Create the (empty) index table for `source`; config is pinned in
    table properties so every updater maintains the same hash/radius/
    layout. `dim`/`seed` apply to the "hyperplane" hasher only (the ±1
    plane family is a pure function of them, so any updater rebuilds the
    identical planes)."""
    src = source.schema(branch=branch)
    if id_col not in src.fieldNames():
        raise ValueError(f"unknown id column {id_col!r}")
    if hasher not in HASHER_TYPES:
        raise ValueError(
            f"unknown hasher {hasher!r} (one of {sorted(HASHER_TYPES)})"
        )
    want = HASHER_TYPES[hasher]
    if content_col not in src.fieldNames() or not isinstance(
        src[content_col].dataType, want
    ):
        raise ValueError(
            f"hasher {hasher!r} needs a {want.__name__} column, got "
            f"{content_col!r}"
        )
    if hasher == "hyperplane" and not dim:
        raise ValueError("hasher 'hyperplane' needs dim=<embedding length>")
    layout = simhash_band_layout(max_hamming)
    fields = [
        StructField(id_col, src[id_col].dataType, False),
        StructField("band", IntegerType(), False),
        StructField("phash", LongType(), True),
        StructField("bh", LongType(), True),
        StructField("_idx_seq", LongType(), True),
    ]
    t = LakeTable.create(
        source.spark,
        root,
        StructType(fields),
        primary_key=[id_col, "band"],
        partition_by=[f"bucket({bucket_count}, bh)"],
    )
    t.set_properties(
        {
            CONF_PROP: json.dumps(
                {
                    "id_col": id_col,
                    "content_col": content_col,
                    "hasher": hasher,
                    "max_hamming": max_hamming,
                    "n_bands": len(layout),
                    **({"dim": dim, "seed": seed} if dim else {}),
                }
            )
        }
    )
    return t


def create_phash_index(
    source: LakeTable,
    root: str,
    id_col: str = "image_id",
    content_col: str = "bytes",
    max_hamming: int = 4,
    bucket_count: int = 32,
    branch: str = MAIN,
) -> LakeTable:
    """Image-flavored `create_near_dup_index` (DCT perceptual hash)."""
    return create_near_dup_index(
        source,
        root,
        content_col,
        id_col,
        hasher="phash",
        max_hamming=max_hamming,
        bucket_count=bucket_count,
        branch=branch,
    )


def _band_rows(hashed: DataFrame, id_col: str, layout) -> DataFrame:
    """(id, phash) -> one row per sub-band: (id, band, phash, bh)."""
    return hashed.select(
        id_col,
        F.col("_ph").alias("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        # arithmetic shiftright sign-extends int64; the
                        # mask clears the extension for the top band
                        F.shiftright("_ph", off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("bh"),
                    )
                    for b, (off, w) in enumerate(layout)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "phash", "bk.band", "bk.bh")


def _probe(
    index: LakeTable,
    batch_bands: DataFrame,
    id_col: str,
    max_hamming: int,
    branch: str,
    broadcast_batch: bool = True,
) -> tuple[DataFrame, int, int]:
    """Join the batch's band rows against ONLY the index files whose
    bucket partition the batch can collide with; exact popcount verify.
    Returns (pairs, files probed, files live)."""
    from airbyte_spark.lake.transforms import partition_expr

    fld = fields_by_key(index.partition_fields()).get("bh_bucket")
    schema = index.schema(branch=branch)
    live = index.all_files(branch=branch)
    data = [e for e in live if e.content == "data"]
    deletes = [e for e in live if e.content != "data"]
    if fld is not None:
        buckets = {
            r["b"]
            for r in batch_bands.select(
                partition_expr(fld, schema["bh"].dataType).alias("b")
            )
            .distinct()
            .collect()
        }
        kept = [
            e
            for e in data
            if fld.name not in e.partition or e.partition[fld.name] in buckets
        ]
    else:  # unpartitioned index: probe everything
        kept = data
    b = batch_bands.select(
        F.col(id_col).alias("_b_id"),
        F.col("phash").alias("_b_ph"),
        "band",
        "bh",
    )
    if not kept:
        empty = index.spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("id_a", schema[id_col].dataType),
                    StructField("id_b", schema[id_col].dataType),
                    StructField("hamming", IntegerType()),
                ]
            ),
        )
        return empty, 0, len(data)
    idx = index.read_entries(kept, schema, deletes=deletes)
    pairs = (
        idx.join(F.broadcast(b) if broadcast_batch else b, on=["band", "bh"])
        .filter(F.col(id_col) != F.col("_b_id"))
        .select(
            F.least(id_col, "_b_id").alias("id_a"),
            F.greatest(id_col, "_b_id").alias("id_b"),
            F.bit_count(
                F.col("phash").bitwiseXOR(F.col("_b_ph"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs, len(kept), len(data)


def resolve_changelog_window(
    source: LakeTable,
    wm: str,
    head,
    id_col: str,
    content_col: str,
    branch: str = MAIN,
):
    """Resolve the (wm, head] changelog to the LAST event per id:
    returns (upserts DataFrame [id_col, content_col], removed DataFrame
    [id_col]). An id whose head-ordinal events include an insert
    survives with that post-image (its same-ordinal delete is the
    update's pre-image); otherwise it was removed. Shared by every
    changelog-advanced index (near-dup, ANN)."""
    # snapshot ordinals: walk head -> watermark once (O(window) metadata)
    ords: dict[str, int] = {}
    s = head
    chain = []
    while s.snapshot_id != wm:
        chain.append(s.snapshot_id)
        if s.parent_id is None:
            raise ValueError(f"{wm} is not an ancestor of {head.snapshot_id}")
        s = source.snapshot(s.parent_id)
    for i, sid in enumerate(reversed(chain)):
        ords[sid] = i
    cl = source.scan_changelog(wm, branch=branch, to_snapshot_id=head.snapshot_id)
    ord_df = source.spark.createDataFrame(
        [(k, v) for k, v in ords.items()], "_snap string, _ord long"
    )
    ev = cl.select(
        id_col, content_col, "_change_type", "_change_snapshot_id"
    ).join(
        F.broadcast(ord_df),
        F.col("_change_snapshot_id") == F.col("_snap"),
    )
    last = ev.groupBy(id_col).agg(F.max("_ord").alias("_mo"))
    head_events = ev.join(F.broadcast(last), on=id_col).filter(
        F.col("_ord") == F.col("_mo")
    )
    ups = head_events.filter(F.col("_change_type") == "insert")
    removed = (
        head_events.groupBy(id_col)
        .agg(
            F.max(
                F.when(F.col("_change_type") == "insert", 1).otherwise(0)
            ).alias("_ins")
        )
        .filter(F.col("_ins") == 0)
        .select(id_col)
    )
    return ups, removed


def _index_conf(index: LakeTable) -> dict:
    try:
        return json.loads(index.properties[CONF_PROP])
    except KeyError as e:
        raise ValueError(
            "not a near-dup index (create it with create_near_dup_index "
            "/ create_phash_index)"
        ) from e


def probe_index(
    index: LakeTable,
    batch: DataFrame,
    branch: str = MAIN,
) -> DataFrame:
    """READ-ONLY near-dup lookup: hash `batch` (id + content columns per
    the index config), prune to the index files whose hash-bucket
    partitions the batch collides with, popcount-verify — WITHOUT
    advancing the index. The ingest-gate shape: a curation pipeline
    dedup-checks a candidate batch against the corpus BEFORE deciding
    what to write. Pairs are batch-vs-corpus only (the batch is not in
    the index, so batch-internal duplicates don't appear — run the
    one-shot pair function over the batch for those). Time travel works
    the usual way: probe an index branch/snapshot by reading the index
    table at that ref before calling."""
    conf = _index_conf(index)
    id_col, mh = conf["id_col"], int(conf["max_hamming"])
    hashed = batch.select(
        F.col(id_col),
        _hash_udf(conf)(F.col(conf.get("content_col", "bytes"))).alias("_ph"),
    )
    bands = _band_rows(hashed, id_col, simhash_band_layout(mh))
    pairs, _, _ = _probe(index, bands, id_col, mh, branch)
    return pairs


def update_near_dup_index(
    source: LakeTable,
    index: LakeTable,
    probe: bool = True,
    branch: str = MAIN,
) -> PhashIndexResult:
    """Advance the index to `source`'s head (see module docstring)."""
    conf = _index_conf(index)
    id_col, mh = conf["id_col"], int(conf["max_hamming"])
    bytes_col = conf.get("content_col", "bytes")
    hash_udf = _hash_udf(conf)
    layout = simhash_band_layout(mh)
    head = source.snapshot(branch=branch)
    wm = index.properties.get(WATERMARK_PROP)
    if wm == head.snapshot_id:
        return PhashIndexResult("noop", wm)

    if wm is None:
        hashed = source.scan(branch=branch, snapshot_id=head.snapshot_id).select(
            F.col(id_col), hash_udf(F.col(bytes_col)).alias("_ph")
        )
        bands = _band_rows(hashed, id_col, layout).withColumn(
            "_idx_seq", F.lit(head.sequence)
        )
        mode = "initial"
        if index.data_files(branch):
            mode = "rebuild"
            # progress was reset on a non-empty index (or the previous
            # initial build crashed between its append and the watermark
            # stamp — the maintenance loop is at-least-once): a plain
            # re-append would duplicate every (id, band) row. Rebuild
            # idempotently instead: MoR-merge the full corpus over the
            # existing PKs and tombstone ids no longer in the source
            # (same guard shape as rollup.py's reset rebuild).
            stale = (
                index.scan(branch=branch)
                .select(id_col)
                .distinct()
                .join(hashed.select(id_col), id_col, "left_anti")
            )
            tomb = stale.select(
                id_col,
                F.explode(
                    F.array(
                        *[F.lit(b).cast("int") for b in range(len(layout))]
                    )
                ).alias("band"),
                F.lit(None).cast("long").alias("phash"),
                F.lit(None).cast("long").alias("bh"),
                F.lit(head.sequence).alias("_idx_seq"),
                F.current_timestamp().alias(CDC_DELETED_COL),
            )
            merge_into(
                index,
                bands.withColumn(
                    CDC_DELETED_COL, F.lit(None).cast("timestamp")
                ).unionByName(tomb),
                cursor_col="_idx_seq",
                mode="mor",
                branch=branch,
            )
        else:
            index.append(bands)
        index.set_properties({WATERMARK_PROP: head.snapshot_id})
        n = index.scan(branch=branch).select(id_col).distinct().count()
        pairs = probed = total = None
        if probe:
            # probe the fresh index against itself: reads back the rows
            # just written (no re-hash), complete by the band property.
            # The "batch" IS the corpus here — shuffle join, no broadcast
            pairs, probed, total = _probe(
                index,
                index.scan(branch=branch),
                id_col,
                mh,
                branch,
                broadcast_batch=False,
            )
        return PhashIndexResult(
            mode,
            head.snapshot_id,
            images_upserted=n,
            pairs=pairs,
            probed_files=probed or 0,
            total_files=total or 0,
        )

    # ---- incremental window ------------------------------------------
    ups, removed = resolve_changelog_window(
        source, wm, head, id_col, bytes_col, branch=branch
    )
    hashed = ups.select(F.col(id_col), hash_udf(F.col(bytes_col)).alias("_ph"))
    up_bands = (
        _band_rows(hashed, id_col, layout)
        .withColumn("_idx_seq", F.lit(head.sequence))
        .withColumn(CDC_DELETED_COL, F.lit(None).cast("timestamp"))
        .persist()
    )
    try:
        n_up = up_bands.select(id_col).distinct().count()
        tomb = removed.select(
            id_col,
            F.explode(
                F.array(*[F.lit(b).cast("int") for b in range(len(layout))])
            ).alias("band"),
            F.lit(None).cast("long").alias("phash"),
            F.lit(None).cast("long").alias("bh"),
            F.lit(head.sequence).alias("_idx_seq"),
            F.current_timestamp().alias(CDC_DELETED_COL),
        )
        n_rm = removed.count()
        merge_into(
            index,
            up_bands.unionByName(tomb),
            cursor_col="_idx_seq",
            mode="mor",
            branch=branch,
        )
        pairs = probed = total = None
        if probe and n_up:
            pairs, probed, total = _probe(index, up_bands, id_col, mh, branch)
            # cut lineage while up_bands is still cached: the caller
            # consumes result.pairs AFTER the finally unpersists, and a
            # lazy plan would re-run the whole changelog resolution +
            # Arrow hash pass on first collect
            pairs = pairs.localCheckpoint(eager=True)
    finally:
        up_bands.unpersist()
    index.set_properties({WATERMARK_PROP: head.snapshot_id})
    return PhashIndexResult(
        "incremental",
        head.snapshot_id,
        images_upserted=n_up,
        images_removed=n_rm,
        pairs=pairs,
        probed_files=probed or 0,
        total_files=total or 0,
    )


#: image-flavored alias — the original public name
update_phash_index = update_near_dup_index
