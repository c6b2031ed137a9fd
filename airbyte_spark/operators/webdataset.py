"""WebDataset tar-shard export — the standard loader format for
multimodal (image+caption) pretraining.

Composes the seeded global shuffle (operators/shardwrite.py) with a
tar writer: each fixed-size shard becomes one `shard-NNNNNN.tar` whose
members are `{key}.{ext}` (image bytes), `{key}.txt` (caption) and
`{key}.json` (metadata), in permutation order — exactly what
webdataset/torchdata readers stream sequentially.

Spark-first shape: shard assignment is the distributed prefix-sum rank
(no global single-partition sort); `repartition(shard_id)` puts every
shard's rows into exactly one task; `sortWithinPartitions(shard_id,
shard_pos)` makes each task see its shards as contiguous ordered runs,
so the tar writer is a single sequential pass per task (mapInPandas,
Arrow batches — bytes never visit the driver). Tars are byte-identical
across runs (mtime=0, uid/gid=0, sorted json keys, permutation order),
so retries after executor loss overwrite with the same content —
idempotent by construction, matching the engine's at-least-once
maintenance semantics.

`out_dir` must be a filesystem all executors can write (on a real
cluster: an object-store/NFS mount — same contract as every WebDataset
writer); on local[n] any tmp dir works.
"""

from __future__ import annotations

import io
import json
import logging
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from airbyte_spark.operators.shardwrite import shard_assignments

log = logging.getLogger("airbyte_spark.webdataset")

_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("path", StringType()),
        StructField("samples", LongType()),
        StructField("size_bytes", LongType()),
    ]
)


def _tar_add(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0  # frozen: tar bytes must not depend on wall clock
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    ext_col: str = "fmt",
    caption_col: str = "caption",
    meta_cols: tuple[str, ...] = (),
    seed: str = "wds",
    samples_per_shard: int = 1000,
    num_ranges: int | None = None,
) -> DataFrame:
    """Export (image, caption, meta) rows as WebDataset tar shards.

    Returns the shard manifest (shard_id, path, samples, size_bytes) as
    a DataFrame — commit it alongside the export for resumable loaders.
    """
    os.makedirs(out_dir, exist_ok=True)
    asg = shard_assignments(
        df.select(id_col), id_col, seed, samples_per_shard, num_ranges
    )
    cols = [id_col, bytes_col, ext_col, caption_col, *meta_cols]
    full = (
        df.select(*cols)
        .join(asg, id_col)
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "shard_pos")
    )
    meta_list = list(meta_cols)

    def write_tars(batches):
        import pandas as pd

        cur_id, cur_tar, cur_buf, cur_n = None, None, None, 0

        def finish():
            nonlocal cur_id, cur_tar, cur_buf, cur_n
            if cur_tar is None:
                return None
            cur_tar.close()
            data = cur_buf.getvalue()
            path = os.path.join(out_dir, f"shard-{cur_id:06d}.tar")
            with open(path, "wb") as f:
                f.write(data)
            row = (int(cur_id), path, int(cur_n), len(data))
            cur_id, cur_tar, cur_buf, cur_n = None, None, None, 0
            return row

        out_rows = []
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                r = rec._asdict()
                sid = int(r["shard_id"])
                if sid != cur_id:
                    done = finish()
                    if done:
                        out_rows.append(done)
                    cur_id = sid
                    cur_buf = io.BytesIO()
                    cur_tar = tarfile.open(fileobj=cur_buf, mode="w")
                key = str(r[id_col])
                _tar_add(cur_tar, f"{key}.{r[ext_col]}", bytes(r[bytes_col]))
                _tar_add(
                    cur_tar, f"{key}.txt", (r[caption_col] or "").encode("utf-8")
                )
                meta = {c: r[c] for c in meta_list}
                meta["__key__"] = key
                _tar_add(
                    cur_tar,
                    f"{key}.json",
                    json.dumps(meta, sort_keys=True, default=str).encode("utf-8"),
                )
                cur_n += 1
        done = finish()
        if done:
            out_rows.append(done)
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["shard_id", "path", "samples", "size_bytes"]
            )

    manifest = full.mapInPandas(write_tars, _MANIFEST_SCHEMA)
    # materialize: the export IS the side effect; return the stable manifest
    rows = manifest.collect()
    spark = df.sparkSession
    return spark.createDataFrame(rows, _MANIFEST_SCHEMA)
