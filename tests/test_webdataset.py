"""WebDataset tar-shard export (operators/webdataset.py): contents,
ordering, determinism, manifest parity."""

import hashlib
import json
import os
import tarfile

from airbyte_spark.datagen import generate_images
from airbyte_spark.operators.webdataset import write_webdataset
from tests.test_shardwrite import _py_reference


def _read_shards(out_dir):
    """{shard_id: [(key, ext, payload, caption, meta), ...] in tar order}."""
    shards = {}
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".tar"):
            continue
        sid = int(f[len("shard-") : -len(".tar")])
        samples = []
        with tarfile.open(os.path.join(out_dir, f)) as tar:
            members = tar.getmembers()
            # members arrive in groups of 3 per sample, sample order preserved
            for i in range(0, len(members), 3):
                grp = {m.name.rsplit(".", 1)[1]: m for m in members[i : i + 3]}
                key = members[i].name.rsplit(".", 1)[0]
                ext = next(e for e in grp if e not in ("txt", "json"))
                samples.append(
                    (
                        key,
                        ext,
                        tar.extractfile(grp[ext]).read(),
                        tar.extractfile(grp["txt"]).read().decode(),
                        json.loads(tar.extractfile(grp["json"]).read()),
                    )
                )
        shards[sid] = samples
    return shards


def test_webdataset_roundtrip_and_order(spark, tmp_table_dir):
    df = generate_images(spark, 40, seed=3).cache()
    src = {r["image_id"]: r for r in df.collect()}
    out = os.path.join(tmp_table_dir, "wds")
    manifest = write_webdataset(
        df, out, meta_cols=("w", "h"), seed="t1", samples_per_shard=16
    )
    m = {r["shard_id"]: r for r in manifest.collect()}
    assert sorted(m) == [0, 1, 2]
    assert [m[i]["samples"] for i in (0, 1, 2)] == [16, 16, 8]

    shards = _read_shards(out)
    ref = _py_reference(sorted(src), "t1", 16)
    for sid, samples in shards.items():
        assert m[sid]["samples"] == len(samples)
        assert m[sid]["size_bytes"] == os.path.getsize(m[sid]["path"])
        for pos, (key, ext, payload, caption, meta) in enumerate(samples):
            assert ref[key] == (sid, pos), "tar order must be permutation order"
            row = src[key]
            assert ext == row["fmt"]
            assert payload == bytes(row["bytes"])
            assert caption == row["caption"]
            assert meta["w"] == row["w"] and meta["h"] == row["h"]
            assert meta["__key__"] == key


def test_webdataset_tars_are_byte_identical_across_runs(spark, tmp_table_dir):
    df = generate_images(spark, 30, seed=4).cache()
    digests = []
    for sub in ("a", "b"):
        out = os.path.join(tmp_table_dir, sub)
        write_webdataset(df, out, seed="d", samples_per_shard=10)
        digests.append(
            {
                f: hashlib.sha256(
                    open(os.path.join(out, f), "rb").read()
                ).hexdigest()
                for f in sorted(os.listdir(out))
                if f.endswith(".tar")
            }
        )
    assert digests[0] == digests[1]
    df.unpersist()


def test_webdataset_single_partition_input(spark, tmp_table_dir):
    df = generate_images(spark, 12, seed=5).coalesce(1)
    out = os.path.join(tmp_table_dir, "one")
    manifest = write_webdataset(df, out, samples_per_shard=5)
    got = sorted((r["shard_id"], r["samples"]) for r in manifest.collect())
    assert got == [(0, 5), (1, 5), (2, 2)]
