"""Model-based property test of the manifest/commit layer (no Spark —
commit() is pure driver metadata): arbitrary interleavings of appends,
removals, metadata rewrites and expiry must always agree with a plain
dict model of the live file set, preserve per-entry sequences, and never
disturb a pinned snapshot's view. This is the layer manifest reuse +
commit-time merging rewrote in round 4; the property pins its semantics
against any future refactor."""

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from airbyte_spark.lake.format import DataFileEntry
from airbyte_spark.lake.table import LakeTable

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("v", IntegerType()),
    ]
)


def _entries(root: str, commit_i: int, n: int, partition_i: int) -> list[DataFileEntry]:
    d = os.path.join(root, "data", f"c{commit_i:04d}-g0")
    return [
        DataFileEntry(
            path=os.path.join(d, f"part-{j:03d}.parquet"),
            rows=10 + j,
            bytes=1000 + j,
            partition={"p": f"p{partition_i}"},
            stats={
                "id": {
                    "min": f"k{commit_i:04d}{j:02d}",
                    "max": f"k{commit_i:04d}{j:02d}~",
                    "null_count": 0,
                }
            },
        )
        for j in range(n)
    ]


op = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 4), st.integers(0, 2)),
    st.tuples(st.just("remove"), st.integers(0, 10**6)),
    st.tuples(st.just("remove_and_add"), st.integers(0, 10**6), st.integers(1, 3)),
    st.tuples(st.just("expire"), st.just(0)),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    ops=st.lists(op, min_size=1, max_size=14),
    min_count=st.integers(2, 6),
    target=st.sampled_from([16, 20, 1000]),  # spec floor is 16
)
def test_commit_layer_matches_model(ops, min_count, target):
    root = tempfile.mkdtemp(prefix="manifest-prop-")
    try:
        t = LakeTable.create(
            None,
            root,
            SCHEMA,
            primary_key=["id"],
            properties={
                "commit.manifest-min-count-to-merge": min_count,
                "commit.manifest-target-entries": target,
            },
        )
        model: dict[str, tuple[int, int]] = {}  # path -> (rows, sequence)
        pinned_sid = None
        pinned_view: dict[str, int] = {}
        commit_i = 0
        seq = 0
        for o in ops:
            if o[0] == "append":
                _, n, pi = o
                es = _entries(root, commit_i, n, pi)
                commit_i += 1
                seq += 1
                t.commit("append", es)
                for e in es:
                    model[e.path] = (e.rows, seq)
            elif o[0] == "remove":
                if not model:
                    continue
                paths = sorted(model)
                victim = paths[o[1] % len(paths)]
                seq += 1
                t.commit("delete", [], remove_paths={victim})
                del model[victim]
            elif o[0] == "remove_and_add":
                _, pick, n = o
                victims = set()
                if model:
                    paths = sorted(model)
                    victims = {paths[pick % len(paths)]}
                es = _entries(root, commit_i, n, 0)
                commit_i += 1
                seq += 1
                t.commit("rewrite", es, remove_paths=victims)
                for v in victims:
                    del model[v]
                for e in es:
                    model[e.path] = (e.rows, seq)
            elif o[0] == "expire":
                t.expire_snapshots(keep_last=2)
            if pinned_sid is None and len(model) >= 3:
                pinned_sid = t.current_snapshot_id()
                pinned_view = {
                    e.path: e.rows for e in t.data_files(snapshot_id=pinned_sid)
                }
            # invariant: live set matches the model exactly, with rows
            # AND commit sequences preserved through any manifest
            # merging/rewriting
            live = {e.path: (e.rows, e.sequence) for e in t.data_files()}
            assert live == model
            # invariant: no path appears in two manifests
            paths = [e.path for e in t.all_files()]
            assert len(paths) == len(set(paths))
            # invariant: manifest_infos stay parallel and consistent
            snap = t.snapshot()
            assert len(snap.manifest_infos) == len(snap.manifests)
            assert sum(i["entry_count"] for i in snap.manifest_infos) == len(
                t.all_files()
            )
            # invariant: a pinned snapshot's view never changes while its
            # metadata survives expiry (keep_last=2 may drop it later)
            if pinned_sid is not None and os.path.exists(
                os.path.join(t.meta_dir, f"snap-{pinned_sid}.json")
            ):
                now = {
                    e.path: e.rows for e in t.data_files(snapshot_id=pinned_sid)
                }
                assert now == pinned_view
    finally:
        shutil.rmtree(root, ignore_errors=True)
