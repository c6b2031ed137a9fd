"""On-disk metadata model for the lakehouse table format.

Layout under a table root:

    <root>/data/<commit-uuid>-g<generation>/part-*.parquet
    <root>/metadata/manifest-<uuid>.json     (immutable)
    <root>/metadata/snap-<snapshot-id>.json  (immutable)
    <root>/metadata/refs.json                (atomic os.replace swap)

Commit protocol (single atomic pointer, like Iceberg's version-hint /
catalog swap): write immutable manifest(s) + snapshot JSON, then swap
refs.json via tempfile + os.replace with an optimistic parent check.
Readers resolve branch -> snapshot -> manifests -> file list, so they see
an immutable view for the duration of a scan (snapshot isolation —
S3DataLakeStreamLoader.kt:104-133's branch-swap pattern).

Generation ids on data-file directory names mirror Airbyte's
generation-tagged file naming (IcebergUtil.kt:58-69) so a truncate-refresh
can identify stale files by name alone (IcebergTableCleaner.kt:45-72).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class ColumnStats:
    min: object = None
    max: object = None
    null_count: int = 0


@dataclass
class DataFileEntry:
    """One data or equality-delete file: path + counts + per-column
    min/max stats.

    Stats power scan pruning (the engine's analog of Iceberg manifest
    filtering) and are recomputed by the manifest-rewrite maintenance job
    (SURVEY.md §2.11 "Manifest rewrite w/ stats").

    `content`: "data" | "equality-deletes" | "position-deletes". An
    equality-delete file holds only the table's primary-key columns; at
    scan time its keys remove matching rows from every data file with a
    strictly smaller `sequence` (Iceberg equality-delete semantics; the
    reference writes them via BaseDeltaTaskWriter.java:86-98 /
    S3DataLakeAggregate.kt:53-58 `newRowDelta()`). A position-delete
    file holds (file_path, pos) rows — Iceberg v2 position deletes
    (format spec "Position Delete Files"): each row removes the pos-th
    row of the named data file. Path identity subsumes the sequence
    rule (a path can only be deleted by a commit that could see it, and
    rewrites mint new paths), so position deletes apply by path alone.

    `referenced`: position-delete entries only — the distinct data-file
    paths the delete file names (Iceberg's `referenced_data_file` field,
    generalized to a list). None on data/equality entries, and None when
    the set exceeded REFERENCED_PATHS_CAP at write time ("unknown —
    read the delete file"); readers must treat None as referencing
    everything (conservative: applies everywhere, never auto-retired).

    `sequence`: the commit sequence the file was added in. `None` means
    "stamp me at commit time" (LakeTable.commit fills in the new
    snapshot's sequence); preserved verbatim by metadata-only rewrites so
    delete applicability never changes under manifest maintenance.

    `sort_order_id`: the registered sort order (LakeTable.ensure_sort_order)
    the file's rows were written under — 0 means unsorted (plain appends,
    merge inserts). Iceberg data files carry the same field; it is what
    lets incremental maintenance tell a clean clustered file from one that
    needs rewriting (operators/cluster.py victim selection).

    `bloom`: PK-filter sidecar metadata (lake/bloom.py), never the bitmap
    itself. Data files: {"col","type","m","k"} describing `<path>.bloom`.
    Equality-delete files: {"kind":"hashes","col","type","n"} describing
    `<path>.keyhashes` (raw Spark-xxhash64 key hashes, so driver-side
    victim tests probe data blooms without re-hashing). `type` is the PK
    type the hash was computed under — probes must cast to it, or skip
    the filter (PK type evolution), to keep false negatives impossible.
    """

    path: str
    rows: int
    bytes: int
    generation_id: int = 0
    schema_id: int = 0  # which registered schema this file was written under
    partition: dict = field(default_factory=dict)  # identity-partition values
    stats: dict[str, dict] = field(default_factory=dict)  # col -> {min,max,null_count}
    content: str = "data"
    sequence: int | None = None
    sort_order_id: int = 0
    bloom: dict | None = None
    referenced: list[str] | None = None  # position-deletes: named data files

    def to_json(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_json(d: dict) -> "DataFileEntry":
        return DataFileEntry(
            path=d["path"],
            rows=d["rows"],
            bytes=d["bytes"],
            generation_id=d.get("generation_id", 0),
            schema_id=d.get("schema_id", 0),
            partition=d.get("partition", {}),
            stats=d.get("stats", {}),
            content=d.get("content", "data"),
            sequence=d.get("sequence", 0),
            sort_order_id=d.get("sort_order_id", 0),
            bloom=d.get("bloom"),
            referenced=d.get("referenced"),
        )


#: above this many distinct referenced data files, a position-delete
#: entry stores referenced=None ("unknown") — manifests stay bounded and
#: readers fall back to conservative apply-everywhere semantics.
REFERENCED_PATHS_CAP = 1000


#: caps on the per-manifest summary lists kept in the snapshot: above
#: these, the field is stored as None ("unknown — read the manifest").
#: 64 dirs x ~60 chars and 64 partition dicts keep a worst-case snapshot
#: (64 live manifests after commit-time merging) under ~0.5 MB.
SUMMARY_DIRS_CAP = 64
SUMMARY_PARTITIONS_CAP = 64


def _all_numeric_strings(vals) -> bool:
    """True when every value parses as a number — i.e. the values are a
    numeric type that went through the JSON round-trip (Decimal -> str via
    atomic_write_json's default=str), for which lexicographic comparison
    would be wrong."""
    import decimal

    for v in vals:
        try:
            decimal.Decimal(v)
        except (decimal.InvalidOperation, ValueError, TypeError):
            return False
    return True


def manifest_summary(entries) -> dict:
    """Manifest-list summary for one manifest (Iceberg ManifestFile
    metadata analog: added/existing counts + partition field summaries,
    `core/.../ManifestFile` semantics). Lets a commit target only the
    manifests that can contain a removed path (by commit-dir prefix) and
    lets a scan skip whole manifests by partition value or stats range
    without opening them. Every field is conservative: None / missing
    means "unknown", which readers treat as unprunable.
    """
    dirs = sorted({os.path.dirname(e.path) for e in entries})
    parts = {tuple(sorted(e.partition.items())) for e in entries}
    seqs = [e.sequence or 0 for e in entries]
    stats: dict[str, dict] = {}
    for col in set().union(*(e.stats.keys() for e in entries)) if entries else ():
        per = [e.stats.get(col) for e in entries]
        if any(s is None or s.get("min") is None or s.get("max") is None for s in per):
            continue  # one statless entry -> column not prunable at manifest level
        vals = [s["min"] for s in per] + [s["max"] for s in per]
        if all(isinstance(v, str) for v in vals) and _all_numeric_strings(vals):
            # decimal/float stats come back from the JSON round-trip as
            # strings; min/max over those is LEXICOGRAPHIC ('9.5' > '10.2')
            # and a summary built from them would mis-prune manifests whose
            # entries do intersect the key range (silent row loss). Without
            # the column's type we cannot re-aggregate safely -> drop the
            # column from the summary (conservative: unprunable). ISO
            # temporal strings and true strings are fine: for both, the
            # lexicographic order IS the column's order.
            continue
        try:
            stats[col] = {
                "min": min(s["min"] for s in per),
                "max": max(s["max"] for s in per),
            }
        except TypeError:
            continue  # mixed stat types (e.g. after JSON string round-trip)
    return {
        "entry_count": len(entries),
        "rows": sum(e.rows for e in entries),
        "bytes": sum(e.bytes for e in entries),
        "content": sorted({e.content for e in entries}),
        "dirs": dirs if len(dirs) <= SUMMARY_DIRS_CAP else None,
        "partitions": (
            [dict(p) for p in sorted(parts)]
            if len(parts) <= SUMMARY_PARTITIONS_CAP
            else None
        ),
        "stats": stats,
        "min_seq": min(seqs) if seqs else 0,
        "max_seq": max(seqs) if seqs else 0,
    }


@dataclass
class Snapshot:
    snapshot_id: str
    parent_id: str | None
    sequence: int
    timestamp_ms: int
    operation: str  # append | merge | rewrite | cluster | delete | replace
    manifests: list[str]
    schema_json: str
    summary: dict = field(default_factory=dict)
    #: parallel to `manifests`: the manifest-list summaries (see
    #: manifest_summary). Older snapshots (or hand-built ones) may lack
    #: it — readers fall back to opening the manifest. A manifest carried
    #: forward unchanged keeps its summary without being re-read, which
    #: is what makes pure-append commits O(batch) metadata.
    manifest_infos: list[dict] = field(default_factory=list)

    def to_json(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(**d)


@dataclass
class TableMetadata:
    name: str
    primary_key: list[str]
    stats_columns: list[str]
    properties: dict = field(default_factory=dict)


def new_id() -> str:
    return uuid.uuid4().hex[:16]


def now_ms() -> int:
    return int(time.time() * 1000)


def atomic_write_json(path: str, payload: dict) -> None:
    """Write JSON atomically: tmp file in same dir + os.replace (POSIX-atomic)."""
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
