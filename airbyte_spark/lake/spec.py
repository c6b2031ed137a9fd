"""`spec` operation — the connector's configuration specification.

The reference's SPEC lifecycle (SpecOperation.kt:14-26) emits a
ConnectorSpecification whose ``connectionSpecification`` is the JSON
schema derived from the connector's configuration class — not
hand-written JSON — and destinations extend it with
``supportedDestinationSyncModes`` + ``supportsIncremental`` + UI groups
(DestinationSpecificationInternal.kt:17-45).

Same derivation here: the schema is generated from ``PROPERTY_SPECS``,
the registry of every table property the engine actually reads (each
entry cites its consumer), plus the connection-level fields. And because
the registry is the single source of truth, ``validate_config`` can
reject what the schema would reject — a typo like
``cluster.max-delete-era`` becomes a typed ``config_error`` (with a
did-you-mean) at `check` / sync-start / table-create time instead of a
silently applied default. Keys outside the engine-reserved prefixes
(``RESERVED_PREFIXES``: ``write.`` / ``merge.`` / ``cluster.`` /
``commit.`` / ``compact.`` / ``maintenance.`` / ``history.``) stay
free-form user metadata, matching Iceberg's arbitrary table-property
semantics.
"""

from __future__ import annotations

import difflib

DOCUMENTATION_URL = "https://github.com/airbytehq/airbyte/tree/master/docs"

#: loader mode -> protocol DestinationSyncMode (protocol reference:
#: airbyte-protocol.md catalog section; the reference's
#: BasicFunctionalityIntegrationTest exercises exactly these three)
SYNC_MODE_FOR_LOADER_MODE = {
    "append": "append",
    "truncate": "overwrite",
    "dedup": "append_dedup",
}

#: prefixes the engine owns: an unrecognized key under one of these is a
#: config error (typo), anything else is user metadata and passes through
RESERVED_PREFIXES = (
    "write.",
    "merge.",
    "cluster.",
    "commit.",
    "compact.",
    "maintenance.",
    "history.",
)

#: every table property the engine reads, with the JSON-schema fragment
#: the spec advertises for it. `consumer` cites the code that reads it —
#: keep this registry in lockstep with those reads.
PROPERTY_SPECS: dict[str, dict] = {
    "write.target-file-size-bytes": {
        "type": "integer",
        "default": 128 * 1024 * 1024,
        # floor rejects nonsense (0/negative/byte-sized) but admits the
        # small-file shapes tests and tiny scale factors legitimately use
        "minimum": 64 * 1024,
        "description": "Target size for data files written by append, "
        "merge, compaction and clustering rewrites.",
        "group": "write",
        "consumer": "operators/merge.py, compact.py, cluster.py, lake/table.py",
    },
    "merge.partition-pruning": {
        "type": "boolean",
        "default": False,
        "description": "Restrict a merge's candidate files to the "
        "partitions present in the batch (in addition to the always-on "
        "PK-range manifest pruning).",
        "group": "merge",
        "consumer": "operators/merge.py::_candidate_entries",
    },
    "merge.mor.max-delete-eras": {
        "type": "integer",
        "default": 8,
        "minimum": 0,
        "description": "Merge-on-read folds accumulated equality-delete "
        "debt into the data files once this many distinct delete eras "
        "are live; 0 disables (caller owns maintenance).",
        "group": "merge",
        "consumer": "operators/merge.py (MoR auto-fold)",
    },
    "cluster.max-delete-eras": {
        "type": "integer",
        "default": 8,
        "minimum": 0,
        "description": "A dirty-scoped cluster pass folds delete debt "
        "(rewriting every delete-affected file) only past this many "
        "live delete eras; 0 folds eagerly every pass.",
        "group": "cluster",
        "consumer": "operators/maintenance.py, cluster.py",
    },
    "write.pk-bloom.enabled": {
        "type": "boolean",
        "default": True,
        "description": "Write a per-file primary-key bloom-filter "
        "sidecar with every data file (and a key-hash sidecar with "
        "every equality-delete file) so merges and delete-debt victim "
        "tests prune files by key membership, not just PK range — "
        "range pruning is useless on a Z-order/Hilbert-clustered "
        "table whose files all span the full PK range.",
        "group": "write",
        "consumer": "lake/table.py::_attach_pk_blooms, "
        "_attach_delete_key_hashes; operators/merge.py, cluster.py",
    },
    "write.pk-bloom.bits-per-key": {
        "type": "integer",
        "default": 18,
        "minimum": 2,
        "description": "Bloom bitmap budget per key (probe count is "
        "derived as ln2*bits; 18 bits ~= 5e-4 per-key FPR — sized so "
        "a multi-key batch probe still prunes: a file is falsely kept "
        "with prob ~batch_keys*FPR, and a false positive costs one "
        "redundant file read, never a wrong result).",
        "group": "write",
        "consumer": "lake/table.py::_attach_pk_blooms",
    },
    "merge.bloom.max-probe-keys": {
        "type": "integer",
        "default": 2_000_000,
        "minimum": 0,
        "description": "Skip bloom-probe candidate pruning when the "
        "deduped batch holds more distinct keys than this (the probe "
        "hash array is driver-collected; a batch that large reverts "
        "to PK-range pruning alone).",
        "group": "merge",
        "consumer": "operators/merge.py::_candidate_entries",
    },
    "merge.planning.distributed-threshold": {
        "type": "integer",
        "default": 100_000,
        "minimum": 0,
        "description": "Above this many live manifest entries (read "
        "from the snapshot's manifest-list summaries, never by parsing "
        "manifests), merge planning parses manifests on executors and "
        "collects only candidate entries to the driver (Iceberg "
        "DistributedDataScan); below it the driver-list path avoids "
        "Spark job latency.",
        "group": "merge",
        "consumer": "operators/merge.py::_plan_candidates_distributed",
    },
    "cluster.planning.distributed-threshold": {
        "type": "integer",
        "default": 100_000,
        "minimum": 0,
        "description": "Above this many live manifest entries, a "
        "partition-scoped cluster pass runs its whole-table dead-delete "
        "retirement check as a Spark job over executor-parsed manifests "
        "instead of a driver survivor list (victim selection already "
        "lists only the partition's manifests).",
        "group": "cluster",
        "consumer": "operators/cluster.py::dead_delete_files_distributed",
    },
    "commit.manifest-min-count-to-merge": {
        "type": "integer",
        "default": 32,
        "minimum": 1,
        "description": "Commits carry parent manifests forward by name "
        "(O(batch) metadata per commit); once the live manifest list "
        "outgrows this count, small manifests are folded together at "
        "commit time so scan planning stays O(bounded manifests) "
        "(Iceberg commit.manifests.min-count-to-merge).",
        "group": "commit",
        "consumer": "lake/table.py::_maybe_merge_manifests",
    },
    "commit.manifest-target-entries": {
        "type": "integer",
        "default": 8192,
        "minimum": 16,
        "description": "Target file-entry count for manifests produced "
        "by commit-time merging; manifests at or above it are never "
        "merge candidates.",
        "group": "commit",
        "consumer": "lake/table.py::_maybe_merge_manifests",
    },
    "cluster.partial-progress.enabled": {
        "type": "boolean",
        "default": False,
        "description": "Land a clustering rewrite as up to max-commits "
        "independent commits, each chunk range-sorted and validated "
        "(victims live, no new delete files, sort order still registered) "
        "against the branch head at its own commit time. Chunk key ranges "
        "may overlap across chunks — the bounded sorted-levels state "
        "cluster.max-sorted-levels already consolidates.",
        "group": "cluster",
        "consumer": "operators/cluster.py::_cluster_partial",
    },
    "cluster.partial-progress.max-commits": {
        "type": "integer",
        "default": 10,
        "minimum": 2,
        "description": "Upper bound on the number of independent commits "
        "a partial-progress clustering pass may produce; victims are "
        "round-robined across chunks by descending size.",
        "group": "cluster",
        "consumer": "operators/cluster.py::_cluster_partial",
    },
    "history.expire.min-snapshots-to-keep": {
        "type": "integer",
        "default": 2,
        "minimum": 1,
        "description": "Per-branch snapshot count the expire stage always "
        "retains (head plus nearest ancestors), regardless of age "
        "(Iceberg history.expire.min-snapshots-to-keep). Supplies the "
        "maintenance pipeline's keep_last when the caller does not.",
        "group": "history",
        "consumer": "lake/table.py::expire_snapshots_by_policy",
    },
    "history.expire.max-snapshot-age-ms": {
        "type": "integer",
        "default": 0,
        "minimum": 0,
        "description": "When > 0, snapshots that committed longer ago "
        "than this are eligible for expiry beyond the min-snapshots-to-"
        "keep window (Iceberg history.expire.max-snapshot-age-ms); 0 "
        "keeps the count-only policy.",
        "group": "history",
        "consumer": "lake/table.py::expire_snapshots_by_policy",
    },
    "history.expire.max-ref-age-ms": {
        "type": "integer",
        "default": 0,
        "minimum": 0,
        "description": "When > 0, tags and non-main branches whose "
        "pinned snapshot is older than this are dropped at expire time, "
        "releasing their retention pins (Iceberg MAX_REF_AGE_MS); main "
        "never ages out. 0 disables ref aging.",
        "group": "history",
        "consumer": "lake/table.py::expire_snapshots_by_policy",
    },
    "maintenance.derived-tables": {
        "type": "string",
        "default": "[]",
        "description": "JSON list of registered derived artifacts "
        '({"kind": "rollup"|"near-dup-index", "root": path}) advanced '
        "by run_maintenance right after the branch swap and before "
        "expire/GC; both updaters are watermark-idempotent.",
        "group": "maintenance",
        "consumer": "operators/derived.py, operators/maintenance.py",
    },
    "compact.planning.distributed-threshold": {
        "type": "integer",
        "default": 100000,
        "minimum": 0,
        "description": "Above this many manifest entries (from the "
        "manifest-list summaries), compaction candidates are selected on "
        "executors over entries_df — the driver collects only the small "
        "files' entry blobs, never the table's file list — and partial-"
        "progress chunk validation switches to entries_df semi-joins.",
        "group": "compact",
        "consumer": "operators/compact.py::compact",
    },
    "compact.partial-progress.enabled": {
        "type": "boolean",
        "default": False,
        "description": "Split a compaction rewrite across up to "
        "max-commits independent commits so a concurrent writer or a "
        "lost executor voids one chunk of finished work, never the "
        "whole pass (Iceberg RewriteDataFiles partial-progress.enabled). "
        "Each chunk re-validates its victims and the live delete set "
        "against the branch head at its own commit time; an invalidated "
        "chunk is abandoned and its victims wait for the next cycle.",
        "group": "compact",
        "consumer": "operators/compact.py::_compact_partial",
    },
    "compact.partial-progress.max-commits": {
        "type": "integer",
        "default": 10,
        "minimum": 2,
        "description": "Upper bound on the number of independent commits "
        "a partial-progress compaction may produce (Iceberg "
        "partial-progress.max-commits); bins are round-robined across "
        "chunks by descending size so commits carry comparable volume.",
        "group": "compact",
        "consumer": "operators/compact.py::_compact_partial",
    },
    "cluster.max-sorted-levels": {
        "type": "integer",
        "default": 8,
        "minimum": 0,
        "description": "Consolidate a partition once its sorted files "
        "span this many overlapping incremental-pass levels (LSM-style "
        "read-amplification bound); 0 disables.",
        "group": "cluster",
        "consumer": "operators/cluster.py::select_cluster_victims",
    },
}

_JSON_TYPE_CHECK = {
    "integer": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "boolean": lambda v: isinstance(v, bool),
    "string": lambda v: isinstance(v, str),
}


def _parse(value, json_type: str):
    """Coerce a refs.json-stored property (often a string) to its spec
    type; raises ValueError when it doesn't parse. Mirrors how consumers
    read them (int(...) casts, '1'/'true' booleans)."""
    if _JSON_TYPE_CHECK[json_type](value):
        return value
    if json_type == "integer":
        return int(str(value), 10)
    if json_type == "boolean":
        s = str(value).strip().lower()
        if s in ("1", "true"):
            return True
        if s in ("0", "false", ""):
            return False
        raise ValueError(f"not a boolean: {value!r}")
    return str(value)


def validate_table_properties(properties: dict) -> list[dict]:
    """Errors (empty list = valid) for a table-property dict, each
    ``{"field", "error", "message"}``. Unknown keys under a reserved
    prefix are errors (typos would otherwise silently fall back to
    defaults); other keys are user metadata and pass."""
    errors: list[dict] = []
    for key, value in (properties or {}).items():
        spec = PROPERTY_SPECS.get(key)
        if spec is None:
            if str(key).startswith(RESERVED_PREFIXES):
                hint = difflib.get_close_matches(key, PROPERTY_SPECS, n=1)
                errors.append({
                    "field": key,
                    "error": "unknown-property",
                    "message": f"unknown engine property {key!r}"
                    + (f" — did you mean {hint[0]!r}?" if hint else ""),
                })
            continue
        try:
            parsed = _parse(value, spec["type"])
        except (ValueError, TypeError):
            errors.append({
                "field": key,
                "error": "type",
                "message": f"{key} expects {spec['type']}, got {value!r}",
            })
            continue
        if "minimum" in spec and parsed < spec["minimum"]:
            errors.append({
                "field": key,
                "error": "minimum",
                "message": f"{key} must be >= {spec['minimum']}, got {parsed}",
            })
    return errors


def connection_specification() -> dict:
    """The ``connectionSpecification`` JSON schema, generated from the
    registry (ConfigurationSupplierSpecificationFactory's jsonSchema
    analog)."""
    prop_schema = {
        name: {
            k: v
            for k, v in spec.items()
            if k in ("type", "default", "minimum", "description", "group")
        }
        for name, spec in PROPERTY_SPECS.items()
    }
    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "title": "Spark Lakehouse Destination Spec",
        "type": "object",
        "required": ["lake_root"],
        "additionalProperties": False,
        "properties": {
            "lake_root": {
                "type": "string",
                "description": "Root path of the lakehouse (each stream "
                "becomes a table under <lake_root>/<namespace>/<name>).",
                "group": "connection",
            },
            "namespace": {
                "type": "string",
                "description": "Default destination namespace; see "
                "streaming/namespaces.py for the resolution rules "
                "(source/destination/custom + ${SOURCE_NAMESPACE}).",
                "group": "connection",
            },
            "state_mode": {
                "type": "string",
                "enum": ["per-stream", "global"],
                "default": "per-stream",
                "description": "Checkpointing mode (protocol STREAM vs "
                "GLOBAL state types).",
                "group": "connection",
            },
            "table_properties": {
                "type": "object",
                "description": "Per-table engine properties. Keys under "
                + "/".join(RESERVED_PREFIXES)
                + " must be from this registry; other "
                "keys are stored untouched as user metadata.",
                "properties": prop_schema,
                "group": "tuning",
            },
        },
    }


def spec() -> dict:
    """The ConnectorSpecification analog the SPEC operation emits."""
    groups = [
        {"id": "connection", "title": "Connection"},
        {"id": "tuning", "title": "Table tuning"},
        {"id": "write", "title": "Write"},
        {"id": "merge", "title": "Merge"},
        {"id": "cluster", "title": "Clustering"},
        {"id": "compact", "title": "Compaction"},
        {"id": "commit", "title": "Commit metadata"},
        {"id": "maintenance", "title": "Maintenance"},
        {"id": "history", "title": "Snapshot retention"},
    ]
    return {
        "documentationUrl": DOCUMENTATION_URL,
        "supportsIncremental": True,
        "supportedDestinationSyncModes": sorted(
            SYNC_MODE_FOR_LOADER_MODE.values()
        ),
        "connectionSpecification": {
            **connection_specification(),
            "groups": groups,
        },
    }


class ConfigValidationError(ValueError):
    """Raised when a config fails spec validation; carries the per-field
    error list so trace reporting can show every problem at once."""

    def __init__(self, errors: list[dict]):
        self.errors = errors
        super().__init__(
            "; ".join(e["message"] for e in errors) or "invalid config"
        )
