"""`spec` operation + config validation (lake/spec.py).

Reference semantics: SpecOperation.kt:14-26 (connectionSpecification is
GENERATED from the config class, not hand-written),
DestinationSpecificationInternal.kt:17-45 (destination spec adds
supportedDestinationSyncModes + supportsIncremental + groups), and the
platform's validate-config-against-spec step that precedes check."""

import os
import re

import pytest

from airbyte_spark.lake.spec import (
    PROPERTY_SPECS,
    RESERVED_PREFIXES,
    ConfigValidationError,
    spec,
    validate_table_properties,
)

PKG = os.path.join(os.path.dirname(__file__), "..", "airbyte_spark")


def _keys_read_in_source():
    """Every table-property key the engine code reads."""
    keys = set()
    pat = re.compile(r'properties\.get\(\s*"([^"]+)"')
    for dirpath, _, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                with open(os.path.join(dirpath, f)) as fh:
                    keys.update(pat.findall(fh.read()))
    return keys


def test_registry_covers_every_property_the_code_reads():
    read = {k for k in _keys_read_in_source() if k.startswith(RESERVED_PREFIXES)}
    assert read, "source scan found no property reads — pattern drift?"
    missing = read - set(PROPERTY_SPECS)
    assert not missing, f"properties read but not in the spec registry: {missing}"


def test_registry_defaults_match_the_code_defaults():
    from airbyte_spark.operators.cluster import (
        DEFAULT_MAX_SORTED_LEVELS,
        DEFAULT_TARGET_FILE_BYTES,
    )

    assert (
        PROPERTY_SPECS["write.target-file-size-bytes"]["default"]
        == DEFAULT_TARGET_FILE_BYTES
    )
    assert (
        PROPERTY_SPECS["cluster.max-sorted-levels"]["default"]
        == DEFAULT_MAX_SORTED_LEVELS
    )
    assert PROPERTY_SPECS["merge.mor.max-delete-eras"]["default"] == 8
    assert PROPERTY_SPECS["cluster.max-delete-eras"]["default"] == 8


def test_spec_shape():
    s = spec()
    assert s["supportsIncremental"] is True
    assert s["supportedDestinationSyncModes"] == [
        "append",
        "append_dedup",
        "overwrite",
    ]
    cs = s["connectionSpecification"]
    assert cs["type"] == "object" and "lake_root" in cs["required"]
    props = cs["properties"]["table_properties"]["properties"]
    assert set(props) == set(PROPERTY_SPECS)
    # the generated schema must not leak registry-internal fields
    assert all("consumer" not in p for p in props.values())
    group_ids = {g["id"] for g in cs["groups"]}
    used = {p.get("group") for p in props.values()}
    assert used <= group_ids


def test_validate_accepts_defaults_and_string_encodings():
    assert validate_table_properties({}) == []
    assert validate_table_properties({
        "write.target-file-size-bytes": "1048576",  # refs.json stores strings
        "merge.partition-pruning": "true",
        "cluster.max-sorted-levels": 0,
        "my.custom.metadata": "anything",  # non-reserved: user metadata
    }) == []


def test_validate_flags_typo_with_suggestion():
    errs = validate_table_properties({"cluster.max-delete-era": 4})
    assert len(errs) == 1 and errs[0]["error"] == "unknown-property"
    assert "cluster.max-delete-eras" in errs[0]["message"]


def test_validate_flags_type_and_minimum():
    errs = validate_table_properties({
        "write.target-file-size-bytes": "lots",
        "merge.mor.max-delete-eras": -1,
        "merge.partition-pruning": "maybe",
    })
    assert {(e["field"], e["error"]) for e in errs} == {
        ("write.target-file-size-bytes", "type"),
        ("merge.mor.max-delete-eras", "minimum"),
        ("merge.partition-pruning", "type"),
    }


def test_create_rejects_typoed_property(spark, tmp_table_dir):
    from pyspark.sql import types as T

    from airbyte_spark.lake.table import LakeTable

    schema = T.StructType([T.StructField("id", T.LongType())])
    with pytest.raises(ConfigValidationError, match="did you mean"):
        LakeTable.create(
            spark,
            os.path.join(tmp_table_dir, "bad"),
            schema,
            primary_key=["id"],
            properties={"write.target-file-size": 1 << 20},
        )
    assert not os.path.exists(os.path.join(tmp_table_dir, "bad"))


def test_check_fails_config_error_before_touching_storage(spark, tmp_table_dir):
    from airbyte_spark.lake.check import check_destination

    res = check_destination(
        spark,
        os.path.join(tmp_table_dir, "never-created"),
        table_properties={"cluster.max-delete-era": 4},
    )
    assert res["status"] == "FAILED"
    assert res["trace"]["failure_type"] == "config_error"
    assert res["config_errors"][0]["field"] == "cluster.max-delete-era"
    # validation precedes the probe: the destination was never written
    assert not os.path.exists(os.path.join(tmp_table_dir, "never-created"))


def test_check_with_valid_properties_succeeds(spark, tmp_table_dir):
    from airbyte_spark.lake.check import check_destination

    res = check_destination(
        spark,
        tmp_table_dir,
        table_properties={"write.target-file-size-bytes": 1 << 20},
    )
    assert res["status"] == "SUCCEEDED"
