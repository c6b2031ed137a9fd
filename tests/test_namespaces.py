"""NamespaceMapper — destination namespace resolution
(NamespaceMapper.kt:11-94, NamespaceMappingConfig.kt:10)."""

import pytest

from airbyte_spark.streaming.namespaces import (
    CUSTOM_FORMAT,
    DESTINATION,
    SOURCE,
    NamespaceMapper,
    StreamDescriptor,
)


def test_source_mode_keeps_namespace():
    m = NamespaceMapper(namespace_definition=SOURCE)
    assert m.map("public", "users") == StreamDescriptor("public", "users")
    assert m.map(None, "users") == StreamDescriptor(None, "users")


def test_destination_mode_drops_namespace():
    m = NamespaceMapper(namespace_definition=DESTINATION)
    assert m.map("public", "users").namespace is None


def test_custom_format_substitutes_source_namespace():
    m = NamespaceMapper(
        namespace_definition=CUSTOM_FORMAT,
        namespace_format="raw_${SOURCE_NAMESPACE}_v2",
    )
    assert m.map("public", "users").namespace == "raw_public_v2"
    # blank source substitutes empty (NamespaceMapper.kt:89)
    assert m.map("  ", "users").namespace == "raw__v2"
    assert m.map(None, "users").namespace == "raw__v2"


def test_custom_format_blank_falls_back_to_default():
    # blank FORMAT -> None (NamespaceMapper.kt:87)
    m = NamespaceMapper(namespace_definition=CUSTOM_FORMAT, namespace_format="  ")
    assert m.map("public", "users").namespace is None
    # blank RESULT -> None (NamespaceMapper.kt:93)
    m2 = NamespaceMapper(
        namespace_definition=CUSTOM_FORMAT,
        namespace_format="${SOURCE_NAMESPACE}",
    )
    assert m2.map(None, "users").namespace is None


def test_stream_prefix_applies_in_every_mode():
    for mode in (SOURCE, DESTINATION, CUSTOM_FORMAT):
        m = NamespaceMapper(namespace_definition=mode, stream_prefix="stg_")
        assert m.map("ns", "users").name == "stg_users"
    # blank prefix is a no-op (hasPrefix = !isNullOrBlank)
    assert NamespaceMapper(stream_prefix=None).map("ns", "u").name == "u"


def test_invalid_mode_rejected():
    with pytest.raises(ValueError, match="namespace_definition"):
        NamespaceMapper(namespace_definition="per-stream")


def test_table_identifier_is_destination_safe():
    m = NamespaceMapper(
        namespace_definition=CUSTOM_FORMAT,
        namespace_format="raw ${SOURCE_NAMESPACE}",
        stream_prefix="stg_",
    )
    ident = m.table_identifier("Über-DB", "user events!")
    assert ident == "raw_Uber_DB.stg_user_events_"
    assert NamespaceMapper(DESTINATION).map("x", "users").namespace is None
