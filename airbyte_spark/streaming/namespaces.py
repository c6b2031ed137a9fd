"""Namespace mapping — where a stream's data lands at the destination.

Replicates the reference's ``NamespaceMapper``
(airbyte-cdk/bulk/core/load/.../command/NamespaceMapper.kt:11-94) and its
three definition types (NamespaceMappingConfig.kt:10):

- ``source``: keep the source namespace as-is.
- ``destination``: drop it (None -> the destination's default).
- ``custom_format``: a format string where ``${SOURCE_NAMESPACE}``
  substitutes the source namespace (blank source -> empty string); a
  blank FORMAT or blank RESULT falls back to None, i.e. the
  destination default (NamespaceMapper.kt:86-93).

A ``stream_prefix`` prepends to every stream name
(NamespaceMapper.kt:75-81). ``table_identifier`` additionally runs both
parts through our destination-safe sanitizer so the mapped descriptor is
directly usable as a lake-table directory name.
"""

from __future__ import annotations

from dataclasses import dataclass

from airbyte_spark.functions.names import to_alphanumeric_and_underscore

SOURCE = "source"
DESTINATION = "destination"
CUSTOM_FORMAT = "custom_format"

_SOURCE_NS_TOKEN = "${SOURCE_NAMESPACE}"


@dataclass(frozen=True)
class StreamDescriptor:
    namespace: str | None
    name: str


@dataclass(frozen=True)
class NamespaceMapper:
    """map(source_namespace, stream_name) -> destination descriptor."""

    namespace_definition: str = SOURCE
    namespace_format: str | None = None
    stream_prefix: str | None = None

    def __post_init__(self):
        if self.namespace_definition not in (SOURCE, DESTINATION, CUSTOM_FORMAT):
            raise ValueError(
                f"namespace_definition must be one of "
                f"{(SOURCE, DESTINATION, CUSTOM_FORMAT)}: "
                f"{self.namespace_definition!r}"
            )

    def map(self, namespace: str | None, name: str) -> StreamDescriptor:
        if self.namespace_definition == SOURCE:
            ns = namespace
        elif self.namespace_definition == DESTINATION:
            ns = None
        else:
            ns = self._format(namespace)
        prefix = self.stream_prefix or ""
        return StreamDescriptor(namespace=ns, name=f"{prefix}{name}")

    def _format(self, source_ns: str | None) -> str | None:
        fmt = self.namespace_format
        if fmt is None or not fmt.strip():
            return None
        result = fmt.replace(
            _SOURCE_NS_TOKEN, source_ns if source_ns and source_ns.strip() else ""
        )
        return result if result.strip() else None

    def table_identifier(self, namespace: str | None, name: str) -> str:
        """Destination-safe ``namespace.name`` (or bare name) identifier:
        the mapped descriptor with both parts sanitized the way the
        destination sanitizes stream names."""
        d = self.map(namespace, name)
        safe_name = to_alphanumeric_and_underscore(d.name)
        if d.namespace is None:
            return safe_name
        return f"{to_alphanumeric_and_underscore(d.namespace)}.{safe_name}"
