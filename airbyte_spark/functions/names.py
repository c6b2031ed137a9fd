"""Identifier / path sanitization — Transformations.kt:20-66 semantics.

Stream and field names arrive with unicode, punctuation, and whitespace;
object stores and Avro identifiers each accept a different character set.
These are driver-side (metadata, not row data): names are sanitized once
per stream/column, never per record.

- `to_s3_safe_characters`: NFKD-normalize, strip combining marks, replace
  anything outside the S3-safe set with '_' (Transformations.kt:20-29).
- `to_azure_blob_safe_path`: same + no trailing dots per path segment
  (Transformations.kt:31-38).
- `to_alphanumeric_and_underscore`: NFKD + whitespace->'_' + non-[alnum_]
  -> '_' (Transformations.kt:40-48) — the column-name normalizer.
- `to_avro_safe_name` / `to_avro_safe_namespace`: Avro identifiers must
  start with [A-Za-z_] (Transformations.kt:50-66).
"""

from __future__ import annotations

import re
import unicodedata

# Java \p{Alnum} is ASCII-only ([A-Za-z0-9]); after NFKD+mark-stripping the
# reference's regexes operate on the decomposed string, so we match that.
_S3_UNSAFE = re.compile(r"[^A-Za-z0-9/!_.*')(&$@=;:+,?\-]")
_NON_ALNUM_UNDERSCORE = re.compile(r"[^A-Za-z0-9_]")
_WS = re.compile(r"\s+")
_TRAILING_DOTS = re.compile(r"\.+$")


def _nfkd_strip_marks(s: str) -> str:
    decomposed = unicodedata.normalize("NFKD", s)
    return "".join(ch for ch in decomposed if not unicodedata.combining(ch))


def to_s3_safe_characters(name: str) -> str:
    return _S3_UNSAFE.sub("_", _nfkd_strip_marks(name))


def to_azure_blob_safe_path(path: str) -> str:
    safe = to_s3_safe_characters(path)
    return "/".join(
        seg if not seg else _TRAILING_DOTS.sub("_", seg) for seg in safe.split("/")
    )


def to_alphanumeric_and_underscore(name: str) -> str:
    return _NON_ALNUM_UNDERSCORE.sub("_", _WS.sub("_", _nfkd_strip_marks(name)))


def to_avro_safe_name(name: str) -> str:
    stripped = to_alphanumeric_and_underscore(name)
    if not stripped:
        return "_"
    return stripped if re.match(r"[A-Za-z_]", stripped[0]) else f"_{stripped}"


def to_avro_safe_namespace(namespace: str) -> str:
    tokens = namespace.split(".")
    while tokens and tokens[-1] == "":
        tokens.pop()
    return ".".join(to_alphanumeric_and_underscore(t) for t in tokens)
