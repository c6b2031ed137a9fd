"""Stream mappers — hash, encrypt, rename-field, filter-rows.

The reference's user-facing Mappings feature
(``docs/platform/using-airbyte/mappings.md``): per-stream record
transforms applied between source read and destination write so data
"arrives in your destination exactly as you want it". Four mapper kinds:

- **Hash** (mappings.md:19-28): irreversible; MD5 / SHA-256 / SHA-512 in
  the UI, SHA-1 / SHA-384 additionally via the API. The hashed value
  REPLACES the source field under a ``<field>_hashed`` name.
- **Encrypt** (mappings.md:30-55): reversible; RSA with a user-supplied
  public key in hex-encoded DER format ("Airbyte expects RSA keys in
  hex-encoded DER format. PEM isn't currently supported."). Output
  replaces the field under ``<field>_encrypted``.
- **Rename field** (mappings.md:57-66).
- **Filter rows** (mappings.md:68-82): keep rows matching a condition
  tree of EQUAL / NOT nodes; "You can only filter fields whose type is
  string and number."

Plus the considerations gate (mappings.md:86): "Don't map a cursor or
primary key field" — ``apply_mappers(protected_fields=...)`` enforces it.

Spark realization: hash / rename / filter compile to pure Catalyst
expressions (``F.md5`` / ``F.sha1`` / ``F.sha2``, column rename,
boolean filter) — JVM-side, whole-stage-codegen, zero Python in the hot
path. RSA encryption has no Spark built-in, so it runs as an
Arrow-batched pandas UDF doing PKCS#1 v1.5 encryption with pure-Python
modular exponentiation (the spec is public: RFC 8017 §7.2); the DER
SubjectPublicKeyInfo parse is a ~40-line ASN.1 walk, same spirit as our
pure-Python Avro writer (sources/avro_py.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "HashingMapper",
    "EncryptionMapper",
    "FieldRenamingMapper",
    "RowFilteringMapper",
    "equal",
    "not_",
    "apply_mappers",
    "parse_rsa_public_key_hex_der",
    "rsa_encrypt_pkcs1_v15",
    "rsa_decrypt_pkcs1_v15",
]


class MapperError(ValueError):
    """Invalid mapper configuration (unknown method, protected field, ...)."""


def _replace_in_place(
    df: DataFrame, old: str, new: str, col: Column
) -> DataFrame:
    """Swap column ``old`` for ``col AS new`` keeping its position (the
    reference's hash/encrypt mappers replace the field, not append)."""
    if old not in df.columns:
        raise MapperError(f"mapper target field {old!r} not in schema")
    if new != old and new in df.columns:
        raise MapperError(f"mapper output field {new!r} already exists")
    return df.select(
        *[col.alias(new) if c == old else F.col(c) for c in df.columns]
    )


# ---------------------------------------------------------------------------
# Hash
# ---------------------------------------------------------------------------

#: method -> Catalyst column builder. Values are hashed via their string
#: representation (matching the reference's record-level behavior where
#: every AirbyteValue serializes before hashing); output is lowercase hex.
_HASH_METHODS: dict[str, Callable[[Column], Column]] = {
    "MD5": lambda c: F.md5(c.cast("string").cast("binary")),
    "SHA-1": lambda c: F.sha1(c.cast("string").cast("binary")),
    "SHA-256": lambda c: F.sha2(c.cast("string"), 256),
    "SHA-384": lambda c: F.sha2(c.cast("string"), 384),
    "SHA-512": lambda c: F.sha2(c.cast("string"), 512),
}


@dataclass(frozen=True)
class HashingMapper:
    """Replace ``target_field`` with ``<target_field><suffix>`` holding the
    hex digest of the value (mappings.md:19-28). MD2 is API-listed by the
    reference but absent from hashlib and Spark alike — rejected here."""

    target_field: str
    method: str = "SHA-256"
    field_name_suffix: str = "_hashed"

    def target_fields(self) -> Sequence[str]:
        return (self.target_field,)

    def apply(self, df: DataFrame) -> DataFrame:
        if self.method not in _HASH_METHODS:
            raise MapperError(
                f"unsupported hash method {self.method!r}; "
                f"supported: {sorted(_HASH_METHODS)}"
            )
        build = _HASH_METHODS[self.method]
        new_name = f"{self.target_field}{self.field_name_suffix}"
        return _replace_in_place(
            df, self.target_field, new_name, build(F.col(self.target_field))
        )


# ---------------------------------------------------------------------------
# RSA (PKCS#1): pure-Python DER parse + v1.5 encryption — public spec,
# RFC 8017. The reference's platform encrypts per-record with the JCA
# default RSA cipher (PKCS#1 v1.5 padding); we mirror that contract.
# ---------------------------------------------------------------------------


def _der_read_tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """Read one ASN.1 TLV; return (tag, value, next_pos). Bounds-checked:
    truncated or over-length input raises MapperError, never IndexError
    or a silently-empty slice."""
    if pos + 2 > len(buf):
        raise MapperError("RSA key: truncated DER (no room for tag+length)")
    tag = buf[pos]
    pos += 1
    ln = buf[pos]
    pos += 1
    if ln & 0x80:
        n = ln & 0x7F
        if n == 0 or pos + n > len(buf):
            raise MapperError("RSA key: malformed DER length")
        ln = int.from_bytes(buf[pos : pos + n], "big")
        pos += n
    if pos + ln > len(buf):
        raise MapperError(
            f"RSA key: DER value overruns buffer ({ln} bytes at {pos}, "
            f"buffer {len(buf)})"
        )
    return tag, buf[pos : pos + ln], pos + ln


def parse_rsa_public_key_hex_der(hex_der: str) -> tuple[int, int]:
    """Parse a hex-encoded DER RSA public key -> (n, e).

    Accepts both SubjectPublicKeyInfo (what ``openssl rsa -pubout
    -outform DER`` emits — the format mappings.md:44-51 documents) and a
    bare PKCS#1 RSAPublicKey sequence. Any malformed input surfaces as
    the documented MapperError (config error), never a low-level one.
    """
    try:
        der = bytes.fromhex(hex_der.strip())
    except ValueError as e:
        raise MapperError(f"RSA key: not valid hex: {e}") from e
    if not der:
        raise MapperError("RSA key: empty")
    tag, body, _ = _der_read_tlv(der, 0)
    if tag != 0x30:
        raise MapperError("RSA key: expected DER SEQUENCE")
    inner_tag, inner, nxt = _der_read_tlv(body, 0)
    if inner_tag == 0x30:  # SPKI: SEQUENCE(AlgorithmIdentifier) BITSTRING
        bs_tag, bs, _ = _der_read_tlv(body, nxt)
        if bs_tag != 0x03:
            raise MapperError("RSA key: expected BIT STRING in SPKI")
        # first bit-string byte = number of unused bits (0 for RSA keys)
        tag2, body, _ = _der_read_tlv(bs[1:], 0)
        if tag2 != 0x30:
            raise MapperError("RSA key: expected RSAPublicKey SEQUENCE")
        inner_tag, inner, nxt = _der_read_tlv(body, 0)
    if inner_tag != 0x02:
        raise MapperError("RSA key: expected INTEGER modulus")
    n = int.from_bytes(inner, "big")
    e_tag, e_bytes, _ = _der_read_tlv(body, nxt)
    if e_tag != 0x02:
        raise MapperError("RSA key: expected INTEGER exponent")
    return n, int.from_bytes(e_bytes, "big")


def rsa_encrypt_pkcs1_v15(
    msg: bytes, n: int, e: int, rng: Callable[[int], bytes] = os.urandom
) -> bytes:
    """RSAES-PKCS1-v1_5 encrypt (RFC 8017 §7.2.1): EM = 00 02 PS 00 M."""
    k = (n.bit_length() + 7) // 8
    if len(msg) > k - 11:
        raise MapperError(f"RSA: message too long ({len(msg)} > {k - 11})")
    ps = bytearray()
    while len(ps) < k - len(msg) - 3:  # nonzero random padding
        ps.extend(b for b in rng(k) if b != 0)
    em = b"\x00\x02" + bytes(ps[: k - len(msg) - 3]) + b"\x00" + msg
    return pow(int.from_bytes(em, "big"), e, n).to_bytes(k, "big")


def rsa_decrypt_pkcs1_v15(ct: bytes, n: int, d: int) -> bytes:
    """Inverse of the above (test/verification helper — the destination
    owner holds the private key; RFC 8017 §7.2.2)."""
    k = (n.bit_length() + 7) // 8
    em = pow(int.from_bytes(ct, "big"), d, n).to_bytes(k, "big")
    if em[:2] != b"\x00\x02":
        raise MapperError("RSA: bad padding")
    return em[em.index(b"\x00", 2) + 1 :]


@dataclass(frozen=True)
class EncryptionMapper:
    """Replace ``target_field`` with ``<target_field><suffix>`` holding the
    hex RSA-PKCS#1-v1.5 ciphertext of the value's string form
    (mappings.md:30-55). ``public_key`` is hex-encoded DER."""

    target_field: str
    public_key: str
    algorithm: str = "RSA"
    field_name_suffix: str = "_encrypted"

    def target_fields(self) -> Sequence[str]:
        return (self.target_field,)

    def apply(self, df: DataFrame) -> DataFrame:
        if self.algorithm != "RSA":
            raise MapperError(
                f"unsupported encryption algorithm {self.algorithm!r} "
                "(the reference supports RSA — mappings.md:32)"
            )
        n, e = parse_rsa_public_key_hex_der(self.public_key)

        @pandas_udf(T.StringType())
        def _encrypt(vals: pd.Series) -> pd.Series:
            out = []
            for v in vals:
                if v is None:
                    out.append(None)
                else:
                    out.append(
                        rsa_encrypt_pkcs1_v15(str(v).encode("utf-8"), n, e).hex()
                    )
            return pd.Series(out, dtype="object")

        new_name = f"{self.target_field}{self.field_name_suffix}"
        return _replace_in_place(
            df,
            self.target_field,
            new_name,
            _encrypt(F.col(self.target_field).cast("string")),
        )


# ---------------------------------------------------------------------------
# Rename
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FieldRenamingMapper:
    """Rename ``original_field_name`` -> ``new_field_name``
    (mappings.md:57-66), position-preserving."""

    original_field_name: str
    new_field_name: str

    def target_fields(self) -> Sequence[str]:
        return (self.original_field_name,)

    def apply(self, df: DataFrame) -> DataFrame:
        if self.new_field_name in df.columns:
            raise MapperError(
                f"rename target {self.new_field_name!r} already exists "
                "(mappings.md:66: avoid naming conflicts)"
            )
        return df.withColumnRenamed(self.original_field_name, self.new_field_name)


# ---------------------------------------------------------------------------
# Filter
# ---------------------------------------------------------------------------


def equal(field_name: str, comparison_value) -> dict:
    """EQUAL condition node (the reference's row-filter operation set)."""
    return {"type": "EQUAL", "fieldName": field_name,
            "comparisonValue": comparison_value}


def not_(condition: dict) -> dict:
    """NOT condition node wrapping one child condition."""
    return {"type": "NOT", "conditions": [condition]}


_FILTERABLE = (T.StringType, T.IntegerType, T.LongType, T.ShortType,
               T.ByteType, T.FloatType, T.DoubleType, T.DecimalType)


def _compile_condition(df: DataFrame, cond: dict) -> Column:
    ctype = cond.get("type")
    if ctype == "EQUAL":
        fname = cond["fieldName"]
        dtype = dict(zip(df.schema.fieldNames(), [f.dataType for f in df.schema]))
        if fname not in dtype:
            raise MapperError(f"filter field {fname!r} not in schema")
        if not isinstance(dtype[fname], _FILTERABLE):
            raise MapperError(
                f"filter field {fname!r} has type {dtype[fname].simpleString()}; "
                "only string and number fields are filterable (mappings.md:81)"
            )
        return F.col(fname) == F.lit(cond["comparisonValue"])
    if ctype == "NOT":
        (child,) = cond["conditions"]
        return ~_compile_condition(df, child)
    raise MapperError(f"unknown filter condition type {ctype!r}")


@dataclass(frozen=True)
class RowFilteringMapper:
    """Keep only rows matching the condition tree (mappings.md:68-82).
    Build conditions with :func:`equal` / :func:`not_`."""

    condition: dict

    def target_fields(self) -> Sequence[str]:
        def walk(c: dict):
            if c.get("type") == "EQUAL":
                yield c["fieldName"]
            else:
                for ch in c.get("conditions", ()):
                    yield from walk(ch)

        return tuple(walk(self.condition))

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(_compile_condition(df, self.condition))


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


def apply_mappers(
    df: DataFrame,
    mappers: Sequence,
    protected_fields: Sequence[str] = (),
) -> DataFrame:
    """Apply mappers in order (they compose: a rename feeds the next
    mapper's view of the schema, matching the reference's sequential
    per-stream mapper list). ``protected_fields`` — typically the
    stream's primary key + cursor — are refused per mappings.md:86:
    mapping them "disrupts Airbyte's ability to use them for incremental
    syncing and deduplication"."""
    protected = set(protected_fields)
    for m in mappers:
        hit = protected.intersection(m.target_fields())
        if hit:
            raise MapperError(
                f"mapper {type(m).__name__} targets protected field(s) "
                f"{sorted(hit)} (primary key / cursor — mappings.md:86)"
            )
        df = m.apply(df)
    return df
