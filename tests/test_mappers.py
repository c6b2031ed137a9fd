"""Stream mappers (hash / encrypt / rename / filter) — the reference's
Mappings feature (docs/platform/using-airbyte/mappings.md)."""

import hashlib

import pytest

from airbyte_spark.functions.mappers import (
    EncryptionMapper,
    FieldRenamingMapper,
    HashingMapper,
    MapperError,
    RowFilteringMapper,
    apply_mappers,
    equal,
    not_,
    parse_rsa_public_key_hex_der,
    rsa_decrypt_pkcs1_v15,
    rsa_encrypt_pkcs1_v15,
)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            (1, "ada", "ada@example.com", "US", 100.5),
            (2, "bob", "bob@example.com", "DE", -3.0),
            (3, "eve", None, "US", 7.25),
        ],
        "id int, name string, email string, country string, balance double",
    )


# ---------------------------------------------------------------------------
# Hash
# ---------------------------------------------------------------------------


def test_hash_replaces_field_in_place(people):
    out = HashingMapper("email", method="SHA-256").apply(people)
    assert out.columns == ["id", "name", "email_hashed", "country", "balance"]
    rows = {r["id"]: r["email_hashed"] for r in out.collect()}
    assert rows[1] == hashlib.sha256(b"ada@example.com").hexdigest()
    assert rows[3] is None  # null stays null, not hash("")


@pytest.mark.parametrize(
    "method,fn",
    [
        ("MD5", hashlib.md5),
        ("SHA-1", hashlib.sha1),
        ("SHA-256", hashlib.sha256),
        ("SHA-384", hashlib.sha384),
        ("SHA-512", hashlib.sha512),
    ],
)
def test_hash_methods_match_hashlib(people, method, fn):
    out = HashingMapper("name", method=method).apply(people)
    got = {r["id"]: r["name_hashed"] for r in out.collect()}
    assert got[2] == fn(b"bob").hexdigest()


def test_hash_non_string_field_hashes_string_form(people):
    out = HashingMapper("id", method="MD5").apply(people)
    got = {r["name"]: r["id_hashed"] for r in out.collect()}
    assert got["ada"] == hashlib.md5(b"1").hexdigest()


def test_hash_unknown_method_rejected(people):
    with pytest.raises(MapperError, match="MD2"):
        HashingMapper("name", method="MD2").apply(people)


def test_hash_stays_jvm_side(people):
    plan = (
        HashingMapper("email", method="SHA-512")
        .apply(people)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # codegen expression, not a UDF


# ---------------------------------------------------------------------------
# RSA encrypt
# ---------------------------------------------------------------------------


def _miller_rabin(n: int) -> bool:
    if n % 2 == 0:
        return n == 2
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_keypair(bits=512, seed=7):
    """Deterministic small RSA keypair for tests (pure Python)."""
    import random

    rng = random.Random(seed)

    def prime(b):
        while True:
            p = rng.getrandbits(b) | (1 << (b - 1)) | 1
            if _miller_rabin(p):
                return p

    p, q = prime(bits // 2), prime(bits // 2)
    while q == p:
        q = prime(bits // 2)
    n, e = p * q, 65537
    d = pow(e, -1, (p - 1) * (q - 1))
    return n, e, d


def _spki_hex(n: int, e: int) -> str:
    """Minimal DER SubjectPublicKeyInfo encoder (test-side only)."""

    def tlv(tag, body):
        ln = len(body)
        if ln < 0x80:
            return bytes([tag, ln]) + body
        lb = ln.to_bytes((ln.bit_length() + 7) // 8, "big")
        return bytes([tag, 0x80 | len(lb)]) + lb + body

    def integer(x):
        b = x.to_bytes((x.bit_length() + 7) // 8 or 1, "big")
        if b[0] & 0x80:
            b = b"\x00" + b
        return tlv(0x02, b)

    rsa_pub = tlv(0x30, integer(n) + integer(e))
    alg = tlv(0x30, tlv(0x06, bytes.fromhex("2a864886f70d010101")) + tlv(0x05, b""))
    return tlv(0x30, alg + tlv(0x03, b"\x00" + rsa_pub)).hex()


def test_rsa_spki_parse_roundtrip():
    n, e, _ = _gen_keypair()
    assert parse_rsa_public_key_hex_der(_spki_hex(n, e)) == (n, e)


def test_rsa_encrypt_decrypt_roundtrip():
    n, e, d = _gen_keypair()
    ct = rsa_encrypt_pkcs1_v15(b"secret \xf0\x9f\x94\x92", n, e)
    assert len(ct) == (n.bit_length() + 7) // 8
    assert rsa_decrypt_pkcs1_v15(ct, n, d) == b"secret \xf0\x9f\x94\x92"


def test_rsa_message_too_long_rejected():
    n, e, _ = _gen_keypair()
    with pytest.raises(MapperError, match="too long"):
        rsa_encrypt_pkcs1_v15(b"x" * 64, n, e)  # 512-bit key: max 53


def test_encryption_mapper_end_to_end(people):
    n, e, d = _gen_keypair()
    out = EncryptionMapper("email", public_key=_spki_hex(n, e)).apply(people)
    assert out.columns == ["id", "name", "email_encrypted", "country", "balance"]
    rows = {r["id"]: r["email_encrypted"] for r in out.collect()}
    assert rows[3] is None
    # reversible with the private key (the destination owner's side)
    pt = rsa_decrypt_pkcs1_v15(bytes.fromhex(rows[1]), n, d)
    assert pt == b"ada@example.com"
    # padding is randomized: same plaintext -> different ciphertexts
    rows2 = {
        r["id"]: r["email_encrypted"]
        for r in EncryptionMapper("email", public_key=_spki_hex(n, e))
        .apply(people)
        .collect()
    }
    assert rows2[1] != rows[1]
    assert rsa_decrypt_pkcs1_v15(bytes.fromhex(rows2[1]), n, d) == b"ada@example.com"


def test_encryption_unsupported_algorithm(people):
    with pytest.raises(MapperError, match="algorithm"):
        EncryptionMapper("email", public_key="00", algorithm="AES").apply(people)


# ---------------------------------------------------------------------------
# Rename / filter / pipeline
# ---------------------------------------------------------------------------


def test_rename_preserves_position(people):
    out = FieldRenamingMapper("country", "region_code").apply(people)
    assert out.columns == ["id", "name", "email", "region_code", "balance"]


def test_rename_conflict_rejected(people):
    with pytest.raises(MapperError, match="already exists"):
        FieldRenamingMapper("country", "name").apply(people)


def test_filter_equal_and_not(people):
    keep_us = RowFilteringMapper(equal("country", "US")).apply(people)
    assert sorted(r["id"] for r in keep_us.collect()) == [1, 3]
    drop_us = RowFilteringMapper(not_(equal("country", "US"))).apply(people)
    assert [r["id"] for r in drop_us.collect()] == [2]


def test_filter_number_field(people):
    out = RowFilteringMapper(equal("balance", -3.0)).apply(people)
    assert [r["id"] for r in out.collect()] == [2]


def test_filter_non_scalar_field_rejected(spark):
    df = spark.createDataFrame([([1, 2],)], "xs array<int>")
    with pytest.raises(MapperError, match="only string and number"):
        RowFilteringMapper(equal("xs", [1, 2])).apply(df)


def test_pipeline_order_and_protected_fields(people):
    out = apply_mappers(
        people,
        [
            FieldRenamingMapper("email", "contact"),
            HashingMapper("contact", method="MD5"),  # sees the rename
            RowFilteringMapper(not_(equal("country", "DE"))),
        ],
        protected_fields=["id"],
    )
    assert out.columns == ["id", "name", "contact_hashed", "country", "balance"]
    assert sorted(r["id"] for r in out.collect()) == [1, 3]

    with pytest.raises(MapperError, match="protected"):
        apply_mappers(
            people, [HashingMapper("id", method="MD5")], protected_fields=["id"]
        )


@pytest.mark.parametrize(
    "bad",
    [
        "zz-not-hex",
        "",
        "30",  # lone SEQUENCE tag, no length byte
        "3082ffff0201",  # length overruns the buffer
        "300602010002",  # inner INTEGER truncated
    ],
)
def test_malformed_rsa_key_raises_mapper_error(bad):
    """Truncated/malformed hex-DER keys surface as the documented
    MapperError (config error), never IndexError (ADVICE r3)."""
    from airbyte_spark.functions.mappers import (
        MapperError,
        parse_rsa_public_key_hex_der,
    )

    with pytest.raises(MapperError):
        parse_rsa_public_key_hex_der(bad)
