"""Property-based tests (hypothesis) for the pure driver-side /
numpy-side logic: FFD planner invariants, curve key bijectivity,
codec round-trips, boundary bucketing."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from airbyte_spark.codecs import decode_image, encode_image, psnr
from airbyte_spark.functions.curves import hilbert_key, zorder_key
from airbyte_spark.plans.ffd import plan_ffd

files_strategy = st.lists(
    st.tuples(
        st.uuids().map(str),
        st.integers(min_value=1, max_value=1_000_000),
        st.integers(min_value=1, max_value=10_000),
    ),
    min_size=0,
    max_size=200,
    unique_by=lambda f: f[0],
)


@given(files=files_strategy, target=st.integers(min_value=10, max_value=2_000_000))
@settings(max_examples=200, deadline=None)
def test_ffd_invariants(files, target):
    plan = plan_ffd(files, target_bytes=target)
    sizes = dict((p, b) for p, b, _ in files)
    seen = set()
    for b in plan.bins:
        # never exceed capacity unless a single file alone exceeds it
        if len(b.paths) > 1:
            assert b.bytes <= target
        assert len(b.paths) >= 2  # no no-op rewrites
        assert b.bytes == sum(sizes[p] for p in b.paths)
        for p in b.paths:
            assert p not in seen  # each file in at most one bin
            seen.add(p)
    assert plan.skipped_files + plan.input_files == len(files)


@given(
    bits=st.integers(min_value=1, max_value=8),
    ndims=st.integers(min_value=2, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=25, deadline=None)
def test_curve_keys_bijective_and_bounded(bits, ndims, seed):
    n = 1 << bits
    rng = np.random.default_rng(seed)
    total = n**ndims
    if total > 4096:
        idx = rng.integers(0, n, size=(ndims, 4096))
    else:
        grids = np.meshgrid(*([np.arange(n)] * ndims), indexing="ij")
        idx = np.stack([g.ravel() for g in grids])
    cols = [c.astype(np.float64) for c in idx]
    bounds = [(0, n - 1)] * ndims
    for fn in (zorder_key, hilbert_key):
        k = fn(cols, bounds, bits=bits)
        assert k.min() >= 0 and k.max() < total
        # injective on distinct points
        pts = set(map(tuple, idx.T.tolist()))
        assert len(set(k.tolist())) == len(pts)


@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
    fmt=st.sampled_from(["png", "jpeg"]),
)
@settings(max_examples=50, deadline=None)
def test_codec_roundtrip_properties(h, w, seed, fmt):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dec = decode_image(encode_image(px, fmt))
    assert dec.shape == px.shape
    if fmt == "png":
        assert np.array_equal(dec, px)
    else:
        assert psnr(px, dec) >= 40.0


@given(
    keys=st.lists(st.integers(min_value=-(2**40), max_value=2**40),
                  min_size=1, max_size=500),
    n_out=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=100, deadline=None)
def test_bucket_boundaries_partition_the_keyspace(keys, n_out):
    """Driver-side boundary math: every key lands in exactly one bucket,
    buckets are order-respecting."""
    pts = sorted(keys)
    step = len(pts) / n_out
    bounds = []
    for i in range(1, n_out):
        v = pts[min(len(pts) - 1, int(i * step))]
        if not bounds or v > bounds[-1]:
            bounds.append(v)

    def pid(k):
        return sum(1 for b in bounds if k >= b)

    assigned = [pid(k) for k in keys]
    assert all(0 <= p <= len(bounds) for p in assigned)
    # monotone: larger key -> same or larger bucket
    s = sorted(zip(keys, assigned))
    assert all(s[i][1] <= s[i + 1][1] for i in range(len(s) - 1))


@given(
    docs=st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
                min_size=0,
                max_size=12,
            ),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=40, deadline=None)
def test_minhash_batch_matches_scalar_definition(docs, k):
    """Property: the batch-vectorized k-min md5 signature equals the
    scalar min(md5(f'{i}|{s}')) definition on arbitrary unicode shingle
    sets (incl. empty lists -> the '' fallback)."""
    import hashlib

    import pandas as pd

    from airbyte_spark.functions.dedup import _md5_minhash_batch

    got = list(_md5_minhash_batch(pd.Series(docs), k))
    for shingles, sig in zip(docs, got):
        sh = shingles or [""]
        expect = [
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sh)
            for i in range(k)
        ]
        assert sig == expect


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=40, deadline=None)
def test_simhash_batch_matches_scalar_definition(texts):
    """Property: batch-vectorized simhash == the scalar FNV-1a/sign
    accumulation on arbitrary unicode text (and None)."""
    import pandas as pd

    from airbyte_spark.functions.dedup import _simhash_batch

    def scalar(t):
        toks = [w for w in (t or "").lower().split() if w]
        if not toks:
            return 0
        acc = [0] * 64
        for w in toks:
            h = 0xCBF29CE484222325
            for byt in w.encode("utf-8"):
                h = ((h ^ byt) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        sh = sum(1 << b for b in range(64) if acc[b] > 0)
        return sh - (1 << 64) if sh >= (1 << 63) else sh

    got = list(_simhash_batch(pd.Series(texts)))
    assert got == [scalar(t) for t in texts]


@given(
    name=st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=24,
    )
)
@settings(max_examples=60, deadline=None)
def test_avro_safe_name_always_valid(name):
    """Property: to_avro_safe_name output always matches the Avro
    identifier grammar [A-Za-z_][A-Za-z0-9_]*."""
    import re

    from airbyte_spark.functions.names import to_avro_safe_name

    out = to_avro_safe_name(name)
    assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", out), (name, out)


# ---------------------------------------------------------------------------
# nested schema evolution invariants (pure driver-side logic)
# ---------------------------------------------------------------------------

from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_leaf_types = st.sampled_from(
    [IntegerType(), LongType(), FloatType(), DoubleType(), StringType()]
)
_field_names = st.sampled_from(list("abcdef"))
_nested_types = st.recursive(
    _leaf_types,
    lambda t: st.one_of(
        st.builds(ArrayType, t),
        t.map(lambda v: MapType(StringType(), v)),
        st.dictionaries(_field_names, t, min_size=1, max_size=4).map(
            lambda d: StructType(
                [StructField(k, v, True) for k, v in sorted(d.items())]
            )
        ),
    ),
    max_leaves=8,
)
_schemas = st.dictionaries(_field_names, _nested_types, min_size=1, max_size=5).map(
    lambda d: StructType([StructField(k, v, True) for k, v in sorted(d.items())])
)


@given(t=_schemas, s=_schemas)
@settings(max_examples=150, deadline=None)
def test_merge_supertype_invariants(t, s):
    """Properties of the merge-path union supertype over ARBITRARY nested
    schemas: identity, legal-evolution (diff_schemas never raises on
    table -> supertype — the invariant the write path relies on), table
    field order preserved with source-only fields appended, idempotence."""
    from airbyte_spark.lake.evolve import diff_schemas, merge_supertype

    assert merge_supertype(t, t) == t
    m = merge_supertype(t, s)
    diff_schemas(t, m)  # must be a legal evolution of the table
    assert [f.name for f in m.fields][: len(t.fields)] == [
        f.name for f in t.fields
    ]
    assert set(m.fieldNames()) == set(t.fieldNames()) | set(s.fieldNames())
    assert merge_supertype(m, s) == m  # re-merging the same batch: no-op


@settings(max_examples=30, deadline=None)
@given(
    msg=st.binary(min_size=0, max_size=53),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_rsa_pkcs1_roundtrip_any_message(msg, seed):
    """RSAES-PKCS1-v1_5 (RFC 8017 §7.2): encrypt with the public key,
    decrypt with the private — identity for every message within the
    k-11 bound, under arbitrary padding randomness."""
    import random

    from airbyte_spark.functions.mappers import (
        rsa_decrypt_pkcs1_v15,
        rsa_encrypt_pkcs1_v15,
    )
    from tests.test_mappers import _gen_keypair

    n, e, d = _gen_keypair()  # fixed 512-bit test keypair (cached gen)
    rng = random.Random(seed)
    ct = rsa_encrypt_pkcs1_v15(msg, n, e, rng=lambda k: rng.randbytes(k))
    assert len(ct) == (n.bit_length() + 7) // 8
    assert rsa_decrypt_pkcs1_v15(ct, n, d) == msg
