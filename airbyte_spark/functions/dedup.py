"""Deduplication for training-data pipelines — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Spark-first design notes (all over `documents(doc_id, text, ...)`):

- exact: fingerprint (xxhash64 of normalized text) -> groupBy keep min id.
  One partial-agg shuffle; at 10^12 docs the fingerprint groupBy is the
  canonical map-side-combine pattern.
- MinHash: per-doc signature = [min over shingles of md5(i || shingle)]
  for k seeds — built with array expressions (transform/array_min), no
  explode, no shuffle until the LSH band groupBy. md5 (not xxhash64) so
  the DuckDB oracle can reproduce values bit-for-bit.
- LSH banding: signature split into b bands of r values; band hash ->
  groupBy(band, hash) emits candidate pairs only within buckets —
  turning O(n^2) similarity into O(sum bucket^2), the standard
  shuffle-bounded near-dup join at web scale.
- n-gram Jaccard verify: exact |A∩B|/|A∪B| on shingle sets of candidate
  pairs only (array_intersect/array_union on the pair rows).
- SimHash: 64-bit sign-aggregated token-hash — vectorized numpy over
  Arrow batches (pandas UDF); hamming-ball grouping via integer ops.
- embedding cosine: see functions/similarity.py; near-dup = cos >= tau.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from airbyte_spark.functions.text import fingerprint64, normalized_text, tokens


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per normalized-text fingerprint. Returns the
    surviving rows (canonical representative per duplicate class)."""
    fp = docs.withColumn("_fp", fingerprint64(F.col(text_col)))
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return (
        fp.join(keep, on=["_fp", id_col], how="inner")
        .drop("_fp")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams as an array<string> (empty-safe)."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    return F.when(
        k > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """array<string> signature: element i = min over shingles of
    md5(i || '|' || shingle). String-min over hex digests is a valid
    uniform min-hash (md5 is order-uniform on hex strings) and is exactly
    reproducible in any engine with md5().

    Built as ONE nested higher-order expression: sibling
    array_min(transform(...)) expressions in the same projection corrupt
    each other in Spark 4.1 (lambda-variable slot sharing; regression test
    in tests/test_text_dedup_similarity.py)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingles,
                lambda s: F.md5(F.concat(i.cast("string"), F.lit("|"), s)),
            )
        ),
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) that collide in >= 1 LSH band.
    Shuffle cost: one groupBy on (band, band_hash) — never all-pairs."""
    rows = num_hashes // bands
    # signature via explode + groupBy-min: the aggregation is a barrier
    # that materializes the signature once (sibling-HOF and nested-HOF
    # alternatives are either corrupt or recomputed per band on Spark 4.1
    # — see minhash_signature docstring and __spark_entry__)
    words = docs.select(
        F.col(id_col),
        F.explode(
            word_shingles(normalized_text(F.col(text_col)), shingle_n)
        ).alias("_w"),
    )
    sig = words.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("_w")))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "#",
                                *[f"_h{b * rows + j}" for j in range(rows)],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bhash")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (or LSH candidates if not
    given): returns (id_a, id_b, jaccard) with jaccard >= threshold."""
    if candidates is None:
        candidates = lsh_candidate_pairs(docs, id_col, text_col, shingle_n)
    sh = docs.select(
        F.col(id_col),
        word_shingles(normalized_text(F.col(text_col)), shingle_n).alias("_sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b"))
    j = (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return j


# ---------------------------------------------------------------------------
# SimHash (vectorized numpy over Arrow batches)
# ---------------------------------------------------------------------------


def _simhash_batch(texts: pd.Series, nbits: int = 64) -> pd.Series:
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = [w for w in (t or "").lower().split() if w]
        if not toks:
            continue
        # stable 64-bit token hashes via numpy (FNV-1a over bytes, vectorized
        # per unique token then weighted by count)
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        hs = np.empty(len(uniq), dtype=np.uint64)
        for k, w in enumerate(uniq):
            h = np.uint64(0xCBF29CE484222325)
            for byt in w.encode("utf-8"):
                h ^= np.uint64(byt)
                h = np.uint64((int(h) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF)
            hs[k] = h
        bits = ((hs[:, None] >> np.arange(nbits, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )  # (n_uniq, 64)
        acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        sh = np.uint64(0)
        for bpos in range(nbits):
            if acc[bpos] > 0:
                sh |= np.uint64(1) << np.uint64(bpos)
        out[i] = np.int64(sh.astype(np.int64))
    return pd.Series(out)


@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return _simhash_batch(text)


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidate-bucketed on
    16-bit sub-bands (a pair within hamming<=3 of 64 bits must agree on at
    least one of 4 16-bit bands — pigeonhole), then exact popcount verify.
    """
    sh = docs.select(F.col(id_col), simhash_udf(F.col(text_col)).alias("_sh"))
    bands = sh.select(
        id_col,
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("_sh", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "_sh", "bk.band", "bk.bh")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l._sh").alias("sh_a"),
            F.col("r._sh").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
