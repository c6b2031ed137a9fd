"""Corpus-curation operators beyond dedup: benchmark decontamination,
line-level (paragraph) dedup, and PII redaction.

These are the standard pre-training curation passes (GPT-3 appendix C's
13-gram decontamination; CCNet/Dolma paragraph dedup; rule-based PII
scrubbing) expressed Spark-first over `documents(doc_id, text, ...)`:

- decontamination: train docs sharing >= K distinct word n-grams with any
  document of a (small) evaluation/benchmark set are flagged and dropped.
  Plan shape: the eval side collapses to ONE distinct shingle set that is
  broadcast (benchmarks are tiny next to a 100 TB corpus), the train side
  is a single explode -> broadcast-hash-join -> partial-agg count pass —
  one scan of the corpus, zero shuffles of corpus-sized data besides the
  final per-doc count agg on a 64-bit id. `broadcast_eval=False` keeps
  the same plan with a shuffle join for the rare giant-eval case.
- line dedup: split docs into lines, keep a line only in the lexically
  smallest (doc_id, line_pos) that carries its fingerprint, reassemble
  surviving text in original order. One explode + one groupBy(fingerprint)
  + one groupBy(doc) — all partial-agg friendly; no self-joins.
- PII redaction: pure regexp_replace chain (JVM codegen; no UDF) for
  email / ipv4 / ssn-like / long-digit-run patterns, the rule-based scrub
  every released corpus applies. Patterns stay in the regex subset that
  Java and RE2/DuckDB share so oracles can replicate byte-for-byte.

Reference behavior anchor: the reference's mappers scrub/hash fields
per-record (airbyte-cdk `MapperOperations`); decontamination and line
dedup have no reference analogue — they're part of the training-data
surface this engine adds (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbyte_spark.functions.dedup import shingles_udf
from airbyte_spark.functions.text import fingerprint64

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def contamination_overlap(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-train-doc count of distinct word n-grams shared with ANY eval
    doc: `(id_col, overlap_ngrams)`, only docs with overlap >= 1.

    The eval side is reduced to its distinct shingle set before the join;
    with `broadcast_eval` (default — benchmark suites are MBs, corpora are
    TBs) the join is a broadcast hash join, so the corpus is scanned once
    with no corpus-sized shuffle. Shingles are distinct per doc
    (shingles_udf), so `count(*)` after the join IS the distinct-overlap
    count — no count_distinct shuffle needed.
    """
    sh = shingles_udf(n)
    eval_ngrams = (
        eval_docs.select(F.explode(sh(F.col(text_col))).alias("_ng")).distinct()
    )
    if broadcast_eval:
        eval_ngrams = F.broadcast(eval_ngrams)
    train_ngrams = train.select(
        F.col(id_col), F.explode(sh(F.col(text_col))).alias("_ng")
    )
    return (
        train_ngrams.join(eval_ngrams, "_ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap_ngrams"))
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Drop train docs sharing >= `min_overlap` distinct word n-grams with
    the eval set (GPT-3-style n-gram decontamination). Returns the CLEAN
    train rows (all original columns)."""
    contaminated = (
        contamination_overlap(
            train, eval_docs, id_col, text_col, n, broadcast_eval
        )
        .where(F.col("overlap_ngrams") >= min_overlap)
        .select(id_col)
    )
    return train.join(contaminated, id_col, "left_anti")


# ---------------------------------------------------------------------------
# line-level dedup (CCNet / Dolma paragraph dedup)
# ---------------------------------------------------------------------------


def _lines_with_pos(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per line: (id, _pos, _line) via posexplode(split(text, '\\n')).
    Keeps empty lines (they carry formatting) — fingerprints are computed
    on the raw line bytes."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 0,
) -> DataFrame:
    """Corpus-wide line dedup: each distinct line survives only at its
    canonical occurrence — the smallest (id, position) carrying its
    fingerprint; every other copy (across AND within docs) is removed.
    Lines shorter than `min_len` characters are exempt (kept everywhere:
    short connective lines aren't boilerplate evidence). Returns
    `(id_col, text_col)` with text reassembled from surviving lines in
    original order; docs whose every line was removed keep an empty text.

    Plan: explode -> groupBy(fingerprint){min struct} -> join back on
    (fingerprint, id, pos) -> groupBy(id){array_agg sorted} — two
    partial-agg shuffles on slim keys, no self-join on text.
    """
    lines = _lines_with_pos(docs, id_col, text_col).withColumn(
        "_fp", fingerprint64(F.col("_line"))
    )
    dedupable = lines.where(F.length("_line") >= min_len)
    # canonical occurrence per fingerprint: lexicographic min of (id, pos)
    canon = dedupable.groupBy("_fp").agg(
        F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_c")
    )
    survivors = dedupable.join(canon, "_fp").where(
        (F.col(f"_c.{id_col}") == F.col(id_col)) & (F.col("_c._pos") == F.col("_pos"))
    ).select(id_col, "_pos", "_line")
    exempt = lines.where(F.length("_line") < min_len).select(id_col, "_pos", "_line")
    kept = survivors.unionByName(exempt)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias(text_col)
    )
    # docs that lost every line still appear (empty text), preserving count
    ids = docs.select(id_col)
    return (
        ids.join(rebuilt, id_col, "left")
        .select(id_col, F.coalesce(text_col, F.lit("")).alias(text_col))
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the regex subset Java and DuckDB (RE2) share:
# character classes, bounded repetition, alternation — no lookaround, no
# backreferences (RE2 has neither).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("digits", r"\b[0-9]{9,}\b", "<NUM>"),
]


def pii_redact(text: Column, patterns: list[tuple[str, str, str]] | None = None) -> Column:
    """Chain of regexp_replace redactions — whole-stage-codegen JVM
    expressions, no UDF. Order matters (email before digits: the local
    part may contain a long digit run)."""
    out = text
    for _name, pat, repl in patterns or PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------------------------
# repetition quality signals (Gopher rules)
# ---------------------------------------------------------------------------


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition signals (the Gopher-rule family), one Arrow
    pass per batch — the shingle-per-position HOF trap (CLAUDE.md gotcha
    11) makes JVM expressions the wrong tool here.

    Returns (id, n_tokens, dup_trigram_frac, top_unigram_frac,
    top_bigram_frac) where
      - dup_trigram_frac   = 1 - distinct/total trigrams (0 if < 3 tokens)
      - top_unigram_frac   = count of most frequent token / n_tokens
      - top_bigram_frac    = count of most frequent bigram / (n_tokens-1)
    over the same ASCII-whitespace normalization as every other text op
    (byte-identical with the SQL tokenizer)."""
    from collections import Counter

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from airbyte_spark.functions.dedup import _JAVA_WS

    schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("n_tokens", LongType()),
            StructField("dup_trigram_frac", DoubleType()),
            StructField("top_unigram_frac", DoubleType()),
            StructField("top_bigram_frac", DoubleType()),
        ]
    )

    def one(text):
        norm = _JAVA_WS.sub(" ", (text or "")).strip(" ").lower()
        toks = [w for w in norm.split(" ") if w]
        n = len(toks)
        tri_total = max(n - 2, 0)
        tris = [" ".join(toks[i : i + 3]) for i in range(tri_total)]
        dup_tri = 1.0 - len(set(tris)) / tri_total if tri_total else 0.0
        top_uni = max(Counter(toks).values()) / n if n else 0.0
        bi_total = max(n - 1, 0)
        bis = [" ".join(toks[i : i + 2]) for i in range(bi_total)]
        top_bi = max(Counter(bis).values()) / bi_total if bi_total else 0.0
        return (n, dup_tri, top_uni, top_bi)

    def sig(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [one(t) for t in pdf[text_col]]
            out = pd.DataFrame(
                rows,
                columns=[
                    "n_tokens",
                    "dup_trigram_frac",
                    "top_unigram_frac",
                    "top_bigram_frac",
                ],
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return docs.select(id_col, text_col).mapInPandas(sig, schema)


def gopher_quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_trigram_frac: float = 0.30,
    max_top_unigram_frac: float = 0.20,
    min_tokens: int = 5,
) -> DataFrame:
    """(id, signals..., keep): the Gopher repetition-rule filter — drop
    docs dominated by repeated n-grams or a single token. Thresholds are
    the knobs; defaults approximate the published Gopher cuts."""
    sig = repetition_signals(docs, id_col, text_col)
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_trigram_frac") <= max_dup_trigram_frac)
        & (F.col("top_unigram_frac") <= max_top_unigram_frac)
    )
    return sig.withColumn("keep", keep)


def chunk_documents(
    docs: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size character chunks with
    ``overlap`` carried between neighbors (the RAG / long-context
    pre-chunking shape). Chunk starts are 0, stride, 2*stride, ... with
    stride = chunk_size - overlap; the final chunk may be short; empty
    documents produce no chunks. Pure codegen — one sequence+explode per
    row, substring per generated ROW (not per HOF element, so nothing
    re-evaluates), no shuffle at all. Returns (id, chunk_id, start,
    chunk_text)."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be > 0: {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"overlap must be in [0, chunk_size): {overlap}")
    stride = chunk_size - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        docs.select(
            id_col,
            F.col(text_col).alias("_txt"),
            F.posexplode(starts).alias("chunk_id", "start"),
        )
        .filter(F.col("start") < F.length("_txt"))
        .select(
            id_col,
            "chunk_id",
            "start",
            F.substring(F.col("_txt"), F.col("start") + 1, chunk_size).alias(
                "chunk_text"
            ),
        )
    )


def quantile_gate(
    df: DataFrame,
    group_col: str,
    score_col: str,
    keep_frac: float,
) -> DataFrame:
    """Keep each group's top ``keep_frac`` fraction by score — the
    LAION-style per-source quality gate ("keep the best 30% of every
    domain"), where a single global threshold would let one domain's
    score distribution starve another's. The cutoff is the EXACT
    (1 - keep_frac) percentile per group (linear interpolation, the
    engine-portable definition corpus_report already pins); rows with
    score >= cutoff survive, NULL scores never do. A NULL group value
    is its own group (null-safe join); a group whose scores are ALL
    NULL has a NULL cutoff and is dropped entirely (no score evidence
    to gate on).

    Scale shape: one partial-agg percentile per group (value->count map
    state) broadcast-joined back onto the rows — no window over row
    data, no sort. Adds `_cutoff` nowhere: output schema == input
    schema."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1]: {keep_frac}")
    cuts = df.groupBy(group_col).agg(
        F.expr(f"percentile({score_col}, {1.0 - keep_frac})").alias("_cutoff")
    ).withColumnRenamed(group_col, "_gk")
    return (
        df.join(
            F.broadcast(cuts), F.col(group_col).eqNullSafe(F.col("_gk"))
        )
        .filter(F.col(score_col) >= F.col("_cutoff"))
        .select(*df.columns)
    )


def boilerplate_fraction(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    min_len: int = 1,
) -> DataFrame:
    """Per-doc boilerplate signal (the C4/CCNet frequent-line heuristic):
    the fraction of a document's lines whose NORMALIZED form appears in
    at least ``min_df`` distinct documents — nav bars, cookie banners
    and footers score high, prose scores low; gate on the fraction to
    drop template-dominated docs. Lines shorter than ``min_len`` raw
    characters are ignored (connective fragments aren't boilerplate
    evidence). Returns (id, n_lines, frequent_frac); docs with no
    eligible lines report (0, 0.0).

    Plan: explode lines once -> document-frequency partial-agg on the
    64-bit normalized-line fingerprint -> slim join back -> per-doc
    partial agg. Two shuffles on 8-byte keys; the text column never
    crosses an exchange."""
    lines = _lines_with_pos(docs, id_col, text_col).where(
        F.length("_line") >= min_len
    )
    lines = lines.select(id_col, fingerprint64(F.col("_line")).alias("_fp"))
    dfreq = lines.groupBy("_fp").agg(
        F.countDistinct(id_col).alias("_df")
    )
    tagged = lines.join(dfreq, "_fp").select(
        id_col, (F.col("_df") >= min_df).cast("int").alias("_freq")
    )
    per_doc = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"), F.sum("_freq").alias("_nf")
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.round(
                F.when(
                    F.col("n_lines") > 0,
                    F.col("_nf").cast("double") / F.col("n_lines"),
                ).otherwise(0.0),
                6,
            ).alias("frequent_frac"),
        )
    )


def clean_text(text: Column) -> Column:
    """Pre-tokenization text cleanup (the C4-style scrub): strip HTML
    tags, decode the common entities, drop control characters, collapse
    runs of whitespace, trim. A regexp_replace chain in pure JVM codegen
    — patterns restricted to the Java∩RE2 subset (same discipline as
    pii_redact) so a SQL oracle replays them byte-for-byte."""
    out = F.regexp_replace(text, r"<[^>]*>", " ")
    # &amp; decodes LAST (standard entity-decode order): doing it first
    # would turn escaped entity text ('&amp;lt;b&amp;gt;') into markup
    # and double-decode it
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    return F.trim(F.regexp_replace(out, r"\s+", " "))
