"""Text analysis for training-data pipelines — all built-in-function
expressions (JVM, whole-stage codegen; zero Python in the hot path).

These run over the `documents(doc_id, text, lang, source, n_chars)` table.
Each function returns Column expressions so Catalyst can pipeline them
into one projection over a column-pruned scan. Every operator here has a
matching ANSI-SQL oracle in __spark_entry__.py so the DuckDB gate verifies
values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword lists per language: tiny n-gram-free heuristic language ID —
# the share of whitespace tokens that are language stopwords.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "ein", "eine", "zu", "den", "von"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "que"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored token estimate: count word-piece-ish units — runs of
    letters, runs of digits, or single punctuation — via regex split.
    Deterministic, SQL-expressible, good for budget estimation."""
    return F.size(
        F.filter(
            F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda t: (t != "") & (t != " "),
        )
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = _STOPWORDS[lang]
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def detect_language(text: Column) -> Column:
    """Pick the language whose stopword ratio is highest (ties -> first
    alphabetically by construction of greatest-struct ordering)."""
    scored = [
        F.struct(stopword_ratio(text, lg).alias("score"), F.lit(lg).alias("lang"))
        for lg in sorted(_STOPWORDS)
    ]
    best = F.greatest(*scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, r"[^\p{L}\p{N}\s]", ""))
    return F.when(n > 0, (n - stripped).cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    punctuation sanity + word-length sanity. The exact formula matters less
    than its determinism — it gates training-data filtering."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    p = punct_ratio(text)
    punct_score = F.when(p < 0.3, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (p - 0.3) * 2.0)
    )
    mwl = mean_word_length(text)
    word_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score + stop_score + punct_score + word_score) / F.lit(4.0)


def fingerprint64(text: Column) -> Column:
    """Document fingerprint: 64-bit stable hash of normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.xxhash64(normalized)


def normalized_text(text: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def corpus_report(docs, group_cols=("source", "lang"), text_col="text"):
    """Per-group corpus statistics for mixture design: doc count, token
    and char totals, mean and EXACT median/p90 token counts (exact —
    not approx_percentile — so a DuckDB oracle agrees bit-for-bit;
    Spark's exact percentile aggregates a value->count map per group,
    partial-agg-combinable and bounded by the distinct token-count
    range, so the shape survives 10^12 rows — switch to
    percentile_approx only if ±1% is acceptable)."""
    from pyspark.sql import functions as F

    t = token_count(F.col(text_col)).cast("long")
    pre = docs.select(
        *group_cols,
        t.alias("_t"),
        F.length(F.col(text_col)).cast("long").alias("_c"),
    )
    return pre.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("_t").alias("tokens"),
        F.sum("_c").alias("chars"),
        F.round(F.avg("_t"), 6).alias("mean_tokens"),
        F.round(F.expr("percentile(_t, 0.5)"), 6).alias("median_tokens"),
        F.round(F.expr("percentile(_t, 0.9)"), 6).alias("p90_tokens"),
    )


def build_vocab(
    docs, size: int, text_col: str = "text", min_count: int = 1
):
    """Top-``size`` vocabulary by corpus frequency (tokenizer-training
    prep): lowercase whitespace tokens -> partial-agg count ->
    TakeOrderedAndProject top-k (count desc, token asc — deterministic
    ties), rank assigned AFTER the limit so the only single-partition
    window runs over at most ``size`` rows. Returns (rank, token, count)
    with rank 1-based."""
    from pyspark.sql import Window

    counted = (
        docs.select(
            F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(size)
    )
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return counted.select(
        F.row_number().over(w).alias("rank"), "token", "count"
    )


def lexical_signals(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc lexical-diversity signals (the Gopher-adjacent quality
    family): token count, type-token ratio (distinct lowercased tokens /
    tokens — repetitive spam scores low), sentence count ([.!?]+
    segments with any non-space content), and mean tokens per sentence.
    Pure codegen; every ratio is an exact small-int quotient so a SQL
    oracle agrees bit-for-bit. The token array is STAGED in its own
    projection so the final select holds a single lambda expression —
    multiple sibling HOF lambdas in one projection is the Spark 4.1
    shared-lambda-slot corruption shape (CLAUDE.md gotcha 4)."""
    staged = docs.select(
        id_col,
        F.col(text_col),
        F.transform(tokens(F.col(text_col)), F.lower).alias("_toks"),
    )
    n = F.size(F.col("_toks"))
    distinct_n = F.size(F.array_distinct(F.col("_toks")))
    sents = F.size(
        F.filter(
            F.split(F.col(text_col), r"[.!?]+"),
            lambda s: F.trim(s) != "",
        )
    )
    return staged.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.round(
            F.when(n > 0, distinct_n.cast("double") / n.cast("double"))
            .otherwise(0.0),
            6,
        ).alias("type_token_ratio"),
        sents.cast("long").alias("n_sentences"),
        F.round(
            F.when(sents > 0, n.cast("double") / sents.cast("double"))
            .otherwise(0.0),
            6,
        ).alias("avg_sentence_tokens"),
    )


def build_ngram_vocab(
    docs, n: int, size: int, text_col: str = "text", min_count: int = 1
):
    """Top-``size`` word n-grams by corpus frequency (tokenizer /
    contamination-list prep), same contract as build_vocab: (rank,
    token, count) with deterministic (count desc, gram asc) ties. The
    token array is STAGED in its own projection, so the per-position
    lambda only slices an already-materialized array — the re-tokenize-
    per-position HOF trap (CLAUDE.md gotcha 11) never fires — and the
    only other lambda lives in a separate select (gotcha 4)."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    staged = docs.select(
        F.transform(tokens(F.col(text_col)), F.lower).alias("_toks")
    )
    grams_col = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
            lambda i: F.array_join(F.slice(F.col("_toks"), i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        staged.select(F.explode(grams_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(size)
    )
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return counted.select(
        F.row_number().over(w).alias("rank"), "token", "count"
    )
