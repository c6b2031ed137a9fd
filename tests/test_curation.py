"""Curation operators: benchmark decontamination, line-level dedup, PII
redaction (functions/curation.py). The oracle entries (`decontaminate`,
`line_dedup`, `pii_redact`) pin cross-engine value parity; these tests pin
the semantics and the plan shapes the oracles can't see."""

import pytest
from pyspark.sql import functions as F

from airbyte_spark.functions.curation import (
    PII_PATTERNS,
    contamination_overlap,
    decontaminate,
    line_dedup,
    pii_redact,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_counts_distinct_shared_ngrams(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words appear in this document here"),
            (3, "the quick brown fox sat still"),
        ],
    )
    ev = _docs(spark, [(100, "quick brown fox jumps high and the quick brown fox")])
    got = {
        r["doc_id"]: r["overlap_ngrams"]
        for r in contamination_overlap(train, ev, n=3).collect()
    }
    # eval trigrams: {quick brown fox, brown fox jumps, fox jumps high,
    #                 jumps high and, high and the, and the quick, the quick brown}
    # doc1 shares: the quick brown / quick brown fox / brown fox jumps -> 3
    # doc3 shares: the quick brown / quick brown fox -> 2; doc2 none
    assert got == {1: 3, 3: 2}


def test_decontaminate_drops_exactly_the_flagged_docs(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "alpha beta gamma something else entirely"),
        ],
    )
    ev = _docs(spark, [(9, "alpha beta gamma delta")])
    # doc1 shares 'alpha beta gamma' and 'beta gamma delta' (2);
    # doc3 shares 'alpha beta gamma' (1)
    clean1 = {r["doc_id"] for r in decontaminate(train, ev, min_overlap=2).collect()}
    assert clean1 == {2, 3}
    clean2 = {r["doc_id"] for r in decontaminate(train, ev, min_overlap=1).collect()}
    assert clean2 == {2}


def test_decontaminate_broadcasts_the_eval_side(spark):
    train = _docs(spark, [(i, f"w{i} w{i + 1} w{i + 2} w{i + 3}") for i in range(50)])
    ev = _docs(spark, [(0, "w1 w2 w3")])
    p = contamination_overlap(train, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p[:800]


def test_decontaminate_empty_eval_keeps_everything(spark):
    train = _docs(spark, [(1, "a b c d"), (2, "e f g h")])
    ev = train.where(F.lit(False))
    assert decontaminate(train, ev).count() == 2


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------


def test_line_dedup_keeps_canonical_occurrence_only(spark):
    docs = _docs(
        spark,
        [
            (1, "unique one\nboilerplate footer\nunique two"),
            (2, "boilerplate footer\nunique three"),
            (3, "unique four\nboilerplate footer"),
        ],
    )
    out = {r["doc_id"]: r["text"] for r in line_dedup(docs).collect()}
    # footer survives only in doc 1 (smallest doc_id), at its position
    assert out[1] == "unique one\nboilerplate footer\nunique two"
    assert out[2] == "unique three"
    assert out[3] == "unique four"


def test_line_dedup_within_doc_repetition_removed(spark):
    docs = _docs(spark, [(1, "spam\nspam\nspam\nham")])
    out = line_dedup(docs).collect()[0]["text"]
    assert out == "spam\nham"


def test_line_dedup_normalizes_before_matching(spark):
    docs = _docs(spark, [(1, "Hello   World"), (2, "hello world")])
    out = {r["doc_id"]: r["text"] for r in line_dedup(docs).collect()}
    assert out == {1: "Hello   World", 2: ""}


def test_line_dedup_doc_losing_all_lines_survives_empty(spark):
    docs = _docs(spark, [(1, "only line"), (2, "only line")])
    out = {r["doc_id"]: r["text"] for r in line_dedup(docs).collect()}
    assert out == {1: "only line", 2: ""}


def test_line_dedup_min_len_exempts_short_lines(spark):
    docs = _docs(spark, [(1, "ok\nlong shared line"), (2, "ok\nlong shared line")])
    out = {r["doc_id"]: r["text"] for r in line_dedup(docs, min_len=5).collect()}
    # 'ok' (< 5 chars) is exempt and survives in both docs
    assert out == {1: "ok\nlong shared line", 2: "ok"}


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "raw,expect",
    [
        ("mail me at jo.hn+x@sub.example.co today", "mail me at <EMAIL> today"),
        ("server 192.168.10.254 down", "server <IP> down"),
        ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
        ("card 4111111111111111 used", "card <NUM> used"),
        ("short 12345678 stays", "short 12345678 stays"),
        ("a@b.io and 1.2.3.4", "<EMAIL> and <IP>"),
    ],
)
def test_pii_redact_patterns(spark, raw, expect):
    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(pii_redact(F.col("text")).alias("r")).collect()[0]["r"]
    assert got == expect


def test_pii_redact_is_pure_codegen(spark):
    df = spark.range(5).select(
        pii_redact(F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@x.com")))
        .alias("r")
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert len(PII_PATTERNS) == 4


# ---------------------------------------------------------------------------
# Gopher repetition signals
# ---------------------------------------------------------------------------


def test_repetition_signals_values(spark):
    from airbyte_spark.functions.curation import repetition_signals

    docs = _docs(
        spark,
        [
            (1, "a b c a b c a b c"),  # 9 toks, 7 tris all dup of 3 kinds
            (2, "one two three four five"),  # no repetition
            (3, "x x x x"),  # single token dominates
        ],
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    r1 = got[1]
    assert r1["n_tokens"] == 9
    # trigrams: 7 total, 3 distinct -> dup frac 4/7
    assert abs(r1["dup_trigram_frac"] - 4 / 7) < 1e-12
    assert abs(r1["top_unigram_frac"] - 3 / 9) < 1e-12
    # bigrams: 8 total, top ('a b' or 'b c') appears 3 times
    assert abs(r1["top_bigram_frac"] - 3 / 8) < 1e-12
    assert got[2]["dup_trigram_frac"] == 0.0
    assert got[3]["top_unigram_frac"] == 1.0


def test_gopher_filter_keep_decision(spark):
    from airbyte_spark.functions.curation import gopher_quality_filter

    docs = _docs(
        spark,
        [
            (1, "clean varied words make a good document indeed truly"),
            (2, "spam spam spam spam spam spam spam spam"),
            (3, "hi"),  # too short
        ],
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in gopher_quality_filter(docs, min_tokens=5).collect()
    }
    assert got == {1: True, 2: False, 3: False}


def test_repetition_signals_empty_text(spark):
    from airbyte_spark.functions.curation import repetition_signals

    docs = _docs(spark, [(1, ""), (2, None)])
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    for i in (1, 2):
        assert got[i]["n_tokens"] == 0
        assert got[i]["dup_trigram_frac"] == 0.0
        assert got[i]["top_unigram_frac"] == 0.0


def test_corpus_report_exact_percentiles(spark):
    """corpus_report's median/p90 are EXACT linear-interpolated
    percentiles (hand-checked), not approximations."""
    from airbyte_spark.functions.text import corpus_report

    rows = [("s", "en", " ".join(["w"] * n)) for n in (1, 2, 3, 10)]
    rows += [("s", "de", "a b"), ("s", "de", "")]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {(r["source"], r["lang"]): r for r in corpus_report(df).collect()}
    en = got[("s", "en")]
    # sorted token counts [1,2,3,10]: median = 2.5, p90 at pos 2.7 -> 3+0.7*7
    assert en["docs"] == 4 and en["tokens"] == 16
    assert en["median_tokens"] == 2.5
    assert en["p90_tokens"] == 7.9
    assert en["mean_tokens"] == 4.0
    de = got[("s", "de")]
    assert de["docs"] == 2 and de["tokens"] == 2 and de["median_tokens"] == 1.0


def test_chunk_documents_offsets_and_overlap(spark):
    from airbyte_spark.functions.curation import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xyz"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_size=4, overlap=1).collect()
    got = {(r["doc_id"], r["chunk_id"]): (r["start"], r["chunk_text"]) for r in out}
    # doc 1 (len 10, stride 3): starts 0,3,6,9
    assert got[(1, 0)] == (0, "abcd")
    assert got[(1, 1)] == (3, "defg")
    assert got[(1, 2)] == (6, "ghij")
    assert got[(1, 3)] == (9, "j")
    assert got[(2, 0)] == (0, "xyz")
    assert len(got) == 5  # empty and null docs produce no chunks
    # every neighbor pair shares exactly `overlap` characters
    assert got[(1, 1)][1][:1] == got[(1, 0)][1][-1:]

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_size=4, overlap=4)
    with pytest.raises(ValueError, match="chunk_size"):
        chunk_documents(df, chunk_size=0)


def test_chunk_documents_no_shuffle(spark):
    from airbyte_spark.functions.curation import chunk_documents

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("hello world " * 20).alias("text")
    )
    plan = (
        chunk_documents(df, 64, 8)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_build_vocab_rank_and_ties(spark):
    from airbyte_spark.functions.text import build_vocab

    df = spark.createDataFrame(
        [(1, "b a a A c b"), (2, "a B z")], "doc_id long, text string"
    )
    out = build_vocab(df, size=3).collect()
    assert [(r["rank"], r["token"], r["count"]) for r in out] == [
        (1, "a", 4),
        (2, "b", 3),
        (3, "c", 1),  # ties (c=z=1) break alphabetically
    ]
    out2 = build_vocab(df, size=10, min_count=2).collect()
    assert {r["token"] for r in out2} == {"a", "b"}


def test_quality_representatives_chain_and_singletons(spark):
    """Chains collapse to one survivor chosen by quality (not id); docs
    in no pair always survive."""
    from airbyte_spark.functions.dedup import quality_representatives

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (7, 5), (9, 1)],
        "doc_id long, q long",
    )
    # chain 1-2, 2-3 -> one cluster {1,2,3}; 7 and 9 unpaired
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r["doc_id"]: r for r in quality_representatives(docs, pairs, "q").collect()}
    assert [out[i]["keep"] for i in (1, 2, 3)] == [False, True, False]  # q=99 wins
    assert out[1]["component"] == out[2]["component"] == out[3]["component"] == 1
    assert out[7]["keep"] and out[9]["keep"]
    assert out[7]["component"] == 7 and out[9]["component"] == 9


def test_quality_representatives_tie_breaks_to_lowest_id(spark):
    from airbyte_spark.functions.dedup import quality_representatives

    docs = spark.createDataFrame(
        [(4, 7), (5, 7), (6, 7)], "doc_id long, q long"
    )
    pairs = spark.createDataFrame([(5, 4), (6, 5)], "id_a long, id_b long")
    out = {r["doc_id"]: r["keep"] for r in quality_representatives(docs, pairs, "q").collect()}
    assert out == {4: True, 5: False, 6: False}


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    texts=st.lists(
        st.text(alphabet="ab \n", max_size=40), min_size=1, max_size=20
    ),
    chunk=st.integers(1, 12),
    overlap_frac=st.floats(0, 0.99),
)
@settings(max_examples=12, deadline=None)
def test_chunk_documents_matches_python_reference(
    spark, texts, chunk, overlap_frac
):
    """chunk_documents == the sequential python chunker for ANY texts
    (incl. empty), chunk size, and overlap."""
    from airbyte_spark.functions.curation import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["start"], r["chunk_text"])
        for r in chunk_documents(df, chunk, overlap).collect()
    }
    want = {}
    for i, t in rows:
        for ci, s in enumerate(range(0, len(t), stride)):
            want[(i, ci)] = (s, t[s : s + chunk])
    assert got == want


def test_quantile_gate_per_group_cutoffs(spark):
    from airbyte_spark.functions.curation import quantile_gate

    rows = [("a", i, float(i)) for i in range(10)]            # scores 0..9
    rows += [("b", 100 + i, float(100 + i)) for i in range(10)]  # 100..109
    rows += [("b", 999, None)]
    df = spark.createDataFrame(rows, "g string, id long, s double")
    out = quantile_gate(df, "g", "s", keep_frac=0.2)
    got = {r["g"]: sorted(x["id"] for x in out.collect() if x["g"] == r["g"])
           for r in out.select("g").distinct().collect()}
    # 80th percentile of 0..9 is 7.2 -> keep 8, 9; of 100..109 -> 108, 109
    assert got == {"a": [8, 9], "b": [108, 109]}
    assert out.columns == df.columns
    with pytest.raises(ValueError, match="keep_frac"):
        quantile_gate(df, "g", "s", 0.0)


def test_quantile_gate_keep_all(spark):
    from airbyte_spark.functions.curation import quantile_gate

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 6.0)], "g string, id long, s double"
    )
    assert quantile_gate(df, "g", "s", 1.0).count() == 2


def test_boilerplate_fraction_frequent_lines(spark):
    from airbyte_spark.functions.curation import boilerplate_fraction

    footer = "subscribe to our newsletter"
    rows = [
        (1, f"real prose one\n{footer}"),
        (2, f"other unique text\n{footer}\nmore words"),
        (3, footer),           # pure boilerplate
        (4, "entirely unique document"),
        (5, ""),               # no eligible lines
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["frequent_frac"])
        for r in boilerplate_fraction(df).collect()
    }
    assert got[1] == (2, 0.5)
    assert got[2] == (3, round(1 / 3, 6))
    assert got[3] == (1, 1.0)
    assert got[4] == (1, 0.0)
    assert got[5] == (0, 0.0)


def test_boilerplate_fraction_normalizes_and_counts_distinct_docs(spark):
    """Whitespace/case variants of a line are ONE line; within-doc
    repetition does not raise document frequency."""
    from airbyte_spark.functions.curation import boilerplate_fraction

    rows = [
        (1, "Cookie   Notice"),
        (2, "cookie notice"),
        (3, "solo line\nsolo line\nsolo line"),  # df=1 despite 3 copies
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["frequent_frac"]
        for r in boilerplate_fraction(df).collect()
    }
    assert got[1] == 1.0 and got[2] == 1.0
    assert got[3] == 0.0


def test_clean_text_rules(spark):
    from airbyte_spark.functions.curation import clean_text

    cases = [
        ("<p>Hello &amp; <b>world</b></p>", "Hello & world"),
        ("a\x00b\x07c\x1fd", "abcd"),
        ("  lots\t\tof\n\nspace  ", "lots of space"),
        ("&lt;kept&gt; &quot;q&quot; &#39;s&#39;", "<kept> \"q\" 's'"),
        ("<div\nclass='x'>multi\nline tag</div>", "multi line tag"),
        (None, None),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    got = [r["c"] for r in df.select(clean_text(F.col("t")).alias("c")).collect()]
    assert got == [w for _, w in cases]


def test_lexical_signals(spark):
    from airbyte_spark.functions.text import lexical_signals

    rows = [
        (1, "The cat. The CAT! A dog?"),
        (2, "spam spam spam spam"),
        (3, ""),
        (4, "no terminal punctuation here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lexical_signals(df).collect()}
    # doc 1: tokens [the,cat.,the,cat!,a,dog?] -- tokenizer is whitespace;
    # punctuation stays attached, so 6 tokens, 6 distinct forms
    assert got[1]["n_tokens"] == 6
    assert got[1]["n_sentences"] == 3
    assert got[1]["avg_sentence_tokens"] == 2.0
    assert got[2]["type_token_ratio"] == 0.25
    assert got[2]["n_sentences"] == 1  # no terminal punct -> one segment
    assert got[3]["n_tokens"] == 0 and got[3]["avg_sentence_tokens"] == 0.0
    assert got[4]["n_sentences"] == 1


def test_quantile_gate_null_group_is_its_own_group(spark):
    from airbyte_spark.functions.curation import quantile_gate

    rows = [("a", 1, 1.0), ("a", 2, 2.0), (None, 3, 5.0), (None, 4, 9.0)]
    df = spark.createDataFrame(rows, "g string, id long, s double")
    kept = {r["id"] for r in quantile_gate(df, "g", "s", 0.5).collect()}
    assert kept == {2, 4}  # NULL group gated like any other
    all_kept = {r["id"] for r in quantile_gate(df, "g", "s", 1.0).collect()}
    assert all_kept == {1, 2, 3, 4}


def test_clean_text_escaped_entities_decode_once(spark):
    """'&amp;lt;' is the literal TEXT '&lt;' — decoding &amp; first
    would double-decode it into markup."""
    from airbyte_spark.functions.curation import clean_text

    df = spark.createDataFrame([("use &amp;lt;b&amp;gt; for bold",)], "t string")
    got = df.select(clean_text(F.col("t")).alias("c")).first()["c"]
    assert got == "use &lt;b&gt; for bold"


def test_build_ngram_vocab_bigrams(spark):
    from airbyte_spark.functions.text import build_ngram_vocab

    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "A b x")], "doc_id long, text string"
    )
    out = build_ngram_vocab(df, n=2, size=10).collect()
    got = [(r["rank"], r["token"], r["count"]) for r in out]
    # bigrams: doc1 [a b, b c, c a, a b], doc2 [a b, b x]
    assert got[0] == (1, "a b", 3)
    assert ("b c" in {t for _, t, _ in got}) and ("b x" in {t for _, t, _ in got})
    # docs shorter than n produce nothing
    short = spark.createDataFrame([(1, "only"), (2, "")], "doc_id long, text string")
    assert build_ngram_vocab(short, n=2, size=5).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n must be"):
        build_ngram_vocab(df, n=0, size=5)
