"""X5 text analysis + scalar text functions."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from serverless_data_pipeline_spark.functions.text import (
    fingerprint, token_count, tokens, word_shingles,
)
from serverless_data_pipeline_spark.operators.text import (
    fingerprint_documents, language_id, quality_features, token_stats,
)


def test_tokens_empty_and_whitespace(spark):
    df = spark.createDataFrame([("",), ("   ",), ("a  b",)], "t string")
    got = [r[0] for r in df.select(token_count("t")).collect()]
    assert got == [0, 0, 2]


def test_word_shingles_short_text(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "t string")
    got = [r[0] for r in df.select(word_shingles("t", 3)).collect()]
    assert got == [["a b"], ["a b c", "b c d"]]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("  Hello   World ",), ("hello world",)],
                               "t string")
    fps = [r[0] for r in df.select(fingerprint("t")).collect()]
    assert fps[0] == fps[1] == hashlib.md5(b"hello world").hexdigest()


def test_language_id_on_marker_sentences(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is of to"),
         (2, "el que la los es la que"),
         (3, "der und die das ist der"),
         (4, "le les des est une les"),
         (5, "xyzzy qwerty plugh"),
         (6, "你好 世界")],
        "doc_id long, text string")
    got = {r.doc_id: r.predicted_lang
           for r in language_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und", 6: "zh"}


def test_quality_features_values(spark):
    text = "this is a clean sentence with plenty of simple words"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = quality_features(df).first()
    assert row.q_tokens == 10
    assert row.q_punct_ratio == 0.0
    assert row.q_score == 1.0  # len in range, no punct, >= 5 tokens


def test_token_stats_counts(spark):
    df = spark.createDataFrame(
        [("en", "a b c"), ("en", "a b"), ("fr", "x y")],
        "lang string, text string")
    got = {r.lang: r for r in token_stats(df).collect()}
    assert got["en"].n_docs == 2
    assert got["en"].total_tokens == 5
    assert got["en"].vocab == 3
    assert got["fr"].total_tokens == 2


def test_fingerprint_documents_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "Same   TEXT"), (3, "different")],
        "doc_id long, text string")
    got = {r.doc_id: r.dup_count for r in
           fingerprint_documents(df).collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_repetition_signals_known_ratios(spark):
    from serverless_data_pipeline_spark.operators.text import (
        repetition_signals,
    )
    # "a b a b a b": 6 tokens, 2 distinct; 4 trigrams (a b a, b a b,
    # a b a, b a b) with 2 distinct -> dup ratios 4/6 and 2/4.
    df = spark.createDataFrame([(1, "a b a b a b"), (2, "x y z w")],
                               "doc_id long, text string")
    got = {r.doc_id: r for r in
           repetition_signals(df, "doc_id", "text", ngram_n=3).collect()}
    r1 = got[1]
    assert (r1.tok_total, r1.tok_distinct) == (6, 2)
    assert abs(r1.dup_token_ratio - 4 / 6) < 1e-6
    assert (r1.ngram_total, r1.ngram_distinct) == (4, 2)
    assert abs(r1.dup_ngram_ratio - 0.5) < 1e-6
    r2 = got[2]  # all-unique text: zero duplication
    assert r2.dup_token_ratio == 0.0 and r2.dup_ngram_ratio == 0.0


def test_redact_pii_counts_and_output(spark):
    from serverless_data_pipeline_spark.operators.text import redact_pii
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or call 5551234567 now"),
         (2, "clean text with no pii at all")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    r1 = got[1]
    assert (r1.n_email, r1.n_digit_run, r1.n_redactions) == (1, 1, 2)
    assert r1.redacted_text == \
        "mail [REDACTED] or call [REDACTED] now"
    r2 = got[2]
    assert r2.n_redactions == 0 and r2.redacted_text == r2.text
