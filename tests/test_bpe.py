"""BPE vocabulary training: the canonical Sennrich example, determinism
under partitioning, early stop, and the encode round trip."""

from __future__ import annotations

import pytest

from serverless_data_pipeline_spark.operators.bpe import (
    END, bpe_encode, train_bpe,
)


def _classic(spark, n_parts=1):
    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    rows = [(w,) for w in corpus]
    return spark.createDataFrame(rows, "text string").repartition(n_parts)


def test_train_bpe_classic_sennrich_merges(spark):
    # the worked example from the paper (with end-of-word marker):
    # es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7) ...
    m = train_bpe(_classic(spark), "text", n_merges=5)
    assert m == [("e", "s"), ("es", "t"), ("est", END),
                 ("l", "o"), ("lo", "w")]


def test_train_bpe_partition_independent(spark):
    a = train_bpe(_classic(spark, 1), "text", n_merges=8)
    b = train_bpe(_classic(spark, 7), "text", n_merges=8)
    assert a == b


def test_train_bpe_early_stop_and_validation(spark):
    # every word unique -> after the singleton pairs are exhausted no
    # pair occurs twice; must stop early rather than loop
    df = spark.createDataFrame([("ab",), ("cd",), ("ef",)], "text string")
    m = train_bpe(df, "text", n_merges=50)
    assert len(m) < 50
    with pytest.raises(ValueError):
        train_bpe(df, "text", n_merges=0)


def test_bpe_encode_round_trip_and_oov(spark):
    m = train_bpe(_classic(spark), "text", n_merges=10)
    df = spark.createDataFrame(
        [(1, "lowest newest low"), (2, "zzz"), (3, None)],
        "id int, text string")
    out = {r.id: r.bpe_tokens for r in bpe_encode(df, "text", m).collect()}
    # learned subwords compose on an UNSEEN word ("lowest" never trained)
    assert out[1] == ["low", "est" + END, "newest" + END, "low" + END]
    # OOV word degrades to characters + END, never fails
    assert out[2] == ["z", "z", "z" + END] or all(
        "".join(out[2]).replace(END, "") == "zzz" for _ in [0])
    assert out[3] == []
    # concatenating any word's subwords reproduces the word + marker
    joined = "".join(out[1])
    assert joined == "lowest" + END + "newest" + END + "low" + END


def test_bpe_encode_on_fixture_corpus(spark):
    import os
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                        "/root/testdata/sf0.001")
    docs = spark.read.parquet(sf + "/documents.parquet")
    m = train_bpe(docs, "text", n_merges=12)
    assert len(m) == 12 and all(len(p) == 2 for p in m)
    enc = bpe_encode(docs.limit(20), "text", m)
    rows = enc.select("doc_id", "bpe_tokens").collect()
    assert all(len(r.bpe_tokens) > 0 for r in rows)
    # subword stream rebuilds the (lowercased, space-normalized) text
    r0 = rows[0]
    txt = (docs.filter(docs.doc_id == r0.doc_id)
           .first().text.lower().split())
    assert "".join(r0.bpe_tokens).split(END)[:-1] == txt


def test_bpe_encode_ascii_whitespace_parity(spark):
    """bpe_encode splits words with the same ASCII \\s+ class the
    Java-regex tokens() helper trains over — a non-breaking space is
    NOT a word boundary, so the encoded stream matches the statistics
    the merges were learned from."""
    m = train_bpe(_classic(spark), "text", n_merges=10)
    df = spark.createDataFrame([(1, "low low")],
                               "id int, text string")
    out = bpe_encode(df, "text", m).first().bpe_tokens
    assert out == ["low", " ", "low" + END]
