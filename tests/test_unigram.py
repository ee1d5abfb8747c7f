"""Unigram-LM tokenizer (operators/unigram.py): Viterbi optimality,
hard-EM determinism, driver/distributed path equality, coverage and
round-trip laws. The training oracle strategy mirrors train_bpe's:
non-SQL-expressible, so the laws are pinned here (the registry carries
the SQL-replayable tiers; see tests/test_bpe.py for the pattern)."""

from __future__ import annotations

import itertools
import math

import pytest

from serverless_data_pipeline_spark.operators.unigram import (
    build_unigram_vocab, train_unigram, unigram_decode_ids,
    unigram_encode_ids, viterbi_segment,
)


def _df(spark, texts, n_parts=2):
    return spark.createDataFrame([(t,) for t in texts],
                                 "text string").repartition(n_parts)


# ------------------------------------------------------------ viterbi --

def _brute_best(word, scores, max_len):
    """Enumerate ALL segmentations, return the max total score."""
    best = None
    n = len(word)

    def rec(i, acc):
        nonlocal best
        if i == n:
            best = acc if best is None else max(best, acc)
            return
        for j in range(i + 1, min(i + max_len, n) + 1):
            s = scores.get(word[i:j])
            if s is not None:
                rec(j, acc + s)

    rec(0, 0.0)
    return best


def test_viterbi_matches_brute_force_enumeration():
    # adversarial small alphabet: many overlapping candidate pieces
    pieces = ["a", "b", "ab", "ba", "aa", "aba", "bab", "abab"]
    for k, word in enumerate("".join(p) for p in
                             itertools.product("ab", repeat=6)):
        scores = {p: -1.0 - ((k + i * 7) % 5) * 0.3
                  for i, p in enumerate(pieces)}
        seg = viterbi_segment(word, scores, 4)
        assert seg is not None and "".join(seg) == word
        got = sum(scores[p] for p in seg)
        assert got == pytest.approx(_brute_best(word, scores, 4))


def test_viterbi_unsegmentable_returns_none_and_empty_word():
    assert viterbi_segment("ax", {"a": -1.0}, 4) is None
    assert viterbi_segment("", {"a": -1.0}, 4) == []


# ----------------------------------------------------------- training --

def test_train_learns_the_obvious_piece(spark):
    # 'abab...' repeated: a multi-char piece must beat per-char
    # segmentation and survive pruning to a tight vocab
    df = _df(spark, ["ababab ababab ababab", "ababab cd", "cd cd"])
    pieces = train_unigram(df, "text", vocab_size=12, n_em_iters=2)
    inv = {p for p, _ in pieces}
    assert len(pieces) <= 12
    assert any(len(p) > 1 and "ab" in p for p in inv)
    # encoding the dominant word uses a multi-char piece
    enc = unigram_encode_ids(_df(spark, ["ababab"]), "text", pieces)
    [row] = enc.collect()
    assert len(row.token_ids) < len("ababab")


def test_train_deterministic_and_partition_independent(spark):
    texts = ["the cat sat on the mat", "the cat ate the hat",
             "a hat on a mat", "mat mat mat the the"]
    a = train_unigram(_df(spark, texts, 1), "text", vocab_size=30)
    b = train_unigram(_df(spark, texts, 7), "text", vocab_size=30)
    c = train_unigram(_df(spark, texts, 3), "text", vocab_size=30)
    assert a == b == c
    # scores are genuine log-probs: all negative, floors included
    assert all(s < 0 for _p, s in a)


def test_driver_equals_distributed_path(spark):
    """The r13 structural claim: integer Viterbi counts make the
    collected loop and the Arrow-batched distributed E-step
    bit-identical — pieces AND scores."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    a = train_unigram(docs, "text", vocab_size=150, n_em_iters=2,
                      driver_side=True)
    b = train_unigram(docs, "text", vocab_size=150, n_em_iters=2,
                      driver_side=False)
    assert a == b


def test_vocab_size_respected_chars_never_pruned(spark):
    texts = ["aa ab ac ad ae af ag ah", "ba bb bc bd", "ca cb cc"]
    chars = sorted(set("".join(texts)))   # incl. the attached space
    pieces = train_unigram(_df(spark, texts), "text",
                           vocab_size=len(chars) + 2)
    inv = {p for p, _ in pieces}
    assert len(pieces) <= len(chars) + 2
    assert set(chars) <= inv              # coverage guarantee
    with pytest.raises(ValueError, match="character inventory"):
        train_unigram(_df(spark, texts), "text", vocab_size=3)
    with pytest.raises(ValueError, match="n_em_iters"):
        train_unigram(_df(spark, texts), "text", vocab_size=30,
                      n_em_iters=0)


# ----------------------------------------------------- encode/decode --

def test_encode_decode_round_trip_exact(spark):
    texts = ["the cat  sat\ton the mat", " leading and trailing ",
             "tabs\tand\nnewlines stay"]
    train = _df(spark, texts + ["the cat the mat on and stay"])
    pieces = train_unigram(train, "text", vocab_size=60)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    enc = unigram_encode_ids(df, "text", pieces, unk_col="unk")
    dec = unigram_decode_ids(enc, "token_ids", pieces)
    for r in dec.collect():
        assert r.unk == 0.0
        assert r.decoded_text == texts[r.doc_id]


def test_unk_accounting_and_lossy_decode(spark):
    pieces = train_unigram(_df(spark, ["abc abc"]), "text",
                           vocab_size=10)
    df = spark.createDataFrame([(0, "abc xyz")],
                               "doc_id long, text string")
    enc = unigram_encode_ids(df, "text", pieces, unk_col="unk")
    [r] = enc.collect()
    assert 0 in r.token_ids and r.unk > 0
    [d] = unigram_decode_ids(enc, "token_ids", pieces).collect()
    assert d.decoded_text.startswith("abc")
    assert "xyz" not in d.decoded_text     # UNK is the only loss


def test_vocab_table_shape():
    pieces = [("ab", -1.0), ("a", -2.0), ("b", -2.5)]
    v = build_unigram_vocab(pieces)
    assert v["<unk>"] == 0
    assert [v["ab"], v["a"], v["b"]] == [1, 2, 3]


def test_training_improves_corpus_viterbi_likelihood(spark):
    """More EM iterations never hurt the hard-EM objective: the total
    Viterbi log-likelihood of the corpus under the final scores is
    non-decreasing in n_em_iters (equal once converged)."""
    texts = ["ababab ababab", "abc abc abab", "cab cab ab"]

    def total_ll(pieces):
        scores = dict(pieces)
        ml = max(len(p) for p in scores)
        ll = 0.0
        for t in texts:
            from serverless_data_pipeline_spark.operators.bpe import (
                _RAW_ATTACHED_RE,
            )
            for w in _RAW_ATTACHED_RE.findall(t):
                seg = viterbi_segment(w, scores, ml)
                assert seg is not None
                ll += sum(scores[p] for p in seg)
        return ll

    df = _df(spark, texts)
    lls = [total_ll(train_unigram(df, "text", vocab_size=24,
                                  n_em_iters=k))
           for k in (1, 2, 4)]
    assert lls[0] <= lls[1] + 1e-9 and lls[1] <= lls[2] + 1e-9


def test_artifact_scores_are_normalized_log_probs(spark):
    """Counted pieces' probabilities sum to <= 1 (floored chars sit
    outside the simplex by design, far below every counted score)."""
    pieces = train_unigram(_df(spark, ["the the cat cat sat"]),
                           "text", vocab_size=20)
    scores = [s for _p, s in pieces]
    top = max(scores)
    counted = [s for s in scores if s > top - 9.0]
    assert sum(math.exp(s) for s in counted) <= 1.0 + 1e-9


# ------------------------------------------------------------ artifact --

def test_artifact_round_trip_and_byte_stability(tmp_path, spark):
    from serverless_data_pipeline_spark.operators.unigram import (
        load_unigram_artifact, save_unigram_artifact,
    )
    pieces = train_unigram(_df(spark, ["the cat sat", "the mat"]),
                           "text", vocab_size=25)
    p1, p2 = tmp_path / "u1.json", tmp_path / "u2.json"
    save_unigram_artifact(str(p1), pieces)
    save_unigram_artifact(str(p2), pieces)
    assert p1.read_bytes() == p2.read_bytes()   # content-hashable
    back = load_unigram_artifact(str(p1))
    assert back == pieces                        # float-exact scores
    # Hadoop-FS routing writes the identical bytes
    p3 = tmp_path / "u3.json"
    save_unigram_artifact(f"file:{p3}", pieces, spark=spark)
    assert p3.read_bytes() == p1.read_bytes()
    assert load_unigram_artifact(f"file:{p3}", spark=spark) == pieces


def test_artifact_refuses_foreign_files(tmp_path, spark):
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        save_artifact,
    )
    from serverless_data_pipeline_spark.operators.unigram import (
        load_unigram_artifact, save_unigram_artifact,
    )
    bpe_path = tmp_path / "bpe.json"
    save_artifact(str(bpe_path))
    with pytest.raises(ValueError, match="not a unigram artifact"):
        load_unigram_artifact(str(bpe_path))
    with pytest.raises(ValueError, match="duplicate"):
        save_unigram_artifact(str(tmp_path / "d.json"),
                              [("a", -1.0), ("a", -2.0)])
