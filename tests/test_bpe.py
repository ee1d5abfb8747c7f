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


# ---- r8: committed artifact + token-id last mile ----

from serverless_data_pipeline_spark.operators.bpe import bpe_encode_ids
from serverless_data_pipeline_spark.operators.bpe_artifact import (
    BPE_BASE_CHARS, COMMITTED_MERGES, UNK, assert_rank_sequential_ok,
    build_vocab,
)


def test_vocab_layout_and_determinism():
    v = build_vocab()
    assert v[UNK] == 0
    assert v["a"] == 1 and v["z"] == 26
    # r9 OOV hardening: digits and ASCII punctuation are BASE alphabet
    # (real text must encode them to real ids, not UNK); uppercase and
    # whitespace never survive normalization so they get no slot
    assert v["0"] == 27 and v["9"] == 36
    assert all(c in v for c in "!$%&'()*+,-./:;<=>?@[]^_`{|}~\"\\")
    assert "A" not in v and " " not in v
    nb = len(BPE_BASE_CHARS)
    assert nb == 26 + 10 + 32
    assert v[END] == nb + 1
    # one contiguous id per merge output, in rank order
    for i, (l, r) in enumerate(COMMITTED_MERGES):
        assert v[l + r] == nb + 2 + i
    # byte-fallback inventory LAST, contiguous, after the core vocab
    core = nb + 2 + len(COMMITTED_MERGES)
    for b in range(256):
        assert v[f"<0x{b:02X}>"] == core + b
    assert len(v) == core + 256
    assert build_vocab() == v
    # byte_tokens=False reproduces the core layout exactly
    vc = build_vocab(byte_tokens=False)
    assert vc == {t: i for t, i in v.items() if i < core}


def test_rank_sequential_guard():
    # duplicate merge OUTPUTS are the exact condition under which the
    # oracle's rank-order replay could diverge from the canonical
    # rescan — the guard must reject them
    assert_rank_sequential_ok(COMMITTED_MERGES)
    with pytest.raises(ValueError):
        assert_rank_sequential_ok([("a", "bc"), ("ab", "c")])
    with pytest.raises(ValueError):
        build_vocab([("a", "bc"), ("ab", "c")])


def _sequential_replay(word: str, merges) -> list[str]:
    """Reference rank-order replay — the oracle SQL's semantics: apply
    each merge once, in learned order, all occurrences left-to-right."""
    sym = list(word) + [END]
    for l, r in merges:
        out, j = [], 0
        while j < len(sym):
            if j + 1 < len(sym) and sym[j] == l and sym[j + 1] == r:
                out.append(l + r)
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return sym


def test_rank_sequential_equals_canonical_rescan_on_fixture(spark):
    """The x8 oracle replays merges rank-by-rank; bpe_encode rescans
    for the earliest rank. Provably equivalent for distinct-output
    merge lists (see bpe_artifact) — verified empirically over every
    distinct fixture word."""
    import os
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                        "/root/testdata/sf0.001")
    docs = spark.read.parquet(sf + "/documents.parquet")
    from pyspark.sql import functions as F
    words = [r.w for r in docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "").distinct().collect()]
    # the fixture vocabulary is small (~31 distinct words) — every one
    # of them is checked, plus the merges' own outputs as inputs below
    assert len(words) > 20
    # adversarial extras: words built FROM merge outputs, where the
    # rescan-vs-sequential distinction would bite if it could
    words = sorted(set(words) | {l + r for l, r in COMMITTED_MERGES
                                 if END not in r} |
                   {"scanscan", "colucolu", "ascanlulu"})
    wdf = spark.createDataFrame([(w,) for w in words], "text string")
    got = {r.text: list(r.bpe_tokens)
           for r in bpe_encode(wdf, "text", COMMITTED_MERGES).collect()}
    for w in words:
        assert got[w] == _sequential_replay(w, COMMITTED_MERGES), w


def test_bpe_encode_ids_mapping_and_oov(spark):
    v = build_vocab()
    df = spark.createDataFrame(
        [(1, "a scan"), (2, "zèbre"), (3, None)], "id int, text string")
    out = {r.id: (list(r.token_ids), list(r.bpe_sym))
           for r in bpe_encode_ids(df, "text", COMMITTED_MERGES, v,
                                   sym_col="bpe_sym").collect()}
    ids1, sym1 = out[1]
    # every id is exactly the vocab lookup of its subword
    assert ids1 == [v[s] for s in sym1]
    assert "scan" + END in sym1  # the (s, can</w>) merge fired
    # OOV char (è not in the base alphabet) -> UNK id 0, never fails
    ids2, sym2 = out[2]
    assert 0 in ids2 and len(ids2) == len(sym2)
    assert out[3] == ([], [])


def test_bpe_ids_pack_bins_composition(spark):
    """The pretraining last mile: ids packed by REAL token counts —
    every bin's total respects the budget (single-doc overflow aside)
    and per-doc n_tokens equals the id-array length, not the
    whitespace proxy."""
    from pyspark.sql import functions as F

    from serverless_data_pipeline_spark.operators.corpus import pack_bins
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(100)
    encd = bpe_encode_ids(docs.select("doc_id", "text"), "text",
                          COMMITTED_MERGES, build_vocab())
    encd = encd.withColumn("ntok", F.size("token_ids"))
    binned = pack_bins(encd, "doc_id", None, budget=1024, n_shards=4,
                       weight_col="ntok")
    rows = binned.collect()
    nt = {r.doc_id: r.n_tokens for r in rows}
    for r in encd.select("doc_id", "ntok").collect():
        assert nt[r.doc_id] == r.ntok
    import collections
    fill = collections.Counter()
    for r in rows:
        fill[(r.shard, r.bin_id)] += r.n_tokens
    for (s, b), tot in fill.items():
        assert tot <= 1024 or fill[(s, b)] == max(
            r.n_tokens for r in rows if (r.shard, r.bin_id) == (s, b))


def test_pack_bins_weight_col_validation(spark):
    from serverless_data_pipeline_spark.operators.corpus import pack_bins
    df = spark.createDataFrame([(1, "a b", 2)],
                               "doc_id long, text string, ntok long")
    with pytest.raises(ValueError):
        pack_bins(df, "doc_id", "text", weight_col="ntok")
    with pytest.raises(ValueError):
        pack_bins(df, "doc_id", None)


def test_train_bpe_batched_rounds(spark):
    """merges_per_round > 1: K=1 stays bit-identical to the canonical
    algorithm; the batched variant accepts only pairwise-disjoint
    pairs per round (so each batch is exactly its members applied
    sequentially), remains deterministic, and its merge list still
    encodes every word losslessly."""
    seq = train_bpe(_classic(spark), "text", n_merges=8)
    k1 = train_bpe(_classic(spark), "text", n_merges=8,
                   merges_per_round=1)
    assert k1 == seq
    b = train_bpe(_classic(spark), "text", n_merges=8,
                  merges_per_round=3)
    b2 = train_bpe(_classic(spark, 7), "text", n_merges=8,
                   merges_per_round=3)
    assert b == b2                       # partition-independent
    assert len(b) == 8
    # round 1 hand-worked: (e,s) cnt 9 accepted; (s,t) 9 shares 's'
    # -> skipped; (t,</w>) 9 accepted; the third disjoint candidate
    # follows the (cnt desc, l, r) order
    assert b[0] == ("e", "s") and b[1] == ("t", END)
    # within-round disjointness holds for EVERY round of 3
    for i in range(0, 8, 3):
        used: set[str] = set()
        for l, r in b[i:i + 3]:
            assert not ({l, r, l + r} & used)
            used.update((l, r, l + r))
    # the learned list still rebuilds words exactly through encode
    df = spark.createDataFrame([(1, "lowest newest")],
                               "id int, text string")
    toks = bpe_encode(df, "text", b).first().bpe_tokens
    assert "".join(toks) == "lowest" + END + "newest" + END
    import pytest as _pt
    with _pt.raises(ValueError):
        train_bpe(_classic(spark), "text", merges_per_round=0)


# ---- r9: OOV hardening (byte fallback + unk_rate) ----

# the unicode zoo: 1/2/3/4-byte UTF-8, plus every printable-ASCII
# class that must now be BASE vocab, not OOV
_OOV_ZOO = ["plain", "42", "$9.99!", "(a-b_c)", "[v2.0];", "@x#y",
            "café", "zèbre", "straße", "汉字",
            "é汉x", "\U0001f642ok", "€5"]


def _decode_ids(ids, vocab):
    """Reference decoder: core ids via the inverse vocab, byte ids via
    UTF-8 — the round-trip a real tokenizer must satisfy."""
    inv = {i: t for t, i in vocab.items()}
    bb = vocab["<0x00>"]
    out, pend = [], b""
    for i in ids:
        if i >= bb:
            pend += bytes([i - bb])
        else:
            if pend:
                out.append(pend.decode("utf-8"))
                pend = b""
            out.append(inv[i])
    if pend:
        out.append(pend.decode("utf-8"))
    return "".join(out)


def test_byte_fallback_round_trip_and_no_unk(spark):
    """byte_fallback=True destroys NOTHING: ids decode back to the
    exact normalized text for 1/2/3/4-byte UTF-8 characters, id 0
    (UNK) never appears, digits/punctuation encode as base-vocab ids
    (never byte-escaped), and unk_rate reports exactly the OOV symbol
    fraction."""
    v = build_vocab()
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_OOV_ZOO)], "id int, text string")
    out = {r.id: r for r in bpe_encode_ids(
        df, "text", COMMITTED_MERGES, v, sym_col="s",
        byte_fallback=True, unk_col="unk_rate").collect()}
    bb = v["<0x00>"]
    for i, w in enumerate(_OOV_ZOO):
        r = out[i]
        ids = list(r.token_ids)
        assert 0 not in ids, w
        assert _decode_ids(ids, v) == w.lower() + END, w
        n_oov = sum(1 for s in r.s if s not in v)
        want = round(n_oov / len(r.s), 6) if r.s else 0.0
        assert r.unk_rate == want, w
        if w.isascii():
            assert all(i < bb for i in ids), w     # never byte-escaped
    # ASCII-only rows have zero OOV under the printable base
    assert out[0].unk_rate == 0.0 and out[2].unk_rate == 0.0
    # a vocab without the byte inventory must be rejected up front
    with pytest.raises(ValueError):
        bpe_encode_ids(df, "text", COMMITTED_MERGES,
                       build_vocab(byte_tokens=False),
                       byte_fallback=True)


def test_bpe_decode_ids_round_trip(spark):
    """In-engine detokenization: decode(encode(text)) equals the
    whitespace-normalized lowercase input — for plain ASCII, digits/
    punctuation (base vocab), and 2/3/4-byte UTF-8 via byte-fallback
    reassembly; UNK renders as the literal <unk> in the lossy mode."""
    import re

    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids,
    )
    v = build_vocab()
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(40)
    texts = [r.text for r in docs.collect()]
    texts += [" ".join(_OOV_ZOO), "a scan 42", "", "   "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string")
    out = bpe_decode_ids(
        bpe_encode_ids(df, "text", COMMITTED_MERGES, v,
                       byte_fallback=True),
        "token_ids", v)
    got = {r.id: r.decoded_text for r in out.collect()}
    for i, t in enumerate(texts):
        want = " ".join(w for w in re.split(r"[ \t\n\x0b\f\r]+",
                                            t.lower()) if w)
        assert got[i] == want, t
    # lossy mode: OOV became UNK, decode surfaces the placeholder
    lossy = bpe_decode_ids(
        bpe_encode_ids(
            spark.createDataFrame([("zèbre ok",)], "text string"),
            "text", COMMITTED_MERGES, v),
        "token_ids", v).first().decoded_text
    assert lossy == "z<unk>bre ok"


def test_artifact_save_load_round_trip(tmp_path):
    """The ship-a-tokenizer loop: save → load → identical vocab,
    byte-stable file (content-hashable version id), bad files and
    invalid merge lists rejected."""
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        load_artifact, save_artifact,
    )
    p = str(tmp_path / "tok.json")
    save_artifact(p)
    merges, base = load_artifact(p)
    assert merges == COMMITTED_MERGES and base == BPE_BASE_CHARS
    assert build_vocab(merges, base) == build_vocab()
    save_artifact(str(tmp_path / "tok2.json"))
    assert (open(p, "rb").read()
            == open(str(tmp_path / "tok2.json"), "rb").read())
    import json
    (tmp_path / "bad.json").write_text(json.dumps({"format": "nope"}))
    with pytest.raises(ValueError):
        load_artifact(str(tmp_path / "bad.json"))
    with pytest.raises(ValueError):
        save_artifact(str(tmp_path / "x.json"),
                      merges=[("a", "bc"), ("ab", "c")])
    # marker drift (r9 ADVICE): an artifact carrying non-default
    # end_of_word/unk would reconstruct a DIFFERENT vocab than the one
    # saved — load must reject it, not silently ignore the fields
    import json as _json
    doc = _json.load(open(p, encoding="utf-8"))
    for field, bad in (("end_of_word", "<eow>"), ("unk", "[UNK]")):
        mutated = dict(doc, **{field: bad})
        bp = tmp_path / f"marker_{field}.json"
        bp.write_text(_json.dumps(mutated), encoding="utf-8")
        with pytest.raises(ValueError, match="engine marker"):
            load_artifact(str(bp))


_RAW_ZOO = [
    "Hello World",                      # case survives
    "two  spaces\tand a tab",           # whitespace runs survive
    "  leading and trailing  ",
    "line\none\n\nline two\r\n",
    "MiXeD CaSe 42 $9.99 (A-b_C)!",
    "literal </w> marker in text",      # marker chars are just chars
    "café 汉字 \U0001f642 €5",            # multi-byte UTF-8
    "nbsp inside",                 # unicode ws is a word char
    "a scan low lower colu",            # words the merges DO compress
    "", " ", " \t\n ", "x",
    " ".join(_OOV_ZOO),
]


def test_bpe_raw_mode_exact_round_trip(spark):
    """The raw-text tokenizer law (r9 verdict #1): with raw=True,
    decode(encode(x)) == x BYTE-FOR-BYTE over raw text — case,
    whitespace runs, leading/trailing whitespace, newlines/tabs,
    literal marker text and arbitrary Unicode all survive; and the
    symbol stream itself concatenates back to the input (the
    structural invariant behind the law). Normalized mode on the same
    texts round-trips only the normalized form — pinned side-by-side
    so the modes can't silently swap."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode, bpe_encode_ids,
    )
    v = build_vocab()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_RAW_ZOO)] + [(999, None)],
        "id int, text string")
    enc = bpe_encode_ids(df, "text", COMMITTED_MERGES, v,
                         byte_fallback=True, raw=True,
                         sym_col="sym", unk_col="unk_rate")
    out = bpe_decode_ids(enc, "token_ids", v, raw=True)
    got = {r.id: r for r in out.collect()}
    for i, t in enumerate(_RAW_ZOO):
        assert got[i].decoded_text == t, repr(t)
        assert "".join(got[i].sym) == t, repr(t)   # structural law
        # no symbol ever maps to UNK id 0 under byte fallback
        assert 0 not in got[i].token_ids
    assert got[999].decoded_text == ""             # null -> empty stream
    # whitespace/uppercase symbols byte-escape: the unk_rate column is
    # the byte-escape rate (> 0 whenever the text deviates from the
    # normalized form, 0 for purely in-vocab text)
    assert got[8].unk_rate > 0                     # spaces escape
    lowered = bpe_encode_ids(
        spark.createDataFrame([("lower",)], "text string"),
        "text", COMMITTED_MERGES, v, byte_fallback=True, raw=True,
        unk_col="u").first()
    assert lowered.u == 0.0
    # END-free merges (ow, er) still fire on lowercase spans in raw
    # mode — raw mode compresses, not just escapes (END-dependent
    # merges like scan</w> never fire: no symbol can equal the marker)
    assert len(lowered.token_ids) < len("lower")
    # normalized mode, same zoo: round trip equals the NORMALIZED text
    norm = bpe_decode_ids(
        bpe_encode_ids(df.filter("id = 4"), "text", COMMITTED_MERGES,
                       v, byte_fallback=True),
        "token_ids", v).first().decoded_text
    assert norm == "mixed case 42 $9.99 (a-b_c)!"
    # raw mode without byte_fallback cannot hold the law -> rejected
    with pytest.raises(ValueError, match="byte_fallback"):
        bpe_encode_ids(df, "text", COMMITTED_MERGES, v, raw=True)
    # bpe_encode raw symbol streams: whitespace chars are standalone
    # symbols, words carry no END marker
    syms = bpe_encode(
        spark.createDataFrame([("A  b\tc",)], "text string"),
        "text", COMMITTED_MERGES, raw=True).first().bpe_tokens
    assert syms == ["A", " ", " ", "b", "\t", "c"]
    assert not any(END in s for s in syms)


def test_train_bpe_raw_mode(spark):
    """Raw-mode training (r10): merges are learned over case-preserved,
    END-free symbol streams — exactly what the raw pretokenizer emits —
    so the learned pairs actually fire on raw text: a raw-trained list
    compresses case-mixed words AND the exact round-trip law still
    holds (merges only ever concatenate symbols within words)."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode, bpe_encode_ids, train_bpe,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        build_vocab,
    )
    corpus = (["Low"] * 5 + ["Lower"] * 2 + ["Newest"] * 6
              + ["Widest"] * 3)
    df = spark.createDataFrame([(w,) for w in corpus], "text string")
    m = train_bpe(df, "text", n_merges=5, raw=True)
    # the Sennrich worked example WITHOUT the end marker, case kept:
    # es(9) -> est(9) -> Lo(7) -> Low(7) -> st? ... pin the laws, not
    # the full list: case survives, END never appears
    assert m[0] == ("e", "s") and m[1] == ("es", "t")
    assert any(l[0].isupper() or r[0].isupper() for l, r in m)
    assert not any(END in l or END in r for l, r in m)
    # determinism under partitioning, same as normalized mode
    assert m == train_bpe(df.repartition(7), "text", n_merges=5,
                          raw=True)
    # raw-trained merges fire on raw text: "Lowest" compresses even
    # though it was never trained, and the round trip stays exact
    probe = spark.createDataFrame(
        [("Lowest  Newest\tLow",)], "text string")
    syms = bpe_encode(probe, "text", m, raw=True).first().bpe_tokens
    assert "".join(syms) == "Lowest  Newest\tLow"
    assert len(syms) < len("Lowest  Newest\tLow")
    v = build_vocab(m)
    out = bpe_decode_ids(
        bpe_encode_ids(probe, "text", m, v, byte_fallback=True,
                       raw=True),
        "token_ids", v, raw=True).first().decoded_text
    assert out == "Lowest  Newest\tLow"
    # normalized-mode training is unchanged by the parameter's default
    assert train_bpe(df, "text", n_merges=5) == train_bpe(
        df, "text", n_merges=5, raw=False)


def test_bpe_attached_ws_mode(spark):
    """The GPT-2 attached-whitespace discipline (r10): with the
    raw-service artifact (RAW_COMMITTED_MERGES — case-preserved,
    END-free, space-prefixed merges), attach_ws=True still satisfies
    the exact-raw round-trip law over the whole zoo AND actually
    compresses prose better than split mode with the normalized-
    trained list (interior spaces fold into word tokens instead of
    costing one byte token each). Committed constants re-validated;
    mode misuse rejected."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode, bpe_encode_ids, train_bpe,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BPE_RAW_BASE_CHARS, RAW_COMMITTED_MERGES,
    )
    # committed raw artifact: guard holds, space-prefixed merges
    # present, END never appears, space has a REAL id in the raw base
    assert_rank_sequential_ok(RAW_COMMITTED_MERGES)
    assert any(l == " " for l, _ in RAW_COMMITTED_MERGES)
    assert not any(END in l + r for l, r in RAW_COMMITTED_MERGES)
    rvocab = build_vocab(RAW_COMMITTED_MERGES, BPE_RAW_BASE_CHARS)
    assert " " in rvocab and "A" in rvocab
    # exact round trip over the zoo, attached pretokens
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_RAW_ZOO)],
        "id int, text string")
    out = bpe_decode_ids(
        bpe_encode_ids(df, "text", RAW_COMMITTED_MERGES, rvocab,
                       byte_fallback=True, raw=True, attach_ws=True,
                       sym_col="sym"),
        "token_ids", rvocab, raw=True)
    for r in out.collect():
        assert r.decoded_text == _RAW_ZOO[r.id], repr(_RAW_ZOO[r.id])
        assert "".join(r.sym) == _RAW_ZOO[r.id]
        assert 0 not in r.token_ids
    # pretokens: words CARRY their leading whitespace run; a trailing
    # run stands alone — and trained space merges fire (' s...' etc.)
    syms = bpe_encode(
        spark.createDataFrame([("a scan  low \t",)], "text string"),
        "text", RAW_COMMITTED_MERGES, raw=True,
        attach_ws=True).first().bpe_tokens
    assert "".join(syms) == "a scan  low \t"
    assert " s" in "".join(syms)            # structural (concat) law
    assert any(s.startswith(" ") and len(s) > 1 for s in syms)
    # compression: attached + raw-trained beats split + normalized-
    # trained on spacey prose (the arm-visible a-column comparison)
    probe = spark.createDataFrame(
        [("a scan can lower column as at par low",)], "text string")
    att = bpe_encode_ids(probe, "text", RAW_COMMITTED_MERGES, rvocab,
                         byte_fallback=True, raw=True,
                         attach_ws=True).first().token_ids
    spl = bpe_encode_ids(probe, "text", COMMITTED_MERGES,
                         build_vocab(), byte_fallback=True,
                         raw=True).first().token_ids
    assert len(att) < len(spl)
    # misuse rejected: attach_ws is a raw-mode refinement
    with pytest.raises(ValueError, match="raw mode"):
        bpe_encode(probe, "text", RAW_COMMITTED_MERGES,
                   attach_ws=True)
    with pytest.raises(ValueError, match="raw mode"):
        train_bpe(probe, "text", n_merges=2, attach_ws=True)


def test_raw_committed_merges_provenance(spark):
    """RAW_COMMITTED_MERGES is exactly what train_bpe(raw=True,
    attach_ws=True, n_merges=24) learns over the sf0.001 documents
    fixture — the same frozen-artifact provenance discipline as
    COMMITTED_MERGES."""
    from serverless_data_pipeline_spark.operators.bpe import train_bpe
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        RAW_COMMITTED_MERGES,
    )
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    got = train_bpe(docs, "text", n_merges=24, raw=True,
                    attach_ws=True)
    assert got == RAW_COMMITTED_MERGES


def test_artifact_hadoop_fs_round_trip(spark, tmp_path):
    """Artifact I/O through the JVM Hadoop FileSystem (the object-store
    boundary a cluster driver ships tokenizers across): a ``file:`` URI
    round-trips byte-identically to the local-open path (r9 verdict
    #5), and load via the FS enforces the same validations."""
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        load_artifact, save_artifact,
    )
    local = str(tmp_path / "tok_local.json")
    save_artifact(local)
    uri = f"file:{tmp_path}/tok_fs.json"
    save_artifact(uri, spark=spark)
    # byte-stable across the two write paths (content-hash contract)
    assert (open(local, "rb").read()
            == open(str(tmp_path / "tok_fs.json"), "rb").read())
    merges, base = load_artifact(uri, spark=spark)
    assert merges == COMMITTED_MERGES and base == BPE_BASE_CHARS
    assert build_vocab(merges, base) == build_vocab()


def test_bpe_decode_strict_vs_lenient(spark):
    """Unknown ids in decode (r9 verdict #4): strict (default) FAILS
    with the offending id — corrupted ids files must error, not vanish
    via NULL-propagating concat; strict=False substitutes the literal
    <unk> and keeps going."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids,
    )
    v = build_vocab()
    good_ids = [v["s"], v["can</w>"]]
    bad = spark.createDataFrame(
        [(1, good_ids), (2, good_ids + [999_999])],
        "id int, token_ids array<int>")
    with pytest.raises(Exception, match="id not in vocab: 999999"):
        bpe_decode_ids(bad, "token_ids", v).collect()
    lenient = {r.id: r.decoded_text
               for r in bpe_decode_ids(bad, "token_ids", v,
                                       strict=False).collect()}
    assert lenient[1] == "scan"
    assert lenient[2] == "scan <unk>"
    # valid ids decode identically under both modes
    strict_ok = bpe_decode_ids(bad.filter("id = 1"), "token_ids",
                               v).first().decoded_text
    assert strict_ok == "scan"


def test_byte_fallback_oracle_fragment_parity(spark):
    """The driver oracle expands OOV symbols arithmetically in DuckDB
    (hex(encode(tok)) -> strpos base-16 digits); that rendering must
    agree id-for-id with the Spark hex-pair-map path over the whole
    unicode zoo — the cross-engine pin behind the x8 tok/ids arms'
    planted non-ASCII."""
    import duckdb

    from __spark_entry__ import _BPE_VOCAB_SQL, _bpe_fallback_idstr_duckdb, _sq

    v = build_vocab()
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_OOV_ZOO)], "id int, text string")
    got = {r.id: ",".join(str(x) for x in r.token_ids)
           for r in bpe_encode_ids(df, "text", COMMITTED_MERGES, v,
                                   byte_fallback=True).collect()}
    con = duckdb.connect()
    frag = _bpe_fallback_idstr_duckdb("s.tok")
    # replay: per word, feed the SAME symbols Spark produced through
    # the oracle's id-or-byte-expand branch against the arm's vocab
    # VALUES (quote-escaped via _sq, exactly as the driver oracle is)
    from serverless_data_pipeline_spark.operators.bpe import bpe_encode
    syms = {r.id: list(r.bpe_tokens) for r in bpe_encode(
        df, "text", COMMITTED_MERGES).collect()}
    for i, w in enumerate(_OOV_ZOO):
        vals = ", ".join(f"({p}, '{_sq(s)}')"
                         for p, s in enumerate(syms[i]))
        want = con.execute(f"""
            SELECT string_agg(
                CASE WHEN v.id IS NOT NULL THEN CAST(v.id AS VARCHAR)
                     ELSE {frag} END, ',' ORDER BY p)
            FROM (SELECT * FROM (VALUES {vals}) t(p, tok)) s
            LEFT JOIN (SELECT * FROM ({_BPE_VOCAB_SQL}) t(tok, id)) v
            USING (tok)""").fetchone()[0]
        assert got[i] == want, w


def test_tokenizer_fertility_hand_checked(spark):
    """Exact sums and round6 ratios on a tiny fixture; zero-token
    group gets NULL ratios, not a divide error; unk_col mean."""
    from serverless_data_pipeline_spark.operators.bpe import (
        tokenizer_fertility,
    )
    rows = [
        ("en", "abcd", [1, 2], 0.5),      # 4 chars, 4 bytes, 2 toks
        ("en", "ab", [3], 0.0),           # 2 chars, 2 bytes, 1 tok
        ("zh", "汉字", [4, 5, 6, 7], 1.0),  # 2 chars, 6 bytes, 4 toks
        ("xx", "", [], 0.0),              # zero-token group
    ]
    df = spark.createDataFrame(
        rows, "lang string, text string, ids array<int>, u double")
    out = {r.lang: r for r in tokenizer_fertility(
        df, "text", "ids", group_col="lang", unk_col="u").collect()}
    en = out["en"]
    assert (en.n_docs, en.total_tokens, en.total_chars,
            en.total_bytes) == (2, 3, 6, 6)
    assert en.chars_per_token == 2.0 and en.bytes_per_token == 2.0
    assert en.tokens_per_doc == 1.5 and en.mean_unk_rate == 0.25
    zh = out["zh"]
    assert (zh.total_chars, zh.total_bytes, zh.total_tokens) == (2, 6, 4)
    assert zh.bytes_per_token == 1.5 and zh.chars_per_token == 0.5
    xx = out["xx"]
    assert xx.chars_per_token is None and xx.bytes_per_token is None
    # corpus-level form: one row, no group column
    allr = tokenizer_fertility(df, "text", "ids").collect()
    assert len(allr) == 1 and allr[0].total_tokens == 7


def test_tokenizer_fertility_flags_byte_fallback_degeneration(spark):
    """The dashboard signal: a script absent from the vocab encodes
    near bytes_per_token == 1 (pure byte fallback), while covered
    ASCII text compresses well above it."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_encode_ids, tokenizer_fertility,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        COMMITTED_MERGES, build_vocab,
    )
    rows = [("cov", "the scan of the scan"), ("unc", "汉字漢字汉字")]
    df = spark.createDataFrame(rows, "lang string, text string")
    enc = bpe_encode_ids(df, "text", COMMITTED_MERGES, build_vocab(),
                         byte_fallback=True, unk_col="u")
    out = {r.lang: r for r in tokenizer_fertility(
        enc, "text", "token_ids", group_col="lang",
        unk_col="u").collect()}
    # every non-marker id is a byte: 6 chars -> 18 byte ids + one
    # in-vocab </w>, so the ratio sits just under 1 — degeneration
    assert 0.9 < out["unc"].bytes_per_token <= 1.0
    assert out["cov"].bytes_per_token > 1.5
    assert out["unc"].mean_unk_rate == round(6 / 7, 6)


# --- vocab_via: the real-vocab-scale execution switch (r11) ---------------


_MESSY_ROWS = [
    (1, "The QUICK brown\tfox  jumps\n\nover 42 dogs!"),
    (2, "columns scan scanner scanned SCAN"),
    (3, "unicode: café €5 中文 \U0001f600 end"),
    (4, ""),
    (5, None),
    (6, "   leading and trailing   "),
]


def _messy_df(spark):
    return spark.createDataFrame(_MESSY_ROWS, "doc_id long, text string")


@pytest.mark.parametrize("mode", ["norm", "norm_nofb", "raw", "attach",
                                  "bytelevel"])
def test_bpe_encode_ids_vocab_via_bit_identity(spark, mode):
    """literal and broadcast execution of bpe_encode_ids are
    bit-identical -- ids, symbols, and unk rates -- across all five
    tokenizer modes, on messy text (case, unicode, whitespace runs,
    empty, NULL)."""
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BPE_RAW_BASE_CHARS, BYTE_LEVEL_COMMITTED_MERGES,
        RAW_COMMITTED_MERGES, build_byte_level_vocab,
    )
    df = _messy_df(spark)
    if mode in ("norm", "norm_nofb"):
        merges, vocab = COMMITTED_MERGES, build_vocab()
        kw = dict(byte_fallback=(mode == "norm"))
    elif mode == "bytelevel":
        merges = BYTE_LEVEL_COMMITTED_MERGES
        vocab = build_byte_level_vocab()
        kw = dict(byte_level=True)
    else:
        merges = RAW_COMMITTED_MERGES
        vocab = build_vocab(RAW_COMMITTED_MERGES, BPE_RAW_BASE_CHARS)
        kw = dict(byte_fallback=True, raw=True,
                  attach_ws=(mode == "attach"))
    outs = {}
    for via in ("literal", "broadcast"):
        outs[via] = sorted(
            bpe_encode_ids(df, "text", merges, vocab,
                           sym_col="sym", unk_col="unk",
                           vocab_via=via, **kw).collect(),
            key=lambda r: r.doc_id)
    assert [r.asDict() for r in outs["literal"]] == \
        [r.asDict() for r in outs["broadcast"]]
    # auto flips on vocab size: tiny threshold -> broadcast plan has
    # no create_map literal; huge threshold -> literal path unchanged
    lo = bpe_encode_ids(df, "text", merges, vocab, vocab_via="auto",
                        vocab_literal_max=1, **kw)
    assert "map(" not in lo._jdf.queryExecution().analyzed().toString()
    assert sorted((r.doc_id, r.token_ids) for r in lo.collect()) == \
        [(r.doc_id, r.token_ids) for r in outs["literal"]]


def test_bpe_decode_ids_vocab_via_bit_identity(spark):
    """literal and broadcast decode agree byte-for-byte (normalized and
    raw), the broadcast strict mode still fails on unknown ids with the
    id in the message, and lenient mode renders <unk>."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BPE_RAW_BASE_CHARS, RAW_COMMITTED_MERGES,
    )
    df = _messy_df(spark)
    for kw, merges, vocab in (
            (dict(byte_fallback=True), COMMITTED_MERGES, build_vocab()),
            (dict(byte_fallback=True, raw=True, attach_ws=True),
             RAW_COMMITTED_MERGES,
             build_vocab(RAW_COMMITTED_MERGES, BPE_RAW_BASE_CHARS))):
        # broadcast-encoded input: the ids column is a plain attribute,
        # so both decode modes read identical input without fusing the
        # pandas UDF onto a giant literal expression (see the
        # vocab_via docstring note on that composition)
        enc = bpe_encode_ids(df, "text", merges, vocab,
                             vocab_via="broadcast", **kw)
        raw = bool(kw.get("raw"))
        lit = {r.doc_id: r.decoded_text
               for r in bpe_decode_ids(enc, "token_ids", vocab,
                                       raw=raw,
                                       vocab_via="literal").collect()}
        brd = {r.doc_id: r.decoded_text
               for r in bpe_decode_ids(enc, "token_ids", vocab,
                                       raw=raw,
                                       vocab_via="broadcast").collect()}
        assert lit == brd
    # strict rejection on the broadcast path carries the offending id
    bad = spark.createDataFrame([(1, [0, 999999])],
                                "doc_id long, token_ids array<int>")
    strict = bpe_decode_ids(bad, "token_ids", build_vocab(),
                            vocab_via="broadcast")
    with pytest.raises(Exception, match="999999"):
        strict.collect()
    lenient = bpe_decode_ids(bad, "token_ids", build_vocab(),
                             strict=False, vocab_via="broadcast")
    assert "<unk>" in lenient.collect()[0].decoded_text
    with pytest.raises(ValueError, match="vocab_via"):
        bpe_decode_ids(bad, "token_ids", build_vocab(), vocab_via="x")


def test_vocab_via_auto_flips_at_scale(spark):
    """A synthetic 32k-entry vocab (the production artifact size)
    auto-selects the broadcast path, encodes + round-trips exactly,
    and keeps the plan free of vocab-sized literals."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        padded_vocab,
    )
    # real layout, padded with filler entries to production scale —
    # the SAME shared builder scripts/scale_check.py measures
    vocab = padded_vocab(32_000)
    assert len(vocab) == 32_000
    df = _messy_df(spark).filter("text is not null")
    enc = bpe_encode_ids(df, "text", COMMITTED_MERGES, vocab,
                         byte_fallback=True, unk_col="unk")
    assert "map(" not in enc._jdf.queryExecution().analyzed().toString()
    # reference: the literal path over build_vocab() — the 32k vocab's
    # first entries are exactly that layout and the filler entries are
    # unreachable (no symbol can equal "fillerN"), so the ids must
    # match without paying a 64k-argument literal's plan-build time
    # (literal-vs-broadcast identity at the SAME vocab is pinned by
    # the messy-text test above)
    ref = bpe_encode_ids(df, "text", COMMITTED_MERGES, build_vocab(),
                         byte_fallback=True, unk_col="unk",
                         vocab_via="literal")
    assert sorted((r.doc_id, r.token_ids, r.unk) for r in enc.collect()) \
        == sorted((r.doc_id, r.token_ids, r.unk) for r in ref.collect())
    dec = bpe_decode_ids(enc, "token_ids", vocab)
    assert "map(" not in dec._jdf.queryExecution().analyzed().toString()
    got = {r.doc_id: r.decoded_text for r in dec.collect()}
    import re as _re
    for i, t in _MESSY_ROWS:
        if t is None or t == "":
            continue
        norm = _re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower()).strip()
        assert got.get(i, "") == norm
    with pytest.raises(ValueError, match="vocab_via"):
        bpe_encode_ids(df, "text", COMMITTED_MERGES, vocab,
                       vocab_via="join")


# byte-level BPE (r11, GPT-2-style) ---------------------------------------


def test_byte_level_round_trip_and_no_oov(spark):
    """The byte-level laws: decode(encode(x)) == x byte-for-byte over a
    case/whitespace/unicode zoo, the unk/escape rate is IDENTICALLY
    zero (out-of-vocab is impossible — every base symbol is one of the
    256 bytes), and multi-byte characters ride real byte merges, never
    an escape inventory."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode_ids,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BYTE_LEVEL_COMMITTED_MERGES, build_byte_level_vocab,
    )
    vocab = build_byte_level_vocab()
    # 256 byte symbols + 24 merges, NO <unk>, NO <0xNN> inventory
    assert len(vocab) == 280
    assert "<unk>" not in vocab and "<0x41>" not in vocab
    zoo = [(1, " The window scan  MiXeD\tCASE\ncafé €5 中文 \U0001f642 "),
           (2, "a window scanner columns par"),
           (3, "\t\t  "), (4, ""),
           (5, "</w> literal marker text")]
    df = spark.createDataFrame(zoo, "doc_id long, text string")
    enc = bpe_encode_ids(df, "text", BYTE_LEVEL_COMMITTED_MERGES,
                         vocab, byte_level=True, unk_col="unk")
    dec = {r.doc_id: (r.decoded_text, r.unk) for r in
           bpe_decode_ids(enc, "token_ids", vocab,
                          byte_level=True).collect()}
    for i, t in zoo:
        assert dec[i][0] == t
        assert dec[i][1] == 0.0
    # ' s' merges fire through the remapped space: ' scan' costs
    # fewer ids than its byte count
    n = {r.doc_id: len(r.token_ids) for r in enc.collect()}
    assert n[2] < len(zoo[1][1].encode("utf-8"))


def test_byte_level_validation(spark):
    """Mode guards: standalone (no raw/attach_ws/byte_fallback), and
    the vocab must carry the byte base + merge outputs."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode_ids, train_bpe,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BYTE_LEVEL_COMMITTED_MERGES, build_byte_level_vocab,
    )
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    v = build_byte_level_vocab()
    with pytest.raises(ValueError, match="standalone"):
        bpe_encode_ids(df, "text", BYTE_LEVEL_COMMITTED_MERGES, v,
                       byte_level=True, raw=True, byte_fallback=True)
    with pytest.raises(ValueError, match="standalone"):
        train_bpe(df, "text", byte_level=True, raw=True)
    with pytest.raises(ValueError, match="byte_level vocab"):
        bpe_encode_ids(df, "text", BYTE_LEVEL_COMMITTED_MERGES,
                       {"a": 0}, byte_level=True)
    from pyspark.sql import functions as F
    with pytest.raises(ValueError, match="byte_level vocab"):
        bpe_decode_ids(df.select(F.array(F.lit(0)).alias("ids")),
                       "ids", build_vocab(), byte_level=True)


def test_byte_level_committed_merges_provenance(spark):
    """BYTE_LEVEL_COMMITTED_MERGES is exactly what
    train_bpe(byte_level=True, n_merges=24) learns over the sf0.001
    documents fixture — and it is the bytes_to_unicode image of the
    RAW attach_ws artifact on this all-ASCII corpus (the remapped
    space 'Ġ' replacing ' '), the GPT-2 vocab shape."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bytes_to_unicode, train_bpe,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BYTE_LEVEL_COMMITTED_MERGES, RAW_COMMITTED_MERGES,
    )
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    got = train_bpe(docs, "text", n_merges=24, byte_level=True)
    assert got == BYTE_LEVEL_COMMITTED_MERGES
    b2u = bytes_to_unicode()

    def remap(s):
        return "".join(b2u[b] for b in s.encode("utf-8"))
    assert [(remap(l), remap(r)) for l, r in RAW_COMMITTED_MERGES] \
        == BYTE_LEVEL_COMMITTED_MERGES


def test_bytes_to_unicode_is_the_gpt2_table():
    """Spot-pin the remap against the published GPT-2 values and its
    bijectivity (the decode inverse depends on it)."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bytes_to_unicode,
    )
    m = bytes_to_unicode()
    assert len(set(m.values())) == 256
    assert m[ord(" ")] == "Ġ"     # 'Ġ' — the GPT-2 space
    assert m[ord("\n")] == "Ċ"    # 'Ċ'
    assert m[ord("a")] == "a" and m[ord("~")] == "~"
    assert m[0] == "Ā" and m[173] == "Ń"
    assert m[161] == "¡" and m[174] == "®"


def test_artifact_mode_self_description(tmp_path):
    """r11: the artifact file records its encoder discipline;
    expect_mode refuses a mismatched load, pre-r11 files (no mode
    field) read as normalized, and a byte-level artifact round-trips
    merges-only into build_byte_level_vocab."""
    import json

    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BYTE_LEVEL_COMMITTED_MERGES, build_byte_level_vocab,
        load_artifact, save_artifact,
    )
    p = str(tmp_path / "bl.json")
    save_artifact(p, BYTE_LEVEL_COMMITTED_MERGES, mode="byte_level")
    merges, base = load_artifact(p, expect_mode="byte_level")
    assert merges == BYTE_LEVEL_COMMITTED_MERGES and base == []
    assert build_byte_level_vocab(merges) == build_byte_level_vocab()
    with pytest.raises(ValueError, match="mode"):
        load_artifact(p, expect_mode="normalized")
    with pytest.raises(ValueError, match="mode"):
        save_artifact(str(tmp_path / "x.json"), mode="gptx")
    # pre-r11 file without a mode field reads as normalized
    legacy = str(tmp_path / "legacy.json")
    doc = json.load(open(p))
    del doc["mode"]
    json.dump(doc, open(legacy, "w"))
    load_artifact(legacy)  # fine
    with pytest.raises(ValueError, match="mode"):
        load_artifact(legacy, expect_mode="byte_level")


def test_train_bpe_driver_equals_distributed_k1(spark):
    """r13: the driver-side exact-greedy loop is bit-identical to the
    distributed K=1 loop on every seeding mode — same ties, same
    stop, same merges — so AUTO switching between them can never
    change a learned artifact."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for kw in ({}, {"raw": True}, {"raw": True, "attach_ws": True},
               {"byte_level": True}):
        a = train_bpe(docs, "text", n_merges=24, driver_side=True, **kw)
        b = train_bpe(docs, "text", n_merges=24, driver_side=False, **kw)
        assert a == b, kw
    # and on the classic Sennrich fixture, both equal the canon
    canon = train_bpe(_classic(spark), "text", n_merges=8,
                      driver_side=False)
    assert train_bpe(_classic(spark), "text", n_merges=8,
                     driver_side=True) == canon


def test_train_bpe_driver_auto_gate(spark, monkeypatch):
    """AUTO takes the driver path only for canonical K=1 requests
    under the vocab cap: batched rounds keep the distributed batched
    semantics, and a tiny cap forces the cluster loop."""
    from serverless_data_pipeline_spark.operators import bpe as bpe_mod
    calls = []
    real = bpe_mod._train_bpe_driver

    def spy(seeded, n_merges):
        calls.append(len(seeded))
        return real(seeded, n_merges)

    monkeypatch.setattr(bpe_mod, "_train_bpe_driver", spy)
    bpe_mod.train_bpe(_classic(spark), "text", n_merges=4)
    assert len(calls) == 1              # K=1, small vocab -> driver
    bpe_mod.train_bpe(_classic(spark), "text", n_merges=4,
                      merges_per_round=3)
    assert len(calls) == 1              # batched -> distributed
    bpe_mod.train_bpe(_classic(spark), "text", n_merges=4,
                      driver_side_max_words=2)
    assert len(calls) == 1              # over the cap -> distributed
    bpe_mod.train_bpe(_classic(spark), "text", n_merges=4,
                      merges_per_round=3, driver_side=True)
    assert len(calls) == 2              # explicit True wins the gate
