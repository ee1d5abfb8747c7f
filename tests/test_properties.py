"""Property-based differential tests (hypothesis): Spark operator
compositions vs independent pandas references on random inputs. Few,
small examples — each example runs real Spark jobs."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from serverless_data_pipeline_spark.operators.relational import (
    asof_join, dedupe_latest, top_k_per_group,
)

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

_row = st.tuples(st.integers(0, 2),          # key
                 st.integers(0, 50),         # ts seconds
                 st.integers(-100, 100))     # value


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@given(left=st.lists(_row, min_size=1, max_size=12),
       right=st.lists(_row, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # de-dup (key, ts) on the right: our tie policy and pandas' agree only
    # for unique right timestamps per key
    rseen, runique = set(), []
    for k, t, v in right:
        if (k, t) not in rseen:
            rseen.add((k, t))
            runique.append((k, t, v))
    ldf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t, _) in enumerate(left)],
        "lid long, k int, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, _ts(t), float(v)) for k, t, v in runique],
        "k int, ts timestamp, px double")
    got = {r.lid: r.px for r in
           asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
                     right_value_cols=["px"]).collect()}

    lpd = pd.DataFrame([(i, k, _ts(t)) for i, (k, t, _) in enumerate(left)],
                       columns=["lid", "k", "ts"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame([(k, _ts(t), float(v)) for k, t, v in runique],
                       columns=["k", "ts", "px"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward",
                           allow_exact_matches=True)
    expect = {int(r.lid): (None if pd.isna(r.px) else float(r.px))
              for r in merged.itertuples()}
    assert got == expect


@given(rows=st.lists(_row, min_size=1, max_size=15))
@settings(**SETTINGS)
def test_dedupe_latest_is_max_ts_per_key(spark, rows):
    df = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t, _) in enumerate(rows)],
        "rid long, k int, ts timestamp")
    out = dedupe_latest(df, ["k"], [F.col("ts").desc(), F.col("rid").desc()])
    got = {(r.k): (r.ts, r.rid) for r in out.collect()}
    expect = {}
    for i, (k, t, _) in enumerate(rows):
        cur = expect.get(k)
        if cur is None or (_ts(t), i) > cur:
            expect[k] = (_ts(t), i)
    assert got == expect
    assert out.count() == len(expect)          # one row per key


@given(rows=st.lists(_row, min_size=1, max_size=15),
       k=st.integers(1, 3))
@settings(**SETTINGS)
def test_top_k_per_group_matches_pandas(spark, rows, k):
    df = spark.createDataFrame(
        [(i, g, float(v)) for i, (g, _, v) in enumerate(rows)],
        "rid long, g int, v double")
    out = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("rid")], k)
    got = sorted((r.g, r.rid) for r in out.collect())
    pdf = pd.DataFrame([(i, g, float(v)) for i, (g, _, v) in enumerate(rows)],
                       columns=["rid", "g", "v"])
    pdf = pdf.sort_values(["v", "rid"], ascending=[False, True], kind="stable")
    expect = sorted((int(r.g), int(r.rid)) for r in
                    pdf.groupby("g").head(k).itertuples())
    assert got == expect


@given(docs=st.lists(st.lists(st.sampled_from("abcde"), min_size=0,
                              max_size=12), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_repetition_ratios_match_python_reference(spark, docs):
    """dup_token_ratio/dup_ngram_ratio vs a direct Python computation on
    random token lists (including empty and shorter-than-n docs)."""
    from serverless_data_pipeline_spark.operators.text import (
        repetition_signals,
    )
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           repetition_signals(df, "doc_id", "text", ngram_n=3).collect()}
    for i, toks in enumerate(docs):
        r = got[i]
        assert r.tok_total == len(toks)
        assert r.tok_distinct == len(set(toks))
        exp_tok = (1 - len(set(toks)) / len(toks)) if toks else 0.0
        assert abs(r.dup_token_ratio - round(exp_tok, 6)) < 1e-9
        if toks and len(toks) < 3:
            sh = [" ".join(toks)]
        else:
            sh = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        sh = [x for x in sh if x]
        assert r.ngram_total == len(sh)
        exp_ng = (1 - len(set(sh)) / len(sh)) if sh else 0.0
        assert abs(r.dup_ngram_ratio - round(exp_ng, 6)) < 1e-9


@given(train=st.lists(st.lists(st.sampled_from("abc"), min_size=0,
                               max_size=8), min_size=1, max_size=6),
       ev=st.lists(st.lists(st.sampled_from("abc"), min_size=0,
                            max_size=8), min_size=1, max_size=4))
@settings(**SETTINGS)
def test_decontaminate_matches_python_set_overlap(spark, train, ev):
    """contaminated/n_overlap vs a direct Python shingle-set
    intersection, over random short-alphabet docs (high collision rate
    stresses the distinct/semi-join path)."""
    from serverless_data_pipeline_spark.operators.corpus import decontaminate

    def sh(toks, n=3):
        if not toks:
            return set()
        if len(toks) < n:
            s = " ".join(toks)
            return {s} if s else set()
        return {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}

    tdf = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(train)],
        "doc_id long, text string")
    edf = spark.createDataFrame(
        [(100 + i, " ".join(t)) for i, t in enumerate(ev)],
        "doc_id long, text string")
    eset = set().union(*(sh(t) for t in ev)) if ev else set()
    got = {r.doc_id: r for r in
           decontaminate(tdf, edf, "doc_id", "text", n=3).collect()}
    assert set(got) == set(range(len(train)))  # no rows dropped
    for i, t in enumerate(train):
        overlap = len(sh(t) & eset)
        assert got[i].n_overlap == overlap, (i, t)
        assert got[i].contaminated == (overlap >= 1)


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(docs=st.lists(_doc, min_size=2, max_size=10),
       threshold=st.sampled_from([0.2, 0.4, 0.6, 0.9]),
       positional=st.booleans())
@settings(**SETTINGS)
def test_prefix_filtered_jaccard_matches_bruteforce(spark, docs, threshold,
                                                    positional):
    """The prefix-filter lemma is LOSSLESS — and so are the PPJoin length
    + positional filters when enabled: ngram_jaccard_pairs must equal
    the O(n^2) Python ground truth (distinct word-3-gram sets, whole-text
    shingle for short docs) for every random corpus and threshold, with
    the positional filter both off (default) and on."""
    from serverless_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    def shingle_set(text):
        toks = [t for t in text.split() if t]
        if not toks:
            return set()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingle_set(d) for i, d in enumerate(docs)}
    expect = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                j = inter / union
                if j >= threshold:
                    expect[(a, b)] = round(j, 6)

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(
               df, "doc_id", "text", n=3, threshold=threshold,
               positional_filter=positional).collect()}
    assert got == expect


# ------------------------------------------------- passage dedup reference

def _passage_reference(docs: list[tuple[int, str]], k: int):
    """Brute-force reference: rank every k-token window by (doc, pos);
    tokens covered by any non-first occurrence of a duplicated window are
    removed; docs rebuilt, empty docs vanish."""
    toks = {i: t.split() for i, t in docs if t.split()}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p:p + k]), []).append((i, p))
    removed: dict[int, set[int]] = {}
    for places in occ.values():
        for (i, p) in sorted(places)[1:]:
            removed.setdefault(i, set()).update(range(p, p + k))
    out = {}
    for i, ts in toks.items():
        kept = [t for q, t in enumerate(ts) if q not in removed.get(i, ())]
        if kept:
            out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


# Small vocabulary + short docs => frequent genuine window collisions.
_tok_doc = st.lists(st.sampled_from("a b c d".split()),
                    min_size=0, max_size=12)


@given(texts=st.lists(_tok_doc, min_size=1, max_size=6),
       k=st.integers(2, 4))
@settings(**SETTINGS)
def test_passage_dedup_matches_bruteforce_reference(spark, texts, k):
    from serverless_data_pipeline_spark.operators.corpus import passage_dedup

    docs = [(i, " ".join(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for rank_via in ("window", "minjoin"):
        got = {r.doc_id: (r.text, r.n_tokens, r.n_removed)
               for r in passage_dedup(df, "doc_id", "text", k=k,
                                      rank_via=rank_via).collect()}
        assert got == _passage_reference(docs, k), (rank_via, docs, k)


_wtoks = st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
                  min_size=0, max_size=10)


@given(train=st.lists(_wtoks, min_size=1, max_size=8),
       ev=st.lists(_wtoks, min_size=0, max_size=4),
       m_bits=st.sampled_from([1 << 6, 1 << 10, 1 << 20]))
@settings(**SETTINGS)
def test_bloom_decontaminate_superset_of_exact(spark, train, ev, m_bits):
    """One-sided error as a universal property: on random short-alphabet
    corpora at ANY bitmap size (down to a single 64-bit word, where
    false positives are rampant), the Bloom-flagged set contains the
    exact-flagged set and per-doc n_overlap never undercounts."""
    from serverless_data_pipeline_spark.operators.corpus import (
        bloom_decontaminate, decontaminate,
    )
    tdf = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(train)],
        "doc_id long, text string")
    edf = spark.createDataFrame(
        [(100 + i, " ".join(t)) for i, t in enumerate(ev)],
        "doc_id long, text string")
    exact = {r.doc_id: r.n_overlap for r in
             decontaminate(tdf, edf, "doc_id", "text", n=3).collect()}
    bloom = {r.doc_id: r.n_overlap for r in
             bloom_decontaminate(tdf, edf, "doc_id", "text", n=3,
                                 m_bits=m_bits, k_hashes=3).collect()}
    assert set(bloom) == set(exact)          # same rows survive
    for i, n in exact.items():
        assert bloom[i] >= n, (i, m_bits)    # never undercounts


@given(groups=st.lists(st.tuples(st.sampled_from("abcdef"),
                                 st.integers(1, 30)),
                       min_size=1, max_size=5, unique_by=lambda g: g[0]),
       alpha=st.sampled_from([0.0, 0.3, 0.7, 1.0]))
@settings(**SETTINGS)
def test_temperature_mix_quota_properties(spark, groups, alpha):
    """Universal quota laws: every group keeps >= 1 row and <= its full
    size; alpha=1 is the identity mixture; kept counts equal the
    closed-form quota computed in Python."""
    import math

    from serverless_data_pipeline_spark.operators.corpus import (
        temperature_mix,
    )
    rows, base = [], 0
    for g, n in groups:
        rows += [(base + j, g) for j in range(n)]
        base += 100
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = {r[0]: r[1] for r in
            temperature_mix(df, "lang", "doc_id", alpha=alpha)
            .groupBy("lang").count().collect()}
    sizes = dict(groups)
    N = sum(sizes.values())
    Z = sum(n ** alpha for n in sizes.values())
    for g, n in sizes.items():
        expect = min(n, max(1, math.ceil(round(n ** alpha / Z * N, 6))))
        assert kept.get(g, 0) == expect, (g, alpha)
        assert 1 <= kept[g] <= n


@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40,
                    unique=True),
       seed=st.integers(0, 5),
       num_shards=st.integers(1, 6))
@settings(**SETTINGS)
def test_global_shuffle_is_a_permutation_with_dense_positions(
        spark, ids, seed, num_shards):
    """global_shuffle laws on arbitrary id sets: output ids are exactly
    the input ids (a permutation, never a sample or duplication), every
    shard is in range, and positions within each shard are exactly
    1..count with no gaps — regardless of seed or shard count."""
    from serverless_data_pipeline_spark.operators.corpus import (
        global_shuffle,
    )
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = global_shuffle(df, "doc_id", seed=seed,
                          num_shards=num_shards).collect()
    assert sorted(r.doc_id for r in rows) == sorted(ids)
    assert all(0 <= r.shard < num_shards for r in rows)
    by = {}
    for r in rows:
        by.setdefault(r.shard, []).append(r.pos)
    assert all(sorted(ps) == list(range(1, len(ps) + 1))
               for ps in by.values())


@given(groups=st.lists(st.tuples(st.sampled_from("abcd"),
                                 st.integers(1, 40)),
                       min_size=1, max_size=25),
       alpha=st.sampled_from([0.0, 0.3, 0.7, 1.0]))
@settings(**SETTINGS)
def test_token_budget_mix_budget_laws(spark, groups, alpha):
    """token_budget_mix laws: every group keeps >= 1 doc; the kept
    prefix is exactly the md5-rank order (no doc skipped before a kept
    one); the running weight before each kept doc is inside the quota
    (first-fit-with-overshoot — at most the LAST kept doc crosses);
    alpha=1 with the default target keeps everything."""
    from serverless_data_pipeline_spark.operators.corpus import (
        token_budget_mix,
    )
    rows = [(i, g, w) for i, (g, w) in enumerate(groups)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    out = token_budget_mix(df, "lang", "doc_id", "n", alpha=alpha)
    got = out.collect()
    langs_in = {g for g, _ in groups}
    by = {}
    for r in got:
        by.setdefault(r.lang, []).append(r)
    assert set(by) == langs_in
    for g, rs in by.items():
        rs = sorted(rs, key=lambda r: r.sample_rank)
        # ranks are a dense prefix 1..k (md5 order, no skips)
        assert [r.sample_rank for r in rs] == list(range(1, len(rs) + 1))
        # first-fit: weight BEFORE each kept doc is below the quota
        for r in rs:
            assert r.cum_weight - r.n < r.quota_w + 1e-9
    if alpha == 1.0:
        assert len(got) == len(rows)


@given(groups=st.lists(st.tuples(st.sampled_from("abc"),
                                 st.sampled_from([0.0, 0.5, 1.0, 1.5,
                                                  2.0, 2.5, 3.0])),
                       min_size=1, max_size=6),
       n_per=st.integers(1, 8))
@settings(**SETTINGS)
def test_repeat_by_epochs_total_count_law(spark, groups, n_per):
    """repeat_by_epochs law: for a group of n docs at e epochs, the
    total repetitions are exactly n*floor(e) + round(frac(e)*n), every
    doc appears floor(e) or floor(e)+1 times, and epoch indices are
    dense 0..k-1."""
    import math

    from serverless_data_pipeline_spark.operators.corpus import (
        repeat_by_epochs,
    )
    emap = dict(groups)  # later duplicates win, like the operator's map
    rows = [(gi * 1000 + i, g)
            for gi, g in enumerate(sorted(emap))
            for i in range(n_per)]
    df = spark.createDataFrame(rows, "doc_id long, bucket string")
    out = repeat_by_epochs(df, "bucket", "doc_id", emap).collect()
    by = {}
    for r in out:
        by.setdefault(r.bucket, []).append(r)
    for g in sorted(emap):
        e = emap[g]
        base = math.floor(e)
        # HALF-UP like Spark/DuckDB ROUND — Python's round() is
        # banker's and disagrees exactly at .5 quota ties
        extra = math.floor(round(e - base, 6) * n_per + 0.5)
        expect = n_per * base + extra
        got = by.get(g, [])
        assert len(got) == expect, (g, e, len(got), expect)
        per = {}
        for r in got:
            per.setdefault(r.doc_id, set()).add(r.epoch)
        assert all(v == set(range(len(v))) for v in per.values())
        assert all(len(v) in (base, base + 1) for v in per.values())


@given(texts=st.lists(
    st.text(
        # any codepoint except surrogates (unencodable in UTF-8);
        # includes control chars, unicode whitespace, emoji, CJK
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=40),
    min_size=1, max_size=6))
@settings(**SETTINGS)
def test_bpe_raw_round_trip_is_exact_on_arbitrary_unicode(spark, texts):
    """The r10 raw-tokenizer law as a property: for ARBITRARY unicode
    text (control chars, unicode whitespace, emoji, combining marks —
    anything UTF-8 can carry), decode(encode(x, raw)) == x exactly,
    the symbol stream concatenates back to x, and UNK id 0 never
    appears. One Spark job per example set (texts batched into a
    single frame)."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode_ids,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        COMMITTED_MERGES, build_vocab,
    )
    v = build_vocab()
    df = spark.createDataFrame(list(enumerate(texts)),
                               "id int, text string")
    out = bpe_decode_ids(
        bpe_encode_ids(df, "text", COMMITTED_MERGES, v,
                       byte_fallback=True, raw=True, sym_col="sym"),
        "token_ids", v, raw=True)
    for r in out.collect():
        want = texts[r.id]
        assert r.decoded_text == want
        assert "".join(r.sym) == want
        assert 0 not in r.token_ids


@given(texts=st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=40),
    min_size=1, max_size=6))
@settings(**SETTINGS)
def test_bpe_attached_round_trip_is_exact_on_arbitrary_unicode(
        spark, texts):
    """The attach_ws refinement preserves the exact-raw law on
    arbitrary unicode: attached pretokens are still a partition of the
    input, so decode(encode(x)) == x byte-for-byte under the
    raw-service artifact too."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode_ids,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BPE_RAW_BASE_CHARS, RAW_COMMITTED_MERGES, build_vocab,
    )
    rvocab = build_vocab(RAW_COMMITTED_MERGES, BPE_RAW_BASE_CHARS)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "id int, text string")
    out = bpe_decode_ids(
        bpe_encode_ids(df, "text", RAW_COMMITTED_MERGES, rvocab,
                       byte_fallback=True, raw=True, attach_ws=True,
                       sym_col="sym"),
        "token_ids", rvocab, raw=True)
    for r in out.collect():
        assert r.decoded_text == texts[r.id]
        assert "".join(r.sym) == texts[r.id]
        assert 0 not in r.token_ids


@given(hosts=st.lists(st.sampled_from(["a", "b", "c", "mega", None]),
                      min_size=1, max_size=40),
       quota=st.integers(1, 5),
       default=st.one_of(st.none(), st.integers(1, 3)),
       seed=st.integers(0, 3))
@settings(**SETTINGS)
def test_host_quota_bucketed_equals_window_property(
        spark, hosts, quota, default, seed):
    """The skew-safe bucketed ranking is EXACTLY the window ranking —
    same kept docs, same rank values — for arbitrary host mixes (NULL
    hosts included), quotas, defaults and seeds."""
    from serverless_data_pipeline_spark.operators.urls import (
        host_quota_sample,
    )
    docs = spark.createDataFrame(list(enumerate(hosts)),
                                 "doc_id long, host string")
    q = {"mega": quota, "a": quota + 1}
    res = []
    for mode in ("window", "bucketed"):
        got = host_quota_sample(docs, q, default_quota=default,
                                seed=seed, rank_via=mode)
        res.append({(r.doc_id, r.host, r.host_rank_pos)
                    for r in got.collect()})
    assert res[0] == res[1]


@given(ids_lists=st.lists(st.lists(st.integers(0, 999),
                                   max_size=7),
                          min_size=1, max_size=25),
       block_len=st.integers(1, 9),
       eos=st.one_of(st.none(), st.integers(1000, 1001)),
       n_shards=st.integers(1, 3))
@settings(**SETTINGS)
def test_pack_token_blocks_stream_law_property(
        spark, ids_lists, block_len, eos, n_shards):
    """For arbitrary id lists: with drop_last=False, concatenating a
    shard's blocks in block order reproduces the per-doc (ids + EOS)
    concatenation in id order exactly; every block is <= block_len;
    all non-final blocks are exactly block_len; spans tile each
    block contiguously with correct per-doc attribution."""
    from serverless_data_pipeline_spark.operators.corpus import (
        pack_token_blocks,
    )
    df = spark.createDataFrame(list(enumerate(ids_lists)),
                               "doc_id long, token_ids array<int>")
    out = sorted(pack_token_blocks(
        df, "doc_id", "token_ids", block_len=block_len, eos_id=eos,
        n_shards=n_shards, drop_last=False).collect(),
        key=lambda r: (r.shard, r.block_id))
    got, spans_ok = {}, True
    for r in out:
        got.setdefault(r.shard, []).extend(r.ids)
        assert len(r.ids) <= block_len
        pos = 0
        for sp in r.doc_spans:
            assert sp.start == pos
            expect_piece = (list(ids_lists[sp.doc_id])
                            + ([eos] if eos is not None else []))
            # the span's slice of the block equals the doc's slice
            o = _span_off(out, r, sp)
            assert r.ids[sp.start:sp.start + sp.len] \
                == expect_piece[o:o + sp.len]
            pos += sp.len
        assert pos == len(r.ids)
    expect = {}
    for i, ids in enumerate(ids_lists):
        stream = list(ids) + ([eos] if eos is not None else [])
        if stream:
            expect.setdefault(i % n_shards, []).extend(stream)
    assert got == expect
    # all non-final blocks per shard are full
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        for r in rows[:-1]:
            assert len(r.ids) == block_len


def _span_off(out, row, sp):
    """Offset of this block-span inside its document's id stream: the
    sum of this doc's span lengths in earlier blocks of the shard."""
    off = 0
    for r in out:
        if r.shard != row.shard or r.block_id >= row.block_id:
            continue
        for s in r.doc_spans:
            if s.doc_id == sp.doc_id:
                off += s.len
    return off


@given(ids_lists=st.lists(st.lists(st.integers(0, 99), max_size=5),
                          min_size=1, max_size=20),
       split=st.integers(0, 20),
       block_len=st.integers(1, 7),
       n_shards=st.integers(1, 3))
@settings(**SETTINGS)
def test_resume_token_blocks_equivalence_property(
        spark, ids_lists, split, block_len, n_shards):
    """resume == full repack for arbitrary id lists and ANY id-ordered
    split point (empty prior state and empty new batch included)."""
    from serverless_data_pipeline_spark.operators.corpus import (
        pack_token_blocks, resume_token_blocks,
    )
    split = min(split, len(ids_lists))
    rows = list(enumerate(ids_lists))
    schema = "doc_id long, token_ids array<int>"
    A = spark.createDataFrame(rows[:split] or [], schema)
    B = spark.createDataFrame(rows[split:] or [], schema)
    kw = dict(block_len=block_len, eos_id=100, n_shards=n_shards)
    state = pack_token_blocks(A, "doc_id", "token_ids",
                              drop_last=False, **kw)
    out = resume_token_blocks(state, B, "doc_id", "token_ids", **kw)

    def key(rows):
        return {(r.shard, r.block_id, tuple(r.ids),
                 tuple((s.start, s.len, s.doc_id)
                       for s in r.doc_spans)) for r in rows}
    st_rows = state.collect()
    tails = {}
    for r in st_rows:
        tails[r.shard] = max(tails.get(r.shard, -1), r.block_id)
    merged = key(r for r in st_rows
                 if r.block_id < tails[r.shard]) | key(out.collect())
    full = key(pack_token_blocks(
        spark.createDataFrame(rows, schema), "doc_id", "token_ids",
        drop_last=False, **kw).collect())
    assert merged == full


# vocab_via bit-identity over ARBITRARY artifacts (r11) --------------------

_word = st.text(alphabet="abc xy\t", min_size=0, max_size=12)


@given(texts=st.lists(_word, min_size=1, max_size=5),
       merge_pool=st.lists(
           st.tuples(st.sampled_from("abcxy"), st.sampled_from("abcxy")),
           min_size=0, max_size=6),
       raw=st.booleans())
@settings(**SETTINGS)
def test_bpe_vocab_via_modes_bit_identical_property(spark, texts,
                                                    merge_pool, raw):
    """literal and broadcast encode produce identical ids / unk rates
    for ARBITRARY merge lists and messy text — not just the committed
    artifacts; and decode inverts both identically."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode_ids,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        BPE_BASE_CHARS, BPE_RAW_BASE_CHARS, build_vocab,
    )
    # dedupe merge outputs so the artifact passes the guard
    merges, seen = [], set()
    for l, r in merge_pool:
        if l + r not in seen:
            seen.add(l + r)
            merges.append((l, r))
    vocab = build_vocab(merges,
                        BPE_RAW_BASE_CHARS if raw else BPE_BASE_CHARS)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    outs = {}
    for via in ("literal", "broadcast"):
        enc = bpe_encode_ids(df, "text", merges, vocab,
                             byte_fallback=True, unk_col="unk",
                             raw=raw, vocab_via=via)
        dec = bpe_decode_ids(enc, "token_ids", vocab, raw=raw,
                             vocab_via=via)
        outs[via] = sorted(
            (r.doc_id, r.token_ids, r.unk, r.decoded_text)
            for r in dec.collect())
    assert outs["literal"] == outs["broadcast"]


@given(words=st.lists(st.text(alphabet="ab", min_size=1, max_size=7),
                      min_size=1, max_size=8))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_train_bpe_driver_equals_distributed_on_random_corpora(
        spark, words):
    """r13: the driver-side exact-greedy trainer (incremental pair
    counts + lazy heap) is bit-identical to the distributed K=1 loop
    on ADVERSARIAL random corpora, not just the fixtures — a two-char
    alphabet forces dense count ties (heap tie-break vs the
    distributed (count desc, l, r) order) and runs like 'aaaa' force
    overlapping-pair occurrences, the regime where an incremental
    neighbor-delta update can silently diverge from the distributed
    full recount."""
    from serverless_data_pipeline_spark.operators.bpe import train_bpe

    df = spark.createDataFrame(
        [(" ".join(words[i::3]),) for i in range(3) if words[i::3]],
        "text string")
    a = train_bpe(df, "text", n_merges=6, driver_side=True)
    b = train_bpe(df, "text", n_merges=6, driver_side=False)
    assert a == b
