"""Byte-pair-encoding vocabulary training (charter extension X8 —
tokenizer prep).

The standard subword-vocabulary learner (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units", ACL):
repeatedly merge the most frequent adjacent symbol pair. X8's
``vocabulary`` builds a word-level top-N; this learns the SUBWORD
inventory a real tokenizer ships with.

Scale design — the shape that survives 100 TB:

- Training NEVER iterates over the corpus. One corpus-wide word-count
  aggregation (the only corpus-sized shuffle) reduces 100 TB of text to
  the distinct-word frequency table (|vocab| rows — millions, not
  trillions), exactly like the reference implementation's
  ``collections.Counter`` preprocessing, but distributed.
- The merge loop itself runs over the |vocab|-row table, never the
  corpus. Default (r13): when that table fits on the driver, the loop
  is the exact single-node greedy every production trainer uses
  (incremental pair counts + lazy max-heap — 2.8 ms/merge measured),
  because a distributed round pays ~1 s of job floor regardless of
  data size. Fallback for unbounded vocabularies: each round is one
  tiny aggregation over the words frame (pair-explode weighted by
  word count -> argmax) plus one narrow Arrow-batched rewrite, with
  disjoint-merge batching (merges_per_round) to amortize rounds; the
  words frame is localCheckpoint'ed every round so no rewrite is
  evaluated twice.
- Encoding (``bpe_encode``) is an Arrow-batched pandas UDF applying the
  learned merge list with the reference greedy algorithm — one narrow
  pass, no shuffle, linear at any corpus size.
- The token→id lookup scales with the artifact (r11 ``vocab_via``):
  small vocabs ride a foldable JVM map literal; production 32k-100k
  vocabs ship ONCE per executor as a broadcast variable fused into the
  same single Python crossing — the plan stays O(1) in vocab size and
  there is never a symbol-grain shuffle. Modes are bit-identical
  (pytest- and hypothesis-pinned).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_data_pipeline_spark.functions.text import tokens

__all__ = ["train_bpe", "bpe_encode", "bpe_encode_ids",
           "bpe_decode_ids", "tokenizer_fertility",
           "bytes_to_unicode"]

END = "</w>"          # Sennrich end-of-word marker


def _word_counts(df: DataFrame, text_col: str, *,
                 raw: bool = False,
                 attach_ws: bool = False) -> DataFrame:
    """Corpus -> distinct-word frequency table: the ONE corpus-sized
    aggregation in BPE training. ``raw`` keeps case (the raw-mode
    word universe); the word boundary is the same ASCII-whitespace
    class either way, so raw training counts exactly the word pieces
    the raw pretokenizer will emit. ``attach_ws`` counts the
    leading-whitespace-attached pretokens instead (see
    ``bpe_encode``) — spaces then participate in merge statistics."""
    if attach_ws:
        pieces = F.regexp_extract_all(
            F.col(text_col), F.lit(_RAW_ATTACHED_RE.pattern), 0)
        return (df.select(F.explode(pieces).alias("w"))
                .groupBy("w").agg(F.count("*").alias("n")))
    col = F.col(text_col) if raw else F.lower(F.col(text_col))
    return (df.select(F.explode(tokens(col)).alias("w"))
            .groupBy("w").agg(F.count("*").alias("n")))


def _train_bpe_driver(seeded: list[tuple[list[str], int]],
                      n_merges: int) -> list[tuple[str, str]]:
    """The driver-side hot loop of ``train_bpe``: exact canonical
    greedy BPE (Sennrich reference) over the collected distinct-word
    frequency table, with incremental pair-count maintenance and a
    lazy max-heap — the single-node structure every production BPE
    trainer uses (HF tokenizers' trainer, SentencePiece's BPE mode),
    because after the corpus-wide word count the merge loop's working
    set is |vocab| rows, not corpus rows, and each merge's TRUE cost
    is the handful of words containing the merged pair.

    Exactness: ties break (count desc, then lexicographic (l, r)) and
    each accepted pair rewrites its words in one left-to-right
    non-overlapping pass — bit-identical to the distributed K=1 loop
    (pinned by pytest against the classic Sennrich fixture, the
    committed artifacts, and the distributed path directly). Stops
    when no pair occurs twice. Cost: each successful merge re-scans
    only the words holding that pair (tracked by an add-only inverted
    index with lazy staleness checks), so total work scales with the
    merged pairs' OCCURRENCE mass in the vocab — O(sum of
    word-length^2) worst case, i.e. with |vocab|, never with corpus
    rows — vs ~1 s of distributed-job floor PER ROUND in the cluster
    loop (measured r13, SCALE_r13.json: 16,384 merges in 46 s over
    the 200k-word scale fixture — and a full production-size 32,768-
    merge vocab in 39 s end to end on the same fixture; later merges
    touch ever-fewer words — and 583 s over its 2M-word 10x
    variant — 2.8-36 ms/merge, vs 0.095-0.15 s/MERGE distributed;
    the 10x fixture grows the VOCAB 10x by construction — every
    content word globally unique — where a real corpus's vocab
    saturates far below corpus growth, Heaps' law)."""
    import heapq
    from collections import Counter

    words = [list(sym) for sym, _ in seeded]
    freqs = [n for _, n in seeded]
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, sym in enumerate(words):
        n = freqs[wi]
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + n
            where.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, p = heapq.heappop(heap)
        c = pair_counts.get(p, 0)
        if -negc != c:
            continue                    # stale heap entry
        if c < 2:
            break                       # matches the distributed stop
        l, r = p
        tok = l + r
        merges.append(p)
        pair_counts.pop(p, None)
        for wi in where.pop(p, ()):     # add-only index: superset
            sym = words[wi]
            n = freqs[wi]
            # ONE left-to-right pass: rewrite and accumulate the
            # neighbor-pair deltas AROUND each merge site (the classic
            # incremental update) — no per-word recount, so a stale
            # index entry (pair since consumed) costs one cheap scan
            # and touches no count structures at all
            delta: dict[tuple[str, str], int] = {}
            out: list[str] = []
            i, m_ = 0, len(sym)
            while i < m_:
                s = sym[i]
                if s == l and i + 1 < m_ and sym[i + 1] == r:
                    if out:
                        a = out[-1]
                        q = (a, l)
                        delta[q] = delta.get(q, 0) - 1
                        q = (a, tok)
                        delta[q] = delta.get(q, 0) + 1
                    if i + 2 < m_:
                        b = sym[i + 2]
                        q = (r, b)
                        delta[q] = delta.get(q, 0) - 1
                        q = (tok, b)
                        delta[q] = delta.get(q, 0) + 1
                    out.append(tok)
                    i += 2
                else:
                    out.append(s)
                    i += 1
            if len(out) == m_:
                continue                # stale: pair since consumed
            words[wi] = out
            for q, dq in delta.items():
                # (l, r) itself never lands in delta: its removal is
                # the pair_counts.pop(p) above, and a full left-to-
                # right pass can never recreate it; a neighbor delta
                # CAN hit (a, l) == p when a == l — that occurrence
                # was already popped with p, so skip it here too
                if not dq or q == p:
                    continue
                nc = pair_counts.get(q, 0) + dq * n
                if nc <= 0:
                    pair_counts.pop(q, None)
                else:
                    pair_counts[q] = nc
                    heapq.heappush(heap, (-nc, q))
                    if dq > 0:
                        where.setdefault(q, set()).add(wi)
    return merges


def train_bpe(df: DataFrame, text_col: str = "text", *,
              n_merges: int = 32,
              checkpoint_every: int = 1,
              merges_per_round: int = 1,
              raw: bool = False,
              attach_ws: bool = False,
              byte_level: bool = False,
              driver_side: bool | None = None,
              driver_side_max_words: int = 4_000_000
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a corpus. Returns the
    ordered merge list [(left, right), ...] — the artifact a tokenizer
    ships (apply with ``bpe_encode``).

    Deterministic: ties on pair frequency break lexicographically on
    (left, right), so the learned merges are independent of
    partitioning. Stops early when no pair occurs twice.

    Two execution paths share the one corpus-sized stage (the
    distributed word count):

    ``driver_side`` (r13, default AUTO): when the distinct-word table
    fits (``<= driver_side_max_words`` rows) and the caller asked for
    canonical K=1 training, the merge loop runs DRIVER-SIDE over the
    collected (symbols, count) table with incremental pair-count
    maintenance and a lazy max-heap (``_train_bpe_driver``) — the
    structure HF tokenizers / SentencePiece use, because each merge's
    true cost is the few words containing the pair, while a
    distributed round pays ~1 s of job floor regardless. Measured on
    the r13 scale fixture (SCALE_r13.json): 16,384 merges in 46 s at
    200k distinct words / 583 s at 2M (word count + collect included;
    the loop scales with |vocab|, not corpus rows) vs
    0.095-0.15 s/MERGE in cluster rounds. Bit-identical to the
    distributed K=1 loop (pytest-pinned). Pass ``driver_side=False``
    to force cluster rounds (vocab too big to collect), ``True`` to
    force the collect regardless of the gate.

    Distributed path: each merge round is one tiny aggregation over
    the distinct-WORD frame plus ONE driver round-trip (the top rows)
    — inherent to BPE's sequential dependency. Guidance at scale:
    train on a SAMPLE (BPE statistics saturate quickly — a few
    hundred MB of text per language is the standard practice, cf.
    SentencePiece's default input-sentence cap), not the full 100 TB
    corpus; the word-count table for such a sample then also fits the
    driver path, which is why AUTO collects it.

    ``checkpoint_every`` defaults to 1 (r12, measured at real merge
    counts): each round's words frame is localCheckpoint'ed before
    the next round's pair count, so every rewrite is EVALUATED
    EXACTLY ONCE — with a sparser cadence, each round's eager pair
    collect re-runs all rewrites since the last checkpoint (512
    merges on the vocabulary-rich scale fixture: 259 s measured at a
    sparser every-4 cadence — the pre-r12 default was 8, costlier
    still — vs 144 s at 1, merges_per_round=64). Raise it
    only when checkpoint write I/O, not recompute, dominates.

    ``merges_per_round`` > 1 is the batched variant for when the
    round count itself matters: each round accepts up to K of the
    top-ranked pairs that are pairwise NON-INTERACTING — a candidate
    is skipped if its left/right symbol, or the token it would form,
    collides with any symbol already used by an accepted pair this
    round. Disjointness makes the batch EXACT: no accepted pair can
    create or destroy occurrences of another, so applying the batch
    in one rewrite equals applying its members sequentially at their
    counted frequencies. What changes vs K=1 is the GREEDY ORDER —
    true BPE would re-rank after every merge and might prefer a pair
    involving a just-formed token; the batch defers those to the next
    round (the standard trade scalable BPE trainers make). K=1 is
    bit-identical to the canonical algorithm.

    ``raw=True`` (r10) learns the merge list for RAW-mode service
    (``bpe_encode(raw=True)``): words keep their case and the
    end-of-word marker is never appended — exactly the symbol streams
    the raw pretokenizer produces, so every learned pair can actually
    fire at encode time (a lowercase normalized-mode list applied to
    raw text only compresses lowercase spans, and its ``</w>``-bearing
    merges never fire at all). Whitespace symbols never enter training
    — the raw encoder emits them as standalone byte-escaped symbols
    that, by design, never merge. Same plan shape, same determinism.
    ``attach_ws=True`` (raw only) trains over the leading-whitespace-
    attached pretokens instead — whitespace becomes a symbol and the
    learner discovers space-prefixed tokens (' the'), the GPT-2 vocab
    shape; pair with ``bpe_encode(raw=True, attach_ws=True)``.

    ``byte_level=True`` (r11) is GPT-2-STYLE byte-level BPE: attached
    pretokens remapped to printable BYTE symbols through the exact
    published ``bytes_to_unicode`` table, merges learned over bytes —
    so merges can span multi-byte characters, the 256-symbol base
    covers every possible input, and nothing can ever be
    out-of-vocab. The byte remap is GPT-2's; the PRETOKENIZER is this
    framework's whitespace-attached split, NOT GPT-2's contraction/
    letter/digit/punctuation regex, so segmentation — and therefore
    the learned merges and emitted token streams — differ from real
    GPT-2 on punctuation and contractions (r11 ADVICE: do not expect
    GPT-2-compatible token ids). Pair with ``bpe_encode_ids(...,
    byte_level=True)`` and ``build_byte_level_vocab``. Standalone
    mode (do not combine with raw/attach_ws flags); same plan shape —
    the per-word byte remap is a 256-entry foldable hex-pair map."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    if attach_ws and not raw:
        raise ValueError("attach_ws applies to raw mode only")
    if byte_level and (raw or attach_ws):
        raise ValueError("byte_level is a standalone mode — it "
                         "implies its own raw attached-pretoken "
                         "discipline")
    if byte_level:
        hexstr = F.hex(F.encode(F.col("w"), "UTF-8"))
        u_map = F.create_map(*[F.lit(x) for b in range(256)
                               for x in (f"{b:02X}", _B2U[b])])
        seed = F.transform(
            F.sequence(F.lit(1), F.shiftright(F.length(hexstr), 1)),
            lambda i: F.element_at(
                u_map, F.substring(hexstr, i * 2 - 1, 2)))
    else:
        seed = (F.split("w", "") if raw
                else F.concat(F.split("w", ""), F.array(F.lit(END))))
    words = (_word_counts(df, text_col, raw=raw or byte_level,
                          attach_ws=attach_ws or byte_level)
             .select(seed.alias("sym"), "n")
             .localCheckpoint(eager=False))
    if driver_side is None:
        # auto: the driver path IS the canonical K=1 algorithm, so it
        # only ever replaces the K=1 loop (a user asking for batched
        # rounds asked for the distributed batched semantics); the
        # |vocab| gate keeps the collect bounded — one count() probe
        # against the checkpointed frame, paid once per training run
        driver_side = (merges_per_round == 1
                       and words.count() <= driver_side_max_words)
    if driver_side:
        # Arrow-batched transfer (toPandas), not a py4j row collect —
        # at millions of vocab rows the row path deserializes one
        # object at a time and dominates the whole training run
        pdf = words.toPandas()
        return _train_bpe_driver(
            list(zip(pdf["sym"].tolist(), pdf["n"].tolist())),
            n_merges)
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        pairs = words.select(
            F.explode(F.zip_with(
                F.slice("sym", 1, F.greatest(F.size("sym") - 1, F.lit(0))),
                F.slice("sym", 2, F.greatest(F.size("sym") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")))
            ).alias("p"), "n")
        want = min(merges_per_round, n_merges - len(merges))
        # over-fetch so the disjointness filter can still fill a batch
        top = (pairs.groupBy("p.l", "p.r")
               .agg(F.sum("n").alias("cnt"))
               .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
               .limit(max(want * 4, 1)).collect())
        batch: list[tuple[str, str]] = []
        used: set[str] = set()
        for row in top:
            if len(batch) == want:
                break
            if row["cnt"] < 2:
                break
            l, r = row["l"], row["r"]
            if l in used or r in used or (l + r) in used:
                continue
            batch.append((l, r))
            used.update((l, r, l + r))
        if not batch:
            break
        merges.extend(batch)
        # rewrite each word's symbol array left-to-right, joining a
        # pair wherever (prev, cur) hits one of the batch's rules —
        # the exact reference greedy rewrite; the rules are
        # symbol-disjoint, so at most one rule can fire at any
        # position and application order is immaterial. Arrow-batched
        # pandas UDF with a dict lookup per symbol: O(|sym|) per word
        # INDEPENDENT of batch size, which measured ~35% faster than
        # the r12 in-expression K-branch WHEN fold (interpreted HOF,
        # O(|sym| x K) per word) at K=128 on the scale fixture — and
        # lets merges_per_round grow without growing the plan.
        rules = {(l, r): l + r for l, r in batch}

        @F.pandas_udf("array<string>")
        def _rw(col):
            def one(sym):
                out: list[str] = []
                for s in sym:
                    if out:
                        t = rules.get((out[-1], s))
                        if t is not None:
                            out[-1] = t
                            continue
                    out.append(s)
                return out
            return col.map(one)

        words = words.select(_rw("sym").alias("sym"), "n")
        rounds += 1
        if rounds % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    return merges


_RAW_WS = " \t\n\x0b\f\r"
_RAW_PIECE_RE = re.compile(
    "[" + _RAW_WS + "]|[^" + _RAW_WS + "]+")
# attached pretokens (GPT-2 discipline): a word CARRIES its leading
# whitespace run, a trailing run with no following word stands alone —
# still an exact partition of the input, so the round-trip argument is
# unchanged, but merges can now learn space-prefixed tokens (' the')
# and prose stops paying one byte token per space
_RAW_ATTACHED_RE = re.compile(
    "[" + _RAW_WS + "]*[^" + _RAW_WS + "]+|[" + _RAW_WS + "]+")


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte→printable-unicode remap (Radford et al. 2019,
    ``encoder.py``): printable Latin-1 bytes map to themselves, the
    rest (controls, whitespace, 127-160, 173) map to 256+n in byte
    order — so a byte stream becomes a lossless string of printable
    symbols the merge learner can treat like characters. Piecewise
    arithmetic (NOT an arbitrary table): byte b is remapped iff
    b < 33 or 127 <= b <= 160 or b == 173, to chr(256 + E(b)) where
    E(b) counts remapped bytes below b — which is exactly how the
    DuckDB oracle recomputes it, so cross-engine parity is by
    construction."""
    out = {}
    n = 0
    for b in range(256):
        if b < 33 or 127 <= b <= 160 or b == 173:
            out[b] = chr(256 + n)
            n += 1
        else:
            out[b] = chr(b)
    return out


_B2U = bytes_to_unicode()
_U2B = {c: b for b, c in _B2U.items()}


def _symbolizer(merges: list[tuple[str, str]], *,
                raw: bool, attach_ws: bool,
                byte_level: bool = False):
    """The pure-Python text -> subword-symbol-list encoder shared by
    ``bpe_encode``'s UDF and the broadcast-vocab fused encoder in
    ``bpe_encode_ids``: pretokenize (normalized / raw / raw+attached)
    then run the canonical earliest-rank greedy merge loop per word,
    memoized per distinct word. The closure (including its memo cache)
    is cloudpickled into the UDF, so each worker keeps its cache warm
    ACROSS Arrow batches. ``byte_level`` selects the GPT-2-style
    byte-level seeding (attached pretokens remapped to printable byte
    symbols; implies raw seeding — no end-of-word marker)."""
    if byte_level:
        raw = True
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    cache: dict[str, tuple[str, ...]] = {}

    def enc_word(w: str) -> tuple[str, ...]:
        got = cache.get(w)
        if got is not None:
            return got
        sym = list(w) if raw else list(w) + [END]
        while len(sym) > 1:
            # canonical algorithm: find the EARLIEST-learned pair
            # present, merge all its occurrences left-to-right,
            # rescan (Sennrich reference / HF tokenizers)
            best = None
            for j in range(len(sym) - 1):
                rk = ranks.get((sym[j], sym[j + 1]))
                if rk is not None and (best is None or rk < best):
                    best = rk
            if best is None:
                break
            l, r = merges[best]
            out: list[str] = []
            j = 0
            while j < len(sym):
                if (j + 1 < len(sym)
                        and sym[j] == l and sym[j + 1] == r):
                    out.append(l + r)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            sym = out
        res = tuple(sym)
        cache[w] = res
        return res

    def symbolize(text) -> list[str]:
        if text is None:
            return []
        toks: list[str] = []
        if byte_level:
            # GPT-2-style byte level: attached pretokens remapped to
            # printable byte-symbol string, merges over BYTE symbols —
            # every base symbol is one of 256, so nothing is ever
            # out-of-vocab and multi-byte characters can merge
            for piece in _RAW_ATTACHED_RE.findall(text):
                toks.extend(enc_word(
                    "".join(_B2U[b] for b in piece.encode("utf-8"))))
            return toks
        if raw:
            # either pretokenization covers every character of the
            # input exactly once, in order — the round-trip
            # invariant is structural
            if attach_ws:
                for piece in _RAW_ATTACHED_RE.findall(text):
                    toks.extend(enc_word(piece))
                return toks
            for piece in _RAW_PIECE_RE.findall(text):
                if piece in _RAW_WS:
                    toks.append(piece)
                else:
                    toks.extend(enc_word(piece))
            return toks
        # split on ASCII whitespace only — the exact Java-regex \s+
        # class tokens() trained the merges over; Python's
        # str.split() is Unicode-aware and would diverge on e.g.
        # non-breaking spaces, producing word boundaries the
        # learned statistics never saw
        for w in re.split(r"[ \t\n\x0b\f\r]+", text.lower()):
            if w:
                toks.extend(enc_word(w))
        return toks

    return symbolize


def bpe_encode(df: DataFrame, text_col: str,
               merges: list[tuple[str, str]], *,
               out_col: str = "bpe_tokens",
               raw: bool = False,
               attach_ws: bool = False,
               byte_level: bool = False) -> DataFrame:
    """Apply a learned merge list: adds ``out_col`` (array<string> of
    subword units, END-marked). Arrow-batched pandas UDF — the merge
    loop is inherently sequential per word, so this is the honest
    Python boundary (same loop a C++ tokenizer runs), amortized over
    Arrow batches; one narrow pass, no shuffle.

    ``raw=True`` (r9 verdict #1) is the LOSSLESS pretokenization mode
    — the byte-level discipline of GPT-2/SentencePiece tokenizers,
    where decode(encode(x)) must equal x over RAW text:

    - no lowercasing, no whitespace collapse — every input character
      reaches the symbol stream;
    - each ASCII-whitespace character is its own standalone symbol
      (out-of-vocab by construction, so it id-encodes as its UTF-8
      byte token under ``byte_fallback``);
    - words (maximal non-whitespace runs) run the same greedy merge
      loop but WITHOUT the end-of-word marker appended — the word
      boundary is carried by the explicit whitespace symbols, not by
      ``</w>``, so no information is invented or dropped.

    Merges learned over normalized text still apply verbatim (a
    lowercase pair simply never fires inside an uppercase span, and
    ``</w>``-bearing merges never fire at all since no symbol can
    equal the marker); compression is accordingly lower than in
    normalized mode — a merge list trained for raw service plugs in
    the same way. Concatenating a raw symbol stream reproduces the
    input text byte-for-byte.

    ``attach_ws=True`` (raw mode only, r10) switches the raw
    pretokenizer to the GPT-2 discipline: a word carries its LEADING
    whitespace run as part of its pretoken (a trailing run with no
    following word stands alone), so each character still belongs to
    exactly one pretoken — the round trip stays exact — but a merge
    list trained with the same setting (``train_bpe(raw=True,
    attach_ws=True)``, e.g. the committed ``RAW_COMMITTED_MERGES``)
    learns space-prefixed tokens and prose stops paying one byte
    token per interior space. With a split-trained list the flag only
    changes pretoken boundaries, not compression.

    ``byte_level=True`` (r11, GPT-2-style byte level): attached
    pretokens are remapped to printable BYTE symbols
    (``bytes_to_unicode`` — GPT-2's exact table; the pretokenizer is
    this framework's attached split, see ``train_bpe``) before
    the merge loop, so symbols are bytes, merges span multi-byte
    characters, and the 256-symbol base covers any input — pair with
    a ``train_bpe(byte_level=True)`` merge list. Standalone mode."""
    if attach_ws and not raw:
        raise ValueError("attach_ws applies to raw mode only")
    if byte_level and (raw or attach_ws):
        raise ValueError("byte_level is a standalone mode")
    from serverless_data_pipeline_spark.operators.util import (
        spread_small_input,
    )
    # r13 (optimization round): a small single-file corpus scans as
    # ONE partition, which would hand the ENTIRE merge loop to one
    # Python worker; no-op at real scale (many row groups).
    df = spread_small_input(df)
    symbolize = _symbolizer(merges, raw=raw, attach_ws=attach_ws,
                            byte_level=byte_level)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(texts):
        import pandas as pd

        return pd.Series([symbolize(t) for t in texts])

    return df.withColumn(out_col, _enc(F.col(text_col)))


def bpe_encode_ids(df: DataFrame, text_col: str,
                   merges: list[tuple[str, str]],
                   vocab: dict[str, int], *,
                   out_col: str = "token_ids",
                   sym_col: str | None = None,
                   byte_fallback: bool = False,
                   unk_col: str | None = None,
                   raw: bool = False,
                   attach_ws: bool = False,
                   byte_level: bool = False,
                   vocab_via: str = "auto",
                   vocab_literal_max: int = 4096) -> DataFrame:
    """Encode to integer token ids — the tokenizer's ACTUAL output
    artifact (what a pretraining pipeline packs and trains on). Adds
    ``out_col`` (array<int>). Keeps the subword-string column too when
    ``sym_col`` is given.

    Out-of-vocab symbols (r9 OOV hardening):

    - ``byte_fallback=False`` (default) — OOV maps to id 0 (UNK), the
      lossy legacy behavior.
    - ``byte_fallback=True`` — OOV expands to the byte tokens of its
      UTF-8 bytes (``vocab`` must contain the ``<0xNN>`` inventory,
      e.g. from ``build_vocab()``), the SentencePiece/GPT-2 byte-level
      discipline: NO text is ever destroyed, id 0 never appears, and
      decode is exact. Implemented JVM-side: ``hex(encode(sym,
      'UTF-8'))`` split into hex pairs through a 256-entry foldable
      map — no Python, no shuffle.
    - ``unk_col`` — when given, adds the per-doc OOV-rate column
      round6(|OOV symbols| / |symbols|) (0.0 for symbol-less docs):
      the dashboard metric a curator watches whichever fallback mode
      is on (under byte_fallback it reads as the byte-escape rate).

    ``raw=True`` — lossless byte-level pretokenization (see
    ``bpe_encode``): case and every whitespace character survive as
    symbols, so ``bpe_decode_ids(..., raw=True)`` reproduces the raw
    input exactly. Requires ``byte_fallback`` (whitespace and
    uppercase symbols are out-of-vocab by design and MUST byte-escape
    — mapping them to UNK would destroy the very information raw mode
    exists to keep); ``unk_col`` then reads as the byte-escape rate.
    ``attach_ws`` selects the GPT-2 attached-whitespace pretokenizer
    (see ``bpe_encode``) — pair it with a merge list trained the same
    way so interior spaces fold into space-prefixed tokens.

    ``vocab_via`` — HOW the token→id map executes (r10 verdict #1,
    the real-vocab-scale path). Every mode is bit-identical
    (pytest-pinned); only the physical plan changes:

    - "literal" — the id lookup is a JVM-side ``transform`` over a
      foldable ``create_map`` literal: the fastest plan for the
      artifact sizes vocab files usually are at the small end (a few
      hundred to a few thousand entries), but a production 32k-100k
      vocab would become a ~200k-argument plan literal — plan-size
      blowup, codegen fallback, and the serialized expression
      shipping inside every task binary (the same failure class as
      the 128+-bucket WHEN tree documented in ``urls.py``).
    - "broadcast" — the vocab ships ONCE per executor as a Spark
      broadcast variable and the id mapping (byte fallback and OOV
      accounting included) FUSES into the same single Arrow-batched
      pandas UDF that already runs the merge loop, so the symbol
      stream never re-crosses the Python boundary and the plan stays
      O(1) in vocab size. This is deliberately a broadcast variable +
      fused UDF rather than an explode → broadcast-join → regroup:
      the join itself would be map-side, but re-collecting symbols
      into per-doc arrays is a symbol-grain shuffle — the exact
      token-grain exchange this module's scale discipline forbids.
    - "auto" (default) — "literal" when ``len(vocab) <=
      vocab_literal_max`` (default 4096, comfortably inside plan/
      codegen limits), else "broadcast". The committed artifacts ride
      the literal fast path; a real 32k+ artifact flips
      automatically."""
    if raw and not byte_fallback:
        raise ValueError(
            "raw=True requires byte_fallback=True: whitespace and "
            "case symbols are out-of-vocab and must byte-escape for "
            "the raw round trip to hold")
    if byte_level:
        # GPT-2-style byte level (r11): symbols ARE bytes, so OOV is
        # impossible by construction — byte_fallback has nothing to
        # escape and mixing the modes would be a config error. The
        # vocab must carry the full byte-symbol base + every merge
        # output (build_byte_level_vocab), else a silent miss would
        # map to id 0, which is a REAL token in this layout.
        if byte_fallback or raw or attach_ws:
            raise ValueError("byte_level is a standalone mode (no "
                             "byte_fallback/raw/attach_ws)")
        need = [c for c in _B2U.values() if c not in vocab]
        need += [l + r for l, r in merges if l + r not in vocab]
        if need:
            raise ValueError(
                "byte_level vocab must contain the 256 byte symbols "
                f"and every merge output (missing e.g. {need[0]!r}) "
                "— build it with build_byte_level_vocab(merges)")
    if vocab_via not in ("auto", "literal", "broadcast"):
        raise ValueError(f"vocab_via must be 'auto', 'literal' or "
                         f"'broadcast', got {vocab_via!r}")
    if byte_fallback:
        missing = [t for t in (f"<0x{b:02X}>" for b in range(256))
                   if t not in vocab]
        if missing:
            raise ValueError(
                "byte_fallback needs the <0xNN> byte-token inventory "
                f"in vocab (missing e.g. {missing[0]!r}) — build the "
                "vocab with build_vocab(byte_tokens=True)")
    if vocab_via == "auto":
        vocab_via = ("literal" if len(vocab) <= vocab_literal_max
                     else "broadcast")
    if vocab_via == "broadcast":
        return _encode_ids_broadcast(
            df, text_col, merges, vocab, out_col=out_col,
            sym_col=sym_col, byte_fallback=byte_fallback,
            unk_col=unk_col, raw=raw, attach_ws=attach_ws,
            byte_level=byte_level)
    keep = sym_col or "__bpe_sym"
    enc = bpe_encode(df, text_col, merges, out_col=keep, raw=raw,
                     attach_ws=attach_ws, byte_level=byte_level)
    vmap = F.create_map(*[F.lit(x) for t, i in vocab.items()
                          for x in (t, i)])
    if byte_fallback:
        bmap = F.create_map(*[F.lit(x) for b in range(256)
                              for x in (f"{b:02X}",
                                        vocab[f"<0x{b:02X}>"])])

        def to_ids(t):
            mapped = F.element_at(vmap, t)
            hexstr = F.hex(F.encode(t, "UTF-8"))
            byte_ids = F.transform(
                F.sequence(F.lit(1), F.shiftright(F.length(hexstr), 1)),
                lambda i: F.element_at(
                    bmap, F.substring(hexstr, i * 2 - 1, 2))
                .cast("int"))
            return F.when(mapped.isNotNull(),
                          F.array(mapped.cast("int"))).otherwise(byte_ids)

        enc = enc.withColumn(out_col, F.flatten(F.transform(keep, to_ids)))
    else:
        enc = enc.withColumn(
            out_col,
            F.transform(keep, lambda t: F.coalesce(
                F.element_at(vmap, t), F.lit(0)).cast("int")))
    if unk_col:
        n_syms = F.size(F.col(keep))
        n_oov = F.size(F.filter(
            keep, lambda t: F.element_at(vmap, t).isNull()))
        enc = enc.withColumn(
            unk_col,
            F.when(n_syms > 0, F.round(n_oov / n_syms, 6))
            .otherwise(F.lit(0.0)))
    return enc if sym_col else enc.drop(keep)


def _encode_ids_broadcast(df: DataFrame, text_col: str,
                          merges: list[tuple[str, str]],
                          vocab: dict[str, int], *,
                          out_col: str, sym_col: str | None,
                          byte_fallback: bool, unk_col: str | None,
                          raw: bool, attach_ws: bool,
                          byte_level: bool = False) -> DataFrame:
    """``bpe_encode_ids(vocab_via="broadcast")``: the vocab ships once
    per executor as a broadcast variable; pretokenize + merge loop +
    id lookup + byte fallback + OOV counting all run in ONE fused
    Arrow-batched pandas UDF returning struct(ids, n_oov, n_sym[,
    sym]) — the plan carries zero vocab literals and the symbol
    stream crosses the Python boundary zero extra times. The
    unk-rate division/rounding stays JVM-side on the returned integer
    counts, the EXACT expression of the literal path, so the two
    modes are bit-identical (pytest-pinned)."""
    from serverless_data_pipeline_spark.operators.util import (
        spread_small_input,
    )
    df = spread_small_input(df)  # r13: see bpe_encode
    symbolize = _symbolizer(merges, raw=raw, attach_ws=attach_ws,
                            byte_level=byte_level)
    bv = df.sparkSession.sparkContext.broadcast(dict(vocab))
    want_sym = sym_col is not None
    fields = [T.StructField("ids", T.ArrayType(T.IntegerType())),
              T.StructField("n_oov", T.IntegerType()),
              T.StructField("n_sym", T.IntegerType())]
    if want_sym:
        fields.append(T.StructField("sym",
                                    T.ArrayType(T.StringType())))

    @F.pandas_udf(T.StructType(fields))
    def _encids(texts):
        import pandas as pd

        v = bv.value
        byte_ids = ([v[f"<0x{b:02X}>"] for b in range(256)]
                    if byte_fallback else None)
        out = {"ids": [], "n_oov": [], "n_sym": []}
        if want_sym:
            out["sym"] = []
        for t in texts:
            syms = symbolize(t)
            ids: list[int] = []
            n_oov = 0
            for s in syms:
                i = v.get(s)
                if i is not None:
                    ids.append(i)
                    continue
                n_oov += 1
                if byte_fallback:
                    ids.extend(byte_ids[b] for b in s.encode("utf-8"))
                else:
                    ids.append(0)
            out["ids"].append(ids)
            out["n_oov"].append(n_oov)
            out["n_sym"].append(len(syms))
            if want_sym:
                out["sym"].append(list(syms))
        return pd.DataFrame(out)

    st = "__bpe_st"
    enc = df.withColumn(st, _encids(F.col(text_col)))
    # same column order as the literal path: sym, ids, unk
    if want_sym:
        enc = enc.withColumn(sym_col, F.col(f"{st}.sym"))
    enc = enc.withColumn(out_col, F.col(f"{st}.ids"))
    if unk_col:
        n_syms = F.col(f"{st}.n_sym")
        enc = enc.withColumn(
            unk_col,
            F.when(n_syms > 0,
                   F.round(F.col(f"{st}.n_oov") / n_syms, 6))
            .otherwise(F.lit(0.0)))
    return enc.drop(st)


def bpe_decode_ids(df: DataFrame, ids_col: str,
                   vocab: dict[str, int], *,
                   out_col: str = "decoded_text",
                   strict: bool = True,
                   raw: bool = False,
                   byte_level: bool = False,
                   vocab_via: str = "auto",
                   vocab_literal_max: int = 4096) -> DataFrame:
    """Detokenize an ``array<int>`` id column back to text — the
    inspection/debugging path every real tokenizer ships next to
    encode. Exact inverse of ``bpe_encode_ids`` over normalized input
    (round-trip law, pytest-pinned): core ids map to their subword's
    UTF-8 bytes, the end-of-word marker becomes a single space,
    ``<0xNN>`` byte-fallback ids contribute their raw byte (so a
    multi-byte character reassembles exactly), and the byte stream is
    UTF-8-decoded once at the end — decode(encode(text)) == the
    whitespace-normalized lowercase of ``text``. UNK id 0 renders as
    the literal ``<unk>`` (the information byte fallback exists to
    preserve is already gone).

    Ids absent from the vocab (a corrupted or mismatched ids file):

    - ``strict=True`` (default) — the job FAILS with the offending id
      in the error message. The alternative — ``element_at`` → NULL
      propagating through the concat fold — would silently NULL the
      whole doc's decode, i.e. corrupted data vanishing instead of
      erroring (r9 verdict #4).
    - ``strict=False`` — the unknown id renders as the literal
      ``<unk>`` placeholder and decode proceeds (the triage mode for
      inspecting a partially-corrupt ids table).

    ``raw=True`` decodes a stream produced by ``bpe_encode_ids(...,
    raw=True)``: tokens render as their EXACT UTF-8 bytes (no
    end-of-word→space rewrite — raw streams carry word boundaries as
    explicit whitespace byte tokens and can never contain a marker
    token) and nothing is trimmed, so the output is byte-for-byte the
    original raw text — the exact round-trip law, pytest-pinned.

    ``vocab_via`` — same plan-scale switch as ``bpe_encode_ids``. The
    "literal" mode is JVM-side throughout: one foldable id→bytes map
    literal, one ``aggregate`` binary concat, one ``decode`` — a
    narrow projection, no Python, no shuffle; right for small
    artifacts, but a 32k+ vocab's map literal blows up the plan. The
    "broadcast" mode ships the id→bytes table once per executor and
    decodes inside one Arrow-batched pandas UDF (strict/raw semantics
    identical, bit-identity pytest-pinned). "auto" (default) flips at
    ``vocab_literal_max`` entries. Composition note: feeding the
    broadcast decode DIRECTLY from a literal-mode encode in one
    unmaterialized plan fuses the pandas UDF's input projection with
    the encode's map-literal expression — if that oversized
    projection falls out of codegen, Spark's interpreted fallback
    cannot evaluate the embedded Python UDF (INTERNAL_ERROR). Mixed
    modes across one pipeline should materialize the ids column
    between them (cache/checkpoint/write) — matched modes (both
    literal or both broadcast) compose freely. NOTE that "auto" can
    pick DIFFERENT modes for an encode→decode pair only when the two
    calls use different-size vocabs straddling ``vocab_literal_max``
    (a real pipeline decodes with the artifact it encoded with, so
    matched sizes → matched modes); when mixing artifacts across the
    threshold, either materialize between the calls or pin
    ``vocab_via`` explicitly on both."""
    if vocab_via not in ("auto", "literal", "broadcast"):
        raise ValueError(f"vocab_via must be 'auto', 'literal' or "
                         f"'broadcast', got {vocab_via!r}")
    if byte_level:
        # a vocab from another mode would "invert" silently wherever
        # its tokens happen to be printable ASCII — require the full
        # byte-symbol base up front instead
        need = [c for c in _B2U.values() if c not in vocab]
        if need:
            raise ValueError(
                "byte_level vocab must contain the 256 byte symbols "
                f"(missing e.g. {need[0]!r}) — build it with "
                "build_byte_level_vocab(merges)")
    pieces: list[tuple[int, bytes]] = []
    for tok, i in vocab.items():
        if byte_level:
            # byte-level mode: every token string is a run of remapped
            # byte symbols — invert the bytes_to_unicode remap; raw
            # output semantics (nothing trimmed)
            try:
                pieces.append((i, bytes(_U2B[c] for c in tok)))
            except KeyError as exc:
                raise ValueError(
                    f"vocab token {tok!r} is not a byte-level token "
                    "(symbol not in the bytes_to_unicode image) — "
                    "was this vocab built with "
                    "build_byte_level_vocab?") from exc
        elif tok.startswith("<0x") and tok.endswith(">") and len(tok) == 6:
            pieces.append((i, bytes([int(tok[3:5], 16)])))
        elif raw:
            pieces.append((i, tok.encode("utf-8")))
        else:
            # the end-of-word marker appears standalone AND as the
            # suffix of merged tokens ("scan</w>") — both render as
            # the word boundary
            pieces.append((i, tok.replace(END, " ").encode("utf-8")))
    raw = raw or byte_level
    if vocab_via == "auto":
        vocab_via = ("literal" if len(vocab) <= vocab_literal_max
                     else "broadcast")
    if vocab_via == "broadcast":
        bv = df.sparkSession.sparkContext.broadcast(dict(pieces))

        @F.pandas_udf(T.StringType())
        def _dec(ids_series):
            import pandas as pd

            m = bv.value
            out = []
            for ids in ids_series:
                if ids is None:
                    out.append(None)
                    continue
                buf = bytearray()
                for i in ids:
                    # a NULL element follows the same unknown-id
                    # semantics as the literal path (element_at(m,
                    # NULL) is NULL there)
                    b = None if i is None else m.get(int(i))
                    if b is None:
                        if strict:
                            raise ValueError(
                                "bpe_decode_ids: id not in vocab: "
                                f"{i}")
                        buf += b"<unk>"
                    else:
                        buf += b
                # errors='replace' == Spark decode()'s malformed-input
                # behavior (U+FFFD), keeping the modes bit-identical
                # even on corrupt byte streams
                out.append(bytes(buf).decode("utf-8",
                                             errors="replace"))
            return pd.Series(out)

        text = _dec(F.col(ids_col))
        return df.withColumn(out_col, text if raw else F.rtrim(text))
    m = F.create_map(*[F.lit(x) for i, b in pieces for x in (i, b)])
    if strict:
        def piece_of(i):
            return F.coalesce(
                F.element_at(m, i),
                F.raise_error(F.concat(
                    F.lit("bpe_decode_ids: id not in vocab: "),
                    i.cast("string"))).cast("binary"))
    else:
        def piece_of(i):
            return F.coalesce(F.element_at(m, i), F.lit(b"<unk>"))
    joined = F.aggregate(
        F.col(ids_col), F.lit(b""),
        lambda acc, i: F.concat(acc, piece_of(i)))
    text = F.decode(joined, "UTF-8")
    return df.withColumn(out_col, text if raw else F.rtrim(text))


def tokenizer_fertility(df: DataFrame, text_col: str, ids_col: str, *,
                        group_col: str | None = None,
                        unk_col: str | None = None) -> DataFrame:
    """Tokenizer QA report — the compression/fertility dashboard a
    tokenizer team watches per language before committing an artifact
    (SentencePiece's "chars per piece", HF's fertility): one row per
    ``group_col`` value (or one corpus row) with

    - ``n_docs``, ``total_tokens``, ``total_chars``, ``total_bytes``
      — exact integer sums (partition-order stable by construction);
    - ``chars_per_token`` / ``bytes_per_token`` — round6 compression
      ratios (NULL for a zero-token group rather than a divide error);
      a language whose bytes_per_token is near 1 is degenerating to
      byte fallback — the signal that the vocab under-serves it;
    - ``tokens_per_doc`` — round6 mean document length in tokens (the
      packing planner's input);
    - ``mean_unk_rate`` — round6 mean of ``unk_col`` when given (the
      per-doc OOV/byte-escape rate from ``bpe_encode_ids``).

    One hash aggregation over (group, four longs) with map-side
    partial combine — scan-speed at any corpus size, no join, no
    Python."""
    g = [group_col] if group_col else []
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(ids_col)).cast("long").alias("total_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        F.sum(F.octet_length(text_col)).cast("long")
         .alias("total_bytes"),
    ]
    if unk_col:
        aggs.append(F.round(F.avg(unk_col), 6).alias("mean_unk_rate"))
    out = df.groupBy(*g).agg(*aggs)
    tok = F.col("total_tokens")
    return (out
            .withColumn("chars_per_token",
                        F.when(tok > 0,
                               F.round(F.col("total_chars") / tok, 6)))
            .withColumn("bytes_per_token",
                        F.when(tok > 0,
                               F.round(F.col("total_bytes") / tok, 6)))
            .withColumn("tokens_per_doc",
                        F.round(tok / F.col("n_docs"), 6)))
