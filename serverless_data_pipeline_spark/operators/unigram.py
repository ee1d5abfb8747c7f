"""Unigram-LM tokenizer training + encoding (the SentencePiece family).

The second production tokenizer family next to BPE (``operators/bpe.py``):
instead of learning a merge list, unigram LM keeps an inventory of
subword PIECES with log-probabilities and segments each pretoken with
Viterbi — the algorithm behind SentencePiece's default mode (Kudo 2018,
arXiv:1804.10959; public knowledge, like the Sennrich reference behind
``train_bpe``). The reference declares only the generic analytics
surface (``Serverless Data Pipeline.py:581-629``); the tokenizer tier is
charter scope ("operations a large-scale training-data pipeline needs").

This implementation is the deterministic HARD-EM (Viterbi-count) variant
of Kudo's algorithm: the E-step assigns each word its single best
segmentation and counts pieces with INTEGER weights (segmentation count
x word frequency), the M-step renormalizes log-probs from those integer
counts. Two consequences we rely on everywhere:

- **Bit-identical across execution paths.** Expected counts are exact
  longs, so the distributed E-step (Arrow-batched map over the words
  frame + a LongType sum) and the driver-side loop produce the SAME
  counts regardless of partitioning — pinned by pytest. (Kudo's soft-EM
  accumulates float posteriors whose sum order would vary per shuffle.)
- **Deterministic ties.** Viterbi scans candidate pieces longest-first
  and replaces only on strictly-greater score, so equal-score paths
  resolve to the first maximizer in a fixed order; seeding and pruning
  order by (count desc/asc, piece) — no randomness anywhere.

Scale design — the same shape as ``train_bpe``, which survives 100 TB:

- The ONLY corpus-sized stages are the distinct-word count and (on the
  distributed path) the seeding pass and per-iteration E-steps over the
  |vocab|-row words frame — narrow Arrow-batched passes with a map-side
  pre-combine. The driver only ever receives bounded rows: seeding
  selects |chars| + top-``seed_size`` substrings DISTRIBUTED (ordered
  total-order top-k — the full substring table, 10-100x the words
  frame, never leaves the cluster), and an E-step emits inventory
  pieces only. No token-grain shuffle ever.
- Default AUTO collects the words frame when it fits
  (``driver_side_max_words``) and runs the whole EM driver-side — the
  HF/SentencePiece single-node structure, because after the word count
  the working set is |vocab| rows, not corpus rows (train_bpe's r13
  measurement: the collected loop beats per-round distributed jobs by
  ~2 orders of magnitude at fixture vocab sizes). Past the gate the
  distributed E-step path runs with identical results.
- Encoding is one Arrow-batched pass with the piece table broadcast —
  linear at any corpus size, memoized per distinct pretoken.

Pretokenization follows the SentencePiece convention: pretokens are
RAW, leading-whitespace-attached pieces (the same ``_RAW_ATTACHED_RE``
GPT-2-style pretokenizer ``bpe_encode(attach_ws=True)`` uses), so the
piece inventory contains space-prefixed pieces and decoding is exact
concatenation — word boundaries live inside the pieces themselves, no
end-of-word marker needed.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_data_pipeline_spark.operators.bpe import _word_counts

__all__ = ["train_unigram", "unigram_encode_ids", "unigram_decode_ids",
           "build_unigram_vocab", "viterbi_segment",
           "save_unigram_artifact", "load_unigram_artifact"]

UNK = "<unk>"

# Score floor for inventory pieces EM assigns zero count (single chars
# kept for coverage): far enough below every estimated log-prob that a
# floored char never outscores a counted piece, close enough to stay
# additive without -inf arithmetic.
_FLOOR_GAP = 10.0


def viterbi_segment(word: str, scores: dict[str, float],
                    max_piece_len: int) -> list[str] | None:
    """Best-scoring segmentation of ``word`` into inventory pieces
    (max sum of piece log-probs), or None if some character has no
    covering piece. Deterministic: candidates scan longest-piece-first
    and only a STRICTLY greater score replaces, so equal-score paths
    resolve identically everywhere (driver, every executor)."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    best[0] = 0.0
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for i in range(1, n + 1):
        bi = float("-inf")
        bb = None
        for ln in range(min(max_piece_len, i), 0, -1):
            prev = best[i - ln]
            if prev == float("-inf"):
                continue
            sc = scores.get(word[i - ln:i])
            if sc is None:
                continue
            cand = prev + sc
            if cand > bi:
                bi = cand
                bb = (i - ln, word[i - ln:i])
        best[i] = bi
        back[i] = bb
    if n and back[n] is None:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        j, piece = back[i]          # type: ignore[misc]
        out.append(piece)
        i = j
    out.reverse()
    return out


def _seed_counts_of_words(rows: Iterable[tuple[str, int]],
                          max_piece_len: int) -> Counter:
    """Substring occurrence counts (overlapping, weighted by word
    frequency) — the shared seeding kernel of both execution paths."""
    c: Counter = Counter()
    for w, n in rows:
        ln = len(w)
        for i in range(ln):
            for j in range(i + 1, min(i + max_piece_len, ln) + 1):
                c[w[i:j]] += n
    return c


def _estep_counts_of_words(rows: Iterable[tuple[str, int]],
                           scores: dict[str, float],
                           max_piece_len: int) -> Counter:
    """Hard-EM E-step kernel: Viterbi-segment each distinct word once,
    count its pieces x word frequency. Integer counts — the property
    that makes driver and distributed paths bit-identical."""
    c: Counter = Counter()
    for w, n in rows:
        seg = viterbi_segment(w, scores, max_piece_len)
        if seg is None:             # unreachable after char seeding;
            continue                # defensive for foreign inventories
        for p in seg:
            c[p] += n
    return c


def _scores_from_counts(counts: dict[str, int],
                        inventory: Iterable[str]) -> dict[str, float]:
    """M-step: log-prob per inventory piece from integer counts.
    Zero-count pieces (chars kept for coverage) get a floor score
    below every estimated one."""
    total = sum(counts.values())
    scores: dict[str, float] = {}
    floor = None
    for p in inventory:
        c = counts.get(p, 0)
        if c > 0:
            scores[p] = math.log(c / total)
    if scores:
        floor = min(scores.values()) - _FLOOR_GAP
    for p in inventory:
        if p not in scores:
            scores[p] = floor if floor is not None else -_FLOOR_GAP
    return scores


def train_unigram(df: DataFrame, text_col: str = "text", *,
                  vocab_size: int = 1024,
                  max_piece_len: int = 8,
                  seed_size: int | None = None,
                  n_em_iters: int = 2,
                  prune_fraction: float = 0.25,
                  driver_side: bool | None = None,
                  driver_side_max_words: int = 4_000_000
                  ) -> list[tuple[str, float]]:
    """Learn a unigram-LM piece inventory from a corpus. Returns the
    shipped artifact: ``[(piece, log_prob), ...]`` ordered by
    (log_prob desc, piece) — apply with ``unigram_encode_ids``.

    Algorithm (Kudo 2018 hard-EM variant, deterministic end to end):

    1. Distinct-word frequency table — the one corpus-sized
       aggregation (``_word_counts(attach_ws=True)``: raw
       leading-whitespace-attached pretokens, the SentencePiece ▁
       convention rendered with real spaces, so decode is exact
       concatenation).
    2. Seed: every substring up to ``max_piece_len`` scored by
       occurrence count x word frequency; keep ALL single characters
       (coverage guarantee) + the top ``seed_size`` multi-char
       substrings (default ``8 x vocab_size``), ties by piece.
    3. EM x ``n_em_iters``: Viterbi-count E-step, renormalizing
       M-step.
    4. Prune the lowest-count multi-char pieces (``prune_fraction``
       of the current inventory per round, capped at the excess;
       count asc, piece asc — the hard-EM analogue of SentencePiece's
       likelihood-loss prune with its shrinking-factor cadence;
       characters are never pruned), re-running one EM iteration per
       round, until ``vocab_size`` pieces remain; one final EM settles
       the published scores.

    ``driver_side`` mirrors ``train_bpe`` (r13): AUTO collects the
    words frame when ``<= driver_side_max_words`` rows and runs EM
    driver-side; ``False`` forces the distributed E-step path (Arrow
    map over the words frame, map-side pre-combined, one
    |pieces|-row LongType sum per iteration). Both paths are
    bit-identical BY CONSTRUCTION — integer Viterbi counts — and
    pinned so by pytest.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if not 0.0 < prune_fraction <= 1.0:
        raise ValueError("prune_fraction must be in (0, 1]")
    if n_em_iters < 1:
        # with zero E-steps the first prune would rank every piece by
        # count 0 and drop alphabetically — deterministic garbage
        raise ValueError("n_em_iters must be >= 1")
    words = (_word_counts(df, text_col, raw=True, attach_ws=True)
             .localCheckpoint(eager=False))
    if driver_side is None:
        driver_side = words.count() <= driver_side_max_words
    if seed_size is None:
        seed_size = 8 * vocab_size
    if driver_side:
        pdf = words.toPandas()
        rows = list(zip(pdf["w"].tolist(), pdf["n"].tolist()))

        def seed_select() -> tuple[list[str], list[str], dict[str, int]]:
            full = _seed_counts_of_words(rows, max_piece_len)
            cs = sorted(p for p in full if len(p) == 1)
            ms = sorted((p for p in full if len(p) > 1),
                        key=lambda p: (-full[p], p))[:seed_size]
            return cs, ms, {p: full[p] for p in cs + ms}

        def estep(scores: dict[str, float]) -> Counter:
            return _estep_counts_of_words(rows, scores, max_piece_len)
    else:
        schema = T.StructType([
            T.StructField("piece", T.StringType()),
            T.StructField("c", T.LongType())])

        def _mapped(kernel):
            # one narrow Arrow pass over the words frame with an
            # in-batch pre-combine (the Python map-side combiner),
            # then a piece-keyed long sum — partition count never
            # changes the result because the counts are integers
            def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for b in it:
                    c = kernel(zip(b["w"].tolist(), b["n"].tolist()))
                    if c:
                        yield pd.DataFrame(
                            {"piece": list(c.keys()),
                             "c": list(c.values())})

            return (words.mapInPandas(run, schema)
                    .groupBy("piece").agg(F.sum("c").alias("c")))

        def seed_select() -> tuple[list[str], list[str], dict[str, int]]:
            # the substring count table is corpus-VOCABULARY-sized
            # (10-100x the words frame) — exactly what this path must
            # never collect. Selection happens distributed: ALL single
            # chars (bounded by the alphabet) plus a deterministic
            # total-order top-k of the multi-char substrings; only the
            # |chars| + seed_size winners reach the driver.
            sub = _mapped(lambda rs: _seed_counts_of_words(
                rs, max_piece_len)).persist()
            try:
                crows = sub.filter(F.length("piece") == 1).collect()
                mrows = (sub.filter(F.length("piece") > 1)
                         .orderBy(F.desc("c"), F.asc("piece"))
                         .limit(seed_size).collect())
            finally:
                sub.unpersist()
            cs = sorted(r["piece"] for r in crows)
            ms = [r["piece"] for r in mrows]
            sc = {r["piece"]: r["c"] for r in crows}
            sc.update((r["piece"], r["c"]) for r in mrows)
            return cs, ms, sc

        def estep(scores: dict[str, float]) -> Counter:
            # the E-step only ever emits inventory pieces, so this
            # collect is |inventory|-bounded by construction
            return Counter({r["piece"]: r["c"]
                            for r in _mapped(
                                lambda rs: _estep_counts_of_words(
                                    rs, scores, max_piece_len))
                            .collect()})

    chars, multis, sc = seed_select()
    inventory = set(chars) | set(multis)
    if vocab_size < len(chars):
        raise ValueError(
            f"vocab_size={vocab_size} below the character inventory "
            f"({len(chars)} distinct chars) — coverage would break")
    scores = _scores_from_counts(sc, inventory)
    counts: Counter = Counter()
    for _ in range(n_em_iters):
        counts = estep(scores)
        scores = _scores_from_counts(counts, inventory)
    while len(inventory) > vocab_size:
        excess = len(inventory) - vocab_size
        prunable = sorted((p for p in inventory if len(p) > 1),
                          key=lambda p: (counts.get(p, 0), p))
        # SentencePiece's shrinking-factor scheme: drop prune_fraction
        # of the CURRENT inventory per round (capped at the excess) —
        # ~log_{1/(1-f)}(seed/vocab) rounds total, each paying one
        # E-step, vs the excess-fraction variant's ~3x more rounds
        # (r13 measured on the 200k-word scale fixture: 194 s -> 74 s
        # for vocab 2048 from a 16k seed; vocab 8192 trains in 80 s —
        # wall scales with E-step count x |words|, not vocab size)
        k = min(excess, max(1, int(len(inventory) * prune_fraction)))
        inventory.difference_update(prunable[:k])
        counts = estep(_scores_from_counts(counts, inventory))
        scores = _scores_from_counts(counts, inventory)
    counts = estep(scores)
    scores = _scores_from_counts(counts, inventory)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def build_unigram_vocab(pieces: list[tuple[str, float]]
                        ) -> dict[str, int]:
    """piece -> id table: id 0 is ``<unk>``, then the artifact order
    (log-prob desc, piece — ``train_unigram``'s output order)."""
    vocab = {UNK: 0}
    for p, _s in pieces:
        vocab[p] = len(vocab)
    return vocab


def _segmenter(pieces: list[tuple[str, float]]):
    """text -> piece-list closure shared by encode paths: the
    SentencePiece-convention pretokenizer (raw attached pieces) +
    memoized Viterbi. A pretoken containing a character absent from
    the inventory degrades to per-character pieces with ``None`` for
    the missing ones (the caller maps those to UNK and counts them) —
    SentencePiece's unk handling, not text destruction."""
    from serverless_data_pipeline_spark.operators.bpe import (
        _RAW_ATTACHED_RE,
    )
    scores = {p: s for p, s in pieces}
    max_len = max((len(p) for p in scores), default=1)
    cache: dict[str, tuple] = {}

    def seg_word(w: str) -> tuple:
        got = cache.get(w)
        if got is None:
            seg = viterbi_segment(w, scores, max_len)
            got = (tuple(seg) if seg is not None else
                   tuple(c if c in scores else None for c in w))
            cache[w] = got
        return got

    def segment(text) -> list:
        if text is None:
            return []
        out: list = []
        for piece in _RAW_ATTACHED_RE.findall(text):
            out.extend(seg_word(piece))
        return out

    return segment


def unigram_encode_ids(df: DataFrame, text_col: str,
                       pieces: list[tuple[str, float]],
                       vocab: dict[str, int] | None = None, *,
                       out_col: str = "token_ids",
                       unk_col: str | None = None) -> DataFrame:
    """Encode to integer token ids with the learned piece inventory —
    one Arrow-batched pass, piece table broadcast inside the UDF
    closure, memoized per distinct pretoken; no shuffle, linear at any
    corpus size (the scale contract of ``bpe_encode_ids``'s broadcast
    path). Adds ``out_col`` (array<int>) and, when ``unk_col`` is
    given, the per-doc UNK rate round6(|unk| / |pieces|) — the
    coverage metric a curator watches."""
    if vocab is None:
        vocab = build_unigram_vocab(pieces)
    segment = _segmenter(pieces)
    vb = dict(vocab)

    fields = [T.StructField("ids", T.ArrayType(T.IntegerType()))]
    if unk_col:
        fields.append(T.StructField("unk", T.DoubleType()))
    out_t = T.StructType(fields)

    @F.pandas_udf(out_t)
    def enc(col: pd.Series) -> pd.DataFrame:
        ids_out, unk_out = [], []
        for text in col:
            seg = segment(text)
            ids = [vb.get(p, 0) if p is not None else 0 for p in seg]
            ids_out.append(ids)
            if unk_col:
                bad = sum(1 for p in seg
                          if p is None or p not in vb)
                unk_out.append(round(bad / len(seg), 6) if seg
                               else 0.0)
        data = {"ids": ids_out}
        if unk_col:
            data["unk"] = unk_out
        return pd.DataFrame(data)

    packed = enc(F.col(text_col))
    out = df.withColumn("__u", packed) \
            .withColumn(out_col, F.col("__u.ids"))
    if unk_col:
        out = out.withColumn(unk_col, F.col("__u.unk"))
    return out.drop("__u")


def unigram_decode_ids(df: DataFrame, ids_col: str,
                       pieces: list[tuple[str, float]],
                       vocab: dict[str, int] | None = None, *,
                       out_col: str = "decoded_text") -> DataFrame:
    """ids -> text: exact concatenation of the id-inverse pieces
    (word boundaries live inside the attached pieces). UNK (id 0)
    renders as empty — the only lossy case, and exactly the one
    ``unk_col`` accounts for at encode time."""
    if vocab is None:
        vocab = build_unigram_vocab(pieces)
    inv = {i: (p if p != UNK else "") for p, i in vocab.items()}

    @F.pandas_udf(T.StringType())
    def dec(col: pd.Series) -> pd.Series:
        return col.map(
            lambda ids: "".join(inv.get(i, "") for i in ids)
            if ids is not None else None)

    return df.withColumn(out_col, dec(F.col(ids_col)))


def save_unigram_artifact(path: str,
                          pieces: list[tuple[str, float]], *,
                          spark=None) -> None:
    """Write the unigram artifact as one JSON file — the
    version-and-ship step after ``train_unigram``, mirroring the BPE
    ``save_artifact`` contract: UTF-8, sorted keys, byte-stable for
    the same artifact (scores serialize via ``repr`` and round-trip
    float-exact), so the file itself content-hashes as the tokenizer
    version id. ``spark`` routes the write through the JVM Hadoop
    FileSystem for ``file:``/``s3a://``/``hdfs://`` URIs, exactly as
    the BPE artifact does."""
    import json

    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        _fs_write_bytes,
    )
    seen = {p for p, _s in pieces}
    if len(seen) != len(pieces):
        raise ValueError("duplicate pieces in artifact")
    payload = json.dumps({"format": "unigram-artifact-v1",
                          "unk": UNK,
                          "pieces": [[p, s] for p, s in pieces]},
                         ensure_ascii=False, sort_keys=True, indent=1)
    if spark is not None:
        _fs_write_bytes(spark, path, payload.encode("utf-8"))
    else:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(payload)


def load_unigram_artifact(path: str, *,
                          spark=None) -> list[tuple[str, float]]:
    """Read a ``save_unigram_artifact`` file back, re-validated —
    feed straight into ``unigram_encode_ids``/``build_unigram_vocab``.
    Refuses a BPE artifact (or any foreign JSON) by format tag, so a
    mixed-up tokenizer deploy fails loudly instead of producing wrong
    ids."""
    import json

    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        _fs_read_bytes,
    )
    if spark is not None:
        doc = json.loads(_fs_read_bytes(spark, path).decode("utf-8"))
    else:
        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
    if doc.get("format") != "unigram-artifact-v1":
        raise ValueError(
            f"not a unigram artifact: format={doc.get('format')!r}")
    pieces = [(p, float(s)) for p, s in doc["pieces"]]
    seen = {p for p, _s in pieces}
    if len(seen) != len(pieces):
        raise ValueError("duplicate pieces in artifact")
    return pieces
