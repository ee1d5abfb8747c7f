"""Committed BPE tokenizer artifact (charter extension X8 — tokenizer
last mile).

A real pretraining pipeline ships its tokenizer as a FROZEN artifact
(merge list + vocab file) and every downstream job applies it — the
artifact is versioned data, not something re-derived per query. This
module is that artifact for the registry's tokenizer arms: the merge
list below was learned once with ``train_bpe`` (Sennrich BPE) over the
sf0.001 ``documents`` fixture::

    train_bpe(spark.read.parquet(".../sf0.001/documents.parquet"),
              "text", n_merges=24)

and committed, exactly like the X14 classifier's frozen weights. The
vocabulary derives deterministically from the artifact itself (base
alphabet + end-of-word marker + one entry per merge in rank order +
the 256 ``<0xNN>`` byte-fallback tokens, r9) — the standard vocab-file
layout — so both engines of the correctness gate can reconstruct the
identical token→id map from these constants. r9 OOV hardening: the
base alphabet is the full lowercase-printable ASCII set (letters,
digits, punctuation), and non-ASCII characters byte-escape via the
byte inventory when the encoder runs with ``byte_fallback`` — real
web text never collapses to UNK (see ``bpe.bpe_encode_ids``).

Rank-sequential equivalence: the driver oracle replays encoding by
applying merges one rank at a time (a linear recursion), while
``bpe_encode`` uses the canonical earliest-rank rescan. The two are
provably identical whenever all merge OUTPUT strings are distinct:
applying merge j can only create new adjacencies involving its output
t = l+r, so a pair of earlier rank i<j could newly appear only if t
equals that pair's left or right symbol — but those symbols were
tokens before round i, i.e. base characters (len 1, impossible for a
len>=2 merge output) or outputs of merges < i, which would make t a
duplicate output. ``assert_rank_sequential_ok`` checks that property;
it holds for the committed list and is pytest-pinned.
"""

from __future__ import annotations

from serverless_data_pipeline_spark.operators.bpe import END

__all__ = ["COMMITTED_MERGES", "RAW_COMMITTED_MERGES",
           "BYTE_LEVEL_COMMITTED_MERGES",
           "BPE_BASE_CHARS", "BPE_RAW_BASE_CHARS", "BYTE_TOKENS",
           "UNK", "build_vocab", "build_byte_level_vocab",
           "assert_rank_sequential_ok",
           "save_artifact", "load_artifact"]

UNK = "<unk>"

# Learned once over sf0.001 documents (see module docstring); frozen.
COMMITTED_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
]

# Base alphabet (r9 OOV hardening): every printable ASCII character
# that can survive the encoder's normalization — lowercase letters,
# digits, and the 32 ASCII punctuation/symbol characters. (Uppercase
# never reaches the symbol stream — ``bpe_encode`` lowercases — and
# whitespace is the word separator, so neither earns a vocab slot.)
# Shipping the full printable base is what real vocab files do: the
# training fixture only exercises a-z, but digits and punctuation in
# downstream text must encode to REAL ids, not UNK. Characters outside
# this set (non-ASCII) fall back to UNK id 0, or to their UTF-8 byte
# tokens when the encoder runs with byte_fallback (the SentencePiece /
# GPT-2 byte-level discipline) — see BYTE_TOKENS.
BPE_BASE_CHARS: list[str] = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [chr(c) for c in range(ord("0"), ord("9") + 1)]
    + list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"))

# RAW-service artifact (r10): learned once with
#   train_bpe(spark.read.parquet(".../sf0.001/documents.parquet"),
#             "text", n_merges=24, raw=True, attach_ws=True)
# over the SAME fixture and frozen — the GPT-2-shaped sibling of
# COMMITTED_MERGES: case preserved, no end-of-word marker, and the
# attached-whitespace pretokenizer lets the learner discover
# SPACE-PREFIXED tokens (' s', ' a', ' c', ...), so prose encoded with
# bpe_encode_ids(raw=True, attach_ws=True) folds interior spaces into
# word tokens instead of paying one byte token per space. Passes the
# rank-sequential-equivalence guard (pytest-pinned), so the driver
# oracle can replay it rank-by-rank.
RAW_COMMITTED_MERGES: list[tuple[str, str]] = [
    (" ", "s"), ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("l", "u"), ("a", "r"), ("p", "ar"), (" ", "a"), (" ", "v"),
    ("a", "s"), (" ", "c"), ("m", "er"), ("a", "t"), (" ", "f"),
    (" ", "t"), (" ", "b"), ("a", "n"), ("c", "an"), ("lu", "m"),
    ("lum", "n"), ("o", "lumn"), ("d", "ow"), ("in", "dow"),
]

# BYTE-LEVEL artifact (r11, GPT-2-style byte level): learned once with
#   train_bpe(spark.read.parquet(".../sf0.001/documents.parquet"),
#             "text", n_merges=24, byte_level=True)
# over the SAME fixture and frozen. Symbols are bytes_to_unicode-
# remapped BYTES — 'Ġ' is the remapped space (0x20 -> U+0120, the
# exact GPT-2 convention), so the learner discovers the same
# space-prefixed tokens as RAW_COMMITTED_MERGES but over a base
# alphabet that covers EVERY byte: nothing can be out-of-vocab, and
# merges could span multi-byte characters if the corpus contained
# them. Passes the rank-sequential guard (pytest-pinned).
BYTE_LEVEL_COMMITTED_MERGES: list[tuple[str, str]] = [
    ("Ġ", "s"), ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("Ġ", "a"), ("Ġ", "v"),
    ("a", "s"), ("Ġ", "c"), ("m", "er"), ("a", "t"), ("Ġ", "f"),
    ("Ġ", "t"), ("Ġ", "b"), ("a", "n"), ("c", "an"), ("lu", "m"),
    ("lum", "n"), ("o", "lumn"), ("d", "ow"), ("in", "dow"),
]

# Raw base alphabet: every printable ASCII character INCLUDING space
# and uppercase — raw mode destroys nothing, so everything printable
# deserves a real id (a leftover un-merged space must not byte-escape).
# Non-ASCII still byte-escapes via BYTE_TOKENS.
BPE_RAW_BASE_CHARS: list[str] = [chr(c) for c in range(32, 127)]

# Byte-fallback inventory: one token per byte value, appended AFTER the
# merges so the core vocab's ids never move when fallback is enabled.
# An out-of-vocab symbol is always a SINGLE character (multi-character
# symbols are merge outputs, which are all in the vocab by
# construction), and encodes as the byte tokens of its UTF-8 bytes.
BYTE_TOKENS: list[str] = [f"<0x{b:02X}>" for b in range(256)]


def build_byte_level_vocab(
        merges: list[tuple[str, str]] | None = None) -> dict[str, int]:
    """token -> id map for GPT-2-style byte-level service
    (``bpe_encode_ids(byte_level=True)``): the 256 remapped byte
    symbols in byte order (``bytes_to_unicode``), then one entry per
    merge output in rank order. NO UNK and NO ``<0xNN>`` escape
    inventory — out-of-vocab is impossible by construction (every
    base symbol is one of the 256 bytes). Deterministic given the
    merge list."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bytes_to_unicode,
    )

    merges = (BYTE_LEVEL_COMMITTED_MERGES if merges is None
              else merges)
    assert_rank_sequential_ok(merges)
    vocab: dict[str, int] = {}
    for b, c in sorted(bytes_to_unicode().items()):
        vocab[c] = len(vocab)
    for l, r in merges:
        tok = l + r
        if tok in vocab:
            raise ValueError(f"vocab collision on {tok!r}")
        vocab[tok] = len(vocab)
    return vocab


def padded_vocab(n_entries: int,
                 merges: list[tuple[str, str]] | None = None,
                 base_chars: list[str] | None = None) -> dict[str, int]:
    """Diagnostic vocab at a target size: the standard ``build_vocab``
    layout padded with unreachable filler entries (no text can
    symbolize to ``fillerN``) up to ``n_entries`` — ONE home for the
    synthetic production-scale artifact that the vocab_via scale test
    and ``scripts/scale_check.py`` both measure, so the two can never
    drift apart."""
    vocab = build_vocab(merges, base_chars)
    if n_entries < len(vocab):
        raise ValueError(f"n_entries {n_entries} < real vocab size "
                         f"{len(vocab)}")
    for i in range(n_entries - len(vocab)):
        vocab[f"filler{i}"] = len(vocab)
    return vocab


def assert_rank_sequential_ok(
        merges: list[tuple[str, str]]) -> None:
    """Raise unless rank-order sequential application of ``merges`` is
    equivalent to the canonical earliest-rank rescan (see module
    docstring: all merge outputs distinct is sufficient)."""
    outputs = [l + r for l, r in merges]
    if len(set(outputs)) != len(outputs):
        raise ValueError(
            "duplicate merge outputs: rank-sequential replay is not "
            "equivalent to the canonical rescan for this merge list")


def _fs_write_bytes(spark, path: str, data: bytes) -> None:
    """Write bytes through the JVM Hadoop FileSystem — the boundary a
    cluster driver ships artifacts across (file:, s3a:, abfs:, hdfs:
    all resolve through the same API; plumbing shared via
    ``operators.util.hadoop_fs``)."""
    from serverless_data_pipeline_spark.operators.util import hadoop_fs

    fs, jpath = hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def _fs_read_bytes(spark, path: str) -> bytes:
    from serverless_data_pipeline_spark.operators.util import hadoop_fs

    fs, jpath = hadoop_fs(spark, path)
    stream = fs.open(jpath)
    try:
        return bytes(spark._jvm.org.apache.commons.io.IOUtils
                     .toByteArray(stream))
    finally:
        stream.close()


def save_artifact(path: str,
                  merges: list[tuple[str, str]] | None = None,
                  base_chars: list[str] | None = None, *,
                  mode: str = "normalized",
                  spark=None) -> None:
    """Write the tokenizer artifact as one JSON file — the
    version-and-ship step after ``train_bpe``. The file holds exactly
    the constants the vocab derives from (merges in rank order + base
    alphabet), so ``load_artifact`` + ``build_vocab`` on any machine
    reconstructs the identical token→id map. Validated on write (the
    rank-sequential guard), UTF-8, sorted keys — byte-stable for the
    same artifact, so the file itself can be content-hashed as the
    tokenizer version id.

    ``spark`` — when given, the write goes through the JVM Hadoop
    FileSystem, so ``path`` may be any Hadoop URI (``file:``,
    ``s3a://``, ``abfs://``, ``hdfs://``): a cluster driver ships the
    tokenizer to the object store next to the data, not to executor-
    local disk. Without it, a plain local ``open()``. Byte-identical
    output either way.

    ``mode`` (r11) records WHICH encoder discipline the merge list
    was trained for — "normalized", "raw", "raw_attached" or
    "byte_level" — so the file is self-describing and
    ``load_artifact(expect_mode=...)`` can refuse a mismatched
    artifact instead of silently producing wrong tokens (a
    byte-level list applied in normalized mode never fires a single
    merge). For "byte_level", ``base_chars`` is ignored (the 256-
    symbol base derives from ``bytes_to_unicode``, not the file)."""
    import json

    if mode not in ("normalized", "raw", "raw_attached", "byte_level"):
        raise ValueError(f"unknown artifact mode {mode!r}")
    merges = COMMITTED_MERGES if merges is None else merges
    if mode == "byte_level":
        base_chars = []
    else:
        base_chars = (BPE_BASE_CHARS if base_chars is None
                      else base_chars)
    assert_rank_sequential_ok(merges)
    payload = json.dumps({"format": "bpe-artifact-v1",
                          "mode": mode,
                          "end_of_word": END,
                          "unk": UNK,
                          "base_chars": list(base_chars),
                          "merges": [[l, r] for l, r in merges]},
                         ensure_ascii=False, sort_keys=True, indent=1)
    if spark is not None:
        _fs_write_bytes(spark, path, payload.encode("utf-8"))
    else:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(payload)


def load_artifact(path: str, *,
                  expect_mode: str | None = None,
                  spark=None) -> tuple[list[tuple[str, str]], list[str]]:
    """Read a ``save_artifact`` file back as (merges, base_chars),
    re-validated — feed straight into ``build_vocab``/``bpe_encode_ids``
    (or ``build_byte_level_vocab`` for a byte_level artifact, whose
    base_chars come back empty). ``spark`` routes the read through the
    Hadoop FS (any ``file:``/object-store URI), mirroring
    ``save_artifact``.

    ``expect_mode`` — when given, REFUSE an artifact whose recorded
    mode differs (files written before r11 carry no mode and read as
    "normalized"): loading a byte-level merge list into a normalized
    encoder would silently produce zero-merge output, the exact
    wrong-artifact failure the self-describing file exists to stop."""
    import json

    if spark is not None:
        doc = json.loads(_fs_read_bytes(spark, path).decode("utf-8"))
    else:
        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
    if doc.get("format") != "bpe-artifact-v1":
        raise ValueError(f"not a bpe artifact: {path}")
    mode = doc.get("mode", "normalized")
    if expect_mode is not None and mode != expect_mode:
        raise ValueError(
            f"artifact mode {mode!r} != expected {expect_mode!r}: "
            f"{path} — this merge list was trained for a different "
            "encoder discipline")
    # the in-process END/UNK constants are what build_vocab will use —
    # an artifact written with different markers would silently
    # reconstruct a DIFFERENT vocab than the one saved, defeating the
    # content-hashable-version contract (r9 ADVICE)
    if doc.get("end_of_word") != END:
        raise ValueError(
            f"artifact end_of_word {doc.get('end_of_word')!r} != "
            f"engine marker {END!r}: {path}")
    if doc.get("unk") != UNK:
        raise ValueError(
            f"artifact unk {doc.get('unk')!r} != engine marker "
            f"{UNK!r}: {path}")
    merges = [(l, r) for l, r in doc["merges"]]
    assert_rank_sequential_ok(merges)
    return merges, list(doc["base_chars"])


def build_vocab(merges: list[tuple[str, str]] | None = None,
                base_chars: list[str] | None = None, *,
                byte_tokens: bool = True) -> dict[str, int]:
    """token -> id map in the standard vocab-file layout: UNK, the base
    alphabet, the end-of-word marker, one entry per merge in rank
    order, then (by default) the 256 byte-fallback tokens — appended
    LAST so the core layout is identical whether or not the encoder
    uses them. Deterministic given the artifact constants."""
    merges = COMMITTED_MERGES if merges is None else merges
    base_chars = BPE_BASE_CHARS if base_chars is None else base_chars
    assert_rank_sequential_ok(merges)
    vocab: dict[str, int] = {UNK: 0}
    toks = list(base_chars) + [END] + [l + r for l, r in merges]
    if byte_tokens:
        toks += BYTE_TOKENS
    for tok in toks:
        if tok in vocab:
            raise ValueError(f"vocab collision on {tok!r}")
        vocab[tok] = len(vocab)
    return vocab
