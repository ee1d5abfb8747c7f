"""LLM training-data corpus pipeline (charter X-ops composed end-to-end).

The reference's EP1 is generic ETL; this is the same shape specialized to
what a 100 TB pretraining-corpus pipeline actually runs:

    exact dedup (fingerprint)            X5/X1
    → near-dup removal (MinHash LSH)     X2
    → language filter                    X5
    → quality filter                     X5
    → repetition gate (optional)         X11
    → decontamination (optional)         X10
    → corpus stats                       X5

Every stage is a DataFrame→DataFrame transform; dedup stages are
candidate-generation joins (never all-pairs); stats are one aggregation
pass. The near-dup removal keeps the LOWEST doc id of each connected
pair-component's edge (greedy edge-drop: for every surviving pair (a, b)
with a < b, b is dropped) — the standard one-pass policy that avoids an
iterative connected-components job; at 100 TB you would run it per
LSH-band partition exactly as here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serverless_data_pipeline_spark.functions.text import quality_score_expr
from serverless_data_pipeline_spark.operators.dedup import (
    dedupe_by_components, minhash_lsh_pairs,
)
from serverless_data_pipeline_spark.operators.text import (
    fingerprint_documents, language_id, token_stats,
)


@dataclass
class CorpusResult:
    """`cached` lists the intermediate frames `prepare_training_corpus`
    cached (passage/semantic stages). Their lifetime is CALLER-owned:
    `clean`/`stats` read through them, so they stay cached until the
    caller is done — call `unpersist()` then (ADVICE r5: repeated
    pipeline runs in one session otherwise accumulate storage memory)."""

    clean: DataFrame
    stats: DataFrame
    counts: dict = field(default_factory=dict)
    cached: list = field(default_factory=list)

    def unpersist(self) -> None:
        """Release the pipeline's cached intermediates. Call after the
        last action on `clean`/`stats`; later actions still succeed but
        recompute the passage/semantic stages."""
        for df in self.cached:
            df.unpersist()
        self.cached.clear()


def prepare_training_corpus(docs: DataFrame, *,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            languages: tuple[str, ...] = ("en",),
                            min_quality: float = 0.5,
                            jaccard_threshold: float = 0.6,
                            exact_clusters: bool = False,
                            passage_k: int | None = None,
                            embeddings: DataFrame | None = None,
                            semantic_threshold: float = 0.9,
                            semantic_clusters: int = 16,
                            semantic_dim: int | None = None,
                            semantic_centroids: list | None = None,
                            max_dup_ngram_ratio: float | None = None,
                            eval_docs: DataFrame | None = None,
                            decontam_ngram: int = 5,
                            decontam_via: str = "broadcast",
                            decontam_bloom_bits: int = 1 << 28,
                            collect_counts: bool = True) -> CorpusResult:
    """docs(doc_id, text, ...) -> deduped, language- and quality-filtered
    corpus + per-language token statistics.

    `exact_clusters=True` replaces the greedy edge-drop near-dup policy
    with true connected components (keep the min doc id per transitive
    cluster) — a few extra shuffle rounds, exact cluster semantics.

    `passage_k` (X12) rebuilds each surviving doc with repeated
    >=k-token passages excised (ExactSubstr sliding-window dedup) BEFORE
    the language/quality gates, so boilerplate spans do not distort the
    scores; docs whose every token was a repeat disappear, while docs
    that had no tokens to begin with pass through untouched (identical
    to the passage_k=None path). `embeddings` (X2 semantic) — a frame
    keyed by the same `id_col` with an `embedding` column — adds
    SemDeDup: docs whose embedding is dropped within its k-means cluster
    are removed (docs without an embedding row are kept). The embeddings
    are semi-joined against the docs STILL ALIVE at that stage first —
    running SemDeDup over stale rows would let an already-removed doc
    win a semantic family and delete every surviving copy. At scale pass
    `semantic_dim` and `semantic_centroids` (one offline training) so
    pipeline construction triggers no driver action or in-line k-means.

    `max_dup_ngram_ratio` (X11) adds the repetition gate: drop docs whose
    duplicate-trigram ratio exceeds the bound (narrow pass, no shuffle).
    `eval_docs` (X10) adds benchmark decontamination as the final stage:
    drop any surviving doc sharing a distinct `decontam_ngram`-gram with
    the eval set (eval shingles broadcast; the corpus never shuffles).
    `decontam_via="bloom"` swaps in `bloom_decontaminate` with a
    `decontam_bloom_bits`-bit bitmap — the shape for an eval set whose
    raw shingle frame outgrows a broadcast; error is one-sided (may
    over-drop at the Bloom FP rate, never leaks eval data into train).
    Both stages mirror __spark_entry__.py's oracle-checked x7 pipeline."""
    n0 = docs.count() if collect_counts else -1

    # exact dedup: keep the lowest id of each fingerprint group
    fp = fingerprint_documents(docs, id_col, text_col)
    keep_exact = fp.groupBy("fp").agg(F.min(id_col).alias(id_col)) \
                   .select(id_col)
    exact = docs.join(keep_exact, id_col)

    # near-dup removal: drop the higher id of every surviving LSH pair
    pairs = minhash_lsh_pairs(exact, id_col, text_col,
                              jaccard_threshold=jaccard_threshold)
    if exact_clusters:
        neardeduped = dedupe_by_components(exact, pairs, id_col)
    else:
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        neardeduped = exact.join(drop, id_col, "left_anti")

    stage = neardeduped
    if passage_k is not None:
        from serverless_data_pipeline_spark.operators.corpus import (
            passage_dedup,
        )
        rebuilt = (passage_dedup(stage, id_col, text_col, k=passage_k)
                   .select(id_col, F.col(text_col).alias("__ptext")))
        # left join + coalesce: a doc absent from the rebuilt frame was
        # either excised to nothing (had tokens -> drop, it was pure
        # boilerplate) or had no tokens at all (keep untouched, same as
        # the passage_k=None path).
        # trim == "" is exactly "tokenizes to zero tokens" (tokens() is
        # whitespace splitting) at a string-compare instead of a third
        # corpus-wide tokenize; the isNull arm keeps NULL-text docs on
        # the tokenless path too (ADVICE r5: trim(NULL)=='' is non-true,
        # which silently dropped them here while the passage_k=None path
        # carried them to the gates).
        stage = (stage.join(rebuilt, id_col, "left")
                 .filter(F.col("__ptext").isNotNull()
                         | (F.trim(F.col(text_col)) == "")
                         | F.col(text_col).isNull())
                 .withColumn(text_col,
                             F.coalesce("__ptext", F.col(text_col)))
                 .drop("__ptext"))
    cached: list[DataFrame] = []
    after_passage = stage
    if passage_k is not None and collect_counts:
        # counted below AND consumed by every later stage — without the
        # cache the passage plan (the pipeline's most expensive stage)
        # re-executes for each downstream count + the stats pass.
        # Lifetime is caller-owned via CorpusResult.unpersist().
        after_passage = stage = stage.cache()
        cached.append(stage)

    if embeddings is not None:
        from serverless_data_pipeline_spark.operators.dedup import (
            semantic_dedup,
        )
        # Only embeddings of docs still alive: a stale row could win a
        # semantic family and delete every surviving copy of it.
        live_emb = embeddings.join(stage.select(id_col), id_col,
                                   "left_semi")
        dropped = (semantic_dedup(live_emb, id_col, "embedding",
                                  threshold=semantic_threshold,
                                  n_clusters=semantic_clusters,
                                  dim=semantic_dim,
                                  centroids=semantic_centroids)
                   .filter(~F.col("keep")).select(id_col))
        # anti-join the DROPPED set so docs without an embedding survive
        stage = stage.join(dropped, id_col, "left_anti")
    after_semantic = stage
    if embeddings is not None and collect_counts:
        # same re-execution argument as the passage cache: counted below
        # and consumed by the gates + stats.
        after_semantic = stage = stage.cache()
        cached.append(stage)

    # language + quality gates (single narrow pass each)
    lang_ok = (language_id(stage, text_col)
               .filter(F.col("predicted_lang").isin(*languages)))
    clean = (lang_ok
             .withColumn("__q", quality_score_expr(text_col))
             .filter(F.col("__q") >= min_quality)
             .drop("__q", "predicted_lang"))

    if max_dup_ngram_ratio is not None:
        from serverless_data_pipeline_spark.functions.text import (
            shingles_from_tokens, tokens,
        )
        sh = shingles_from_tokens(tokens(text_col), 3)
        dnr = (F.when(F.size(sh) > 0,
                      1.0 - F.size(F.array_distinct(sh)).cast("double")
                      / F.size(sh).cast("double"))
                .otherwise(F.lit(0.0)))
        clean = (clean.withColumn("__dnr", dnr)
                 .filter(F.col("__dnr") <= max_dup_ngram_ratio)
                 .drop("__dnr"))

    if eval_docs is not None:
        from serverless_data_pipeline_spark.operators.corpus import (
            bloom_decontaminate, decontaminate,
        )
        if decontam_via == "bloom":
            flagged = bloom_decontaminate(clean, eval_docs, id_col,
                                          text_col, n=decontam_ngram,
                                          m_bits=decontam_bloom_bits)
        elif decontam_via == "broadcast":
            flagged = decontaminate(clean, eval_docs, id_col, text_col,
                                    n=decontam_ngram)
        else:
            raise ValueError(f"decontam_via must be 'broadcast' or "
                             f"'bloom', got {decontam_via!r}")
        clean = (flagged.filter(~F.col("contaminated"))
                 .drop("n_overlap", "contaminated"))

    stats = token_stats(clean.withColumn("__lang_group", F.lit("corpus")),
                        text_col, group_col="__lang_group") \
        .withColumnRenamed("__lang_group", "corpus")

    counts = {}
    if collect_counts:
        counts = {"input": n0,
                  "after_exact_dedup": exact.count(),
                  "after_near_dedup": neardeduped.count()}
        if passage_k is not None:
            counts["after_passage_dedup"] = after_passage.count()
        if embeddings is not None:
            counts["after_semantic_dedup"] = after_semantic.count()
        counts["clean"] = clean.count()
    return CorpusResult(clean=clean, stats=stats, counts=counts,
                        cached=cached)
