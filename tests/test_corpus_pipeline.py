"""End-to-end LLM corpus pipeline: planted exact dups, near-dups,
foreign-language and low-quality docs must each be removed by their stage."""

from __future__ import annotations

from serverless_data_pipeline_spark.plans.corpus_pipeline import (
    prepare_training_corpus,
)

GOOD = ("the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the tall green hills of the valley and the river")
NEAR = GOOD.replace("lazy", "sleepy")
GOOD2 = ("a completely different and very clean document about query "
         "engines and the art of distributed data processing in the cloud")


def test_corpus_pipeline_stages(spark):
    docs = spark.createDataFrame(
        [(1, GOOD),
         (2, GOOD),            # exact dup of 1 -> dropped
         (3, NEAR),            # near dup of 1 -> dropped
         (4, GOOD2),           # survives
         (5, "el que la los es la que el los es"),   # spanish -> dropped
         (6, "x!!! ???")],     # low quality -> dropped
        "doc_id long, text string")
    res = prepare_training_corpus(docs, languages=("en",), min_quality=0.5,
                                  jaccard_threshold=0.5)
    assert res.counts["input"] == 6
    assert res.counts["after_exact_dedup"] == 5     # doc 2 gone
    assert res.counts["after_near_dedup"] == 4      # doc 3 gone
    assert res.counts["clean"] == 2                 # docs 5,6 gone
    assert sorted(r.doc_id for r in res.clean.collect()) == [1, 4]
    stats = res.stats.collect()
    assert len(stats) == 1
    assert stats[0].n_docs == 2
    assert stats[0].total_tokens > 0


def test_corpus_pipeline_exact_clusters(spark):
    docs = spark.createDataFrame(
        [(1, GOOD), (2, GOOD), (3, NEAR), (4, GOOD2)],
        "doc_id long, text string")
    res = prepare_training_corpus(docs, languages=("en",), min_quality=0.5,
                                  jaccard_threshold=0.5,
                                  exact_clusters=True)
    # same outcome as greedy on this graph, via true components
    assert sorted(r.doc_id for r in res.clean.collect()) == [1, 4]


def test_corpus_pipeline_repetition_and_decontamination_stages(spark):
    looping = ("the cat sat on the mat " * 8       # dup-trigram heavy
               + "and that is the end of it all")
    res_docs = spark.createDataFrame(
        [(1, GOOD), (2, GOOD2), (3, looping)],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        # shares the 5-gram "the quick brown fox jumps" with GOOD
        [(99, "we begin thus the quick brown fox jumps again here")],
        "doc_id long, text string")

    base = prepare_training_corpus(res_docs, languages=("en",),
                                   min_quality=0.5, jaccard_threshold=0.5,
                                   collect_counts=False)
    assert sorted(r.doc_id for r in base.clean.collect()) == [1, 2, 3]

    rep = prepare_training_corpus(res_docs, languages=("en",),
                                  min_quality=0.5, jaccard_threshold=0.5,
                                  max_dup_ngram_ratio=0.5,
                                  collect_counts=False)
    assert sorted(r.doc_id for r in rep.clean.collect()) == [1, 2]

    full = prepare_training_corpus(res_docs, languages=("en",),
                                   min_quality=0.5, jaccard_threshold=0.5,
                                   max_dup_ngram_ratio=0.5, eval_docs=ev,
                                   collect_counts=False)
    assert sorted(r.doc_id for r in full.clean.collect()) == [2]

    # the Bloom scale path must drop the same contaminated doc (and at a
    # sane bitmap size, ONLY that doc — zero false positives here)
    bloom = prepare_training_corpus(res_docs, languages=("en",),
                                    min_quality=0.5, jaccard_threshold=0.5,
                                    max_dup_ngram_ratio=0.5, eval_docs=ev,
                                    decontam_via="bloom",
                                    collect_counts=False)
    assert sorted(r.doc_id for r in bloom.clean.collect()) == [2]
    import pytest
    with pytest.raises(ValueError):
        prepare_training_corpus(res_docs, eval_docs=ev,
                                decontam_via="nope",
                                collect_counts=False)


def test_corpus_pipeline_passage_and_semantic_stages(spark):
    boiler = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, f"{GOOD} {boiler}"),      # corpus-first occurrence: kept
         (2, f"{GOOD2} {boiler}"),     # later copy: excised, doc survives
         (3, f"{boiler} another fine document about engines and rivers "
             "flowing through the quiet valley during a long warm summer"),
         (4, boiler),                  # pure boilerplate -> vanishes
         (7, f"{GOOD} {boiler}")],     # exact dup of 1 -> exact stage
        "doc_id long, text string")
    # embeddings: doc 3 is a semantic dup of doc 1 (same direction), doc
    # 2 distinct; doc 4 has no embedding row. Doc 7's row is STALE (doc 7
    # dies in exact dedup) and must not be allowed to win doc 1/3's
    # semantic family — the pipeline semi-joins embeddings on live ids.
    emb = spark.createDataFrame(
        [(7, [1.0, 0.0005, 0.0, 0.1]),
         (1, [1.0, 0.0, 0.0, 0.1]),
         (3, [1.0, 0.001, 0.0, 0.1]),
         (2, [-1.0, 0.5, 0.2, -0.8])],
        "doc_id long, embedding array<double>")
    res = prepare_training_corpus(
        docs, languages=("en",), min_quality=0.3, jaccard_threshold=0.9,
        passage_k=8, embeddings=emb, semantic_threshold=0.95,
        semantic_clusters=2)
    kept = {r.doc_id: r.text for r in res.clean.collect()}
    # doc 4 excised to nothing; doc 3 dropped as a semantic dup of 1;
    # doc 1 survives (its family's stale doc-7 row was excluded)
    assert set(kept) == {1, 2}
    # doc 1 keeps the corpus-first copy; doc 2's later copy was excised
    # before the quality/language scoring saw it
    assert "b0" in kept[1]
    assert "b0" not in kept[2] and kept[2].startswith("a completely")
    # per-stage attrition is attributed to the right stage
    assert res.counts["after_exact_dedup"] == 4     # doc 7 gone
    assert res.counts["after_near_dedup"] == 4
    assert res.counts["after_passage_dedup"] == 3   # doc 4 gone
    assert res.counts["after_semantic_dedup"] == 2  # doc 3 gone
    assert res.counts["clean"] == 2


def test_corpus_pipeline_passage_keeps_tokenless_docs(spark):
    # a whitespace-only doc must pass the passage stage untouched, same
    # as with passage_k=None (it has no windows, nothing was excised)
    docs = spark.createDataFrame(
        [(1, GOOD), (2, "   ")], "doc_id long, text string")
    res = prepare_training_corpus(docs, languages=("en",), min_quality=0.0,
                                  jaccard_threshold=0.9, passage_k=8,
                                  collect_counts=True)
    assert res.counts["after_passage_dedup"] == 2


def test_corpus_pipeline_null_text_path_parity(spark):
    # The passage stage must treat NULL text exactly like the
    # passage_k=None path does (ADVICE r5: trim(NULL)=='' is non-true,
    # so the stage's keep-filter needs an explicit isNull arm). Whether
    # a NULL doc survives the PIPELINE is decided upstream (exact dedup
    # drops it on both paths — NULL fp never equi-joins); the contract
    # here is that passage_k never changes that outcome.
    docs = spark.createDataFrame(
        [(1, GOOD), (2, None)], "doc_id long, text string")
    with_passage = prepare_training_corpus(
        docs, languages=("en",), min_quality=0.0, jaccard_threshold=0.9,
        passage_k=8, collect_counts=True)
    without = prepare_training_corpus(
        docs, languages=("en",), min_quality=0.0, jaccard_threshold=0.9,
        collect_counts=True)
    assert ({r.doc_id for r in with_passage.clean.collect()}
            == {r.doc_id for r in without.clean.collect()})
    # and the stage itself keeps a NULL-text row that reaches it
    from pyspark.sql import functions as F
    from serverless_data_pipeline_spark.operators.corpus import passage_dedup
    stage = spark.createDataFrame([(1, GOOD), (2, None)],
                                  "doc_id long, text string")
    rebuilt = (passage_dedup(stage, "doc_id", "text", k=8)
               .select("doc_id", F.col("text").alias("__ptext")))
    kept = (stage.join(rebuilt, "doc_id", "left")
            .filter(F.col("__ptext").isNotNull()
                    | (F.trim(F.col("text")) == "")
                    | F.col("text").isNull()))
    assert kept.count() == 2


def test_corpus_pipeline_unpersist_releases_stage_caches(spark):
    docs = spark.createDataFrame(
        [(1, GOOD), (2, GOOD + " extra trailing words here")],
        "doc_id long, text string")
    res = prepare_training_corpus(docs, languages=("en",), min_quality=0.0,
                                  jaccard_threshold=0.9, passage_k=8,
                                  collect_counts=True)
    assert len(res.cached) == 1
    assert res.cached[0].storageLevel.useMemory
    res.unpersist()
    assert res.cached == []
