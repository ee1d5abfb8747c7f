"""Incremental corpus maintenance: staged-semantics correctness, the
exact-stage full-recompute law, index-only probing (never rescanning
corpus text — the whole point of the operator), and idempotent
re-delivery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_data_pipeline_spark.operators.incremental import (
    bootstrap_corpus, build_corpus_index, commit_batch, corpus_index,
    incremental_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _verdicts(df):
    return {r.doc_id: r.drop_reason for r in df.collect()}


BASE = ("spark engines shuffle data across partitions during wide "
        "joins and aggregations every single day of the week")


def test_exact_stage_equals_full_recompute_first_batch_wins(spark):
    """With near-dup disabled, incremental(b2 | index(b1)) must equal a
    full recompute over the union whose keep rule is (batch, id) — the
    arrival-order semantics of a landing pipeline."""
    b1 = _docs(spark, [(1, "alpha one"), (2, "beta two"),
                       (3, "alpha one"),          # within-b1 dup of 1
                       (4, "gamma four")])
    b2 = _docs(spark, [(10, "ALPHA   one"),       # normalized dup of 1
                       (11, "delta eleven"),
                       (12, "delta eleven"),      # within-b2 dup of 11
                       (13, "beta two")])         # dup of 2
    v1 = _verdicts(incremental_dedup(b1, None, threshold=None))
    assert v1 == {1: None, 2: None, 3: "exact_batch", 4: None}
    idx = corpus_index(
        _docs(spark, [(1, "alpha one"), (2, "beta two"),
                      (4, "gamma four")]))
    v2 = _verdicts(incremental_dedup(b2, idx, threshold=None))
    assert v2 == {10: "exact_index", 11: None, 12: "exact_batch",
                  13: "exact_index"}
    # full recompute with ROW_NUMBER over (batch, id): identical kept set
    kept = ({i for i, r in v1.items() if r is None}
            | {i for i, r in v2.items() if r is None})
    assert kept == {1, 2, 4, 11}


@pytest.mark.parametrize("probe", ["exact", "minhash"])
def test_neardup_probe_drops_cross_batch_copies(spark, probe):
    """A batch-2 doc near-identical to an indexed doc is dropped as
    neardup_index on BOTH probe paths; unrelated docs survive; a
    within-batch near-dup pair keeps its min id."""
    b1 = _docs(spark, [(1, BASE + " tail one"),
                       (2, "totally unrelated text about cooking pasta "
                           "with garlic and fresh basil leaves tonight")])
    b2 = _docs(spark, [(10, BASE + " tail two"),       # near-dup of 1
                       (11, "brand new content on mountain weather "
                            "patterns and alpine climbing routes today"),
                       (12, "brand new content on mountain weather "
                            "patterns and alpine climbing routes "
                            "yesterday")])             # near-dup of 11
    idx = corpus_index(b1)
    v = _verdicts(incremental_dedup(b2, idx, probe=probe, threshold=0.5))
    assert v[10] == "neardup_index"
    assert v[11] is None
    assert v[12] == "neardup_batch"


def test_probe_reads_index_only_never_corpus_text(spark, tmp_path):
    """THE scale contract: the probe plan scans the batch and the INDEX
    parquet — the corpus parquet (the 100 TB of text) appears nowhere in
    the plan."""
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    b1 = _docs(spark, [(i, f"{BASE} tail {i}") for i in range(5)])
    b1.write.parquet(corpus_dir)
    build_corpus_index(spark.read.parquet(corpus_dir), index_dir)
    b2 = _docs(spark, [(10, BASE + " tail 99"), (11, "other text here")])
    out = incremental_dedup(b2, spark.read.parquet(index_dir))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "index" in plan
    assert "corpus" not in plan, "probe rescanned corpus text"
    # and the verdicts are still right
    v = _verdicts(out)
    assert v[10] == "neardup_index" and v[11] is None


def test_commit_then_redeliver_is_idempotent(spark, tmp_path):
    """After commit_batch, the index contains the survivors — re-probing
    the SAME batch drops every row as exact_index (redelivery safety,
    py:133-137), and the merged corpus equals bootstrap + survivors."""
    corpus_dir = str(tmp_path / "c")
    index_dir = str(tmp_path / "i")
    b1 = _docs(spark, [(1, "alpha one two three"),
                       (2, "beta four five six")])
    bootstrap_corpus(spark, b1, corpus_dir, index_dir, threshold=None)
    n_idx_before = spark.read.parquet(index_dir).count()
    b2 = _docs(spark, [(10, "gamma seven eight nine"),
                       (11, "alpha one two three")])   # dup of corpus 1
    v2 = incremental_dedup(b2, spark.read.parquet(index_dir),
                           threshold=None)
    assert _verdicts(v2) == {10: None, 11: "exact_index"}
    n = commit_batch(spark, v2, corpus_dir, index_dir)
    assert n == 3
    assert sorted(r.doc_id for r in
                  spark.read.parquet(corpus_dir).collect()) == [1, 2, 10]
    assert spark.read.parquet(index_dir).count() == n_idx_before + 1
    # redelivery of the full batch: everything now exact-dups the corpus
    v3 = _verdicts(incremental_dedup(
        b2, spark.read.parquet(index_dir), threshold=None))
    assert v3 == {10: "exact_index", 11: "exact_index"}


def test_index_validation_and_store_options(spark):
    df = _docs(spark, [(1, "a b c d e f g h")])
    with pytest.raises(ValueError):
        corpus_index(df, store=())
    with pytest.raises(ValueError):
        corpus_index(df, store=("bogus",))
    mh_only = corpus_index(df, store=("minhash",))
    assert set(mh_only.columns) == {"doc_id", "fp", "sig"}
    with pytest.raises(ValueError):
        # exact probe needs shset/sz
        incremental_dedup(df, mh_only, probe="exact").collect()
    sh_only = corpus_index(df, store=("shingles",))
    assert set(sh_only.columns) == {"doc_id", "fp", "shset", "sz"}
    with pytest.raises(ValueError):
        incremental_dedup(df, sh_only, probe="minhash").collect()
    with pytest.raises(ValueError):
        incremental_dedup(df, None, probe="cosine")


def test_minhash_and_exact_probe_agree_on_planted_fixture(spark):
    """On clearly-separated data (near-identical vs disjoint docs) the
    cheap signature probe and the exact-Jaccard probe reach identical
    verdicts."""
    b1 = _docs(spark, [(i, f"{BASE} variant {i}") for i in range(4)])
    idx = corpus_index(b1)
    b2 = _docs(spark, [(10, BASE + " variant 99")] +
               [(20 + i, f"doc {i} " +
                 " ".join(f"tok{i}_{j}" for j in range(15)))
                for i in range(4)])
    ve = _verdicts(incremental_dedup(b2, idx, probe="exact"))
    vm = _verdicts(incremental_dedup(b2, idx, probe="minhash"))
    assert ve == vm
    assert ve[10] == "neardup_index"
    assert all(ve[20 + i] is None for i in range(4))


def test_maintenance_stream_bootstrap_probe_and_audit(spark, tmp_path):
    """The composed daily-ops loop: tick 1 bootstraps the corpus+index
    from landing batch 1; tick 2 sees ONLY batch 2 (checkpointed file
    source), probes the persisted index, merges survivors, and appends
    the audit trail. End state equals the staged-semantics expectation
    of the batch-side operators it composes."""
    import json

    from pyspark.sql import types as T

    from serverless_data_pipeline_spark.operators.incremental import (
        maintenance_stream,
    )

    land = tmp_path / "landing"
    land.mkdir()
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    paths = {"corpus": str(tmp_path / "corpus"),
             "index": str(tmp_path / "index"),
             "chk": str(tmp_path / "chk"),
             "verdicts": str(tmp_path / "verdicts")}

    def _run():
        q = maintenance_stream(
            spark, str(land), schema, paths["corpus"], paths["index"],
            paths["chk"], threshold=None, verdict_path=paths["verdicts"])
        q.awaitTermination(120)

    def _land(name, rows):
        (land / name).write_text(
            "\n".join(json.dumps(r) for r in rows))

    _land("b1.json", [
        {"doc_id": 1, "text": "alpha one"},
        {"doc_id": 2, "text": "beta two"},
        {"doc_id": 3, "text": "alpha one"},      # within-b1 dup of 1
    ])
    _run()
    corpus1 = {r.doc_id for r in
               spark.read.parquet(paths["corpus"]).collect()}
    assert corpus1 == {1, 2}

    _land("b2.json", [
        {"doc_id": 10, "text": "ALPHA   one"},   # normalized dup of 1
        {"doc_id": 11, "text": "delta eleven"},
        {"doc_id": 12, "text": "delta eleven"},  # within-b2 dup of 11
    ])
    _run()
    corpus2 = {r.doc_id for r in
               spark.read.parquet(paths["corpus"]).collect()}
    assert corpus2 == {1, 2, 11}
    # index grew by exactly the surviving batch (append-only)
    idx = spark.read.parquet(paths["index"])
    assert {r.doc_id for r in idx.collect()} == {1, 2, 11}
    # audit trail: tick-tagged verdicts for every landed doc
    v = {(r.doc_id): (r.drop_reason, r.tick_id)
         for r in spark.read.parquet(paths["verdicts"]).collect()}
    assert v[3][0] == "exact_batch" and v[10][0] == "exact_index"
    assert v[12][0] == "exact_batch"
    assert {d for d, (reason, _) in v.items() if reason is None} \
        == {1, 2, 11}
    # batch-2 verdicts all carry a LATER tick than batch-1's
    assert {v[d][1] for d in (10, 11, 12)} != {v[d][1] for d in (1, 2, 3)}


def test_incremental_semantic_dedup_probes_persisted_cells(spark):
    """Vector-side incremental dedup: a new batch vector near-identical
    to an INDEXED vector is dropped as semdup_index; novel directions
    survive; re-probing committed survivors drops them (idempotent)."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.incremental import (
        incremental_semantic_dedup,
    )
    from serverless_data_pipeline_spark.operators.similarity import (
        assign_ivf_cells,
    )
    dim = 8
    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    centroids = [list(map(float, v)) for v in base]
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in base[i % 4] * (1.0 + 0.01 * i)])
         for i in range(8)], "vec_id long, embedding array<float>")
    index = assign_ivf_cells(corpus, "embedding", centroids, dim)
    # batch: near-copy of vec 0 (same direction), one orthogonal-ish
    # novel vector, and one mild rotation below the threshold
    novel = rng.normal(size=dim)
    for v in base:
        novel -= np.dot(novel, v) * v / np.dot(v, v)
    novel /= np.linalg.norm(novel)
    batch = spark.createDataFrame(
        [(100, [float(x) for x in base[0] * 2.0]),
         (101, [float(x) for x in novel])],
        "vec_id long, embedding array<float>")
    v = {r.vec_id: r.drop_reason for r in incremental_semantic_dedup(
        batch, index, "vec_id", "embedding", centroids, dim,
        threshold=0.95).collect()}
    assert v[100] == "semdup_index"
    assert v[101] is None
    # commit the survivor and re-probe the same batch: BOTH now drop
    surv = batch.filter(F.col("vec_id") == 101)
    index2 = index.unionByName(
        assign_ivf_cells(surv, "embedding", centroids, dim))
    v2 = {r.vec_id: r.drop_reason for r in incremental_semantic_dedup(
        batch, index2, "vec_id", "embedding", centroids, dim,
        threshold=0.95).collect()}
    assert v2 == {100: "semdup_index", 101: "semdup_index"}
    # index missing the cell column is rejected
    import pytest
    with pytest.raises(ValueError, match="index lacks"):
        incremental_semantic_dedup(batch, corpus, "vec_id", "embedding",
                                   centroids, dim)
