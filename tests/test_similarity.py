"""X3/X4 similarity search: exact correctness + ANN recall vs exact."""

from __future__ import annotations

import math
import random

from serverless_data_pipeline_spark.operators.similarity import (
    add_sign_lsh_buckets, ann_topk, ann_topk_indexed, ann_topk_join,
    brute_force_topk, brute_force_topk_join, ivf_topk,
)


def _clustered(n_per=20, dim=16, seed=7):
    """3 tight clusters around orthogonal-ish centers."""
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(3)]
    rows, vid = [], 0
    for c in centers:
        for _ in range(n_per):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    return rows, centers


def test_brute_force_exact(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])],
        "vec_id long, embedding array<float>")
    out = brute_force_topk(df, "vec_id", "embedding", [1.0, 0.0], k=2)
    assert [r.vec_id for r in out.collect()] == [1, 3]
    assert out.first().cosine == 1.0


def test_brute_force_join_self_identity(spark):
    rows, _ = _clustered(n_per=5)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 3")
    out = brute_force_topk_join(q, df, "vec_id", "embedding",
                                "vec_id", "embedding", k=1)
    for r in out.collect():
        assert r.query_id == r.neighbor_id  # self is the 1-NN at cosine 1.0


def test_ann_recall_against_exact(spark):
    rows, centers = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = centers[0]
    exact = {r.vec_id for r in
             brute_force_topk(df, "vec_id", "embedding", query, k=10).collect()}
    approx = {r.vec_id for r in
              ann_topk(df, "vec_id", "embedding", query, k=10,
                       n_tables=4, n_planes=8, seed=42).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"ANN recall {recall} < 0.8"


def test_ann_join_recall_against_exact_join(spark):
    """Two-table ANN join: per-query recall vs the exact broadcast join
    over the same clustered corpus. A query collides with its own
    cluster's members in >= 1 table with high probability at 4x8."""
    rows, centers = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(qi, c) for qi, c in enumerate(centers)],
        "q_id long, qvec array<float>")
    exact = brute_force_topk_join(queries, df, "q_id", "qvec",
                                  "vec_id", "embedding", k=10).collect()
    approx = ann_topk_join(queries, df, "q_id", "qvec",
                           "vec_id", "embedding", dim=16, k=10,
                           n_tables=4, n_planes=8, seed=42).collect()
    for qi in range(3):
        e = {r.neighbor_id for r in exact if r.query_id == qi}
        a = {r.neighbor_id for r in approx if r.query_id == qi}
        recall = len(e & a) / len(e)
        assert recall >= 0.8, f"query {qi}: recall {recall} < 0.8"


def test_ann_join_no_duplicate_candidates(spark):
    """A pair colliding in several LSH tables must appear once."""
    rows, _ = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.limit(2).selectExpr("vec_id as q_id", "embedding as qvec")
    out = ann_topk_join(queries, df, "q_id", "qvec", "vec_id", "embedding",
                        dim=16, k=60, n_tables=4, n_planes=4, seed=1)
    pairs = [(r.query_id, r.neighbor_id) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_ann_indexed_matches_inline(spark):
    """Probing materialized bucket columns must return exactly what the
    inline (per-scan projection) ANN returns for the same seed/params."""
    rows, centers = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = centers[2]
    inline = ann_topk(df, "vec_id", "embedding", query, k=10,
                      n_tables=3, n_planes=6, seed=9).collect()
    indexed_df = add_sign_lsh_buckets(df, "embedding", dim=16,
                                      n_tables=3, n_planes=6, seed=9)
    indexed = ann_topk_indexed(indexed_df, "vec_id", "embedding", query,
                               k=10, n_tables=3, n_planes=6, seed=9).collect()
    assert [(r.vec_id, r.cosine) for r in inline] == \
        [(r.vec_id, r.cosine) for r in indexed]


def test_ivf_finds_cluster_members(spark):
    rows, centers = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_topk(df, "vec_id", "embedding", centers[1], k=5,
                   n_cells=8, n_probe=4, seed=1)
    got = [r.vec_id for r in out.collect()]
    # cluster 1 occupies vec_ids 20..39
    assert len(got) == 5 and all(20 <= v < 40 for v in got)


def test_ivf_trained_centroids_beat_random(spark):
    """A trained codebook must recover the planted clusters: probing ONE
    cell with the trained centroids returns only that cluster's members."""
    from serverless_data_pipeline_spark.operators.similarity import (
        train_ivf_centroids,
    )
    rows, centers = _clustered()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids(df, "embedding", n_cells=3, seed=5)
    assert len(cents) == 3
    out = ivf_topk(df, "vec_id", "embedding", centers[0], k=10,
                   n_probe=1, centroids=cents)
    got = [r.vec_id for r in out.collect()]
    # cluster 0 occupies vec_ids 0..19; a trained 3-cell codebook probed
    # at 1 cell must stay inside it
    assert len(got) == 10 and all(v < 20 for v in got)


def test_group_centroids_exact_mean(spark):
    from serverless_data_pipeline_spark.operators.similarity import (
        group_centroids,
    )
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("a", [3.0, 2.0]), ("b", [5.0, 5.0])],
        "grp string, embedding array<float>")
    got = {r.grp: r.centroid
           for r in group_centroids(df, "grp", "embedding", dim=2).collect()}
    assert got == {"a": [2.0, 1.0], "b": [5.0, 5.0]}


def test_cosine_matches_math(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]
    df = spark.createDataFrame([(1, a)], "vec_id long, embedding array<float>")
    out = brute_force_topk(df, "vec_id", "embedding", b, k=1)
    dot = sum(x * y for x, y in zip(a, b))
    expect = dot / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(y * y for y in b)))
    assert abs(out.first().cosine - round(expect, 6)) < 1e-6


def test_pq_recall_with_refine_on_fixture(spark):
    """PQ+refine recall >= 0.8 vs exact top-10 on the real embeddings
    fixture (64-dim), trained codebooks, code-only candidate stage."""
    import __spark_entry__ as entry_mod
    from serverless_data_pipeline_spark.operators.similarity import (
        pq_topk, train_pq_codebooks,
    )
    emb = entry_mod._t(spark, "/root/testdata/sf0.001", "embeddings")
    qv = emb.filter("vec_id = 3").first().embedding
    qv = [float(x) for x in qv]
    books = train_pq_codebooks(emb, "embedding", dim=64, m=8, ksub=16,
                               seed=11, sample_n=512)
    exact = {r.vec_id for r in
             brute_force_topk(emb, "vec_id", "embedding", qv, k=10).collect()}
    approx = {r.vec_id for r in
              pq_topk(emb, "vec_id", "embedding", qv, k=10,
                      codebooks=books, refine=50).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall {recall} < 0.8"


def test_pq_refined_scores_are_exact_cosine(spark):
    """After the refine pass the returned cosine must equal the exact
    brute-force cosine for every surviving id."""
    import __spark_entry__ as entry_mod
    from serverless_data_pipeline_spark.operators.similarity import (
        pq_topk, train_pq_codebooks,
    )
    emb = entry_mod._t(spark, "/root/testdata/sf0.001", "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 3").first().embedding]
    books = train_pq_codebooks(emb, "embedding", dim=64, m=8, ksub=16,
                               seed=11, sample_n=512)
    exact = {r.vec_id: r.cosine for r in
             brute_force_topk(emb, "vec_id", "embedding", qv,
                              k=200).collect()}
    got = pq_topk(emb, "vec_id", "embedding", qv, k=10,
                  codebooks=books, refine=50).collect()
    for r in got:
        assert abs(r.cosine - exact[r.vec_id]) < 1e-6


def test_pq_encode_deterministic_and_shaped(spark):
    from serverless_data_pipeline_spark.operators.similarity import (
        pq_encode, train_pq_codebooks,
    )
    rows, _ = _clustered(dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, ksub=8, seed=3)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    a = {r.vec_id: r.pq_code for r in
         pq_encode(df, "embedding", books, 16).collect()}
    b = {r.vec_id: r.pq_code for r in
         pq_encode(df, "embedding", books, 16).collect()}
    assert a == b
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c)
               for c in a.values())


def test_pq_codes_separate_clusters(spark):
    """PQ codes must agree (per position) far more within a tight cluster
    than across clusters — the property ADC relies on. Exact full-code
    equality is NOT expected: with ksub > clusters, k-means happily
    subdivides a cluster's noise ball."""
    from serverless_data_pipeline_spark.operators.similarity import (
        pq_encode, train_pq_codebooks,
    )
    rows, _ = _clustered(n_per=20, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = train_pq_codebooks(df, "embedding", dim=16, m=4, ksub=4, seed=3)
    codes = {r.vec_id: tuple(r.pq_code) for r in
             pq_encode(df, "embedding", books, 16).collect()}

    def agree(i, j):
        return sum(a == b for a, b in zip(codes[i], codes[j])) / 4.0

    same = [agree(i, j) for i in range(0, 20) for j in range(i + 1, 20)]
    cross = [agree(i, j) for i in range(0, 20) for j in range(20, 40)]
    assert sum(same) / len(same) > 0.5
    assert sum(cross) / len(cross) < 0.2
    assert sum(same) / len(same) > 2 * (sum(cross) / len(cross))


def test_pq_codes_only_probe_without_vectors(spark):
    """refine=0 must probe a materialized (id, pq_code) index frame with
    the embedding column DROPPED — the documented persistence shape
    (ADVICE r4: the unconditional vec_col select raised
    AnalysisException). refine>0 on the same frame must raise a clear
    ValueError, not an analyzer error."""
    import pytest

    import __spark_entry__ as entry_mod
    from serverless_data_pipeline_spark.operators.similarity import (
        pq_encode, pq_topk, train_pq_codebooks,
    )
    emb = entry_mod._t(spark, "/root/testdata/sf0.001", "embeddings")
    qv = [float(x) for x in emb.filter("vec_id = 3").first().embedding]
    books = train_pq_codebooks(emb, "embedding", dim=64, m=8, ksub=16,
                               seed=11, sample_n=512)
    index = (pq_encode(emb, "embedding", books, 64)
             .select("vec_id", "pq_code"))          # vectors dropped
    got = pq_topk(index, "vec_id", "embedding", qv, k=10,
                  codebooks=books, refine=0, code_col="pq_code").collect()
    assert len(got) == 10
    full = pq_topk(emb, "vec_id", "embedding", qv, k=10,
                   codebooks=books, refine=0).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in full]
    with pytest.raises(ValueError, match="refine"):
        pq_topk(index, "vec_id", "embedding", qv, k=10,
                codebooks=books, refine=50, code_col="pq_code")


def test_pq_codebook_sample_is_deterministic(spark):
    """The training sample must be a total-order prefix: shuffling the
    input partitioning must not change the trained codebooks (ADVICE r4:
    the old first-column fallback made limit() run-dependent). A frame
    with ONLY the vector column must raise."""
    import pytest

    import __spark_entry__ as entry_mod
    from serverless_data_pipeline_spark.operators.similarity import (
        train_pq_codebooks,
    )
    emb = entry_mod._t(spark, "/root/testdata/sf0.001", "embeddings")
    a = train_pq_codebooks(emb, "embedding", dim=64, m=4, ksub=8,
                           seed=7, sample_n=256, id_col="vec_id")
    b = train_pq_codebooks(emb.repartition(13), "embedding", dim=64,
                           m=4, ksub=8, seed=7, sample_n=256,
                           id_col="vec_id")
    assert a == b
    with pytest.raises(ValueError, match="id_col"):
        train_pq_codebooks(emb.select("embedding"), "embedding",
                           dim=64, m=4, ksub=8)


def test_multiprobe_lifts_random_fixture_recall(spark):
    """The r6 multiprobe floor on the ADVERSARIAL regime (uniform random
    vectors — every cosine is noise-level): the registry's cheap 2x8
    config must reach mean recall@10 >= 0.5 with multiprobe=2 and
    strictly beat its own exact-bucket probing. (The >= 0.8 floors above
    cover the high-cosine planted regime; measured fixture-wide numbers
    live in scripts/ann_recall.py: 0.14 mp0 / 0.30 mp1 / 0.64 mp2 at
    sf0.1.)"""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(1500, 64))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>").localCheckpoint(eager=True)
    recalls = {0: 0.0, 2: 0.0}
    queries = [vecs[j].tolist() for j in (11, 222, 333, 444, 555)]
    for q in queries:
        exact = {r[0] for r in
                 brute_force_topk(df, "vec_id", "embedding", q, k=10)
                 .collect()}
        for mp in recalls:
            approx = {r[0] for r in
                      ann_topk(df, "vec_id", "embedding", q, k=10,
                               n_tables=2, n_planes=8, multiprobe=mp)
                      .collect()}
            recalls[mp] += len(exact & approx) / 10
    n = len(queries)
    assert recalls[2] / n >= 0.5, recalls
    assert recalls[2] > recalls[0], recalls


def test_indexed_multiprobe_filter_prunes_partitions(spark, tmp_path):
    """The index-build/probe split's 100 TB claim, plan-asserted: writing
    the corpus partitioned by a bucket column and probing with
    ann_topk_indexed must turn the multiprobe IN-filter into partition
    pruning (PartitionFilters on lsh_0), not a full scan + filter."""
    import numpy as np

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(rng.normal(size=(300, 16)))],
        "vec_id long, embedding array<double>")
    indexed = add_sign_lsh_buckets(df, "embedding", dim=16, n_tables=2,
                                   n_planes=4)
    path = str(tmp_path / "lsh_index")
    indexed.write.partitionBy("lsh_0").parquet(path)
    probe = ann_topk_indexed(spark.read.parquet(path), "vec_id",
                             "embedding", [0.1] * 16, k=5,
                             n_tables=2, n_planes=4, multiprobe=1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the lsh_0 probe arm must prune partitions; the OR-across-columns
    # single-scan form pushed NOTHING (PartitionFilters: []) — the bug
    # the r6 union-of-scans restructure fixed
    pruned = [seg.split("PartitionFilters")[1][:400]
              for seg in plan.split("FileScan")[1:]
              if "PartitionFilters" in seg]
    assert any("lsh_0" in pf for pf in pruned), plan


def test_ivf_indexed_matches_inline_and_prunes(spark, tmp_path):
    """assign_ivf_cells + ivf_topk_indexed: results identical to the
    inline ivf_topk for the same codebook, and the single-column IN
    probe partition-prunes when the index is written partitionBy(cell)
    — the inverted-file layout (each probe reads n_probe/n_cells of the
    corpus from disk)."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.similarity import (
        assign_ivf_cells, ivf_topk_indexed, train_ivf_centroids,
    )

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(rng.normal(size=(400, 16)))],
        "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(df, "embedding", n_cells=8, seed=1,
                                max_iter=5)
    q = [0.2] * 16
    inline = [tuple(r) for r in
              ivf_topk(df, "vec_id", "embedding", q, k=5, n_probe=3,
                       centroids=cents).collect()]
    path = str(tmp_path / "ivf_index")
    assign_ivf_cells(df, "embedding", cents, dim=16) \
        .write.partitionBy("ivf_cell").parquet(path)
    indexed_df = ivf_topk_indexed(spark.read.parquet(path), "vec_id",
                                  "embedding", q, k=5, n_probe=3,
                                  centroids=cents)
    assert [tuple(r) for r in indexed_df.collect()] == inline
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    pruned = [seg.split("PartitionFilters")[1][:300]
              for seg in plan.split("FileScan")[1:]
              if "PartitionFilters" in seg]
    assert any("ivf_cell" in pf for pf in pruned), plan


def test_ivfpq_composed_recall_and_codes_only_probe(spark, tmp_path):
    """The composed IVF-PQ index (r7 verdict #3): recall@10 floor vs the
    exact baseline on a planted-neighbor fixture, the probe's cell
    filter partition-prunes, the probed index scan reads CODES ONLY (no
    embedding column anywhere before the re-rank), and the re-rank
    touches raw vectors only through the broadcast shortlist join."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.similarity import (
        build_ivfpq_index, ivfpq_topk, train_ivf_centroids,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(600, 32))
    q = base[17] / np.linalg.norm(base[17])
    # plant 8 true neighbors near q (high-cosine regime)
    for j in range(8):
        base[100 + j] = q * 5 + rng.normal(scale=0.15, size=32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>").localCheckpoint(eager=True)
    cents = train_ivf_centroids(df, "embedding", n_cells=8, seed=3,
                                max_iter=5)
    books = train_pq_codebooks(df, "embedding", dim=32, m=8, ksub=16,
                               seed=3, sample_n=600)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(df, "vec_id", "embedding", 32,
                      centroids=cents, codebooks=books) \
        .write.partitionBy("ivf_cell").parquet(path)
    index = spark.read.parquet(path)
    assert "embedding" not in index.columns          # codes-only on disk

    exact = {r[0] for r in
             brute_force_topk(df, "vec_id", "embedding", q.tolist(), k=10)
             .collect()}
    got_df = ivfpq_topk(index, df, "vec_id", "embedding", q.tolist(),
                        k=10, centroids=cents, codebooks=books,
                        n_probe=4, refine=50)
    got = {r[0] for r in got_df.collect()}
    assert len(exact & got) / 10 >= 0.8, (exact, got)

    # plan asserts: cell partition-pruning + codes-only index scan
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    scans = plan.split("FileScan")[1:]
    idx_scans = [s for s in scans if "ivfpq" in s.split("Location")[-1][:400]]
    assert idx_scans, plan
    for s in idx_scans:
        rs = s.split("ReadSchema:")[-1][:300]
        assert "embedding" not in rs, rs               # codes only
        pf = s.split("PartitionFilters")[-1][:300]
        assert "ivf_cell" in pf, pf                    # pruned probe

    # ADC-only mode needs no raw vectors at all
    adc_only = ivfpq_topk(index, None, "vec_id", "embedding", q.tolist(),
                          k=10, centroids=cents, codebooks=books,
                          n_probe=4, refine=0)
    assert adc_only.count() == 10
    import pytest

    with pytest.raises(ValueError):
        ivfpq_topk(index, None, "vec_id", "embedding", q.tolist(),
                   centroids=cents, codebooks=books, refine=50).collect()


def test_random_projection_laws(spark):
    """JL projection laws: output length k; exact duplicate vectors get
    bit-identical projections; linearity within quantization (proj(2v)
    == 2*proj(v) up to 2 micro-units per component after the 6dp
    round); the projected cosine of 40 random pairs stays within the
    JL distortion envelope of the true cosine; out_dim < 1 raises."""
    import numpy as np
    import pytest as _pt

    from serverless_data_pipeline_spark.operators.similarity import (
        random_projection,
    )
    rng = np.random.RandomState(42)
    vecs = rng.randn(40, 64).astype("float32")
    rows = ([(i, [float(x) for x in vecs[i]]) for i in range(40)]
            + [(100, [float(x) for x in vecs[0]])]          # exact dup of 0
            + [(101, [float(2.0 * x) for x in vecs[1]])])   # 2x of 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: np.array(r.proj)
           for r in random_projection(df, "embedding", 16).collect()}
    assert all(len(p) == 16 for p in out.values())
    assert (out[100] == out[0]).all()
    assert np.abs(out[101] - 2.0 * out[1]).max() < 1e-4
    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    errs = [abs(cos(out[2 * i], out[2 * i + 1])
                - cos(vecs[2 * i], vecs[2 * i + 1])) for i in range(20)]
    # k=16 -> stderr ~ 1/sqrt(16) = 0.25; generous statistical bound
    assert max(errs) < 0.75 and sum(errs) / len(errs) < 0.3
    with _pt.raises(ValueError):
        random_projection(df, "embedding", 0)


def test_random_projection_preserves_neighbor_ranking(spark):
    """The ANN-prefilter contract: a planted near-duplicate must stay
    the top-1 projected-space neighbor of its source among 50
    distractors (project -> shortlist -> re-rank is only sound if
    near-identical vectors stay nearest)."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.similarity import (
        random_projection,
    )
    rng = np.random.RandomState(7)
    base = rng.randn(50, 64).astype("float32")
    near = base[0] + 0.01 * rng.randn(64).astype("float32")
    rows = ([(i, [float(x) for x in base[i]]) for i in range(50)]
            + [(999, [float(x) for x in near])])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: np.array(r.proj)
           for r in random_projection(df, "embedding", 16).collect()}
    q = out[999]
    sims = sorted(((float(np.dot(q, v)
                          / (np.linalg.norm(q) * np.linalg.norm(v))), i)
                   for i, v in out.items() if i != 999), reverse=True)
    assert sims[0][1] == 0


def test_cluster_balanced_sample_assignment_and_quota(spark):
    """Diversity-sampling laws: vectors aligned with a centroid land in
    its cell (winning score ~1 for exact alignment); every cell's
    sampled count == min(per_cluster, cell size); the flag is
    row-preserving; dense cells don't steal quota from sparse ones;
    ties go to the lower cell index; bad args raise."""
    import pytest as _pt

    from serverless_data_pipeline_spark.operators.similarity import (
        cluster_balanced_sample,
    )
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = ([(i, [5.0, 0.1, 0.0, 0.0]) for i in range(20)]      # cell 0
            + [(100 + i, [0.0, 3.0, 0.2, 0.0]) for i in range(3)]  # cell 1
            + [(500, [1.0, 1.0, 0.0, 0.0])])                    # tie -> 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_balanced_sample(df, "vec_id", "embedding",
                                  cents, per_cluster=5)
    got = {r.vec_id: r for r in out.collect()}
    assert len(got) == 24
    assert all(got[i].cell == 0 for i in range(20))
    assert all(got[100 + i].cell == 1 for i in range(3))
    assert got[500].cell == 0
    s0 = sum(1 for i, r in got.items() if r.cell == 0 and r.sampled)
    s1 = sum(1 for i, r in got.items() if r.cell == 1 and r.sampled)
    assert s0 == 5 and s1 == 3
    # score = scalar projection v.c/|c| (|v| cancels in the argmax)
    assert got[0].cell_score == 5.0
    assert got[100].cell_score == 3.0
    with _pt.raises(ValueError):
        cluster_balanced_sample(df, "vec_id", "embedding", cents, 0)
    with _pt.raises(ValueError):
        cluster_balanced_sample(df, "vec_id", "embedding", [], 1)
    with _pt.raises(ValueError):
        cluster_balanced_sample(df, "vec_id", "embedding",
                                [[0.0, 0.0, 0.0, 0.0]], 1)


def test_random_projection_feeds_ann_index(spark):
    """The documented compose path — project high-dim vectors down,
    index the projections with sign-LSH, probe in projected space:
    a planted near-duplicate must be retrieved top-1 through the
    full random_projection -> ann_topk pipeline."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.similarity import (
        ann_topk, random_projection,
    )
    rng = np.random.RandomState(11)
    base = rng.randn(200, 64).astype("float32")
    q = base[7] + 0.005 * rng.randn(64).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(200)],
        "vec_id long, embedding array<float>")
    proj = random_projection(df, "embedding", 16).select("vec_id", "proj")
    qproj = (random_projection(
                 spark.createDataFrame([(0, [float(x) for x in q])],
                                       "vec_id long, embedding array<float>"),
                 "embedding", 16)
             .first().proj)
    got = ann_topk(proj, "vec_id", "proj", list(qproj), k=5,
                   n_tables=4, n_planes=6, multiprobe=1)
    assert got.first().vec_id == 7


def test_random_projection_rejects_wrong_length_vectors(spark):
    """A vector LONGER than in_dim must raise loudly (silently
    projecting the first in_dim components would corrupt distances
    with no error)."""
    import pytest as _pt

    from serverless_data_pipeline_spark.operators.similarity import (
        random_projection,
    )
    df = spark.createDataFrame([(1, [1.0] * 80)],
                               "vec_id long, embedding array<float>")
    with _pt.raises(Exception, match="in_dim|ASSERT"):
        random_projection(df, "embedding", 16, in_dim=64).collect()


def test_hard_negatives_excludes_self_and_positives(spark):
    """Hard-negative laws: the query itself and EVERY listed positive
    are excluded even when a query has many positives (the
    overfetch-free guarantee); exactly k negatives per query ranked by
    cosine; the planted near-duplicate (not listed positive) is the
    rank-1 hard negative; ANN-shortlist + exclusion composition finds
    the same top negative."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.similarity import (
        ann_topk_join, hard_negatives,
    )
    rng = np.random.RandomState(3)
    base = rng.randn(60, 16).astype("float32")
    base[1] = base[0] + 0.01 * rng.randn(16).astype("float32")  # near-dup
    for i in range(2, 8):                 # six positives close to q0
        base[i] = base[0] + 0.05 * rng.randn(16).astype("float32")
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(60)],
        "vec_id long, embedding array<float>")
    queries = corpus.filter("vec_id = 0")
    positives = spark.createDataFrame(
        [(0, i) for i in range(2, 8)], "vec_id long, pos_id long")
    out = hard_negatives(queries, positives, corpus,
                         "vec_id", "embedding", "vec_id", "embedding",
                         k=5, dim=16).collect()
    got = [r.neg_id for r in sorted(out, key=lambda r: r.rank)]
    assert len(got) == 5
    assert 0 not in got and not set(got) & set(range(2, 8))
    assert got[0] == 1                      # the unlisted near-dup wins
    # ANN composition: shortlist via LSH join, same exclusion, same top
    ann = ann_topk_join(
        queries.selectExpr("vec_id as q_id", "embedding as qvec"),
        corpus, "q_id", "qvec", "vec_id", "embedding",
        dim=16, k=10, n_tables=4, n_planes=6, seed=2)
    ann_neg = (ann.filter("neighbor_id != query_id")
               .join(positives.selectExpr("vec_id as query_id",
                                          "pos_id as neighbor_id"),
                     ["query_id", "neighbor_id"], "left_anti")
               .orderBy("cosine", ascending=False).first())
    assert ann_neg.neighbor_id == 1


def test_sign_lsh_plan_laws_and_integration(spark):
    """Planner laws: meets its own recall model; higher targets never
    cost less; easier (higher-cosine) neighbors never cost more;
    unreachable targets raise; and the planned config actually
    achieves the target on a planted-cluster corpus whose true
    neighbors sit at the planned cosine."""
    import numpy as np
    import pytest as _pt

    from serverless_data_pipeline_spark.operators.similarity import (
        ann_topk, brute_force_topk, sign_lsh_plan,
    )
    plan = sign_lsh_plan(0.9, 0.9)
    assert plan["expected_recall"] >= 0.9
    assert (sign_lsh_plan(0.95, 0.9)["cost"]
            >= sign_lsh_plan(0.5, 0.9)["cost"])
    assert (sign_lsh_plan(0.9, 0.99)["cost"]
            <= sign_lsh_plan(0.9, 0.7)["cost"])
    with _pt.raises(ValueError):
        sign_lsh_plan(0.999999, 0.1, max_tables=2, max_multiprobe=0)
    with _pt.raises(ValueError):
        sign_lsh_plan(1.5, 0.9)
    # integration: neighbors at ~cos 0.95; planned config must reach
    # the target recall@10 vs exact on the same corpus
    rng = np.random.RandomState(5)
    center = rng.randn(16).astype("float64")
    center /= np.linalg.norm(center)
    rows = []
    for i in range(40):                      # cluster ~cos 0.95 to center
        # cos = 1/sqrt(1 + sigma^2 * d): sigma=0.08, d=16 -> ~0.95
        v = center + 0.08 * rng.randn(16)
        rows.append((i, [float(x) for x in v]))
    for i in range(40, 400):                 # background noise
        rows.append((i, [float(x) for x in rng.randn(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = sign_lsh_plan(0.9, 0.95, max_tables=8)
    exact = {r.vec_id for r in brute_force_topk(
        df, "vec_id", "embedding", [float(x) for x in center],
        k=10).collect()}
    approx = {r.vec_id for r in ann_topk(
        df, "vec_id", "embedding", [float(x) for x in center], k=10,
        n_tables=p["n_tables"], n_planes=p["n_planes"],
        multiprobe=p["multiprobe"], seed=42).collect()}
    assert len(exact & approx) / len(exact) >= 0.9


def test_committed_pq_artifact_shape_and_margin_floors(spark):
    """r12 (oracling the deterministic ANN tail): the committed PQ/IVF
    artifact has the documented provenance shape, and the float-parity
    safety floors the x4_pq_exact oracle relies on hold over the
    fixture — every argmin/argmax margin and rounding-boundary
    distance is >= 10 orders of magnitude above the ~1e-16
    summation-order divergence between numpy and a sequential SQL
    list_sum, so a cross-engine flip is impossible in practice."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.similarity_artifact import (
        IVF_COMMITTED_CENTROIDS, PQ_COMMITTED_CODEBOOKS, PQ_ORACLE_QUERY,
    )
    assert len(PQ_COMMITTED_CODEBOOKS) == 8
    assert all(len(cb) == 16 for cb in PQ_COMMITTED_CODEBOOKS)
    assert all(len(c) == 8 for cb in PQ_COMMITTED_CODEBOOKS for c in cb)
    assert len(IVF_COMMITTED_CENTROIDS) == 16
    assert all(len(c) == 64 for c in IVF_COMMITTED_CENTROIDS)
    assert PQ_ORACLE_QUERY == [((i * 37) % 29 - 14) / 10.0
                               for i in range(64)]
    cbs = [np.asarray(cb) for cb in PQ_COMMITTED_CODEBOOKS]
    cents = np.asarray(IVF_COMMITTED_CENTROIDS)
    q = np.asarray(PQ_ORACLE_QUERY).reshape(8, 8)
    # pin the floors on EVERY fixture the oracle comparison can run
    # against — sf0.01 is the driver's correctness gate, sf0.1 the
    # bench/sweep tier (the docstring quotes those measured margins)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        X = np.array([r.embedding for r in spark.read.parquet(
            f"/root/testdata/{sf}/embeddings.parquet").collect()],
            dtype=np.float64)
        for j, cb in enumerate(cbs):
            d = (np.einsum("kd,kd->k", cb, cb)
                 - 2.0 * (X[:, j * 8:(j + 1) * 8] @ cb.T))
            s = np.sort(d, axis=1)
            assert (s[:, 1] - s[:, 0]).min() > 1e-9, sf
        sc = (X @ cents.T) / np.linalg.norm(cents, axis=1)
        ss = np.sort(sc, axis=1)
        assert (ss[:, -1] - ss[:, -2]).min() > 1e-9, sf
        codes = np.stack([
            np.argmin(np.einsum("kd,kd->k", cbs[j], cbs[j])
                      - 2.0 * (X[:, j * 8:(j + 1) * 8] @ cbs[j].T),
                      axis=1)
            for j in range(8)], axis=1)
        ip = sum(cbs[j][codes[:, j]] @ q[j] for j in range(8))
        en = sum(np.einsum("kd,kd->k", cbs[j], cbs[j])[codes[:, j]]
                 for j in range(8))
        adc = ip / (np.sqrt(en) * np.linalg.norm(q))
        gaps = np.diff(np.sort(adc))
        assert gaps[gaps > 0].min() > 1e-12, sf
        assert np.abs(adc * 1e6 - np.floor(adc * 1e6)
                      - 0.5).min() > 1e-6, sf


def test_pq_topk_committed_books_match_numpy_replay(spark):
    """The production pq_topk(refine=0) probe over the COMMITTED
    codebooks returns exactly what an independent numpy replay of
    encode + ADC + (round6, id)-ordered top-k says — the same law the
    driver's x4_pq_exact row checks cross-engine, pinned here at
    sf0.001 grain."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.similarity import pq_topk
    from serverless_data_pipeline_spark.operators.similarity_artifact import (
        PQ_COMMITTED_CODEBOOKS, PQ_ORACLE_QUERY,
    )
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    cbs = [np.asarray(cb) for cb in PQ_COMMITTED_CODEBOOKS]
    q = np.asarray(PQ_ORACLE_QUERY).reshape(8, 8)
    codes = np.stack([
        np.argmin(np.einsum("kd,kd->k", cbs[j], cbs[j])
                  - 2.0 * (X[:, j * 8:(j + 1) * 8] @ cbs[j].T), axis=1)
        for j in range(8)], axis=1)
    ip = sum(cbs[j][codes[:, j]] @ q[j] for j in range(8))
    en = sum(np.einsum("kd,kd->k", cbs[j], cbs[j])[codes[:, j]]
             for j in range(8))
    adc = np.round(ip / (np.sqrt(en) * np.linalg.norm(q)), 6)
    want = sorted(zip(-adc, ids))[:10]
    want = [(int(i), float(-a)) for a, i in want]
    got = [(r.vec_id, r.cosine) for r in
           pq_topk(df, "vec_id", "embedding", PQ_ORACLE_QUERY, k=10,
                   codebooks=PQ_COMMITTED_CODEBOOKS, refine=0)
           .collect()]
    assert got == want


def test_committed_pq_codebooks_match_documented_provenance(spark):
    """The artifact IS its provenance (the bpe_artifact discipline):
    re-running the exact documented training call over the sf0.01
    fixture and rounding to 6 decimals reproduces
    PQ_COMMITTED_CODEBOOKS bit-for-bit — the committed literal cannot
    silently drift from the code that claims to have produced it.
    (Pure numpy Lloyd over a deterministic ORDER BY vec_id sample —
    no partitioning sensitivity.)"""
    from serverless_data_pipeline_spark.operators.similarity import (
        train_pq_codebooks,
    )
    from serverless_data_pipeline_spark.operators.similarity_artifact import (
        PQ_COMMITTED_CODEBOOKS,
    )
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    books = train_pq_codebooks(e, "embedding", dim=64, m=8, ksub=16,
                               seed=42, sample_n=2048, id_col="vec_id")
    got = [[[round(float(v), 6) for v in c] for c in cb]
           for cb in books]
    assert got == PQ_COMMITTED_CODEBOOKS


def test_sign_lsh_planner_target_met_on_planted_set(spark):
    """r12 verdict #5: the planner's predicted recall is ACHIEVED on a
    planted neighbor set at the cosine the plan assumed. Deterministic
    end to end (seeded numpy corpus, seeded LSH planes), so this pins
    the planner model against the actual probe path rather than
    sampling noise."""
    import numpy as np

    from serverless_data_pipeline_spark.operators.similarity import (
        ann_topk, brute_force_topk, sign_lsh_plan,
    )
    rng = np.random.default_rng(7)
    dim, cos_t = 64, 0.9
    base = rng.standard_normal((500, dim))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    queries = []
    for qi in range(5):
        v = base[qi] / np.linalg.norm(base[qi])
        queries.append([float(x) for x in base[qi]])
        for j in range(10):
            w = rng.standard_normal(dim)
            w -= (w @ v) * v
            w /= np.linalg.norm(w)
            u = cos_t * v + np.sqrt(1.0 - cos_t * cos_t) * w
            rows.append((1000 + qi * 10 + j, [float(x) for x in u]))
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    plan = sign_lsh_plan(0.85, cos_t)
    assert plan["expected_recall"] >= 0.85
    hit = tot = 0
    for qi, qv in enumerate(queries):
        # k=11 then drop the query's own row: the query vector IS a
        # corpus row here, and counting its trivial self-hit in both
        # sets would inflate achieved recall by ~0.1*(1-r)
        exact = {r[0] for r in brute_force_topk(
            df, "vec_id", "embedding", qv, k=11).collect()} - {qi}
        got = {r[0] for r in ann_topk(
            df, "vec_id", "embedding", qv, k=11,
            n_tables=plan["n_tables"], n_planes=plan["n_planes"],
            multiprobe=plan["multiprobe"], seed=42).collect()} - {qi}
        hit += len(exact & got)
        tot += len(exact)
    achieved = hit / tot
    # 50 planted Bernoulli trials at p = expected_recall: allow one
    # std of sampling slack below the prediction, but never below the
    # user's target minus that same slack
    assert achieved >= plan["expected_recall"] - 0.1, (plan, achieved)
    assert achieved >= 0.85 - 0.1, (plan, achieved)
