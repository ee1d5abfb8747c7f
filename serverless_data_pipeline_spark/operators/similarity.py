"""Similarity search over embedding columns (charter extension X3/X4).

Brute-force exact top-k as the correctness baseline, sign-LSH bucketed ANN
as the scale path, and a grouped (IVF-style) variant that prunes by
centroid assignment.

Two scoring backends, chosen by role:
- X3 brute force stays on the codegen'd SQL fold (functions/vectors) —
  bit-identical to the DuckDB oracle, which is what an *exact* baseline
  must be.
- Candidate generation + verification (LSH buckets, IVF assignment, the
  cosine verify behind a 6dp round) run numpy kernels
  (functions/vectors_np): one BLAS matvec per Arrow batch instead of a
  dim-64 unrolled expression chain per plane/cell, which in round 2 cost
  44-67 s *per query at sf0.01* in Catalyst analysis + interpreted eval.

Scale notes:
- brute_force_topk is scan + TakeOrderedAndProject: O(k) memory per task,
  one pass over the corpus — the right *exact* plan even at 100 TB.
- ann_topk only scores vectors sharing an LSH bucket with the query across
  any of `n_tables` tables: recall tunable via tables × planes.
- ivf_topk models the classic inverted-file index: assign each corpus
  vector to its nearest of `n_cells` centroids at build time (one narrow
  pass), then probe only `n_probe` cells per query.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from serverless_data_pipeline_spark.functions.vectors import (
    cosine_similarity, cosine_similarity_fixed,
)
from serverless_data_pipeline_spark.functions.vectors_np import (
    argmax_cell_udf, pair_cosine_udf, pq_adc_cosine_udf, pq_encode_udf,
    query_cosine_udf, sign_bits, sign_buckets_udf,
)
from serverless_data_pipeline_spark.operators.util import spread_small_input

__all__ = ["brute_force_topk", "brute_force_topk_join", "ann_topk",
           "ann_topk_join", "ann_topk_indexed", "ivf_topk",
           "assign_ivf_cells", "ivf_topk_indexed",
           "train_ivf_centroids", "add_sign_lsh_buckets", "group_centroids",
           "train_pq_codebooks", "pq_encode", "pq_topk",
           "build_ivfpq_index", "ivfpq_topk",
           "achlioptas_matrix", "random_projection", "projection_exprs",
           "cluster_balanced_sample", "cell_score_exprs",
           "hard_negatives", "scored_pairs", "sign_lsh_plan"]


def _lit_vec(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def _np_cosine(vec_col: str, query_vec: list[float]):
    """Numpy cosine vs a constant query, NaN (zero-norm rows) mapped to
    NULL so descending sorts behave (Spark ranks NaN above all doubles)."""
    score = query_cosine_udf(query_vec)(F.col(vec_col))
    return F.nanvl(score, F.lit(None).cast("double"))


def brute_force_topk(corpus: DataFrame, id_col: str, vec_col: str,
                     query_vec: list[float], k: int = 10) -> DataFrame:
    """X3 — exact cosine top-k for one query vector (ties broken by id
    for determinism). SQL-fold scoring: bit-identical to the oracle."""
    scored = corpus.select(
        F.col(id_col),
        F.round(cosine_similarity_fixed(F.col(vec_col), _lit_vec(query_vec),
                                        len(query_vec)), 6)
         .alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def scored_pairs(queries: DataFrame, corpus: DataFrame,
                 q_id: str, q_vec: str, c_id: str, c_vec: str,
                 dim: int | None = None,
                 out_id: str = "neighbor_id") -> DataFrame:
    """The shared exact scoring pass behind brute_force_topk_join AND
    hard_negatives (and any other every-query-vs-corpus consumer):
    broadcast the (small) query set against the corpus scan, round-6
    cosine per (query, corpus) pair. One corpus pass regardless of
    |queries|; factored so the scoring semantics (fixed-dim fold,
    rounding, NULL norms) can never diverge between consumers."""
    q = F.broadcast(queries.select(F.col(q_id).alias("query_id"),
                                   F.col(q_vec).alias("__qv")))
    return (spread_small_input(corpus)
            .select(F.col(c_id).alias(out_id),
                    F.col(c_vec).alias("__cv"))
            .crossJoin(q)
            .select("query_id", out_id,
                    F.round(cosine_similarity_fixed("__cv", "__qv", dim)
                            if dim else
                            cosine_similarity("__cv", "__qv"), 6)
                     .alias("cosine")))


def brute_force_topk_join(queries: DataFrame, corpus: DataFrame,
                          q_id: str, q_vec: str, c_id: str, c_vec: str,
                          k: int = 10, dim: int | None = None) -> DataFrame:
    """X3 batch form — exact top-k neighbors for EVERY query row.
    Broadcast the (small) query set against the corpus scan, score
    (``scored_pairs``), then per-query top-k via window."""
    scored = scored_pairs(queries, corpus, q_id, q_vec, c_id, c_vec, dim)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k).drop("rnk"))


def _plane_sets(dim: int, n_tables: int, n_planes: int, seed: int):
    rng = random.Random(seed)
    return [[[rng.gauss(0.0, 1.0) for _ in range(dim)]
             for _ in range(n_planes)] for _ in range(n_tables)]


def _probe_buckets(qbucket: int, n_planes: int, multiprobe: int) -> list[int]:
    """Multiprobe bucket set for one table (Lv et al., "Multi-Probe LSH",
    VLDB'07 — the standard recall-per-table multiplier): the query's own
    bucket plus every bucket within Hamming distance `multiprobe` of it.
    A true neighbor that lands one sign-bit away from the query (the
    dominant miss mode: one near-orthogonal plane flips) is then still
    probed, at zero extra index storage — the trade is candidate volume,
    1 + sum_d C(n_planes, d) buckets per table instead of 1."""
    from itertools import combinations

    probes = [qbucket]
    for d in range(1, min(multiprobe, n_planes) + 1):
        for bits in combinations(range(n_planes), d):
            b = qbucket
            for i in bits:
                b ^= (1 << i)
            probes.append(b)
    return probes


def add_sign_lsh_buckets(df: DataFrame, vec_col: str, dim: int,
                         n_tables: int = 4, n_planes: int = 8,
                         seed: int = 42,
                         prefix: str = "lsh") -> DataFrame:
    """Index build for the 100 TB ANN path: materialize one sign-LSH
    bucket column per table (``lsh_0..lsh_{n-1}``). Write the result
    partitioned/bucketed by these columns once; every subsequent query is
    then a partition-prunable equi-filter instead of recomputing
    projections per scan. One narrow pass, no shuffle; ALL tables' bucket
    ids come from a single stacked matmul per Arrow batch."""
    tables = _plane_sets(dim, n_tables, n_planes, seed)
    bkts = sign_buckets_udf(tables, dim)(F.col(vec_col)).alias("__bkts")
    out = df.withColumn("__bkts", bkts)
    for t in range(n_tables):
        out = out.withColumn(f"{prefix}_{t}", F.element_at("__bkts", t + 1))
    return out.drop("__bkts")


def ann_topk(corpus: DataFrame, id_col: str, vec_col: str,
             query_vec: list[float], k: int = 10,
             n_tables: int = 4, n_planes: int = 8,
             seed: int = 42, multiprobe: int = 1) -> DataFrame:
    """X4 — approximate top-k: score only corpus vectors that collide with
    the query in >= 1 of `n_tables` sign-LSH tables, probing each table
    multiprobe-style (the query bucket + every bucket within `multiprobe`
    bit flips — see _probe_buckets; 0 restores exact-bucket probing).
    Inline mode computes bucket ids per scan (one stacked matmul per
    Arrow batch); at scale persist them once via add_sign_lsh_buckets and
    use ann_topk_indexed.

    Regime caveat (measured, scripts/ann_recall.py, sf0.1 random 64-dim
    fixture — true neighbors at cos ~0.35, ANN's adversarial case):
    sign-LSH collision probability per table is (1 - theta/pi)^n_planes,
    so exact-bucket recall is high only when true neighbors are
    high-cosine (near-dup regime, ~0.9+). Measured recall@10 at 2x8:
    0.14 exact-bucket, 0.30 at multiprobe=1 (9 buckets/table), 0.64 at
    multiprobe=2 (37), 0.88 at multiprobe=3 (93) — each step trades
    candidate volume (still a tiny corpus fraction) for recall at zero
    index storage. The registry row runs multiprobe=2. For exhaustive
    mid-cosine search use brute_force_topk (one scan, O(k)/task) or
    ivf_topk."""
    dim = len(query_vec)
    tables = _plane_sets(dim, n_tables, n_planes, seed)
    qbuckets = [sign_bits(query_vec, planes) for planes in tables]
    with_b = corpus.withColumn(
        "__bkts", sign_buckets_udf(tables, dim)(F.col(vec_col)))
    cond = None
    for t, qb in enumerate(qbuckets):
        probes = _probe_buckets(qb, n_planes, multiprobe)
        c = F.element_at("__bkts", t + 1).isin(probes)
        cond = c if cond is None else (cond | c)
    scored = (with_b.filter(cond)
              .select(F.col(id_col),
                      F.round(_np_cosine(vec_col, query_vec), 6)
                       .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ann_topk_join(queries: DataFrame, corpus: DataFrame,
                  q_id: str, q_vec: str, c_id: str, c_vec: str,
                  dim: int, k: int = 10,
                  n_tables: int = 4, n_planes: int = 8,
                  seed: int = 42, multiprobe: int = 1) -> DataFrame:
    """X4 batch form — approximate top-k for EVERY query row. The scale
    path when the query set is itself too large to broadcast-cross-join
    (brute_force_topk_join): bucket BOTH sides with the same sign-LSH
    plane tables, explode each side to (table, bucket) keys, and
    equi-join — a shuffled hash join whose only pairs are same-bucket
    collisions, never |Q| x |C|. Candidates dedupe (a pair can collide in
    several tables) before one pairwise numpy-cosine verification, then
    per-query top-k via window. Shuffles: the bucket join + the top-k
    window; both keyed, both AQE-skew-splittable. Multiprobe expands the
    QUERY side only (each query row emits its bucket + `multiprobe`-bit
    flips per table, XOR'd executor-side) — the corpus index stays one
    row per (vector, table), so the recall lift costs query-side fan-out
    (tiny: |Q| x tables x probes), never index size. Same recall regime
    as ann_topk (tables x planes x multiprobe tunes it)."""
    def _exploded(df, id_in, vec_in, id_out, vec_out, probe: bool):
        b = add_sign_lsh_buckets(df, vec_in, dim, n_tables, n_planes, seed)
        # XOR masks: _probe_buckets of the zero bucket IS the mask set
        # (leading 0 = the un-flipped bucket itself).
        masks = _probe_buckets(0, n_planes, multiprobe) if probe else [0]
        pairs = F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     (F.col(f"lsh_{t}").bitwiseXOR(F.lit(m))).alias("bkt"))
            for t in range(n_tables) for m in masks])
        return (b.select(F.col(id_in).alias(id_out),
                         F.col(vec_in).alias(vec_out),
                         F.explode(pairs).alias("__tb"))
                 .select(id_out, vec_out,
                         F.col("__tb.tbl").alias("__tbl"),
                         F.col("__tb.bkt").alias("__bkt")))

    qx = _exploded(queries, q_id, q_vec, "query_id", "__qv", True)
    cx = _exploded(corpus, c_id, c_vec, "neighbor_id", "__cv", False)
    cand = (qx.join(cx, ["__tbl", "__bkt"])
              .dropDuplicates(["query_id", "neighbor_id"]))
    score = pair_cosine_udf(dim)(F.col("__qv"), F.col("__cv"))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(F.nanvl(score, F.lit(None).cast("double")), 6)
         .alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("__rnk", F.row_number().over(w))
            .filter(F.col("__rnk") <= k).drop("__rnk"))


def ann_topk_indexed(corpus: DataFrame, id_col: str, vec_col: str,
                     query_vec: list[float], k: int = 10,
                     n_tables: int = 4, n_planes: int = 8,
                     seed: int = 42, prefix: str = "lsh",
                     multiprobe: int = 1) -> DataFrame:
    """X4 probe over a bucket-indexed corpus (see add_sign_lsh_buckets):
    the query's probe buckets per table (own bucket + `multiprobe`-bit
    flips, same recall lift as ann_topk) are computed driver-side and
    each table probes as its own IN-filtered scan; the per-table
    candidate sets union and dedupe by id before scoring.

    The union-of-scans structure is the point (fixed r6, plan-asserted):
    the natural single-scan form `(lsh_0 IN ...) OR (lsh_1 IN ...)` is a
    DISJUNCTION across columns, which Spark can push neither to
    PartitionFilters nor to PushedFilters — the "index" probe was
    silently a full scan. A per-table conjunctive IN prunes: write the
    index partitioned by `lsh_0` and arm 0 reads only its probed bucket
    directories (at 100 TB, store one copy per table partitioned by
    that table's bucket — T small copies of (id, vec, bucket) — and
    every arm prunes). The dedup is a shuffle on the candidate set only
    (bucket contents, tiny by construction)."""
    dim = len(query_vec)
    tables = _plane_sets(dim, n_tables, n_planes, seed)
    cand = None
    for t, planes in enumerate(tables):
        probes = _probe_buckets(sign_bits(query_vec, planes), n_planes,
                                multiprobe)
        arm = corpus.filter(F.col(f"{prefix}_{t}").isin(probes))
        cand = arm if cand is None else cand.unionAll(arm)
    scored = (cand.dropDuplicates([id_col])
              .select(F.col(id_col),
                      F.round(_np_cosine(vec_col, query_vec), 6)
                       .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def group_centroids(df: DataFrame, group_col: str, vec_col: str,
                    dim: int) -> DataFrame:
    """Per-group mean embedding via plain grouped-map ``applyInPandas`` —
    the UDAF/UDTF extension shape of SURVEY §2.9 (the Lambda-body
    analogue for grouped aggregation, py:226-309): one shuffle on the
    group key, then one numpy mean per Arrow-delivered group, no per-row
    Python. The built-in alternative (explode to (pos, val) + groupBy
    avg + re-collect) costs an explode ×dim blow-up and two shuffles;
    the grouped-map kernel does it in one. Returns (group, centroid
    array<double>)."""
    import numpy as np
    import pandas as pd

    def _agg(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        return pd.DataFrame({group_col: [key[0]],
                             "centroid": [m.mean(axis=0).tolist()]})

    schema = f"{group_col} string, centroid array<double>"
    return df.groupBy(group_col).applyInPandas(_agg, schema)


def train_ivf_centroids(corpus: DataFrame, vec_col: str,
                        n_cells: int = 16, seed: int = 42,
                        max_iter: int = 10,
                        sample_fraction: float | None = None) -> list[list[float]]:
    """Train a real IVF codebook with MLlib k-means (the offline
    index-build step ivf_topk's docstring promises). At 100 TB train on a
    sample (`sample_fraction`) — k-means quality saturates long before
    full-data scans pay off. Returns plain Python centroids so the probe
    stays executor-side (no MLlib at query time)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = corpus.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("features"))
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(df)
    return [list(map(float, c)) for c in model.clusterCenters()]


def train_pq_codebooks(corpus: DataFrame, vec_col: str, dim: int,
                       m: int = 8, ksub: int = 16, seed: int = 42,
                       sample_n: int = 4096, max_iter: int = 12,
                       id_col: str | None = None) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. TPAMI'11): one
    ksub-centroid k-means per contiguous dim/m subspace, driver-side
    numpy Lloyd on a deterministic bounded sample (first `sample_n` rows
    ordered by `id_col` — PQ codebook quality saturates on thousands of
    samples; at 100 TB you train on a sample regardless, never the
    corpus). `id_col` defaults to the first non-vector column and should
    be unique for a total order (ADVICE r4: an arbitrary non-unique
    first column made limit(sample_n) run-dependent); raises if the
    frame has no candidate ordering column at all. Returns plain Python
    nested lists so encode/probe stay executor-side constants, same
    contract as train_ivf_centroids."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if id_col is None:
        non_vec = [c for c in corpus.columns if c != vec_col]
        if not non_vec:
            raise ValueError(
                "train_pq_codebooks needs id_col (or any non-vector "
                "column) to define a deterministic sample order; the "
                "input frame has only the vector column")
        id_col = non_vec[0]
    rows = (corpus.select(F.col(vec_col).alias("v"), F.col(id_col))
            .orderBy(F.col(id_col)))
    sample = np.array([r.v for r in rows.limit(sample_n).collect()],
                      dtype=np.float64)
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        x = sample[:, j * dsub:(j + 1) * dsub]
        k = min(ksub, len(x))
        cents = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(max_iter):
            d = (np.einsum("kd,kd->k", cents, cents)
                 - 2.0 * (x @ cents.T))
            assign = np.argmin(d, axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(axis=0)
        books.append(cents.tolist())
    return books


def pq_encode(corpus: DataFrame, vec_col: str,
              codebooks: list[list[list[float]]], dim: int,
              out_col: str = "pq_code") -> DataFrame:
    """Index build for the PQ path: materialize the m-byte code per
    vector (one narrow pass, no shuffle). Persist (id, pq_code) WITHOUT
    the raw embedding and the probe-time index is ~m bytes/vector — the
    compression that makes billion-vector ANN fit hot storage."""
    return corpus.withColumn(
        out_col, pq_encode_udf(codebooks, dim)(F.col(vec_col)))


def pq_topk(corpus: DataFrame, id_col: str, vec_col: str,
            query_vec: list[float], k: int = 10,
            codebooks: list[list[list[float]]] | None = None,
            m: int = 8, ksub: int = 16, seed: int = 42,
            refine: int = 0, code_col: str | None = None) -> DataFrame:
    """X4 (PQ flavour) — top-k by asymmetric-distance cosine over PQ
    codes. Probe cost is two lookup-table gathers per corpus row (the
    raw vectors are never read when `code_col` points at a materialized
    pq_encode index), then one TakeOrderedAndProject.

    `refine` > 0 re-scores the top `refine` ADC candidates with exact
    cosine on the raw vectors (the standard re-rank step): candidate
    selection stays code-only, exactness returns on a k-sized shortlist.
    Returns (id, cosine) — ADC estimate when refine=0, exact cosine on
    the refined shortlist otherwise."""
    dim = len(query_vec)
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, vec_col, dim, m=m,
                                       ksub=ksub, seed=seed)
    codes = (corpus if code_col else
             pq_encode(corpus, vec_col, codebooks, dim))
    code = F.col(code_col) if code_col else F.col("pq_code")
    adc = pq_adc_cosine_udf(codebooks, query_vec)(code)
    # Select the raw vector only when the re-rank needs it: a codes-only
    # index frame (id, pq_code) — the documented persistence shape — has
    # no vec_col, and refine=0 must probe it without an AnalysisException
    # (ADVICE r4).
    if refine and vec_col not in codes.columns:
        raise ValueError(
            f"pq_topk(refine={refine}) needs the raw vector column "
            f"{vec_col!r} for the exact re-rank, but the input frame has "
            f"only {codes.columns} — probe codes-only frames with "
            "refine=0, or join the vectors back")
    cols = ([F.col(id_col), F.col(vec_col)] if refine
            else [F.col(id_col)])
    scored = codes.select(
        *cols, F.nanvl(adc, F.lit(None).cast("double")).alias("__adc"))
    if not refine:
        return (scored
                .select(F.col(id_col),
                        F.round("__adc", 6).alias("cosine"))
                .orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k))
    shortlist = (scored.orderBy(F.col("__adc").desc(), F.col(id_col))
                 .limit(max(refine, k)))
    return (shortlist
            .select(F.col(id_col),
                    F.round(_np_cosine(vec_col, query_vec), 6)
                     .alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k))


def assign_ivf_cells(df: DataFrame, vec_col: str,
                     centroids: list[list[float]], dim: int,
                     out_col: str = "ivf_cell") -> DataFrame:
    """Index build for the IVF path: materialize each vector's nearest-
    centroid cell id (one narrow Arrow-matmul pass, no shuffle). Write
    the result partitioned by `out_col` ONCE and every probe is a
    partition-prunable single-column IN filter (ivf_topk_indexed) — the
    inverted-file layout: a probe reads n_probe/n_cells of the corpus
    from disk, not all of it. Same assignment kernel as ivf_topk's
    inline mode, so indexed == inline results (pytest-pinned)."""
    return df.withColumn(
        out_col,
        argmax_cell_udf([list(map(float, c)) for c in centroids], dim)(
            F.col(vec_col)))


def _probe_cells(query_vec: list[float], cents: list[list[float]],
                 n_probe: int) -> list[int]:
    """The n_probe nearest cells to the query by cosine (driver-side —
    the codebook is a small constant)."""
    qnorm = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    qsims = []
    for ci, c in enumerate(cents):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        qsims.append((sum(a * b for a, b in zip(query_vec, c))
                      / (qnorm * cn), -ci))
    return [-nci for _, nci in sorted(qsims, reverse=True)[:n_probe]]


def ivf_topk_indexed(corpus: DataFrame, id_col: str, vec_col: str,
                     query_vec: list[float], k: int = 10,
                     n_probe: int = 4,
                     centroids: list[list[float]] | None = None,
                     cell_col: str = "ivf_cell") -> DataFrame:
    """X4 probe over a cell-indexed corpus (see assign_ivf_cells): the
    query's n_probe nearest cells are computed driver-side and the probe
    is ONE conjunctive IN filter on the materialized cell column —
    unlike the multi-table LSH probe (which needs a union of per-table
    scans to prune), a single-codebook IVF probe prunes directly, so an
    index written `partitionBy(cell_col)` serves each query from
    n_probe directories."""
    if centroids is None:
        raise ValueError("ivf_topk_indexed needs the trained `centroids` "
                         "the index was built with (train_ivf_centroids)")
    probe = _probe_cells(query_vec, centroids, n_probe)
    scored = (corpus.filter(F.col(cell_col).isin(probe))
              .select(F.col(id_col),
                      F.round(_np_cosine(vec_col, query_vec), 6)
                       .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def ivf_topk(corpus: DataFrame, id_col: str, vec_col: str,
             query_vec: list[float], k: int = 10,
             n_cells: int = 16, n_probe: int = 4,
             seed: int = 42,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """X4 (IVF flavour) — pass `centroids` from train_ivf_centroids for a
    real trained codebook; without it, seeded random centroids stand in
    (demo mode). Each corpus row is assigned its argmax-cosine centroid
    (numpy kernel, one matmul per Arrow batch; ties break to the LOWEST
    cell index, all-zero vectors deterministically to cell 0); queries
    probe the n_probe nearest cells. Assignment is one narrow pass; the
    probe is a partition-prunable filter when the assignment is
    materialized as a partition column."""
    dim = len(query_vec)
    if centroids is not None:
        cents = centroids
        n_cells = len(cents)
    else:
        rng = random.Random(seed)
        cents = [[rng.gauss(0.0, 1.0) for _ in range(dim)]
                 for _ in range(n_cells)]

    assigned = corpus.select(
        F.col(id_col), F.col(vec_col),
        argmax_cell_udf(cents, dim)(F.col(vec_col)).alias("__cell"))
    probe = _probe_cells(query_vec, cents, n_probe)

    scored = (assigned.filter(F.col("__cell").isin(probe))
              .select(F.col(id_col),
                      F.round(_np_cosine(vec_col, query_vec), 6)
                       .alias("cosine")))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def build_ivfpq_index(corpus: DataFrame, id_col: str, vec_col: str,
                      dim: int, *, centroids: list[list[float]],
                      codebooks: list[list[list[float]]],
                      cell_col: str = "ivf_cell",
                      code_col: str = "pq_code") -> DataFrame:
    """X4 composed index build — the IVF-PQ (FAISS IVFADC-family) layout:
    every vector gets its nearest-centroid CELL id (the inverted-file
    coarse quantizer, assign_ivf_cells) and its m-byte PQ CODE
    (pq_encode), and the returned frame is CODES-ONLY (id, cell, code) —
    the raw embedding is deliberately dropped, so persisting this frame
    ``partitionBy(cell_col)`` gives the billion-scale shape: ~m bytes +
    one int per vector in hot storage, probes that read n_probe/n_cells
    of THAT, and raw vectors touched only by the final re-rank
    (ivfpq_topk). Both assignments are one narrow Arrow-matmul pass
    each, no shuffle.

    Quantization is GLOBAL (codes encode the raw vector), not per-cell
    residual: FAISS's IVFPQ(by_residual=False) / ScaNN-style layout. The
    residual variant re-centers codes per cell for tighter quantization
    error, but its query LUTs must be rebuilt PER PROBED CELL (n_probe x
    m x ksub dot products per query) and codes can't be compared across
    cells; the global variant computes ONE LUT per query and keeps the
    ADC column expression cell-independent — the right trade here, where
    the exact re-rank (not ADC precision) sets final quality."""
    assigned = assign_ivf_cells(corpus, vec_col, centroids, dim,
                                out_col=cell_col)
    return (pq_encode(assigned, vec_col, codebooks, dim, out_col=code_col)
            .select(F.col(id_col), F.col(cell_col), F.col(code_col)))


def ivfpq_topk(index: DataFrame, vectors: DataFrame | None,
               id_col: str, vec_col: str, query_vec: list[float],
               k: int = 10, *, centroids: list[list[float]],
               codebooks: list[list[list[float]]], n_probe: int = 4,
               refine: int = 50, cell_col: str = "ivf_cell",
               code_col: str = "pq_code") -> DataFrame:
    """X4 composed probe over a build_ivfpq_index frame — the full IVFADC
    query path (Jégou et al. TPAMI'11): (1) the query's n_probe nearest
    cells are picked driver-side against the small centroid codebook;
    (2) the CODES-ONLY index is filtered to those cells (a single-column
    IN — partition-prunable, plan-asserted in tests) and scored by
    asymmetric-distance cosine, two LUT gathers per row, raw vectors
    never read; (3) the top-`refine` ADC shortlist is re-ranked with
    exact cosine by joining ONLY those ids back to the raw `vectors`
    frame (a broadcast semi-join of a k-sized id list — with vectors
    clustered/bloom-indexed on id, point-lookup cheap at any scale).
    ``refine=0`` skips (3) and returns ADC estimates (``vectors`` may be
    None). Returns (id, cosine)."""
    probe = _probe_cells(query_vec, centroids, n_probe)
    cand = index.filter(F.col(cell_col).isin(probe))
    adc = pq_adc_cosine_udf(codebooks, query_vec)(F.col(code_col))
    scored = cand.select(
        F.col(id_col), F.nanvl(adc, F.lit(None).cast("double"))
        .alias("__adc"))
    if not refine:
        return (scored.select(F.col(id_col),
                              F.round("__adc", 6).alias("cosine"))
                .orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k))
    if vectors is None:
        raise ValueError("ivfpq_topk(refine>0) needs the raw `vectors` "
                         "frame for the exact re-rank — pass refine=0 "
                         "for a codes-only ADC probe")
    shortlist = (scored.orderBy(F.col("__adc").desc(), F.col(id_col))
                 .limit(max(refine, k)).select(id_col))
    rer = (vectors.select(F.col(id_col), F.col(vec_col))
           .join(F.broadcast(shortlist), id_col, "left_semi"))
    return (rer.select(F.col(id_col),
                       F.round(_np_cosine(vec_col, query_vec), 6)
                        .alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k))


def achlioptas_matrix(in_dim: int, out_dim: int,
                      seed: int = 1234) -> list[list[int]]:
    """The committed sparse Johnson-Lindenstrauss projection matrix
    (Achlioptas 2003, "Database-friendly random projections"): entries
    s_ij in {+1, 0, -1} with probabilities {1/6, 2/3, 1/6}, derived
    deterministically from md5(seed:i:j) — the same constant is
    reproducible anywhere (Python, SQL generation, a future reader),
    no RNG state involved. The 1/sqrt? scaling sqrt(3/out_dim) is
    applied by the projection, not stored here."""
    import hashlib
    mat = []
    for i in range(in_dim):
        row = []
        for j in range(out_dim):
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()[:8],
                "big")
            r = h % 6
            row.append(1 if r == 0 else (-1 if r == 1 else 0))
        mat.append(row)
    return mat


def random_projection(df: DataFrame, vec_col: str, out_dim: int, *,
                      in_dim: int = 64, seed: int = 1234,
                      out_col: str = "proj") -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with the sparse
    Achlioptas matrix: proj_j = sqrt(3/out_dim) * Σ_i s_ij * v_i, with
    s in {+1,0,-1}. Pairwise distances/inner products are preserved to
    ~1/sqrt(out_dim) relative error — the standard pre-step before ANN
    indexing when the raw embedding dim makes bucket/codebook work
    expensive (project 1024 -> 64, index the projections, re-rank the
    shortlist on raw vectors).

    Exact cross-engine determinism: v quantizes to micro-unit BIGINTs
    (round half-up), the signed sum is pure integer arithmetic (order-
    free), and only the final scale is one float expression — so the
    projection is value-checkable, not approximately-checkable. The
    whole thing is ONE generated SQL projection (no Python in the row
    path, no shuffle, plan stays whole-stage-codegen; the expression
    is built as an `F.expr` string — ~out_dim*in_dim/3 integer adds —
    rather than a driver-side Column tree)."""
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    comps = projection_exprs(out_dim, in_dim=in_dim, seed=seed,
                             elem_fmt="element_at(__rpv, {i})")
    # guard (folded into component 0 so column pruning can't drop it):
    # a vector LONGER than in_dim would otherwise silently project only
    # its first in_dim components — garbage with no error; shorter
    # vectors already throw under ANSI element_at; a NULL vector passes
    # through as NULL components (never aborts the scan). assert_true
    # raises row-side; on valid data the branch is a no-op.
    comps[0] = (f"CASE WHEN __rpv IS NULL THEN CAST(NULL AS DOUBLE) "
                f"WHEN size(__rpv) = {in_dim} THEN {comps[0]} "
                f"ELSE CAST(assert_true(false, 'random_projection: "
                f"vector length <> in_dim={in_dim}') AS DOUBLE) END")
    return (df.withColumn("__rpv", F.expr(
                f"transform({vec_col}, x -> "
                "CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"))
            .withColumn(out_col, F.expr("array(" + ", ".join(comps) + ")"))
            .drop("__rpv"))


def projection_exprs(out_dim: int, *, in_dim: int = 64, seed: int = 1234,
                     elem_fmt: str) -> list[str]:
    """The shared per-component expression generator behind
    random_projection AND its DuckDB oracle (the cell_score_exprs
    discipline): signed micro-unit integer sums over the
    achlioptas_matrix constant, one repr()-injected sqrt(3/k) float
    step — generate both engines' SQL from here and the values agree
    exactly by construction."""
    mat = achlioptas_matrix(in_dim, out_dim, seed)
    c = math.sqrt(3.0 / out_dim)
    comps = []
    for j in range(out_dim):
        terms = []
        for i in range(in_dim):
            if mat[i][j] == 1:
                terms.append("+ " + elem_fmt.format(i=i + 1))
            elif mat[i][j] == -1:
                terms.append("- " + elem_fmt.format(i=i + 1))
        s = " ".join(terms).lstrip("+ ") if terms else "CAST(0 AS BIGINT)"
        comps.append(f"CAST(ROUND({c!r} * CAST(({s}) AS DOUBLE) "
                     f"/ 1000000.0, 6) AS DOUBLE)")
    return comps



def cell_score_exprs(centroids: list[list[float]],
                     elem_fmt: str) -> list[str]:
    """The shared score-expression generator behind
    cluster_balanced_sample AND its DuckDB oracle: per centroid, the
    integer micro-unit dot product over ``elem_fmt``-rendered vector
    elements (1-based {i}), scaled and norm-divided in ONE float
    expression with repr()-injected literals — generate both engines'
    SQL from here and the values agree exactly by construction."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    qc = [[int(round(x * 1e6)) for x in c] for c in centroids]
    norms = [math.sqrt(sum((v / 1e6) ** 2 for v in c)) for c in qc]
    if any(n == 0.0 for n in norms):
        raise ValueError("zero-norm centroid")
    out = []
    for c, n in zip(qc, norms):
        terms = [f"({c[i]} * {elem_fmt.format(i=i + 1)})"
                 for i in range(len(c)) if c[i] != 0]
        s = " + ".join(terms) if terms else "CAST(0 AS BIGINT)"
        out.append(f"CAST(ROUND(CAST(({s}) AS DOUBLE) "
                   f"/ 1000000000000.0 / {n!r}, 6) AS DOUBLE)")
    return out


def cluster_balanced_sample(df: DataFrame, id_col: str, vec_col: str,
                            centroids: list[list[float]],
                            per_cluster: int, *,
                            cell_col: str = "cell",
                            score_col: str = "cell_score",
                            flag_col: str = "sampled") -> DataFrame:
    """Cluster-balanced (diversity-aware) corpus sampling — the
    DataComp / SemDeDup-adjacent selection step: assign each vector to
    its most-similar FIXED centroid, then keep a deterministic quota
    of ``per_cluster`` rows per cell (md5-of-id ranked, the corpus_mix
    discipline) so the sample covers every region of embedding space
    instead of oversampling the dense head. Returns ``df`` + cell id
    + the (round-6) winning score + the ``sampled`` flag — flags,
    not drops. The score is the scalar projection v·c/|c| (cosine
    × |v|): |v| is constant across cells for a row, so the argmax
    is the cosine argmax without paying a per-row sqrt.

    Centroids are plan constants (committed, seed-derived, or exported
    from a trained k-means run — `train_ivf_centroids` output works).
    Assignment is integer-exact: vectors and centroids both quantize
    to micro-units, per-cell scores are pure integer dot products with
    only ONE float expression (scale + centroid-norm divide, literals
    injected via repr) — so the whole decision is value-checkable
    cross-engine. Ties go to the lower cell index.

    Scale shape: scoring is a narrow generated-SQL projection (no
    Python, no join); the quota is one window shuffle keyed on the
    cell id — with few cells, salt or pre-aggregate per-cell counts
    at extreme scale (same caveat corpus_mix documents)."""
    if per_cluster < 1:
        raise ValueError("per_cluster must be >= 1")
    scores = cell_score_exprs(centroids, "element_at(__cbv, {i})")
    ranked = ("array_sort(array(" + ", ".join(
        f"struct(-{sc} AS s, {k} AS k)" for k, sc in enumerate(scores))
        + "))[0]")
    out = (df.withColumn("__cbv", F.expr(
               f"transform({vec_col}, x -> "
               "CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"))
           .withColumn(cell_col, F.expr(f"{ranked}.k"))
           .withColumn(score_col, F.expr(f"-({ranked}.s)"))
           .drop("__cbv"))
    w = (Window.partitionBy(cell_col)
         .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)))
    return out.withColumn(
        flag_col, F.row_number().over(w) <= F.lit(per_cluster))


def hard_negatives(queries: DataFrame, positives: DataFrame,
                   corpus: DataFrame, q_id: str, q_vec: str,
                   c_id: str, c_vec: str, *, k: int = 5,
                   dim: int | None = None) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training data:
    for each (query, positive-set) pair, the top-``k`` most-similar
    corpus items that are NOT the query itself and NOT one of its
    positives — the negatives that actually move an embedding model,
    vs. random negatives a trained model already separates.

    ``positives`` is (q_id, pos_id) — multiple rows per query allowed.
    Returns (query_id, neg_id, cosine, rank), rank 1..k per query,
    ties broken by id. Exact (one corpus scan, the X3 discipline):
    score everything, anti-join the exclusions, ONE per-query top-k
    window — never an overfetch-then-refilter heuristic that can come
    up short when a query has many positives. At billion scale swap
    the scorer for the ANN shortlist (``ann_topk_join`` + the same
    exclusion anti-join) and re-rank exactly — the composition is
    pytest-pinned."""
    scored = scored_pairs(queries, corpus, q_id, q_vec, c_id, c_vec,
                          dim, out_id="neg_id")
    excl = positives.select(F.col(q_id).alias("query_id"),
                            F.col("pos_id").alias("neg_id"))
    cand = (scored.filter(F.col("query_id") != F.col("neg_id"))
            .join(F.broadcast(excl), ["query_id", "neg_id"], "left_anti"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neg_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def sign_lsh_plan(target_recall: float, cos_sim: float, *,
                  max_tables: int = 16, planes_range: tuple[int, int] = (4, 16),
                  max_multiprobe: int = 3) -> dict:
    """Parameter planner for the sign-LSH index (the cosine-side
    sibling of ``lsh_plan``'s MinHash S-curve): given the cosine of
    the neighbors you must find and a target recall, choose
    (n_tables, n_planes, multiprobe) minimizing probe cost.

    Model (Charikar 2002 + Lv et al. 2007): a plane separates two
    vectors at angle θ with probability q = θ/π, so the query and a
    true neighbor land within Hamming distance d of each other in one
    table with probability C(P,d)·q^d·(1-q)^(P-d). Multiprobe m covers
    all buckets within m flips, one table hits with
    p₁ = Σ_{d≤m} C(P,d) q^d (1-q)^(P-d), and T independent tables give
    recall 1-(1-p₁)^T. Probe cost is modeled as
    T · Σ_{d≤m} C(P,d) / 2^P — the expected fraction of the corpus
    scored (buckets probed × bucket occupancy). Driver-side closed
    form, no data touched; feed the result to add_sign_lsh_buckets /
    ann_topk. Returns {n_tables, n_planes, multiprobe,
    expected_recall, cost} or raises if unreachable within bounds."""
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1)")
    if not -1.0 <= cos_sim <= 1.0:
        raise ValueError("cos_sim must be in [-1, 1]")
    q = math.acos(max(-1.0, min(1.0, cos_sim))) / math.pi
    best = None
    for planes in range(planes_range[0], planes_range[1] + 1):
        for m in range(0, max_multiprobe + 1):
            p1 = sum(math.comb(planes, d) * q ** d * (1 - q) ** (planes - d)
                     for d in range(0, m + 1))
            if p1 <= 0.0:
                continue
            if p1 >= 1.0:
                tables = 1
            else:
                tables = math.ceil(math.log(1.0 - target_recall)
                                   / math.log(1.0 - p1))
            if tables > max_tables:
                continue
            cost = (tables
                    * sum(math.comb(planes, d) for d in range(0, m + 1))
                    / 2.0 ** planes)
            recall = 1.0 - (1.0 - p1) ** tables
            cand = {"n_tables": tables, "n_planes": planes,
                    "multiprobe": m, "expected_recall": round(recall, 4),
                    "cost": cost}
            if best is None or cand["cost"] < best["cost"]:
                best = cand
    if best is None:
        raise ValueError(
            f"target recall {target_recall} at cos {cos_sim} is not "
            f"reachable within max_tables={max_tables}, "
            f"planes {planes_range}, multiprobe<={max_multiprobe} — "
            "relax the bounds or lower the target")
    return best
