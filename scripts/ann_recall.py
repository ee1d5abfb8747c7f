"""Recall@k report for every ANN shape vs exact brute force, on the real
embeddings fixture at $SPARK_GRAFT_SF_DIR (default sf0.1).

The pytest recall floors (tests/test_similarity.py) gate regressions at
>= 0.8 on tiny planted sets; this script measures the actual quality on
the fixture corpus over many queries, per shape, at the same parameters
the registry row runs — the number a user tuning n_tables/n_planes/
n_probe/refine would look at.

Usage: python scripts/ann_recall.py   (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from serverless_data_pipeline_spark.session import get_spark  # noqa: E402
from serverless_data_pipeline_spark.operators.similarity import (  # noqa: E402
    ann_topk, brute_force_topk, ivf_topk, pq_topk,
    train_ivf_centroids, train_pq_codebooks,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 25
DIM = 64


def main() -> None:
    spark = get_spark(app_name="ann_recall")
    emb = entry_mod._t(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    queries = [(r.vec_id, list(map(float, r.embedding)))
               for r in emb.filter(F.col("vec_id") % 80 == 0)
                           .limit(N_QUERIES).collect()]

    ivf_cents = train_ivf_centroids(emb, "embedding", n_cells=16)
    pq_books = train_pq_codebooks(emb, "embedding", DIM, m=8, ksub=16)

    # Two configs per shape: the registry row's cheap defaults, and a
    # quality config showing what the knobs buy. The fixture embeddings
    # are near-uniform random vectors — ANN's adversarial case (every
    # cosine is noise-level, so "the" top-10 barely exists); production
    # embedding spaces are clustered and sit far above these numbers.
    shapes = {
        # the registry row's cheap 2x8 config, exact-bucket vs the r6
        # multiprobe default — the flip-1-bit probe set is the
        # recall-per-table multiplier that costs no index storage
        "lsh_2x8_mp0": lambda q: ann_topk(emb, "vec_id", "embedding", q,
                                          k=K, n_tables=2, n_planes=8,
                                          multiprobe=0),
        "lsh_2x8_mp1": lambda q: ann_topk(emb, "vec_id", "embedding", q,
                                          k=K, n_tables=2, n_planes=8,
                                          multiprobe=1),
        "lsh_2x8_mp2": lambda q: ann_topk(emb, "vec_id", "embedding", q,
                                          k=K, n_tables=2, n_planes=8,
                                          multiprobe=2),
        "lsh_4x8": lambda q: ann_topk(emb, "vec_id", "embedding", q, k=K,
                                      n_tables=4, n_planes=8),
        "lsh_8x5": lambda q: ann_topk(emb, "vec_id", "embedding", q, k=K,
                                      n_tables=8, n_planes=5),
        "ivf_probe4": lambda q: ivf_topk(
            emb, "vec_id", "embedding", q, k=K, n_probe=4,
            centroids=ivf_cents),
        "ivf_probe8": lambda q: ivf_topk(
            emb, "vec_id", "embedding", q, k=K, n_probe=8,
            centroids=ivf_cents),
        "pq_adc": lambda q: pq_topk(emb, "vec_id", "embedding", q, k=K,
                                    codebooks=pq_books),
        "pq_refine200": lambda q: pq_topk(emb, "vec_id", "embedding", q,
                                          k=K, codebooks=pq_books,
                                          refine=200),
    }
    sums = {s: 0.0 for s in shapes}
    for qid, qv in queries:
        exact = {r[0] for r in
                 brute_force_topk(emb, "vec_id", "embedding", qv, k=K)
                 .collect()}
        for s, fn in shapes.items():
            approx = {r[0] for r in fn(qv).collect()}
            sums[s] += len(exact & approx) / len(exact)
    out = {s: round(v / len(queries), 3) for s, v in sums.items()}
    out.update({"k": K, "n_queries": len(queries),
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1]})
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
