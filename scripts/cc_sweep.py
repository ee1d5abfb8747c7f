"""Connected-components crossover sweep: label_prop vs star vs auto.

The r4 verdict asked for an EDGE-COUNT threshold to default to star, but
the paired scale_check runs showed label_prop beating star at 250k edges
(5.2-11.9 s vs 10.5-13.2 s over three runs) — on near-dup graphs the
governing variable is component DIAMETER, not edge count: label_prop
needs diameter rounds of ~3 cheap shuffles, star needs O(log^2) rounds
of two half-round rewrites each. This sweep varies diameter directly
(many parallel chains of depth d, constant total edge count) and times
all three modes, justifying the auto hybrid (bounded label_prop, star on
the contracted residual) and its _AUTO_LP_ROUNDS budget.

Usage: python scripts/cc_sweep.py     (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from serverless_data_pipeline_spark.operators.dedup import (  # noqa: E402
    neardup_components,
)
from serverless_data_pipeline_spark.session import get_spark  # noqa: E402

TOTAL_EDGES = 60_000
DEPTHS = (2, 4, 8, 16, 64)
MAX_ITER = 200  # large enough that label_prop always converges


def chain_edges(spark, depth: int, n_chains: int):
    """n_chains disjoint paths of `depth` edges each; node ids disjoint
    across chains."""
    stride = depth + 1
    base = spark.range(n_chains).select(
        (F.col("id") * stride).alias("__b"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("__i"))
    return base.select((F.col("__b") + F.col("__i")).alias("id_a"),
                       (F.col("__b") + F.col("__i") + 1).alias("id_b"))


def main() -> None:
    spark = get_spark(app_name="cc_sweep")
    out: dict[str, dict[str, float]] = {}
    for depth in DEPTHS:
        n_chains = TOTAL_EDGES // depth
        pairs = chain_edges(spark, depth, n_chains).localCheckpoint(eager=True)
        row: dict[str, float] = {"edges": pairs.count()}
        for algo in ("label_prop", "star", "auto"):
            t0 = time.time()
            res = neardup_components(pairs, max_iter=MAX_ITER,
                                     algorithm=algo)
            n_comp = res.select("component_id").distinct().count()
            row[algo] = round(time.time() - t0, 2)
            assert n_comp == n_chains, (algo, depth, n_comp, n_chains)
        out[f"depth_{depth}"] = row
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
