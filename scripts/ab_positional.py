"""Interleaved A/B of the PPJoin positional+length filter on the 10x
amplified corpus (the one superlinear term from the scale_check sweep).

Host timing here is noisy (shared box), so: one Spark session, the two
variants alternated A,B,A,B,... for `ROUNDS` rounds, min-of-rounds
reported per variant — the same discipline bench.py uses.

Usage: python scripts/ab_positional.py   (env SPARK_GRAFT_SF_DIR)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from scripts.scale_check import amplified_docs  # noqa: E402
from serverless_data_pipeline_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)
from serverless_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3


def main() -> None:
    spark = get_spark(app_name="ab_positional")
    docs = entry_mod._t(spark, SF_DIR, "documents").select("doc_id", "text")
    d = amplified_docs(docs, 10).localCheckpoint(eager=True)

    def run(positional: bool) -> tuple[float, int]:
        t0 = time.time()
        n = (ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.4,
                                 max_doc_freq=100, materialize_index=True,
                                 positional_filter=positional)
             .select("id_a", "id_b").count())
        return round(time.time() - t0, 2), n

    out = {"on": [], "off": [], "n_pairs": None}
    for _ in range(ROUNDS):
        for key, flag in (("on", True), ("off", False)):
            t, n = run(flag)
            out[key].append(t)
            if out["n_pairs"] is None:
                out["n_pairs"] = n
            assert n == out["n_pairs"], f"pair count drifted: {n}"
    out["min_on"] = min(out["on"])
    out["min_off"] = min(out["off"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
