"""Print the physical plan of one or more registry queries.

Usage: python scripts/explain_query.py q5_local_supplier [x8_corpus_utils ...]
       python scripts/explain_query.py --all          # every entry
Optional: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001 — plans only,
so the smallest fixtures are enough).

The plan-shape regression suite (tests/test_plans.py) asserts the
load-bearing properties; this script is the interactive magnifier for
auditing pushdown/broadcast/shuffle shapes by eye.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from serverless_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
# Building this entry EXECUTES a streaming query; plans of the equivalent
# batch window aggs are visible via st3_window_agg instead.
SKIP = {"st1_stream_exec"}


def main() -> None:
    args = sys.argv[1:]
    qs = entry_mod.queries()
    names = ([n for n in qs if n not in SKIP] if args == ["--all"]
             else args)
    unknown = [n for n in names if n not in qs]
    if unknown or not names:
        print(f"unknown or missing query names: {unknown or '(none given)'}\n"
              f"available: {', '.join(sorted(qs))}")
        raise SystemExit(2)
    spark = get_spark(app_name="explain", shuffle_partitions=8)
    for name in names:
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        qs[name](spark, SF_DIR).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
