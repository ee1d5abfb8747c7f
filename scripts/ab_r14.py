"""r14 adjudication A/Bs (VERDICT r13 "Next round" #1).

Every committed post-optimization capture in r13 was host-flagged, and
two queries (x3_topk_similarity, x5_text_signals) regressed beyond the
environmental band in those captures while the builder's interleaved
A/Bs claimed they improved. This script re-runs exactly those A/Bs on a
quiet host, committed as the adjudication artifact:

- x3 / x2 / x7 / x_approx: `build_concurrently` ON vs OFF (OFF =
  monkeypatched sequential execution — same thunks, same call order).
- x5 / x7 / x8.lmask: `spark.sql.join.preferSortMergeJoin` false vs
  true (runtime-settable SQLConf, so the toggle interleaves in ONE
  session/process).

Discipline: one Spark session, variants alternated A,B,A,B per round,
min-of-ROUNDS reported per variant (bench.py's established min-of-k
contention rejection), noop sink, warm (one untimed priming run first).

Usage: python scripts/ab_r14.py [x3_concurrency|shj|x2_concurrency ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON object (pretty) to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from serverless_data_pipeline_spark.operators import util as _util  # noqa: E402
from serverless_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "4"))

_SEQUENTIAL = False
_ORIG_BUILD = _util.build_concurrently


def _build_maybe_sequential(*thunks):
    if _SEQUENTIAL:
        return [t() for t in thunks]
    return _ORIG_BUILD(*thunks)


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _timed(fn) -> float:
    t0 = time.time()
    _noop(fn())
    return round(time.time() - t0, 3)


def _calib_ms() -> float:
    import hashlib

    buf = bytes(range(256)) * 4096
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.md5()
        for _ in range(40):
            h.update(buf)
        h.digest()
        best = min(best, (time.perf_counter() - t0) * 1000)
    return round(best, 2)


def run_ab(spark, name: str, mk, set_a, set_b) -> dict:
    """Interleave variant A (set_a) and B (set_b), ROUNDS each, min-of-k."""
    qs = entry_mod.queries()
    subs = entry_mod.bench_subqueries()
    fn = qs.get(name) or subs[name]
    thunk = mk if mk is not None else (lambda: fn(spark, SF_DIR))
    set_a()
    _noop(thunk())  # prime (codegen/JVM warm) under variant A
    a_times, b_times = [], []
    for _ in range(ROUNDS):
        set_a()
        a_times.append(_timed(thunk))
        set_b()
        b_times.append(_timed(thunk))
    set_a()
    return {"a": a_times, "b": b_times,
            "min_a": min(a_times), "min_b": min(b_times)}


def main() -> None:
    which = set(sys.argv[1:]) or {"x3_concurrency", "x2_concurrency",
                                  "x7_concurrency", "xapprox_concurrency",
                                  "shj"}
    _util.build_concurrently = _build_maybe_sequential
    spark = get_spark(app_name="ab_r14")
    out: dict = {"sf_dir": SF_DIR, "rounds": ROUNDS,
                 "calib_ms_start": _calib_ms()}

    def conc_on():
        global _SEQUENTIAL
        _SEQUENTIAL = False

    def conc_off():
        global _SEQUENTIAL
        _SEQUENTIAL = True

    def shj_on():
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")

    def shj_off():
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")

    for tag, qname in (("x3_concurrency", "x3_topk_similarity"),
                       ("x2_concurrency", "x2_dedup_clusters"),
                       ("x7_concurrency", "x7_corpus_exact"),
                       ("xapprox_concurrency", "x_approx_suite")):
        if tag in which:
            out[tag] = run_ab(spark, qname, None, conc_on, conc_off)
            out[tag]["a_is"] = "concurrent"
            print(f"# {tag}: {out[tag]}", file=sys.stderr)

    if "shj" in which:
        for qname in ("x5_text_signals", "x7_corpus_exact",
                      "x8_corpus_utils.lmask"):
            key = f"shj_{qname}"
            out[key] = run_ab(spark, qname, None, shj_on, shj_off)
            out[key]["a_is"] = "preferSortMergeJoin=false"
            print(f"# {key}: {out[key]}", file=sys.stderr)

    out["calib_ms_end"] = _calib_ms()
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
