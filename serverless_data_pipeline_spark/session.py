"""SparkSession factory.

Single place where engine-level physical configuration lives. The reference
encodes its physical choices as infrastructure (Lambda memory tiers
py:226-309, Firehose buffering py:199-202, fixed 3-way parallel branches
py:373-390); on Spark all of those collapse into session conf — AQE replaces
the hardcoded chunk fan-out, executor/task parallelism replaces reserved
concurrency, and trigger intervals replace buffer hints.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sized for the local[32] test harness; on a real cluster master/memory come
# from spark-submit and only the sql.* settings below matter.
_LOCAL_CORES = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "serverless_data_pipeline_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the engine session.

    Defaults tuned for scale-readiness:
    - AQE on (runtime partition coalescing + skew-join splitting) — strictly
      better than the reference's fixed 3-branch Parallel (py:373-390).
    - shuffle partitions ~= cores locally; on a cluster AQE coalesces from
      whatever the operator-level `repartition` asks for.
    - UTC session timezone so timestamp semantics match the DuckDB oracle.
    - Arrow on for the pandas-UDF slow path.
    """
    builder = (
        SparkSession.builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or _LOCAL_CORES))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Harmless unless a parquet column really is TIMESTAMP(NANOS);
        # schemas.load_table probes the footer and only engages the
        # nanos→micros shim for genuine nanos files.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # Keep stdout/stderr clean for harnesses that capture output
        # (bench.py must emit exactly one JSON line).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r14 adjudication (r13 verdict #1): r13 set
        # spark.sql.join.preferSortMergeJoin=false on contended-host
        # A/Bs; the quiet-host interleaved re-run (4 rounds each, calib
        # flat 71.8-72.8 ms) shows the shuffled-hash preference is a
        # small consistent LOSS on the affected joins (x7 6.54 vs
        # 6.78 s, x8.lmask 2.14 vs 2.26 s — sort-merge ahead in every
        # round) and a wash on x5 (2.58 vs 2.49 s). Reverted to the
        # default: sort-merge also SPILLS where shuffled-hash OOMs, and
        # the SHJ size gate (estimated build side < 64 MB broadcast
        # threshold x shuffle partitions) rides post-explode size
        # estimates that are unreliable at 100 TB — the r13 advisory's
        # exact concern. SHJ remains available per-join via the
        # SHUFFLE_HASH hint where a future measurement justifies it.
    )
    # Respect a master/memory already configured by spark-submit — builder
    # conf would override submit-time settings, pinning the engine to local
    # mode on a real cluster. Only default them when nothing is set.
    from pyspark import SparkConf
    submitted = SparkConf()
    if not submitted.contains("spark.master"):
        builder = builder.master(f"local[{_LOCAL_CORES}]")
    if not submitted.contains("spark.driver.memory"):
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
