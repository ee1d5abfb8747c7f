"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Small-input parallelism guard for CPU-heavy narrow stages.

    A single-row-group parquet file scans as ONE task no matter the split
    config, serializing regex/higher-order/vector work onto one core.
    Repartition up to the session default parallelism ONLY when the scan
    is under-partitioned — at 100 TB inputs have thousands of row groups
    and this is a no-op (no shuffle added). Streaming frames pass through
    untouched (micro-batch sizing owns their parallelism)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
