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
    untouched (micro-batch sizing owns their parallelism).

    The probe is ``inputFiles()`` (driver-side file listing off the
    analyzed plan) — NOT ``df.rdd.getNumPartitions()``, which converts
    the plan to an RDD on every call and bypasses AQE sizing. In-memory
    frames (no files) pass through: createDataFrame already spreads rows
    across defaultParallelism partitions."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    n_files = len(df.inputFiles())
    if 0 < n_files < max(2, target // 2):
        return df.repartition(target)
    return df


def hadoop_fs(spark, path: str):
    """Resolve ``path`` through the JVM Hadoop FileSystem API: returns
    (fs, jpath). ONE home for the ``spark._jvm``/``spark._jsc`` py4j
    plumbing (private internals that may shift across Spark versions)
    — artifact I/O, sink prefix deletes and partition maintenance all
    route here, so a compatibility fix lands once."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath
