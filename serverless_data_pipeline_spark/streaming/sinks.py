"""Streaming sinks (ST2 write half, ST6, ST7).

The Firehose delivery contract (py:187-213) becomes one writeStream: 60 s
trigger (buffer hint py:199-202), hour partitions (py:197), errors split to
a quarantine path (error_output_prefix py:198). SQS redrive (max 3 receives
-> DLQ, py:133-137) becomes bounded retry inside foreachBatch with failures
appended to a dead_letter table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from serverless_data_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig
from serverless_data_pipeline_spark.sources.writers import (
    with_partition_columns, write_quarantine,
)


def start_partitioned_stream(df: DataFrame, path: str, checkpoint: str,
                             ts_col: str = "ts",
                             config: EngineConfig = DEFAULT_CONFIG,
                             trigger: dict | None = None) -> StreamingQuery:
    """ST2 — partitioned parquet streaming sink, 60 s micro-batches
    (py:199-202). Checkpointed => exactly-once file sink."""
    out = with_partition_columns(df, ts_col)
    return (out.writeStream
            .format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .option("compression", config.sink_compression)
            .partitionBy(*config.partition_columns)
            .trigger(**(trigger or
                        {"processingTime": f"{config.stream_trigger_seconds} seconds"}))
            .outputMode("append")
            .start())


def start_quarantining_stream(df: DataFrame, good_path: str, error_path: str,
                              checkpoint: str, validity: "F.Column",
                              ts_col: str = "ts",
                              config: EngineConfig = DEFAULT_CONFIG,
                              max_retries: int | None = None,
                              trigger: dict | None = None) -> StreamingQuery:
    """ST7 — foreachBatch split: rows passing `validity` go to the
    partitioned processed sink; failing rows go to the errors/ quarantine
    (py:198). The batch write itself is retried up to max_retries
    (MAX_RETRIES=3, py:703-707); a batch that keeps failing is appended to
    the dead-letter path instead of crashing the query (DLQ, py:122-137).

    Delivery semantics: AT-LEAST-ONCE on streaming restart — the good
    sink appends into the reference's Firehose partition layout
    (year/month/day/hour), which has no per-epoch scoping to overwrite,
    and Firehose itself is an at-least-once delivery service, so a
    micro-batch replayed after a crash can re-append its rows.
    Downstream exact-dedup (X1/ST9) is the standard chaser; use
    ``start_redelivery_stream``'s epoch-scoped layout when the sink
    itself must be replay-idempotent.
    """
    retries = max_retries if max_retries is not None else config.max_retries

    def _process(batch: DataFrame, epoch_id: int) -> None:
        flagged = batch.withColumn("__ok", validity).cache()
        try:
            bad = flagged.filter(~F.col("__ok") | F.col("__ok").isNull()).drop("__ok")
            if not bad.isEmpty():
                write_quarantine(bad, error_path, "stream_validation_failed")
            good = with_partition_columns(
                flagged.filter("__ok").drop("__ok"), ts_col)
            last_err: Exception | None = None
            for _attempt in range(retries):
                try:
                    (good.write.mode("append")
                         .option("compression", config.sink_compression)
                         .partitionBy(*config.partition_columns)
                         .parquet(good_path))
                    return
                except Exception as exc:  # noqa: BLE001 — retry then DLQ
                    last_err = exc
            write_quarantine(batch, error_path + "_dlq",
                             f"sink_failed_after_{retries}_retries: {last_err}")
        finally:
            flagged.unpersist()

    return (df.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start())

def _delete_prefix(df: DataFrame, path: str) -> None:
    """Recursively delete a sink prefix via the Hadoop FileSystem API
    (no-op when absent) — the epoch-scoped commit discipline's reset
    step. Plumbing shared via ``operators.util.hadoop_fs``."""
    from serverless_data_pipeline_spark.operators.util import hadoop_fs

    fs, jpath = hadoop_fs(df.sparkSession, path)
    fs.delete(jpath, True)


def redeliver_batch(batch: DataFrame, epoch_id: int, good_path: str,
                    dlq_path: str, succeeds_at,
                    max_receive_count: int,
                    config: EngineConfig = DEFAULT_CONFIG) -> None:
    """One micro-batch of the bounded-retry redelivery contract —
    IDEMPOTENT under foreachBatch's at-least-once replay: every write
    lands in an epoch/attempt-scoped directory
    (``good_path/epoch=E/attempt=N``, ``dlq_path/epoch=E``) with
    mode=overwrite, so re-running the same epoch after a streaming
    restart overwrites its own previous (possibly partial) output
    instead of appending duplicates — the same commit discipline as
    incremental.maintenance_stream. The scoping dirs surface on read
    as ordinary partition columns (``epoch``, ``attempt``) next to the
    ``attempts`` data column. Requires ``succeeds_at`` to be
    deterministic over (row, attempt) — the redelivery trajectory must
    replay identically — which the queue-contract semantics already
    assume.

    BOTH ``epoch=E`` prefixes (good AND dlq) are cleared BEFORE the
    attempt loop: per-attempt overwrites alone only replace attempt
    dirs the replay re-executes, so a replay running FEWER attempts
    (``max_receive_count`` lowered, or every row now succeeding
    earlier) would leave the first run's stale higher-attempt dirs
    inside the good epoch — and symmetrically, a replay where
    previously-DLQ'd rows now SUCCEED (``max_receive_count`` raised,
    or a transient downstream recovered) would leave the first run's
    stale DLQ epoch dir in place, surfacing the same row in both
    sinks. The epoch-grain delete on both paths makes each epoch's
    contents exactly the replay's output regardless of config
    drift."""
    _delete_prefix(batch, f"{good_path}/epoch={int(epoch_id)}")
    _delete_prefix(batch, f"{dlq_path}/epoch={int(epoch_id)}")
    pending = batch
    cached = []
    try:
        for attempt in range(1, max_receive_count + 1):
            flagged = (pending.withColumn("__ok", succeeds_at(attempt))
                       .cache())
            cached.append(flagged)
            ok = (flagged.filter("__ok").drop("__ok")
                  .withColumn("attempts", F.lit(attempt)))
            (ok.write.mode("overwrite")
             .option("compression", config.sink_compression)
             .parquet(f"{good_path}/epoch={int(epoch_id)}"
                      f"/attempt={attempt}"))
            pending = flagged.filter(
                ~F.col("__ok") | F.col("__ok").isNull()).drop("__ok")
            if pending.isEmpty():
                pending = None
                break
        if pending is not None and not pending.isEmpty():
            write_quarantine(
                pending.withColumn("attempts", F.lit(max_receive_count)),
                f"{dlq_path}/epoch={int(epoch_id)}",
                f"failed_after_{max_receive_count}_deliveries",
                mode="overwrite")
    finally:
        for c in cached:
            c.unpersist()


def start_redelivery_stream(df: DataFrame, good_path: str, dlq_path: str,
                            checkpoint: str, succeeds_at,
                            max_receive_count: int | None = None,
                            config: EngineConfig = DEFAULT_CONFIG,
                            trigger: dict | None = None) -> StreamingQuery:
    """S7/ST7 bounded-retry half — the SQS redrive contract
    (max_receive_count=3 -> DLQ, py:133-137) at ROW grain: every
    micro-batch row is "delivered" up to ``max_receive_count`` times.
    ``succeeds_at(attempt)`` returns a boolean Column over the batch's
    columns saying whether a row's processing succeeds on that delivery
    attempt (the deterministic stand-in for a flaky downstream — a
    transient poison row fails early attempts and succeeds later; a
    permanent poison row never succeeds). Rows that succeed land in the
    good sink WITH their ``attempts`` count (the redelivery telemetry a
    real DLQ pipeline records); rows still failing after the last
    attempt land in the dead-letter path with
    ``attempts = max_receive_count`` and a reason — never silently
    dropped, never crashing the query.

    The loop is REAL redelivery machinery, not an algebraic shortcut:
    each attempt re-splits the pending rows and performs its own sink
    write, so attempt N's successes come from attempt N's write job —
    exactly the per-delivery side effects of the queue contract. Each
    attempt caches the pending split once (same discipline as
    start_quarantining_stream); cost is at most ``max_receive_count``
    writes per micro-batch, and the pending set shrinks to the poison
    minority after attempt 1. Restart safety: every write is
    epoch/attempt-scoped with overwrite (see ``redeliver_batch``), so
    a replayed micro-batch produces exactly the same files, not
    duplicates."""
    mrc = (max_receive_count if max_receive_count is not None
           else config.max_retries)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        redeliver_batch(batch, epoch_id, good_path, dlq_path,
                        succeeds_at, mrc, config)

    return (df.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start())
