"""Windowed aggregation (ST2-ST5).

Each function works on BOTH batch and streaming DataFrames — `F.window` /
`F.session_window` are plan-level constructs — so the oracle can check the
batch run while tests drive the identical plan through readStream.

Watermarks (ST4) bound state at scale: without one, a 100 TB/day stream
accumulates window state forever. The reference's retention settings (7 d
main / 1 d analytics stream, py:165,173) are the lateness bounds we mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_agg(df: DataFrame, ts_col: str = "ts", keys: tuple[str, ...] = ("event_type",),
                 width: str = "1 hour", watermark: str | None = "1 day") -> DataFrame:
    """ST3 tumbling — the Firehose hourly-partition write (py:197) viewed
    as a windowed agg. Output flattens window to its start timestamp."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (df.groupBy(F.window(ts_col, width).alias("w"), *keys)
              .agg(F.count("*").alias("n_events"),
                   F.round(F.sum(F.col("value").cast("decimal(20,4)"))
                            .cast("double"), 2).alias("sum_value"))
              .select(F.col("w.start").alias("window_start"), *keys,
                      "n_events", "sum_value"))


def sliding_agg(df: DataFrame, ts_col: str = "ts", keys: tuple[str, ...] = ("event_type",),
                width: str = "1 hour", slide: str = "30 minutes",
                watermark: str | None = "1 day") -> DataFrame:
    """ST3 sliding — each row lands in width/slide windows."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (df.groupBy(F.window(ts_col, width, slide).alias("w"), *keys)
              .agg(F.count("*").alias("n_events"),
                   F.round(F.sum(F.col("value").cast("decimal(20,4)"))
                            .cast("double"), 2).alias("sum_value"))
              .select(F.col("w.start").alias("window_start"), *keys,
                      "n_events", "sum_value"))


def stream_stream_join(left: DataFrame, right: DataFrame,
                       key: str, ts_col: str = "ts",
                       watermark: str = "1 hour",
                       max_delay: str = "30 minutes") -> DataFrame:
    """ST — stream-stream inner equi-join with an event-time range bound,
    the Spark form of correlating the reference's two streams (main
    ingest + analytics, py:161-174). Both sides carry a watermark and the
    join predicate bounds how far the right event may trail the left one
    — WITHOUT the time bound Spark must keep every left row in state
    forever (unbounded state store at 100 TB/day); with it, state older
    than watermark + delay is evicted per micro-batch.

    Works identically on batch frames (watermarks become no-ops, the
    range predicate is an ordinary theta conjunct), so tests can check
    stream == batch. Returns left columns prefixed ``l_`` and right
    prefixed ``r_``."""
    l = _maybe_watermark(left, ts_col, watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns])
    r = _maybe_watermark(right, ts_col, watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = ((F.col(f"l_{key}") == F.col(f"r_{key}"))
            & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
            & (F.col(f"r_{ts_col}")
               <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {max_delay}")))
    return l.join(r, cond)


def session_agg(df: DataFrame, ts_col: str = "ts", key: str = "user_id",
                gap: str = "30 minutes",
                watermark: str | None = "1 day") -> DataFrame:
    """ST5 session windows — native `session_window` (merging state store
    sessions in streaming; gaps-and-islands equivalent in batch is
    operators.relational.sessionize)."""
    df = _maybe_watermark(df, ts_col, watermark)
    return (df.groupBy(F.session_window(ts_col, gap).alias("w"), key)
              .agg(F.count("*").alias("n_events"),
                   F.round(F.sum(F.col("value").cast("decimal(20,4)"))
                            .cast("double"), 2).alias("sum_value"))
              .select(F.col("w.start").alias("session_start"),
                      F.col("w.end").alias("session_end"), key,
                      "n_events", "sum_value"))


def stream_dedup(df: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """ST — in-stream exact deduplication: drop redelivered records by
    key while the stream runs — the streaming face of X1 exact dedup and
    the semantic the reference's at-least-once delivery implies (SQS
    redrive py:133-137 / Kinesis re-polling py:649-655 both redeliver;
    downstream must be idempotent).

    Streaming frames use ``dropDuplicatesWithinWatermark``: per-key state
    is kept only until the watermark passes the first sighting, so state
    is bounded by (keys arriving within the lateness window), not by
    stream history — the only viable shape at 100 TB/day. A duplicate
    arriving later than the watermark delay is NOT caught (that is the
    documented trade: bounded state for bounded-lateness dedup); size
    ``watermark`` to the delivery layer's redelivery horizon.

    Batch frames fall back to plain ``dropDuplicates(keys)`` so the same
    pipeline composes in both modes (stream==batch equivalence holds
    whenever every duplicate arrives within the watermark)."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return (df.withWatermark(ts_col, watermark)
              .dropDuplicatesWithinWatermark(keys))


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         key: str, how: str = "left",
                         broadcast_dim: bool = True) -> DataFrame:
    """ST — stream-static enrichment join: each micro-batch of the
    stream equi-joins a STATIC dimension frame (the lookup-enrichment
    the reference's processor does per record against its config table,
    py:273-284, re-expressed as Spark's native stream-static join).

    Stream-static joins are stateless — Spark re-evaluates the static
    side per micro-batch, so no state store grows with the stream, and
    with ``broadcast_dim`` the dimension ships once per executor and
    the join never shuffles the stream (the correct 100 TB/day shape:
    a micro-batch map-side hash join against a small dim). Inner and
    left joins are supported by Structured Streaming; right/full
    (which would need to observe the stream's completion) are not, and
    Spark itself rejects them.

    Works identically on batch frames, so tests and oracles can check
    stream == batch."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, key, how)
