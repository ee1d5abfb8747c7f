"""EP3 — the streaming path as ONE composed query (SURVEY §3 EP3).

The reference chains producer → realtime Lambda (py:287-298) → analytics
stream → Firehose delivery (py:187-213: 60 s buffer, hour partitions,
errors/ split). On Spark the whole chain is a single Structured Streaming
plan: readStream → watermark → T6 transform → partitioned/quarantined
sink. The realtime-fn + Firehose pair collapses into one query; the only
process boundaries left are micro-batch commits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQuery

from serverless_data_pipeline_spark.config import DEFAULT_CONFIG, EngineConfig
from serverless_data_pipeline_spark.operators.stages import realtime_transform
from serverless_data_pipeline_spark.streaming.sinks import (
    start_quarantining_stream,
)


def run_streaming_pipeline(stream: DataFrame, *, processed_path: str,
                           error_path: str, checkpoint: str,
                           validity: Column,
                           ts_col: str = "ts",
                           watermark: str = "1 day",
                           config: EngineConfig = DEFAULT_CONFIG,
                           trigger: dict | None = None) -> StreamingQuery:
    """readStream input → watermark (ST4, lateness bound mirroring the
    7 d/1 d stream retention py:165,173) → T6 per-record transform →
    quarantining partitioned sink (ST2+ST7). Returns the running query;
    caller owns awaitTermination/stop."""
    enriched = realtime_transform(stream.withWatermark(ts_col, watermark),
                                  ts_col=ts_col)
    return start_quarantining_stream(
        enriched, good_path=processed_path, error_path=error_path,
        checkpoint=checkpoint, validity=validity, ts_col=ts_col,
        config=config, trigger=trigger)
