"""Structured Streaming operators ST1-ST7 (SURVEY §2.8).

The reference's streaming plane — Kinesis streams (py:161-174), the
realtime Lambda (py:287-298, consumes 100-record batches py:649-655), and
the Firehose delivery stream (py:187-213) — collapses into single Spark
streaming query plans here. Transformations are shared with the batch
stages (operators/stages.py): the same DataFrame -> DataFrame functions
bind to readStream sources.
"""

from serverless_data_pipeline_spark.streaming.windows import (
    session_agg, sliding_agg, tumbling_agg,
)
from serverless_data_pipeline_spark.streaming.sinks import (
    start_partitioned_stream, start_quarantining_stream,
)

__all__ = [
    "tumbling_agg", "sliding_agg", "session_agg",
    "start_partitioned_stream", "start_quarantining_stream",
]
