"""Pipeline state table.

Replaces the reference's DynamoDB `data-pipeline-state` table (py:325-339):
partition key pipeline_id (string), sort key timestamp (string), plus the
status/stage payload the api + error-handler functions write (py:465-468,
py:489). Implemented as an append-only parquet table — an audit trail, not
a KV store: every stage transition is one appended row and the "current"
state is the latest row per pipeline_id (read via keep-latest window)."""

from __future__ import annotations

import datetime as _dt
import json
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("pipeline_id", T.StringType(), False),
    T.StructField("timestamp", T.StringType(), False),  # sort key, ISO8601
    T.StructField("stage", T.StringType()),
    T.StructField("status", T.StringType()),   # RUNNING|SUCCEEDED|FAILED
    T.StructField("detail", T.StringType()),   # JSON payload
])


def new_pipeline_id() -> str:
    return f"pipeline-{uuid.uuid4()}"


class StateTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(self, pipeline_id: str, stage: str, status: str,
               detail: dict | None = None) -> None:
        row = [(pipeline_id,
                _dt.datetime.now(_dt.timezone.utc).isoformat(),
                stage, status, json.dumps(detail or {}))]
        (self.spark.createDataFrame(row, STATE_SCHEMA)
             .coalesce(1).write.mode("append").parquet(self.path))

    def history(self, pipeline_id: str | None = None) -> DataFrame:
        df = self.spark.read.schema(STATE_SCHEMA).parquet(self.path)
        return df.filter(F.col("pipeline_id") == pipeline_id) if pipeline_id else df

    def compact(self) -> int:
        """Rewrite the append-only audit trail as one file per shuffle
        partition. Each append() commits a 1-row parquet file — correct as
        an audit trail, but a long-lived pipeline accumulates small files
        (listing cost grows linearly). Run periodically; returns the row
        count preserved.

        The swap goes through sources.writers.swap_into_place (Hadoop
        FileSystem API — path-scheme-agnostic). SINGLE-WRITER constraint:
        an append() racing the swap window can be lost — compaction
        assumes the same exclusive-writer discipline as the pipeline
        scheduler that owns this state table."""
        from serverless_data_pipeline_spark.sources.writers import (
            compact_table,
        )

        return compact_table(self.spark, self.path, target_partitions=1)

    def current(self) -> DataFrame:
        """Latest status per pipeline (keep-latest window, X1 pattern)."""
        w = Window.partitionBy("pipeline_id").orderBy(F.col("timestamp").desc())
        return (self.history().withColumn("__rn", F.row_number().over(w))
                .filter("__rn = 1").drop("__rn"))
