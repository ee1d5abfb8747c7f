"""Pipeline drivers: EP1 batch pipeline, EP2 control plane, state table."""

from serverless_data_pipeline_spark.plans.pipeline import PipelineResult, run_pipeline
from serverless_data_pipeline_spark.plans.control import PipelineControl

__all__ = ["run_pipeline", "PipelineResult", "PipelineControl"]
