"""serverless_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the data-processing capabilities declared by the
reference serverless pipeline (an AWS CDK stack: S3/Kinesis/Firehose/Lambda/
Step Functions/Glue/Athena — see ``Serverless Data Pipeline.py`` in the
reference snapshot), re-expressed Spark-first:

- object-store tiers (raw/processed/archive)      -> parquet directories
- Firehose partitioned parquet conversion (py:194-212) -> partitioned sinks
- Lambda ETL stages (py:226-309)                  -> DataFrame->DataFrame fns
- Step Functions choice routing (py:404-418)      -> driver-side conditionals
- Glue catalog + Athena SQL (py:581-629)          -> spark.catalog + spark.sql
- Kinesis/Firehose streaming (py:161-213,649-655) -> Structured Streaming
- DynamoDB pipeline state (py:325-339)            -> _pipeline_state table

plus charter-extension LLM-data-pipeline operators: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity search
(brute-force and LSH ANN), text analysis (language-ID, quality scoring,
token counting, fingerprinting), and multimodal binary-column plumbing.

Everything is built on the public Apache Spark DataFrame/SQL/Structured
Streaming APIs and designed for a 1000-executor, 100 TB deployment even
though tests run on local[32].
"""

from serverless_data_pipeline_spark.config import EngineConfig
from serverless_data_pipeline_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]

__version__ = "0.1.0"
