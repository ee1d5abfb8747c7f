"""Schema registry.

Replaces the reference's schema-on-read stack — the Glue crawler's nightly
inference (py:602-616) and the validation Lambda's config-bucket schemas
(py:113-117, py:252, md:300,316) — with an explicit ``StructType`` registry.
At 100 TB, schema inference is a full-data scan you never want; registered
schemas make every read a zero-inference, pruning-capable parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON payload string
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

# The ingest record contract of the control-plane API (md:172-180): the POST
# /pipelines body the reference accepts. Used by the T1 ingest stage.
INGEST_RECORD_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("data_type", T.StringType()),
    T.StructField("priority", T.StringType()),
    T.StructField("metadata", T.StructType([
        T.StructField("source_system", T.StringType()),
        T.StructField("batch_id", T.StringType()),
    ])),
])


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Registered-schema parquet scan (S2). No inference, prunable.

    `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which PySpark
    cannot map to TimestampType directly; with
    `spark.sql.legacy.parquet.nanosAsLong=true` it reads as a nanos long,
    converted here to microsecond TimestampType (`ts div 1000` — integer
    division, no double round-trip, matching DuckDB's ns→us truncation).
    """
    path = f"{sf_dir}/{name}.parquet"
    schema = SCHEMAS.get(name)
    if name == "events":
        # Conf is runtime-settable; set defensively for driver-owned
        # sessions that did not go through get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        read_schema = T.StructType([
            T.StructField("ts", T.LongType()) if f.name == "ts" else f
            for f in schema.fields])
        raw = spark.read.schema(read_schema).parquet(path)
        from pyspark.sql import functions as F
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql queries —
    the Spark analogue of the Glue catalog + Athena surface (py:581-629)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
