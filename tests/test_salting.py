"""Skew-salting utilities: results must equal the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_data_pipeline_spark.operators.relational import (
    salted_agg, salted_join,
)


def _skewed(spark):
    # one hot key (90%) + tail
    rows = [("hot", float(i % 7)) for i in range(900)]
    rows += [(f"k{i}", float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, v double")


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    got = {(r.k): (r.n_rows, r.sum_v)
           for r in salted_agg(df, ["k"], sum_cols=["v"]).collect()}
    expect = {(r.k): (r.n, r.s) for r in
              df.groupBy("k")
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("v").cast("decimal(20,4)"))
                    .cast("double").alias("s")).collect()}
    assert got == expect


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, label string")
    got = sorted((r.k, r.v, r.label)
                 for r in salted_join(left, right, ["k"]).collect())
    expect = sorted((r.k, r.v, r.label)
                    for r in left.join(right, ["k"]).collect())
    assert got == expect
