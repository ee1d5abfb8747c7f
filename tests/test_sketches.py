"""Count-Min sketch laws: one-sided error, exactness at width >> n,
bounded overestimate at narrow width, and batch mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_data_pipeline_spark.operators.sketches import (
    cms_build, cms_estimate, cms_merge,
)


def _freqs(spark, counts: dict[str, int]):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "t string")


def test_cms_one_sided_and_exact_when_wide(spark):
    counts = {f"tok{i}": (i % 7) + 1 for i in range(40)}
    df = _freqs(spark, counts)
    sk = cms_build(df, "t", depth=4, width=4096)
    items = spark.createDataFrame(
        [(t,) for t in list(counts) + ["never_seen"]], "t string")
    est = {r.t: r.est for r in
           cms_estimate(sk, items, "t", depth=4, width=4096).collect()}
    assert all(est[t] >= n for t, n in counts.items())   # one-sided, always
    # width 4096 >> 40 distinct: collisions are ~impossible at depth 4
    assert est == {**counts, "never_seen": 0}


def test_cms_overestimate_bounded_when_narrow(spark):
    counts = {f"tok{i}": 5 for i in range(200)}
    n_total = sum(counts.values())
    df = _freqs(spark, counts)
    width = 64
    sk = cms_build(df, "t", depth=5, width=width)
    items = spark.createDataFrame([(t,) for t in counts], "t string")
    est = {r.t: r.est for r in
           cms_estimate(sk, items, "t", depth=5, width=width).collect()}
    assert all(est[t] >= 5 for t in counts)
    # CM guarantee: err <= e*N/width w.p. 1-e^-depth; assert the mean
    # err is within the bound and no est exceeds the trivial max
    errs = [est[t] - 5 for t in counts]
    assert sum(errs) / len(errs) <= 2.718281828 * n_total / width
    assert max(est.values()) <= n_total


def test_cms_merge_equals_union_build(spark):
    a = _freqs(spark, {"x": 3, "y": 2})
    b = _freqs(spark, {"x": 4, "z": 1})
    kw = dict(depth=4, width=256)
    merged = cms_merge(cms_build(a, "t", **kw), cms_build(b, "t", **kw))
    direct = cms_build(a.unionAll(b), "t", **kw)
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, direct.collect())))
    items = spark.createDataFrame([("x",), ("y",), ("z",)], "t string")
    est = {r.t: r.est for r in
           cms_estimate(merged, items, "t", **kw).collect()}
    assert est == {"x": 7, "y": 2, "z": 1}


def test_cms_bounded_cells_and_validation(spark):
    df = _freqs(spark, {f"tok{i}": 2 for i in range(500)})
    sk = cms_build(df, "t", depth=3, width=32)
    assert sk.count() <= 3 * 32
    assert sk.agg(F.sum("cnt")).first()[0] == 3 * 1000  # depth copies
    with pytest.raises(ValueError):
        cms_build(df, "t", depth=0)
    with pytest.raises(ValueError):
        cms_build(df, "t", width=1)


def test_cms_null_values_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "t string")
    sk = cms_build(df, "t", depth=2, width=64)
    assert sk.agg(F.sum("cnt")).first()[0] == 2 * 2
    items = spark.createDataFrame([("a",)], "t string")
    est = cms_estimate(sk, items, "t", depth=2, width=64).collect()
    assert est[0].est == 2


def test_cms_estimate_row_preserving(spark):
    """Every probe row comes back exactly once: duplicates keep their
    own row, and a NULL probe gets est NULL (undefined, not 0)."""
    df = spark.createDataFrame([("a",), ("a",), ("a",)], "t string")
    sk = cms_build(df, "t", depth=2, width=64)
    items = spark.createDataFrame([("a",), (None,), ("a",)], "t string")
    rows = cms_estimate(sk, items, "t", depth=2, width=64).collect()
    assert len(rows) == 3
    assert sorted((-1 if r.est is None else r.est) for r in rows) \
        == [-1, 3, 3]
    assert [r.est for r in rows if r.t is None] == [None]


def test_cms_streaming_merge_equals_batch(spark, tmp_path):
    """The mergeable-summary contract under REAL streaming execution:
    each micro-batch builds its own CMS via foreachBatch and appends
    the cells; the n-way merge of the per-batch sketches (groupBy-sum,
    the associative form of cms_merge) must equal the sketch built in
    one batch pass over the same data — so a 100 TB corpus's frequency
    stats can be maintained per-landing without rescanning history."""
    from pyspark.sql import types as T
    schema = T.StructType([T.StructField("t", T.StringType())])
    src = str(tmp_path / "src")
    sk_dir = str(tmp_path / "sk")
    rows = [(f"tok{i % 17}",) for i in range(300)]
    df = spark.createDataFrame(rows, schema)
    df.repartition(3).write.mode("overwrite").parquet(src)
    kw = dict(depth=3, width=256)

    n_batches = []

    def _tick(batch_df, bid):
        n_batches.append(bid)
        cms_build(batch_df, "t", **kw).write.mode("append").parquet(sk_dir)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(_tick)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(n_batches) >= 2          # genuinely incremental merge
    merged = (spark.read.parquet(sk_dir)
              .groupBy("row", "col")
              .agg(F.sum("cnt").cast("long").alias("cnt")))
    direct = cms_build(spark.read.parquet(src), "t", **kw)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))
    items = spark.createDataFrame([(f"tok{i}",) for i in range(17)],
                                  schema)
    est = {r.t: r.est for r in cms_estimate(merged, items, "t",
                                            **kw).collect()}
    true = {f"tok{i}": len([1 for j in range(300) if j % 17 == i])
            for i in range(17)}
    assert all(est[k] >= v for k, v in true.items())


def test_hll_merge_law_and_accuracy(spark):
    """HLL laws (mirroring the CMS contract): merging per-batch
    sketches estimates the union within the sketch's error band of the
    one-pass whole-corpus build (registers union by max — unlike CMS
    cell sums, the ESTIMATOR read off a union can differ from the
    direct build's by a fraction of a percent, so the law is a tight
    band, not bit equality); per-group sketches estimate each group;
    idempotent re-merge IS exact (same registers -> same estimate)."""
    from pyspark.sql import functions as F

    from serverless_data_pipeline_spark.operators.sketches import (
        hll_build, hll_estimate, hll_merge,
    )
    n_distinct = 50_000
    df = (spark.range(200_000)
          .select((F.col("id") % n_distinct).cast("string").alias("v"),
                  (F.col("id") % 2).cast("string").alias("g")))
    whole = hll_estimate(hll_build(df, "v")).first().n_distinct_est
    assert abs(whole - n_distinct) / n_distinct < 0.05
    # batch-merge law: exact equality with the whole-corpus build
    b1 = hll_build(df.filter("id % 3 != 0"), "v")
    b2 = hll_build(df.filter("id % 3 = 0"), "v")
    merged = hll_estimate(hll_merge(b1.unionAll(b2))).first().n_distinct_est
    assert abs(merged - whole) / whole < 0.01
    assert abs(merged - n_distinct) / n_distinct < 0.05
    # idempotence: merging the same sketch twice changes nothing
    twice = hll_estimate(
        hll_merge(b1.unionAll(b2).unionAll(b2))).first().n_distinct_est
    assert twice == merged
    # per-group: each g has its own distinct set of v
    per = {r.g: r.n_distinct_est
           for r in hll_estimate(hll_build(df, "v", by=("g",)),
                                 by=("g",)).collect()}
    exact = {r.g: r.n for r in df.groupBy("g")
             .agg(F.countDistinct("v").alias("n")).collect()}
    for g, e in exact.items():
        assert abs(per[g] - e) / e < 0.05


def test_hll_streaming_merge_equals_batch(spark, tmp_path):
    """The HLL sibling of the streaming CMS contract: each micro-batch
    persists its own binary sketch via foreachBatch; hll_merge over the
    accumulated per-batch sketches must land within the sketch's
    error band of the one-pass batch build AND of the true cardinality
    — per-landing distinct-count maintenance without rescanning
    history."""
    from pyspark.sql import types as T

    from serverless_data_pipeline_spark.operators.sketches import (
        hll_build, hll_estimate, hll_merge,
    )
    schema = T.StructType([T.StructField("v", T.StringType())])
    src = str(tmp_path / "src")
    sk_dir = str(tmp_path / "sk")
    rows = [(f"u{i % 431}",) for i in range(2000)]
    spark.createDataFrame(rows, schema).repartition(3) \
        .write.mode("overwrite").parquet(src)

    n_batches = []

    def _tick(batch_df, bid):
        n_batches.append(bid)
        hll_build(batch_df, "v").write.mode("append").parquet(sk_dir)

    q = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(_tick)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(n_batches) >= 2
    merged = hll_estimate(
        hll_merge(spark.read.parquet(sk_dir))).first().n_distinct_est
    direct = hll_estimate(
        hll_build(spark.read.parquet(src), "v")).first().n_distinct_est
    assert abs(merged - direct) / direct < 0.02
    assert abs(merged - 431) / 431 < 0.05
