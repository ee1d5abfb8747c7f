"""As-of join, dedup, top-k, range join, sessionize (SURVEY §2.3-2.6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from serverless_data_pipeline_spark.operators.relational import (
    asof_join, bucketed_range_join, dedupe_latest, range_join, sessionize,
    top_k, top_k_per_group,
)


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(1)), (2, "k", _ts(5)), (3, "k", _ts(10))],
        "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(2), 20.0), ("k", _ts(5), 50.0)],
        "k string, ts timestamp, px double")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    right_value_cols=["px"])
    got = {r.id: r.px for r in out.collect()}
    # t=1: no right row at/before -> NULL; t=5: exact match visible
    assert got == {1: None, 2: 50.0, 3: 50.0}


def test_asof_join_strict(spark):
    left = spark.createDataFrame([(1, "k", _ts(5))],
                                 "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(2), 20.0), ("k", _ts(5), 50.0)],
        "k string, ts timestamp, px double")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    right_value_cols=["px"], strict=True)
    assert out.first().px == 20.0  # equal-ts right row not visible


def test_dedupe_latest(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), "old"), (1, _ts(9), "new"), (2, _ts(3), "only")],
        "k long, ts timestamp, v string")
    out = dedupe_latest(df, ["k"], [F.col("ts").desc()])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "new", 2: "only"}


def test_top_k_and_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 2), ("b", 9), ("b", 8)], "g string, v int")
    assert [r.v for r in top_k(df, [F.col("v").desc()], 2).collect()] == [9, 8]
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], 1)
    got = {r.g: r.v for r in out.collect()}
    assert got == {"a": 3, "b": 9}


def test_range_join_broadcast(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 15.0)], "id long, x double")
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 20.0)],
        "band string, lo double, hi double")
    out = range_join(pts, bands,
                     (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
    got = {r.id: r.band for r in out.collect()}
    assert got == {1: "lo", 2: "hi"}


def test_bucketed_range_join_matches_exact(spark):
    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, x double")
    iv = spark.createDataFrame(
        [(100, 2.0, 5.0), (200, 4.0, 12.0)], "iv long, lo double, hi double")
    out = bucketed_range_join(pts, iv, "x", "lo", "hi", F.lit(4.0))
    exact = pts.join(iv, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
    assert (sorted((r.id, r.iv) for r in out.collect())
            == sorted((r.id, r.iv) for r in exact.collect()))


def test_sessionize_gap_splits(spark):
    rows = [("u", _ts(0)), ("u", _ts(10)),
            ("u", dt.datetime(2024, 1, 1, 2, 0, 0)),  # > 30 min gap
            ("v", _ts(5))]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = sessionize(df, "k", "ts", gap_minutes=30)
    u_sessions = {r.session_seq for r in out.filter("k = 'u'").collect()}
    assert u_sessions == {1, 2}
    assert out.filter("k = 'v'").first().session_seq == 1


def test_approx_sketches_error_bounds(spark):
    """The rows-only sketch aggregates (x_approx_suite sketch arm) carry no
    DuckDB oracle (sketch internals differ per engine), so pin their
    accuracy here: HLL++ within its 5% default rsd on a known
    cardinality, and percentile_approx EXACT below the default accuracy
    threshold (10k observations) — the regime the oracle queries run in."""
    from pyspark.sql import functions as F

    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("k"),          # true distinct = 1000
        F.col("id").cast("double").alias("v"))
    got = df.agg(
        F.approx_count_distinct("k").alias("ad"),
        F.percentile_approx("v", 0.5).alias("am"),
        F.expr("percentile(v, 0.5)").alias("em")).collect()[0]
    assert abs(got.ad - 1000) / 1000 <= 0.05       # HLL++ rsd bound
    # below the sketch's accuracy threshold the approx IS the exact
    # percentile (a member of the input, the lower of the middle pair)
    assert got.am == 2499.0
    assert abs(got.em - 2499.5) < 1e-9


def test_bloom_semi_filter_laws(spark):
    """Semi-join reduction laws: NEVER drops a matching row (one-sided
    error — the prefiltered semi join equals the plain semi join);
    actually reduces a selective probe (false positives far below
    passing everything); NULL fact keys are dropped; degenerate
    m_bits/k_hashes raise."""
    import pytest as _pt

    from serverless_data_pipeline_spark.operators.relational import (
        bloom_semi_filter, key_bloom,
    )
    fact = spark.createDataFrame(
        [(i, f"f{i}") for i in range(2000)] + [(None, "fnull")],
        "k long, payload string")
    build = spark.createDataFrame(
        [(i * 100,) for i in range(20)], "bk long")   # 20 of 2000 match
    pre = bloom_semi_filter(fact, build, "k", "bk", m_bits=1 << 14)
    kept = {r.k for r in pre.collect()}
    true_matches = {i * 100 for i in range(20)}
    assert true_matches <= kept                       # no false negative
    assert None not in kept
    assert len(kept) < 300                            # real reduction
    # composed with the actual join: exactly the true semi join
    semi = {r.k for r in pre.join(build, pre.k == build.bk,
                                  "left_semi").collect()}
    assert semi == true_matches
    # bitmap is bounded rows regardless of build size
    assert key_bloom(build, "bk", m_bits=1 << 14).count() <= (1 << 14) // 64
    with _pt.raises(ValueError):
        key_bloom(build, "bk", m_bits=32)
    with _pt.raises(ValueError):
        key_bloom(build, "bk", k_hashes=0)
    # xxhash64 is type-sensitive: an INT fact key against a BIGINT build
    # key must still keep every true match (hash inputs normalized),
    # and the output schema must keep the original key type
    fact_i = spark.createDataFrame([(i, f"f{i}") for i in range(200)],
                                   "k int, payload string")
    pre_i = bloom_semi_filter(fact_i, build, "k", "bk", m_bits=1 << 14)
    assert {r.k for r in pre_i.collect()} >= {i * 100 for i in range(2)}
    assert dict(pre_i.dtypes)["k"] == "int"
    # non-integral type mismatch raises loudly instead of dropping rows
    fact_s = spark.createDataFrame([("5", "x")], "k string, p string")
    with _pt.raises(ValueError):
        bloom_semi_filter(fact_s, build, "k", "bk")
