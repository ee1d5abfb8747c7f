"""T1/T2/T3/T5 stage contracts on tiny literal frames (SURVEY §5.2.3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_data_pipeline_spark.operators import stages

TS = dt.datetime(2024, 3, 5, 14, 30, 0)


def test_ingest_stamps_metadata(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = stages.ingest(df, source="api", data_type="json",
                        priority="high", batch_id="b42")
    row = out.first()
    assert (row.source, row.data_type, row.priority, row.batch_id) == \
        ("api", "json", "high", "b42")
    assert row.ingest_ts is not None


def test_validate_splits_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c")], "id long, name string")
    res = stages.validate(df, {"id": T.LongType(), "name": T.StringType()})
    assert sorted(r.id for r in res.valid.collect()) == [1]
    assert res.invalid.count() == 2
    assert not res.is_valid()


def test_validate_missing_column_fails_batch(spark):
    df = spark.createDataFrame([(1,)], "id long")
    res = stages.validate(df, {"id": T.LongType(), "absent": T.StringType()})
    assert res.valid.count() == 0
    assert res.invalid.count() == 1


def test_validate_type_mismatch_fails_batch(spark):
    df = spark.createDataFrame([(1,)], "id int")
    res = stages.validate(df, {"id": T.LongType()})
    assert res.valid.count() == 0


def test_validate_custom_checks(spark):
    df = spark.createDataFrame([(1, 0.5), (2, -1.0)], "id long, v double")
    res = stages.validate(df, {"id": T.LongType()},
                          checks=[F.col("v") >= 0])
    assert [r.id for r in res.valid.collect()] == [1]


def test_transform_cleans_and_derives_partitions(spark):
    df = spark.createDataFrame([("  MiXeD  ", TS)], "name string, ts timestamp")
    out = stages.transform(df)
    row = out.first()
    assert row.name == "mixed"
    assert (row.year, row.month, row.day, row.hour) == (2024, 3, 5, 14)


def test_transform_broadcast_enrich(spark):
    facts = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    dim = spark.createDataFrame([(1, "one")], "k long, label string")
    out = stages.transform(facts, dims={"d": (dim, ["k"])})
    got = {r.k: r.label for r in out.collect()}
    assert got == {1: "one", 2: None}


def test_quality_score_exact_value(spark):
    # 4 rows: col a has 1 null (0.75), col b complete (1.0) -> mean 0.875
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (None, "x")], "a long, b string")
    assert abs(stages.quality_score(df) - 0.875) < 1e-9


def test_quality_score_rules(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "a long")
    # completeness 1.0, rule passes 2/4 -> (1.0 + 0.5)/2 = 0.75
    score = stages.quality_score(df, rules=[F.col("a") <= 2])
    assert abs(score - 0.75) < 1e-9


def test_quality_gate_thresholds():
    assert stages.quality_gate(0.9)
    assert not stages.quality_gate(0.85)  # strict > 0.85
    assert not stages.quality_gate(0.2)


def test_profile_columns_stats_and_null_handling(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        profile_columns,
    )
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", None), (3, None, 8.0), (4, "b", 2.0)],
        "id long, s string, v double")
    p = {r.column: r for r in profile_columns(df).collect()}
    assert p["id"].n_rows == 4 and p["id"].n_null == 0
    assert p["id"].n_distinct == 4
    assert (p["id"].vmin, p["id"].vmax, p["id"].vavg) == (1.0, 4.0, 2.5)
    assert p["id"].smin is None
    assert p["s"].n_null == 1 and abs(p["s"].null_frac - 0.25) < 1e-9
    assert p["s"].n_distinct == 2            # NULL not a distinct value
    assert (p["s"].smin, p["s"].smax) == ("a", "b")
    assert p["s"].vmin is None
    assert p["v"].n_null == 1 and p["v"].n_distinct == 2
    assert (p["v"].vmin, p["v"].vmax, p["v"].vavg) == (2.0, 8.0, 4.0)


def test_profile_columns_single_scan_and_validation(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        profile_columns,
    )
    from serverless_data_pipeline_spark.schemas import load_table
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    plan = profile_columns(ev, ["event_id", "value", "event_type"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1       # every stat from ONE scan
    import pytest
    with pytest.raises(ValueError, match="no such columns"):
        profile_columns(ev, ["nope"])


def test_profile_columns_approx_distinct_within_rsd(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        profile_columns,
    )
    df = spark.range(0, 20_000).withColumnRenamed("id", "k")
    r = profile_columns(df, ["k"], approx_distinct=True, rsd=0.05) \
        .collect()[0]
    assert abs(r.n_distinct - 20_000) / 20_000 < 0.15
    # and the approx plan must NOT contain the multi-distinct Expand
    plan = profile_columns(df, ["k"], approx_distinct=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_quantile_buckets_cuts_and_boundaries(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        quantile_buckets,
    )
    # scores 1..100: exact quartiles q1=25.75, q3=75.25 (linear
    # interpolation at p*(n-1)) -> tail=1..25, head=76..100
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)],
                               "doc_id long, s double")
    out = {r.doc_id: r.bucket
           for r in quantile_buckets(df, "s").collect()}
    assert all(out[i] == "tail" for i in range(1, 26))
    assert all(out[i] == "middle" for i in range(26, 76))
    assert all(out[i] == "head" for i in range(76, 101))
    import pytest
    with pytest.raises(ValueError):
        quantile_buckets(df, "s", cuts=(0.5,), labels=("a",))
    with pytest.raises(ValueError):
        quantile_buckets(df, "s", cuts=(0.7, 0.2))


def test_quantile_buckets_approx_mode_and_plan(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        quantile_buckets,
    )
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 997).cast("double")
        .alias("s"))
    exact = quantile_buckets(df, "s")
    approx = quantile_buckets(df, "s", exact=False)
    ce = {r[0]: r[1] for r in exact.groupBy("bucket").count().collect()}
    ca = {r[0]: r[1] for r in approx.groupBy("bucket").count().collect()}
    for b in ("tail", "middle", "head"):
        assert abs(ce[b] - ca[b]) / ce[b] < 0.05, (b, ce, ca)
    # thresholds ride a 1-row broadcast, never a global sort window
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar join


def test_profile_columns_empty_input_and_quantile_null_scores(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        profile_columns, quantile_buckets,
    )
    # empty frame: no ANSI divide-by-zero; counts 0, fractions NULL
    empty = spark.createDataFrame([], "id long, s string")
    rows = {r.column: r for r in profile_columns(empty).collect()}
    assert rows["id"].n_rows == 0 and rows["id"].null_frac is None
    # NULL scores must get a NULL bucket, not silently land in 'head'
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, None)],
        "doc_id long, s double")
    b = {r.doc_id: r.bucket for r in quantile_buckets(df, "s").collect()}
    assert b[5] is None and b[4] == "head"


def test_flag_outliers_behavior(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        flag_outliers,
    )
    import pytest
    rows = ([("a", 1.0 + (i % 7) * 0.01) for i in range(40)]
            + [("a", 50.0), ("a", None), ("b", 2.0), ("b", 2.1)])
    df = spark.createDataFrame(rows, "k string, v double")
    out = flag_outliers(df, "k", "v")
    flagged = out.filter("is_outlier").collect()
    assert [(r.k, r.v) for r in flagged] == [("a", 50.0)]
    # NULLs are never outliers, and n_g counts non-null values only
    nulls = out.filter("v is null").collect()
    assert len(nulls) == 1 and not nulls[0].is_outlier
    assert nulls[0].n_g == 41
    # a 2-row group has zero z-range: nothing flagged
    assert out.filter("k = 'b' and is_outlier").count() == 0
    with pytest.raises(ValueError):
        flag_outliers(df, "k", "v", z=0)


def test_flag_outliers_partition_order_independent(spark):
    """Decimal accumulation + mirrored double comparison: the flag set
    must not depend on how rows are partitioned (a naive float stddev
    would reduce in partition order)."""
    from serverless_data_pipeline_spark.operators.stages import (
        flag_outliers,
    )
    rows = [("k", 0.1 + (i * 37 % 101) * 0.013) for i in range(400)]
    rows += [("k", 9.5), ("k", -7.25)]
    df1 = spark.createDataFrame(rows, "k string, v double").repartition(1)
    df2 = spark.createDataFrame(rows, "k string, v double").repartition(13)
    f1 = sorted(r.v for r in flag_outliers(df1, "k", "v")
                .filter("is_outlier").collect())
    f2 = sorted(r.v for r in flag_outliers(df2, "k", "v")
                .filter("is_outlier").collect())
    assert f1 == f2 and len(f1) >= 1


def test_flag_outliers_null_key_and_overflow(spark):
    """Row-preserving for NULL keys (null-safe join gives them their
    own group) and overflow-safe: a value whose micro-unit integer
    exceeds DECIMAL(19,0) is flagged unconditionally, never silently
    reported normal."""
    from serverless_data_pipeline_spark.operators.stages import (
        flag_outliers,
    )
    rows = [("a", 1.0), ("a", 1.1), ("a", 1.05), ("a", 1e13),
            (None, 5.0), (None, 5.2)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = flag_outliers(df, "k", "v")
    assert out.count() == 6
    assert [r.v for r in out.filter("is_outlier").collect()] == [1e13]
    nk = out.filter("k is null").collect()
    assert len(nk) == 2 and all(not r.is_outlier for r in nk)
    # the overflow row is excluded from the exact accumulators
    assert out.filter("k = 'a'").first().n_g == 3


def test_profile_columns_interval_and_exact_avg(spark):
    """'interval day to second' startswith 'int' but must NOT take the
    numeric min/max/avg path (the cast to double would fail); vavg is
    micro-unit exact so it can't flip at a round-6 tie with partition
    order."""
    from serverless_data_pipeline_spark.operators.stages import (
        profile_columns,
    )
    df = (spark.range(7)
          .withColumn("ts", F.current_timestamp())
          .withColumn("gap", F.col("ts") - F.col("ts"))
          .withColumn("v", F.col("id") * 0.5))
    out = {r.column: r for r in profile_columns(df).collect()}
    assert out["gap"].vavg is None and out["gap"].vmin is None
    assert out["v"].vavg == 1.5        # exact: (0+.5+...+3)/7
    # partition-order independence of the exact accumulation
    out13 = {r.column: r.vavg
             for r in profile_columns(df.repartition(13)).collect()}
    assert out13["v"] == out["v"].vavg


def test_quantile_buckets_per_group_mode(spark):
    """by=<group>: thresholds are computed within each group — a doc
    that is 'head' globally can be 'tail' within its own group; NULL
    group keys form their own threshold group and are row-preserved
    (null-safe join); NULL scores still bucket NULL."""
    from serverless_data_pipeline_spark.operators.stages import (
        quantile_buckets,
    )
    rows = ([("a", i, float(i)) for i in range(8)]            # a: 0..7
            + [("b", 100 + i, float(100 + i)) for i in range(8)]
            + [(None, 200, 3.0), (None, 201, 103.0)]
            + [("a", 300, None)])
    df = spark.createDataFrame(rows, "grp string, id long, s double")
    out = {r.id: r.bucket for r in quantile_buckets(
        df, "s", by="grp", round_scale=6).collect()}
    assert len(out) == 19                       # row-preserving
    # group b's lowest score (100) beats ALL of group a, but is 'tail'
    # within b — the per-group cut in action
    assert out[100] == "tail" and out[107] == "head"
    assert out[0] == "tail" and out[7] == "head"
    assert out[300] is None                     # NULL score -> NULL
    # the two NULL-group rows bucket against each other, not group a/b
    assert out[200] == "tail" and out[201] == "head"
    # global mode unchanged: 100..107 are all 'head' globally
    gout = {r.id: r.bucket for r in quantile_buckets(
        df, "s", round_scale=6).collect()}
    assert all(gout[100 + i] == "head" for i in range(4, 8))


# ---- r8: dataset-version drift (profile_drift / mix_shift) ----

def test_profile_drift_deltas_and_schema_drift(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        profile_drift,
    )
    a = spark.createDataFrame(
        [(1, 10.0, "en"), (2, 20.0, "en"), (3, None, "de"), (4, 30.0, "de")],
        "id long, v double, lang string")
    # B: one more null, narrower values, an extra column, id dropped
    b = spark.createDataFrame(
        [(10.0, "en", 1), (None, "en", 2), (None, "de", 3), (10.0, "de", 4)],
        "v double, lang string, extra long")
    out = {r.column: r for r in profile_drift(a, b).collect()}
    assert out["id"].status == "removed" and out["extra"].status == "added"
    assert out["v"].status == "both"
    # null fraction 1/4 -> 2/4
    assert out["v"].null_frac_delta == 0.25
    # distinct rate 3/4 -> 1/4
    assert out["v"].distinct_rate_a == 0.75
    assert out["v"].distinct_rate_b == 0.25
    assert out["v"].distinct_rate_delta == -0.5
    # vavg 20 -> 10
    assert out["v"].vavg_delta == -10.0
    assert out["v"].vmin_delta == 0.0 and out["v"].vmax_delta == -20.0
    # added/removed columns carry one-sided stats, NULL deltas
    assert out["id"].n_rows_a == 4 and out["id"].n_rows_b is None
    assert out["id"].null_frac_delta is None
    assert out["lang"].vavg_delta is None  # string column


def test_profile_drift_from_profiles_equals_corpus_form(spark):
    """The precomputed-profiles form (r10 verdict #2) is BIT-IDENTICAL
    to the corpus form — every delta derives from the profile rows
    alone, including added/removed schema drift and string columns."""
    from serverless_data_pipeline_spark.operators.stages import (
        profile_columns, profile_drift, profile_drift_from_profiles,
    )
    a = spark.createDataFrame(
        [(1, 10.0, "en"), (2, 20.0, "en"), (3, None, "de"),
         (4, 30.0, "de")],
        "id long, v double, lang string")
    b = spark.createDataFrame(
        [(10.0, "en", 1), (None, "en", 2), (None, "de", 3),
         (10.0, "de", 4)],
        "v double, lang string, extra long")
    corpus = {r.column: r.asDict() for r in profile_drift(a, b).collect()}
    prof = {r.column: r.asDict()
            for r in profile_drift_from_profiles(
                profile_columns(a), profile_columns(b)).collect()}
    assert corpus == prof


def test_mix_shift_terms_and_summary(spark):
    import math

    from serverless_data_pipeline_spark.operators.stages import (
        mix_shift, mix_shift_summary,
    )
    a = spark.createDataFrame(
        [("en",)] * 3 + [("de",)], "lang string")
    b = spark.createDataFrame(
        [("en",)] * 2 + [("xx",)] * 2, "lang string")
    per = {r.category: r for r in mix_shift(a, b, "lang").collect()}
    assert set(per) == {"en", "de", "xx"}
    assert (per["en"].frac_a, per["en"].frac_b) == (0.75, 0.5)
    assert per["de"].n_b == 0 and per["xx"].n_a == 0
    # psi term: eps-clamped hand computation
    for cat in per:
        p, q = max(per[cat].frac_a, 1e-6), max(per[cat].frac_b, 1e-6)
        assert per[cat].psi_term == round((p - q) * math.log(p / q), 6)
        assert per[cat].psi_term >= 0
        m = (per[cat].frac_a + per[cat].frac_b) / 2
        js = 0.5 * ((per[cat].frac_a * math.log(per[cat].frac_a / m)
                     if per[cat].frac_a > 0 else 0.0)
                    + (per[cat].frac_b * math.log(per[cat].frac_b / m)
                       if per[cat].frac_b > 0 else 0.0))
        assert per[cat].js_term == round(js, 6) + 0.0
    s = mix_shift_summary(a, b, "lang").first()
    assert (s.n_categories, s.n_cat_a, s.n_cat_b) == (3, 2, 2)
    assert (s.n_added, s.n_removed) == (1, 1)
    # tvd = 0.5 * (|0.75-0.5| + |0.25-0| + |0-0.5|) = 0.5
    assert s.tvd == 0.5
    assert s.psi == round(sum(r.psi_term for r in per.values()), 6)
    # JS divergence is bounded by ln 2 and >= 0
    assert 0 <= s.js <= math.log(2) + 1e-9


def test_mix_shift_null_category_and_identical_versions(spark):
    from serverless_data_pipeline_spark.operators.stages import (
        mix_shift, mix_shift_summary,
    )
    a = spark.createDataFrame([("en",), (None,)], "lang string")
    per = {r.category: r for r in mix_shift(a, a, "lang").collect()}
    # NULL categories are their own category, never dropped
    assert None in per and per[None].n_a == per[None].n_b == 1
    # identical versions -> every shift statistic exactly zero
    s = mix_shift_summary(a, a, "lang").first()
    assert (s.psi, s.js, s.tvd) == (0.0, 0.0, 0.0)
    assert all(r.psi_term == 0.0 and r.js_term == 0.0 for r in per.values())


def test_mix_shift_no_join_plan(spark):
    """The tag-union formulation must plan as ONE hash aggregation on
    the category with the totals as a window over the tiny counts
    frame — no join of any kind, no second scan of either version."""
    from serverless_data_pipeline_spark.operators.stages import mix_shift
    a = spark.range(100).selectExpr("CAST(id % 3 AS STRING) AS lang")
    b = spark.range(80).selectExpr("CAST(id % 5 AS STRING) AS lang")
    plan = (mix_shift(a, b, "lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    # each version scanned exactly once (Range appears once per input)
    assert plan.count("Range (0, 100") == 1
    assert plan.count("Range (0, 80") == 1


def test_flag_outliers_cardinality_derived_cutoff(spark):
    """The overflow cutoff derives from max_group_rows so that
    n * v_max^2 provably fits DECIMAL(38,0): at the default bound a
    |v| just above ~1e8 (1e14 micro-units) is auto-flagged and
    excluded from the stats; tightening max_group_rows tightens the
    cutoff proportionally."""
    import math

    import pytest as _pt

    from serverless_data_pipeline_spark.operators.stages import (
        flag_outliers,
    )
    cutoff = math.isqrt((10 ** 38 - 1) // 10 ** 10)  # default bound
    assert cutoff < 10 ** 14  # n * v_max^2 <= 1e38 - 1 by construction
    assert 10 ** 10 * cutoff * cutoff <= 10 ** 38 - 1
    just_over = (cutoff + 1) / 1e6
    rows = [("a", 1.0), ("a", 1.2), ("a", just_over)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = flag_outliers(df, "k", "v")
    flagged = [r.v for r in out.filter("is_outlier").collect()]
    assert flagged == [just_over]
    assert out.filter("k = 'a'").first().n_g == 2
    # a huge allowed group bound forces a much lower per-value cutoff
    out2 = flag_outliers(df, "k", "v", max_group_rows=10 ** 20)
    assert [r.v for r in out2.filter("is_outlier").collect()] == [just_over]
    with _pt.raises(ValueError):
        flag_outliers(df, "k", "v", max_group_rows=0)
    # BOTH exact aggregates are provably in range (r8 ADVICE): the
    # quadratic bound covers n*v^2 in DECIMAL(38,0), and past
    # max_group_rows ~1e20 the LINEAR bound n*v in the plain sum's
    # DECIMAL(29,0) becomes binding and must take over
    from serverless_data_pipeline_spark.operators.stages import (
        outlier_value_cutoff,
    )
    for mgr in (1, 10 ** 10, 10 ** 19, 10 ** 20, 10 ** 21, 10 ** 25):
        c = outlier_value_cutoff(mgr)
        assert mgr * c * c <= 10 ** 38 - 1
        assert mgr * c <= 10 ** 29 - 1
        assert (mgr * (c + 1) * (c + 1) > 10 ** 38 - 1
                or mgr * (c + 1) > 10 ** 29 - 1)  # tight, not lax
    assert outlier_value_cutoff(10 ** 10) == cutoff  # default unchanged
    # crossover: linear bound binds above ~1e20
    assert outlier_value_cutoff(10 ** 21) == (10 ** 29 - 1) // 10 ** 21


def test_sketch_vs_exact_parity_on_real_fixtures(spark):
    """The 100 TB paths — profile_columns(approx_distinct=True) and
    quantile_buckets(exact=False) — pinned against their exact
    siblings on the REAL fixture tables at the largest local scale
    (sf0.1), so the sketch path cannot silently diverge: HLL++
    distinct estimates within the configured rsd band (x3 headroom),
    KLL bucket assignments within a small reassignment band around
    the exact thresholds."""
    import os

    from serverless_data_pipeline_spark.operators.stages import (
        profile_columns, quantile_buckets,
    )
    from serverless_data_pipeline_spark.schemas import load_table
    sf = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR",
                        "/root/testdata/sf0.1")
    ev = load_table(spark, sf, "events")
    cols = ["event_id", "user_id", "value", "event_type"]
    exact = {r.column: r for r in profile_columns(ev, cols).collect()}
    approx = {r.column: r
              for r in profile_columns(ev, cols, approx_distinct=True,
                                       rsd=0.05).collect()}
    for c in cols:
        e, a = exact[c], approx[c]
        # every non-sketch stat must be IDENTICAL (same single scan)
        assert (e.n_rows, e.n_null, e.null_frac) == \
            (a.n_rows, a.n_null, a.null_frac), c
        assert (e.vmin, e.vmax, e.vavg) == (a.vmin, a.vmax, a.vavg), c
        # the sketch estimate within 3x the configured rsd
        if e.n_distinct > 0:
            rel = abs(a.n_distinct - e.n_distinct) / e.n_distinct
            assert rel <= 0.15, (c, e.n_distinct, a.n_distinct)
    # quantile buckets: approx thresholds may reassign only rows near
    # the exact cut — bound the disagreement fraction
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").cast("double").alias("s"))
    je = quantile_buckets(docs, "s").withColumnRenamed("bucket", "be")
    ja = (quantile_buckets(docs, "s", exact=False, accuracy=10_000)
          .withColumnRenamed("bucket", "ba").select("doc_id", "ba"))
    both = je.join(ja, "doc_id")
    n = both.count()
    diff = both.filter("be <> ba").count()
    assert n == docs.count()
    assert diff / n <= 0.02, f"{diff}/{n} bucket reassignments"
