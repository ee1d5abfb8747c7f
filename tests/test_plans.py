"""Plan-shape regression tests: the scale discipline (pushdown, partial
aggregation, broadcast, column pruning) must stay visible in the physical
plans — a correct result from a bad plan is a 100 TB outage in waiting."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "t7_filter")
    scan = plan[plan.index("FileScan"):]
    assert "PushedFilters" in scan
    assert "l_quantity" in scan.split("PushedFilters")[1][:200]


def test_projection_prunes_scan_columns(spark):
    plan = _plan(spark, "t7_filter")
    read_schema = plan.split("ReadSchema")[-1]
    assert "l_extendedprice" not in read_schema  # unused column not read


def test_agg_is_partial_then_final(spark):
    plan = _plan(spark, "g1_groupby_agg")
    assert "partial_sum" in plan            # map-side combine
    assert plan.count("HashAggregate") >= 2


def test_small_dim_broadcasts(spark):
    plan = _plan(spark, "j4_broadcast_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_plans_take_ordered(spark):
    plan = _plan(spark, "srt_topk")
    assert "TakeOrderedAndProject" in plan   # O(k) heap, not a full sort


def test_asof_join_single_shuffle(spark):
    plan = _plan(spark, "j7_asof_join")
    # union + one window pass: exactly one hash-partition exchange on the
    # join key; a per-group loop or join+filter plan would show more.
    assert plan.count("Exchange hashpartitioning") == 1


def test_no_cartesian_in_dedup(spark):
    for name in ("x2_minhash_lsh", "x2_ngram_jaccard", "x2_simhash"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
