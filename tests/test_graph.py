"""Laws for the fixed-iteration PageRank operator."""

import pytest
from pyspark.sql import functions as F

from serverless_data_pipeline_spark.operators.graph import pagerank


def _ranks(spark, rows, **kw):
    e = spark.createDataFrame(rows, "src long, dst long")
    return {r.id: r.rank for r in pagerank(e, **kw).collect()}


def test_pagerank_star_hub_dominates(spark):
    """Undirected star: the hub must outrank every leaf, leaves tie
    exactly (identical in-neighborhoods -> identical integer ranks),
    and total mass stays ~1 (micro-unit rounding drift only)."""
    rows = [(0, i) for i in range(1, 9)]
    r = _ranks(spark, rows, undirected=True)
    assert len(r) == 9
    leaves = {r[i] for i in range(1, 9)}
    assert len(leaves) == 1
    assert r[0] > leaves.pop()
    assert abs(sum(r.values()) - 1.0) < 1e-4


def test_pagerank_cycle_uniform_and_dedup(spark):
    """Directed 4-cycle: perfect symmetry -> all ranks exactly equal;
    duplicate edges and self-loops must not perturb the result."""
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    noisy = cyc + [(0, 1), (2, 2)]
    r1, r2 = _ranks(spark, cyc), _ranks(spark, noisy)
    assert r1 == r2
    assert len(set(r1.values())) == 1
    assert abs(sum(r1.values()) - 1.0) < 1e-4


def test_pagerank_dangling_mass_redistributed(spark):
    """Directed chain 0->1->2: node 2 dangles; its mass must be
    redistributed (total stays ~1, not leaking to ~0), and downstream
    nodes accumulate more rank than the source."""
    r = _ranks(spark, [(0, 1), (1, 2)])
    assert abs(sum(r.values()) - 1.0) < 1e-3
    assert r[2] > r[1] > r[0]


def test_pagerank_iteration_determinism_and_args(spark):
    """Same input -> bit-identical output across runs (integer ranks);
    iters < 1 raises."""
    rows = [(i, (i * 3 + 1) % 7) for i in range(7)]
    assert _ranks(spark, rows, iters=3) == _ranks(spark, rows, iters=3)
    with pytest.raises(ValueError):
        _ranks(spark, rows, iters=0)


def test_pagerank_partition_independence(spark):
    """Integer micro-unit ranks must be bit-identical whatever the
    input partitioning — per-edge contributions round to longs BEFORE
    the order-free integer sum, so no float fold order can leak in."""
    rows = [(i, (i * 7 + 3) % 23) for i in range(23)] + \
           [(i, (i * 5 + 1) % 23) for i in range(23)]
    e2 = spark.createDataFrame(rows, "src long, dst long").repartition(2)
    e9 = spark.createDataFrame(rows, "src long, dst long").repartition(9)
    r2 = {r.id: r.rank for r in pagerank(e2, iters=4).collect()}
    r9 = {r.id: r.rank for r in pagerank(e9, iters=4).collect()}
    assert r2 == r9
