"""Frequency-sketch operators (charter extension, approx family).

Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications") as plain
DataFrame aggregation — the point-frequency sibling of the HLL
(distinct-count) and KLL (quantile) sketches already in the approx
suite. Complements them with one-sided-error frequency estimates:
``estimate >= true count`` always, and the overestimate is bounded by
``e * N / width`` with probability ``1 - e^-depth``.

Scale shape: the build is one explode (depth rows per token) into one
bounded groupBy — the sketch has at most ``depth * width`` cells no
matter the corpus size, so partial aggregation crushes the shuffle to
executor-count * cells; the result broadcasts anywhere. Estimation
probes are broadcast joins against that tiny cell frame. This is the
standard mergeable-summary pattern for 100 TB frequency stats: sketches
from independent batches merge by cell-wise addition (``cms_merge``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_estimate", "cms_merge",
           "hll_build", "hll_merge", "hll_estimate"]


def _cell(value_col, k: int, width: int, seed: int):
    """Row-k cell index for a value: seeded xxhash64 pmod width."""
    return F.pmod(F.xxhash64(value_col, F.lit(seed + k)),
                  F.lit(width)).cast("int")


def cms_build(df: DataFrame, col: str, *, depth: int = 4,
              width: int = 1024, seed: int = 0) -> DataFrame:
    """Build a Count-Min sketch over a value column. Returns the sketch
    as a DataFrame of occupied cells ``(row, col, cnt)`` — at most
    ``depth * width`` rows regardless of input size (absent cells are
    zero). Weighted builds can pre-aggregate and pass repeated rows."""
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    v = F.col(col)
    cells = F.array(*[
        F.struct(F.lit(k).alias("row"),
                 _cell(v, k, width, seed).alias("col"))
        for k in range(depth)])
    return (df.where(v.isNotNull())
            .select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.col").alias("col"))
            .agg(F.count("*").alias("cnt")))


def cms_estimate(cms: DataFrame, items: DataFrame, col: str, *,
                 depth: int = 4, width: int = 1024,
                 seed: int = 0) -> DataFrame:
    """Point-frequency estimates for ``items[col]`` against a built
    sketch: min over the depth row counters (0 when a probed cell is
    empty). depth/width/seed MUST match the build. Returns the items
    frame with an ``est`` column (long, one-sided: ``est >= true``).

    The sketch side is tiny (<= depth*width cells) and broadcasts, so
    probing any number of items never shuffles them. Row-preserving:
    every input row comes back exactly once (duplicates each keep
    their own row — a per-row unique regroup key, whose values never
    reach the output, carries multiplicity through the probe explode);
    a NULL probe value gets ``est`` NULL (the sketch never counted
    NULLs, so its frequency is undefined, not 0)."""
    v = F.col(col)
    # every internal column is __cms_-prefixed and the sketch side is
    # re-aliased before the join, so an items frame that itself has
    # row/col/cnt columns can never make the probe ambiguous
    probes = (items.withColumn("__cms_rid",
                               F.monotonically_increasing_id())
              .select("*", F.explode(F.array(*[
                  F.struct(F.lit(k).alias("row"),
                           _cell(v, k, width, seed).alias("col"))
                  for k in range(depth)])).alias("__cms_c"))
              .select("*",
                      F.col("__cms_c.row").alias("__cms_row"),
                      F.col("__cms_c.col").alias("__cms_col"))
              .drop("__cms_c"))
    sk = F.broadcast(cms.select(F.col("row").alias("__cms_row"),
                                F.col("col").alias("__cms_col"),
                                F.col("cnt").alias("__cms_cnt")))
    joined = probes.join(sk, ["__cms_row", "__cms_col"], "left")
    keys = [c for c in items.columns]
    return (joined.groupBy("__cms_rid", *keys)
            .agg(F.when(F.first(v, ignorenulls=False).isNull(),
                        F.lit(None))
                 .otherwise(F.min(F.coalesce(F.col("__cms_cnt"),
                                             F.lit(0))))
                 .cast("long").alias("est"))
            .drop("__cms_rid"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (depth, width, seed):
    cell-wise counter addition — the property that makes CMS usable
    across incrementally-landed batches (build per batch, merge, probe
    the union without rescanning old batches)."""
    return (a.unionByName(b)
            .groupBy("row", "col")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def hll_build(df: DataFrame, col: str, *, by: tuple[str, ...] = (),
              lg_k: int = 12) -> DataFrame:
    """Mergeable distinct-count sketch (Apache DataSketches HLL via
    Spark's built-in ``hll_sketch_agg``): one binary sketch per group
    (~2^lg_k bytes, relative error ~1.04/sqrt(2^lg_k) ≈ 1.6 % at the
    default). The CORPUS-MAINTENANCE form of approx_count_distinct:
    the sketch is a VALUE — persist per batch/partition, ``hll_merge``
    across batches, estimate any union without rescanning history —
    which a plain approx_count_distinct aggregate can't do. Columns:
    (*by, hll_sketch binary)."""
    agg = F.hll_sketch_agg(F.col(col), int(lg_k)).alias("hll_sketch")
    return (df.groupBy(*by).agg(agg) if by
            else df.agg(agg))


def hll_merge(sketches: DataFrame, *, by: tuple[str, ...] = ()) -> DataFrame:
    """Union sketches (register-wise max — associative, commutative,
    idempotent): the incremental-batch combine, same role as
    ``cms_merge``. One caveat CMS doesn't have: the ESTIMATE read off
    a union can differ from a one-pass build's by a fraction of a
    percent (the estimator loses the insertion-history accumulator),
    so downstream comparisons should band, not bit-match. Sketches
    built at DIFFERENT lg_k raise rather than silently unioning down
    to the coarser precision (the bloom_semi_filter discipline: loud
    beats quietly quadrupling the error band).
    Input/output: (*by, hll_sketch)."""
    agg = F.hll_union_agg(F.col("hll_sketch"), False).alias("hll_sketch")
    return (sketches.groupBy(*by).agg(agg) if by
            else sketches.agg(agg))


def hll_estimate(sketches: DataFrame,
                 *, by: tuple[str, ...] = ()) -> DataFrame:
    """Read the distinct-count estimate out of sketches:
    (*by, n_distinct_est bigint)."""
    est = F.hll_sketch_estimate(F.col("hll_sketch")).alias("n_distinct_est")
    return sketches.select(*by, est)
