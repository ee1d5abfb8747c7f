"""Layout keys for multi-dimensional data skipping (S10 extension).

Single-key range clustering (`sources.writers.write_clustered`) gives
disjoint per-file min/max on ONE column. When scans filter on two
independent columns (user AND time, key AND value band), interleaving the
columns' bits into one Z-order (Morton) key and range-clustering on THAT
keeps every file confined to a small hyper-rectangle — parquet footer
min/max stats then prune files for predicates on EITHER dimension. This is
the technique behind Delta/Iceberg Z-ORDER, expressed as plain Spark
column expressions: pure bit arithmetic inside whole-stage codegen, no
shuffle of its own (the clustering write pays the one range shuffle it
already paid for single-key layout).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2^bits) integer cells over [lo, hi]
    (clamped). Rank-preserving within resolution — exactly what a Z-order
    ingredient needs; lo/hi come from table stats (approx quantiles are
    fine, outliers just clamp into the edge cells)."""
    c = F.col(col) if isinstance(col, str) else col
    cells = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(float(lo))) \
        / F.lit(float(hi - lo) or 1.0) * F.lit(float(cells))
    return F.least(F.lit(cells),
                   F.greatest(F.lit(0), F.round(scaled, 0).cast("long")))


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton interleave of two pre-quantized non-negative integer columns
    (see `quantize`): bit i of x lands at position 2i, bit i of y at
    2i+1. 2*bits OR-terms of shift/mask arithmetic — a fixed-size codegen
    expression, no UDF. Cluster with
    ``write_clustered(df.withColumn("__z", zorder_key(...)), path, ["__z"])``."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    cx, cy = cx.cast("long"), cy.cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(cx, i).bitwiseAND(1), 2 * i))
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(cy, i).bitwiseAND(1), 2 * i + 1))
    return out
