"""Vector math over ``ArrayType(FloatType)`` embedding columns.

Pure Spark SQL higher-order functions (``zip_with`` + ``aggregate``), so the
whole computation stays inside whole-stage codegen — no Python boundary, no
MLlib ``Vector`` conversion. All arithmetic is promoted to DOUBLE and folded
left-to-right, which makes the results bit-identical to a DuckDB
``list_dot_product`` on ``DOUBLE[]`` (also a left-to-right double fold) —
important for oracle-parity checks.

At 100 TB these expressions vectorize per-row with no shuffle; a brute-force
top-k over them is a single scan + ``TakeOrderedAndProject``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ a[i]*b[i] as a double fold (left-to-right, deterministic)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        _as_double(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a||b|); NULL when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)


# ------------------------------------------------ known-dim fast variants

def dot_product_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Unrolled Σ a[i]*b[i] for a KNOWN dimension: a chain of element_at
    multiply-adds, left-to-right — bit-identical to the aggregate() fold
    (same addition order) but whole-stage-codegen-able, unlike
    higher-order functions which Spark evaluates interpreted. Prefer this
    in scoring hot paths where the embedding dim is known (it always is:
    the query vector's length)."""
    aa, bb = _as_double(a), _as_double(b)
    acc: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(aa, i) * F.element_at(bb, i)
    return acc


def l2_norm_fixed(a: Column | str, dim: int) -> Column:
    aa = _as_double(a)
    acc: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        v = F.element_at(aa, i)
        acc = acc + v * v
    return F.sqrt(acc)


def cosine_similarity_fixed(a: Column | str, b: Column | str,
                            dim: int) -> Column:
    """dot(a,b)/(|a||b|) with every fold unrolled (see dot_product_fixed);
    NULL when either norm is zero. Bit-identical to cosine_similarity."""
    denom = l2_norm_fixed(a, dim) * l2_norm_fixed(b, dim)
    return F.when(denom != 0.0, dot_product_fixed(a, b, dim) / denom)
