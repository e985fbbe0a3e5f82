"""Vector math over ``array<float>`` columns via higher-order functions.

All JVM-side (``zip_with`` / ``aggregate`` / ``transform``) — no Python in
the hot path. Inputs are cast to double element-wise before arithmetic so
results match the DuckDB oracle (which computes in double).

These are the primitives for brute-force cosine top-k; the scale path
(LSH bucketing) lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns."""
    products = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    squares = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(squares, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe for zero vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
