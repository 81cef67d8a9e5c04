"""Embedding math as built-in higher-order functions (north star).

Everything is zip_with/aggregate over array<double> — JVM-side, no
UDF, so similarity scans vectorize and scale as map-only passes.
Arrays are cast to double BEFORE any arithmetic: float math would
diverge from any double-computing oracle, and the left-fold
`aggregate` makes the summation order deterministic (matches a serial
dot product bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double_array(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        as_double_array(a), as_double_array(b), lambda x, y: (x - y) * (x - y)
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def sq_norm(a: Column | str) -> Column:
    """Squared L2 norm — the zero-vector test (sq_norm > 0) without
    the sqrt."""
    return dot(a, a)
