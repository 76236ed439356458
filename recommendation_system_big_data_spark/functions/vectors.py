"""Vector math over ARRAY<FLOAT> columns — built-in higher-order functions.

All JVM-side (`aggregate`/`zip_with`/`transform`): no Python UDF in the hot
path, so cosine scoring stays inside whole-stage codegen. Floats are widened
to double BEFORE any arithmetic; `aggregate` folds left-to-right, so sums
are order-deterministic and reproducible against a sequential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i, left-to-right fold over a double array."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
