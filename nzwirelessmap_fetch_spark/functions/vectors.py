"""Vector math over ``array<float>`` columns — built-in higher-order
functions only (JVM codegen, no UDF).

Determinism contract: every reduction is an explicit left-to-right
``aggregate`` fold in DOUBLE, so dot products / norms are bit-identical
across engines and across partitionings (float→double widening is exact;
IEEE-754 +,*,/,sqrt are correctly rounded everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
