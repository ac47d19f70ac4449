"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (zip_with/aggregate fold is JVM-side; no Python in the
hot path). Fold order is sequential left-to-right, matching the
scalar loop any engine uses, which keeps results comparable."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm2(a) -> Column:
    """Squared L2 norm."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a, b) -> Column:
    """Cosine similarity in double precision: dot/sqrt(na*nb)."""
    return dot(a, b) / F.sqrt(norm2(a) * norm2(b))
