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


def unit(a) -> Column:
    """Unit-norm copy of ``a``, for rank-only cosine work: computing
    ``dot(unit(a), unit(b))`` per PAIR costs one fold instead of
    cosine()'s three (the two norm folds become per-VECTOR work done
    before the pair join — in an all-pairs block that is the
    difference between O(pairs·3d) and O(pairs·d + vectors·2d)).

    The inverse norm is let-bound via the array-of-struct trick: an
    outer expression referenced inside an HOF lambda re-evaluates per
    element, and projection collapse re-inlines a plain column alias
    (the _grams lesson in llm/quality.py) — binding (vector, norm) as
    a struct lambda variable makes the inner norm reference a cheap
    slot read, evaluated once per row."""
    return F.element_at(
        F.transform(
            F.array(F.struct(a.alias("v"), F.sqrt(norm2(a)).alias("n"))),
            lambda s: F.transform(s["v"], lambda x: x / s["n"])),
        1)
