"""Vector column functions for embedding similarity (BASELINE.json
north-star). Pure Spark built-ins over ``array<float>`` columns —
``zip_with`` + ``aggregate`` keep the arithmetic JVM-side; floats are widened
to double before any accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product: left-to-right fold over the element-wise products."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n > 0, d / n)


def let(value, body):
    """Expression-level let-binding: evaluate ``value`` ONCE per row and
    let ``body`` (a lambda receiving the bound Column) reference it any
    number of times.

    Implemented as transform-over-a-singleton-array: the lambda variable
    is bound to the evaluated element, so downstream references are
    cheap reads. This matters because Catalyst's CollapseProject inlines
    chained select expressions — an expensive interpreted HOF chain
    (n-gram builds, hash arrays) referenced k times downstream is
    re-evaluated k times; measured 6-10x blowups in the winnowing
    operator before binding (operators/textstats.py).
    """
    from pyspark.sql import functions as F

    return F.get(F.transform(F.array(value), body), 0)
