"""Vector math over ``array<float>`` columns — JVM-side expressions.

Used by the similarity-search operators on the ``embeddings`` fixture
(FIXTURES.md).  All arithmetic is done in double precision with a
strict left-to-right fold (``aggregate``) so results are reproducible
and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two ``array<numeric>`` columns (double)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an ``array<numeric>`` column (double)."""
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<numeric>`` columns (double)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
