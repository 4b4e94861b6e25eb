"""Vector distance functions on array<float> columns — JVM built-ins only.

Parity: function/sql/vector/SQLFunctionVector{CosineSimilarity,L1Distance,
L2Distance,LinfDistance,DotProduct,Normalize}.java.  ``F.zip_with`` +
``F.aggregate`` keep the arithmetic inside codegen — a Python UDF here
would be the classic 100× slow path at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a, b) -> Column:
    return dot_product(a, b) / (_norm(a) * _norm(b))


def l2_distance(a, b) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l1_distance(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def linf_distance(a, b) -> Column:
    return F.array_max(F.zip_with(_c(a), _c(b), lambda x, y: F.abs(x - y)))


def normalize(a) -> Column:
    n = _norm(a)
    return F.transform(_c(a), lambda v: v / n)
