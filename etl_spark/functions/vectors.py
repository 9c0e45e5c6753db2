"""Embedding-vector functions over ``array<float>`` columns — pure JVM.

``F.zip_with`` / ``F.aggregate`` keep the dot product inside Catalyst (no
Python), which is what lets the ANN operators in
``etl_spark.operators.similarity`` scale: the N x k candidate scoring is a
codegen'd higher-order-function expression, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    """Dot product of two array<numeric> columns."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a, b) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm, NULL when a
    vector is NULL / contains a NULL element / lengths mismatch.

    The three-way split matters for data hygiene: a zero vector is a valid
    "similar to nothing" (score 0.0), but a corrupt vector (null element,
    truncated array) must NOT be asserted non-similar — it propagates NULL,
    which threshold filters and descending rankers naturally exclude, so
    corruption surfaces as absence rather than a confident 0.0."""
    na, nb = l2_norm(a), l2_norm(b)
    return (
        F.when(na.isNull() | nb.isNull(), F.lit(None).cast("double"))
        .when((na > 0) & (nb > 0), dot(a, b) / (na * nb))
        .otherwise(F.lit(0.0))
    )
