"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- ``brute_force_topk``  exact cosine top-k. The query side is broadcast (a
                        handful of probe vectors vs. the corpus), scoring is a
                        codegen'd higher-order-function expression
                        (functions/vectors.py) — no Python, no shuffle besides
                        the final per-query top-k (tiny).
- ``lsh_topk``          random-hyperplane LSH: bucket = sign-bit string of dot
                        products with ``n_planes`` deterministic pseudo-random
                        hyperplanes; candidates = corpus rows in the query's
                        bucket (multi-probe across bands). At 10^9 vectors the
                        scoring join touches only colliding buckets instead of
                        the full corpus. Recall is checked against brute force
                        in tests, not assumed.

Determinism: ranking ties are broken by vector id so N-core and 4N-core runs
(and the DuckDB oracle) agree exactly (SURVEY §7.3 R2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_spark.functions.vectors import cosine_similarity


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` must have (query_id_col, vec_col). Scores are computed in
    double precision and rounded to 6 places before ranking; ties break on
    neighbor id ascending. Self-matches (same id) are excluded when the query
    id domain overlaps the corpus id domain.
    """
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("score", F.round(cosine_similarity("_qv", "_cv"), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "score", "rank")
    )


def _plane_component(plane: int, dim, seed: int):
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = F.xxhash64(F.lit(plane), dim, F.lit(seed))
    return (F.pmod(h, F.lit(2_000_000)) - F.lit(1_000_000)) / 1_000_000.0


def lsh_bucket(vec_col, n_planes: int = 8, seed: int = 7):
    """Sign-bit bucket id (0 .. 2^n_planes-1) for a vector column.

    dot(v, plane_p) = sum_i v[i] * u(p, i); all JVM higher-order functions.
    """
    v = _as_double(vec_col)
    bucket = F.lit(0)
    for p in range(n_planes):
        dot_p = F.aggregate(
            F.zip_with(
                v,
                F.transform(v, lambda _x, i: _plane_component(p, i, seed)),
                lambda x, u: x * u,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bucket = bucket + F.when(dot_p >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH bucket.

    Same output schema as ``brute_force_topk``; per-query recall measured in
    tests. For higher recall stack multiple (seeded) bucket tables — each adds
    one cheap equi-join.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
        lsh_bucket(F.col(vec_col), n_planes, seed).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        _as_double(F.col(vec_col)).alias("_qv"),
        lsh_bucket(F.col(vec_col), n_planes, seed).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("score", F.round(cosine_similarity("_qv", "_cv"), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "score", "rank")
    )
