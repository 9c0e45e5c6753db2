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


def _not_self(neighbor_col: str, query_col: str, same_type: bool):
    """Self-match exclusion that survives mixed id types and NULLs.

    Self-matches only exist when the two id domains coincide, which implies
    the same type: with ``same_type`` the ids compare null-safely (a raw
    ``!=`` nulls out for null ids). With DIFFERENT types the domains are
    disjoint by construction, so NOTHING is excluded — a raw ``!=`` would
    coerce (string vs long -> NULL) and silently drop EVERY candidate, and
    a canonical-string compare would falsely drop long 5 against query id
    \"5\".
    """
    if not same_type:
        return F.lit(True)
    return ~F.col(neighbor_col).eqNullSafe(F.col(query_col))


def _rank_topk(scored: DataFrame, k: int, query_id_col: str) -> DataFrame:
    """Distributed per-query top-k over (query, neighbor_id, score) rows.

    A naive ``row_number() OVER (PARTITION BY query)`` funnels every scored
    row of a query through ONE reducer — 10^9 rows per task for brute-force
    scoring. Instead rows group by (query, scan partition) — the exchange
    ships the same row volume as any grouping, but spread over ~partitions
    reducers instead of one per query, and each group's list (one
    partition's candidates for one query, bounded by the scan split size;
    the aggregate falls back to sort-based under memory pressure) is cut to
    its local top-k (sorted ascending on (-score, id) = the global
    (score desc, id asc) order, so negation round-trips never touch the
    emitted score). The final rank window then sees only k x partitions
    candidates per query. For non-corrupt inputs the result is identical
    to the single-window form: every global top-k row is necessarily in
    its partition's top-k.

    NULL scores (corrupt vectors — see ``cosine_similarity``) and NULL
    neighbor ids are EXCLUDED from rankings: corruption surfaces as
    absence, never as a ranked row displacing a real neighbor (struct
    sorting is nulls-first, the exact inversion of the desc window order).
    """
    scored = scored.where(
        F.col("score").isNotNull() & F.col("neighbor_id").isNotNull()
    )
    pre = (
        scored.groupBy(query_id_col, F.spark_partition_id().alias("_p"))
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("score")).alias("_ns"),
                            F.col("neighbor_id").alias("_nid"),
                            F.col("score").alias("_s"),
                        )
                    )
                ),
                1,
                k,
            ).alias("_top")
        )
        .select(query_id_col, F.explode("_top").alias("_t"))
        .select(
            query_id_col,
            F.col("_t._nid").alias("neighbor_id"),
            F.col("_t._s").alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "score", "rank")
    )


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
    same_type = dict(corpus.dtypes)[id_col] == dict(queries.dtypes)[query_id_col]
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(_not_self("neighbor_id", query_id_col, same_type))
        .withColumn("score", F.round(cosine_similarity("_qv", "_cv"), 6))
    )
    return _rank_topk(scored, k, query_id_col)


def _plane_component(plane: int, dim, seed: int):
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    md5-derived (first 15 hex chars -> 60-bit int), not xxhash64, so a SQL
    oracle reproduces the planes bit-for-bit (the same trick
    textdedup.simhash64 uses). Integer arithmetic below 2^53 is exact in
    doubles, so Spark and the oracle agree to the last bit.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(str(plane)), dim.cast("string"), F.lit(str(seed))
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(2_000_000)) - F.lit(1_000_000)) / 1_000_000.0


def _plane_component_py(plane: int, i: int, seed: int) -> float:
    """Driver-side twin of :func:`_plane_component` — identical arithmetic
    (60-bit md5 prefix, exact-in-double integers), so precomputed plane
    literals are bit-equal to the per-row JVM expression AND the oracle."""
    import hashlib

    h = int(
        hashlib.md5(f"{plane}|{i}|{seed}".encode()).hexdigest()[:15], 16
    )
    return ((h % 2_000_000) - 1_000_000) / 1_000_000.0


def lsh_bucket(vec_col, n_planes: int = 8, seed: int = 7, dim: int | None = None):
    """Sign-bit bucket id (0 .. 2^n_planes-1) for a vector column.

    dot(v, plane_p) = sum_i v[i] * u(p, i); all JVM higher-order functions.
    The plane components are data-independent; pass ``dim`` (the embedding
    width, when known) to precompute them ONCE as literals instead of
    evaluating n_planes x dim md5+conv expressions per corpus row — at 10^9
    vectors that removes ~10^12 redundant hashes with bit-identical output
    for EVERY row length: the literal plane is sliced to the row's real
    width, and rows longer than ``dim`` (ragged data) fall back per-row to
    the computed components, so the fast path never silently reroutes a
    corrupt vector to bucket 0.
    """
    v = _as_double(vec_col)
    bucket = F.lit(0)
    for p in range(n_planes):
        slow = F.aggregate(
            F.zip_with(
                v,
                F.transform(v, lambda _x, i: _plane_component(p, i, seed)),
                lambda x, u: x * u,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        if dim is not None:
            plane = F.array(
                *[F.lit(_plane_component_py(p, i, seed)) for i in range(dim)]
            )
            fast = F.aggregate(
                F.zip_with(
                    v, F.slice(plane, 1, F.size(v)), lambda x, u: x * u
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            # CaseWhen evaluates lazily per row: the md5 branch only runs
            # for over-long rows
            dot_p = F.when(F.size(v) <= dim, fast).otherwise(slow)
        else:
            dot_p = slow
        bucket = bucket + F.when(dot_p >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ivf_assignments(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 11,
    max_iter: int = 5,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: k-means centroids + per-row list assignment.

    Training uses Spark MLlib KMeans (seeded, deterministic given the input);
    assignment is a pure DataFrame expression (argmin over centroid dot
    products via higher-order functions), so at 10^9 vectors the assignment
    pass is codegen'd JVM work with zero Python. Returns (corpus + ``_list``
    column, centroids).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(_as_double(F.col(vec_col))).alias("features"))
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter).fit(train)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    assigned = corpus.withColumn(
        "_list", nearest_centroid(F.col(vec_col), centroids)
    )
    return assigned, centroids


def _sq_dist(v, centroid: list[float]):
    """Squared L2 distance of a (double-array) column to a literal centroid
    — the ONE distance expression nearest_centroid and the IVF probe share."""
    carr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(v, carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def nearest_centroid(vec_col, centroids: list[list[float]]):
    """Index of the closest centroid (squared L2) — pure JVM expression."""
    v = _as_double(vec_col)
    best_idx, best_dist = F.lit(0), None
    for i, c in enumerate(centroids):
        d = _sq_dist(v, c)
        if best_dist is None:
            best_dist = d
        else:
            cond = d < best_dist
            best_idx = F.when(cond, F.lit(i)).otherwise(best_idx)
            best_dist = F.when(cond, d).otherwise(best_dist)
    return best_idx


def md5_sample_centroids(
    corpus: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids WITHOUT training: the
    ``n_lists`` corpus vectors whose md5(id) sorts first. A hash-ordered
    sample is an unbiased draw, so the inverted lists are balanced in
    expectation — and unlike KMeans the selection reproduces exactly in SQL,
    making the whole IVF pipeline oracle-verifiable."""
    rows = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_lists)
        .select(vec_col)
        .collect()
    )
    return [[float(x) for x in r[0]] for r in rows]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: score only the ``n_probe`` nearest inverted
    lists per query (classic coarse quantization; the standard scale path
    next to LSH). Same output schema as ``brute_force_topk``; recall measured
    in tests. At scale the corpus is scored per colliding list — an equi-join
    on the list id — instead of the full cross join. Pass ``centroids``
    (e.g. :func:`md5_sample_centroids`) to skip KMeans training.
    """
    if centroids is not None:
        assigned = corpus.withColumn(
            "_list", nearest_centroid(F.col(vec_col), centroids)
        )
    else:
        assigned, centroids = ivf_assignments(corpus, vec_col, n_lists, seed)
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
        F.col("_list"),
    )

    # per-query probe lists: n_probe nearest centroids
    def probe_lists(vcol):
        v = _as_double(vcol)
        dists = []
        for i, cent in enumerate(centroids):
            d = _sq_dist(v, cent)
            dists.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
        arr = F.array_sort(F.array(*dists))
        return F.transform(F.slice(arr, 1, n_probe), lambda s: s["i"])

    q = queries.select(
        F.col(query_id_col),
        _as_double(F.col(vec_col)).alias("_qv"),
        F.explode(probe_lists(F.col(vec_col))).alias("_list"),
    )
    same_type = dict(corpus.dtypes)[id_col] == dict(queries.dtypes)[query_id_col]
    scored = (
        c.join(F.broadcast(q), "_list")
        .where(_not_self("neighbor_id", query_id_col, same_type))
        .withColumn("score", F.round(cosine_similarity("_qv", "_cv"), 6))
    )
    return _rank_topk(scored, k, query_id_col)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= threshold).

    ``n_planes=0`` computes all pairs exactly (verification / small corpora).
    ``n_planes>0`` restricts to LSH-bucket collisions first — near-identical
    vectors almost always share the sign-bucket, so the scale path keeps
    recall high for the >=0.95 regime while scoring only colliding buckets.
    """
    c = corpus.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    if n_planes > 0:
        c = c.withColumn("_bucket", lsh_bucket(F.col("_v"), n_planes, seed, dim))
        a, b = c.alias("a"), c.alias("b")
        pairs = a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
    else:
        a, b = c.alias("a"), c.alias("b")
        pairs = a.join(b, F.col("a._id") < F.col("b._id"))
    scored = pairs.select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.round(cosine_similarity(F.col("a._v"), F.col("b._v")), 6).alias("cosine"),
    )
    return scored.where(F.col("cosine") >= threshold)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH bucket.

    Same output schema as ``brute_force_topk``; per-query recall measured in
    tests. For higher recall stack multiple (seeded) bucket tables — each adds
    one cheap equi-join.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
        lsh_bucket(F.col(vec_col), n_planes, seed, dim).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        _as_double(F.col(vec_col)).alias("_qv"),
        lsh_bucket(F.col(vec_col), n_planes, seed, dim).alias("_bucket"),
    )
    same_type = dict(corpus.dtypes)[id_col] == dict(queries.dtypes)[query_id_col]
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .where(_not_self("neighbor_id", query_id_col, same_type))
        .withColumn("score", F.round(cosine_similarity("_qv", "_cv"), 6))
    )
    return _rank_topk(scored, k, query_id_col)
