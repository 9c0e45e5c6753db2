"""Similarity search: brute-force correctness vs numpy oracle, LSH recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_spark.operators.similarity import brute_force_topk, lsh_bucket, lsh_topk

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _queries(corpus):
    return (
        corpus.where(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_brute_force_matches_numpy(spark):
    corpus = _corpus(spark)
    got = brute_force_topk(corpus, _queries(corpus), k=5).collect()

    rows = corpus.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    for qid in range(3):
        q = vecs[qid]
        scores = []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            nq, nv = np.linalg.norm(q), np.linalg.norm(v)
            s = float(q @ v / (nq * nv)) if nq > 0 and nv > 0 else 0.0
            scores.append((round(s, 6), -vid))
        want = [(-i, s) for s, i in sorted(scores, reverse=True)[:5]]
        mine = [
            (r["neighbor_id"], r["score"])
            for r in sorted(
                (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
            )
        ]
        assert mine == want, qid


def test_lsh_bucket_deterministic(spark):
    corpus = _corpus(spark)
    b1 = corpus.select("vec_id", lsh_bucket(F.col("embedding")).alias("b")).collect()
    b2 = corpus.select("vec_id", lsh_bucket(F.col("embedding")).alias("b")).collect()
    assert sorted(map(tuple, b1)) == sorted(map(tuple, b2))
    buckets = {r["b"] for r in b1}
    assert len(buckets) > 1  # actually partitions the space


def test_lsh_topk_recall(spark):
    """LSH results are a subset of the space and self-consistent; measure
    recall@5 vs brute force (random-hyperplane, 1 table -> modest recall)."""
    corpus = _corpus(spark)
    queries = _queries(corpus)
    exact = brute_force_topk(corpus, queries, k=5).collect()
    approx = lsh_topk(corpus, queries, k=5, n_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for r in approx:
        total += 1
        if r["neighbor_id"] in exact_sets[r["query_id"]]:
            hits += 1
    assert total > 0
    # scores in the approx result must equal the exact scores for those ids
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-9


def test_ivf_topk_recall(spark):
    """IVF with n_probe=4/16 lists: recall@5 vs brute force must be high on a
    500-vector corpus, and scores for returned ids must match exact scores."""
    from etl_spark.operators.similarity import ivf_topk

    corpus = _corpus(spark)
    queries = _queries(corpus)
    exact = brute_force_topk(corpus, queries, k=5).collect()
    approx = ivf_topk(corpus, queries, k=5, n_lists=8, n_probe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for r in approx if r["neighbor_id"] in exact_sets[r["query_id"]])
    total = len(approx)
    assert total >= 10
    assert hits / total >= 0.5, f"recall {hits}/{total}"
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-9


def test_ivf_assignment_partitions_corpus(spark):
    from etl_spark.operators.similarity import ivf_assignments

    corpus = _corpus(spark)
    assigned, centroids = ivf_assignments(corpus, n_lists=8)
    assert len(centroids) == 8
    counts = {r["_list"]: r["count"] for r in assigned.groupBy("_list").count().collect()}
    assert sum(counts.values()) == corpus.count()
    assert len(counts) >= 4  # actually spreads across lists


def test_embedding_near_dup_exact_vs_lsh(spark):
    """LSH-bucketed near-dup pairs are a subset of exact pairs with correct
    cosines; planted duplicates are always found."""
    from pyspark.sql import functions as F

    from etl_spark.operators.similarity import embedding_near_dup_pairs

    corpus = _corpus(spark)
    # plant an exact duplicate of vec 0 under a new id
    dup = corpus.where(F.col("vec_id") == 0).select(
        F.lit(9999).cast("long").alias("vec_id"), "embedding", "label"
    )
    c = corpus.unionByName(dup)
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in embedding_near_dup_pairs(c, threshold=0.99).collect()}
    assert (0, 9999) in exact and exact[(0, 9999)] == 1.0
    lsh = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in embedding_near_dup_pairs(c, threshold=0.99, n_planes=6).collect()}
    assert (0, 9999) in lsh  # identical vectors share every sign bucket
    for k, v in lsh.items():
        assert k in exact and abs(v - exact[k]) < 1e-9


def test_ivf_md5_centroids_recall(spark):
    """The deterministic md5-sampled quantizer is a usable IVF: recall vs
    exact top-k stays reasonable and the output contract matches."""
    from etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        md5_sample_centroids,
    )

    corpus = _corpus(spark)
    cents = md5_sample_centroids(corpus, n_lists=8)
    assert len(cents) == 8 and all(len(c) == len(cents[0]) for c in cents)
    # deterministic: same corpus -> same centroids
    assert cents == md5_sample_centroids(corpus, n_lists=8)
    queries = corpus.limit(5).selectExpr("vec_id AS query_id", "embedding")
    approx = ivf_topk(corpus, queries, k=10, n_lists=8, n_probe=4, centroids=cents)
    exact = brute_force_topk(corpus, queries, k=10)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.3  # probing half the lists


def test_driver_ann_ivf_recall_floor(spark):
    """VERDICT r2 #8: the driver query's recall@10 column rides along in
    CORRECTNESS; this pins a hard floor so a quantizer regression fails
    loudly instead of silently degrading the approximate path."""
    import __spark_entry__ as e

    out = e.queries()["ann_ivf"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 50  # 5 queries x k=10
    recall = out[0]["recall_at_10"]
    assert all(abs(r["recall_at_10"] - recall) < 1e-12 for r in out)
    assert recall >= 0.8, f"IVF recall@10 regressed to {recall}"


def test_cosine_null_propagates_zero_norm_scores_zero(spark):
    """Corrupt vectors (null element / length mismatch / whole-null) score
    NULL — absence, not a confident 0.0; a genuine zero vector scores 0.0."""
    from etl_spark.functions.vectors import cosine_similarity

    df = spark.createDataFrame(
        [
            ("null_elem", [1.0, None], [1.0, 2.0]),
            ("mismatch", [1.0], [1.0, 2.0]),
            ("whole_null", None, [1.0, 2.0]),
            ("zero_vec", [0.0, 0.0], [1.0, 2.0]),
            ("ok", [1.0, 0.0], [1.0, 0.0]),
        ],
        "case string, a array<double>, b array<double>",
    )
    got = {r["case"]: r["s"] for r in
           df.select("case", cosine_similarity("a", "b").alias("s")).collect()}
    assert got["null_elem"] is None
    assert got["mismatch"] is None
    assert got["whole_null"] is None
    assert got["zero_vec"] == 0.0
    assert abs(got["ok"] - 1.0) < 1e-12


def test_topk_string_query_ids_against_long_corpus_ids(spark):
    """Disjoint id DOMAINS with different TYPES must not silently return
    empty (a raw != coerces the string id to NULL and drops every row)."""
    from etl_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "query_id string, embedding array<float>"
    )
    out = brute_force_topk(corpus, queries, k=2).collect()
    assert len(out) == 2
    assert out[0]["neighbor_id"] == 1 and out[0]["rank"] == 1


def test_corrupt_vectors_and_null_ids_are_absent_from_rankings(spark):
    """A NULL-scored candidate (corrupt vector) or NULL-id corpus row must
    never occupy a top-k slot — corruption surfaces as absence (the struct
    pre-sort is nulls-FIRST, the inversion of the desc window order)."""
    from etl_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [1.0, None]),        # corrupt: null element -> NULL score
            (None, [0.95, 0.05]),    # null id
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    out = brute_force_topk(corpus, queries, k=4).collect()
    ids = [r["neighbor_id"] for r in out]
    assert ids == [1, 2]             # real neighbors only, best first
    assert all(r["score"] is not None for r in out)


def test_same_string_form_cross_type_ids_are_not_excluded(spark):
    """long 5 in the corpus vs string query id \"5\": different domains,
    different types — the corpus row must stay a candidate (a canonical-
    string compare would falsely self-exclude it)."""
    from etl_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(5, [1.0, 0.0]), (6, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("5", [1.0, 0.0])], "query_id string, embedding array<double>"
    )
    out = brute_force_topk(corpus, queries, k=1).collect()
    assert out[0]["neighbor_id"] == 5 and out[0]["rank"] == 1


def test_lsh_bucket_dim_fast_path_matches_slow_path_on_ragged_rows(spark):
    """The precomputed-plane fast path must bucket EVERY row length exactly
    like the per-row computed path: shorter, equal, and longer than dim."""
    from etl_spark.operators.similarity import lsh_bucket

    df = spark.createDataFrame(
        [
            (1, [0.5, -0.2, 0.9, 0.1]),        # == dim
            (2, [0.5, -0.2]),                  # shorter
            (3, [0.5, -0.2, 0.9, 0.1, -0.7]),  # longer (ragged)
            (4, []),                           # empty
        ],
        "vec_id long, embedding array<double>",
    )
    got = df.select(
        "vec_id",
        lsh_bucket(F.col("embedding"), n_planes=4, seed=7).alias("slow"),
        lsh_bucket(F.col("embedding"), n_planes=4, seed=7, dim=4).alias("fast"),
    ).collect()
    for r in got:
        assert r["slow"] == r["fast"], r["vec_id"]
