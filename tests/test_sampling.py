"""Stratified hash-threshold sampling + temperature mixture weights."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_spark.operators.sampling import domain_mixture, stratified_sample


def _corpus(spark, per_lang: dict[str, int]):
    rows = []
    i = 0
    for lang, n in per_lang.items():
        for _ in range(n):
            rows.append((i, f"doc {i} body words here", lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_sample_hits_quota_within_binomial_noise(spark):
    df = _corpus(spark, {"en": 2000, "fr": 500})
    out = stratified_sample(df, quota=200).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    # binomial(n, quota/n): sd = sqrt(quota * (1 - rate)); allow 4 sd
    for lang, n in (("en", 2000), ("fr", 500)):
        sd = math.sqrt(200 * (1 - 200 / n))
        assert abs(got[lang] - 200) <= 4 * sd, (lang, got[lang])


def test_sample_small_stratum_passes_through_whole(spark):
    df = _corpus(spark, {"en": 300, "de": 40})
    out = stratified_sample(df, quota=100)
    de = out.where(F.col("lang") == "de")
    assert de.count() == 40
    assert de.select("sample_rate").distinct().collect()[0][0] == 1.0


def test_sample_deterministic_and_nested(spark):
    """Same ids every run / partitioning; and a tighter quota's sample is a
    SUBSET of a looser one only when rates quantize identically — the
    guaranteed property is per-run determinism, checked across layouts."""
    df = _corpus(spark, {"en": 1000})
    a = {r[0] for r in stratified_sample(df.repartition(7), quota=100)
         .select("doc_id").collect()}
    b = {r[0] for r in stratified_sample(df.coalesce(1), quota=100)
         .select("doc_id").collect()}
    assert a == b


def test_mixture_weights_normalize_and_tilt_to_tail(spark):
    df = _corpus(spark, {"en": 900, "fr": 90, "de": 10})
    out = {
        r["lang"]: r
        for r in domain_mixture(df, alpha=0.3).collect()
    }
    total = sum(r["mix_weight"] for r in out.values())
    assert abs(total - 1.0) < 1e-6
    # temperature < 1 upweights the tail relative to proportional share
    assert out["de"]["mix_weight"] > 10 / 1000
    assert out["en"]["mix_weight"] < 900 / 1000
    assert out["en"]["tokens"] > out["fr"]["tokens"] > out["de"]["tokens"]


def test_mixture_alpha_zero_is_uniform(spark):
    df = _corpus(spark, {"en": 500, "fr": 20})
    w = {r["lang"]: r["mix_weight"] for r in domain_mixture(df, alpha=0.0).collect()}
    assert abs(w["en"] - 0.5) < 1e-8 and abs(w["fr"] - 0.5) < 1e-8


def test_sample_null_stratum_is_a_stratum_not_a_dropped_slice(spark):
    """NULL lang docs must pass through / downsample like any stratum —
    a plain equi-join would silently delete the whole unlabeled slice."""
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "en"), (3, "c", None), (4, "d", None)],
        "doc_id long, text string, lang string",
    )
    out = stratified_sample(df, quota=100)
    assert out.count() == 4  # quota above every count: all pass through
    nulls = out.where(F.col("lang").isNull())
    assert nulls.count() == 2
    assert nulls.select("sample_rate").distinct().collect()[0][0] == 1.0


def test_sample_threshold_clamps_to_one_for_mega_strata(spark, monkeypatch):
    """A stratum with rate < 1/RES must keep ~rate*n rows, not quantize to
    ZERO (the 100-TB cliff: quota 50 over 6e7 docs at low resolution).
    Simulated by shrinking the resolution instead of materializing 1e9
    rows: with RES=10 and rate 0.05 the unclamped threshold floors to 0."""
    from etl_spark.operators import sampling as mod

    monkeypatch.setattr(mod, "SAMPLE_RES", 10)
    df = _corpus(spark, {"en": 20})
    out = stratified_sample(df, quota=1)  # rate 0.05 -> floor(0.5) == 0
    n = out.count()
    assert n > 0  # clamp keeps bucket-0 ids (~1/10 of the stratum)
    assert n < 20


def test_sample_rejects_reserved_column_collision(spark):
    df = _corpus(spark, {"en": 5}).withColumn("sample_rate", F.lit(0.1))
    try:
        stratified_sample(df, quota=3)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "sample_rate" in str(e)


def test_mixture_alpha_one_survives_mega_token_strata(spark):
    """alpha=1 (proportional) on 1e13-token strata must not overflow the
    integer-unit scaling (max-normalized units, not absolute)."""
    df = spark.createDataFrame(
        [(1, "x", "en", 20_000_000_000_000), (2, "y", "fr", 5_000_000_000_000)],
        "doc_id long, text string, lang string, w long",
    )
    out = {r["lang"]: r for r in
           domain_mixture(df, alpha=1.0, weight_col=F.col("w")).collect()}
    assert abs(out["en"]["mix_weight"] - 0.8) < 1e-6
    assert abs(out["fr"]["mix_weight"] - 0.2) < 1e-6
    assert out["en"]["tokens"] == 20_000_000_000_000
