"""Corpus sampling — stratified downsampling and mixture weights.

The last prep stage before training: overrepresented strata (languages,
source domains) are downsampled to quotas, and the trainer's sampling
distribution over domains is computed from token counts with temperature
scaling (the Pile / XLM-R style ``p_i ∝ c_i^alpha`` mix).

Scale design (100 TB):

- :func:`stratified_sample` deliberately does NOT take the exact-quota
  route (``row_number() OVER (PARTITION BY stratum ORDER BY hash) <=
  quota``): a rank needs a total order per stratum, which serializes each
  stratum through ONE reducer — the biggest stratum (``lang='en'``) is the
  whole corpus's bottleneck. Instead each row is kept iff its seeded
  60-bit md5 bucket (functions.content.md5_bucket, mod 1e6) falls under
  the stratum's keep-rate: ZERO shuffles on the corpus — one tiny
  aggregate computes per-stratum counts, the rates broadcast-join back,
  and the filter is embarrassingly parallel. The sample size per stratum
  is then binomial around the quota (±O(sqrt(quota)) — at training scale
  a quota is 1e6+, so the relative error is <0.2%), and the selection is
  fully deterministic: the same doc ids survive on every run, any cluster
  size, any partitioning, so retries and backfills see one sample.

- :func:`domain_mixture` is one aggregate over n_strata groups (map-side
  partial agg; output rows == number of domains, trivially collectable)
  followed by driver-free normalization via a window over the tiny
  aggregate — no corpus-sized shuffle at any point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_spark.functions.content import md5_bucket

# hash-threshold resolution: keep-rate quantized to 1/RES. 1e6 keeps the
# quantization error (<=1e-6 of a stratum) far below the binomial noise.
SAMPLE_RES = 1_000_000


def stratified_sample(
    df: DataFrame,
    quota: int,
    strata_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsample to ~``quota`` rows per stratum.

    Strata at or under quota pass through whole (keep-rate 1.0); larger
    strata keep each row iff ``md5_bucket(id|seed) % 1e6 < rate * 1e6``
    with ``rate = quota / count``. Adds a ``sample_rate`` column recording
    the stratum's applied keep-rate (the trainer needs it to de-bias
    frequency estimates). See the module docstring for why hash-threshold
    beats exact-rank at corpus scale.
    """
    assert quota > 0
    keys = list(strata_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    rates = counts.select(
        *keys,
        F.least(F.lit(1.0), F.lit(float(quota)) / F.col("_n")).alias("sample_rate"),
    )
    # rates has one row per stratum — always the broadcast side
    keyed = df.join(F.broadcast(rates), keys)
    thresh = (F.col("sample_rate") * SAMPLE_RES).cast("long")
    return keyed.where(md5_bucket(id_col, seed, SAMPLE_RES) < thresh)


def domain_mixture(
    df: DataFrame,
    alpha: float = 0.3,
    strata_cols: tuple[str, ...] = ("lang",),
    weight_col=None,
) -> DataFrame:
    """Temperature-scaled mixing distribution over strata.

    Returns one row per stratum: raw ``tokens`` (sum of ``weight_col``, or
    row count when None) and ``mix_weight = tokens^alpha / sum(tokens^alpha)``
    — ``alpha=1`` is proportional sampling, ``alpha=0`` uniform; 0.2–0.5
    is the usual upweight-the-tail regime.
    """
    assert alpha >= 0.0
    keys = list(strata_cols)
    size = (
        F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
    ).cast("double").alias("tokens")
    agg = df.groupBy(*keys).agg(size)
    scaled = agg.withColumn("_s", F.pow("tokens", F.lit(float(alpha))))
    # the window runs over n_strata rows (tiny), not the corpus
    total = Window.partitionBy()
    return scaled.select(
        *keys,
        F.col("tokens").cast("long").alias("tokens"),
        F.round(F.col("_s") / F.sum("_s").over(total), 8).alias("mix_weight"),
    )
