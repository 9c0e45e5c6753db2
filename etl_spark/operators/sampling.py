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
  60-bit md5 bucket (functions.content.md5_bucket, mod SAMPLE_RES) falls under
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

# hash-threshold resolution: keep-rate quantized to 1/RES. 1e9 bounds the
# quantization bias at n*1e-9 rows per stratum — below the binomial noise
# sqrt(quota) for any stratum up to quota*1e9*sqrt(quota) rows; the
# threshold is additionally clamped to >=1 so a stratum can never quantize
# to ZERO kept rows however large it is.
SAMPLE_RES = 1_000_000_000


def stratified_sample(
    df: DataFrame,
    quota: int,
    strata_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsample to ~``quota`` rows per stratum.

    Strata at or under quota pass through whole (keep-rate 1.0); larger
    strata keep each row iff ``md5_bucket(id|seed) % RES < rate * RES``
    with ``rate = quota / count``. A NULL stratum key is a stratum like
    any other (null-safe join), not a dropped slice — unlabeled docs are
    exactly the rows a silent filter would lose at corpus scale. Adds a
    ``sample_rate`` column recording the stratum's applied keep-rate (the
    trainer needs it to de-bias frequency estimates). See the module
    docstring for why hash-threshold beats exact-rank at corpus scale.
    """
    assert quota > 0
    keys = list(strata_cols)
    for reserved in ("sample_rate", "_keep_thresh"):
        if reserved in df.columns:
            raise ValueError(
                f"stratified_sample: input already has a {reserved!r} column "
                "(it is this operator's output/internal name) — rename or "
                "drop it first"
            )
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    rate = F.least(F.lit(1.0), F.lit(float(quota)) / F.col("_n"))
    rates = counts.select(
        *keys,
        rate.alias("sample_rate"),
        # clamp: a stratum with rate < 1/RES must keep ~rate*n rows, not 0
        F.greatest(F.lit(1), (rate * SAMPLE_RES).cast("long")).alias(
            "_keep_thresh"
        ),
    )
    # rates has one row per stratum — always the broadcast side; null-safe
    # equality so NULL-keyed strata match their own count row
    b = F.broadcast(rates)
    cond = [df[k].eqNullSafe(b[k]) for k in keys]
    keyed = df.join(b, cond).drop(*[b[k] for k in keys])
    return keyed.where(
        md5_bucket(id_col, seed, SAMPLE_RES) < F.col("_keep_thresh")
    ).drop("_keep_thresh")


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
    for reserved in ("tokens", "mix_weight", "_si"):
        if reserved in keys:
            raise ValueError(
                f"domain_mixture: stratum column {reserved!r} collides with "
                "an output/internal column name — alias it first"
            )
    size = (
        F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
    ).cast("double").alias("tokens")
    agg = df.groupBy(*keys).agg(size)
    # tokens^alpha is normalized by the window MAX (max of doubles is
    # exact and order-independent, unlike a float sum) and floored into
    # integer units in [0, 1e9] BEFORE summing: the window sum is then
    # exact long arithmetic — overflow-free for any token scale or alpha
    # (incl. alpha=1 on 1e13-token strata) up to ~9e9 strata — and the
    # final division of two exactly-representable longs is correctly
    # rounded, so mix_weight is deterministic and bit-stable vs the SQL
    # oracle; 1e9 units are 10x finer than the 8-decimal output grid.
    # Residual hazard is only pow() landing within 1 ulp of a floor
    # boundary. (A corpus whose every stratum has zero tokens yields NULL
    # weights.)
    total = Window.partitionBy()  # runs over n_strata rows, not the corpus
    p = F.pow("tokens", F.lit(float(alpha)))
    si = F.floor(p / F.max(p).over(total) * 1_000_000_000).cast("long")
    scaled = agg.withColumn("_si", si)
    return scaled.select(
        *keys,
        F.col("tokens").cast("long").alias("tokens"),
        F.round(F.col("_si") / F.sum("_si").over(total), 8).alias("mix_weight"),
    )
