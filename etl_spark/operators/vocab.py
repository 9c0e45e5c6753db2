"""Vocabulary statistics — per-stratum top-k token counts.

The tokenizer-training input: which tokens dominate each language/domain.
Two-stage shape for 100 TB:

1. explode normalized tokens (narrow, scan-fused) and aggregate counts on
   (stratum, token) — ONE shuffle, map-side partial agg, so a 10^9-copy
   token costs O(partitions);
2. rank per stratum over the DISTINCT-TOKEN frame only (vocabulary-sized,
   orders of magnitude smaller than the corpus). ``min_count`` pre-filters
   the rank input — at web scale the singleton-token tail (typos, ids,
   binary junk) is most of the vocabulary, and a tokenizer never wants it,
   so the per-stratum sort sees only the frequent head.

Ties rank deterministically (count desc, then token asc), so the result
is stable across runs/cluster sizes and a SQL oracle can hash-match it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_spark.operators.textdedup import norm_tokens


def vocab_topk(
    df: DataFrame,
    k: int = 100,
    strata_cols: tuple[str, ...] = ("lang",),
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Top-``k`` normalized tokens per stratum: (strata..., token, n, rank).

    ``rank`` is 1-based by (count desc, token asc). Tokens under
    ``min_count`` never reach the ranking stage (the scale knob — see
    module docstring).
    """
    assert k > 0 and min_count >= 1
    keys = list(strata_cols)
    toks = df.select(*keys, F.explode(norm_tokens(text_col)).alias("token"))
    counted = (
        toks.groupBy(*keys, "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    w = Window.partitionBy(*keys).orderBy(F.col("n").desc(), F.col("token"))
    return counted.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).where(F.col("rank") <= k)
