"""Sequence packing — batch assembly for LLM pretraining.

Packs variable-length documents into fixed-token-capacity training
sequences (the standard "sequence packing" step between corpus prep and
the trainer). The packing itself is an inherently sequential recurrence
(each doc's bin depends on the running total before it), so it cannot be
a pure Spark expression — but it parallelizes perfectly ACROSS pack
buckets:

1. Every doc gets a deterministic pack bucket from a seeded md5 of its id
   (same bit construction as the corpus split / MinHash keys, so a DuckDB
   oracle reproduces it exactly). Buckets are uniform — no skew — and the
   bucket count is the parallelism knob: at 100 TB you run ~10x the
   cluster's cores so each bucket's sequential walk stays small and even.
2. One hash shuffle groups each bucket; ``applyInPandas`` walks it in
   id order with a greedy NEXT-FIT: a doc opens a new sequence when it
   would overflow ``capacity`` (an oversized doc occupies a sequence
   alone rather than opening an empty one). The walk is a numpy-backed
   O(rows-in-bucket) loop over Arrow-delivered batches.

Determinism: (bucket, id-order) fully defines the packing — any cluster
size, any partitioning, any retry lands every doc in the same
(pack_bucket, seq_idx, seq_offset). That is what makes the op safe to
re-run in an exactly-once pipeline and checkable against a SQL oracle
(DuckDB ``WITH RECURSIVE`` walk in ``__spark_entry__``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.functions.content import md5_bucket


def pack_bucket_expr(col, n_buckets: int, seed: str = "pack") -> Column:
    """Stable bucket id in [0, n_buckets): the shared seeded md5-bucket
    construction (functions.content.md5_bucket — one place keeps Spark and
    the DuckDB oracles bit-exact). Pure JVM expression."""
    return md5_bucket(col, seed, n_buckets).cast("int")


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = 64,
    seed: str = "pack",
) -> DataFrame:
    """All input columns + (pack_bucket, seq_idx, seq_offset).

    ``seq_idx`` is the bucket-local sequence (bin) number, ``seq_offset``
    the doc's token offset inside its sequence. Greedy next-fit in id
    order per bucket; see module docstring for the scale/determinism
    contract.
    """
    assert capacity > 0 and n_buckets > 0
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("pack_bucket", T.IntegerType(), False),
            T.StructField("seq_idx", T.LongType(), False),
            T.StructField("seq_offset", T.LongType(), False),
        ]
    )
    with_bucket = df.withColumn(
        "pack_bucket", pack_bucket_expr(id_col, n_buckets, seed)
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bad = pdf[token_col].isna()
        if bad.any():
            # NULL token counts have no defined packing — fail with the
            # contract and the rows, not an Arrow float-NaN cast traceback
            sample = pdf.loc[bad, id_col].head(5).tolist()
            raise ValueError(
                f"pack_sequences: {token_col!r} is NULL for "
                f"{int(bad.sum())} row(s) (e.g. {id_col} in {sample}); "
                "token counts must be non-null — filter or coalesce "
                "upstream"
            )
        toks = pdf[token_col].to_numpy()
        n = len(toks)
        seq = np.zeros(n, dtype=np.int64)
        off = np.zeros(n, dtype=np.int64)
        acc = 0
        k = 0
        for i in range(n):
            t = int(toks[i])
            if acc + t > capacity and acc > 0:
                k += 1
                acc = 0
            seq[i] = k
            off[i] = acc
            acc += t
        pdf["seq_idx"] = seq
        pdf["seq_offset"] = off
        return pdf

    return with_bucket.groupBy("pack_bucket").applyInPandas(_pack, out_schema)
