"""Hierarchical multi-resolution cover with subtree pruning (U2/U3).

The reference's single most algorithmically distinctive operator is its
hierarchical polygon cover: classify each coarse tile as FULLY / PARTIALLY /
NOT contained, emit fully-contained subtrees at the coarse level WITHOUT
descending, and recurse only into partially-contained tiles down to the
finest zoom (/root/reference/src/core/cellstring_utils.py:138-279, z13 ->
z17 -> z21). This module is that operator re-expressed on the engine's text
domain: the "polygon" is the set of character positions matching a predicate
(ASCII alphanumeric runs), the "tiles" are aligned blocks of sizes
``sizes[0] > sizes[1] > ... > sizes[-1]``, and the cover is:

- a block whose characters ALL match is emitted at its level and its subtree
  is pruned (FULLY_CONTAINED);
- a block with SOME matches descends to the next level (PARTIALLY);
- at the finest level, any block with at least one match is emitted.

Invariant (the reference's differential test,
/root/reference/tests/test_transform_ls_to_cs.py:278-311): expanding the
hierarchical cover to finest-level blocks equals the naive single-level
cover computed directly at the finest size — verified here by
``tests/test_cover.py`` against :func:`naive_cover_table`, an independent
all-JVM implementation.

Physical shape mirrors the reference's U2/U3 operators: a pandas UDF
(Arrow-batched; the inner loop is regex-run slicing + numpy block
reductions, no per-character Python) returning ``array<struct>``, exploded
to rows, with a W2-style lead() exit position. Per-row independent, zero
shuffle before the explode — scale-safe at any corpus size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SIZES = (64, 16, 4)

COVER_ENTRY = T.ArrayType(
    T.StructType(
        [
            T.StructField("level", T.IntegerType(), False),
            T.StructField("start", T.LongType(), False),
            T.StructField("blk_len", T.IntegerType(), False),
            T.StructField("full", T.BooleanType(), False),
        ]
    )
)


def hierarchical_cover_udf(sizes: tuple[int, ...] = DEFAULT_SIZES):
    """Pandas UDF: text -> array of (level, start, blk_len, full) cover
    entries. ``sizes`` must be strictly decreasing and each size divisible by
    the next (aligned subtrees)."""
    for a, b in zip(sizes, sizes[1:]):
        if a <= b or a % b:
            raise ValueError(f"sizes must nest evenly, got {sizes}")

    @F.pandas_udf(COVER_ENTRY)
    def cover(text: pd.Series) -> pd.Series:
        import re

        import numpy as np

        run_re = re.compile(r"[A-Za-z0-9]+")
        out = []
        for t in text.fillna(""):
            n = len(t)
            if n == 0:
                out.append([])
                continue
            mask = np.zeros(n, dtype=bool)
            for m in run_re.finditer(t):
                mask[m.start() : m.end()] = True

            # per-level block stats; padding with False makes tail blocks
            # (extending past the text) never "full", matching the oracle's
            # length(seg) = size condition
            full: list[np.ndarray] = []
            anyb: list[np.ndarray] = []
            for size in sizes:
                nb = (n + size - 1) // size
                mm = np.pad(mask, (0, nb * size - n)).reshape(nb, size)
                full.append(mm.all(axis=1))
                anyb.append(mm.any(axis=1))

            entries = []
            for lvl, size in enumerate(sizes):
                last = lvl == len(sizes) - 1
                emit = anyb[lvl] if last else full[lvl]
                # prune: skip blocks inside a fully-matched ancestor
                keep = emit.copy()
                for up in range(lvl):
                    ratio = sizes[up] // size
                    keep &= ~full[up][np.arange(len(keep)) // ratio]
                for i in np.flatnonzero(keep):
                    entries.append(
                        {
                            "level": lvl,
                            "start": int(i) * size,
                            "blk_len": size,
                            "full": bool(full[lvl][i]),
                        }
                    )
            entries.sort(key=lambda e: e["start"])
            out.append(entries)
        return pd.Series(out)

    return cover


def cover_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sizes: tuple[int, ...] = DEFAULT_SIZES,
) -> DataFrame:
    """Exploded hierarchical cover: one row per cover block, with the W2-style
    exit position (``next_start`` = lead(start) within the doc). Starts are
    unique per doc — an emitted block's ancestors are never emitted — so the
    lead is deterministic."""
    udf = hierarchical_cover_udf(sizes)
    rows = df.select(
        F.col(id_col), F.explode(udf(F.col(text_col))).alias("_c")
    ).select(
        id_col,
        F.col("_c.level").cast("long").alias("level"),
        F.col("_c.start").alias("start"),
        F.col("_c.blk_len").cast("long").alias("blk_len"),
        F.col("_c.full").alias("full"),
    )
    w = Window.partitionBy(id_col).orderBy("start")
    return rows.withColumn("next_start", F.lead("start").over(w))


def naive_cover_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = DEFAULT_SIZES[-1],
) -> DataFrame:
    """Single-level (finest-only) cover — the reference's ``deprecated_
    convert_polygon_to_cellstring`` analog, implemented INDEPENDENTLY of the
    UDF as pure JVM expressions (sequence + substring + rlike), so the
    differential test compares two mechanisms, not one implementation with
    itself."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    nblocks = F.ceil(F.length(t) / F.lit(size)).cast("int")
    blocks = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(nblocks - 1, F.lit(-1))),
            lambda i: F.struct(
                (i.cast("long") * size).alias("start"),
                F.substring(t, i * size + 1, size)
                .rlike("[A-Za-z0-9]")
                .alias("hit"),
            ),
        ),
        lambda s: s["hit"],
    )
    return df.select(
        F.col(id_col), F.explode(blocks).alias("_b")
    ).select(id_col, F.col("_b.start").alias("start"))


def expand_to_finest(
    cover: DataFrame, sizes: tuple[int, ...] = DEFAULT_SIZES, id_col: str = "doc_id"
) -> DataFrame:
    """Expand a hierarchical cover to finest-level block starts (the
    reference expands fully-contained z13/z17 tiles to z21 children for its
    equivalence check)."""
    finest = sizes[-1]
    starts = F.sequence(
        F.col("start"),
        F.col("start") + F.col("blk_len") - finest,
        F.lit(finest),
    )
    return cover.select(
        F.col(id_col), F.explode(starts).alias("start")
    )
