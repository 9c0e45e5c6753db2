"""Hierarchical cover: differential vs naive, pruning, and invariants.

Mirrors the reference's hierarchical-vs-original equivalence test
(/root/reference/tests/test_transform_ls_to_cs.py:278-311): the hierarchical
cover expanded to finest-level blocks must equal the naive single-level
cover — here computed by an INDEPENDENT all-JVM implementation.
"""

from __future__ import annotations

import pytest

from etl_spark.operators.cover import (
    cover_table,
    expand_to_finest,
    hierarchical_cover_udf,
    naive_cover_table,
)

SIZES = (64, 16, 4)


def _docs(spark):
    rows = [
        (0, "a" * 200),                      # one full run: coarse blocks + tail
        (1, ""),                             # empty
        (2, "   \n\t  "),                    # whitespace only: empty cover
        (3, "x" * 64),                       # exactly one full coarse block
        (4, "x" * 63 + " "),                 # one char short of full
        (5, ("word " * 40)),                 # periodic partial pattern
        (6, "." * 100 + "abc123" + "." * 100),  # isolated island
        (7, "Ω" * 10 + "abc" + "Ω" * 10),    # non-ASCII chars are non-matching
        (8, "a"),                            # single char
        (9, ("z" * 16 + "-") * 20),          # full mid-level blocks, broken coarse
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hierarchical_equals_naive_expanded(spark):
    docs = _docs(spark)
    hier = cover_table(docs, sizes=SIZES)
    got = {
        (r.doc_id, r.start)
        for r in expand_to_finest(hier, sizes=SIZES).collect()
    }
    want = {(r.doc_id, r.start) for r in naive_cover_table(docs, size=4).collect()}
    assert got == want


def test_hierarchical_equals_naive_on_documents_table(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    hier = cover_table(docs, sizes=SIZES)
    got = {
        (r.doc_id, r.start)
        for r in expand_to_finest(hier, sizes=SIZES).collect()
    }
    want = {(r.doc_id, r.start) for r in naive_cover_table(docs, size=4).collect()}
    assert got == want


def test_full_runs_prune_subtrees(spark):
    """A long fully-matching run is covered by coarse blocks only — the
    subtree under a full block must not be emitted (the reference's
    FULLY_CONTAINED short-circuit)."""
    docs = spark.createDataFrame([(0, "a" * 256)], ["doc_id", "text"])
    rows = cover_table(docs, sizes=SIZES).collect()
    assert [(r.level, r.start, r.blk_len) for r in rows] == [
        (0, 0, 64), (0, 64, 64), (0, 128, 64), (0, 192, 64)
    ]
    assert all(r.full for r in rows)
    # exit positions chain the blocks
    assert [r.next_start for r in rows] == [64, 128, 192, None]


def test_partial_blocks_descend(spark):
    """A lone island inside a sea of non-matches descends to the finest
    level; no coarse or mid block may be emitted."""
    docs = spark.createDataFrame(
        [(0, "." * 100 + "ab" + "." * 100)], ["doc_id", "text"]
    )
    rows = cover_table(docs, sizes=SIZES).collect()
    assert len(rows) == 1
    r = rows[0]
    # island at positions 100..101 -> finest block starting at 100
    assert (r.level, r.start, r.blk_len, r.full) == (2, 100, 4, False)


def test_starts_unique_and_disjoint(spark):
    docs = _docs(spark)
    rows = cover_table(docs, sizes=SIZES).collect()
    seen: dict[int, list] = {}
    for r in rows:
        seen.setdefault(r.doc_id, []).append((r.start, r.start + r.blk_len))
    for _doc, spans in seen.items():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s1 != s2, "duplicate start"
            assert e1 <= s2, "overlapping cover blocks"


def test_invalid_sizes_rejected():
    with pytest.raises(ValueError):
        hierarchical_cover_udf((64, 10, 4))  # 64 % 10 != 0
    with pytest.raises(ValueError):
        hierarchical_cover_udf((16, 16))
