"""Dedupe strategies: identical semantics across physical plans (SURVEY §5.5).

Differential test: salted == unsalted == window (reference analog: the
hierarchical-vs-naive cover differential, test_transform_ls_to_cs.py:278-311).
"""

from __future__ import annotations

from etl_spark.datagen import change_stream
from etl_spark.operators.dedupe import (
    latest_by_key,
    latest_by_key_salted,
    latest_by_key_window,
)


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_three_strategies_agree(spark):
    df = change_stream(spark, 4000, n_repos=10, paths_per_repo=40, dup_pct=10).drop(
        "epoch"
    )
    a = _canon(latest_by_key(df))
    b = _canon(latest_by_key_salted(df, n_salts=7))
    c = _canon(latest_by_key_window(df))
    assert a == b == c
    assert len(a) > 0


def test_latest_wins(spark):
    rows = [
        ("r", "a", "c000000000001", "v1"),
        ("r", "a", "c000000000003", "v3"),
        ("r", "a", "c000000000002", "v2"),
        ("r", "b", "c000000000001", "w1"),
        # exact duplicate re-delivery
        ("r", "b", "c000000000001", "w1"),
    ]
    df = spark.createDataFrame(rows, ["repo", "path", "commit", "content"])
    got = {
        (r["repo"], r["path"]): (r["commit"], r["content"])
        for r in latest_by_key(df).collect()
    }
    assert got == {
        ("r", "a"): ("c000000000003", "v3"),
        ("r", "b"): ("c000000000001", "w1"),
    }
