"""Sequence packing: golden cases, invariants, partitioning determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark.operators.packing import pack_sequences


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, 10 * (i % 7 + 1)) for i in range(n)], "doc_id long, n_tokens long"
    )


def test_pack_respects_capacity_and_order(spark):
    out = pack_sequences(_docs(spark), capacity=64, n_buckets=4).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault((r["pack_bucket"], r["seq_idx"]), []).append(r)
    for rows in by_bin.values():
        rows.sort(key=lambda r: r["doc_id"])
        total = sum(r["n_tokens"] for r in rows)
        # a bin only exceeds capacity when a single oversized doc owns it
        assert total <= 64 or len(rows) == 1
        # offsets are the running prefix sums in doc_id order
        acc = 0
        for r in rows:
            assert r["seq_offset"] == acc
            acc += r["n_tokens"]


def test_pack_oversized_doc_gets_own_sequence(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 500), (3, 10)], "doc_id long, n_tokens long"
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, capacity=64, n_buckets=1).collect()}
    assert out[2]["seq_offset"] == 0
    bins = {r["seq_idx"] for r in out.values()}
    assert out[1]["seq_idx"] != out[2]["seq_idx"]
    assert out[2]["seq_idx"] != out[3]["seq_idx"]
    assert len(bins) == 3  # no empty bins wasted around the oversized doc


def test_pack_deterministic_under_partitioning(spark):
    base = _docs(spark, 200)
    a = pack_sequences(base.repartition(13), capacity=96, n_buckets=8)
    b = pack_sequences(base.coalesce(1), capacity=96, n_buckets=8)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_pack_carries_all_input_columns(spark):
    df = _docs(spark, 10).withColumn("extra", F.lit("x"))
    out = pack_sequences(df, capacity=64, n_buckets=2)
    assert set(out.columns) == {
        "doc_id", "n_tokens", "extra", "pack_bucket", "seq_idx", "seq_offset"
    }
    assert out.where(F.col("extra") != "x").count() == 0


def test_pack_rejects_null_token_counts_with_clear_error(spark):
    """NULL n_tokens has no defined packing — the operator must name its
    contract and the offending ids, not die on a float-NaN cast deep in
    applyInPandas."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception) as ei:
        pack_sequences(df, capacity=64, n_buckets=1).collect()
    msg = str(ei.value)
    assert "pack_sequences" in msg and "NULL" in msg and "doc_id" in msg
