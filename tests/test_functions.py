"""Unit tests for the vectorized scalar-function surface (SURVEY §2.7 analog)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_spark.functions.content import (
    content_sha256,
    content_sha256_pandas,
    doc_fingerprint,
    normalize_lang,
    token_count,
)
from etl_spark.functions.vectors import cosine_similarity, dot


def test_sha256_jvm_matches_hashlib_and_pandas_udf(spark):
    rows = [("hello world",), ("",), ("// repo_0001/a.py@c000000000001\nabc\n",)]
    df = spark.createDataFrame(rows, ["content"])
    got = (
        df.select(
            "content",
            content_sha256("content").alias("jvm"),
            content_sha256_pandas("content").alias("pandas"),
        )
        .orderBy("content")
        .collect()
    )
    for r in got:
        expect = hashlib.sha256(r["content"].encode()).hexdigest()
        assert r["jvm"] == expect
        assert r["pandas"] == expect


def test_normalize_lang(spark):
    cases = {
        "Python": "python",
        "py": "python",
        "PYTHON": "python",
        " Rust ": "rust",
        "rs": "rust",
        "Go": "go",
        "c++": "cpp",
        "cpp": "cpp",
        "": "unknown",
        "brainfuck": "unknown",
    }
    df = spark.createDataFrame([(k,) for k in cases], ["lang"])
    got = {r["lang"]: r["norm"] for r in df.select("lang", normalize_lang("lang").alias("norm")).collect()}
    for k, v in cases.items():
        assert got[k] == v, (k, got[k], v)


def test_normalize_lang_null(spark):
    df = spark.createDataFrame([(None,)], "lang string")
    assert df.select(normalize_lang("lang").alias("n")).first()["n"] == "unknown"


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), (None,), ("one",)], "text string"
    )
    got = [r["n"] for r in df.select(token_count("text").alias("n")).collect()]
    assert got == [3, 0, 0, 0, 1]


def test_doc_fingerprint_normalization_invariant(spark):
    df = spark.createDataFrame(
        [("Hello,   World!",), ("hello world",), ("HELLO world.",)], "t string"
    )
    fps = [r["f"] for r in df.select(doc_fingerprint("t").alias("f")).collect()]
    assert len(set(fps)) == 1


def test_vector_ops(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [1.0, 2.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = df.select(
        dot("a", "b").alias("d"), cosine_similarity("a", "b").alias("c")
    ).collect()
    assert abs(got[0]["c"]) < 1e-12 and got[0]["d"] == 0.0
    assert abs(got[1]["c"] - 1.0) < 1e-12 and abs(got[1]["d"] - 5.0) < 1e-12
    assert got[2]["c"] == 0.0  # zero-norm guard


def test_split_assign_deterministic_and_weighted(spark):
    from etl_spark.functions.content import split_assign

    n = 4000
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    out = df.select("doc_id", split_assign("doc_id").alias("split"))
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # weights hold within a loose binomial tolerance at n=4000
    assert abs(counts["train"] / n - 0.9) < 0.03
    assert abs(counts["val"] / n - 0.05) < 0.02
    assert abs(counts["test"] / n - 0.05) < 0.02
    # deterministic: a second evaluation (different partitioning) is identical
    again = {
        r["doc_id"]: r["split"]
        for r in df.repartition(7).select(
            "doc_id", split_assign("doc_id").alias("split")
        ).collect()
    }
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again
    # a different seed produces a different (but still complete) assignment
    other = df.select("doc_id", split_assign("doc_id", seed=14).alias("split"))
    moved = (
        out.withColumnRenamed("split", "a")
        .join(other.withColumnRenamed("split", "b"), "doc_id")
        .where(F.col("a") != F.col("b"))
        .count()
    )
    assert moved > 0


def test_repetition_stats_golden(spark):
    from etl_spark.functions.content import (
        dup_ngram_frac,
        dup_token_frac,
        max_token_run,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # 6 tokens/2 distinct; 5 grams/2 distinct
            (2, "x x x x y"),          # run of 4
            (3, "all unique words"),   # no repetition
            (4, ""),                   # empty
            (5, None),                 # null
            (6, "solo"),               # 1 token: no 2-grams, run 1
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            dup_token_frac("text").alias("dt"),
            dup_ngram_frac("text", 2).alias("d2"),
            max_token_run("text").alias("mr"),
        ).collect()
    }
    assert (rows[1]["dt"], rows[1]["d2"], rows[1]["mr"]) == (0.666667, 0.6, 1)
    assert (rows[2]["dt"], rows[2]["d2"], rows[2]["mr"]) == (0.6, 0.5, 4)
    assert (rows[3]["dt"], rows[3]["d2"], rows[3]["mr"]) == (0.0, 0.0, 1)
    assert (rows[4]["dt"], rows[4]["d2"], rows[4]["mr"]) == (0.0, 0.0, 0)
    assert (rows[5]["dt"], rows[5]["d2"], rows[5]["mr"]) == (0.0, 0.0, 0)
    assert (rows[6]["dt"], rows[6]["d2"], rows[6]["mr"]) == (0.0, 0.0, 1)


def test_pii_redaction_golden(spark):
    from etl_spark.functions.content import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk from 10.0.0.1 card 4111111111111111"),
            (2, "no pii here 123 foo 12.34 1.2.3.4.5"),
            (3, None),
            (4, "two mails a@b.io c@d.org and ip 192.168.1.255"),
        ],
        "doc_id long, text string",
    )
    e, i, n = pii_counts("text")
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", e.alias("e"), i.alias("i"), n.alias("n"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["i"], rows[1]["n"]) == (1, 1, 1)
    assert rows[1]["red"] == "mail <EMAIL> from <IP> card <NUM>"
    # "1.2.3.4.5" over-matches its IPv4-shaped prefix — safety-first
    # redaction flags version-ish strings rather than leaking real IPs
    assert (rows[2]["e"], rows[2]["i"], rows[2]["n"]) == (0, 1, 0)
    assert rows[2]["red"] == "no pii here 123 foo 12.34 <IP>.5"
    assert rows[3]["red"] == ""
    assert (rows[4]["e"], rows[4]["i"]) == (2, 1)
    assert rows[4]["red"] == "two mails <EMAIL> <EMAIL> and ip <IP>"
