"""Per-stratum top-k vocabulary statistics."""

from __future__ import annotations

from etl_spark.operators.vocab import vocab_topk


def test_vocab_topk_counts_ranks_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, "Foo foo BAR baz", "en"),
            (2, "foo bar! bar", "en"),
            (3, "zz zz yy", "de"),
            (4, None, "de"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {(r["lang"], r["token"]): r for r in vocab_topk(df, k=2).collect()}
    # en: foo x3 (case/punct-normalized), bar x3 -> tie broken token-asc
    assert out[("en", "bar")]["n"] == 3 and out[("en", "bar")]["rank"] == 1
    assert out[("en", "foo")]["n"] == 3 and out[("en", "foo")]["rank"] == 2
    # k=2 cuts baz; de: zz then yy; NULL text contributes nothing
    assert ("en", "baz") not in out
    assert out[("de", "zz")]["rank"] == 1 and out[("de", "yy")]["rank"] == 2


def test_vocab_min_count_prunes_singleton_tail(spark):
    df = spark.createDataFrame(
        [(1, "common common rare", "en")], "doc_id long, text string, lang string"
    )
    toks = {r["token"] for r in vocab_topk(df, k=10, min_count=2).collect()}
    assert toks == {"common"}
