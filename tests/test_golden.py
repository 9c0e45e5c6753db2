"""Golden-vector replay test — fixed checked-in input, fixed expected output.

The committed parquet stream + expected JSON under tests/golden/ verify the
full replay semantics (clean-stage drops, in-epoch and cross-epoch
latest-wins incl. a LATE older commit, lang normalization, additive
metadata evolution, sha256/byte derivations) with NO DuckDB dependency —
the reference's checked-in golden-output style
(/root/reference/tests/test_transform_ls_to_cs.py:180-273). Regenerate with
tests/golden/make_fixture.py only on documented semantic changes.
"""

from __future__ import annotations

import json
import os

import pytest

from etl_spark.pipeline import IngestPipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _expected():
    with open(os.path.join(GOLDEN, "expected_final_state.json")) as fh:
        return json.load(fh)


def _rows(table):
    cols = ["repo", "path", "lsn", "commit", "lang", "content", "metadata",
            "epoch", "content_sha256", "content_bytes"]
    out = [
        {c: r[c] for c in cols}
        for r in table.read().select(*cols).collect()
    ]
    return sorted(out, key=lambda r: (r["repo"], r["path"]))


@pytest.mark.parametrize("mode", ["incremental", "catchup"])
def test_golden_replay_matches_checked_in_vectors(spark, tmpdir_path, mode):
    pipe = IngestPipeline(spark, f"{tmpdir_path}/table_{mode}", n_buckets=4)
    stats = pipe.replay(f"{GOLDEN}/stream", mode=mode)
    assert stats and all(not s.skipped for s in stats)
    assert _rows(pipe.table) == _expected()
    # idempotence against the same golden stream
    assert pipe.replay(f"{GOLDEN}/stream", mode=mode) == []
    assert _rows(pipe.table) == _expected()


def test_golden_operator_vectors(spark):
    """Literal expected outputs for the content-derivation operators on fixed
    strings (simhash fingerprint, fingerprint-dedupe md5, token count) —
    pinned values, not oracle-relative."""
    from pyspark.sql import functions as F

    from etl_spark.functions.content import token_count
    from etl_spark.operators.textdedup import doc_fingerprint, simhash64

    df = spark.createDataFrame(
        [(0, "The quick brown fox"), (1, ""), (2, "the  QUICK   brown fox!")],
        ["id", "text"],
    )
    got = {
        r["id"]: (r["fp"], r["md5"], r["n"])
        for r in df.select(
            "id",
            simhash64("text").alias("fp"),
            doc_fingerprint("text").alias("md5"),
            token_count("text").alias("n"),
        ).collect()
    }
    # golden vectors (computed once from the documented algorithm, pinned)
    assert got[1] == (0, "d41d8cd98f00b204e9800998ecf8427e", 0)
    assert got[0][0] == 1140660199213328064
    assert got[0][1] == "30f3c93e46436deb58ba70816a8ec124"
    # same normalized token set -> identical simhash and fingerprint
    assert got[0][0] == got[2][0]
    assert got[0][1] == got[2][1]
    assert (got[0][2], got[2][2]) == (4, 4)
