"""Driver-contract regression gate: every oracle-backed ``queries()`` entry
must match its DuckDB ``oracle_sql()`` at sf0.001 (mirror of the driver's
CORRECTNESS check, via tools/selfcheck.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import __spark_entry__ as entry_mod  # noqa: E402
from selfcheck import canon, duck_con  # noqa: E402

SF = "/root/testdata/sf0.001"
_ORACLES = entry_mod.oracle_sql()
# main 50-entry driver registry plus the trimmed redundant variants — the
# oracle gate covers BOTH (the driver only sees the first dict)
_QUERIES = {**entry_mod.queries(), **entry_mod.extra_queries()}


def test_driver_registry_is_exactly_50_with_ann_ivf_last():
    q = entry_mod.queries()
    assert len(q) == 50  # round-2 driver recorded exactly the first 50
    assert list(q)[-1] == "ann_ivf"  # rows-only query stays last


def test_every_oracle_has_query():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    got = _QUERIES[name](spark, SF).toPandas()
    if name not in _ORACLES:
        assert len(got) >= 0  # rows-only contract (non-SQL-expressible)
        return
    want = duck_con(SF).execute(_ORACLES[name]).df()
    cg, cw = canon(got), canon(want)
    assert list(cg.columns) == list(cw.columns)
    assert len(cg) == len(cw)
    pd.testing.assert_frame_equal(cg, cw, check_dtype=False)


def test_scratch_dir_sweeps_stale_and_registers_cleanup(tmp_path, monkeypatch):
    """Registry queries build temp tables a returned DataFrame lazily
    reads, so scratch roots outlive the query call — they are reaped at
    interpreter exit, and >1h-stale dirs from crashed runs are swept on
    the next call so repeated driver/bench rounds never fill /tmp."""
    import atexit
    import os
    import tempfile

    real_mkdtemp = tempfile.mkdtemp
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(
        tempfile, "mkdtemp",
        lambda prefix: real_mkdtemp(prefix=prefix, dir=str(tmp_path)),
    )
    stale = tmp_path / "etl_spark_x_stale"
    stale.mkdir()
    (stale / "f").write_text("x")
    old = 7200
    os.utime(stale, (os.path.getatime(stale) - old, os.path.getmtime(stale) - old))
    fresh_existing = tmp_path / "etl_spark_x_fresh"
    fresh_existing.mkdir()

    registered = []
    monkeypatch.setattr(atexit, "register", lambda fn, *a, **k: registered.append(a))
    root = entry_mod._scratch_dir("etl_spark_x_")
    assert not stale.exists()            # stale sibling swept
    assert fresh_existing.exists()       # young sibling untouched
    assert os.path.isdir(root)
    assert registered and registered[0][0] == root  # atexit rmtree queued


def test_corpus_pipeline_decontamination_normalizes_case_and_punct(
    spark, tmp_path
):
    """Regression: the composed corpus_pipeline oracle must shingle the
    decontamination step over NORMALIZED tokens (lowercase, punctuation
    stripped) exactly like Spark's norm_tokens()/shingles() — a train doc
    sharing an 8-gram with a holdout doc up to case/punctuation IS
    contaminated. The stock sf0.001 corpus has no such cross-split partial
    overlap, so this seeds one deliberately and runs query + oracle on it."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from etl_spark.functions.content import split_assign

    # find one train id and one non-train id among small ints
    ids = spark.range(1, 60).select(
        F.col("id").alias("doc_id"), split_assign("doc_id").alias("split")
    ).toPandas()
    train_id = int(ids[ids.split == "train"].doc_id.iloc[0])
    hold_id = int(ids[ids.split != "train"].doc_id.iloc[0])

    base = (
        "The Quick Brown Fox Jumps Over The Lazy Dog And Then It Runs To "
        "The Old Stone Bridge In The Morning For A While With The Others"
    )
    # same words, lowercased + punctuation: identical NORMALIZED 8-grams,
    # zero shared RAW 8-grams (case differs), different md5 (not exact dups)
    variant = (
        "the quick, brown fox jumps over the lazy dog; and then it runs "
        "onward to the distant harbor in the evening for a moment there"
    )
    pdf = pd.DataFrame(
        {
            "doc_id": [train_id, hold_id],
            "text": [base, variant],
            "lang": ["en", "en"],
            "source": ["seed", "seed"],
            "n_chars": [len(base), len(variant)],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")

    got = _QUERIES["corpus_pipeline"](spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(_ORACLES["corpus_pipeline"]).df()

    # both docs pass the gates; the train doc is contaminated and dropped
    assert hold_id in set(got.doc_id), "holdout doc fell to a gate"
    assert train_id not in set(got.doc_id), "case-variant overlap missed"
    cg, cw = canon(got), canon(want)
    assert list(cg.columns) == list(cw.columns)
    pd.testing.assert_frame_equal(cg, cw, check_dtype=False)
