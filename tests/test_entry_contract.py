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
