"""Sessionization: window vs applyInPandas differential + gap semantics.

Models the reference's gap-split behavioral test ("points separated by a 3-day
gap never share a trajectory"; /root/reference/tests/test_transform_ls_to_cs.py:
342-384) on a generic keyed event stream.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_spark.operators.sessionize import (
    session_stats,
    sessionize_pandas,
    suppress_consecutive_duplicates,
    with_session_id,
)


def _events(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions split by a 2h gap
        (1, 1, t0, "a", 1.0),
        (1, 2, t0 + dt.timedelta(minutes=10), "a", 2.0),
        (1, 3, t0 + dt.timedelta(hours=2, minutes=11), "b", 3.0),
        # user 2: single session, tie timestamps broken by event_id
        (2, 4, t0, "a", 1.0),
        (2, 5, t0, "a", 1.0),
        (2, 6, t0 + dt.timedelta(minutes=29), "c", 9.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )


def test_gap_split(spark):
    df = with_session_id(_events(spark), gap_seconds=1800, tiebreak="event_id")
    got = {r["event_id"]: r["session_seq"] for r in df.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0, 5: 0, 6: 0}


def test_session_never_spans_long_gap(spark):
    """No session contains a gap larger than the threshold (reference gap-leak test)."""
    stats = session_stats(_events(spark), gap_seconds=1800, tiebreak="event_id")
    for r in stats.collect():
        assert r["duration_s"] <= 1800 * (r["n_events"] - 1) if r["n_events"] > 1 else True


def test_pandas_differential(spark):
    """applyInPandas sessionizer == window sessionizer, bit for bit."""
    base = _events(spark)
    a = with_session_id(base, gap_seconds=1800, tiebreak="event_id")
    b = sessionize_pandas(base, gap_seconds=1800, tiebreak="event_id")
    sa = sorted(map(tuple, a.select("event_id", "session_seq").collect()))
    sb = sorted(map(tuple, b.select("event_id", "session_seq").collect()))
    assert sa == sb


def test_pandas_differential_testdata(spark):
    """Same differential on the real events table (sf0.001)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = with_session_id(ev, gap_seconds=1800, tiebreak="event_id")
    b = sessionize_pandas(ev, gap_seconds=1800, tiebreak="event_id")
    key = ["event_id", "session_seq"]
    assert a.select(*key).exceptAll(b.select(*key)).count() == 0
    assert b.select(*key).exceptAll(a.select(*key)).count() == 0


def test_suppress_consecutive_duplicates(spark):
    df = _events(spark)
    out = suppress_consecutive_duplicates(
        df, key="user_id", order_cols=["ts", "event_id"], value_col="event_type"
    )
    kept = sorted(r["event_id"] for r in out.collect())
    # user1: a,a,b -> keep 1,3 ; user2: a,a,c -> keep 4,6
    assert kept == [1, 3, 4, 6]
