"""applyInPandasWithState: streaming sessionization with cross-batch state.

Assertions are exact: with all input in one trigger, emitted (closed)
sessions == batch sessionization minus each user's LAST (still-open)
session; a second trigger whose data continues a user's open session must
STITCH it via the carried state, not start a new one.
"""

from __future__ import annotations

import pytest

from etl_spark.streaming.state import sessionize_stream

GAP = 1800

EVENTS_DDL = "user_id long, ts timestamp, event_id long"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, ["user_id", "es", "event_id"]).selectExpr(
        "user_id", "CAST(es AS timestamp) AS ts", "event_id"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, src, out_dir, ckpt):
    stream = (
        spark.readStream.schema(EVENTS_DDL).parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_s=GAP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _sessions(spark, out_dir):
    try:
        df = spark.read.parquet(out_dir)
    except Exception:
        return set()
    return {
        (r.user_id, r.ts_start_s, r.ts_end_s, r.n_events)
        for r in df.collect()
    }


def test_closed_sessions_match_batch_semantics(spark, tmpdir_path):
    rows = []
    # user 1: three sessions (two closed by gaps, last open)
    for i, es in enumerate([0, 100, 200, 5000, 5100, 12000]):
        rows.append((1, es, i))
    # user 2: one session only (stays open -> nothing emitted)
    rows += [(2, 50, 10), (2, 60, 11)]
    src = f"{tmpdir_path}/src"
    _write_batch(spark, src, rows)
    _run_stream(spark, src, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt")
    got = _sessions(spark, f"{tmpdir_path}/out")
    assert got == {
        (1, 0, 200, 3),
        (1, 5000, 5100, 2),
    }


def test_session_spanning_batches_is_stitched(spark, tmpdir_path):
    src = f"{tmpdir_path}/src"
    out, ckpt = f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt"
    # batch 1: open session [0..100]
    _write_batch(spark, src, [(7, 0, 0), (7, 100, 1)])
    _run_stream(spark, src, out, ckpt)
    assert _sessions(spark, out) == set()  # still open, nothing emitted
    # batch 2: 200 continues (gap 100 < GAP); 9000 closes it
    _write_batch(spark, src, [(7, 200, 2), (7, 9000, 3)])
    _run_stream(spark, src, out, ckpt)
    # the closed session spans BOTH batches: state carried the open session
    assert _sessions(spark, out) == {(7, 0, 200, 3)}


def test_late_event_does_not_split_session(spark, tmpdir_path):
    """A late (out-of-order across batches) event inside the carried session
    must not regress its end: the following event would otherwise see a
    false gap and split one session into two."""
    src = f"{tmpdir_path}/src"
    out, ckpt = f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt"
    # batch 1 leaves open session [0 .. 1000]
    _write_batch(spark, src, [(5, 0, 0), (5, 1000, 1)])
    _run_stream(spark, src, out, ckpt)
    # batch 2: late 100 (inside), then 2500 (within GAP of end=1000), then a
    # closer far in the future
    _write_batch(spark, src, [(5, 100, 2), (5, 2500, 3), (5, 99000, 4)])
    _run_stream(spark, src, out, ckpt)
    assert _sessions(spark, out) == {(5, 0, 2500, 4)}


def test_too_late_event_forms_own_earlier_session(spark, tmpdir_path):
    """An event older than gap_s before the carried session belongs to its
    OWN earlier session (batch semantics over the union), not to the carried
    one — the interval gap-merge closes it immediately."""
    src = f"{tmpdir_path}/src"
    out, ckpt = f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt"
    _write_batch(spark, src, [(9, 10_000, 0), (9, 10_100, 1)])
    _run_stream(spark, src, out, ckpt)
    _write_batch(spark, src, [(9, 100, 2), (9, 50_000, 3)])
    _run_stream(spark, src, out, ckpt)
    # late 100 -> its own closed session; carried [10000,10100] closed by
    # the far-future 50000 which stays open in state
    assert _sessions(spark, out) == {(9, 100, 100, 1), (9, 10_000, 10_100, 2)}


def test_lookup_null_key_value(spark, tmpdir_path):
    """lookup() with a None key component must use IS NULL semantics."""
    from pyspark.sql import types as T

    from etl_spark.lake.table import SnapshotTable

    s = T.StructType([T.StructField("repo", T.StringType()),
                      T.StructField("path", T.StringType()),
                      T.StructField("commit", T.StringType()),
                      T.StructField("content", T.StringType())])
    t = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=4)
    t.merge_epoch(spark.createDataFrame(
        [("r", None, "c000000000001", "v1"), ("r", "a", "c000000000001", "x")],
        s), 0)
    got = t.lookup("r", None).collect()
    assert len(got) == 1 and got[0].content == "v1"


def test_restart_does_not_duplicate(spark, tmpdir_path):
    src = f"{tmpdir_path}/src"
    out, ckpt = f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt"
    _write_batch(spark, src, [(1, 0, 0), (1, 10_000, 1)])
    _run_stream(spark, src, out, ckpt)
    first = _sessions(spark, out)
    assert first == {(1, 0, 0, 1)}
    # re-run with no new data: checkpoint makes it a no-op
    _run_stream(spark, src, out, ckpt)
    assert _sessions(spark, out) == first


def test_null_ts_event_is_isolated_not_fatal(spark, tmpdir_path):
    """ADVICE r2: a null ts must be dropped before the state fn — int(NaN)
    there would kill the whole streaming query instead of one bad row."""
    src = f"{tmpdir_path}/src"
    spark.createDataFrame(
        [(1, 0, 0), (1, 100, 1), (1, None, 2), (1, 5000, 3)],
        "user_id long, es long, event_id long",
    ).selectExpr(
        "user_id", "CAST(es AS timestamp) AS ts", "event_id"
    ).coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt")
    got = _sessions(spark, f"{tmpdir_path}/out")
    assert got == {(1, 0, 100, 2)}  # null row ignored, query survived


def test_open_sessions_reads_live_state_from_checkpoint(spark, tmpdir_path):
    """open_sessions exposes the in-flight (never-emitted) session tail via
    Spark 4's state data source, straight from the query checkpoint; after
    another micro-batch extends a session, the state read reflects it."""
    from etl_spark.streaming.state import open_sessions

    src = f"{tmpdir_path}/src"
    out = f"{tmpdir_path}/out"
    ckpt = f"{tmpdir_path}/ckpt"
    # user 1: closed session [0..200] + open tail at 12000;
    # user 2: single open session [50..60]
    _write_batch(spark, src, [(1, 0, 0), (1, 100, 1), (1, 200, 2),
                              (1, 12000, 3), (2, 50, 10), (2, 60, 11)])
    _run_stream(spark, src, out, ckpt)
    live = {
        (r.user_id, r.ts_start_s, r.ts_end_s, r.n_events)
        for r in open_sessions(spark, ckpt).collect()
    }
    assert live == {(1, 12000, 12000, 1), (2, 50, 60, 2)}
    # second batch continues user 1's open session within the gap
    _write_batch(spark, src, [(1, 12000 + GAP, 4)])
    _run_stream(spark, src, out, ckpt)
    live = {
        (r.user_id, r.ts_start_s, r.ts_end_s, r.n_events)
        for r in open_sessions(spark, ckpt).collect()
    }
    assert live == {(1, 12000, 12000 + GAP, 2), (2, 50, 60, 2)}
    # and nothing was spuriously emitted for the stitched session
    assert (1, 12000, 12000, 1) not in _sessions(spark, out)


def test_null_user_id_event_is_isolated_not_fatal(spark, tmpdir_path):
    """A null user_id would key a (None,) group whose emitted row violates
    SESSION_SCHEMA's non-null long and kill the whole query — it must be
    dropped like a null ts (per-row error isolation)."""
    src = f"{tmpdir_path}/src"
    spark.createDataFrame(
        [(1, 0, 0), (None, 50, 1), (1, 100, 2), (1, 5000, 3)],
        "user_id long, es long, event_id long",
    ).selectExpr(
        "user_id", "CAST(es AS timestamp) AS ts", "event_id"
    ).coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt")
    got = _sessions(spark, f"{tmpdir_path}/out")
    assert got == {(1, 0, 100, 2)}  # null-keyed row ignored, query survived
