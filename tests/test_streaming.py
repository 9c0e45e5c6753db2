"""Structured Streaming ingest: final state == batch replay, restart-safe."""

from __future__ import annotations

import pytest

from etl_spark.datagen import change_stream, write_segments
from etl_spark.lake.table import SnapshotTable
from etl_spark.streaming.ingest import stream_ingest
from tests.helpers import assert_frames_equal, oracle_final_state

N_EVENTS = 4000
N_EPOCHS = 2


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sstream") / "changes")
    df = change_stream(
        spark,
        N_EVENTS,
        n_repos=20,
        paths_per_repo=40,
        events_per_epoch=N_EVENTS // N_EPOCHS,
        dup_pct=8,
    )
    write_segments(df, root)
    return root


def test_streaming_matches_oracle(spark, stream, tmpdir_path):
    q = stream_ingest(spark, stream, f"{tmpdir_path}/table", n_buckets=8)
    q.awaitTermination(120)
    table = SnapshotTable(spark, f"{tmpdir_path}/table")
    got = table.read().drop("epoch").toPandas()
    want = oracle_final_state(stream)
    assert_frames_equal(got, want)


def test_streaming_restart_is_noop(spark, stream, tmpdir_path):
    root = f"{tmpdir_path}/table2"
    q = stream_ingest(spark, stream, root, n_buckets=8)
    q.awaitTermination(120)
    table = SnapshotTable(spark, root)
    v = table.current_version()
    # restart against the same checkpoint: backlog already consumed -> no-op
    q2 = stream_ingest(spark, stream, root, n_buckets=8)
    q2.awaitTermination(120)
    assert table.current_version() == v


def test_streaming_picks_up_new_segments(spark, stream, tmpdir_path):
    """Consume the backlog, then a new segment arrives; the next availableNow
    pass applies exactly the delta (streaming checkpoint + idempotent sink)."""
    import shutil

    root = f"{tmpdir_path}/table3"
    q = stream_ingest(spark, stream, root, n_buckets=8)
    q.awaitTermination(120)
    # The generator is a pure function of lsn, so a 1.5x-length stream shares
    # its first N_EPOCHS segments with `stream`; epoch 2 is the new arrival.
    bigger = f"{tmpdir_path}/bigger"
    df = change_stream(
        spark,
        N_EVENTS + N_EVENTS // 2,
        n_repos=20,
        paths_per_repo=40,
        events_per_epoch=N_EVENTS // N_EPOCHS,
        dup_pct=8,
    )
    write_segments(df, bigger)
    try:
        shutil.copytree(f"{bigger}/epoch={N_EPOCHS}", f"{stream}/epoch={N_EPOCHS}")
        q2 = stream_ingest(spark, stream, root, n_buckets=8)
        q2.awaitTermination(120)
        table = SnapshotTable(spark, root)
        got = table.read().drop("epoch").toPandas()
        assert_frames_equal(got, oracle_final_state(stream))
    finally:
        shutil.rmtree(f"{stream}/epoch={N_EPOCHS}", ignore_errors=True)


def test_streaming_after_batch_replay_does_not_skip(spark, stream, tmpdir_path):
    """Mixing drivers on one table: batch replay applies segment epochs 0..N,
    then streaming starts with a fresh checkpoint whose micro-batch ids also
    begin at 0. Batch ids live in their own commit-id space, so the first
    micro-batches must NOT be skipped as 'already applied' — the final state
    still matches the oracle and the stream space records its batches."""
    from etl_spark.pipeline import IngestPipeline

    root = f"{tmpdir_path}/table"
    pipe = IngestPipeline(spark, root, n_buckets=8)
    pipe.replay(stream)
    assert pipe.table.applied_epochs() == {0, 1}
    q = stream_ingest(spark, stream, root, n_buckets=8)
    q.awaitTermination(120)
    table = SnapshotTable(spark, root)
    # streaming batches committed in their own space, batch space untouched
    assert table.applied_epochs() == {0, 1}
    assert len(table.applied_epochs(space="stream")) > 0
    got = table.read().drop("epoch").toPandas()
    assert_frames_equal(got, oracle_final_state(stream))
    assert table.fsck()["ok"]
    # change-feed attribution on a MIXED table: an identical re-delivery
    # changes nothing (empty feed is correct); NEW data arriving via the
    # stream must surface with provenance in the disjoint stream id range —
    # before namespacing it was silently dropped as "already-applied epoch N"
    import shutil as _sh

    from etl_spark.lake.table import STREAM_EPOCH_BASE

    v_after_first_stream = table.current_version()
    bigger = change_stream(
        spark, N_EVENTS + N_EVENTS // 2, n_repos=20, paths_per_repo=40,
        events_per_epoch=N_EVENTS // N_EPOCHS, dup_pct=8,
    )
    write_segments(bigger, f"{tmpdir_path}/bigger")
    try:
        _sh.copytree(f"{tmpdir_path}/bigger/epoch={N_EPOCHS}",
                     f"{stream}/epoch={N_EPOCHS}")
        q2 = stream_ingest(spark, stream, root, n_buckets=8)
        q2.awaitTermination(120)
        feed = table.changes_between(v_after_first_stream)
        assert feed.count() > 0
        assert feed.where(f"epoch < {STREAM_EPOCH_BASE}").count() == 0
        got = table.read().drop("epoch").toPandas()
        assert_frames_equal(got, oracle_final_state(stream))
    finally:
        _sh.rmtree(f"{stream}/epoch={N_EPOCHS}", ignore_errors=True)


def test_streaming_deletes(spark, tmpdir_path):
    """WAL op-column deletes flow through the streaming path identically to
    batch replay: whatever micro-batch boundaries availableNow picks, the
    tombstone arbitration is order-independent (deletes persist flagged and
    arbitrate by commit), so the final state equals latest-per-key keeping
    only upsert winners."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    root = str(tmpdir_path)
    df = change_stream(
        spark, N_EVENTS, n_repos=20, paths_per_repo=40,
        events_per_epoch=N_EVENTS // N_EPOCHS, delete_pct=15,
    )
    write_segments(df, f"{root}/stream")
    q = stream_ingest(
        spark, f"{root}/stream", f"{root}/table", n_buckets=8,
        extra_schema="op string",
    )
    q.awaitTermination(120)
    table = SnapshotTable(spark, f"{root}/table")
    w = Window.partitionBy("repo", "path").orderBy(F.col("commit").desc())
    expected = {
        (r.repo, r.path): r.commit
        for r in df.withColumn("rn", F.row_number().over(w))
        .where("rn = 1 AND op = 'u'")
        .collect()
    }
    got = {(r.repo, r.path): r.commit for r in table.read().collect()}
    assert got == expected


def test_streaming_schema_evolution(spark, tmpdir_path):
    """Additive column flows through the streaming path: new rows populate it,
    pre-evolution keys read back null."""
    from pyspark.sql import functions as F

    root = str(tmpdir_path)
    df = change_stream(
        spark, N_EVENTS, n_repos=20, paths_per_repo=40,
        events_per_epoch=N_EVENTS // N_EPOCHS, with_metadata_from_epoch=1,
    )
    write_segments(df, f"{root}/stream")
    q = stream_ingest(
        spark, f"{root}/stream", f"{root}/table", n_buckets=8,
        extra_schema="metadata string",
    )
    q.awaitTermination(120)
    table = SnapshotTable(spark, f"{root}/table")
    final = table.read()
    assert "metadata" in final.columns
    assert final.where(F.col("metadata").isNotNull()).count() > 0
    got = final.drop("epoch").toPandas()
    assert_frames_equal(got, oracle_final_state(f"{root}/stream", with_metadata=True))


def test_retry_on_layout_drift_reattaches_once():
    """The stream's batch wrapper re-attaches exactly once on the drift
    rejection and propagates everything else."""
    import pytest

    from etl_spark.lake.table import LayoutDriftError
    from etl_spark.streaming.ingest import _retry_on_layout_drift

    calls = {"run": 0, "reattach": 0}

    def drift_once():
        calls["run"] += 1
        if calls["run"] == 1:
            raise LayoutDriftError("table x was rebucketed to 16 buckets")
        return "ok"

    assert _retry_on_layout_drift(
        drift_once, lambda: calls.__setitem__("reattach", 1)) == "ok"
    assert calls == {"run": 2, "reattach": 1}

    # other errors — even ones mentioning rebuckets in prose — propagate
    with pytest.raises(ValueError):
        _retry_on_layout_drift(
            lambda: (_ for _ in ()).throw(ValueError("other")), lambda: None)
    with pytest.raises(RuntimeError, match="rebucketed"):
        _retry_on_layout_drift(
            lambda: (_ for _ in ()).throw(
                RuntimeError("log line quoting 'rebucketed'")),
            lambda: None)

    def drift_always():
        raise LayoutDriftError("was rebucketed again")

    with pytest.raises(LayoutDriftError):
        _retry_on_layout_drift(drift_always, lambda: None)


def test_stream_resumes_exactly_once_after_rebucket(spark, tmpdir_path):
    """A rebucket between streaming runs: the next run attaches under the
    new layout and applies only the NEW backlog (batch-id space intact)."""
    from etl_spark.datagen import change_stream, write_segments
    from etl_spark.lake.table import SnapshotTable
    from etl_spark.streaming import stream_ingest

    df = change_stream(spark, 2000, n_repos=5, paths_per_repo=20,
                       events_per_epoch=1000, dup_pct=0)
    write_segments(df.where("epoch = 0"), f"{tmpdir_path}/stream")
    q = stream_ingest(spark, f"{tmpdir_path}/stream", f"{tmpdir_path}/t",
                      n_buckets=4)
    q.awaitTermination(120)
    t = SnapshotTable(spark, f"{tmpdir_path}/t")
    n1 = t.read().count()
    assert n1 > 0
    t.rebucket(16)
    # new backlog arrives after the rebucket
    write_segments(df.where("epoch = 1"), f"{tmpdir_path}/stream")
    q2 = stream_ingest(spark, f"{tmpdir_path}/stream", f"{tmpdir_path}/t",
                       n_buckets=4)
    q2.awaitTermination(120)
    fresh = SnapshotTable(spark, f"{tmpdir_path}/t")
    assert fresh.n_buckets == 16
    assert fresh.read().count() > n1
    assert fresh.fsck()["ok"]


def test_stream_lineage_heals_crash_between_commit_and_log(
    spark, stream, tmpdir_path
):
    """Crash window: manifest commit lands, the lineage write does not.
    On re-delivery the merge is a no-op (exactly-once) and the heal must
    rebuild that batch's lineage from the rows' stream provenance — the
    streaming mirror of apply_epoch's batch-path heal."""
    import shutil

    from etl_spark.checkpoint import CheckpointLog
    from etl_spark.pipeline import IngestPipeline
    from etl_spark.streaming.ingest import STREAM_DDL, _apply_stream_batch

    pipe = IngestPipeline(
        spark, f"{tmpdir_path}/t", n_buckets=4, count_input=False
    )
    pipe.log = CheckpointLog(spark, f"{tmpdir_path}/t/_checkpoint_stream")
    batch = spark.read.schema(f"{STREAM_DDL}, epoch int").option(
        "basePath", stream
    ).parquet(f"{stream}/epoch=*")

    _apply_stream_batch(pipe, batch, 0)
    assert 0 in pipe.log.logged_epochs()
    before = pipe.log.read().where("epoch = 0").count()
    assert before > 0

    # simulate the crash window: commit persisted, lineage lost
    shutil.rmtree(f"{tmpdir_path}/t/_checkpoint_stream")
    pipe.log = CheckpointLog(spark, f"{tmpdir_path}/t/_checkpoint_stream")
    assert 0 not in pipe.log.logged_epochs()

    # re-delivery: merge is a no-op, heal rebuilds the lineage
    _apply_stream_batch(pipe, batch, 0)
    assert 0 in pipe.log.logged_epochs()
    healed = pipe.log.read().where("epoch = 0")
    assert healed.count() > 0
    # healed rows aggregate the same event counts per bucket as the rows
    got = healed.agg({"row_count": "sum"}).collect()[0][0]
    live = pipe.table.read().count()
    assert got == live  # every current row's lineage restored
