"""Catch-up (single-commit bootstrap) replay: differential vs incremental,
idempotence, mixed-mode resume, lineage coverage."""

from __future__ import annotations

import pytest

from etl_spark.datagen import change_stream, write_segments
from etl_spark.pipeline import IngestPipeline
from tests.helpers import assert_frames_equal, oracle_final_state

N_EVENTS = 6000
N_EPOCHS = 3


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cstream") / "changes")
    df = change_stream(
        spark,
        N_EVENTS,
        n_repos=25,
        paths_per_repo=60,
        events_per_epoch=N_EVENTS // N_EPOCHS,
        dup_pct=8,
        with_metadata_from_epoch=2,
    )
    write_segments(df, root)
    return root


def test_catchup_matches_oracle_and_incremental(spark, stream, tmpdir_path):
    inc = IngestPipeline(spark, f"{tmpdir_path}/inc", n_buckets=8)
    inc.replay(stream)
    cat = IngestPipeline(spark, f"{tmpdir_path}/cat", n_buckets=8)
    stats = cat.replay(stream, mode="catchup")
    assert len(stats) == 1 and not stats[0].skipped
    assert stats[0].commit["epochs"] == [0, 1, 2]
    got = cat.table.read().drop("epoch").toPandas()
    assert_frames_equal(got, oracle_final_state(stream, with_metadata=True))
    assert_frames_equal(got, inc.table.read().drop("epoch").toPandas())
    assert cat.table.applied_epochs() == inc.table.applied_epochs() == {0, 1, 2}


def test_catchup_is_idempotent(spark, stream, tmpdir_path):
    pipe = IngestPipeline(spark, f"{tmpdir_path}/t", n_buckets=8)
    pipe.replay(stream, mode="catchup")
    v = pipe.table.current_version()
    again = pipe.replay(stream, mode="catchup")
    assert again == []
    assert pipe.table.current_version() == v


def test_incremental_then_catchup_resume(spark, stream, tmpdir_path):
    pipe = IngestPipeline(spark, f"{tmpdir_path}/t2", n_buckets=8)
    pipe.replay(stream, max_epoch=0)  # incremental first epoch
    stats = pipe.replay(stream, mode="catchup")  # catch up the rest
    assert stats[0].commit["epochs"] == [1, 2]
    got = pipe.table.read().drop("epoch").toPandas()
    assert_frames_equal(got, oracle_final_state(stream, with_metadata=True))


def test_catchup_lineage_covers_all_epochs(spark, stream, tmpdir_path):
    pipe = IngestPipeline(spark, f"{tmpdir_path}/t3", n_buckets=8)
    pipe.replay(stream, mode="catchup")
    log = pipe.log.read().toPandas()
    assert set(log["epoch"]) == set(range(N_EPOCHS))
    assert (log["row_count"] > 0).all()
    # every logged row count sums to the applied (deduped) total
    assert log["row_count"].sum() == pipe.table.read().count()
