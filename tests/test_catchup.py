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


def test_lineage_compaction_preserves_log_and_heals_crash_windows(
    spark, stream, tmpdir_path
):
    """compact() folds per-epoch lineage dirs into one consolidated parquet:
    read()/logged_epochs() are unchanged, the dir count shrinks, further
    appends + compactions chain, and the marker-swapped-but-dirs-present
    crash window cannot double-count."""
    import shutil
    from pathlib import Path

    pipe = IngestPipeline(spark, f"{tmpdir_path}/t", n_buckets=4)
    pipe.replay(stream)  # 3 epochs -> 3 per-epoch lineage dirs
    log = pipe.log
    before = sorted(map(tuple, log.read().collect()))
    epochs_before = log.logged_epochs()
    assert len(list(Path(log.root).glob("epoch=*"))) == 3

    out = log.compact(keep_last=1, grace_s=0)
    assert out["compacted_epochs"] == 2
    assert sorted(map(tuple, log.read().collect())) == before
    assert log.logged_epochs() == epochs_before
    assert len(list(Path(log.root).glob("epoch=*"))) == 1

    # crash window: victim dirs still present AFTER the marker swap — the
    # per-epoch dir overrides its consolidated copy with IDENTICAL rows,
    # so the view stays duplicate-free
    log._write_pandas(
        log.read().where("epoch = 0").toPandas(), 0
    )  # resurrect a covered per-epoch dir, as an interrupted cleanup would
    assert sorted(map(tuple, log.read().collect())) == before
    assert log.logged_epochs() == epochs_before

    # rollback-then-replay: a covered epoch REWRITTEN with different rows
    # must be served from its fresh dir, not the stale consolidated copy
    pdf0 = log.read().where("epoch = 0").toPandas()
    pdf0["row_count"] = pdf0["row_count"] + 1000
    log._write_pandas(pdf0, 0)
    got0 = {(r.bucket, r.row_count)
            for r in log.read().where("epoch = 0").collect()}
    assert got0 == {(int(b), int(c)) for b, c in
                    zip(pdf0["bucket"], pdf0["row_count"])}

    # chained compaction folds the remainder AND the rewrite, reclaiming
    # every per-epoch dir (covered-but-present included)
    out2 = log.compact(keep_last=0, grace_s=0)
    assert out2["compacted_epochs"] == 2  # epoch 2 (kept) + rewritten 0
    after = sorted(map(tuple, log.read().collect()))
    assert {r[0] for r in after} == {r[0] for r in before}
    assert log.logged_epochs() == epochs_before
    assert len(list(Path(log.root).glob("epoch=*"))) == 0
    assert len([p for p in Path(log.root).glob("compacted-*")]) == 1
    # the rewrite survived the fold
    got0 = {(r.bucket, r.row_count)
            for r in log.read().where("epoch = 0").collect()}
    assert got0 == {(int(b), int(c)) for b, c in
                    zip(pdf0["bucket"], pdf0["row_count"])}
    # concurrent compactor: a fresh young lock file rejects the second run
    (Path(log.root) / "compact.lock").touch()
    assert log.compact(keep_last=0, grace_s=0).get("skipped")
    (Path(log.root) / "compact.lock").unlink()
    # the pipeline's resume logic still sees every epoch as logged
    assert pipe.replay(stream) == []
    shutil.rmtree(f"{tmpdir_path}/t", ignore_errors=True)


def test_lineage_compaction_grace_window_defers_reclamation(
    spark, stream, tmpdir_path
):
    """Under a non-zero grace window, compact() RETIRES superseded dirs
    instead of deleting them: a concurrent reader that resolved the old
    marker can finish its scan (the dirs are physically intact and the
    overlaid view is duplicate-free), and a LATER compact() reaps them once
    past grace. A retired dir rewritten before reaping (rollback-then-
    replay) is spared — its fresh rows win."""
    import json
    from pathlib import Path

    pipe = IngestPipeline(spark, f"{tmpdir_path}/tg", n_buckets=4)
    pipe.replay(stream)  # 3 epochs
    log = pipe.log
    before = sorted(map(tuple, log.read().collect()))

    out = log.compact(keep_last=1, grace_s=3600)
    assert out["compacted_epochs"] == 2 and out["reaped_dirs"] == 0
    # victims retired, NOT deleted — old view still fully readable
    assert len(list(Path(log.root).glob("epoch=*"))) == 3
    retired = json.loads((Path(log.root) / "retired.json").read_text())
    assert {"epoch=0", "epoch=1"} <= set(retired)
    # overlaid view stays duplicate-free while retirees linger
    assert sorted(map(tuple, log.read().collect())) == before

    # rewrite one retiree before reaping: it must be spared
    pdf0 = log.read().where("epoch = 0").toPandas()
    pdf0["row_count"] = pdf0["row_count"] + 7
    log._write_pandas(pdf0, 0)

    # age out the retirement stamps, then reap via the next compact()
    aged = {k: {**v, "retired_at": v["retired_at"] - 7200}
            for k, v in retired.items()}
    (Path(log.root) / "retired.json").write_text(json.dumps(aged))
    out2 = log.compact(keep_last=1, grace_s=3600)
    # epoch=1 reaped (unchanged past grace); epoch=0 spared (mtime changed)
    assert not (Path(log.root) / "epoch=1").exists()
    assert (Path(log.root) / "epoch=0").exists()
    assert out2["reaped_dirs"] >= 1
    # the rewrite is the visible truth
    got0 = {(r.bucket, r.row_count)
            for r in log.read().where("epoch = 0").collect()}
    assert got0 == {(int(b), int(c))
                    for b, c in zip(pdf0["bucket"], pdf0["row_count"])}


def test_lineage_compaction_is_idempotent_inside_grace_window(
    spark, stream, tmpdir_path
):
    """ADVICE-r4-review: retired-but-present dirs must NOT be re-folded by
    every compact() inside the grace window — that would rewrite the whole
    consolidation (and retire one more full copy) per run under a
    maintenance cron. A second compact() with nothing new is a no-op."""
    import json
    from pathlib import Path

    pipe = IngestPipeline(spark, f"{tmpdir_path}/ti", n_buckets=4)
    pipe.replay(stream)  # 3 epochs
    log = pipe.log
    before = sorted(map(tuple, log.read().collect()))

    out1 = log.compact(keep_last=1, grace_s=3600)
    assert out1["compacted_epochs"] == 2
    dirs_after_first = sorted(
        p.name for p in Path(log.root).glob("compacted-*")
    )
    retired_after_first = json.loads(
        (Path(log.root) / "retired.json").read_text()
    )

    # immediately again, still inside grace: nothing new to fold
    out2 = log.compact(keep_last=1, grace_s=3600)
    assert out2["compacted_epochs"] == 0 and out2["reaped_dirs"] == 0
    assert sorted(
        p.name for p in Path(log.root).glob("compacted-*")
    ) == dirs_after_first  # no extra consolidation copies accumulate
    assert json.loads(
        (Path(log.root) / "retired.json").read_text()
    ) == retired_after_first
    assert sorted(map(tuple, log.read().collect())) == before

    # a rewritten retiree IS new truth: the next compact re-folds just it
    pdf0 = log.read().where("epoch = 0").toPandas()
    pdf0["row_count"] = pdf0["row_count"] + 3
    log._write_pandas(pdf0, 0)
    out3 = log.compact(keep_last=1, grace_s=3600)
    assert out3["compacted_epochs"] == 1
    got0 = {(r.bucket, r.row_count)
            for r in log.read().where("epoch = 0").collect()}
    assert got0 == {(int(b), int(c))
                    for b, c in zip(pdf0["bucket"], pdf0["row_count"])}
    # ...and the re-fold refreshed the retirement stamp, so the run AFTER
    # the re-fold is a no-op again (a stale mtime stamp would make every
    # later compact inside the window re-fold the same dir forever)
    dirs_after_refold = sorted(
        p.name for p in Path(log.root).glob("compacted-*")
    )
    out4 = log.compact(keep_last=1, grace_s=3600)
    assert out4["compacted_epochs"] == 0
    assert sorted(
        p.name for p in Path(log.root).glob("compacted-*")
    ) == dirs_after_refold


def test_refold_of_rewritten_dir_restarts_grace_clock(
    spark, stream, tmpdir_path
):
    """ADVICE-r5 #1: re-folding a REWRITTEN retiree must RESET retired_at,
    not keep the original stamp — a reader that resolved the pre-refold
    marker may still be scanning the dir, so its grace window restarts
    with the new content. An UNCHANGED retiree keeps its earliest stamp
    (repeated no-op compacts cannot postpone reaping)."""
    import json
    from pathlib import Path

    pipe = IngestPipeline(spark, f"{tmpdir_path}/tr", n_buckets=4)
    pipe.replay(stream)  # 3 epochs
    log = pipe.log

    log.compact(keep_last=1, grace_s=3600)
    retired = json.loads((Path(log.root) / "retired.json").read_text())
    t0 = retired["epoch=0"]["retired_at"]
    t1 = retired["epoch=1"]["retired_at"]
    # backdate epoch=0's stamp so a kept-stamp bug is distinguishable from
    # a reset (both would otherwise be ~now)
    retired["epoch=0"]["retired_at"] = t0 - 1800
    (Path(log.root) / "retired.json").write_text(json.dumps(retired))

    # rewrite epoch=0 (rollback-then-replay), then re-fold it
    pdf0 = log.read().where("epoch = 0").toPandas()
    pdf0["row_count"] = pdf0["row_count"] + 1
    log._write_pandas(pdf0, 0)
    out = log.compact(keep_last=1, grace_s=3600)
    assert out["compacted_epochs"] == 1 and out["reaped_dirs"] == 0

    after = json.loads((Path(log.root) / "retired.json").read_text())
    # changed content -> clock restarted (not the backdated stamp)
    assert after["epoch=0"]["retired_at"] >= t0
    # unchanged retiree -> earliest stamp kept
    assert after["epoch=1"]["retired_at"] == t1
    # and the dir is still physically present for the in-flight reader
    assert (Path(log.root) / "epoch=0").exists()
