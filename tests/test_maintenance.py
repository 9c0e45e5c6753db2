"""Snapshot maintenance: time travel, history, expiry, vacuum, concurrency."""

from __future__ import annotations

from pathlib import Path

import pytest

from etl_spark.datagen import change_stream, write_segments
from etl_spark.lake.table import DATA_DIR, SnapshotTable
from etl_spark.pipeline import IngestPipeline


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("maint")
    stream = str(root / "stream")
    df = change_stream(spark, 3000, n_repos=10, paths_per_repo=30,
                       events_per_epoch=1000, dup_pct=5)
    write_segments(df, stream)
    pipe = IngestPipeline(spark, str(root / "table"), n_buckets=4)
    pipe.replay(stream)  # 3 incremental commits -> versions 1..3
    return pipe


def test_time_travel(replayed):
    t = replayed.table
    assert t.versions() == [1, 2, 3]
    v1 = t.read(version=1).count()
    v3 = t.read().count()
    assert 0 < v1 < v3
    # epoch set grows monotonically across snapshots (stored as ranges)
    from etl_spark.lake.table import decode_epoch_ranges

    assert decode_epoch_ranges(t.manifest(1)["applied_epochs"]) == {0}
    assert decode_epoch_ranges(t.manifest(3)["applied_epochs"]) == {0, 1, 2}


def test_timestamp_as_of(replayed):
    """TIMESTAMP AS OF resolution: version_as_of / read(as_of_ts=...)."""
    import time

    t = replayed.table
    ca = {v: t.manifest(v)["committed_at"] for v in (1, 2, 3)}
    assert ca[1] < ca[2] < ca[3]  # monotone under the publish sequence
    # exact commit instant resolves to that snapshot; in-between instants
    # resolve DOWN to the newest snapshot at-or-before them
    assert t.version_as_of(ca[2]) == 2
    assert t.version_as_of((ca[2] + ca[3]) / 2) == 2
    assert t.version_as_of(time.time()) == 3
    assert t.read(as_of_ts=ca[1]).count() == t.read(version=1).count()
    # an instant older than all retained history must FAIL, not resolve to
    # a later state
    with pytest.raises(FileNotFoundError):
        t.version_as_of(ca[1] - 60.0)
    with pytest.raises(ValueError):
        t.read(version=1, as_of_ts=ca[1])


def test_history(replayed):
    h = replayed.table.history()
    assert [e["version"] for e in h] == [1, 2, 3]
    assert h[-1]["rows"] == replayed.table.read().count()


def test_expire_and_vacuum(replayed):
    t = replayed.table
    data_dir = Path(t.root) / DATA_DIR
    # plant a crash orphan: written but never committed
    orphan = data_dir / "orphan.parquet"
    orphan.write_bytes(b"PAR1junkPAR1")
    n_before = t.read().count()

    # nothing referenced by retained snapshots may be deleted; the default
    # grace window protects young files, so a just-planted orphan survives a
    # default vacuum and only falls to older_than_s=0
    expired = t.expire_snapshots(retain_last=1)
    assert expired == [1, 2]
    guard = t.vacuum()  # default 1h grace: young orphans skipped
    assert orphan.exists() and guard["files_skipped_young"] >= 1
    stats = t.vacuum(older_than_s=0)
    assert stats["files_removed"] >= 1  # the orphan + v1/v2-only files
    assert not orphan.exists()
    assert t.read().count() == n_before  # current snapshot intact
    with pytest.raises(FileNotFoundError):
        t.manifest(1)


def test_concurrent_commit_conflict(spark, tmpdir_path):
    """Two writers planning against the same base version: first commit wins,
    second gets FileExistsError (optimistic concurrency, Iceberg-style)."""
    df = change_stream(spark, 200, n_repos=3, paths_per_repo=5,
                       events_per_epoch=200, dup_pct=0)
    a = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=2)
    b = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=2)
    a.merge_epochs(df, [0])
    base = a.manifest()
    # both now plan against version 1 and race the v2 swap
    a.merge_epochs(df.limit(50), [1])
    with pytest.raises(FileExistsError):
        b._commit_manifest({**base, "applied_epochs": [0, 99]},
                           base_version=base["version"])


def test_metrics_emitted(replayed):
    recs = replayed.metrics.read()
    assert len(recs) == 3  # one per incremental commit
    assert all(r["rows_written"] > 0 and r["seconds"] > 0 for r in recs)
    assert [r["epochs"] for r in recs] == [[0], [1], [2]]


def test_concurrent_merge_replans_and_succeeds(spark, tmpdir_path):
    """A writer that loses the manifest swap re-plans against the new snapshot
    and commits on retry (optimistic-concurrency loop)."""
    df = change_stream(spark, 300, n_repos=3, paths_per_repo=5,
                       events_per_epoch=150, dup_pct=0)
    a = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=2)
    a.merge_epochs(df.where("epoch = 0"), [0])

    b = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=2)
    orig = b._commit_manifest
    state = {"raced": False}

    def racing_commit(manifest, base_version=None):
        if not state["raced"]:
            state["raced"] = True
            # a concurrent writer lands version base+1 first
            a.merge_epochs(df.where("epoch = 1"), [1])
        return orig(manifest, base_version)

    b._commit_manifest = racing_commit
    commit = b.merge_epochs(df.where("epoch = 1").limit(10).withColumn(
        "path", df.path), [2])
    assert not commit.get("skipped")
    assert state["raced"]
    assert b.applied_epochs() == {0, 1, 2}
    # losing attempt's files are unreferenced orphans, reclaimed by vacuum
    b.expire_snapshots(retain_last=1)
    b.vacuum()
    assert b.read().count() > 0


def test_empty_epoch_commits_metadata_only(spark, tmpdir_path):
    """An epoch whose rows all fail validity still commits (epoch marked
    applied) without writing data files."""
    from etl_spark.pipeline import IngestPipeline
    import pyspark.sql.functions as F

    df = change_stream(spark, 200, n_repos=3, paths_per_repo=5,
                       events_per_epoch=100, dup_pct=0)
    # epoch 1's rows are invalidated (null content -> dropped by clean)
    poisoned = df.withColumn(
        "content", F.when(F.col("epoch") == 1, F.lit(None)).otherwise(F.col("content"))
    )
    from etl_spark.datagen import write_segments
    stream = f"{tmpdir_path}/stream"
    write_segments(poisoned, stream)
    pipe = IngestPipeline(spark, f"{tmpdir_path}/table", n_buckets=2)
    stats = pipe.replay(stream)
    assert [s.epoch for s in stats] == [0, 1]
    assert pipe.table.applied_epochs() == {0, 1}
    assert stats[1].events_applied == 0
    # replaying again is a no-op
    assert pipe.replay(stream) == []


def test_fsck(replayed):
    t = replayed.table
    report = t.fsck()
    assert report["ok"], report
    assert report["files_checked"] > 0
    # corrupt: delete one live data file
    victim = Path(t.manifest()["files"][0]["path"])
    victim.unlink()
    bad = t.fsck()
    assert not bad["ok"]
    assert any("missing data file" in f for f in bad["findings"])


def test_vacuum_sweeps_stale_staging(replayed):
    import os
    import time as _time

    t = replayed.table
    stale = Path(t.root) / "_staging-deadbeef"
    stale.mkdir()
    old = _time.time() - 7200
    os.utime(stale, (old, old))
    fresh = Path(t.root) / "_staging-cafebabe"
    fresh.mkdir()
    stats = t.vacuum()
    assert stats["staging_dirs_removed"] == 1
    assert not stale.exists() and fresh.exists()
    fresh.rmdir()


def test_rollback_restores_earlier_state(spark, tmpdir_path):
    """rollback commits a NEW version with the target's files/epochs; reads
    serve the old state, history is preserved, fsck accepts the shrink."""
    df = change_stream(spark, 600, n_repos=5, paths_per_repo=10,
                       events_per_epoch=200, dup_pct=0)
    pipe = IngestPipeline(spark, f"{tmpdir_path}/t", n_buckets=4)
    stream = f"{tmpdir_path}/stream"
    from etl_spark.datagen import write_segments
    write_segments(df, stream)
    pipe.replay(stream)  # versions 1..3
    t = pipe.table
    v1_rows = sorted(map(tuple, t.read(version=1).collect()))
    rb = t.rollback(1)
    assert rb["version"] == 4 and rb["rolled_back_to"] == 1
    assert sorted(map(tuple, t.read().collect())) == v1_rows
    assert t.applied_epochs() == {0}
    report = t.fsck()
    assert report["ok"], report
    # vacuum keeps the rolled-back-to files (referenced by v4)
    t.vacuum(older_than_s=0)
    assert sorted(map(tuple, t.read().collect())) == v1_rows
    # replay after rollback re-applies the rolled-back epochs
    pipe.replay(stream)
    assert t.applied_epochs() == {0, 1, 2}
    # CLI rollback --to-ts: "undo everything after the v1 commit instant"
    from etl_spark.cli import main as cli_main

    ts = t.manifest(1)["committed_at"]
    assert cli_main(
        ["rollback", "--table", str(t.root), "--to-ts", str(ts)]
    ) == 0
    t2 = type(t)(spark, str(t.root))  # fresh handle: adopt current layout
    assert sorted(map(tuple, t2.read().collect())) == v1_rows


def test_tags_pin_snapshots(spark, tmpdir_path):
    """Tags: stable names for snapshots, protected from expire; delete
    releases the pin. CLI surface included."""
    from etl_spark.cli import main as cli_main
    from etl_spark.lake.table import SnapshotTable, StagedRefExistsError

    t = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=2)
    rows = lambda e: spark.createDataFrame(  # noqa: E731
        [("r", f"p{e}", f"c00000000000{e}", "x")],
        ["repo", "path", "commit", "content"])
    for e in (1, 2, 3):
        t.merge_epoch(rows(e), e)
    v1_count = t.read(version=1).count()
    assert t.tag("train-v1", 1) == {"tag": "train-v1", "version": 1}
    with pytest.raises(StagedRefExistsError):
        t.tag("train-v1", 2)  # create-once
    with pytest.raises(FileNotFoundError):
        t.tag("nope", 99)  # must point at a live snapshot
    assert t.tags() == {"train-v1": 1}
    # expire skips the tagged version but drops its untagged peer
    assert t.expire_snapshots(retain_last=1) == [2]
    t.vacuum(older_than_s=0)
    assert t.read(version=1).count() == v1_count
    # CLI: list, create (default = current version), delete
    assert cli_main(["tag", "--table", str(t.root)]) == 0
    assert cli_main(["tag", "--table", str(t.root), "--name", "rc"]) == 0
    assert t.tags()["rc"] == 3
    assert cli_main(["tag", "--table", str(t.root), "--name", "rc",
                     "--delete"]) == 0
    # untagging releases the version to normal retention
    t.delete_tag("train-v1")
    assert t.expire_snapshots(retain_last=1) == [1]
    with pytest.raises(FileNotFoundError):
        t.tag_version("train-v1")


def test_changes_cli(spark, tmpdir_path, capsys):
    """CDC-out CLI: feed between snapshots, tag-resolved base, error path."""
    import json as _json

    from etl_spark.cli import main as cli_main
    from etl_spark.lake.table import SnapshotTable

    t = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=2)
    for e in (1, 2, 3):
        t.merge_epoch(
            spark.createDataFrame(
                [("r", f"p{e}", f"c00000000000{e}", "x")],
                ["repo", "path", "commit", "content"]),
            e)
    t.tag("cons", 1)
    assert cli_main(["changes", "--table", str(t.root), "--from", "1"]) == 0
    head = _json.loads(capsys.readouterr().out.splitlines()[0])
    assert head["rows"] == 2 and head["from"] == 1 and head["to"] == 3
    assert head["rows"] == t.changes_between(1).count()
    assert cli_main(["changes", "--table", str(t.root),
                     "--from-tag", "cons"]) == 0
    head = _json.loads(capsys.readouterr().out.splitlines()[0])
    assert head["rows"] == 2 and head["from"] == 1
    assert cli_main(["changes", "--table", str(t.root), "--from", "99"]) == 1


def test_compact_defragments_buckets(spark, tmpdir_path):
    """compact() rewrites fragmented buckets into few key-clustered files
    without changing table state or applied epochs."""
    from etl_spark.lake.table import SnapshotTable

    t = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=2,
                      target_file_rows=10, max_files_per_bucket=64)
    df = change_stream(spark, 500, n_repos=5, paths_per_repo=40,
                       events_per_epoch=500, dup_pct=0).drop("epoch")
    t.merge_epochs(df, [0])
    before = sorted(map(tuple, t.read().collect()))
    n_before = len(t.manifest()["files"])
    assert n_before > 10  # fragmented by the tiny target_file_rows
    t.target_file_rows = 1_000_000  # compaction writes full-size files
    out = t.compact(above=2)
    assert out["compacted_buckets"] == 2
    assert out["files_after"] <= 4
    assert sorted(map(tuple, t.read().collect())) == before
    assert t.applied_epochs() == {0}
    assert t.fsck()["ok"]
    # idempotent: nothing left to compact
    assert t.compact(above=2)["compacted_buckets"] == 0


def test_changes_between_snapshots(spark, tmpdir_path):
    """Change feed between snapshots returns exactly the rows each epoch
    applied; union of all deltas plus the base equals the final state keys."""
    from etl_spark.datagen import change_stream, write_segments
    from etl_spark.pipeline import IngestPipeline

    df = change_stream(spark, 3000, n_repos=10, paths_per_repo=30,
                       events_per_epoch=1000, dup_pct=5)
    stream = f"{tmpdir_path}/stream"
    write_segments(df, stream)
    pipe = IngestPipeline(spark, f"{tmpdir_path}/t", n_buckets=4)
    pipe.replay(stream)
    t = pipe.table
    assert t.versions() == [1, 2, 3]

    d12 = t.changes_between(1, 2)
    assert set(r["epoch"] for r in d12.select("epoch").distinct().collect()) == {1}
    # every delta row carries the latest state for its key at v2
    v2 = {(r["repo"], r["path"]): r["commit"]
          for r in t.read(version=2).collect()}
    for r in d12.collect():
        assert v2[(r["repo"], r["path"])] == r["commit"]

    # full feed from start == current table
    full = t.changes_between(None)
    assert full.count() == t.read().count()

    # feed across all consecutive pairs covers every current row exactly once
    total = sum(t.changes_between(v, v + 1).count() for v in [1, 2])
    base = t.changes_between(None, 1).count()
    # deltas can overwrite earlier keys, so base+deltas >= final rows
    assert base + total >= t.read().count()


def test_rebucket_partition_evolution(spark, tmpdir_path):
    """rebucket(): the bucket count is mutable after all (Iceberg
    bucket-transform partition evolution) — state, applied epochs,
    tombstones and MOR deltas all survive; stale handles are rejected."""

    def _df(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, content string")

    t = SnapshotTable(spark, tmpdir_path, n_buckets=4, merge_mode="mor",
                      target_file_rows=8)
    t.merge_epoch(_df([("r", f"p{i}", "c000000000001", "v1")
                       for i in range(40)]), 0)
    t.merge_epoch(_df([("r", f"p{i}", "c000000000002", "v2")
                       for i in range(0, 40, 4)]), 1)  # MOR delta files
    t.delete_epochs(
        spark.createDataFrame([("r", "p1", "c000000000003")],
                              "repo string, path string, commit string"), [2])
    assert any(f.get("kind") == "delta" for f in t.files())
    before = sorted((r.repo, r.path, r.commit, r.content)
                    for r in t.read().collect())
    stale = SnapshotTable(spark, tmpdir_path)  # attaches at 4 buckets

    out = t.rebucket(16)
    assert out["rebucketed"] and out["to"] == 16
    # state identical; deltas folded; lookups + fsck healthy at the new width
    assert sorted((r.repo, r.path, r.commit, r.content)
                  for r in t.read().collect()) == before
    assert not any(f.get("kind") == "delta" for f in t.files())
    assert {f["bucket"] for f in t.files()} <= set(range(16))
    assert t.lookup("r", "p2").first().content == "v1"
    assert t.lookup("r", "p1").count() == 0  # tombstone survived
    assert t.fsck()["ok"]
    # applied epochs carried: replaying an old epoch is a no-op
    assert t.merge_epoch(_df([("r", "p0", "c000000000001", "ZOMBIE")]), 0)[
        "skipped"]
    # late stale upsert still loses to the carried tombstone
    t.merge_epoch(_df([("r", "p1", "c000000000002", "ZOMBIE")]), 3)
    assert t.lookup("r", "p1").count() == 0
    # a handle attached under the old layout must be rejected, then
    # re-attaching adopts the new width
    with pytest.raises(RuntimeError, match="rebucketed"):
        stale.merge_epoch(_df([("r", "px", "c000000000009", "x")]), 9)
    with pytest.raises(RuntimeError, match="rebucketed"):
        stale.compact(above=0)
    # stale READS stay correct: candidate probing uses the manifest's width
    assert stale.lookup("r", "p2").first().content == "v1"
    assert SnapshotTable(spark, tmpdir_path).n_buckets == 16


def test_rebucket_old_layout_reclaimed_by_vacuum(spark, tmpdir_path):
    """After a rebucket, the previous layout's files are unreferenced by the
    new snapshot but still referenced by retained history — expire + vacuum
    must reclaim them without touching the live state."""

    def _df(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, content string")

    t = SnapshotTable(spark, tmpdir_path, n_buckets=4)
    t.merge_epoch(_df([("r", f"p{i}", "c000000000001", "v")
                       for i in range(40)]), 0)
    old_paths = {f["path"] for f in t.files()}
    t.rebucket(16)
    assert all(Path(p).exists() for p in old_paths)  # history still serves
    t.expire_snapshots(retain_last=1)
    out = t.vacuum(older_than_s=0)
    assert out["files_removed"] >= len(old_paths)
    assert not any(Path(p).exists() for p in old_paths)
    assert t.read().count() == 40
    assert t.fsck()["ok"]


def test_rebucket_crash_before_publish_leaves_state_intact(spark, tmpdir_path):
    """A rebucket that dies before the manifest swap must leave the table
    serving its old state (orphans only, reclaimed by vacuum), and the
    handle must revert to its attached width."""

    def _df(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, content string")

    t = SnapshotTable(spark, tmpdir_path, n_buckets=4)
    t.merge_epoch(_df([("r", f"p{i}", "c000000000001", "v")
                       for i in range(30)]), 0)
    before = sorted(map(tuple, t.read().collect()))

    def boom(manifest, base_version=None):
        raise OSError("simulated crash before publish")

    orig = t._commit_manifest
    t._commit_manifest = boom
    with pytest.raises(OSError):
        t.rebucket(16)
    t._commit_manifest = orig
    assert t.n_buckets == 4
    assert sorted(map(tuple, t.read().collect())) == before
    assert t.fsck()["ok"]
    swept = t.vacuum(older_than_s=0)
    assert swept["files_removed"] >= 1  # the crashed attempt's promotions
    assert sorted(map(tuple, t.read().collect())) == before


def test_expire_snapshots_time_based_retention(spark, tmpdir_path):
    """--retain alone would shorten the time-travel window on a busy table;
    older_than_s keeps young snapshots alive past the count policy."""
    import json
    import time as _time

    def _df(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, content string")

    t = SnapshotTable(spark, tmpdir_path, n_buckets=2)
    for e in range(4):
        t.merge_epoch(_df([("r", "p", f"c00000000000{e+1}", f"v{e}")]), e)
    assert t.versions() == [1, 2, 3, 4]
    # age v1 artificially; v2/v3 stay young
    mpath = Path(t.root) / "_meta" / "v000000000001.json"
    m1 = json.loads(mpath.read_text())
    m1["committed_at"] = _time.time() - 7200
    mpath.write_text(json.dumps(m1))
    expired = t.expire_snapshots(retain_last=1, older_than_s=3600)
    assert expired == [1]  # v2/v3 protected by age despite retain_last=1
    assert t.versions() == [2, 3, 4]
    assert t.expire_snapshots(retain_last=1, older_than_s=0) == [2, 3]


def test_change_feed_empty_across_rebucket(spark, tmpdir_path):
    """A rebucket rewrites every file but applies NO epochs — the change
    feed's epoch-range filter must report zero changed rows across it, and
    only genuinely-new epochs after it."""

    def _df(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, content string")

    t = SnapshotTable(spark, tmpdir_path, n_buckets=4)
    t.merge_epoch(_df([("r", "a", "c000000000001", "v1")]).selectExpr(
        "*", "CAST(0 AS INT) AS epoch"), 0)
    v_pre = t.current_version()
    t.rebucket(16)
    assert t.changes_between(v_pre).count() == 0
    t.merge_epoch(_df([("r", "b", "c000000000002", "v2")]).selectExpr(
        "*", "CAST(1 AS INT) AS epoch"), 1)
    feed = t.changes_between(v_pre).collect()
    assert [(r.path, r.epoch) for r in feed] == [("b", 1)]


def test_rollback_across_rebucket_restores_layout(spark, tmpdir_path):
    """rollback to a pre-rebucket snapshot restores the OLD bucket count
    (the manifest carries its layout); the handle re-adopts it, so lookups
    and subsequent writes keep working without re-attaching."""

    def _df(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, content string")

    t = SnapshotTable(spark, tmpdir_path, n_buckets=4)
    t.merge_epoch(_df([("r", f"p{i}", "c000000000001", "v")
                       for i in range(20)]), 0)
    v_pre = t.current_version()
    t.rebucket(16)
    rb = t.rollback(v_pre)
    assert rb["rolled_back_to"] == v_pre
    assert t.n_buckets == 4  # handle re-adopted the restored layout
    assert t.lookup("r", "p3").first().content == "v"
    t.merge_epoch(_df([("r", "q", "c000000000002", "w")]), 1)  # no drift error
    assert t.lookup("r", "q").first().content == "w"
    assert t.fsck()["ok"]
