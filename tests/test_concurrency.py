"""Optimistic-concurrency property test: interleaved writers + vacuum.

VERDICT r2 #5: two writers racing merges while vacuum runs must lose no
data — the os.link manifest swap serializes commits, losers re-plan, and
vacuum's grace window protects just-promoted files of in-flight commits.
"""

from __future__ import annotations

import threading

from etl_spark.lake.table import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )


def _run_race(spark, root, merge_mode):
    t_writer_a = SnapshotTable(spark, root, n_buckets=4, merge_mode=merge_mode)
    t_writer_b = SnapshotTable(spark, root, n_buckets=4, merge_mode=merge_mode)
    # seed so both writers attach to the same layout
    t_writer_a.merge_epoch(
        _df(spark, [("r", f"p{i:02d}", "c000000000001", "seed")
                    for i in range(40)]), 0)

    errors: list[Exception] = []
    done = threading.Event()

    def writer(t, epochs):
        try:
            for e in epochs:
                rows = [("r", f"p{(e * 7 + j) % 40:02d}", f"c{e + 1:012d}",
                         f"e{e}") for j in range(5)]
                t.merge_epochs(_df(spark, rows), [e], max_retries=50)
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(exc)

    def vacuumer(t):
        try:
            while not done.is_set():
                # default-style grace: young orphans (incl. files of
                # in-flight commits) must be skipped
                t.vacuum(older_than_s=3600.0)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    th_a = threading.Thread(target=writer, args=(t_writer_a, range(1, 7)))
    th_b = threading.Thread(target=writer, args=(t_writer_b, range(7, 13)))
    th_v = threading.Thread(target=vacuumer,
                            args=(SnapshotTable(spark, root),))
    th_a.start(); th_b.start(); th_v.start()
    th_a.join(600); th_b.join(600)
    done.set()
    th_v.join(60)
    assert not errors, errors
    return SnapshotTable(spark, root)


def _check_final(t):
    assert t.applied_epochs() == set(range(13))
    rows = {r.path: (r.commit, r.content) for r in t.read().collect()}
    assert len(rows) == 40
    # per key the max epoch that wrote it wins (commit embeds epoch+1,
    # monotone); untouched keys keep the seed row
    won: dict[str, int] = {}
    for e in range(1, 13):
        for j in range(5):
            k = f"p{(e * 7 + j) % 40:02d}"
            won[k] = max(won.get(k, 0), e)
    for i in range(40):
        k = f"p{i:02d}"
        if k in won:
            e = won[k]
            assert rows[k] == (f"c{e + 1:012d}", f"e{e}"), (k, rows[k])
        else:
            assert rows[k] == ("c000000000001", "seed"), (k, rows[k])
    assert t.fsck()["ok"], t.fsck()["findings"]


def test_racing_writers_with_vacuum_cow(spark, tmpdir_path):
    _check_final(_run_race(spark, tmpdir_path, "cow"))


def test_racing_writers_with_vacuum_mor(spark, tmpdir_path):
    t = _run_race(spark, tmpdir_path, "mor")
    _check_final(t)
    # and the fold settles to the same state
    t.compact()
    _check_final(t)


def test_vacuum_grace_window_spares_young_orphans(spark, tmpdir_path):
    """An unreferenced young file (an in-flight commit's promoted data) is
    kept by default-grace vacuum and reclaimed once old."""
    import os
    import time

    t = SnapshotTable(spark, tmpdir_path, n_buckets=2)
    t.merge_epoch(_df(spark, [("r", "a", "c000000000001", "x")]), 0)
    orphan = t.root / "data" / "deadbeef.parquet"
    orphan.write_bytes(b"PAR1fake")
    out = t.vacuum(older_than_s=3600.0)
    assert out["files_removed"] == 0 and out["files_skipped_young"] >= 1
    assert orphan.exists()
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    out = t.vacuum(older_than_s=3600.0)
    assert out["files_removed"] == 1 and not orphan.exists()


def test_merge_racing_rebucket_fails_loudly_without_data_loss(
    spark, tmpdir_path
):
    """A merge that loses its manifest swap to a concurrent rebucket must
    NOT silently commit old-layout clustering: the retry re-plan hits the
    layout-drift guard and raises; a re-attached handle applies the same
    epoch cleanly and no committed data is lost."""
    import pytest

    from etl_spark.lake.table import SnapshotTable

    def _df(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, commit string, content string")

    a = SnapshotTable(spark, tmpdir_path, n_buckets=4)
    a.merge_epoch(_df([("r", f"p{i}", "c000000000001", "v")
                       for i in range(20)]), 0)
    b = SnapshotTable(spark, tmpdir_path)  # second writer, same layout

    orig = b._commit_manifest
    state = {"raced": False}

    def racing_commit(manifest, base_version=None):
        if not state["raced"]:
            state["raced"] = True
            a.rebucket(16)  # lands first; b's swap must now conflict
        return orig(manifest, base_version)

    b._commit_manifest = racing_commit
    with pytest.raises(RuntimeError, match="rebucketed"):
        b.merge_epoch(_df([("r", "q", "c000000000002", "w")]), 1)
    assert state["raced"]
    # nothing lost, nothing half-committed
    fresh = SnapshotTable(spark, tmpdir_path)
    assert fresh.n_buckets == 16
    assert fresh.read().count() == 20
    assert fresh.fsck()["ok"]
    # the rejected epoch applies cleanly on a re-attached handle
    fresh.merge_epoch(_df([("r", "q", "c000000000002", "w")]), 1)
    assert fresh.lookup("r", "q").first().content == "w"
