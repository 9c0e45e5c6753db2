"""CDC DELETE (tombstones): the other half of binlog/WAL replay.

A delete is a change event with an order (commit/LSN) like any other — it
must arbitrate via latest-wins, or an out-of-order redelivery could
resurrect a deleted key (if deletes removed rows physically, the table
would forget the delete's order and a stale upsert would win by default).
So tombstones persist as flagged rows: hidden from read()/lookup(), visible
in the change feed, purgeable at compaction once the operator knows no
older events can still arrive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark.lake.table import TOMBSTONE_COL, SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )


def _keys(spark, rows):
    return spark.createDataFrame(rows, "repo string, path string, commit string")


def _state(t):
    return {r.path: (r.commit, r.content) for r in t.read().collect()}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_hides_key_and_blocks_stale_resurrection(spark, tmpdir_path, mode):
    t = SnapshotTable(spark, f"{tmpdir_path}/{mode}", n_buckets=4,
                      merge_mode=mode)
    t.merge_epoch(_df(spark, [("r", "a", "c000000000003", "v3"),
                              ("r", "b", "c000000000003", "w3")]), 0)
    out = t.delete_epochs(_keys(spark, [("r", "a", "c000000000005")]), [1])
    assert not out["skipped"]
    assert _state(t) == {"b": ("c000000000003", "w3")}
    assert t.lookup("r", "a").count() == 0
    # LATE STALE upsert (older than the delete) must NOT resurrect the key
    t.merge_epoch(_df(spark, [("r", "a", "c000000000004", "ZOMBIE")]), 2)
    assert _state(t) == {"b": ("c000000000003", "w3")}
    # a genuinely NEWER upsert recreates it
    t.merge_epoch(_df(spark, [("r", "a", "c000000000007", "v7")]), 3)
    assert _state(t) == {"a": ("c000000000007", "v7"),
                         "b": ("c000000000003", "w3")}
    assert t.lookup("r", "a").first().content == "v7"
    assert t.fsck()["ok"]


def test_delete_visible_in_change_feed_and_idempotent(spark, tmpdir_path):
    t = SnapshotTable(spark, tmpdir_path, n_buckets=4)
    t.merge_epoch(_df(spark, [("r", "a", "c000000000001", "v1")]), 0)
    v1 = t.current_version()
    t.delete_epochs(_keys(spark, [("r", "a", "c000000000002")]), [1])
    feed = t.changes_between(v1).collect()
    assert len(feed) == 1
    assert feed[0].path == "a" and feed[0][TOMBSTONE_COL] is True
    # replaying the delete epoch is a no-op
    v = t.current_version()
    out = t.delete_epochs(_keys(spark, [("r", "a", "c000000000009")]), [1])
    assert out["skipped"] and t.current_version() == v
    # read(include_deleted=True) exposes the tombstone row
    raw = {r.path: r[TOMBSTONE_COL] for r in
           t.read(include_deleted=True).collect()}
    assert raw == {"a": True}
    assert t.read().count() == 0


def test_delete_feed_visible_with_epoch_provenance_column(spark, tmpdir_path):
    """Pipeline tables carry a per-row `epoch` provenance column and the
    change feed filters by epoch ranges — a tombstone must be stamped with
    its epoch or the feed's range filter silently drops it (NULL BETWEEN)."""
    t = SnapshotTable(spark, tmpdir_path, n_buckets=4)
    df = _df(spark, [("r", "a", "c000000000001", "v1"),
                     ("r", "b", "c000000000001", "w1")]
             ).withColumn("epoch", F.lit(0))
    t.merge_epoch(df, 0)
    v1 = t.current_version()
    t.delete_epochs(_keys(spark, [("r", "a", "c000000000002")]), [7])
    feed = t.changes_between(v1).collect()
    assert [(r.path, r.epoch, r[TOMBSTONE_COL]) for r in feed] == [("a", 7, True)]
    assert _state(t) == {"b": ("c000000000001", "w1")}


def test_mor_equals_cow_with_interleaved_deletes(spark, tmpdir_path):
    import random

    rng = random.Random(11)
    cow = SnapshotTable(spark, f"{tmpdir_path}/cow", n_buckets=4)
    mor = SnapshotTable(spark, f"{tmpdir_path}/mor", n_buckets=4,
                        merge_mode="mor")
    e = 0
    for _ in range(5):
        ups, dels = [], []
        for _ in range(60):
            k, order = rng.randrange(30), rng.randrange(1, 50)
            if rng.random() < 0.25:
                dels.append(("r", f"p{k:02d}", f"c{order:012d}"))
            else:
                ups.append(("r", f"p{k:02d}", f"c{order:012d}", f"v:{k}:{order}"))
        for t in (cow, mor):
            if ups:
                t.merge_epoch(_df(spark, ups), e)
            if dels:
                t.delete_epochs(_keys(spark, dels), [e + 1])
        e += 2

    def full(t):
        return sorted(
            (r.path, r.commit, r.content)
            for r in t.read().collect()
        )

    assert full(mor) == full(cow)
    mor.compact()
    assert full(mor) == full(cow)


def test_compact_purge_tombstones(spark, tmpdir_path):
    t = SnapshotTable(spark, tmpdir_path, n_buckets=2)
    t.merge_epoch(_df(spark, [("r", "a", "c000000000001", "v1"),
                              ("r", "b", "c000000000001", "w1")]), 0)
    t.delete_epochs(_keys(spark, [("r", "a", "c000000000002")]), [1])
    # default compact keeps the tombstone (late events may still arrive)
    t.compact(above=0)
    assert {r.path for r in t.read(include_deleted=True).collect()} == {"a", "b"}
    # explicit purge drops it physically
    t.compact(above=0, purge_tombstones=True)
    raw = t.read(include_deleted=True).collect()
    assert {r.path for r in raw} == {"b"}
    assert _state(t) == {"b": ("c000000000001", "w1")}


def test_stream_native_deletes_end_to_end(spark, tmpdir_path):
    """WAL-style op column: datagen(delete_pct) -> clean_events folds op into
    the tombstone flag -> replay. The final state must equal latest-per-key
    over the raw stream keeping only keys whose WINNER is an upsert — i.e.
    deletes arbitrate by commit inside the same batch as upserts (a delete
    then later upsert re-creates the key; upsert then later delete hides it),
    identically under incremental and catch-up replay."""
    from pyspark.sql import Window

    from etl_spark.datagen import change_stream, write_segments
    from etl_spark.pipeline import IngestPipeline

    ev = change_stream(
        spark, 4000, n_repos=10, paths_per_repo=40, dup_pct=5, delete_pct=15
    )
    assert "op" in ev.columns
    # delete records are binlog-shaped: key + commit only, payload NULL
    d = ev.where("op = 'd'")
    assert d.count() > 100
    assert d.where(F.col("content").isNotNull()).count() == 0
    write_segments(ev, f"{tmpdir_path}/stream", files_per_epoch=4)

    w = Window.partitionBy("repo", "path").orderBy(F.col("commit").desc())
    expected = {
        (r.repo, r.path): (r.commit, r.content)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1 AND op = 'u'")
        .collect()
    }
    # sanity: both transitions occur in the fixture
    winners_del = ev.withColumn("rn", F.row_number().over(w)).where(
        "rn = 1 AND op = 'd'"
    )
    assert winners_del.count() > 0

    for mode, merge_mode in (
        ("incremental", None), ("catchup", None), ("incremental", "mor")
    ):
        pipe = IngestPipeline(
            spark, f"{tmpdir_path}/{mode}_{merge_mode}", n_buckets=4,
            count_input=False, merge_mode=merge_mode,
        )
        pipe.replay(f"{tmpdir_path}/stream", mode=mode)
        got = {
            (r.repo, r.path): (r.commit, r.content)
            for r in pipe.table.read().collect()
        }
        assert got == expected, f"mode={mode}"
        # tombstone winners persist flagged (ordering survives for late data)
        tombs = (
            pipe.table.read(include_deleted=True)
            .where(F.col(TOMBSTONE_COL))
            .count()
        )
        assert tombs == winners_del.count()
        assert pipe.table.fsck()["ok"]


def test_derived_tables_ignore_deleted_keys(spark, tmpdir_path):
    from etl_spark.derived import RepoRollup

    t = SnapshotTable(spark, f"{tmpdir_path}/t", n_buckets=4)
    rows = [("r1", "a", "c000000000001", "xx"),
            ("r1", "b", "c000000000001", "yy"),
            ("r2", "c", "c000000000001", "zz")]
    # rollup_expr needs lang; widen via a second schema-evolving epoch
    df = _df(spark, rows).selectExpr("repo", "path", "commit",
                                     "'python' AS lang", "content")
    c0 = t.merge_epoch(df, 0)
    roll = RepoRollup(spark, t, f"{tmpdir_path}/roll", n_buckets=4)
    roll.update_for_commit(c0)
    c1 = t.delete_epochs(_keys(spark, [("r1", "a", "c000000000002")]), [1])
    roll.update_for_commit(c1)
    got = {r.repo: r.n_files for r in roll.read().collect()}
    assert got == {"r1": 1, "r2": 1}


def test_delete_feed_visible_on_partial_replay(spark, tmpdir_path):
    """A delete replayed with a MIX of applied and fresh epoch ids must stamp
    its tombstone with a FRESH id: stamped with an applied one, the row falls
    outside changes_between's new-epoch ranges and the delete is invisible
    to CDC-out consumers even though read() hides the key."""
    t = SnapshotTable(spark, tmpdir_path, n_buckets=4)
    df = _df(spark, [("r", "a", "c000000000001", "v1"),
                     ("r", "b", "c000000000001", "w1")]
             ).withColumn("epoch", F.lit(0))
    t.merge_epoch(df, 0)
    # epoch 7 already applied by an earlier (say, crashed-and-retried) batch
    t.delete_epochs(_keys(spark, [("r", "b", "c000000000002")]), [7])
    v = t.current_version()
    # redelivery spans applied(7) + fresh(8): tombstone must carry 8
    out = t.delete_epochs(_keys(spark, [("r", "a", "c000000000002")]), [7, 8])
    assert not out.get("skipped")
    feed = t.changes_between(v).collect()
    assert [(r.path, r.epoch, r[TOMBSTONE_COL]) for r in feed] == [("a", 8, True)]
    assert _state(t) == {}


def test_null_op_rows_default_to_upsert(spark):
    """Streams that gain the op column mid-history read old segments back
    with op=NULL under mergeSchema — those are plain upserts, not droppable
    malformed rows (dropping them loses all pre-op data on catch-up)."""
    from etl_spark.pipeline import clean_events

    df = spark.createDataFrame(
        [("r", "a", "c000000000001", "v1", "py", None),    # pre-op history
         ("r", "b", "c000000000002", "v2", "py", "u"),
         ("r", "c", "c000000000003", None, None, "d"),
         ("r", "d", "c000000000004", "v4", "py", "bogus")],  # malformed
        "repo string, path string, commit string, content string, "
        "lang string, op string",
    )
    got = {r.path: r[TOMBSTONE_COL] for r in clean_events(df).collect()}
    assert got == {"a": False, "b": False, "c": True}
