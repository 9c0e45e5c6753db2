"""Prefix bucketing (bucket_cols = a prefix of key_cols): placement by the
prefix hash, uniqueness/latest-wins on the full key, bulk prefix probes via
prefix_candidates/scan_prefixes. The layout exists for inverted-index-shaped
tables (e.g. the near-dup band index keyed (band, repo, path), bucketed by
band) where the access path is 'all rows of these bands'."""

from __future__ import annotations

import pytest

from etl_spark.lake.table import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "band string, repo string, path string, lsn int, content string"
    )


def _mk(spark, root, **kw):
    kw.setdefault("n_buckets", 8)
    kw.setdefault("target_file_rows", 4)
    return SnapshotTable(
        spark, root, key_cols=("band", "repo", "path"),
        bucket_cols=("band",), order_col="lsn", **kw,
    )


def test_bucket_cols_must_be_key_prefix(spark, tmpdir_path):
    with pytest.raises(ValueError):
        SnapshotTable(spark, tmpdir_path, key_cols=("a", "b"),
                      bucket_cols=("b",))
    with pytest.raises(ValueError):
        SnapshotTable(spark, tmpdir_path, key_cols=("a", "b"),
                      bucket_cols=())


def test_prefix_rows_colocate_and_scan(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    rows = [(f"b{i % 5}", f"r{j}", f"p{j}", 1, f"v{i}-{j}")
            for i in range(5) for j in range(6)]
    t.merge_epoch(_df(spark, rows), 0)
    # every row of one band lives in exactly one bucket
    files = t.prefix_candidates([("b2",)])
    assert len({f["bucket"] for f in files}) == 1
    got = t.scan_prefixes([("b2",), ("b4",)])
    assert got.count() == 12
    assert {r["band"] for r in got.select("band").distinct().collect()} == \
        {"b2", "b4"}


def test_latest_wins_on_full_key_and_lookup(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t.merge_epoch(_df(spark, [("b1", "r1", "p1", 1, "old"),
                              ("b1", "r2", "p2", 1, "keep")]), 0)
    t.merge_epoch(_df(spark, [("b1", "r1", "p1", 2, "new")]), 1)
    got = {(r["repo"], r["content"]) for r in t.scan_prefixes([("b1",)]).collect()}
    assert got == {("r1", "new"), ("r2", "keep")}
    one = t.lookup("b1", "r1", "p1").collect()
    assert len(one) == 1 and one[0]["content"] == "new"


def test_prefix_scan_folds_mor_deltas_and_tombstones(spark, tmpdir_path):
    from etl_spark.lake.table import TOMBSTONE_COL

    t = _mk(spark, tmpdir_path)
    t.merge_epoch(_df(spark, [("b1", "r1", "p1", 1, "v1"),
                              ("b1", "r2", "p2", 1, "v1")]), 0)
    # MOR delta update + a tombstone, same band
    d = spark.createDataFrame(
        [("b1", "r1", "p1", 2, "v2", False),
         ("b1", "r2", "p2", 3, None, True)],
        "band string, repo string, path string, lsn int, "
        f"content string, {TOMBSTONE_COL} boolean",
    )
    t.merge_epochs(d, [1], merge_mode="mor")
    got = [(r["repo"], r["content"]) for r in t.scan_prefixes([("b1",)]).collect()]
    assert got == [("r1", "v2")]


def test_prefix_layout_persists_through_lifecycle(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    rows = [(f"b{i % 3}", f"r{i}", f"p{i}", 1, "x") for i in range(12)]
    t.merge_epoch(_df(spark, rows), 0)
    t.merge_epoch(_df(spark, [("b0", "r0", "p0", 2, "y")]), 1)
    assert t.compact(above=0)["compacted_buckets"] >= 1
    t2 = SnapshotTable(spark, tmpdir_path)  # re-attach adopts
    assert t2.bucket_cols == ("band",)
    assert t2.fsck()["ok"]
    out = t2.rebucket(4)
    assert out["rebucketed"]
    t3 = SnapshotTable(spark, tmpdir_path)
    assert t3.bucket_cols == ("band",)
    assert t3.fsck()["ok"]
    got = t3.scan_prefixes([("b0",)])
    assert got.count() == 4  # r0 updated + r3, r6, r9
    assert t3.lookup("b0", "r0", "p0").collect()[0]["content"] == "y"


def test_scan_prefixes_null_prefix_value(spark, tmpdir_path):
    # None is a legal key value (lookup has an isNull branch); the bulk
    # probe must not crash sorting mixed None/str prefixes and must match
    # null rows via the eqNullSafe semi-join
    t = _mk(spark, tmpdir_path)
    t.merge_epoch(_df(spark, [
        ("b1", "r1", "p1", 1, "x"),
        (None, "r2", "p2", 1, "y"),
        ("b2", "r3", "p3", 1, "z"),
    ]), 0)
    got = t.scan_prefixes([("b1",), (None,)])
    assert sorted(
        ((r["band"], r["repo"]) for r in got.collect()),
        key=lambda p: p[1],
    ) == [("b1", "r1"), (None, "r2")]
