"""SnapshotTable mechanics: MERGE semantics, bucket pruning, atomic commits,
additive-only schema evolution."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from etl_spark.lake.table import SchemaEvolutionError, SnapshotTable, _merge_schemas
from pyspark.sql import types as T


def _tbl(spark, root, **kw):
    return SnapshotTable(spark, root, n_buckets=4, **kw)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["repo", "path", "commit", "content"])


def test_merge_latest_wins_against_existing(spark, tmpdir_path):
    t = _tbl(spark, tmpdir_path)
    t.merge_epoch(_df(spark, [("r", "a", "c000000000001", "v1"),
                              ("r", "b", "c000000000002", "w2")]), 0)
    # epoch 1: newer commit for a, OLDER (late) commit for b — b must keep w2
    t.merge_epoch(_df(spark, [("r", "a", "c000000000005", "v5"),
                              ("r", "b", "c000000000001", "w1")]), 1)
    got = {(r.repo, r.path): (r.commit, r.content) for r in t.read().collect()}
    assert got == {("r", "a"): ("c000000000005", "v5"),
                   ("r", "b"): ("c000000000002", "w2")}


def test_bucket_pruning_carries_untouched_files(spark, tmpdir_path):
    t = _tbl(spark, tmpdir_path)
    rows = [("r", f"p{i:03d}", "c000000000001", "x") for i in range(200)]
    t.merge_epoch(_df(spark, rows), 0)
    m0 = t.manifest()
    all_buckets = {f["bucket"] for f in m0["files"]}
    assert len(all_buckets) == 4
    # single-key update touches exactly one bucket
    stats = t.merge_epoch(_df(spark, [("r", "p000", "c000000000002", "y")]), 1)
    assert len(stats["rewritten_buckets"]) == 1
    m1 = t.manifest()
    old_paths = {f["path"] for f in m0["files"]}
    carried = [f for f in m1["files"] if f["path"] in old_paths]
    assert {f["bucket"] for f in carried} == all_buckets - set(stats["rewritten_buckets"])
    assert t.read().where("path = 'p000'").first().content == "y"
    assert t.read().count() == 200


def test_epoch_idempotence(spark, tmpdir_path):
    t = _tbl(spark, tmpdir_path)
    df = _df(spark, [("r", "a", "c000000000001", "v1")])
    t.merge_epoch(df, 7)
    v = t.current_version()
    out = t.merge_epoch(_df(spark, [("r", "a", "c000000000009", "EVIL")]), 7)
    assert out["skipped"] is True
    assert t.current_version() == v
    assert t.read().first().content == "v1"


def test_manifest_commit_is_atomic_create_if_absent(spark, tmpdir_path):
    t = _tbl(spark, tmpdir_path)
    t.merge_epoch(_df(spark, [("r", "a", "c000000000001", "v1")]), 0)
    m = t.manifest()  # the snapshot this writer planned against
    # a competing writer publishes the next version first -> our link must fail
    nxt = Path(tmpdir_path) / "_meta" / f"v{m['version'] + 1:012d}.json"
    nxt.write_text(json.dumps(m))
    with pytest.raises(OSError):
        t._commit_manifest(dict(m), base_version=m["version"])


def test_schema_merge_additive_only():
    old = T.StructType([T.StructField("a", T.StringType()), T.StructField("b", T.LongType())])
    new = T.StructType([T.StructField("a", T.StringType()), T.StructField("c", T.DoubleType())])
    merged = _merge_schemas(old, new)
    assert [f.name for f in merged.fields] == ["a", "b", "c"]
    bad = T.StructType([T.StructField("b", T.StringType())])
    with pytest.raises(SchemaEvolutionError):
        _merge_schemas(old, bad)


def test_old_files_never_rewritten_on_evolution(spark, tmpdir_path):
    t = _tbl(spark, tmpdir_path)
    rows = [("r", f"p{i:03d}", "c000000000001", "x") for i in range(100)]
    t.merge_epoch(_df(spark, rows), 0)
    m0 = t.manifest()
    evolved = spark.createDataFrame(
        [("zzz", "q1", "c000000000002", "y", '{"m":1}')],
        ["repo", "path", "commit", "content", "metadata"],
    )
    t.merge_epoch(evolved, 1)
    m1 = t.manifest()
    old_paths = {f["path"] for f in m0["files"]}
    # all buckets not touched by the single new key keep their original files
    assert len([f for f in m1["files"] if f["path"] in old_paths]) >= 3
    final = t.read()
    assert final.where("metadata IS NOT NULL").count() == 1
    assert final.where("metadata IS NULL").count() == 100


def test_one_file_per_bucket_invariant(spark, tmpdir_path):
    """After arbitrarily many merges, each bucket holds exactly one live file
    (carried or rewritten) — no compaction ever needed."""
    t = _tbl(spark, tmpdir_path)
    for epoch in range(5):
        rows = [("r", f"p{(epoch * 7 + i) % 60:03d}", f"c{epoch:012d}", "x")
                for i in range(30)]
        t.merge_epoch(_df(spark, rows), epoch)
    m = t.manifest()
    buckets = [f["bucket"] for f in m["files"]]
    assert len(buckets) == len(set(buckets)), "multiple live files in one bucket"
    assert len(buckets) <= 4
