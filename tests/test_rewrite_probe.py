"""Exact probe-refined rewrite planning (rewrite_probe="auto").

Per-file [min, max] key stats over-approximate the COW rewrite set two
ways: range GAPS (a delta key inside a file's envelope that the file does
not actually hold) and per-column DECOMPOSITION of tuple keys (repo matches
one row, path a different one). Each false positive costs a full-width file
rewrite. The probe replaces the stats answer with the files' actual keys —
one key-column-only Spark scan semi-joined against the delta's distinct
keys — and must (a) never change visible state, (b) only ever shrink the
rewrite set, (c) stay off below its candidate-count threshold."""

from __future__ import annotations

import random

from etl_spark.lake.table import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit int, content string"
    )


def _state(t):
    return sorted(
        (tuple(r) for r in
         t.read().select("repo", "path", "commit", "content").collect()),
        key=lambda row: tuple((v is None, v) for v in row),
    )


def _mk(spark, root, probe, **kw):
    kw.setdefault("n_buckets", 1)
    kw.setdefault("target_file_rows", 2)
    t = SnapshotTable(spark, root, merge_mode="cow", rewrite_probe=probe, **kw)
    t.rewrite_probe_min_files = 1  # the toy scale never reaches the default
    return t


def test_probe_drops_range_false_positive_rewrites(spark, tmpdir_path):
    # base files (key-sorted, 2 rows each): [a,c] [e,g] [i,k] — updating
    # "b" falls inside [a,c]'s envelope but exists in NO file (range gap);
    # "e" is a true hit on the second file.
    base = [("r", k, 1, "v1") for k in ["a", "c", "e", "g", "i", "k"]]
    delta = [("r", "b", 2, "v2"), ("r", "e", 2, "v2")]
    got = {}
    for probe in ("off", "auto"):
        t = _mk(spark, f"{tmpdir_path}/{probe}", probe)
        t.merge_epoch(_df(spark, base), 0)
        res = t.merge_epoch(_df(spark, delta), 1)
        got[probe] = (res["files_rewritten"], res["files_probe_pruned"],
                      _state(t))
    assert got["off"][2] == got["auto"][2]  # identical visible state
    assert got["off"][0] == 2 and got["off"][1] == 0
    assert got["auto"][0] == 1 and got["auto"][1] == 1


def test_probe_catches_tuple_decomposition_false_positive(spark, tmpdir_path):
    # one file holds (r1,pz) and (r9,pa): per-column envelopes are
    # repo [r1,r9] x path [pa,pz], so stats claim (r5,pm) hits — the probe
    # knows the TUPLE is absent and carries the file.
    t = _mk(spark, tmpdir_path, "auto")
    t.merge_epoch(_df(spark, [("r1", "pz", 1, "v"), ("r9", "pa", 1, "v")]), 0)
    res = t.merge_epoch(_df(spark, [("r5", "pm", 2, "w")]), 1)
    assert res["files_probe_pruned"] == 1
    assert res["files_rewritten"] == 0
    assert _state(t) == [("r1", "pz", 1, "v"), ("r5", "pm", 2, "w"),
                         ("r9", "pa", 1, "v")]


def test_probe_null_key_values_hit_null_safely(spark, tmpdir_path):
    # a NULL path key must match its existing row via eqNullSafe — a plain
    # equality probe would drop the file and leave two rows for the key
    t = _mk(spark, tmpdir_path, "auto")
    t.merge_epoch(_df(spark, [("r", None, 1, "v1"), ("r", "a", 1, "v1"),
                              ("r", "m", 1, "v1"), ("r", "z", 1, "v1")]), 0)
    t.merge_epoch(_df(spark, [("r", None, 2, "v2")]), 1)
    assert _state(t) == [("r", "a", 1, "v1"), ("r", "m", 1, "v1"),
                         ("r", "z", 1, "v1"), ("r", None, 2, "v2")]


def test_probe_below_threshold_never_fires(spark, tmpdir_path):
    t = SnapshotTable(spark, tmpdir_path, n_buckets=1, target_file_rows=2,
                      merge_mode="cow", rewrite_probe="auto")
    assert t.rewrite_probe_min_files >= 64  # the real default
    t.merge_epoch(_df(spark, [("r", k, 1, "v") for k in "aceg"]), 0)
    res = t.merge_epoch(_df(spark, [("r", "b", 2, "w")]), 1)
    # stats said "rewrite [a,c]" and the probe stayed off (2 candidate
    # files < 64): the false positive is the price of zero extra jobs
    assert res["files_probe_pruned"] == 0


def test_probe_skips_dense_deltas(spark, tmpdir_path, monkeypatch):
    # a bulk-replay-shaped commit (delta keys >> candidate files) has ~zero
    # droppable candidates (every file really holds delta keys) — the
    # keys-per-file gate must skip the probe so ingest pays no key-scan tax
    t = _mk(spark, tmpdir_path, "auto", target_file_rows=4)
    calls = []
    orig = SnapshotTable._probe_hit_names
    monkeypatch.setattr(
        SnapshotTable, "_probe_hit_names",
        lambda self, *a, **k: calls.append(1) or orig(self, *a, **k),
    )
    t.merge_epoch(_df(spark, [("r", f"p{i:03d}", 1, "v") for i in range(16)]), 0)
    # dense: 16 keys over 4 candidate files -> 16 > 2.0 * 4 -> gate skips
    res = t.merge_epoch(
        _df(spark, [("r", f"p{i:03d}", 2, "w") for i in range(16)]), 1
    )
    assert calls == []
    assert res["files_probe_pruned"] == 0
    # sparse: 1 key over >=1 candidate -> gate admits, probe runs
    t.merge_epoch(_df(spark, [("r", "p000x", 3, "x")]), 2)
    assert calls == [1]


def test_probe_policy_persisted_and_adopted(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path, "off")
    t.merge_epoch(_df(spark, [("r", "a", 1, "v")]), 0)
    again = SnapshotTable(spark, tmpdir_path)  # adopt persisted policy
    assert again.rewrite_probe == "off"
    explicit = SnapshotTable(spark, tmpdir_path, rewrite_probe="auto")
    assert explicit.rewrite_probe == "auto"  # explicit wins


def test_probe_differential_identical_state_with_mor_folds(spark, tmpdir_path):
    # randomized update/delete-free sequence mixing COW and MOR commits so
    # probe-refined rewrites interleave with live-delta folds (the seed-303
    # shape: a COW commit on a bucket carrying MOR deltas); probe on/off
    # twins must converge to the same state and pass fsck
    rng = random.Random(77)
    keys = [f"p{i:02d}" for i in range(24)]
    tables = {
        "off": _mk(spark, f"{tmpdir_path}/off", "off", n_buckets=2),
        "auto": _mk(spark, f"{tmpdir_path}/auto", "auto", n_buckets=2),
    }
    for epoch in range(1, 9):
        rows = [("r", rng.choice(keys), epoch, f"v{epoch}-{i}")
                for i in range(rng.randint(1, 6))]
        # per-epoch dedupe keeps the update deterministic across twins
        seen: dict[str, tuple] = {}
        for row in rows:
            seen[row[1]] = row
        rows = list(seen.values())
        mode = rng.choice(["cow", "mor", "auto"])
        for t in tables.values():
            t.merge_epoch(_df(spark, rows), epoch, merge_mode=mode)
    assert _state(tables["off"]) == _state(tables["auto"])
    for t in tables.values():
        assert t.fsck()["ok"]
