"""Segment discovery + watermark filtering (S1/F5 analogs).

Mirrors the reference's discovery tests
(/root/reference/tests/test_duckdb_incremental_points.py:20-59): name parse,
sort order, watermark + window filters.
"""

from __future__ import annotations

from pathlib import Path

from etl_spark.sources.segments import discover_segments, pending_segments


def _mk(root: str, epochs: list[int]) -> None:
    for e in epochs:
        Path(root, f"epoch={e}").mkdir(parents=True)
    # decoys: wrong name pattern / plain files must be ignored
    Path(root, "epoch=notanumber").mkdir()
    Path(root, "_SUCCESS").touch()


def test_discover_sorted(tmpdir_path):
    _mk(tmpdir_path, [3, 0, 11, 2])
    segs = discover_segments(tmpdir_path)
    assert [s.epoch for s in segs] == [0, 2, 3, 11]
    assert all(s.path.endswith(f"epoch={s.epoch}") for s in segs)


def test_discover_missing_root():
    assert discover_segments("/nonexistent/nowhere") == []


def test_pending_filters(tmpdir_path):
    _mk(tmpdir_path, [0, 1, 2, 3, 4])
    got = pending_segments(tmpdir_path, applied_epochs={0, 2})
    assert [s.epoch for s in got] == [1, 3, 4]
    got = pending_segments(tmpdir_path, {0}, min_epoch=1, max_epoch=3)
    assert [s.epoch for s in got] == [1, 2, 3]


def test_load_json_dim_and_broadcast_enrich(spark, tmpdir_path):
    """S5 JSON dim source + J6 broadcast enrichment."""
    import json as _json
    from pathlib import Path

    from etl_spark.sources.dims import broadcast_enrich, load_json_dim

    p = Path(tmpdir_path) / "dim.json"
    p.write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"lang": "python", "tier": 1},
                {"lang": "rust", "tier": 2},
            ]
        )
    )
    dim = load_json_dim(spark, str(p))
    facts = spark.createDataFrame(
        [("a", "python"), ("b", "rust"), ("c", "cobol")], ["id", "lang"]
    )
    out = broadcast_enrich(facts, dim, on="lang")
    got = {r["id"]: r["tier"] for r in out.collect()}
    assert got == {"a": 1, "b": 2, "c": None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_lang_ecosystem_dim(spark):
    from etl_spark.sources.dims import lang_ecosystem_dim

    dim = lang_ecosystem_dim(spark)
    rows = {r["lang"]: r["ecosystem"] for r in dim.collect()}
    assert rows["python"] == "pypi" and rows["unknown"] == "unknown"
