"""Iceberg adapter: SQL-generation unit tests (runtime jar absent here, so the
executable surface is gated; the generated DDL/MERGE is what a real catalog
would run — SnapshotTable carries the live-tested semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_spark.lake.iceberg import IcebergTable


def _adapter():
    # bypass __init__'s runtime check: test only the pure SQL builders
    obj = IcebergTable.__new__(IcebergTable)
    obj.identifier = "lake.db.files"
    obj.key_cols = ("repo", "path")
    obj.order_col = "commit"
    obj.n_buckets = 64
    return obj


def test_create_table_sql():
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    sql = _adapter().create_table_sql(schema)
    assert "USING iceberg" in sql
    assert "bucket(64, repo, path)" in sql
    assert "'write.merge.mode'='copy-on-write'" in sql
    assert "`commit` string" in sql


def test_merge_sql_latest_wins():
    sql = _adapter().merge_sql("updates", ["repo", "path", "commit", "content"])
    assert "MERGE INTO `lake`.`db`.`files` t" in sql
    assert "t.`repo` = s.`repo` AND t.`path` = s.`path`" in sql
    assert "WHEN MATCHED AND s.`commit` > t.`commit` THEN UPDATE" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql


def test_add_columns_sql():
    sql = _adapter().add_columns_sql([T.StructField("metadata", T.StringType())])
    assert sql == "ALTER TABLE `lake`.`db`.`files` ADD COLUMNS (`metadata` string)"


def test_maintenance_sql():
    a = _adapter()
    assert "expire_snapshots" in a.expire_snapshots_sql("2026-01-01 00:00:00")
    assert "remove_orphan_files" in a.remove_orphans_sql()


def test_runtime_gate(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime not on the classpath"):
        IcebergTable(spark, "lake.db.files")


def test_epoch_property_namespaced_per_space():
    """ADVICE r2: stream batch N must not collide with segment epoch N on the
    Iceberg backend — the snapshot-summary property is namespaced by space."""
    from etl_spark.lake.iceberg import _epoch_prop

    assert _epoch_prop("batch") == "applied-epochs"
    assert _epoch_prop("stream") == "applied-epochs-stream"
    assert _epoch_prop("batch") != _epoch_prop("stream")
