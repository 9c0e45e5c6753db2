"""Derived tables — the reference's stage-2 pattern (points -> trajectories).

The reference maintains derived keyed tables incrementally from the cleaned
fact table: construct reads only points newer than the derived watermark and
recomputes exactly the affected keys (SURVEY §3.3;
duckdb_construct_trajs_stops.py:45-126). Generalized here as an incrementally
maintained **per-repo rollup** over the snapshot table:

    repo_rollup(repo, n_files, total_bytes, n_langs, top_lang,
                last_commit, last_epoch)

Incremental maintenance (P2, recompute avoidance): after an epoch commit,
only repos present in the commit's new files changed; the maintainer reads
those files (bucket-pure, small), recomputes rollups for exactly that repo
set from the snapshot, and upserts them — cost scales with the epoch's
footprint, not the table. The rollup table is itself a SnapshotTable keyed on
``repo`` ordered by ``last_commit`` (self-hosted: same atomic-commit /
idempotence machinery as the fact table), so rollup maintenance inherits
exactly-once semantics keyed by the same epoch ids.

A full recompute (``refresh_full``) is differential-tested equal to the
incremental path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.lake.table import SnapshotTable


def rollup_expr(snapshot_rows: DataFrame) -> DataFrame:
    """Per-repo aggregate over (a subset of) the snapshot's current rows."""
    per_lang = (
        snapshot_rows.groupBy("repo", "lang")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    top_lang = (
        per_lang.groupBy("repo")
        .agg(
            F.max_by(
                F.col("lang"), F.struct(F.col("_n"), F.col("lang"))
            ).alias("top_lang"),
            F.count(F.lit(1)).alias("n_langs"),
        )
    )
    aggs = [
        F.count(F.lit(1)).alias("n_files"),
        (
            F.sum(F.coalesce(F.col("content_bytes"), F.octet_length("content")))
            if "content_bytes" in snapshot_rows.columns
            else F.sum(F.octet_length("content"))
        ).alias("total_bytes"),
        F.max("commit").alias("last_commit"),
    ]
    if "epoch" in snapshot_rows.columns:
        aggs.append(F.max("epoch").alias("last_epoch"))
    base = snapshot_rows.groupBy("repo").agg(*aggs)
    return base.join(top_lang, "repo")


class RepoRollup:
    """Incrementally maintained per-repo rollup of a snapshot table."""

    def __init__(self, spark: SparkSession, table: SnapshotTable, root: str,
                 n_buckets: int = 16) -> None:
        self.spark = spark
        self.source = table
        self.table = SnapshotTable(
            spark, root, key_cols=("repo",), order_col="last_commit",
            n_buckets=n_buckets,
        )

    def update_for_commit(self, commit: dict[str, Any]) -> dict[str, Any]:
        """Maintain the rollup after one fact-table commit.

        Touched repos come from the commit's new files (small, bucket-pure);
        their rollups are recomputed from the snapshot and upserted under the
        same epoch ids — idempotent if replayed.
        """
        if commit.get("skipped"):
            return {"skipped": True}
        new_files = commit.get("new_files") or []
        if not new_files:
            return {"skipped": True}
        schema = self.source.schema()
        touched_repos = (
            self.source._read_files(new_files, schema).select("repo").distinct()
        )
        current = self.source.read().join(
            F.broadcast(touched_repos), "repo", "left_semi"
        )
        updates = rollup_expr(current)
        return self.table.merge_epochs(
            updates,
            [int(e) for e in commit["epochs"]],
            extra_summary={"derived_from_version": commit.get("version")},
            assume_deduped=True,  # groupBy("repo") yields one row per key
        )

    def refresh_full(self, epoch_id: int) -> dict[str, Any]:
        """Recompute every repo's rollup from scratch (bootstrap / repair)."""
        updates = rollup_expr(self.source.read())
        return self.table.merge_epochs(
            updates, [epoch_id], extra_summary={"full_refresh": True},
            assume_deduped=True,
        )

    def read(self) -> DataFrame:
        return self.table.read().drop("epoch")


def explode_lines(rows: DataFrame) -> DataFrame:
    """One row per line of each file version (U4/W2 analog: per-unit explode
    with position, the reference's cell-per-row projection)."""
    return rows.select(
        "repo",
        "path",
        "commit",
        F.posexplode(F.split(F.coalesce(F.col("content"), F.lit("")), "\n")).alias(
            "_pos", "line"
        ),
    ).select(
        "repo", "path", "commit", (F.col("_pos") + 1).cast("long").alias("line_no"), "line"
    )


class LineIndex:
    """Stage-3 derived projection: per-line index over immutable file versions.

    The reference's transform stage processes each trajectory id exactly once,
    discovering work via ``ls EXCEPT cs`` (SURVEY §3.4, J4;
    duckdb_transform_ls_to_cs.py:56-60). File *versions* (repo, path, commit)
    are equally immutable, so the line index is append-only: discovery is an
    anti-join of snapshot versions against already-indexed versions, and each
    version's lines are exploded and appended under the fact commit's epoch
    ids (same exactly-once bookkeeping).
    """

    def __init__(self, spark: SparkSession, table: SnapshotTable, root: str,
                 n_buckets: int = 32) -> None:
        self.spark = spark
        self.source = table
        self.table = SnapshotTable(
            spark, root, key_cols=("repo", "path", "commit", "line_no"),
            order_col="commit", n_buckets=n_buckets,
        )

    def pending_versions(self) -> DataFrame:
        """Snapshot versions not yet indexed (J4: EXCEPT / left_anti)."""
        current = self.source.read().select("repo", "path", "commit", "content")
        if not self.table.exists():
            return current
        done = self.table.read().select("repo", "path", "commit").distinct()
        return current.join(done, ["repo", "path", "commit"], "left_anti")

    def update(self, epoch_ids: list[int]) -> dict[str, Any]:
        """Index all pending versions in one idempotent commit."""
        lines = explode_lines(self.pending_versions())
        return self.table.merge_epochs(
            lines, [int(e) for e in epoch_ids],
            extra_summary={"derived": "line_index"},
            assume_deduped=True,  # line_no makes each exploded row unique
        )

    def read(self) -> DataFrame:
        return self.table.read().drop("epoch")

