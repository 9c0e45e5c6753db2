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
``repo`` ordered by ``as_of_version`` — the SOURCE SNAPSHOT VERSION the
rollup was computed at (self-hosted: same atomic-commit / idempotence
machinery as the fact table), so rollup maintenance inherits exactly-once
semantics keyed by the same epoch ids. The order must be the source version,
not the repo's ``last_commit``: a CDC DELETE can make the recomputed
``max(commit)`` tie with or drop BELOW the stale rollup's, so last_commit is
not monotonic under deletes and the stale row would win latest-wins.

A full recompute (``refresh_full``) is differential-tested equal to the
incremental path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.lake.table import TOMBSTONE_COL, SnapshotTable


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
            spark, root, key_cols=("repo",), order_col="as_of_version",
            n_buckets=n_buckets,
        )
        # attach adopts the persisted layout; a rollup created before the
        # as_of_version ordering (order_col=last_commit) would make the
        # constructor arg silently inert AND break `gone` tombstones (they
        # carry no last_commit, so they'd sort last and never win). Fail
        # loudly: rebuild via refresh_full into a fresh root.
        if self.table.exists() and self.table.order_col != "as_of_version":
            raise ValueError(
                f"rollup at {root} is ordered by {self.table.order_col!r}; "
                "this version maintains rollups ordered by as_of_version — "
                "rebuild it (refresh_full) into a fresh root"
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
        as_of = int(commit["version"])
        new_rows = self.source._read_files(new_files, schema)
        touched_repos = new_rows.select("repo").distinct()
        current = self.source.read().join(
            F.broadcast(touched_repos), "repo", "left_semi"
        )
        updates = rollup_expr(current).withColumn(
            "as_of_version", F.lit(as_of).cast("long")
        )
        # a repo whose EVERY file was tombstoned has no current rows and so
        # no rollup row in `updates` — its stale rollup must be tombstoned
        # too, in the SAME commit (two commits would break epoch idempotence)
        gone = touched_repos.join(updates.select("repo"), "repo", "left_anti")
        tomb = gone.withColumn(
            "as_of_version", F.lit(as_of).cast("long")
        ).withColumn(TOMBSTONE_COL, F.lit(True))
        return self.table.merge_epochs(
            updates.unionByName(tomb, allowMissingColumns=True),
            [int(e) for e in commit["epochs"]],
            extra_summary={"derived_from_version": commit.get("version")},
            assume_deduped=True,  # one row per repo across both branches
        )

    def refresh_full(self, epoch_id: int) -> dict[str, Any]:
        """Recompute every repo's rollup from scratch (bootstrap / repair).

        Repos present in the rollup but absent from the recompute (every
        fact row tombstoned since the rollup last saw them) are tombstoned
        in the same commit — without this, repair would leave zombie rollup
        rows the incremental path (update_for_commit's ``gone`` branch)
        would have removed, breaking refresh ≡ incremental.
        """
        updates = rollup_expr(self.source.read()).withColumn(
            "as_of_version",
            F.lit(int(self.source.current_version())).cast("long"),
        )
        if self.table.exists():
            gone = (
                self.table.read()
                .select("repo")
                .join(updates.select("repo"), "repo", "left_anti")
                .withColumn(
                    "as_of_version",
                    F.lit(int(self.source.current_version())).cast("long"),
                )
                .withColumn(TOMBSTONE_COL, F.lit(True))
            )
            updates = updates.unionByName(gone, allowMissingColumns=True)
        return self.table.merge_epochs(
            updates, [epoch_id], extra_summary={"full_refresh": True},
            assume_deduped=True,  # one row per repo across both branches
        )

    def read(self) -> DataFrame:
        return self.table.read().drop("epoch", TOMBSTONE_COL, "as_of_version")


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
    discovering work via a per-stage WATERMARK plus ``ls EXCEPT cs`` repair
    (SURVEY §3.4, J4; duckdb_construct_trajs_stops.py:45-73,
    duckdb_transform_ls_to_cs.py:56-60). File *versions* (repo, path, commit)
    are equally immutable, so the line index is append-only. Steady-state
    discovery is O(delta): the index records the SOURCE SNAPSHOT VERSION it
    last synced to, and pending versions come from the source's change feed
    past that version (a manifest diff + epoch-provenance filter) — the
    line-grained index itself is never scanned. The anti-join form survives
    as :meth:`pending_versions_scan` (bootstrap / repair; differential-tested
    equal).
    """

    def __init__(self, spark: SparkSession, table: SnapshotTable, root: str,
                 n_buckets: int = 32) -> None:
        self.spark = spark
        self.source = table
        self.table = SnapshotTable(
            spark, root, key_cols=("repo", "path", "commit", "line_no"),
            order_col="commit", n_buckets=n_buckets,
        )

    _VERSION_COLS = ("repo", "path", "commit", "content")

    def synced_to_version(self) -> int | None:
        """Source snapshot version the index last synced to (the stage
        watermark). Walks retained index snapshots newest-first so an
        interleaved maintenance commit (compaction, rollback) whose summary
        lacks the marker doesn't reset discovery to a full rebuild."""
        for v in reversed(self.table.versions()):
            s = (self.table.manifest(v) or {}).get("summary") or {}
            if "synced_to_version" in s:
                return s["synced_to_version"]
        return None

    def pending_versions(self) -> DataFrame:
        """Versions not yet indexed — O(delta, never O(index)).

        Reads the source's change feed past the synced watermark: only files
        NEW since that snapshot are scanned, filtered to rows whose epoch
        provenance is new (carried rewrites excluded). Falls back to the
        full state only on bootstrap or when the watermarked snapshot has
        been expired from the source's history."""
        sv = self.synced_to_version()
        if sv is None:
            return self.source.read().select(*self._VERSION_COLS)
        try:
            feed = self.source.changes_between(sv)
        except FileNotFoundError:
            # watermark snapshot expired: repair via the EXCEPT scan
            return self.pending_versions_scan()
        if TOMBSTONE_COL in feed.columns:
            # a delete creates no new immutable version to index
            feed = feed.where(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)))
        return feed.select(*self._VERSION_COLS)

    def pending_versions_scan(self) -> DataFrame:
        """J4 EXCEPT discovery (anti-join vs the full index) — the bootstrap/
        repair path; O(index), so not for steady-state use."""
        current = self.source.read().select(*self._VERSION_COLS)
        if not self.table.exists():
            return current
        done = self.table.read().select("repo", "path", "commit").distinct()
        return current.join(done, ["repo", "path", "commit"], "left_anti")

    def update(self, epoch_ids: list[int]) -> dict[str, Any]:
        """Index all pending versions in one idempotent commit, advancing the
        watermark to the source version the pending set was computed at."""
        cur = self.source.current_version()
        lines = explode_lines(self.pending_versions())
        return self.table.merge_epochs(
            lines, [int(e) for e in epoch_ids],
            extra_summary={"derived": "line_index",
                           "synced_to_version": cur},
            assume_deduped=True,  # line_no makes each exploded row unique
        )

    def read(self) -> DataFrame:
        return self.table.read().drop("epoch")



# --- derived clean corpus (CDC x training-data prep) ---------------------------

def clean_corpus_expr(rows: DataFrame) -> DataFrame:
    """Row-local prep over (a subset of) the snapshot's current rows:
    repetition gate (``dup_token_frac <= 0.5`` kills degenerate docs),
    then derive lang_norm / n_tokens / quality and PII-redact the content.
    Every transform is a scan-fused JVM expression — the incremental
    maintainer's cost is O(rows recomputed), shuffle-free."""
    from etl_spark.functions.content import (
        content_sha256,
        dup_token_frac,
        normalize_lang,
        quality_score,
        redact_pii,
        token_count,
    )

    gated = rows.where(dup_token_frac("content") <= 0.5)
    return gated.select(
        "repo",
        "path",
        "commit",
        normalize_lang("lang").alias("lang"),
        token_count("content").cast("long").alias("n_tokens"),
        quality_score("content").alias("quality"),
        redact_pii("content").alias("content"),
        content_sha256(redact_pii("content")).alias("content_sha256"),
    )


class CleanCorpus:
    """Incrementally maintained CLEAN-CORPUS derived table — the bridge
    between the CDC half of the engine and the training-data prep half.

    After each fact-table commit, only the commit-touched keys can have
    changed. Every row in the commit's new files IS a current row (COW
    rewrites produce post-merge files; MOR delta rows are the winners for
    their keys), so the maintainer recomputes the row-local prep on
    exactly those rows — no snapshot re-read at all, cost O(commit
    footprint). Keys whose current row is a CDC tombstone or fails the
    quality gate are tombstoned in the derived table in the SAME commit.

    Like RepoRollup, the output is itself a SnapshotTable keyed on
    ``(repo, path)`` and ordered by ``as_of_version`` (the source snapshot
    version), inheriting atomic commits and exactly-once epoch idempotence
    — replaying a commit's maintenance is a no-op. A full recompute
    (``refresh_full``) is differential-tested equal to the incremental
    path, including under CDC deletes.
    """

    def __init__(self, spark: SparkSession, table: SnapshotTable, root: str,
                 n_buckets: int = 16) -> None:
        self.spark = spark
        self.source = table
        self.table = SnapshotTable(
            spark, root, key_cols=("repo", "path"), order_col="as_of_version",
            n_buckets=n_buckets,
        )
        if self.table.exists() and self.table.order_col != "as_of_version":
            raise ValueError(
                f"clean corpus at {root} is ordered by "
                f"{self.table.order_col!r}; rebuild via refresh_full"
            )

    def update_for_commit(self, commit: dict[str, Any]) -> dict[str, Any]:
        if commit.get("skipped"):
            return {"skipped": True}
        new_files = commit.get("new_files") or []
        if not new_files:
            return {"skipped": True}
        schema = self.source.schema()
        as_of = int(commit["version"])
        new_rows = self.source._read_files(new_files, schema)
        if TOMBSTONE_COL in new_rows.columns:
            live = new_rows.where(
                ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
            )
        else:
            live = new_rows
        updates = clean_corpus_expr(live).withColumn(
            "as_of_version", F.lit(as_of).cast("long")
        )
        # touched keys with no surviving clean row: CDC-deleted, or the
        # new content fails the gate — tombstone them in the same commit
        gone = (
            new_rows.select("repo", "path")
            .distinct()
            .join(updates.select("repo", "path"), ["repo", "path"], "left_anti")
            .withColumn("as_of_version", F.lit(as_of).cast("long"))
            .withColumn(TOMBSTONE_COL, F.lit(True))
        )
        return self.table.merge_epochs(
            updates.unionByName(gone, allowMissingColumns=True),
            [int(e) for e in commit["epochs"]],
            extra_summary={"derived_from_version": commit.get("version")},
            assume_deduped=True,  # commit files hold <=1 row per key
        )

    def refresh_full(self, epoch_id: int) -> dict[str, Any]:
        updates = clean_corpus_expr(self.source.read()).withColumn(
            "as_of_version",
            F.lit(int(self.source.current_version())).cast("long"),
        )
        if self.table.exists():
            gone = (
                self.table.read()
                .select("repo", "path")
                .join(updates.select("repo", "path"), ["repo", "path"], "left_anti")
                .withColumn(
                    "as_of_version",
                    F.lit(int(self.source.current_version())).cast("long"),
                )
                .withColumn(TOMBSTONE_COL, F.lit(True))
            )
            updates = updates.unionByName(gone, allowMissingColumns=True)
        return self.table.merge_epochs(
            updates, [epoch_id], extra_summary={"full_refresh": True},
            assume_deduped=True,
        )

    def read(self) -> DataFrame:
        return self.table.read().drop("epoch", TOMBSTONE_COL, "as_of_version")
