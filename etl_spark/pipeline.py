"""The end-to-end CDC replay pipeline: tail -> clean -> dedupe -> upsert.

Spark restatement of the reference's incremental-ingest lifecycle
(SURVEY §3.2; create_duckdb_points.py:225-275):

    discover segments            (S1)   sources.discover_segments
    -> skip applied epochs       (F5)   manifest applied-epoch set
    -> read + clean + derive     (F1-F7, U-family) JVM exprs + sha256
    -> dedupe latest-per-key     (W1)   operators.dedupe.latest_by_key
    -> MERGE into snapshot table (J2/K3) lake.SnapshotTable.merge_epoch
    -> lineage log per bucket    (S4/K3) checkpoint.CheckpointLog

Everything between read and write is a single declarative plan per epoch —
Catalyst pushes the validity filters into the parquet scan and plans one
shuffle (the dedupe groupBy); there is no driver-side row loop anywhere.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.checkpoint import CheckpointLog
from etl_spark.functions.content import content_sha256, normalize_lang
from etl_spark.lake.table import SnapshotTable
from etl_spark.operators.dedupe import latest_by_key
from etl_spark.sources.segments import Segment, pending_segments

COMMIT_RE = r"^c\d{12}$"


def clean_events(raw: DataFrame) -> DataFrame:
    """Validity filters + derived columns — all JVM-side, pushdown-friendly.

    Analog of the reference's clean stage (F1 sentinel, F2 key validity,
    F6 casts+derive, F7 null guard; create_duckdb_points.py:141-158):
    - drop rows with null/empty key or content (F7)
    - commit must be a well-formed monotone LSN string (F2)
    - normalize lang (F3/F6 analog), derive content_sha256 (EPOCH() analog)
    """
    cleaned = (
        raw.where(
            F.col("repo").isNotNull()
            & (F.col("repo") != "")
            & F.col("path").isNotNull()
            & (F.col("path") != "")
            & F.col("content").isNotNull()
        )
        .where(F.col("commit").rlike(COMMIT_RE))
        .withColumn("lang", normalize_lang("lang"))
        .withColumn("content_sha256", content_sha256("content"))
    )
    return cleaned


@dataclass
class EpochStats:
    epoch: int
    events_read: int = 0
    events_applied: int = 0
    seconds: float = 0.0
    skipped: bool = False
    commit: dict[str, Any] = field(default_factory=dict)

    def as_dict(self) -> dict[str, Any]:
        return {
            "epoch": self.epoch,
            "events_read": self.events_read,
            "events_applied": self.events_applied,
            "seconds": round(self.seconds, 3),
            "events_per_sec": round(self.events_read / self.seconds, 1)
            if self.seconds > 0
            else None,
            "skipped": self.skipped,
        }


class IngestPipeline:
    def __init__(
        self,
        spark: SparkSession,
        table_root: str,
        *,
        key_cols: tuple[str, ...] = ("repo", "path"),
        order_col: str = "commit",
        n_buckets: int = 32,
        count_input: bool = True,
    ) -> None:
        self.spark = spark
        self.table = SnapshotTable(
            spark, table_root, key_cols=key_cols, order_col=order_col, n_buckets=n_buckets
        )
        self.log = CheckpointLog(spark, f"{table_root}/_checkpoint")
        self.count_input = count_input

    def apply_epoch(self, segment: Segment) -> EpochStats:
        """Apply one binlog segment exactly once."""
        t0 = time.time()
        stats = EpochStats(epoch=segment.epoch)
        if segment.epoch in self.table.applied_epochs():
            stats.skipped = True
            # Heal a crash between manifest commit and log append (§docstring).
            if segment.epoch not in self.log.logged_epochs():
                self._backfill_log(segment)
            stats.seconds = time.time() - t0
            return stats

        raw = self.spark.read.parquet(segment.path)
        cleaned = clean_events(raw)
        deduped = latest_by_key(
            cleaned, keys=self.table.key_cols, order_col=self.table.order_col
        ).persist()
        try:
            stats.events_applied = deduped.count()
            if self.count_input:
                stats.events_read = raw.count()
            lineage = self.log.lineage_rows(
                deduped, self.table._bucket_expr(), segment.epoch
            )
            commit = self.table.merge_epoch(
                deduped,
                segment.epoch,
                extra_summary={"segment": segment.path},
            )
            if not commit.get("skipped"):
                self.log.append(lineage, segment.epoch)
            stats.commit = commit
        finally:
            deduped.unpersist()
        stats.seconds = time.time() - t0
        return stats

    def _backfill_log(self, segment: Segment) -> None:
        raw = self.spark.read.parquet(segment.path)
        deduped = latest_by_key(
            clean_events(raw), keys=self.table.key_cols, order_col=self.table.order_col
        )
        lineage = self.log.lineage_rows(deduped, self.table._bucket_expr(), segment.epoch)
        self.log.append(lineage, segment.epoch)

    def replay(
        self,
        stream_root: str,
        *,
        max_epoch: int | None = None,
        mode: str = "incremental",
    ) -> list[EpochStats]:
        """Resume-safe full replay: apply every pending segment in LSN order.

        ``mode="incremental"`` applies one segment per snapshot commit (the
        steady-state CDC path). ``mode="catchup"`` dedupes ALL pending
        segments together and applies them in ONE commit — the bootstrap /
        backlog path: one table rewrite instead of N, so replaying a long
        binlog backlog costs one dedupe shuffle + one merge regardless of how
        many epochs are pending. Both modes are differential-tested to yield
        identical final state.
        """
        # Heal crash-between-manifest-and-log: backfill lineage for epochs the
        # table committed but the log never recorded.
        from etl_spark.sources.segments import discover_segments

        applied = self.table.applied_epochs()
        logged = self.log.logged_epochs()
        for seg in discover_segments(stream_root):
            if seg.epoch in applied and seg.epoch not in logged:
                self._backfill_log(seg)
        pending = pending_segments(
            stream_root, self.table.applied_epochs(), max_epoch=max_epoch
        )
        if mode == "catchup":
            return self._replay_catchup(stream_root, pending)
        out = []
        for seg in pending:
            out.append(self.apply_epoch(seg))
        return out

    def _replay_catchup(
        self, stream_root: str, pending: list[Segment]
    ) -> list[EpochStats]:
        """Apply all pending segments in a single dedupe + merge + commit."""
        if not pending:
            return []
        t0 = time.time()
        # basePath recovers the epoch partition column across segment dirs —
        # the winning row's epoch flows into per-epoch lineage.
        raw = self.spark.read.option("basePath", stream_root).parquet(
            *[s.path for s in pending]
        )
        cleaned = clean_events(raw)
        deduped = latest_by_key(
            cleaned, keys=self.table.key_cols, order_col=self.table.order_col
        ).persist()
        try:
            stats = EpochStats(epoch=pending[-1].epoch)
            stats.events_applied = deduped.count()
            if self.count_input:
                stats.events_read = raw.count()
            lineage = self.log.lineage_rows_multi(deduped, self.table._bucket_expr())
            commit = self.table.merge_epochs(
                deduped,
                [s.epoch for s in pending],
                extra_summary={"segments": len(pending), "mode": "catchup"},
            )
            if not commit.get("skipped"):
                self.log.append_multi(lineage)
            stats.commit = commit
        finally:
            deduped.unpersist()
        stats.seconds = time.time() - t0
        return [stats]
