"""Checkpoint / lineage log — one row per (epoch, bucket) applied.

Generalizes the reference's ``points_ingestion_log`` (file_name PK, file_path,
file_date, min_ts, max_ts, loaded_at; create_duckdb_points.py:75-85,186-210):
our log records, per epoch and per key-bucket, the applied LSN (commit) range,
row count and bytes, plus wall-clock timing.

Authority split (crash-safe by construction): the *table manifest* is the
exactly-once source of truth (applied-epoch set, committed atomically with the
data); this log is derived lineage for observability and resumption hints.
A crash between the manifest commit and the log append is healed on the next
run: the epoch is skipped because the manifest already lists it, and the log
row is backfilled.

Row-count semantics, by path: the zero-job fast path (staged-file footers)
records the epoch's POST-DEDUPE UPDATES — including late re-deliveries that
subsequently lose latest-wins against a newer table row — and its ``bytes``
is staged on-disk (compressed) size; the read-back and backfill paths record
the SURVIVING winners with payload byte sums. Winners are a subset of
updates, so a crash-healed epoch may log fewer rows than the original commit
did. Both are valid lineage reads (applied-LSN ranges agree); exactly-once
correctness never depends on this log.
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("min_lsn", T.StringType(), True),
        T.StructField("max_lsn", T.StringType(), True),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("committed_at", T.DoubleType(), False),
    ]
)


class CheckpointLog:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def lineage_rows(self, deduped: DataFrame, bucket_expr, epoch_id: int) -> DataFrame:
        """Per-bucket applied-LSN ranges for one epoch's deduped updates."""
        ts = time.time()
        return (
            deduped.withColumn("_bucket", bucket_expr)
            .groupBy("_bucket")
            .agg(
                F.min("commit").alias("min_lsn"),
                F.max("commit").alias("max_lsn"),
                F.count(F.lit(1)).alias("row_count"),
                F.sum(F.length("content")).alias("bytes"),
            )
            .select(
                F.lit(epoch_id).cast("int").alias("epoch"),
                F.col("_bucket").cast("int").alias("bucket"),
                "min_lsn",
                "max_lsn",
                F.col("row_count").cast("long"),
                F.coalesce(F.col("bytes"), F.lit(0)).cast("long").alias("bytes"),
                F.lit(ts).alias("committed_at"),
            )
        )

    def lineage_rows_multi(self, deduped: DataFrame, bucket_expr) -> DataFrame:
        """Per-(epoch, bucket) lineage for a multi-epoch catch-up batch.

        ``deduped`` must carry an ``epoch`` column (the winning commit's
        segment, preserved through the dedupe payload). Uses the derived
        ``content_bytes`` column when present so the aggregation never touches
        the payload column — with columnar pruning the lineage pass over the
        written files reads a few narrow columns instead of the table bytes.
        """
        ts = time.time()
        size_col = (
            F.sum("content_bytes")
            if "content_bytes" in deduped.columns
            else F.sum(F.length("content"))
        )
        return (
            deduped.withColumn("_bucket", bucket_expr)
            .groupBy("epoch", "_bucket")
            .agg(
                F.min("commit").alias("min_lsn"),
                F.max("commit").alias("max_lsn"),
                F.count(F.lit(1)).alias("row_count"),
                size_col.alias("bytes"),
            )
            .select(
                F.col("epoch").cast("int"),
                F.col("_bucket").cast("int").alias("bucket"),
                "min_lsn",
                "max_lsn",
                F.col("row_count").cast("long"),
                F.coalesce(F.col("bytes"), F.lit(0)).cast("long").alias("bytes"),
                F.lit(ts).alias("committed_at"),
            )
        )

    def append(self, rows: DataFrame, epoch_id: int) -> None:
        """Idempotent append: the epoch's log partition is overwritten whole.

        Lineage is tiny (<= n_buckets rows/epoch), so the materialized rows are
        written driver-side with pyarrow — no Spark write job per epoch.
        """
        self._write_pandas(rows.toPandas(), epoch_id)

    def append_multi(self, rows: DataFrame) -> None:
        """Append lineage for many epochs at once (catch-up replay)."""
        self.append_pandas(rows.toPandas())

    def append_pandas(self, pdf) -> None:
        """Append already-materialized lineage rows, grouped per epoch."""
        for epoch_id, grp in pdf.groupby("epoch"):
            self._write_pandas(grp, int(epoch_id))

    def mark_empty(self, epoch_id: int) -> None:
        """Write a zero-row lineage partition for an epoch that applied no
        rows (all superseded / all invalid), so ``logged_epochs`` converges
        instead of re-running the backfill scan for that epoch forever."""
        import pandas as pd

        self._write_pandas(
            pd.DataFrame(columns=[f.name for f in LOG_SCHEMA.fields]), epoch_id
        )

    def _write_pandas(self, pdf, epoch_id: int) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        arrow_schema = pa.schema(
            [
                pa.field("epoch", pa.int32()),
                pa.field("bucket", pa.int32()),
                pa.field("min_lsn", pa.string()),
                pa.field("max_lsn", pa.string()),
                pa.field("row_count", pa.int64()),
                pa.field("bytes", pa.int64()),
                pa.field("committed_at", pa.float64()),
            ]
        )
        tbl = pa.Table.from_pandas(
            pdf.reset_index(drop=True), schema=arrow_schema, preserve_index=False
        )
        d = self.root / f"epoch={epoch_id}"
        d.mkdir(parents=True, exist_ok=True)
        for old in d.glob("*.parquet"):
            old.unlink()
        pq.write_table(tbl, d / "part-0.parquet")

    # ---- consolidation ----------------------------------------------------
    #
    # Steady state appends ONE tiny parquet dir per epoch — at 10^6 epochs
    # that is 10^6 directories and a million-root-path read. compact()
    # folds old per-epoch dirs into a consolidated parquet dir recorded by
    # an atomically-swapped JSON marker carrying the covered epoch set
    # (range-encoded, same codec as the table manifest). Every crash window
    # is consistent by construction: a per-epoch dir OVERRIDES the
    # consolidated copy of its epoch (see _view), so the marker-swapped-
    # but-dirs-not-yet-removed window reads the same rows from the dir
    # instead of double-counting, rollback-then-replay rewrites stay
    # visible, and an orphaned consolidated dir (crash before swap) is
    # ignored and reclaimed by the next compact().

    _MARKER = "compacted.json"
    _LOCK = "compact.lock"
    _RETIRED = "retired.json"
    _LOCK_STALE_S = 3600.0

    def _marker(self) -> dict | None:
        import json

        p = self.root / self._MARKER
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def _view(self) -> tuple[dict | None, set[int], list, set[int]]:
        """ONE marker read + decode: (marker, covered, per-epoch
        [(epoch, path)], per-epoch epoch set).

        A per-epoch dir OVERRIDES the consolidated copy of its epoch: an
        epoch re-applied after a rollback rewrites its dir (overwrite
        semantics predate consolidation and must survive it), and a
        leftover victim dir from an interrupted cleanup holds rows
        identical to the consolidated ones — either way the dir is the
        newer truth and stays re-compactable."""
        from etl_spark.lake.table import decode_epoch_ranges

        m = self._marker()
        covered = decode_epoch_ranges(m["epochs"]) if m else set()
        per_epoch = sorted(
            (int(p.name.split("=")[1]), p) for p in self.root.glob("epoch=*")
        )
        return m, covered, per_epoch, {e for e, _ in per_epoch}

    def compacted_epochs(self) -> set[int]:
        return self._view()[1]

    def read(self) -> DataFrame:
        m, covered, per_epoch, dir_epochs = self._view()
        parts = []
        if m:
            cons = self.spark.read.schema(LOG_SCHEMA).parquet(
                str(self.root / m["dir"])
            )
            overridden = sorted(covered & dir_epochs)
            if overridden:
                cons = cons.where(~F.col("epoch").isin(overridden))
            parts.append(cons)
        if per_epoch:
            parts.append(
                self.spark.read.schema(LOG_SCHEMA).parquet(
                    *[str(p) for _, p in per_epoch]
                )
            )
        if not parts:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def logged_epochs(self) -> set[int]:
        _, covered, _, dir_epochs = self._view()
        return covered | dir_epochs

    # ---- retirement (vacuum-style grace window) ---------------------------
    #
    # compact() never deletes a superseded dir in the same run that
    # supersedes it: a concurrent lineage reader (status, replay pending
    # computation, a second driver) that resolved the OLD marker may still
    # be mid-scan, and rmtree under its planned Spark read raises
    # FileNotFoundError. Superseded dirs are instead recorded in a
    # retired.json sidecar (written only under the compactor lock) and
    # reclaimed by a LATER compact() once older than ``grace_s`` — the same
    # age-based rule vacuum() uses for data files. Every deferred window is
    # consistent: a retired-but-present per-epoch dir overrides the
    # consolidated copy with identical rows (see _view), and a retired
    # consolidated dir is ignored (only the marker's dir is ever read).

    def _load_retired(self) -> dict:
        import json

        p = self.root / self._RETIRED
        if not p.exists():
            return {}
        try:
            return json.loads(p.read_text())
        except (ValueError, OSError):
            return {}

    def _save_retired(self, retired: dict) -> None:
        import json
        import os
        import uuid

        tmp = self.root / f".{self._RETIRED}.{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(retired))
        os.replace(tmp, self.root / self._RETIRED)

    def _retire(self, retired: dict, name: str, mtime_ns: int | None) -> None:
        """Record a superseded dir. When the dir's content is UNCHANGED
        since the prior retirement, keep the earliest retired_at (repeated
        no-op re-folds of a still-present dir cannot postpone its reaping
        forever). When the content CHANGED (rewritten, then re-folded), a
        reader that resolved the PRE-refold marker may still be scanning
        the dir — restart the grace window (reset retired_at) so the reap
        cannot delete it out from under that reader. Convergence still
        holds: re-folds only follow actual rewrites, so an idle dir's
        clock is never restarted. An UNCHANGED dir keeps its existing
        entry verbatim — its stamp already matches, so the reap's delete
        and compact()'s already-retired skip both keep working."""
        ent = retired.get(name)
        if ent is None or ent.get("mtime_ns") != mtime_ns:
            retired[name] = {"retired_at": time.time(), "mtime_ns": mtime_ns}

    def _reap(self, retired: dict, grace_s: float) -> int:
        """Delete retired dirs past the grace window. A per-epoch dir whose
        mtime changed since retirement was REWRITTEN (rollback-then-replay)
        — it is the newer truth, so drop the entry without deleting; the
        next compact() folds and re-retires it."""
        import shutil

        now = time.time()
        reaped = 0
        for name in list(retired):
            ent = retired[name]
            if now - ent["retired_at"] < grace_s:
                continue
            p = self.root / name
            try:
                changed = (
                    ent["mtime_ns"] is not None
                    and p.stat().st_mtime_ns != ent["mtime_ns"]
                )
            except FileNotFoundError:
                del retired[name]
                continue
            if not changed:
                shutil.rmtree(p, ignore_errors=True)
                reaped += 1
            del retired[name]
        return reaped

    def compact(self, keep_last: int = 64, grace_s: float = 600.0) -> dict:
        """Fold per-epoch lineage dirs older than the newest ``keep_last``
        (plus any previous consolidation) into one consolidated dir.
        Covered-but-present dirs (rollback re-applies, interrupted
        cleanups) are victims too — their rows REPLACE the consolidated
        copies. Superseded dirs are retired, not deleted: reclamation is
        deferred to a later compact() past ``grace_s`` seconds so in-flight
        readers of the old view never lose files mid-scan (``grace_s=0``
        reclaims immediately, for tests and single-process use). A
        link-style lock file (stale after an hour) rejects concurrent
        compactors, whose last-wins marker swap could otherwise publish a
        directory the winner already removed."""
        import json
        import os
        import uuid

        from etl_spark.lake.table import encode_epoch_ranges

        lock = self.root / self._LOCK
        # O_EXCL is the only acquisition path — stealing a stale lock means
        # UNLINK then re-race the O_EXCL, so two stealers cannot both win
        # (one create succeeds, the other sees FileExistsError again and
        # backs off). A lock vanishing between the failed create and the
        # stat (holder just finished) retries the create instead of
        # spuriously reporting a concurrent compaction.
        acquired = False
        for _ in range(3):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                acquired = True
                break
            except FileExistsError:
                try:
                    age = time.time() - lock.stat().st_mtime
                except FileNotFoundError:
                    continue  # holder just released: re-race the create
                if age < self._LOCK_STALE_S:
                    return {"skipped": True, "reason": "concurrent compaction"}
                lock.unlink(missing_ok=True)  # stale (crashed compactor)
        if not acquired:
            return {"skipped": True, "reason": "concurrent compaction"}
        try:
            retired = self._load_retired()
            reaped = self._reap(retired, grace_s)  # prior runs' retirees
            m, covered, per_epoch, _ = self._view()
            victims = per_epoch[:-keep_last] if keep_last > 0 else per_epoch
            # snapshot each victim dir's mtime BEFORE reading: a concurrent
            # lineage rewrite (rollback-then-replay healing an epoch while
            # maintain runs) bumps it, and deleting the fresh dir after the
            # marker swap would lose that update — a changed dir is left in
            # place, where it OVERRIDES the consolidated copy (see _view)
            # and is folded by the next compact()
            victim_mtime = {}
            for _, p in victims:
                try:
                    victim_mtime[p] = p.stat().st_mtime_ns
                except FileNotFoundError:
                    victim_mtime[p] = None
            # a dir already retired with an UNCHANGED mtime is just waiting
            # out the grace window — its rows are in the consolidation and
            # re-folding it would rewrite the whole consolidation (and
            # retire one more full copy) on EVERY run inside the window.
            # A changed/unverifiable one is the newer truth: fold it again.
            victims = [
                (e, p) for e, p in victims
                if not (
                    (ent := retired.get(p.name)) is not None
                    and ent.get("mtime_ns") is not None
                    and ent["mtime_ns"] == victim_mtime.get(p)
                )
            ]
            # strays (pre-publish crash orphans, superseded consolidations)
            # are retired rather than removed — reaped past grace
            for p in self.root.glob("compacted-*"):
                if not (m and p.name == m["dir"]):
                    self._retire(retired, p.name, None)
            if not victims:
                reaped += self._reap(retired, grace_s)
                self._save_retired(retired)
                return {"compacted_epochs": 0, "covered": len(covered),
                        "reaped_dirs": reaped}
            victim_epochs = {e for e, _ in victims}
            parts = [
                self.spark.read.schema(LOG_SCHEMA).parquet(
                    *[str(p) for _, p in victims]
                )
            ]
            if m:
                cons = self.spark.read.schema(LOG_SCHEMA).parquet(
                    str(self.root / m["dir"])
                )
                stale = sorted(covered & victim_epochs)
                if stale:  # victim dirs override their consolidated copies
                    cons = cons.where(~F.col("epoch").isin(stale))
                parts.append(cons)
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            new_dir = f"compacted-{uuid.uuid4().hex}"
            # a handful of files regardless of history depth: rows are tiny
            df.coalesce(8).write.mode("overwrite").parquet(
                str(self.root / new_dir)
            )
            new_epochs = covered | victim_epochs
            tmp = self.root / f".{self._MARKER}.{uuid.uuid4().hex}"
            tmp.write_text(json.dumps(
                {"dir": new_dir, "epochs": encode_epoch_ranges(new_epochs)}))
            os.replace(tmp, self.root / self._MARKER)  # the atomic publish
            # cleanup is deferred, not immediate: retire unchanged victim
            # dirs (identical rows now live in the new consolidation; the
            # present dir overrides it, so the window is duplicate-free)
            # and the superseded consolidated dir, then reap whatever is
            # past grace. Changed victims (concurrent rewrite) are NOT
            # retired — the fresh dir is the newer truth.
            for _, p in victims:
                try:
                    unchanged = p.stat().st_mtime_ns == victim_mtime[p]
                except FileNotFoundError:
                    continue
                if unchanged:
                    self._retire(retired, p.name, victim_mtime[p])
            if m and m["dir"] != new_dir:
                self._retire(retired, m["dir"], None)
            reaped += self._reap(retired, grace_s)
            self._save_retired(retired)
            return {"compacted_epochs": len(victims),
                    "covered": len(new_epochs), "reaped_dirs": reaped}
        finally:
            lock.unlink(missing_ok=True)
