"""SnapshotTable — a minimal Iceberg-shaped lakehouse table on plain parquet.

No Iceberg/Delta jars ship in this environment (verified: none under
pyspark/jars, no network), so the exactly-once MERGE sink is implemented
directly on the same design Iceberg uses, kept adapter-compatible so a real
Iceberg catalog can be slotted in where available:

- **Snapshot manifests**: ``_meta/v{N}.json`` lists the table's data files,
  schema, and summary. Readers resolve the highest committed version; writers
  commit a new manifest atomically via ``os.link`` (fails if the version
  already exists -> optimistic concurrency, like Iceberg's atomic swap).
- **Copy-on-write MERGE at bucket granularity**: rows are hash-bucketed on the
  key (``pmod(xxhash64(repo, path), n_buckets)``); an upsert rewrites only the
  buckets its keys touch and carries every other data file over untouched.
  This is Iceberg's COW MERGE with buckets playing the role of file groups —
  at 100 TB an epoch touching 1% of keys rewrites ~1% of the table.
- **Exactly-once**: each commit stamps the applied epoch id into the manifest
  summary (Iceberg: snapshot summary properties). Re-applying a committed
  epoch is a metadata-only no-op. Crash *after* data files are written but
  *before* the manifest link leaves only unreferenced orphan files — never a
  partial table (the reference heals the same window with its anti-join;
  create_duckdb_points.py:269-275 / SURVEY §2.9).
- **Additive schema evolution**: new columns widen the manifest schema; old
  files are never rewritten; readers get nulls for columns missing in old
  files (reference analog: staging schema inference, create_duckdb_points.py:
  110-113). Type changes and drops are rejected.

The deduped-upsert semantics themselves (latest commit per key wins, including
against rows already in the table) generalize the reference's
DISTINCT-ON + anti-join insert (create_duckdb_points.py:151-173).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.operators.dedupe import latest_by_key

MANIFEST_DIR = "_meta"
DATA_DIR = "data"


class SchemaEvolutionError(ValueError):
    pass


def _merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Additive-only schema union: old column order preserved, new columns
    appended; a type change or implicit drop raises."""
    old_by_name = {f.name: f for f in old.fields}
    fields = list(old.fields)
    for f in new.fields:
        prev = old_by_name.get(f.name)
        if prev is None:
            fields.append(T.StructField(f.name, f.dataType, True))
        elif prev.dataType != f.dataType:
            raise SchemaEvolutionError(
                f"column {f.name!r}: type change {prev.dataType} -> {f.dataType} "
                "is not additive"
            )
    return T.StructType(fields)


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        key_cols: tuple[str, ...] = ("repo", "path"),
        order_col: str = "commit",
        n_buckets: int = 32,
    ) -> None:
        self.spark = spark
        self.root = Path(root)
        self.key_cols = tuple(key_cols)
        self.order_col = order_col
        self.n_buckets = n_buckets
        (self.root / MANIFEST_DIR).mkdir(parents=True, exist_ok=True)
        (self.root / DATA_DIR).mkdir(parents=True, exist_ok=True)

    # ---- manifest plumbing ---------------------------------------------------

    def current_version(self) -> int | None:
        versions = [
            int(p.stem[1:])
            for p in (self.root / MANIFEST_DIR).glob("v*.json")
            if p.stem[1:].isdigit()
        ]
        return max(versions) if versions else None

    def versions(self) -> list[int]:
        return sorted(
            int(p.stem[1:])
            for p in (self.root / MANIFEST_DIR).glob("v*.json")
            if p.stem[1:].isdigit()
        )

    def manifest(self, version: int | None = None) -> dict[str, Any] | None:
        v = self.current_version() if version is None else version
        if v is None:
            return None
        path = self.root / MANIFEST_DIR / f"v{v:012d}.json"
        if not path.exists():
            raise FileNotFoundError(f"snapshot v{v} of {self.root} does not exist")
        with open(path) as fh:
            return json.load(fh)

    def exists(self) -> bool:
        return self.current_version() is not None

    def applied_epochs(self) -> set[int]:
        m = self.manifest()
        return set(m["applied_epochs"]) if m else set()

    def schema(self) -> T.StructType | None:
        m = self.manifest()
        return T.StructType.fromJson(m["schema"]) if m else None

    def _commit_manifest(self, manifest: dict[str, Any], base_version: int | None = None) -> int:
        """Atomically publish a manifest as the next version.

        write tmp -> fsync -> hard-link to the final name -> unlink tmp.
        The target version is pinned to ``base_version + 1`` (the snapshot the
        writer planned against); if a concurrent writer committed first, the
        link raises FileExistsError and the caller must re-plan — Iceberg's
        optimistic-concurrency swap.
        """
        if base_version is None:
            base_version = self.current_version() or 0
        version = base_version + 1
        manifest["version"] = version
        manifest["committed_at"] = time.time()
        final = self.root / MANIFEST_DIR / f"v{version:012d}.json"
        tmp = self.root / MANIFEST_DIR / f".tmp-{uuid.uuid4().hex}.json"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)  # atomic create-if-absent
        finally:
            os.unlink(tmp)
        return version

    # ---- read ----------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Table state at ``version`` (default: current) — snapshot isolation
        gives time travel for free, like Iceberg's VERSION AS OF. Old files
        missing newly-added columns read as null (explicit manifest schema
        drives the scan)."""
        m = self.manifest(version)
        if m is None:
            raise FileNotFoundError(f"table {self.root} has no committed snapshot")
        schema = T.StructType.fromJson(m["schema"])
        files = [f["path"] for f in m["files"]]
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)

    def changes_between(self, v_from: int | None, v_to: int | None = None) -> DataFrame:
        """Change feed: rows applied after snapshot ``v_from`` up to ``v_to``
        (defaults: table start -> current). The CDC-out face of the engine
        (Iceberg changelog scan / Delta CDF analog).

        Cost is O(changed data), not O(table): only files NEW in ``v_to``
        relative to ``v_from`` are read (manifest diff), filtered to rows
        whose ``epoch`` provenance lies in the applied-epoch delta — carried
        rows rewritten into merged bucket files are excluded by that filter.
        """
        m_to = self.manifest(v_to)
        if m_to is None:
            raise FileNotFoundError(f"table {self.root} has no committed snapshot")
        schema = T.StructType.fromJson(m_to["schema"])
        if v_from is None:
            old_paths: set[str] = set()
            old_epochs: set[int] = set()
        else:
            m_from = self.manifest(v_from)
            old_paths = {f["path"] for f in m_from["files"]}
            old_epochs = set(m_from["applied_epochs"])
        new_files = [f for f in m_to["files"] if f["path"] not in old_paths]
        delta_epochs = sorted(set(m_to["applied_epochs"]) - old_epochs)
        df = self._read_files(new_files, schema)
        if "epoch" in df.columns:
            df = df.where(F.col("epoch").isin(delta_epochs))
        return df

    def _read_files(self, files: list[dict], schema: T.StructType) -> DataFrame:
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*[f["path"] for f in files])

    # ---- maintenance ---------------------------------------------------------

    def history(self) -> list[dict[str, Any]]:
        """One entry per snapshot: version, committed_at, epochs, files, rows."""
        out = []
        for v in self.versions():
            m = self.manifest(v)
            out.append(
                {
                    "version": v,
                    "committed_at": m.get("committed_at"),
                    "applied_epochs": m.get("applied_epochs", []),
                    "files": len(m.get("files", [])),
                    "rows": sum(f.get("rows", 0) for f in m.get("files", [])),
                    "summary": m.get("summary", {}),
                }
            )
        return out

    def expire_snapshots(self, retain_last: int = 3) -> list[int]:
        """Drop manifest versions older than the newest ``retain_last``
        (Iceberg's expire_snapshots). Data files they reference become
        orphans reclaimable by ``vacuum``. Returns expired versions."""
        versions = self.versions()
        expired = versions[:-retain_last] if retain_last > 0 else versions[:-1]
        for v in expired:
            (self.root / MANIFEST_DIR / f"v{v:012d}.json").unlink(missing_ok=True)
        return expired

    def vacuum(self) -> dict[str, Any]:
        """Delete data files referenced by NO retained snapshot: old versions'
        rewritten buckets and crash orphans (written but never committed).
        Safe by construction — readers only ever resolve files through a
        manifest, and expired manifests are gone before their files are."""
        referenced: set[str] = set()
        for v in self.versions():
            for f in self.manifest(v).get("files", []):
                referenced.add(os.path.basename(f["path"]))
        removed, freed = 0, 0
        for p in (self.root / DATA_DIR).glob("*.parquet"):
            if p.name not in referenced:
                freed += p.stat().st_size
                p.unlink()
                removed += 1
        # staging dirs abandoned by a killed writer (quiet for >1h: a live
        # writer's staging is always younger than its own merge)
        import shutil as _shutil

        staging_removed = 0
        for d in self.root.glob("_staging-*"):
            if time.time() - d.stat().st_mtime > 3600:
                _shutil.rmtree(d, ignore_errors=True)
                staging_removed += 1
        return {"files_removed": removed, "bytes_freed": freed,
                "files_retained": len(referenced),
                "staging_dirs_removed": staging_removed}

    def fsck(self) -> dict[str, Any]:
        """Verify snapshot integrity against the filesystem.

        Checks, per the current manifest: every data file exists and its
        parquet footer row count matches the manifest entry; buckets hold at
        most one live file; the applied-epoch set grew monotonically across
        retained snapshots. Returns a report; ``ok`` is False on any finding.
        """
        import pyarrow.parquet as _pq

        findings: list[str] = []
        m = self.manifest()
        if m is None:
            return {"ok": True, "findings": ["empty table (no snapshot)"]}
        seen_buckets: set[int] = set()
        for f in m["files"]:
            p = Path(f["path"])
            if not p.exists():
                findings.append(f"missing data file {p.name} (bucket {f['bucket']})")
                continue
            rows = _pq.read_metadata(p).num_rows
            if rows != f["rows"]:
                findings.append(
                    f"row drift in {p.name}: manifest {f['rows']} vs footer {rows}"
                )
            if f["bucket"] in seen_buckets:
                findings.append(f"bucket {f['bucket']} has multiple live files")
            seen_buckets.add(f["bucket"])
        prev: set[int] = set()
        for v in self.versions():
            cur = set(self.manifest(v)["applied_epochs"])
            if not prev <= cur:
                findings.append(
                    f"applied-epoch set shrank at v{v}: lost {sorted(prev - cur)}"
                )
            prev = cur
        return {
            "ok": not findings,
            "findings": findings,
            "files_checked": len(m["files"]),
            "versions_checked": len(self.versions()),
        }

    # ---- write / merge ---------------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.key_cols]), F.lit(self.n_buckets)
        ).cast("int")

    def _stage_bucketed(self, df: DataFrame) -> tuple[Path, list[dict[str, Any]]]:
        """Materialize df ONCE as bucket-pure sorted parquet in a staging dir.

        One shuffle, partitioned on the bucket column, so every output file
        holds exactly one bucket — merges prune at file granularity, and the
        bucket set is discovered from the staging dirs instead of a second
        evaluation of the (expensive) upstream plan.
        """
        staging = self.root / f"_staging-{uuid.uuid4().hex}"
        (
            df.withColumn("_bucket", self._bucket_expr())
            .repartition(self.n_buckets, "_bucket")
            .sortWithinPartitions(*self.key_cols)  # cluster-order on write (P7)
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(str(staging))
        )
        infos: list[dict[str, Any]] = []
        for bdir in sorted(staging.glob("_bucket=*")):
            bucket = int(bdir.name.split("=")[1])
            for part in sorted(bdir.glob("*.parquet")):
                meta = pq.read_metadata(part)
                infos.append(
                    {
                        "path": str(part),
                        "bucket": bucket,
                        "rows": meta.num_rows,
                        "bytes": part.stat().st_size,
                    }
                )
        return staging, infos

    def _promote(self, info: dict[str, Any]) -> dict[str, Any]:
        """Move a staged file into data/ (rename-only; no rewrite)."""
        dest = self.root / DATA_DIR / f"{uuid.uuid4().hex}.parquet"
        os.replace(info["path"], dest)
        return {**info, "path": str(dest)}

    def _write_bucketed(self, df: DataFrame) -> list[dict[str, Any]]:
        """Stage + promote in one step (first-write / full-rewrite path)."""
        import shutil

        staging, infos = self._stage_bucketed(df)
        try:
            return [self._promote(f) for f in infos]
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def merge_epoch(
        self,
        updates: DataFrame,
        epoch_id: int,
        *,
        extra_summary: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Idempotent keyed upsert of one epoch (MERGE INTO semantics).

        ``updates`` must already be deduped to one row per key (the pipeline's
        dedupe stage guarantees it). Latest ``order_col`` wins against rows
        already in the table. Returns commit stats; a replay of a committed
        epoch returns ``{"skipped": True}`` without touching data.
        """
        return self.merge_epochs(updates, [epoch_id], extra_summary=extra_summary)

    def merge_epochs(
        self,
        updates: DataFrame,
        epoch_ids: list[int],
        *,
        extra_summary: dict[str, Any] | None = None,
        max_retries: int = 3,
    ) -> dict[str, Any]:
        """Idempotent keyed upsert of one or more epochs in a single commit.

        The multi-epoch form backs catch-up/bootstrap replay: N pending
        segments deduped together and applied in ONE snapshot commit — one
        table rewrite instead of N (SURVEY §2.9: epoch = set of binlog
        segments). All epoch ids land atomically in the manifest's
        applied-epoch set, so a crash mid-catch-up replays cleanly.

        Concurrent writers: if another writer swaps the manifest first, the
        atomic link raises and this merge RE-PLANS against the new snapshot
        (Iceberg's optimistic-concurrency loop). A competing writer that
        applied the same epochs turns the retry into a skip; files written by
        the losing attempt become orphans for ``vacuum``.
        """
        last_err: Exception | None = None
        for _ in range(max_retries):
            try:
                return self._merge_epochs_once(updates, epoch_ids, extra_summary)
            except FileExistsError as err:
                last_err = err  # manifest swap lost; re-plan from new snapshot
        raise RuntimeError(
            f"merge of epochs {epoch_ids} lost the commit race {max_retries} "
            "times; giving up"
        ) from last_err

    def _merge_epochs_once(
        self,
        updates: DataFrame,
        epoch_ids: list[int],
        extra_summary: dict[str, Any] | None,
    ) -> dict[str, Any]:
        applied = self.applied_epochs()
        new_ids = [e for e in epoch_ids if e not in applied]
        if not new_ids:
            return {"skipped": True, "epochs": sorted(epoch_ids)}
        epoch_set = sorted(applied | set(new_ids))

        m = self.manifest()

        if m is None:
            new_files = self._write_bucketed(updates)
            manifest = {
                "schema": updates.schema.jsonValue(),
                "files": new_files,
                "applied_epochs": epoch_set,
                "key_cols": list(self.key_cols),
                "order_col": self.order_col,
                "n_buckets": self.n_buckets,
                "summary": extra_summary or {},
                "parent": None,
            }
            version = self._commit_manifest(manifest, base_version=0)
            return {
                "skipped": False,
                "epochs": new_ids,
                "version": version,
                "rewritten_buckets": sorted({f["bucket"] for f in new_files}),
                "rows_written": sum(f["rows"] for f in new_files),
                "new_files": new_files,
            }

        old_schema = T.StructType.fromJson(m["schema"])
        merged_schema = _merge_schemas(old_schema, updates.schema)

        # Stage the updates ONCE (the only evaluation of the upstream plan);
        # the touched-bucket set falls out of the staging layout for free.
        import shutil

        staging, staged = self._stage_bucketed(updates)
        try:
            touched = sorted({f["bucket"] for f in staged})
            old_buckets = {f["bucket"] for f in m["files"]}
            overlap = {b for b in touched if b in old_buckets}
            carried = [f for f in m["files"] if f["bucket"] not in overlap]

            # Buckets with no existing file: staged output IS final — rename.
            new_files = [self._promote(f) for f in staged if f["bucket"] not in overlap]

            if overlap:
                # Only overlapping buckets re-merge: read existing + staged
                # rows for those buckets (small, bucket-pure files) and
                # rewrite them with latest-wins.
                old_touched = [f for f in m["files"] if f["bucket"] in overlap]
                staged_touched = [f for f in staged if f["bucket"] in overlap]
                existing = self._read_files(old_touched, merged_schema)
                incoming = self._read_files(staged_touched, merged_schema)
                merged = latest_by_key(
                    existing.unionByName(incoming, allowMissingColumns=True),
                    keys=self.key_cols,
                    order_col=self.order_col,
                )
                new_files += self._write_bucketed(merged)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

        manifest = {
            "schema": merged_schema.jsonValue(),
            "files": carried + new_files,
            "applied_epochs": epoch_set,
            "key_cols": list(self.key_cols),
            "order_col": self.order_col,
            "n_buckets": self.n_buckets,
            "summary": extra_summary or {},
            "parent": m["version"],
        }
        version = self._commit_manifest(manifest, base_version=m["version"])
        return {
            "skipped": False,
            "epochs": new_ids,
            "version": version,
            "rewritten_buckets": touched,
            "carried_files": len(carried),
            "rows_written": sum(f["rows"] for f in new_files),
            "new_files": new_files,
        }
