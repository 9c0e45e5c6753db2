"""IcebergTable — the same exactly-once sink on a real Apache Iceberg catalog.

This sandbox ships no Iceberg runtime jar (verified; SURVEY §7.3 R1;
re-attempted round 4 via ``spark.jars.packages`` — ivy resolution still
fails with no network, gateway exits before port handoff; re-verified
round 5: no iceberg*runtime*.jar anywhere on disk and DNS resolution to
Maven Central fails outright, so neither ``--packages`` nor a local jar
drop is possible), so the
engine runs on ``SnapshotTable`` (lake/table.py), which reimplements the same
design on plain parquet. This adapter is the code-complete mapping for
clusters that DO have Iceberg (``--packages
org.apache.iceberg:iceberg-spark-runtime-3.5_2.12`` + a catalog conf); it
exposes the same surface the pipeline consumes, so swapping sinks is a
constructor change:

    SnapshotTable concept            Iceberg realization
    ---------------------------------------------------------------------
    manifest versions                table snapshots (time travel built in)
    applied-epoch set in manifest    ``applied-epochs`` snapshot summary prop
    bucket-pruned COW merge          MERGE INTO (+ write.distribution-mode,
                                     bucket(N, repo, path) partition transform)
    additive schema evolution        ALTER TABLE ... ADD COLUMNS
    expire/vacuum                    expire_snapshots / remove_orphan_files

Import-gated: constructing it without Iceberg on the classpath raises a clear
error; the test suite exercises only SQL-string generation (pure Python).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: legacy (pre-namespacing) property: early builds stamped EVERY space's ids
#: here, so the ids are ambiguous across spaces. Never written anymore;
#: folded on read into exactly ONE declared space (``legacy_epoch_space``,
#: default "batch") — see applied_epochs for why folding it everywhere
#: would turn safe re-applies into silent skips.
LEGACY_EPOCH_PROP = "applied-epochs"
EPOCH_PROP = LEGACY_EPOCH_PROP


def _epoch_prop(space: str) -> str:
    """Snapshot-summary property name for one commit-id SPACE. EVERY space is
    namespaced — including batch — so mixing batch and streaming drivers on
    the Iceberg backend cannot mistake stream batch N for segment epoch N
    (parity with SnapshotTable's per-space applied sets, lake/table.py
    _space_key), and so the bare legacy name is unambiguously pre-upgrade."""
    return f"{LEGACY_EPOCH_PROP}-{space}"


def _quote(ident: str) -> str:
    return ".".join(f"`{p}`" for p in ident.split("."))


class IcebergTable:
    """Iceberg-backed drop-in for SnapshotTable (same public surface)."""

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        *,
        key_cols: tuple[str, ...] = ("repo", "path"),
        order_col: str = "commit",
        n_buckets: int = 32,
        legacy_epoch_space: str = "batch",
    ) -> None:
        self.spark = spark
        self.identifier = identifier
        self.key_cols = tuple(key_cols)
        self.order_col = order_col
        self.n_buckets = n_buckets
        # which ONE space the pre-namespacing shared epoch property belongs
        # to (see applied_epochs); folding it everywhere would let a legacy
        # batch id silently skip a stream micro-batch, or vice versa
        self.legacy_epoch_space = legacy_epoch_space
        self._ensure_runtime()

    def _ensure_runtime(self) -> None:
        try:
            self.spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.iceberg.Schema"
            )
        except Exception as exc:
            raise RuntimeError(
                "Iceberg runtime not on the classpath; use SnapshotTable here "
                "or submit with --packages org.apache.iceberg:iceberg-spark-runtime-*"
            ) from exc

    # ---- DDL -----------------------------------------------------------------

    def create_table_sql(self, schema: T.StructType) -> str:
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        keys = ", ".join(self.key_cols)
        return (
            f"CREATE TABLE IF NOT EXISTS {_quote(self.identifier)} ({cols}) "
            f"USING iceberg "
            f"PARTITIONED BY (bucket({self.n_buckets}, {keys})) "
            "TBLPROPERTIES ("
            "'write.distribution-mode'='hash', "
            "'format-version'='2', "
            "'write.merge.mode'='copy-on-write')"
        )

    def add_columns_sql(self, new_fields: list[T.StructField]) -> str:
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in new_fields)
        return f"ALTER TABLE {_quote(self.identifier)} ADD COLUMNS ({cols})"

    def widen_column_sql(self, field: T.StructField) -> str:
        """Safe type promotion (Iceberg int->long / float->double)."""
        return (
            f"ALTER TABLE {_quote(self.identifier)} ALTER COLUMN "
            f"`{field.name}` TYPE {field.dataType.simpleString()}"
        )

    # ---- exactly-once MERGE ---------------------------------------------------

    def merge_sql(self, updates_view: str, columns: list[str]) -> str:
        """MERGE INTO with latest-wins semantics against existing rows.

        The epoch-idempotence gate lives OUTSIDE the statement (applied_epochs
        checked first, epoch ids stamped into the commit's snapshot summary),
        exactly like the parquet sink — MERGE alone is not idempotent across
        replays.
        """
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in self.key_cols)
        sets = ", ".join(f"t.`{c}` = s.`{c}`" for c in columns)
        vals = ", ".join(f"s.`{c}`" for c in columns)
        cols = ", ".join(f"`{c}`" for c in columns)
        return (
            f"MERGE INTO {_quote(self.identifier)} t "
            f"USING {updates_view} s ON {on} "
            f"WHEN MATCHED AND s.`{self.order_col}` > t.`{self.order_col}` "
            f"THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
        )

    def applied_epochs(self, space: str = "batch") -> set[int]:
        """Applied commit-ids for one epoch space, from snapshot summaries.

        Ids recorded under the legacy shared ``applied-epochs`` property
        (builds that predate per-space namespacing) fold into exactly ONE
        space — ``legacy_epoch_space``, default ``"batch"`` — never into
        all of them. Legacy ids are ambiguous (the stream space tracks raw
        micro-batch ids, numerically colliding with segment epochs), and
        the two error directions are not symmetric: folding a legacy id
        into the WRONG space silently SKIPS a never-applied commit (data
        loss), while not folding merely re-applies a MERGE whose order
        guard makes it redundant-but-correct. So the fold is skip-biased
        only where the operator declares the legacy usage lived; a
        pre-upgrade table that really ran streaming attaches with
        ``legacy_epoch_space="stream"`` once. Post-upgrade commits write
        only namespaced properties, so the legacy set is frozen and new
        tables never populate it — spaces on them separate cleanly."""
        rows = self.spark.sql(
            f"SELECT summary FROM {_quote(self.identifier)}.snapshots "
            "ORDER BY committed_at DESC"
        ).collect()
        props = {_epoch_prop(space)}
        if space == self.legacy_epoch_space:
            props.add(LEGACY_EPOCH_PROP)
        out: set[int] = set()
        for r in rows:
            for name in props:
                prop = (r["summary"] or {}).get(name)
                if prop:
                    out |= set(json.loads(prop))
        return out

    def merge_epochs(
        self,
        updates: DataFrame,
        epoch_ids: list[int],
        *,
        extra_summary: dict[str, Any] | None = None,
        assume_deduped: bool = False,
        epoch_space: str = "batch",
    ) -> dict[str, Any]:
        if not assume_deduped:
            from etl_spark.operators.dedupe import latest_by_key

            updates = latest_by_key(
                updates, keys=self.key_cols, order_col=self.order_col
            )
        applied = self.applied_epochs(space=epoch_space)
        new_ids = [e for e in epoch_ids if e not in applied]
        if not new_ids:
            return {"skipped": True, "epochs": sorted(epoch_ids)}

        # additive schema evolution (+ safe widening) before the merge
        from etl_spark.lake.table import _widens_to

        cur = {f.name: f for f in self.spark.table(self.identifier).schema.fields}
        new_fields = [f for f in updates.schema.fields if f.name not in cur]
        if new_fields:
            self.spark.sql(self.add_columns_sql(new_fields))
        for f in updates.schema.fields:
            prev = cur.get(f.name)
            if prev is not None and _widens_to(prev.dataType, f.dataType):
                self.spark.sql(self.widen_column_sql(f))

        view = f"_etl_updates_{abs(hash(tuple(new_ids)))}"
        updates.createOrReplaceTempView(view)
        # stamp epoch ids into the commit's snapshot summary (exactly-once
        # key), under the SPACE-namespaced property
        self.spark.conf.set(
            f"spark.wap.snapshot-property.{_epoch_prop(epoch_space)}",
            json.dumps(sorted(new_ids)),
        )
        self.spark.sql(self.merge_sql(view, updates.columns))
        snap = self.spark.sql(
            f"SELECT snapshot_id FROM {_quote(self.identifier)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return {
            "skipped": False,
            "epochs": new_ids,
            "version": snap[0]["snapshot_id"] if snap else None,
        }

    # ---- reads / maintenance --------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        if version is None:
            return self.spark.table(self.identifier)
        return (
            self.spark.read.option("snapshot-id", version).table(self.identifier)
        )

    def expire_snapshots_sql(self, older_than_ts: str) -> str:
        return (
            f"CALL system.expire_snapshots(table => '{self.identifier}', "
            f"older_than => TIMESTAMP '{older_than_ts}')"
        )

    def remove_orphans_sql(self) -> str:
        return f"CALL system.remove_orphan_files(table => '{self.identifier}')"
