"""Structured-Streaming front-end for the CDC ingest pipeline.

The reference is a micro-batch incremental system (SURVEY §2.9); this module
is its Structured Streaming generalization: ``readStream`` tails the segment
directory as a file source, and every micro-batch flows through the SAME
clean -> dedupe -> derive -> exactly-once merge core via ``foreachBatch`` —
so batch replay and streaming ingest are one code path with two drivers.

Exactly-once composition: Spark's streaming checkpoint gives at-least-once
micro-batches (a batch may be re-delivered after a crash); the sink's
applied-epoch set turns that into exactly-once, with the *streaming batch id*
playing the role of the checkpoint epoch. This is the classic
"idempotent sink + replayable source" construction — the reference does the
identical thing with its anti-join vs. target
(create_duckdb_points.py:164-173).

Streaming batch ids live in their OWN commit-id space (``epoch_space=
"stream"`` in the manifest, lineage under ``_checkpoint_stream``; row-level
provenance = STREAM_EPOCH_BASE + batch id — tables stream-written by
pre-namespacing revisions carry raw ids in their rows and need a one-off
feed rebuild if change-feed attribution matters): batch
replay keys the same table on segment epoch numbers, and both sequences start
at 0 — a shared set would make the first streaming micro-batches into a
batch-replayed table silently skip as "already applied". The row-level
``epoch`` provenance column still records the writer's own id (segment epoch
for batch, batch id for streaming); consumers of a MIXED table's change feed
should treat it as provenance within the writing driver's space.

Late/duplicate data: rows for keys already at a newer commit lose the merge's
latest-wins dedupe and vanish — the streaming analog of the reference's
watermark skip (F4/F5). No event-time watermark state is needed because the
table itself is the state store (SURVEY §2.9 "state store" row).
"""

from __future__ import annotations

import os
from typing import Any
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.pipeline import IngestPipeline, clean_events, derive_content_columns

# Event schema as written by datagen.write_segments (epoch is a partition dir).
STREAM_DDL = (
    "lsn long, repo string, lang string, path string, commit string, "
    "content string"
)


def _retry_on_layout_drift(run, reattach):
    """Run ``run()``; on the merge path's layout-drift rejection (a
    concurrent ``rebucket()``), call ``reattach()`` once and retry. Any
    other error — including drift persisting after re-attach — propagates
    and fails the streaming query as before."""
    from etl_spark.lake.table import LayoutDriftError

    try:
        return run()
    except LayoutDriftError:
        reattach()
        return run()


def _apply_stream_batch(
    pipe: IngestPipeline, batch_df: DataFrame, batch_id: int
) -> None:
    """One micro-batch through the shared core (module-level so the
    crash-window heal is directly testable).

    Same core as IngestPipeline._apply_batch, keyed by streaming batch
    id: the sink's applied-epoch set makes re-delivered batches no-ops.
    """
    from etl_spark.lake.table import STREAM_EPOCH_BASE

    # row provenance lives in a disjoint id range (base + batch id) so a
    # mixed batch+stream table's change feed and lineage filters can
    # attribute every row unambiguously; the manifest's stream space
    # still tracks raw batch ids for the exactly-once check.
    # size the staging exchange to THIS micro-batch: a trigger's file
    # set is bounded (maxFilesPerTrigger), so statting it is O(batch)
    try:
        pipe._batch_bytes = sum(
            os.path.getsize(
                urlparse(f).path if f.startswith("file:") else f
            )
            for f in batch_df.inputFiles()
        )
    except OSError:
        pipe._batch_bytes = None
    _, winners = pipe.dedupe_plan(clean_events(batch_df))
    deduped = derive_content_columns(winners).withColumn(
        "epoch", F.lit(int(STREAM_EPOCH_BASE + batch_id)).cast("int")
    )
    # row provenance = streaming batch id (the commit key), replacing the
    # source segment id — keeps lineage derivable from the table rows.
    commit = pipe.table.merge_epochs(
        deduped,
        [int(batch_id)],
        extra_summary={"mode": "streaming", "batch_id": int(batch_id)},
        assume_deduped=True,
        epoch_space="stream",
        size_hint=getattr(pipe, "_batch_bytes", None),
    )
    if not commit.get("skipped"):
        pipe._log_lineage(commit, provenance_offset=STREAM_EPOCH_BASE)
    elif int(batch_id) not in pipe.log.logged_epochs():
        # heal a crash between the manifest commit and the lineage write
        # (mirror of the batch path's apply_epoch heal): the re-delivered
        # batch is a merge no-op, but its lineage must still be rebuilt
        # from the rows' stream provenance
        pipe._backfill_log(int(batch_id), provenance_offset=STREAM_EPOCH_BASE)


def stream_ingest(
    spark: SparkSession,
    stream_root: str,
    table_root: str,
    *,
    checkpoint_dir: str | None = None,
    n_buckets: int = 32,
    available_now: bool = True,
    extra_schema: str | None = None,
    dedupe_strategy: str = "fused",
) -> Any:
    """Tail ``stream_root`` (epoch=N parquet segments) into the snapshot table.

    Returns the StreamingQuery. ``available_now=True`` processes the current
    backlog then stops (micro-batch replay semantics, used by tests);
    ``False`` keeps tailing for new segments.
    """
    from etl_spark.checkpoint import CheckpointLog

    def _mk_pipe() -> IngestPipeline:
        p = IngestPipeline(
            spark,
            table_root,
            n_buckets=n_buckets,
            count_input=False,
            dedupe_strategy=dedupe_strategy,
        )
        # streaming lineage gets its own log root — batch epoch N and stream
        # batch N are different events and must not share a partition dir
        p.log = CheckpointLog(spark, f"{table_root}/_checkpoint_stream")
        return p

    state = {"pipe": _mk_pipe()}
    ddl = STREAM_DDL if extra_schema is None else f"{STREAM_DDL}, {extra_schema}"

    source = (
        spark.readStream.schema(f"{ddl}, epoch int")
        .option("basePath", stream_root)
        .option("maxFilesPerTrigger", 64)
        .parquet(f"{stream_root}/epoch=*")
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # a maintenance rebucket() landing mid-stream trips the layout-drift
        # guard; re-attach once under the new layout and retry the batch —
        # the exactly-once commit makes the retry safe
        _retry_on_layout_drift(
            lambda: _apply_stream_batch(state["pipe"], batch_df, batch_id),
            lambda: state.__setitem__("pipe", _mk_pipe()),
        )

    writer = (
        source.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{table_root}/_streaming_checkpoint",
        )
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
