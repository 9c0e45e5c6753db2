"""Custom stateful streaming operators via ``applyInPandasWithState``.

The engine's exactly-once ingest keeps its state in the table itself
(streaming/ingest.py); this module covers the OTHER §2.9 shape — per-key
state that outlives a micro-batch — with the canonical example: streaming
gap-based sessionization (the reference's stop/trajectory segmentation is
exactly per-key ordered-scan-with-carryover state,
/root/reference/src/core/points_to_ls_poly.py:51-240).

Semantics: events are grouped per user; within each state invocation rows
are sorted by (ts, event_id); a gap > ``gap_s`` closes the running session.
CLOSED sessions are emitted in append mode; the (possibly) still-open last
session is carried in the group state to the next micro-batch, so a session
spanning a batch boundary is stitched, not split. A late event older than
the carried session's end extends the session backwards-in-time only in
COUNT — the end never regresses (``end = max(end, es)``), so lateness can
widen but never split a session.

Scale shape: state is O(active keys) x one small tuple; Spark's state store
checkpoints it per batch. No shuffle beyond the groupBy hash exchange.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts_start_s", T.LongType(), False),
        T.StructField("ts_end_s", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

# carried per key: (start_s, end_s, n_events) of the open session
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_s", T.LongType(), True),
        T.StructField("end_s", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _session_fn(gap_s: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["es", "event_id"])
        if state.exists:
            start, end, n = state.get
        else:
            start = end = None
            n = 0
        closed = []
        for es in rows["es"]:
            es = int(es)
            if start is None:
                start, end, n = es, es, 1
            elif es - end > gap_s:
                closed.append((user_id, start, end, n))
                start, end, n = es, es, 1
            else:
                # a late event (es < end) joins the session without
                # regressing its end — otherwise the NEXT event could see a
                # false gap and wrongly split the session
                start = min(start, es)
                end = max(end, es)
                n += 1
        state.update((start, end, n))
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "ts_start_s", "ts_end_s", "n_events"]
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
) -> DataFrame:
    """Streaming sessionization over a streaming DataFrame with columns
    (user_id long, ts timestamp, event_id long). Emits CLOSED sessions."""
    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("long").alias("es"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def open_sessions(checkpointed_query_state: DataFrame) -> DataFrame:  # pragma: no cover
    """Placeholder for the state-store reader API (spark.read.format
    ("statestore")) — available where the state data source is enabled."""
    raise NotImplementedError("state store reader not wired in this sandbox")
