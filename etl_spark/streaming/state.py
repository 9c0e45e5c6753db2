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
spanning a batch boundary is stitched, not split. Each invocation gap-merges
the sorted INTERVALS (new events as points plus the carried session), which
matches batch sessionization over the union of events: a late event within
``gap_s`` of the carried session joins it; one older than that forms its own
(earlier) session and closes immediately. The one inherent append-mode
limit: an already-EMITTED session cannot be amended by an even later event.

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
        # gap-merge sorted intervals: new events are points; the carried
        # session is a (contiguous-by-construction) interval — equivalent to
        # batch sessionization over the union of all events seen so far,
        # modulo already-emitted sessions
        items = [(int(es), int(es), 1) for es in rows["es"]]
        if state.exists:
            s0, e0, n0 = state.get
            items.append((int(s0), int(e0), int(n0)))
        items.sort()
        closed = []
        start = end = None
        n = 0
        for s, e, cnt in items:
            if start is None:
                start, end, n = s, e, cnt
            elif s - end > gap_s:
                closed.append((user_id, start, end, n))
                start, end, n = s, e, cnt
            else:
                end = max(end, e)
                n += cnt
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
    # a null ts would reach the state fn as NaN and int(NaN) would kill the
    # whole streaming query; a null user_id would key a (None,) group whose
    # emitted row violates SESSION_SCHEMA's non-null long — drop both here
    # (per-row error isolation)
    ).where(F.col("es").isNotNull() & F.col("user_id").isNotNull())
    return keyed.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def open_sessions(spark, checkpoint_location: str) -> DataFrame:
    """The live (possibly still-open) session per key, read directly from
    the streaming query's checkpointed state via Spark 4's built-in state
    data source (``spark.read.format("statestore")``).

    Ops/debug surface: append mode only ever EMITS closed sessions, so
    without this the in-flight tail is invisible; the state reader exposes
    it batch-style without touching (or pausing) the streaming query. The
    read is a snapshot of the last committed micro-batch's state —
    consistent, but one batch behind the live stream by construction."""
    st = spark.read.format("statestore").load(checkpoint_location)
    g = "value.groupState"
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col(f"{g}.start_s").alias("ts_start_s"),
        F.col(f"{g}.end_s").alias("ts_end_s"),
        F.col(f"{g}.n").alias("n_events"),
    )
