"""Gap-based sessionization — the reference's per-key stateful operator (U1).

The reference's ``process_single_mmsi`` (core/points_to_ls_poly.py:51-240)
splits each vessel's ordered point stream into segments whenever the time gap
exceeds a threshold (constants at points_to_ls_poly.py:30-33: gap > 3600 s
starts a new trajectory), then aggregates each segment. Generalized here for
any keyed event stream.

Two physical strategies, differential-tested to agree bit-for-bit:

- ``with_session_id``    pure window functions (lag + conditional cumulative
                         sum). Stays entirely in the JVM / whole-stage codegen;
                         one shuffle on the key. This is the hot path.
- ``sessionize_pandas``  grouped-map ``applyInPandas`` — the literal Spark
                         translation of the reference's per-key process-pool
                         worker (U5, duckdb_construct_trajs_stops.py:191-206).
                         Arrow-batched; kept as the extension point for session
                         logic too stateful for window functions (the
                         reference's stop-merge/concave-hull phases live here
                         in a geo deployment).

At 100 TB: both plans shuffle once on the key; skewed keys are handled by
AQE for the window variant. Session assignment is per-key sequential by
nature — a mega-key's sort is the floor cost either way.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _epoch_s(col):
    """Seconds-since-epoch for TIMESTAMP and TIMESTAMP_NTZ alike (session TZ
    is pinned to UTC in session.py, so NTZ -> TZ is lossless)."""
    return col.cast("timestamp").cast("long")


def with_session_id(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign ``session_seq`` (0-based per key) via gap splitting.

    A new session starts when the gap to the previous event (per key, ordered
    by ``ts_col`` then ``tiebreak``) exceeds ``gap_seconds``. Deterministic
    given a total order; pass ``tiebreak`` (e.g. the event id) when timestamps
    can tie.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = _epoch_s(F.col(ts_col)) - _epoch_s(prev_ts)
    new_session = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """One row per (key, session): start/end/duration/n_events (+sum of value).

    The analog of the reference's per-segment Traj/Stop emission (ts_start,
    ts_end, aggregates over member points).
    """
    with_ids = with_session_id(df, key, ts_col, gap_seconds, tiebreak)
    aggs = [
        F.min(ts_col).alias("ts_start"),
        F.max(ts_col).alias("ts_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    out = with_ids.groupBy(key, "session_seq").agg(*aggs)
    return out.withColumn(
        "duration_s", _epoch_s(F.col("ts_end")) - _epoch_s(F.col("ts_start"))
    )


def sessionize_pandas(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """``applyInPandas`` sessionizer — reference-shaped per-key worker (U1/U5).

    Produces exactly the same rows as ``with_session_id`` (differential test
    in tests/test_sessionize.py). Vectorized inside the group: numpy cumsum
    over the gap mask, no per-row Python.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("session_seq", T.LongType(), False)]
    )
    key_type = df.schema[key].dataType
    gap = gap_seconds

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        secs = pdf[ts_col].astype("int64") // 1_000_000_000
        new_sess = (secs.diff().fillna(gap + 1) > gap).astype("int64")
        pdf["session_seq"] = new_sess.cumsum() - 1
        return pdf

    _ = key_type  # key column passes through pdf unchanged
    return df.groupBy(key).applyInPandas(fn, schema=out_schema)


def suppress_consecutive_duplicates(
    df: DataFrame,
    key: str,
    order_cols: Iterable[str],
    value_col: str,
) -> DataFrame:
    """Run-length suppression (W3): keep a row only when ``value_col`` differs
    from the previous row's value within the key's ordered stream.

    Reference: consecutive-duplicate cell suppression in linecover
    (core/cellstring_utils.py:121-133).
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn("_prev", prev)
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(value_col)))
        .drop("_prev")
    )
