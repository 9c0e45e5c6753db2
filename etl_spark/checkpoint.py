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

    def append(self, rows: DataFrame, epoch_id: int) -> None:
        """Idempotent append: the epoch's log partition is overwritten whole."""
        (
            rows.coalesce(1)
            .write.mode("overwrite")
            .parquet(str(self.root / f"epoch={epoch_id}"))
        )

    def read(self) -> DataFrame:
        dirs = sorted(str(p) for p in self.root.glob("epoch=*"))
        if not dirs:
            return self.spark.createDataFrame([], LOG_SCHEMA)
        return self.spark.read.schema(LOG_SCHEMA).parquet(*dirs)

    def logged_epochs(self) -> set[int]:
        return {
            int(p.name.split("=")[1])
            for p in self.root.glob("epoch=*")
            if p.is_dir()
        }
