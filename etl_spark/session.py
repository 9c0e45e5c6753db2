"""SparkSession factory with scale-appropriate defaults.

Local mode is a stand-in for a multi-executor cluster: every knob below is
chosen so the same code runs unmodified via ``spark-submit --py-files`` on a
real cluster (AQE on, Arrow on, UTC, shuffle partitions ~ cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so the
    bench harness can run the identical job at two parallelism levels — the
    sandbox evidence for the N -> 4N executor scaling criterion.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing note: coalescePartitions.minPartitionNum is GONE in
        # Spark 4 (probed: set-but-ignored under parallelismFirst true AND
        # false), so there is no session-level floor on post-AQE reduce
        # width. The default parallelismFirst=true targets ~defaultParallelism
        # uniform partitions (~1 wave), which is acceptable for catalog
        # queries; the replay hot path needs ~4 waves for straggler
        # smoothing and gets them via an explicit repartition(4 x n_buckets)
        # (lake/table.py arranged_updates) — repartition-by-number shuffles
        # are never AQE-coalesced.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
