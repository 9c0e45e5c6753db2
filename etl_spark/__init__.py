"""etl_spark — a PySpark-native CDC / incremental-ingest engine.

Generalizes the reference's staging pattern (raw tail -> cleaned ->
keyed upsert; see /root/reference/src/db_setup/duckdb/create_duckdb_points.py)
into a lakehouse ingest pipeline over a binlog/WAL-style change stream of
``(repo, path, commit, lang, content)`` source-code events:

- ``etl_spark.datagen``      deterministic distributed change-stream generator
- ``etl_spark.sources``      segment discovery + watermark filtering
- ``etl_spark.functions``    vectorized (JVM / pandas-Arrow) column functions
- ``etl_spark.operators``    dedupe / sessionize / similarity / text analysis
- ``etl_spark.lake``         parquet-backed snapshot table with atomic commits
                             (Iceberg-shaped: manifests, MERGE, schema evolution)
- ``etl_spark.checkpoint``   per-epoch / per-partition lineage log
- ``etl_spark.pipeline``     the end-to-end replay pipeline
- ``etl_spark.streaming``    Structured Streaming front-end (foreachBatch)

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable semantics.
"""

__version__ = "0.1.0"
