from etl_spark.lake.table import SnapshotTable

__all__ = ["SnapshotTable"]
