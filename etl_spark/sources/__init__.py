from etl_spark.sources.segments import Segment, discover_segments, pending_segments

__all__ = ["Segment", "discover_segments", "pending_segments"]
