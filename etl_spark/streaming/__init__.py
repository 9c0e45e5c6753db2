from etl_spark.streaming.ingest import stream_ingest
from etl_spark.streaming.state import sessionize_stream

__all__ = ["stream_ingest", "sessionize_stream"]
