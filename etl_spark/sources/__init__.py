from etl_spark.sources.dims import (
    broadcast_enrich,
    lang_ecosystem_dim,
    load_json_dim,
)
from etl_spark.sources.segments import Segment, discover_segments, pending_segments

__all__ = [
    "Segment",
    "discover_segments",
    "pending_segments",
    "lang_ecosystem_dim",
    "load_json_dim",
    "broadcast_enrich",
]
