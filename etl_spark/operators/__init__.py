from etl_spark.operators.dedupe import (
    latest_by_key,
    latest_by_key_salted,
    latest_by_key_window,
)

__all__ = ["latest_by_key", "latest_by_key_salted", "latest_by_key_window"]
