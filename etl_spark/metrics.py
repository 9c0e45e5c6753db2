"""Per-commit metrics emission (SURVEY §2.4 A4 / §7.0 metrics).

The reference instruments each stage with Δ-row counts and rate logging
(create_duckdb_points.py:133-137,179-183; db_utils.py:6-17 format_eta). Here
every snapshot commit appends one JSON line to ``<table>/_metrics.jsonl``:
epochs applied, rows/buckets written, wall seconds, events/sec. Driver-side,
append-only, cheap — greppable observability without a metrics stack;
a real deployment would also forward these to the Spark metrics sink.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any


class MetricsSink:
    def __init__(self, table_root: str) -> None:
        self.path = Path(table_root) / "_metrics.jsonl"

    def emit(self, record: dict[str, Any]) -> None:
        record = {"ts": round(time.time(), 3), **record}
        with open(self.path, "a") as fh:
            fh.write(json.dumps(record) + "\n")

    def read(self) -> list[dict[str, Any]]:
        if not self.path.exists():
            return []
        with open(self.path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
