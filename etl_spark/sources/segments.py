"""Binlog-segment discovery and watermark filtering.

Generalizes the reference's file discovery + name-pattern parse + file-level
watermark (S1/F5 in SURVEY §2.1/§2.2; reference
create_duckdb_points.py:15,19-59): ``rglob`` + regex date parse + "keep files
strictly newer than the watermark, within the requested window".

Here a segment is an ``epoch=NNNN`` directory of parquet files; the epoch
number is the LSN-aligned micro-batch id. Discovery is a driver-side directory
listing (cheap: one entry per segment, not per row) — the actual data read is
``spark.read.parquet`` on the selected directories, so partition pruning and
columnar pushdown are preserved.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path

_EPOCH_RE = re.compile(r"^epoch=(\d+)$")


@dataclass(frozen=True, order=True)
class Segment:
    epoch: int
    path: str


def discover_segments(root: str) -> list[Segment]:
    """List epoch segments under ``root``, ordered by epoch number."""
    out: list[Segment] = []
    rootp = Path(root)
    if not rootp.exists():
        return out
    for child in rootp.iterdir():
        m = _EPOCH_RE.match(child.name)
        if m and child.is_dir():
            out.append(Segment(int(m.group(1)), str(child)))
    return sorted(out)


def pending_segments(
    root: str,
    applied_epochs: set[int],
    *,
    min_epoch: int | None = None,
    max_epoch: int | None = None,
) -> list[Segment]:
    """Segments not yet applied, optionally restricted to a window.

    The reference filters files by ``file_date > watermark`` and a date range
    (create_duckdb_points.py:44-59). We use set-membership rather than a
    high-water mark so out-of-order segment arrival is tolerated; the
    exactly-once gate is the applied-epoch set in the table snapshot.
    """
    segs = discover_segments(root)
    out = []
    for s in segs:
        if s.epoch in applied_epochs:
            continue
        if min_epoch is not None and s.epoch < min_epoch:
            continue
        if max_epoch is not None and s.epoch > max_epoch:
            continue
        out.append(s)
    return out
