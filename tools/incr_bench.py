"""Incremental-mode (one commit per epoch) throughput probe.

The catch-up path amortizes its fixed costs over the whole backlog; the
steady-state incremental path pays them per epoch, so it is the number to
watch for the 'one small commit per binlog segment' regime. Usage:

    python tools/incr_bench.py [events] [epochs] [cpus]

Prints one JSON line with per-epoch seconds and aggregate events/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark.datagen import change_stream, write_segments
from etl_spark.pipeline import IngestPipeline
from etl_spark.session import get_spark


def main() -> int:
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("incr_bench", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm codegen
    root = tempfile.mkdtemp(prefix="etl_incr_", dir="/dev/shm")
    try:
        stream = change_stream(
            spark, events, n_repos=max(100, events // 10_000),
            events_per_epoch=max(1, events // epochs),
        )
        write_segments(stream, f"{root}/stream")
        pipe = IngestPipeline(spark, f"{root}/table", n_buckets=64,
                              count_input=False)
        t0 = time.time()
        stats = pipe.replay(f"{root}/stream")
        secs = time.time() - t0
        print(json.dumps({
            "events": events,
            "epochs": epochs,
            "cpus": cpus,
            "per_epoch_sec": [round(s.seconds, 2) for s in stats],
            "seconds": round(secs, 2),
            "events_per_sec": round(events / secs, 1),
            "loadavg": float(open("/proc/loadavg").read().split()[0]),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
