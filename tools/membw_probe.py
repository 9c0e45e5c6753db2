"""Memory-bandwidth ceiling probe for scaling-efficiency calibration.

The north_rule's N -> 4N criterion assumes resources that scale with
executors. On a real cluster every node brings its own memory controllers,
so aggregate memory bandwidth grows with executor count. This single-socket
sandbox has ONE memory bus shared by all 32 threads — a shuffle-heavy job
(the catch-up replay moves ~2.5 GB of shuffle per 32M events plus the
parquet encode/decode traffic) saturates it well before 32 cores.

This probe measures that hardware ceiling directly, with no Spark and no
IO: each worker process streams a >LLC-sized numpy buffer (in-place add =
one read + one write per element) for a fixed per-worker byte budget;
aggregate bandwidth at N procs = total bytes / wall time. The bandwidth
scaling ceiling for a pair (N, 4N) is then

    ceiling = BW(4N) / (4 * BW(N))

i.e. the best efficiency ANY purely-bandwidth-bound job could show on this
box. Levels are interleaved across repeats and the max-bandwidth run per
level is kept (least-contended), mirroring tools/scaling_bench.py.

    python tools/membw_probe.py [--pairs 8:32] [--gb-per-proc 10]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _worker(mb: int, gb_budget: float, barrier, out) -> None:
    import numpy as np

    x = np.ones(mb * (1 << 20) // 8, dtype=np.float64)  # paged in by init
    # one pass = read + write = 2 * buffer bytes of bus traffic
    passes = max(1, int(gb_budget * (1 << 30) / (2 * x.nbytes)))
    barrier.wait(timeout=600)  # all workers start streaming together
    t0 = time.perf_counter()
    for _ in range(passes):
        x += 1.0
    out.put((2 * x.nbytes * passes, time.perf_counter() - t0))


def run_level(nproc: int, mb: int, gb_per_proc: float) -> dict:
    ctx = mp.get_context("spawn")
    # a timeout alone can't bound a PRE-barrier death (an OOM kill during
    # buffer page-in leaves the survivors parked in barrier.wait() forever,
    # and interpreter exit would join non-daemon children): the barrier
    # itself times out, workers are daemonic, and stragglers are terminated
    barrier = ctx.Barrier(nproc)
    out = ctx.Queue()
    procs = [
        ctx.Process(
            target=_worker, args=(mb, gb_per_proc, barrier, out), daemon=True
        )
        for _ in range(nproc)
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    try:
        results = [out.get(timeout=600) for _ in procs]
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()
            p.join(timeout=30)
    wall = time.perf_counter() - t0
    total_bytes = sum(r[0] for r in results)
    # aggregate over the streaming window only (max per-worker stream time
    # bounds it; wall includes spawn/page-in skew)
    stream = max(r[1] for r in results)
    return {
        "procs": nproc,
        "gb_moved": round(total_bytes / (1 << 30), 1),
        "stream_s": round(stream, 2),
        "wall_s": round(wall, 2),
        "gb_per_s": round(total_bytes / (1 << 30) / stream, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="8:32")
    ap.add_argument("--buffer-mb", type=int, default=256,
                    help="per-proc buffer; must exceed LLC so traffic hits "
                         "DRAM, small enough that 32 procs fit in RAM")
    ap.add_argument("--gb-per-proc", type=float, default=10.0)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    levels = sorted({int(c) for p in args.pairs.split(",") for c in p.split(":")})
    best: dict[int, dict] = {}
    for rep in range(args.repeats):
        for n in levels:
            r = run_level(n, args.buffer_mb, args.gb_per_proc)
            print(json.dumps({**r, "rep": rep}))
            if n not in best or r["gb_per_s"] > best[n]["gb_per_s"]:
                best[n] = r
    summary = {"pairs": []}
    for p in args.pairs.split(","):
        lo, hi = (int(x) for x in p.split(":"))
        ceiling = round(best[hi]["gb_per_s"] / (4 * best[lo]["gb_per_s"]), 3)
        summary["pairs"].append(
            {"n": lo, "four_n": hi, "gb_per_s_n": best[lo]["gb_per_s"],
             "gb_per_s_4n": best[hi]["gb_per_s"], "bw_ceiling": ceiling}
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
