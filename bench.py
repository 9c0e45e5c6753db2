"""Benchmark harness — prints ONE JSON line for the driver.

Two legs:
1. **CDC replay** (the headline metric): generate a deterministic synthetic
   change stream (datagen, all-JVM) sized to the scale factor, replay it
   end-to-end (clean -> dedupe -> exactly-once merge + lineage) into a temp
   table, report change-events/sec applied.
2. **Headline queries** over ``$SPARK_GRAFT_SF_DIR`` (default
   /root/testdata/sf0.1): one per operator family, timed individually.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (session.py reads the latter).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

from etl_spark.datagen import change_stream, write_segments
from etl_spark.pipeline import IngestPipeline
from etl_spark.session import get_spark

BENCH_QUERIES = [
    "cdc_current_state",
    "w1_latest",
    "w1_latest_salted",
    "sessionize",
    "j6_star_revenue",
    "tpch_q1",
    "dedup_exact",
    "minhash_lsh",
    "dedup_components",
    "ngram_jaccard",
    "decontaminate",
    "repetition_stats",
    "pack_sequences",
    "corpus_pipeline",
    "corpus_sample",
    "ann_topk",
    "simhash_pairs",
    "hier_cover",
    # round-5 continuation: literal spatial layer — one pure-codegen leg
    # (tile+quadkey agg, zero UDF), one Arrow-UDF traversal leg, and the
    # literal 5-phase sessionization (grouped-map state machine)
    "geo_quadkey",
    "geo_linecover",
    "geo_sessionize",
]

# Replay-leg sizing: events per unit scale factor (sf0.1 -> 1M events).
REPLAY_EVENTS_PER_SF = 10_000_000
REPLAY_EPOCHS = 4


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _sparse_epoch_case(
    spark, n_events: int, *, scattered: bool, merge_mode: str | None = None,
    read_count: bool = True, read_path_probes: bool = False,
    autocompact: bool = False,
) -> dict:
    """Steady-state CDC cost: bootstrap a table, then apply ONE small delta.

    ``scattered=False``: a burst of commits to ~50 keys of one repo (activity
    clustered in few repos) — bucket pruning alone keeps the rewrite small.
    ``scattered=True``: the adversarial shape — delta keys uniform over the
    whole key domain, touching (nearly) every bucket. File-level pruning is
    what keeps THIS case sub-linear: with multiple key-ranged files per
    bucket (emulated via a small target_file_rows, standing in for the
    thousands of files a 100-TB bucket holds), only files whose range
    intersects a delta key are rewritten; the report's files_pruned /
    files_rewritten split is the direct measurement.

    ``merge_mode="mor"``: the delta lands as merge-on-read delta files —
    bytes written are O(delta rows) instead of O(touched files x
    target_file_rows); ``read_sec`` then measures the fold-on-read cost.
    """
    root = tempfile.mkdtemp(prefix="etl_spark_sparse_")
    try:
        base = change_stream(spark, n_events, n_repos=max(100, n_events // 10_000),
                             events_per_epoch=n_events, dup_pct=0)
        write_segments(base, f"{root}/stream")
        pipe = IngestPipeline(
            spark, f"{root}/table", n_buckets=256, count_input=False,
            target_file_rows=8, max_files_per_bucket=64,
            merge_mode=merge_mode,
        )
        pipe.replay(f"{root}/stream", mode="catchup")
        table_files = len(pipe.table.files())

        if scattered:
            delta = change_stream(
                spark, max(1, n_events // 1000),
                n_repos=max(100, n_events // 10_000), skew=1.0,
                events_per_epoch=n_events, dup_pct=0,
            )
        else:
            delta = change_stream(
                spark, n_events // 100, n_repos=1, paths_per_repo=5,
                events_per_epoch=n_events, dup_pct=0,
            )
        delta = (
            delta.withColumn("lsn", F.col("lsn") + n_events)
            .withColumn("commit", F.format_string("c%012d", F.col("lsn")))
        )
        # NB: epoch comes from the partition directory; writing it as a data
        # column too would collide on the partition-discovering read.
        (delta.drop("epoch").repartition(4).write.mode("overwrite")
              .parquet(f"{root}/stream/epoch=1"))
        if autocompact:
            # the post-commit maintenance round-trip (VERDICT r4 #3): drop
            # the debt threshold under this delta's size so the commit
            # itself crosses it, fires the fold, and `seconds` records the
            # full amortized write (MOR commit + debt fold); read_sec then
            # measures the restored clean-base read
            pipe.table.compact_after_commit = "auto"
            pipe.table.fold_broadcast_rows = max(2, n_events // 1000)
        v_before = pipe.table.current_version()
        t0 = time.time()
        stats = pipe.replay(f"{root}/stream")
        secs = time.time() - t0
        c = stats[0].commit
        rows_key = "rows_after"
        lookup_s = feed_s = None
        if read_path_probes:
            # Read-side sublinearity probes (VERDICT r4 #4): at the soak's
            # 10x file count, a point lookup must stay O(candidate files of
            # one bucket) and the change feed O(new files since v_before),
            # not O(table files). Untimed key pick, then timed probes.
            probe = delta.select("repo", "path").orderBy("repo", "path").first()
            t0 = time.time()
            pipe.table.lookup(probe["repo"], probe["path"]).collect()
            lookup_s = round(time.time() - t0, 2)
            t0 = time.time()
            feed_rows = pipe.table.changes_between(v_before).count()
            feed_s = round(time.time() - t0, 2)
        if read_count:
            t0 = time.time()
            rows_after = pipe.table.read().count()
            read_s = round(time.time() - t0, 2)
        else:
            # soak-sized fixtures skip the full-table read to bound bench
            # wall time. Manifest file-row sums OVERCOUNT under MOR (delta
            # rows shadow base rows), so the value goes out under a
            # DIFFERENT key than the exact counts — no reader can mistake
            # one for the other.
            rows_key = "manifest_rows"
            rows_after = sum(f["rows"] for f in pipe.table.files())
            read_s = None
        return {
            "delta_events": c.get("staged_rows"),
            "seconds": round(secs, 2),
            "mode": c.get("mode", "cow"),
            **(
                {"auto_modes": c["auto_modes"]} if "auto_modes" in c else {}
            ),
            "table_files": table_files,
            "buckets_touched": len(c.get("rewritten_buckets", [])),
            "files_rewritten": c.get("files_rewritten"),
            "files_pruned": c.get("files_pruned"),
            "files_carried": c.get("carried_files"),
            "delta_files": c.get("delta_files", 0),
            # headline write volume matches what `seconds` timed: the merge
            # commit PLUS (for autocompact rows) the post-commit debt fold —
            # otherwise the amortized row would pair fold-inclusive wall
            # time with delta-only bytes, understating the cost it exists
            # to measure. The fold-only share is in post_compact below.
            "bytes_written": sum(
                f.get("bytes", 0) for f in c.get("new_files", [])
            ) + c.get("post_compact", {}).get("bytes_written", 0),
            rows_key: rows_after,
            "read_sec": read_s,
            **(
                {
                    "lookup_sec": lookup_s,
                    "feed_sec": feed_s,
                    "feed_rows": feed_rows,
                }
                if read_path_probes else {}
            ),
            **(
                {
                    "post_compact": {
                        k: c["post_compact"].get(k)
                        for k in ("compacted_buckets", "selective_buckets",
                                  "base_files_skipped", "files_before",
                                  "files_after", "delta_rows_before",
                                  "bytes_written")
                    } if "post_compact" in c else None,
                    # a swallowed best-effort fold must be VISIBLE here:
                    # without it, post_compact=null is ambiguous between
                    # "hook never fired" and "fold raised", and `seconds`
                    # would silently measure a commit without the fold the
                    # row claims to amortize
                    **(
                        {"post_compact_skipped": c["post_compact_skipped"]}
                        if "post_compact_skipped" in c else {}
                    ),
                }
                if autocompact else {}
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_sparse_epoch(spark, n_events: int) -> dict:
    return {
        # explicit COW: these two are the round-2+ comparability rows; the
        # table default is "auto" since round 5, which would silently turn
        # them into duplicates of the *_auto rows below
        "clustered": _sparse_epoch_case(
            spark, n_events, scattered=False, merge_mode="cow"
        ),
        "scattered": _sparse_epoch_case(
            spark, n_events, scattered=True, merge_mode="cow"
        ),
        # the round-2 scale risk, closed: same adversarial delta via MOR
        "scattered_mor": _sparse_epoch_case(
            spark, n_events, scattered=True, merge_mode="mor"
        ),
        # merge_mode="auto" must match best-of-both: the clustered delta
        # should commit like COW (no read debt), the scattered one like MOR
        # (bytes written O(delta rows)). Detail-only rows — the headline
        # total keeps the same keys as rounds 2-3 for comparability.
        "clustered_auto": _sparse_epoch_case(
            spark, n_events, scattered=False, merge_mode="auto"
        ),
        # read_path_probes here give the 1x points (lookup_sec/feed_sec)
        # that pair with the 10x soak row's — the read-side sublinearity
        # claim is two-point like the commit-side one
        "scattered_auto": _sparse_epoch_case(
            spark, n_events, scattered=True, merge_mode="auto",
            read_path_probes=True,
        ),
        # compact_after_commit="auto" round-trip (detail row): same
        # scattered MOR delta, debt threshold forced under the delta size
        # so the commit pays the fold inline; read_sec shows the clean base
        "scattered_autocompact": _sparse_epoch_case(
            spark, n_events, scattered=True, merge_mode="mor",
            autocompact=True,
        ),
    }


def bench_dedup_index(spark, n_events: int) -> dict:
    """Dedup-at-ingest steady state: bootstrap a corpus WITH the
    incremental LSH index (untimed), then time ONE sparse delta commit
    including index maintenance + new-pair detection. The delta-only cost
    is the O(commit footprint) claim; the bootstrap second records the
    bulk shape (per-epoch cost ~ batch LSH over the epoch, by design)."""
    root = tempfile.mkdtemp(prefix="etl_spark_dedupidx_")
    try:
        n = max(10_000, n_events // 10)
        base = change_stream(spark, n, n_repos=max(100, n // 10_000),
                             events_per_epoch=n, dup_pct=0)
        write_segments(base, f"{root}/stream")
        pipe = IngestPipeline(
            spark, f"{root}/table", n_buckets=64, count_input=False,
            maintain_dedup_index=True,
        )
        t0 = time.time()
        pipe.replay(f"{root}/stream", mode="catchup")
        boot_s = round(time.time() - t0, 2)
        delta = change_stream(spark, 300, n_repos=max(100, n // 10_000),
                              events_per_epoch=n, dup_pct=0)
        delta = (
            delta.withColumn("lsn", F.col("lsn") + n)
            .withColumn("commit", F.format_string("c%012d", F.col("lsn")))
        )
        (delta.drop("epoch").repartition(2).write.mode("overwrite")
              .parquet(f"{root}/stream/epoch=1"))
        t0 = time.time()
        stats = pipe.replay(f"{root}/stream")
        sparse_s = round(time.time() - t0, 2)
        return {
            "bootstrap_events": n,
            "bootstrap_sec": boot_s,
            "sparse_delta_events": 300,
            "sparse_sec": sparse_s,
            "new_pairs": stats[0].extra.get("near_dup_pairs"),
            "band_rows": sum(
                f["rows"] for f in pipe.dedup_index.bands.files()
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_soak_10x(spark, n_events: int) -> dict:
    """The two-point sublinearity soak (VERDICT r3 #8): the SAME scattered
    sparse-epoch shape at 10x the events — ~10x the table files (~123k at
    the driver's sf0.1) — so files_pruned / files_rewritten / bytes_written
    can be read against the 1x row and checked for O(delta), not O(table),
    growth. One case only (scattered, merge_mode=auto: the default-policy
    path a production table would take) to bound bench wall time."""
    return {
        "scattered_auto_10x": _sparse_epoch_case(
            spark, n_events * 10, scattered=True, merge_mode="auto",
            read_count=False, read_path_probes=True,
        ),
    }


def bench_mirror(spark, n_events: int) -> dict:
    """Replication steady state: bootstrap a source + mirror (untimed),
    land ONE sparse delta epoch on the source, then time the incremental
    ``Mirror.sync`` — the O(changed-data) claim for the consumer path:
    cost must track the delta (one feed read + one arranged commit on the
    mirror), never the table."""
    from etl_spark.replicate import Mirror

    root = tempfile.mkdtemp(prefix="etl_spark_mirror_")
    try:
        n = max(10_000, n_events // 10)
        base = change_stream(spark, n, n_repos=max(100, n // 10_000),
                             events_per_epoch=n, dup_pct=0)
        write_segments(base, f"{root}/stream")
        pipe = IngestPipeline(spark, f"{root}/table", n_buckets=64,
                              count_input=False)
        pipe.replay(f"{root}/stream", mode="catchup")
        mir = Mirror(spark, pipe.table, f"{root}/replica")
        t0 = time.time()
        mir.sync()  # bootstrap resync (full source read)
        boot_s = round(time.time() - t0, 2)
        delta = change_stream(spark, 300, n_repos=max(100, n // 10_000),
                              events_per_epoch=n, dup_pct=0)
        delta = (
            delta.withColumn("lsn", F.col("lsn") + n)
            .withColumn("commit", F.format_string("c%012d", F.col("lsn")))
        )
        (delta.drop("epoch").repartition(2).write.mode("overwrite")
              .parquet(f"{root}/stream/epoch=1"))
        pipe.replay(f"{root}/stream")
        t0 = time.time()
        out = mir.sync()
        sync_s = round(time.time() - t0, 2)
        return {
            "bootstrap_events": n,
            "bootstrap_sync_sec": boot_s,
            "sparse_delta_events": 300,
            "incremental_sync_sec": sync_s,
            "incremental_was_full_resync": "full_resync" in out,
            "replica_rows_written": out.get("rows_written"),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_replay(spark, n_events: int) -> dict:
    """Gen + full replay on a temp root; returns throughput stats.

    A small throwaway replay runs first (untimed, own temp root) so the
    timed run measures the merge path, not its JIT/codegen warm-up — the
    same real-code-path warm-up the scaling bench uses
    (tools/scaling_bench.py). Cold-vs-warm is a ~1.6× swing on this path
    (first-in-JVM 100k events/s vs 165k warm at sf0.1/32 cores).
    """
    warm = tempfile.mkdtemp(prefix="etl_spark_bench_warm_")
    try:
        w_events = max(10_000, n_events // 50)
        write_segments(
            change_stream(spark, w_events, n_repos=100, events_per_epoch=w_events),
            f"{warm}/stream",
        )
        IngestPipeline(
            spark, f"{warm}/table", n_buckets=64, count_input=False
        ).replay(f"{warm}/stream")
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="etl_spark_bench_")
    try:
        stream = change_stream(
            spark, n_events, n_repos=max(100, n_events // 10_000),
            events_per_epoch=max(1, n_events // REPLAY_EPOCHS),
        )
        t0 = time.time()
        write_segments(stream, f"{root}/stream")
        gen_s = time.time() - t0

        pipe = IngestPipeline(spark, f"{root}/table", n_buckets=64, count_input=False)
        t0 = time.time()
        stats = pipe.replay(f"{root}/stream")
        replay_s = time.time() - t0
        applied = sum(s.commit.get("rows_written", 0) for s in stats)

        cat = IngestPipeline(spark, f"{root}/table_cat", n_buckets=64, count_input=False)
        t0 = time.time()
        cat.replay(f"{root}/stream", mode="catchup")
        catchup_s = time.time() - t0

        # replay again with stage-2 clean-corpus maintenance on: the delta
        # vs replay_sec is the per-commit derived-table overhead, which must
        # stay O(commit footprint), not O(table)
        cc = IngestPipeline(spark, f"{root}/table_cc", n_buckets=64,
                            count_input=False, maintain_clean_corpus=True)
        t0 = time.time()
        cc.replay(f"{root}/stream")
        clean_s = time.time() - t0
        return {
            "events_generated": n_events,
            "rows_written": applied,
            "gen_sec": round(gen_s, 2),
            "replay_sec": round(replay_s, 2),
            "events_per_sec": round(n_events / replay_s, 1),
            "catchup_sec": round(catchup_s, 2),
            "catchup_events_per_sec": round(n_events / catchup_s, 1),
            "replay_clean_sec": round(clean_s, 2),
            "clean_events_per_sec": round(n_events / clean_s, 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)
    spark = get_spark("etl_spark_bench")

    # Warm the JVM/codegen so per-query numbers measure the queries.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # extras included: round 4 moved some benched names (e.g. sessionize)
    # out of the 50-entry driver registry into extra_queries — the bench
    # keeps timing the SAME queries for round-over-round comparability
    queries = {**entry_mod.queries(), **entry_mod.extra_queries()}
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    replay = bench_replay(spark, int(REPLAY_EVENTS_PER_SF * sf))
    timings["cdc_replay"] = replay["replay_sec"]
    timings["cdc_replay_catchup"] = replay["catchup_sec"]
    timings["cdc_replay_clean"] = replay["replay_clean_sec"]
    sparse = bench_sparse_epoch(spark, int(REPLAY_EVENTS_PER_SF * sf))
    timings["cdc_sparse_epoch"] = sparse["clustered"]["seconds"]
    timings["cdc_sparse_epoch_scattered"] = sparse["scattered"]["seconds"]
    timings["cdc_sparse_epoch_scattered_mor"] = sparse["scattered_mor"]["seconds"]
    didx = bench_dedup_index(spark, int(REPLAY_EVENTS_PER_SF * sf))
    timings["dedup_index_sparse"] = didx["sparse_sec"]
    mirr = bench_mirror(spark, int(REPLAY_EVENTS_PER_SF * sf))
    timings["mirror_sync_sparse"] = mirr["incremental_sync_sec"]
    # 10x-files soak point (pruning counters at ~123k files); detail row
    # only — kept OUT of the headline total so round-over-round totals
    # stay comparable (set SPARK_GRAFT_NO_SOAK=1 to skip, e.g. sf>=1 runs)
    soak = (
        {} if os.environ.get("SPARK_GRAFT_NO_SOAK") or sf > 0.11
        else bench_soak_10x(spark, int(REPLAY_EVENTS_PER_SF * sf))
    )

    total = round(sum(timings.values()), 3)
    # Full-fidelity detail goes out FIRST (its own stdout line + stderr
    # copy); the machine-readable summary is the LAST line and kept
    # compact — round 4's driver artifact came back `parsed: null` because
    # the single summary line outgrew the driver's output-tail capture
    # window once the verbose sparse_epoch sub-objects were inlined.
    detail = {
        "metric": "bench_detail",
        "queries": timings,
        "replay": replay,
        "sparse_epoch": {**sparse, **soak},
        "dedup_index": didx,
        "mirror": mirr,
    }
    detail_line = json.dumps(detail, separators=(",", ":"))
    print(detail_line)
    print(detail_line, file=sys.stderr)
    soak_row = soak.get("scattered_auto_10x", {})
    summary = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "replay_events_per_sec": replay["events_per_sec"],
        "catchup_events_per_sec": replay["catchup_events_per_sec"],
        # two-point sublinearity headline scalars (full row in the
        # bench_detail line above)
        "soak_10x": {
            k: soak_row.get(k)
            for k in (
                "seconds", "table_files", "files_rewritten", "files_pruned",
                "bytes_written", "lookup_sec", "feed_sec",
            )
        } if soak_row else None,
    }
    # belt-and-braces: NEVER outgrow the driver's tail-capture window —
    # round 4's artifact came back parsed:null exactly this way. Drop the
    # least-essential keys in order until the line fits; everything popped
    # here survives verbatim in the bench_detail line above.
    line = json.dumps(summary, separators=(",", ":"))
    for droppable in ("soak_10x", "queries"):
        if len(line) <= 1900:
            break
        summary.pop(droppable, None)
        line = json.dumps(summary, separators=(",", ":"))
    sys.stdout.flush()
    print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
