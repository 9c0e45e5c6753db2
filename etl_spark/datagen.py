"""Deterministic, distributed change-stream generator.

Synthesises the binlog/WAL-style stream of source-code change events
``(repo, path, commit, lang, content)`` mandated by the input hint. Mirrors the
reference's file-per-segment layout (``aisdk-YYYY-MM-DD.pq``; see
/root/reference/src/db_setup/duckdb/create_duckdb_points.py:15,26-41) as
``epoch=NNNN`` parquet segments.

Scale-critical design: every column is a pure JVM-side function of the event id
(``spark.range`` + xxhash64), so generation is fully distributed and
deterministic — no driver-side loops, no Python in the hot path. The same code
generates 10^4 rows for tests and 10^10 rows on a cluster.

Stream properties (per FIXTURES.md):
- ``commit`` = ``c{lsn:012d}``: globally monotone, zero-padded — lexicographic
  order == replay (LSN) order, making the dedupe tiebreak total (SURVEY §7.3 R2).
- repo sizes follow a power law (one mega-repo) to exercise skew handling.
- ~``dup_pct``% of events are exact re-deliveries (same key+commit) to
  exercise idempotence, mirroring the reference's duplicate AIS rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Deliberately denormalized lang labels (exercises vectorized normalize_lang).
LANGS = ["Python", "py", "PYTHON", "Rust", "rs", "go", "Go", "c++", "cpp", ""]
LANG_EXT = {
    "Python": "py", "py": "py", "PYTHON": "py",
    "Rust": "rs", "rs": "rs",
    "go": "go", "Go": "go",
    "c++": "cpp", "cpp": "cpp",
    "": "txt",
}


def _u(col, seed: int):
    """Uniform [0,1) derived from a column via xxhash64 — deterministic."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1_000_000_000)) / 1_000_000_000.0)


def change_stream(
    spark: SparkSession,
    n_events: int,
    *,
    n_repos: int = 100,
    paths_per_repo: int = 200,
    skew: float = 3.0,
    dup_pct: int = 5,
    delete_pct: int = 0,
    events_per_epoch: int | None = None,
    seed: int = 42,
    with_metadata_from_epoch: int | None = None,
) -> DataFrame:
    """Build the change-event DataFrame.

    Columns: epoch int, lsn long, repo, path, commit, lang, content (+ optional
    additive ``metadata`` from ``with_metadata_from_epoch`` on — the
    schema-evolution fixture, FIXTURES.md §4).

    ``delete_pct`` > 0 adds a WAL-style ``op`` column ('u' upsert / 'd'
    delete): a deterministic ~delete_pct% of events are DELETEs carrying only
    the key + commit (content/lang/metadata NULL, as in a real binlog delete
    record). A later upsert to the same key re-creates it — ordering is
    arbitrated by commit like any change.
    """
    if events_per_epoch is None:
        events_per_epoch = max(1, n_events // 4)

    base = spark.range(0, n_events).withColumnRenamed("id", "lsn")
    # Power-law repo choice: u^skew concentrates mass at repo 0 (the mega-repo).
    repo_idx = F.floor(F.pow(_u(F.col("lsn"), seed + 1), F.lit(skew)) * n_repos).cast("int")
    path_idx = F.pmod(F.xxhash64(F.col("lsn"), F.lit(seed + 2)), F.lit(paths_per_repo))
    lang_idx = F.pmod(F.xxhash64(F.col("lsn"), F.lit(seed + 3)), F.lit(len(LANGS))).cast("int")
    lang_arr = F.array(*[F.lit(x) for x in LANGS])
    ext_arr = F.array(*[F.lit(LANG_EXT[x]) for x in LANGS])

    df = (
        base.withColumn("epoch", (F.col("lsn") / events_per_epoch).cast("int"))
        .withColumn("repo", F.format_string("repo_%04d", repo_idx))
        .withColumn("lang", F.element_at(lang_arr, lang_idx + 1))
        .withColumn(
            "path",
            F.format_string(
                "dir%d/file_%05d.%s",
                F.pmod(path_idx, F.lit(7)).cast("int"),
                path_idx.cast("int"),
                F.element_at(ext_arr, lang_idx + 1),
            ),
        )
        .withColumn("commit", F.format_string("c%012d", F.col("lsn")))
    )
    body = F.repeat(
        F.concat(F.md5(F.concat_ws("/", "repo", "path", "commit")), F.lit("\n")),
        (F.pmod(F.xxhash64(F.col("lsn"), F.lit(seed + 4)), F.lit(8)) + 1).cast("int"),
    )
    df = df.withColumn(
        "content",
        F.concat(F.format_string("// %s/%s@%s\n", "repo", "path", "commit"), body),
    )
    if with_metadata_from_epoch is not None:
        df = df.withColumn(
            "metadata",
            F.when(
                F.col("epoch") >= with_metadata_from_epoch,
                F.format_string('{"gen":%d,"rev":1}', F.col("lsn")),
            ),
        )

    if delete_pct > 0:
        is_del = (
            F.pmod(F.xxhash64(F.col("lsn"), F.lit(seed + 6)), F.lit(100))
            < delete_pct
        )
        df = df.withColumn("op", F.when(is_del, F.lit("d")).otherwise(F.lit("u")))
        # binlog delete records carry only the key + order: payload columns
        # are NULL, exactly what a MySQL/Postgres WAL delete row looks like
        null_s = F.lit(None).cast("string")
        payload = ["lang", "content"] + (
            ["metadata"] if with_metadata_from_epoch is not None else []
        )
        for c in payload:
            df = df.withColumn(c, F.when(is_del, null_s).otherwise(F.col(c)))

    # Exact re-deliveries: a deterministic subset of rows appears twice in the
    # SAME epoch (at-least-once delivery); replay must stay idempotent.
    dups = df.where(F.pmod(F.xxhash64(F.col("lsn"), F.lit(seed + 5)), F.lit(100)) < dup_pct)
    return df.unionByName(dups)


def write_segments(df: DataFrame, out_dir: str, files_per_epoch: int = 16) -> None:
    """Write the stream as epoch-partitioned parquet segments (binlog layout).

    Each epoch is split into ``files_per_epoch`` files (a real binlog segment
    is many files/row-groups): a single file per epoch caps the replay scan at
    one task per epoch no matter how many executors exist — the classic
    unsplittable-input scaling ceiling.
    """
    (
        df.repartition(
            F.col("epoch"), F.pmod(F.col("lsn"), F.lit(files_per_epoch))
        )
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(out_dir)
    )
