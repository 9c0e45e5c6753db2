"""Keyed latest-wins dedupe — the engine's hot-path operator (W1).

The reference dedupes with ``SELECT DISTINCT ON (key...) ... ORDER BY ...``
(create_duckdb_points.py:151-163; mat_points_view.py:48-56). Ours is
"latest commit wins per (repo, path)", with a total deterministic order
(monotone zero-padded commit strings; SURVEY §7.3 R2).

Three physical strategies, one semantics — tests assert they agree bit-for-bit:

- ``latest_by_key``         groupBy + max_by(struct, order). DEFAULT. Spark's
                            partial (map-side) aggregation collapses hot keys
                            on every input partition before the shuffle, so a
                            mega-repo key costs O(partitions), not O(rows) —
                            skew-immune by construction, one shuffle.
- ``latest_by_key_salted``  explicit two-phase salt split (north_rule): reduce
                            within (key, salt), then across salts. Same shuffle
                            count as the window plan but bounded reduce fan-in;
                            kept for the differential test and for engines/
                            versions where partial-agg on wide structs spills.
- ``latest_by_key_window``  row_number() over (partition by key order by commit
                            desc) — the literal W1 translation. One full
                            shuffle + per-key sort; skew-sensitive. Reference
                            semantics oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_KEYS = ("repo", "path")
DEFAULT_ORDER = "commit"


def _payload_cols(df: DataFrame, keys: tuple[str, ...]) -> list[str]:
    return [c for c in df.columns if c not in keys]


def latest_by_key(
    df: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    order_col: str = DEFAULT_ORDER,
) -> DataFrame:
    """Latest row per key via max_by — partial-agg, skew-immune, one shuffle."""
    payload = _payload_cols(df, keys)
    agged = df.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.col(order_col)).alias("_latest")
    )
    return agged.select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in payload])


def latest_by_key_salted(
    df: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    order_col: str = DEFAULT_ORDER,
    n_salts: int = 16,
) -> DataFrame:
    """Explicit salt-split two-phase reduce for hot keys.

    Phase 1 reduces within (key, salt) — the mega-repo's rows spread over
    ``n_salts`` reducers; phase 2 merges the <= n_salts survivors per key.
    Salt is derived from the order column so it is deterministic per row.
    """
    payload = _payload_cols(df, keys)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.max_by(F.struct(*payload), F.col(order_col)).alias("_latest")
    )
    phase2 = phase1.groupBy(*keys).agg(
        F.max_by(F.col("_latest"), F.col(f"_latest.{order_col}")).alias("_latest")
    )
    return phase2.select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in payload])


def probe_skew(
    df: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    sample_fraction: float = 0.01,
    min_sample: int = 10_000,
) -> dict:
    """Cheap skew probe: sampled per-key histogram -> max key share.

    The reference orders work by per-key counts to schedule heavy keys first
    (A5/P3; duckdb_construct_trajs_stops.py:76-94). ONE Spark job over a
    fixed-fraction sample: the sampled per-key counts reduce to (total,
    argmax) in the same aggregation, so the probe never runs a full-scan
    ``df.count()`` just to size itself. If the 1% sample lands under
    ``min_sample`` rows the estimate is noisy — but a second full pass is
    only paid when the noisy estimate is actually AMBIGUOUS (within the
    caller-supplied ``decide`` band); a clearly-uniform or clearly-hot small
    sample decides immediately, so the common small-batch case stays at one
    cheap job.
    """
    def agg_once(frame):
        return (
            frame.groupBy(*keys)
            .count()
            .agg(
                F.sum("count").alias("n"),
                F.max(
                    F.struct(
                        F.col("count").alias("count"),
                        F.struct(*[F.col(k) for k in keys]).alias("key"),
                    )
                ).alias("top"),
            )
            .first()
        )

    row = agg_once(df.sample(fraction=min(1.0, sample_fraction), seed=13))
    if sample_fraction < 1.0 and (row is None or (row["n"] or 0) < min_sample):
        # small sample -> noisy estimate. Only re-probe the (small) full
        # batch when the estimate is ambiguous around the 0.05 hot
        # threshold; a clear verdict (2x above / 2x below) stands.
        share = (
            row["top"]["count"] / row["n"] if row is not None and row["n"] else 0.0
        )
        if row is None or not row["n"] or 0.025 <= share <= 0.10:
            row = agg_once(df)
    if row is None or not row["n"]:
        return {"rows_sampled": 0, "max_share": 0.0, "hot_keys": []}
    top = row["top"]
    return {
        "rows_sampled": int(row["n"]),
        "max_share": top["count"] / row["n"],
        "hot_keys": [tuple(top["key"][k] for k in keys)],
    }


def choose_dedupe_strategy(
    df: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    hot_share_threshold: float = 0.05,
) -> str:
    """Pick a physical dedupe strategy from a sampled skew probe.

    A single key holding > ``hot_share_threshold`` of the stream makes the
    window plan's per-key sort a straggler -> use the salted two-phase
    reduce. Otherwise max_by (partial-agg) is the safe default.
    """
    probe = probe_skew(df, keys)
    return "salted" if probe["max_share"] > hot_share_threshold else "maxby"


def latest_by_key_window(
    df: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
    order_col: str = DEFAULT_ORDER,
) -> DataFrame:
    """Literal W1: row_number over (key, order desc) == 1.

    Tiebreak beyond ``order_col`` is unnecessary because commits are unique per
    key and re-deliveries are bit-identical rows; kept deterministic anyway by
    the total lexicographic commit order.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
