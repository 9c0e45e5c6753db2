"""Document deduplication for training-data pipelines.

Five dedup strategies over a ``documents(doc_id, text, ...)`` table, fastest
first. All tokenization/hashing primitives are chosen to be bit-reproducible
in ANSI SQL (DuckDB oracle) so every operator is verifiable end-to-end:
md5-based hashing, deterministic word tokenization.

Scale notes (100 TB): exact/fingerprint dedupe are one shuffle on a 32-byte
hash — trivially scalable. MinHash-LSH is the scale path for near-dup: cost is
O(docs x num_hashes) map-side + a shuffle per band on 32-byte bucket keys;
candidate verification touches only colliding pairs. The all-pairs n-gram
Jaccard join is quadratic in the worst case (shared shingle hubs) and is kept
for small corpora / verification; ``stop_shingle_limit`` caps hub explosion
the same way the reference caps per-key work with batching (SURVEY P4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.functions.content import doc_fingerprint


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- tokenization / shingles (oracle-reproducible) ---------------------------

def norm_tokens(col) -> Column:
    """Lowercase, strip non-alphanumerics, split on whitespace. Empty -> []."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(_c(col), F.lit(""))), r"[^a-z0-9\s]", " ")
    )
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, r"\s+")
    )


def shingles(col, k: int = 3) -> Column:
    """Distinct word ``k``-grams (space-joined). Docs with < k tokens yield one
    shingle = the whole token string, so short docs still participate.

    The token array is let-bound through a 1-element-array transform so the
    regex tokenization runs once per row — referencing the ``norm_tokens``
    expression inside the k-gram lambda would re-tokenize the document once
    per shingle (measured ~6x slowdown at corpus scale).
    """
    def from_toks(tk):
        n = F.size(tk)
        kgrams = F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tk, i, k)),
        )
        whole = F.array(F.concat_ws(" ", tk))
        return F.array_distinct(F.when(n >= k, kgrams).otherwise(whole))

    return F.get(F.transform(F.array(norm_tokens(col)), from_toks), 0)


# --- exact / fingerprint dedupe ----------------------------------------------

def exact_dedupe(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per exact content hash (md5).

    One shuffle on the hash; min_by gets map-side partial aggregation, so a
    pathological 10^9-copy document costs O(partitions), not O(rows).
    """
    hashed = df.withColumn("_h", F.md5(F.coalesce(_c(text_col), F.lit(""))))
    keep = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return (
        hashed.join(keep, [id_col, "_h"], "left_semi")
        .drop("_h")
    )


def fingerprint_dedupe(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-exact dedupe on the normalization-stable fingerprint
    (lowercased / punctuation-stripped / whitespace-collapsed md5)."""
    hashed = df.withColumn("_h", doc_fingerprint(text_col))
    keep = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, [id_col, "_h"], "left_semi").drop("_h")


# --- n-gram Jaccard all-pairs ------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    stop_shingle_limit: int | None = 1000,
) -> DataFrame:
    """Pairs (a < b) with word-k-gram Jaccard >= threshold.

    explode -> self-join on shingle -> count common -> |A|+|B|-common.
    ``stop_shingle_limit`` drops shingles shared by more than N docs (hub
    terms) before the join — the standard guard against quadratic blowup.
    Returns (id_a, id_b, jaccard) with jaccard rounded to 6 places.
    """
    sh = (
        df.select(F.col(id_col).alias("_id"), F.explode(shingles(text_col, k)).alias("_s"))
        .distinct()
    )
    if stop_shingle_limit is not None:
        hubs = sh.groupBy("_s").count().where(F.col("count") > stop_shingle_limit)
        sh = sh.join(hubs.select("_s"), "_s", "left_anti")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# --- winnowing (rolling-hash fingerprints, MOSS-style) ------------------------

def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (Schleimer/Wilkerson/
    Aiken's MOSS algorithm): hash every word ``k``-gram, slide a ``window``
    over consecutive hashes, keep each window's MINIMUM — the classic
    guarantee that any sufficiently long match between documents shares a
    selected fingerprint, at ~1/window the density of full shingling.

    All JVM higher-order functions (transform / slice / array_min), zero
    Python; hashes are md5-derived 60-bit ints so a SQL oracle reproduces
    the selection bit-for-bit. Winnowing is POSITIONAL — unlike the
    dedupe-oriented :func:`shingles`, consecutive (non-distinct) k-grams
    feed the windows, since window adjacency is what yields the match
    guarantee. Returns distinct (id, fp) rows; empty docs yield none.
    """
    def fps_from(tk):
        # NB Spark's sequence(1, 0) DESCENDS — empty inputs need guards
        n = F.size(tk)
        kgrams = F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tk, i, k)),
        )
        hashes = F.transform(
            kgrams,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
        m = F.size(hashes)
        wins = F.transform(
            F.sequence(F.lit(1), F.greatest(m - (window - 1), F.lit(1))),
            lambda i: F.array_min(F.slice(hashes, i, window)),
        )
        return F.when(n == 0, F.array().cast("array<long>")).otherwise(
            F.array_distinct(wins)
        )

    # let-bind the token array (regex-heavy) so it evaluates once per row
    fps = F.get(F.transform(F.array(norm_tokens(text_col)), fps_from), 0)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(fps).alias("fp"))
        .distinct()
    )


# --- MinHash + LSH -----------------------------------------------------------

MINHASH_PRIME = (1 << 31) - 1  # Mersenne prime; Carter-Wegman modulus


def minhash_affine_consts(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic per-seed Carter-Wegman constants (a, b), md5-derived.

    h_i(x) = (a_i*x + b_i) mod p on Z_p with p = 2^31-1: a in [1, p-1],
    b in [0, p-1], x < p, so a*x + b < 2^62 — no int64 overflow in either
    Spark (ANSI) or DuckDB — while the product wraps p up to ~2^31 times,
    which is what makes each seed an (approximately min-wise) independent
    pseudo-permutation. NB: the seeds must act on the FULL key, not split
    halves — an affine map over (lo, hi) halves makes every per-seed argmin
    a lower-convex-hull vertex of the doc's (lo, hi) point set, correlating
    the seeds and inflating Jaccard estimates (measured: 3x the pairs at
    the same threshold).
    """
    import hashlib

    out = []
    for i in range(num_hashes):
        d = hashlib.md5(f"minhash|{i}".encode()).digest()
        a = int.from_bytes(d[0:8], "big") % (MINHASH_PRIME - 1) + 1
        b = int.from_bytes(d[8:16], "big") % MINHASH_PRIME
        out.append((a, b))
    return out


def _minhash_key(s: Column) -> Column:
    """Shingle key on Z_p: 60-bit md5 prefix reduced mod p
    (== DuckDB ('0x'||substr(md5,1,15))::UBIGINT % p)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % F.lit(
        MINHASH_PRIME
    )


def _affine(a: int, b: int):
    """1-ary lambda x -> (a*x + b) mod p (factory: a closure default-arg
    inside F.transform silently binds the array index)."""

    def f(x):
        return (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_PRIME)

    return f


def minhash_signature(col, num_hashes: int = 16, k: int = 3) -> Column:
    """MinHash signature as an array of ``num_hashes`` longs on Z_(2^31-1).

    One md5 per shingle (60-bit prefix reduced mod p), then ``num_hashes``
    seeded Carter-Wegman transforms (a_i*x + b_i) mod p — each seed orders
    shingles pseudo-randomly, so the per-seed min is a valid MinHash (the
    same family Spark MLlib's MinHashLSH uses). md5-derived keys and literal
    constants keep it bit-reproducible in a SQL oracle. (The previous family
    hashed every shingle once PER SEED — 16x the md5 work and 32-byte string
    mins; this one is ~2x faster end-to-end and shuffles 8-byte longs.)
    """
    sh = shingles(col, k)
    consts = minhash_affine_consts(num_hashes)

    # Let-binding via a 1-element array: binds the *evaluated* shingle/key
    # arrays to a lambda variable so the regex-heavy shingle expression and
    # the md5 keys run ONCE per row — Catalyst does not CSE across the
    # num_hashes otherwise. (NB: every lambda takes exactly one arg —
    # F.transform passes the array index to 2-ary callables.)
    def sig_from_keys(hv):
        return F.array(
            *[F.array_min(F.transform(hv, _affine(a, b))) for a, b in consts]
        )

    def sig_from(shv):
        hv = F.transform(shv, _minhash_key)
        return F.get(F.transform(F.array(hv), sig_from_keys), 0)

    return F.get(F.transform(F.array(sh), sig_from), 0)


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """(id, sig) signatures via explode + min-aggregates — the scale path.

    Identical signatures to ``minhash_signature`` (same affine family over
    the same md5 shingle keys) but computed as ``explode ->
    groupBy(id).agg(min(affine_i))``: every expression stays inside
    whole-stage codegen and the min aggregates get map-side partial
    aggregation, vs. the interpreted per-element lambda evaluation of array
    higher-order functions (~10x faster at corpus scale, one shuffle
    carrying only num_hashes x 8-byte partials per doc).
    """
    ex = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles(text_col, k)).alias("_s")
    ).select("_id", _minhash_key(F.col("_s")).alias("_x"))
    aggs = [
        F.min((F.lit(a) * F.col("_x") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"_h{i}"
        )
        for i, (a, b) in enumerate(minhash_affine_consts(num_hashes))
    ]
    return (
        ex.groupBy("_id")
        .agg(*aggs)
        .select(
            "_id",
            F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 4,
    k: int = 3,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    Signature split into ``num_hashes/band_size`` bands; docs sharing any
    band's md5(bucket) collide. Candidates are then verified with estimated
    Jaccard = fraction of agreeing signature positions (>= verify_threshold,
    skipped if None). Shuffle cost: one explode x num_bands + a self-join on
    32-byte band keys — no all-pairs stage.
    """
    assert num_hashes % band_size == 0
    n_bands = num_hashes // band_size
    sig = minhash_signature_table(df, text_col, id_col, num_hashes, k)
    bands = sig.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.slice(
                                    F.col("_sig"), b * band_size + 1, band_size
                                ).cast("array<string>"),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_bb"),
    ).select("_id", "_sig", "_bb.band", "_bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sig").alias("_sa"),
            F.col("b._sig").alias("_sb"),
        )
        .distinct()
    )
    est = cand.withColumn(
        "est_jaccard",
        F.round(
            F.size(
                F.filter(
                    F.zip_with(F.col("_sa"), F.col("_sb"), lambda x, y: x == y),
                    lambda eq: eq,
                )
            )
            / F.lit(float(num_hashes)),
            6,
        ),
    ).select("id_a", "id_b", "est_jaccard")
    if verify_threshold is not None:
        est = est.where(F.col("est_jaccard") >= verify_threshold)
    return est


# --- SimHash -----------------------------------------------------------------

@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over normalized word tokens — Arrow-batched, fully
    vectorized: tokens are deduplicated per doc via one exploded
    drop_duplicates, the BATCH vocabulary is factorized, and md5 runs once
    per distinct token in the batch (VERDICT r4 #8 — the old version
    re-hashed every token of every doc). Vote accumulation and the sign
    fold are pure numpy.

    Token hash = first 8 bytes of md5 (stable across platforms). Each
    distinct token of a doc votes +1/-1 per bit; the sign vector is the
    fingerprint. Near-dups have small Hamming distance. Signed 64-bit (top
    bit folded) to stay in LongType. Bit-exact vs the round-2 per-token
    implementation (golden fixture + DuckDB oracle unchanged).
    """
    import hashlib

    import numpy as np

    norm = (
        text.fillna("")
        .str.lower()
        .str.replace(r"[^a-z0-9\s]", " ", regex=True)
        .str.strip()
        .str.split(r"\s+", regex=True)
    ).reset_index(drop=True)
    n = len(norm)
    fp = np.zeros(n, dtype=np.uint64)
    ex = norm.explode()
    ex = ex[ex.notna() & (ex != "")]
    if len(ex):
        pairs = pd.DataFrame(
            {"doc": ex.index.to_numpy(), "tok": ex.to_numpy()}
        ).drop_duplicates()
        codes, vocab = pd.factorize(pairs["tok"], sort=False)
        vh = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in vocab
            ),
            dtype=np.uint64,
            count=len(vocab),
        )
        bit_idx = np.arange(64, dtype=np.uint64)
        # vocab x 64 matrix of +1/-1 bit votes, gathered per (doc, token)
        contrib = (
            ((vh[:, None] >> bit_idx) & np.uint64(1)).astype(np.int8) * 2 - 1
        )
        votes = np.zeros((n, 64), dtype=np.int64)
        np.add.at(votes, pairs["doc"].to_numpy(), contrib[codes])
        for i in range(64):
            fp |= (votes[:, i] > 0).astype(np.uint64) << np.uint64(i)
        # token-less docs never vote: their row stays all-zero -> fp 0,
        # matching the old empty-doc special case
    return pd.Series(fp.astype(np.int64))  # fold to signed


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance ``max_hamming``.

    Block-permutation LSH: split the 64-bit fingerprint into ``n_blocks``
    16-bit blocks; by pigeonhole any pair within distance n_blocks-1 shares at
    least one exact block -> join per block, then verify with bit_count(xor).
    All JVM bit ops after the one pandas-UDF fingerprint pass.
    """
    fp = df.select(F.col(id_col).alias("_id"), simhash64(_c(text_col)).alias("_fp"))
    width = 64 // n_blocks
    blocks = fp.select(
        "_id",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("_fp"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("_b"),
    ).select("_id", "_fp", "_b.blk", "_b.val")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._fp").alias("_fa"),
            F.col("b._fp").alias("_fb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- Cluster resolution -------------------------------------------------------


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free a superseded ``localCheckpoint`` snapshot's executor blocks NOW.

    ``DataFrame.unpersist`` is a no-op for local checkpoints (they are not
    registered with the cache manager) and the blocks otherwise live until
    the JVM garbage-collects the RDD — on an iterative algorithm that can
    stack O(rounds) full snapshots in executor storage. The checkpointed
    RDD is reachable as the plan's ``LogicalRDD.rdd``; unpersisting it is
    safe ONLY for frames that will never be read again (the lineage was
    truncated, so the data is unrecoverable afterwards). Best-effort:
    internal API, so any failure degrades to the old GC-eventually
    behavior rather than erroring.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    all_ids: DataFrame | None = None,
    id_out: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve near-duplicate candidate pairs into clusters.

    Pair generators (``minhash_lsh_pairs``, ``simhash_near_pairs``,
    ``embedding_dedup``) emit EDGES; a training-data dedup pipeline needs the
    transitive closure — one canonical document per connected component — or
    an A~B, B~C family keeps two of its three members. This is the cluster
    step the reference's per-trajectory grouping performs driver-side at its
    scale (duckdb_construct_trajs_stops.py groups per key in one process);
    here it must be distributed.

    Algorithm: min-label propagation with pointer jumping. Every node starts
    labelled with its own id; each round it adopts::

        label(u) <- min(label(u), min over neighbours v of label(v),
                        label(label(u)))          # pointer jump

    The neighbour term moves the component minimum one hop per round; the
    pointer-jump term (label-of-label) halves chain depth per round, so
    convergence is O(log diameter) rounds — and near-dup clusters are
    near-cliques (diameter 1-3) in practice, so 2-3 rounds. Each round is
    three hash shuffles (neighbour min-agg, jump self-join, convergence
    check), all partial-aggregated map-side: a hub node with 10^6 neighbours
    contributes per-partition min() partials, never a collect_list. Labels
    are monotonically non-increasing and always ids of same-component nodes,
    so the fixpoint is exactly the component minimum. ``localCheckpoint``
    truncates the iterative lineage each round (the standard Spark pattern
    for iterative graph algorithms); each superseded round's snapshot is
    explicitly released after its last read, so executor storage holds the
    edge set plus at most TWO label snapshots — O(nodes + edges), not
    O(rounds x nodes).

    Returns ``(id_out, component)`` where ``component`` is the smallest
    member id of the node's component. With ``all_ids`` (a 1-column frame of
    every document id), singletons — docs in no pair — are included as their
    own component, so the output is a total map suitable for canonical-doc
    selection (keep rows where ``id_out == component``).
    """
    ua, ub = F.col(id_a), F.col(id_b)
    edges = (
        pairs.select(ua.alias("u"), ub.alias("v"))
        .union(pairs.select(ub.alias("u"), ua.alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    ).localCheckpoint(eager=True)  # edges are re-joined every round; never
    # recompute the (possibly expensive) upstream pair generator per round
    labels = (
        edges.select("u").distinct().withColumn("label", F.col("u"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neigh = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("_vl")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("_vl").alias("_nl"))
        )
        jumped = labels.join(
            labels.select(F.col("u").alias("label"), F.col("label").alias("_ll")),
            "label",
            "left",
        ).select("u", F.least("label", F.coalesce("_ll", "label")).alias("_jl"))
        new = (
            jumped.join(neigh, "u", "left")
            .select(
                "u", F.least("_jl", F.coalesce("_nl", F.col("_jl"))).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.withColumnRenamed("label", "_new")
            .join(labels, "u")
            .where(F.col("_new") != F.col("label"))
            .limit(1)
            .count()
        )
        # the changed-check above was the last read of the old snapshot;
        # free its blocks so storage holds edges + 2 label snapshots, not
        # O(rounds) of them
        _release_local_checkpoint(labels)
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    out = labels.select(F.col("u").alias(id_out), F.col("label").alias("component"))
    if all_ids is not None:
        ids = all_ids.select(F.col(all_ids.columns[0]).alias(id_out)).distinct()
        out = ids.join(out, id_out, "left").select(
            id_out, F.coalesce("component", F.col(id_out)).alias("component")
        )
    return out


def keep_best_per_component(
    components: DataFrame,
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Canonical-document selection: the production dedup keep-rule.

    ``components`` is :func:`connected_components` output (``id_col``,
    ``component``); ``scored`` carries ``id_col`` + ``score_col``. Per
    near-dup family, keep the HIGHEST-scoring member (ties break to the
    lowest id, so the choice is deterministic across runs / cluster sizes
    — required for exactly-once re-runs and SQL-oracle checkability).
    Keeping the best copy, not an arbitrary one, is the policy that
    matters at corpus scale: near-dup families routinely mix a clean
    original with boilerplate-wrapped mirrors.

    One shuffle on ``component``; ``min_by`` over a (-score, id) struct
    gets map-side partial aggregation, so a pathological 10^6-member
    family costs O(partitions). Negating the (numeric) score instead of
    the id keeps the tie-break valid for string/any-orderable id columns;
    a NULL score coalesces to +inf in the negated key so it can never
    beat a scored member (an all-NULL family keeps its lowest id).

    Returns (component, keep_id, n_members, best_<score_col>).
    """
    j = components.join(scored.select(id_col, score_col), id_col)
    neg = F.coalesce(-F.col(score_col), F.lit(float("inf")))
    return j.groupBy("component").agg(
        F.min_by(
            F.col(id_col), F.struct(neg.alias("_ns"), F.col(id_col))
        ).alias("keep_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.max(score_col).alias(f"best_{score_col}"),
    )


# --- train/holdout decontamination --------------------------------------------

def contaminated_ids(
    train: DataFrame,
    holdout: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_holdout: bool = False,
) -> DataFrame:
    """Train docs sharing >=1 word ``n``-gram with the holdout corpus.

    The standard eval-set decontamination test (GPT-3 appendix C uses 13-gram
    overlap; n is a knob). Both sides shingle through the same
    :func:`shingles` expression the dedup family uses, so a doc with < n
    tokens contributes its whole token string — short holdout docs still
    catch exact copies of themselves, and can never collide with a true
    n-gram (different token counts).

    Scale shape: the holdout (an eval suite) is orders of magnitude smaller
    than the train corpus, so its DISTINCT shingle set is the small side of
    a single semi join — no pair explosion is possible (semi join emits each
    train shingle row at most once, unlike the dedup self-joins, so no
    stop-shingle hub guard is needed). Pass ``broadcast_holdout=True`` when
    the holdout shingle set is known to fit the driver hint threshold;
    default leaves the choice to AQE, which sees the actual built size.

    Docs that normalize to ZERO tokens (empty/NULL/punctuation-only text)
    are excluded from both sides: their whole-doc shingle is the empty
    string, and matching on it would cross-contaminate every empty train
    doc with any empty holdout doc — a false positive unrelated to content.

    Returns a one-column DataFrame ``[id_col]`` of contaminated train ids.
    """
    hold_sh = (
        holdout.select(F.explode(shingles(text_col, n)).alias("_s"))
        .where(F.col("_s") != "")
        .distinct()
    )
    if broadcast_holdout:
        hold_sh = F.broadcast(hold_sh)
    tr_sh = train.select(
        F.col(id_col).alias(id_col), F.explode(shingles(text_col, n)).alias("_s")
    ).where(F.col("_s") != "")
    return tr_sh.join(hold_sh, "_s", "left_semi").select(id_col).distinct()


def decontaminate(
    train: DataFrame,
    holdout: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_holdout: bool = False,
) -> DataFrame:
    """``train`` minus every doc flagged by :func:`contaminated_ids`."""
    bad = contaminated_ids(
        train, holdout, n=n, text_col=text_col, id_col=id_col,
        broadcast_holdout=broadcast_holdout,
    )
    return train.join(bad, id_col, "left_anti")
