"""Text-dedup operators: golden cases + DuckDB oracle differentials."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_spark.operators.textdedup import (
    exact_dedupe,
    fingerprint_dedupe,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_near_pairs,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "The quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "The quick brown fox jumps over the lazy dog!!"),  # fingerprint dup of 1
    (4, "The quick brown fox jumps over the sleepy dog"),  # near dup of 1
    (5, "Completely different content about spark engines"),
    (6, "tiny"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedupe_keeps_min_id(spark):
    out = exact_dedupe(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4, 5, 6]


def test_fingerprint_dedupe_ignores_punct(spark):
    out = fingerprint_dedupe(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4, 5, 6]  # 2 exact dup, 3 punct-only dup


def test_shingles_short_doc(spark):
    df = _docs(spark).where(F.col("doc_id") == 6).select(shingles("text", 3).alias("s"))
    assert df.collect()[0]["s"] == ["tiny"]


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), threshold=0.4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # 1-2 exact (jaccard 1.0); 3 differs only by punctuation (stripped) -> 1.0 with 1,2
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert (1, 4) in got  # one-word change in a 9-word doc
    assert not any(5 in p or 6 in p for p in got)


def test_minhash_exact_dup_identical_signature(spark):
    sig = (
        _docs(spark)
        .select("doc_id", minhash_signature("text", 16, 3).alias("sig"))
        .collect()
    )
    by_id = {r["doc_id"]: r["sig"] for r in sig}
    assert by_id[1] == by_id[2] == by_id[3]
    assert by_id[1] != by_id[5]
    assert all(len(s) == 16 for s in by_id.values())


def test_minhash_signature_matches_duckdb_oracle(spark):
    """Carter-Wegman MinHash reproduces bit-for-bit in ANSI SQL (DuckDB):
    one md5 key per shingle reduced into Z_(2^31-1), then (a*x + b) mod p
    per seed with the same literal constants on both engines."""
    from etl_spark.operators.textdedup import (
        MINHASH_PRIME,
        minhash_affine_consts,
    )

    got = {
        r["doc_id"]: r["sig"]
        for r in _docs(spark)
        .select("doc_id", minhash_signature("text", 4, 3).alias("sig"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") t(doc_id, text)"
    )
    terms = ",".join(
        f"list_min(list_transform(hv, x -> ({a}*x + {b}) % {MINHASH_PRIME}))"
        for a, b in minhash_affine_consts(4)
    )
    q = rf"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),
                 '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '') AS tk
      FROM docs
    ), sh AS (
      SELECT doc_id, CASE WHEN len(tk) >= 3 THEN
          list_distinct(list_transform(generate_series(1, len(tk)-2),
              i -> array_to_string(tk[i:i+2], ' ')))
        ELSE [array_to_string(tk, ' ')] END AS sg
      FROM toks
    ), hs AS (
      SELECT doc_id, list_transform(sg,
          s -> ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT
               % 2147483647) AS hv
      FROM sh
    )
    SELECT doc_id, [{terms}] AS sig
    FROM hs ORDER BY doc_id
    """
    want = {r[0]: r[1] for r in con.execute(q).fetchall()}
    assert got == want


def test_minhash_lsh_pairs(spark):
    pairs = minhash_lsh_pairs(_docs(spark), num_hashes=16, band_size=4, verify_threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0 and got[(1, 3)] == 1.0
    assert not any(5 in p for p in got)


def test_simhash_near_pairs(spark):
    pairs = simhash_near_pairs(_docs(spark), max_hamming=10)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0 and got[(1, 3)] == 0  # identical token sets
    assert (1, 4) in got  # one-word swap: small hamming distance
    assert not any(5 in p or 6 in p for p in got)


def test_simhash_matches_pure_python_oracle(spark):
    """Distributed simhash == local reference implementation."""
    import hashlib
    import re

    def oracle(text: str) -> int:
        toks = set(re.sub(r"[^a-z0-9\s]", " ", text.lower()).split())
        votes = [0] * 64
        for t in toks:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        fp = 0
        for i in range(64):
            if votes[i] > 0:
                fp |= 1 << i
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    got = {
        r["doc_id"]: r["fp"]
        for r in _docs(spark).select("doc_id", simhash64("text").alias("fp")).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == oracle(text), doc_id


def test_minhash_table_equals_expression(spark):
    """Explode-based signature path == array-expression path, bit for bit."""
    from etl_spark.operators.textdedup import minhash_signature_table

    expr = {
        r["doc_id"]: r["sig"]
        for r in _docs(spark)
        .select("doc_id", minhash_signature("text", 8, 3).alias("sig"))
        .collect()
    }
    tab = {
        r["_id"]: r["_sig"]
        for r in minhash_signature_table(_docs(spark), num_hashes=8).collect()
    }
    assert expr == tab


def test_winnowing_fingerprints(spark):
    """Winnowing invariants: shared long runs share a fingerprint (the MOSS
    match guarantee); density is ~1/window of full shingling; empty and
    short docs behave."""
    from etl_spark.operators.textdedup import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, shared + " one two three four five six"),
            (1, "x y z " + shared + " different tail entirely here"),
            (2, ""),
            (3, "tiny"),
        ],
        ["doc_id", "text"],
    )
    fps = winnowing_fingerprints(docs, k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["id"], set()).add(r["fp"])
    # guarantee: a 10-token shared run (8 shared 3-grams > window) yields at
    # least one common selected fingerprint
    assert by_doc[0] & by_doc[1]
    assert 2 not in by_doc  # empty doc -> no fingerprints
    assert len(by_doc[3]) == 1  # single sub-k gram -> one fingerprint
    # density: far fewer fingerprints than k-grams
    n_tokens = len((shared + " one two three four five six").split())
    assert len(by_doc[0]) <= n_tokens - 2


def test_token_count_bpe(spark):
    from etl_spark.functions.content import token_count_bpe

    docs = spark.createDataFrame(
        [(0, "def f(x): return x+1"), (1, ""), (2, None), (3, "hello world")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count_bpe("text").alias("n")).collect()
    }
    # def | f | ( | x | ) | : | return | x | + | 1  -> 10
    assert got == {0: 10, 1: 0, 2: 0, 3: 2}


# --- connected components (near-dup cluster resolution) ----------------------


def _uf_components(pairs, all_ids):
    """Reference union-find over the same pairs (plain Python)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in all_ids}


def test_connected_components_chain_clique_singleton(spark):
    from etl_spark.operators.textdedup import connected_components

    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (7, 5)]
    ids = list(range(1, 13))
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    idf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pdf, all_ids=idf).collect()
    }
    assert got == _uf_components(pairs, ids)
    # singletons map to themselves
    assert got[4] == 4 and got[6] == 6


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 64-node path exercises the O(log diameter) pointer-jump term —
    plain one-hop propagation would need 63 rounds; the cap is 50."""
    from etl_spark.operators.textdedup import connected_components

    n = 64
    pairs = [(i, i + 1) for i in range(1, n)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(pdf).collect()
    assert len(out) == n
    assert all(r["component"] == 1 for r in out)


def test_connected_components_empty_pairs(spark):
    from etl_spark.operators.textdedup import connected_components

    pdf = spark.createDataFrame([], "id_a long, id_b long")
    idf = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pdf, all_ids=idf).collect()
    }
    assert got == {1: 1, 2: 2}


def test_dedup_components_closes_lsh_pairs(spark):
    """End-to-end: components over minhash_lsh_pairs on the golden docs equal
    union-find over the same pair set; canonical selection keeps one doc per
    near-dup family."""
    from etl_spark.operators.textdedup import connected_components

    d = _docs(spark)
    pairs_df = minhash_lsh_pairs(d, num_hashes=16, band_size=4, verify_threshold=0.5)
    pairs = [(r["id_a"], r["id_b"]) for r in pairs_df.collect()]
    comp = connected_components(pairs_df, all_ids=d.select("doc_id"))
    got = {r["doc_id"]: r["component"] for r in comp.collect()}
    assert got == _uf_components(pairs, [d0 for d0, _ in DOCS])
    survivors = sorted(k for k, v in got.items() if k == v)
    # docs 1/2 (and any near-dups LSH catches) collapse to one family root
    assert 1 in survivors and 2 not in survivors
    assert len(survivors) == len(set(got.values()))


# --- decontamination ----------------------------------------------------------

def test_decontaminate_flags_shared_ngram(spark):
    from etl_spark.operators.textdedup import contaminated_ids, decontaminate

    # 8 shared tokens between train doc 1 and holdout doc 10; train doc 2 is
    # disjoint; train doc 3 is a short exact copy of holdout doc 11 (whole-doc
    # shingle path); train doc 4 is short and unique.
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta plus trailing words"),
            (2, "one two three four five six seven eight nine ten eleven twelve"),
            (3, "short copy here"),
            (4, "another short one"),
        ],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [
            (10, "PREFIX alpha beta gamma delta epsilon zeta eta theta SUFFIX"),
            (11, "short copy here"),
        ],
        "doc_id long, text string",
    )
    bad = sorted(r["doc_id"] for r in contaminated_ids(train, holdout, n=8).collect())
    assert bad == [1, 3]
    clean = sorted(r["doc_id"] for r in decontaminate(train, holdout, n=8).collect())
    assert clean == [2, 4]


def test_decontaminate_short_doc_cannot_match_true_ngram(spark):
    from etl_spark.operators.textdedup import contaminated_ids

    # A 3-token holdout doc whose whole-doc shingle is a substring of a train
    # doc must NOT flag it: whole-doc shingles of < n tokens never equal a
    # true n-gram (different token counts).
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(10, "alpha beta gamma")], "doc_id long, text string"
    )
    assert contaminated_ids(train, holdout, n=8).count() == 0


def test_decontaminate_matches_duckdb_oracle(spark):
    """Differential vs an independent DuckDB 8-gram overlap on seeded text."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(60)
    ]
    # plant one guaranteed 8-gram overlap
    rows.append((100, "p1 p2 p3 p4 p5 p6 p7 p8 tail tokens here"))
    rows.append((101, "lead p1 p2 p3 p4 p5 p6 p7 p8"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = df.where(F.col("doc_id") % 2 == 0)
    holdout = df.where(F.col("doc_id") % 2 == 1)

    from etl_spark.operators.textdedup import contaminated_ids

    got = sorted(
        r["doc_id"] for r in contaminated_ids(train, holdout, n=8).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = [
        r[0]
        for r in con.execute(
            r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(regexp_replace(
                           lower(text), '[^a-z0-9\s]', ' ', 'g')), '\s+'),
                           t -> t <> '') AS tk
                FROM docs
            ), sh8 AS (
                SELECT doc_id, CASE WHEN len(tk) >= 8 THEN
                    list_distinct(list_transform(generate_series(1, len(tk)-7),
                        i -> array_to_string(tk[i:i+7], ' ')))
                  ELSE [array_to_string(tk, ' ')] END AS sg
                FROM toks
            ), hold AS (
                SELECT DISTINCT unnest(sg) AS s FROM sh8 WHERE doc_id % 2 = 1
            )
            SELECT DISTINCT t.doc_id
            FROM (SELECT doc_id, unnest(sg) AS s FROM sh8 WHERE doc_id % 2 = 0) t
            JOIN hold h ON t.s = h.s
            ORDER BY 1
            """
        ).fetchall()
    ]
    assert got == want
    assert 100 in got  # the planted overlap survived the differential


def test_decontaminate_empty_docs_never_cross_contaminate(spark):
    from etl_spark.operators.textdedup import contaminated_ids

    # punctuation-only / empty / NULL text all normalize to zero tokens;
    # the empty whole-doc shingle must not match across them
    train = spark.createDataFrame(
        [(1, "$$$ !!!"), (2, ""), (3, None),
         (4, "real words alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(10, "..."), (11, None)], "doc_id long, text string"
    )
    assert contaminated_ids(train, holdout, n=8).count() == 0


def test_connected_components_releases_superseded_snapshots(spark):
    from etl_spark.operators.textdedup import connected_components

    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    # a 32-node chain forces several pointer-jump rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(31)], "id_a long, id_b long"
    )
    out = connected_components(pairs)
    assert all(r["component"] == 0 for r in out.collect())
    after = len(sc._jsc.sc().getRDDStorageInfo())
    # edges + final labels may remain; superseded per-round snapshots must not
    assert after - before <= 2


def test_connected_components_hub_star(spark):
    """A 2000-degree hub: the neighbour min must partial-aggregate, never
    materialize a per-node edge list — and converge in O(1) rounds."""
    from etl_spark.operators.textdedup import connected_components

    pairs = spark.createDataFrame(
        [(1000, i) for i in range(2, 2002)] + [(0, 1000)],
        "id_a long, id_b long",
    )
    out = connected_components(pairs)
    rows = out.collect()
    # nodes: 0, hub 1000, spokes 2..2001 (1000 double-counts) -> 2001
    assert len(rows) == 2001
    assert all(r["component"] == 0 for r in rows)


def test_keep_best_per_component_quality_then_id(spark):
    """Keep rule: highest quality wins; ties break to the LOWEST id;
    singletons keep themselves; n_members counts the whole family."""
    from etl_spark.operators.textdedup import keep_best_per_component

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
        "doc_id long, component long",
    )
    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9),   # tie at 0.9 -> keep 2
         (7, 0.1), (8, 0.4),             # 8 wins
         (9, 0.7)],                      # singleton keeps itself
        "doc_id long, quality double",
    )
    out = {r["component"]: r for r in
           keep_best_per_component(comp, scored).collect()}
    assert out[1]["keep_id"] == 2 and out[1]["n_members"] == 3
    assert out[1]["best_quality"] == 0.9
    assert out[7]["keep_id"] == 8 and out[7]["n_members"] == 2
    assert out[9]["keep_id"] == 9 and out[9]["n_members"] == 1


def test_keep_best_tie_break_works_for_string_ids(spark):
    """The tie-break negates the SCORE, not the id, so any orderable id
    type works: string ids with tied quality keep the lexicographically
    smallest."""
    from etl_spark.operators.textdedup import keep_best_per_component

    comp = spark.createDataFrame(
        [("b", "a"), ("a", "a"), ("c", "a")], "doc_id string, component string"
    )
    scored = spark.createDataFrame(
        [("a", 0.9), ("b", 0.9), ("c", 0.1)], "doc_id string, quality double"
    )
    out = keep_best_per_component(comp, scored).collect()
    assert len(out) == 1
    assert out[0]["keep_id"] == "a" and out[0]["n_members"] == 3


def test_keep_best_null_score_never_wins(spark):
    """A NULL-scored member must lose to ANY scored member (the negated
    sort key coalesces NULL to +inf); an all-NULL family keeps min id."""
    from etl_spark.operators.textdedup import keep_best_per_component

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (8, 8), (9, 8)],
        "doc_id long, component long",
    )
    scored = spark.createDataFrame(
        [(1, 0.9), (2, None), (3, 0.5), (8, None), (9, None)],
        "doc_id long, quality double",
    )
    out = {r["component"]: r for r in
           keep_best_per_component(comp, scored).collect()}
    assert out[1]["keep_id"] == 1          # NULL (doc 2) never wins
    assert out[1]["best_quality"] == 0.9
    assert out[8]["keep_id"] == 8          # all-NULL family: min id
    assert out[8]["best_quality"] is None
