"""Property-based tests (hypothesis) for the pure codecs, plus a seeded
randomized bulk differential for the hierarchical cover."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_spark.lake.table import (
    _merge_schemas,
    _stats_intersect,
    decode_epoch_ranges,
    encode_epoch_ranges,
)


@given(st.sets(st.integers(min_value=0, max_value=100_000), max_size=300))
@settings(max_examples=200, deadline=None)
def test_epoch_range_codec_roundtrip(epochs):
    enc = encode_epoch_ranges(epochs)
    assert decode_epoch_ranges(enc) == set(epochs)
    # canonical: sorted, disjoint, non-adjacent ranges
    for (a_lo, a_hi), (b_lo, _b_hi) in zip(enc, enc[1:]):
        assert a_lo <= a_hi
        assert a_hi + 1 < b_lo
    # size is O(#gaps), never worse than one range per element
    assert len(enc) <= max(1, len(epochs))


@given(st.lists(st.integers(min_value=0, max_value=500), max_size=200))
@settings(max_examples=100, deadline=None)
def test_epoch_codec_accepts_legacy_flat_lists(ids):
    assert decode_epoch_ranges(ids) == set(ids)


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=3),
            st.text(alphabet="abc", min_size=1, max_size=3),
        ).map(lambda t: (min(t), max(t))),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=150, deadline=None)
def test_stats_intersect_is_conservative(ranges):
    """If two files share ANY key tuple, _stats_intersect must be True
    (soundness: pruning may only remove provably-disjoint files)."""
    cols = [f"c{i}" for i in range(len(ranges))]
    a = {c: [lo, hi] for c, (lo, hi) in zip(cols, ranges)}
    # b's ranges each contain one point of a's range -> a shared tuple exists
    shared = [lo for (lo, _hi) in ranges]
    b = {c: [v, v] for c, v in zip(cols, shared)}
    assert _stats_intersect(a, b)
    assert _stats_intersect(a, None) and _stats_intersect(None, b)


def _random_text(rng: random.Random) -> str:
    alphabet = string.ascii_letters + string.digits + " .,;{}()\n\tΩλ-_"
    n = rng.randint(0, 400)
    return "".join(rng.choice(alphabet) for _ in range(n))


def test_cover_differential_on_random_corpus(spark):
    """Hierarchical == naive-expanded over 60 seeded random documents
    (mixed alphanumerics, punctuation, whitespace, non-ASCII) — the bulk
    randomized counterpart of the handcrafted differential."""
    from etl_spark.operators.cover import (
        cover_table,
        expand_to_finest,
        naive_cover_table,
    )

    rng = random.Random(20260817)
    docs = spark.createDataFrame(
        [(i, _random_text(rng)) for i in range(60)], ["doc_id", "text"]
    )
    hier = cover_table(docs, sizes=(64, 16, 4))
    got = {(r.doc_id, r.start) for r in expand_to_finest(hier, sizes=(64, 16, 4)).collect()}
    want = {(r.doc_id, r.start) for r in naive_cover_table(docs, size=4).collect()}
    assert got == want


def test_schema_widening_is_idempotent_and_monotone():
    """Merging the merged schema with either input is a no-op (join-semilattice
    behavior of the widening union)."""
    from pyspark.sql import types as T

    old = T.StructType([
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.FloatType()),
        T.StructField("c", T.StringType()),
    ])
    new = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("d", T.DoubleType()),
    ])
    m1 = _merge_schemas(old, new)
    assert _merge_schemas(m1, old) == m1
    assert _merge_schemas(m1, new) == m1
    assert _merge_schemas(m1, m1) == m1


@given(
    st.one_of(st.none(), st.integers(min_value=0, max_value=1 << 45)),
    st.integers(min_value=1, max_value=1 << 14),   # n_buckets
    st.integers(min_value=1, max_value=100_000),   # defaultParallelism
)
def test_staging_width_bounds(size_bytes, n_buckets, par):
    """_staging_width invariants: capped at 4*n_buckets ALWAYS (reducers
    past that are empty by construction), at least min(cap, parallelism)
    when sized, wide default when size unknown."""

    class _T:
        pass

    t = _T()
    t.n_buckets = n_buckets

    class _SC:
        defaultParallelism = par

    class _S:
        sparkContext = _SC()

    t.spark = _S()
    from etl_spark.lake.table import SnapshotTable

    w = SnapshotTable._staging_width(t, size_bytes)
    wide = 4 * n_buckets
    assert 1 <= w <= wide
    if not size_bytes:
        assert w == wide
    else:
        assert w >= min(wide, max(1, par))
        if size_bytes >= wide * (256 << 10):
            assert w == wide


def test_stratified_sample_differential_on_random_corpus(spark):
    """Seeded randomized bulk differential: stratified_sample's surviving
    id set must equal an independent Python recompute of the contract
    (md5-bucket < max(1, trunc(min(1, quota/n) * RES))), across random
    strata including NULL and counts straddling the quota."""
    import hashlib

    from etl_spark.operators.sampling import SAMPLE_RES, stratified_sample

    rng = random.Random(20260819)
    langs = ["en", "fr", "de", None]
    rows = [
        (i, "text " + str(i), rng.choice(langs)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    quota = 300
    got = {
        r["doc_id"]
        for r in stratified_sample(df, quota=quota).select("doc_id").collect()
    }

    counts: dict[object, int] = {}
    for _i, _t, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    want = set()
    for i, _t, lang in rows:
        rate = min(1.0, quota / counts[lang])
        thresh = max(1, int(rate * SAMPLE_RES))
        b = int(hashlib.md5(f"{i}|sample".encode()).hexdigest()[:15], 16)
        if b % SAMPLE_RES < thresh:
            want.add(i)
    assert got == want
    # and every stratum actually landed near its quota (or passed whole)
    for lang, n in counts.items():
        kept = sum(1 for i, _t, lg in rows if lg == lang and i in got)
        if n <= quota:
            assert kept == n
        else:
            assert abs(kept - quota) <= 4 * (quota * (1 - quota / n)) ** 0.5
