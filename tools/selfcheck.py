"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its ``oracle_sql()``
DuckDB equivalent on the same parquet tables, comparing row count, column
names, and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return out.sort_values(cols).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as e
    from etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs = dict(e.queries())
    if hasattr(e, "extra_queries"):
        qs.update(e.extra_queries())
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            ok = len(got) >= 0
            print(f"rows  {name}: {len(got)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        cg, cw = canon(got), canon(want)
        if list(cg.columns) != list(cw.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(cg.columns)} vs {list(cw.columns)}")
            continue
        if len(cg) != len(cw):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(cg)} vs {len(cw)}")
            continue
        # The driver hashes serialized VALUES, so an int64 25 vs float64 25.0
        # drift (e.g. DuckDB HUGEINT sums materialized as float64) fails its
        # gate even when assert_frame_equal(check_dtype=False) passes. Mirror
        # that: a dtype-KIND mismatch is a failure here too.
        kind_mismatch = [
            c for c in cg.columns if cg[c].dtype.kind != cw[c].dtype.kind
        ]
        if kind_mismatch:
            failures.append(name)
            print(
                f"FAIL  {name}: dtype-kind mismatch on {kind_mismatch}: "
                + ", ".join(f"{c}: {cg[c].dtype}!={cw[c].dtype}" for c in kind_mismatch)
            )
            continue
        try:
            pd.testing.assert_frame_equal(cg, cw, check_dtype=False, check_exact=False, rtol=0, atol=0)
            print(f"OK    {name}: {len(cg)} rows ({time.time()-t0:.1f}s)")
        except AssertionError as ex:
            failures.append(name)
            msg = str(ex).split("\n")
            print(f"FAIL  {name}: value mismatch: {' / '.join(msg[:3])}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
