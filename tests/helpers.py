"""Shared test helpers: DuckDB replay oracle + frame comparison."""

from __future__ import annotations

import duckdb
import pandas as pd

from etl_spark.functions.content import _LANG_CANON
from etl_spark.pipeline import COMMIT_RE


def lang_case_sql(col: str = "lang") -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _LANG_CANON.items()
    )
    return f"CASE lower(trim({col})) {whens} ELSE 'unknown' END"


def oracle_final_state(stream_root: str, with_metadata: bool = False) -> pd.DataFrame:
    """Brute-force DuckDB oracle: clean + latest-commit-wins per (repo, path).

    Independent recomputation of the engine's replay semantics (FIXTURES.md §2),
    mirroring the reference's oracle-style tests
    (/root/reference/tests/test_centroid_of_points.py:22-35).
    """
    meta_col = ", metadata" if with_metadata else ""
    q = f"""
    WITH raw AS (
        SELECT * FROM read_parquet('{stream_root}/epoch=*/*.parquet',
                                   hive_partitioning=1, union_by_name=1)
    ),
    cleaned AS (
        SELECT repo, path, lsn, "commit",
               {lang_case_sql()} AS lang,
               content, sha256(content) AS content_sha256,
               strlen(content)::BIGINT AS content_bytes {meta_col}
        FROM raw
        WHERE repo IS NOT NULL AND repo <> ''
          AND path IS NOT NULL AND path <> ''
          AND content IS NOT NULL
          AND regexp_matches("commit", '{COMMIT_RE}')
    )
    SELECT * EXCLUDE (rn) FROM (
        SELECT *, row_number() OVER (
            PARTITION BY repo, path ORDER BY "commit" DESC
        ) AS rn FROM cleaned
    ) WHERE rn = 1
    """
    return duckdb.connect().execute(q).df()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(cols)
        .reset_index(drop=True)
        .astype({c: "object" for c in cols})
    )


def assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> None:
    ca, cb = canon(a), canon(b)
    assert list(ca.columns) == list(cb.columns), (ca.columns, cb.columns)
    assert len(ca) == len(cb), (len(ca), len(cb))
    pd.testing.assert_frame_equal(ca, cb, check_dtype=False)
