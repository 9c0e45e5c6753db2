"""Generator properties: determinism, skew, duplicate re-deliveries."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.datagen import change_stream


def test_deterministic(spark):
    a = change_stream(spark, 2000, n_repos=10).orderBy("lsn", "commit").collect()
    b = change_stream(spark, 2000, n_repos=10).orderBy("lsn", "commit").collect()
    assert a == b


def test_commit_monotone_zero_padded(spark):
    df = change_stream(spark, 500, n_repos=5)
    rows = df.select("lsn", "commit").distinct().orderBy("lsn").collect()
    commits = [r.commit for r in rows]
    assert commits == sorted(commits)  # lexicographic == LSN order
    assert all(len(c) == 13 and c.startswith("c") for c in commits)


def test_skew_mega_repo(spark):
    df = change_stream(spark, 20000, n_repos=50, skew=3.0)
    counts = (
        df.groupBy("repo").count().orderBy(F.desc("count")).limit(2).collect()
    )
    assert counts[0]["repo"] == "repo_0000"
    # mega-repo dominates: several times the runner-up
    assert counts[0]["count"] > 3 * counts[1]["count"]


def test_duplicates_present_and_exact(spark):
    df = change_stream(spark, 5000, n_repos=10, dup_pct=10)
    total = df.count()
    distinct = df.distinct().count()
    assert total > distinct  # re-deliveries exist
    # every duplicate is bit-identical (same key+commit+content)
    per_commit = df.groupBy("commit").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("repo", "path", "content").alias("k"),
    )
    assert per_commit.where("k > 1").count() == 0
