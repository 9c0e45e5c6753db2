"""Hard-crash resumability: SIGKILL a replay mid-flight, resume, verify.

The reference heals a crash anywhere in its ingest by re-running (anti-join
skips applied work; SURVEY §2.9). Here the whole driver JVM+Python process is
killed at a random point during an incremental replay; a fresh process
resumes and the final state must equal the oracle exactly — no partial
epochs, no duplicates, no missing lineage.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

from etl_spark.datagen import change_stream, write_segments
from etl_spark.lake.table import SnapshotTable
from etl_spark.pipeline import IngestPipeline
from tests.helpers import assert_frames_equal, oracle_final_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def stream(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crash") / "changes")
    df = change_stream(spark, 6000, n_repos=20, paths_per_repo=40,
                       events_per_epoch=1500, dup_pct=5)
    write_segments(df, root)
    return root


def test_sigkill_mid_replay_then_resume(spark, stream, tmpdir_path):
    table_root = f"{tmpdir_path}/table"
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from etl_spark.pipeline import IngestPipeline\n"
        "from etl_spark.session import get_spark\n"
        "spark = get_spark('crashme', master='local[2]', shuffle_partitions=4)\n"
        "p = IngestPipeline(spark, {table!r}, n_buckets=4)\n"
        "print('START', flush=True)\n"
        "p.replay({stream!r})\n"
        "print('FINISHED', flush=True)\n"
    ).format(repo=REPO, table=table_root, stream=stream)
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, cwd=REPO,
        start_new_session=True,
    )
    # wait until the pipeline is actually working, then kill the whole group
    # (driver + JVM) once at least one commit likely landed
    assert proc.stdout is not None
    line = proc.stdout.readline()
    assert "START" in line
    deadline = time.time() + 120
    while time.time() < deadline:
        t = SnapshotTable(spark, table_root)
        if t.exists():
            break
        time.sleep(0.5)
    else:
        pytest.fail("pipeline never committed a first snapshot")
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
    proc.wait(timeout=30)

    killed_at = SnapshotTable(spark, table_root)
    applied_before = killed_at.applied_epochs()
    assert applied_before, "expected at least one committed epoch before the kill"
    assert len(applied_before) < 4, "process finished before the kill; test moot"

    # fresh pipeline object = fresh process semantics: resume to completion
    pipe = IngestPipeline(spark, table_root, n_buckets=4)
    pipe.replay(stream)
    assert pipe.table.applied_epochs() == {0, 1, 2, 3}
    assert pipe.table.fsck()["ok"]
    got = pipe.table.read().drop("epoch").toPandas()
    assert_frames_equal(got, oracle_final_state(stream))
    # lineage healed for every epoch
    assert pipe.log.logged_epochs() == {0, 1, 2, 3}
