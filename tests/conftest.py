from __future__ import annotations

import shutil
import tempfile

import pytest

from etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="etl_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
