import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openlogreplicator_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session("olr-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="olrspark-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
