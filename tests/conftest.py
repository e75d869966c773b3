import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fsharp_dataframe_spark import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fsharp_dataframe_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute scale-smoke tests (always run in CI; "
        "deselect locally with -m 'not slow')")
