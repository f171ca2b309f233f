import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from heavykeeper_rs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-hundred-MB fixtures; run explicitly with -m slow"
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="hk-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
