import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # fixtures_poly importable
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from gdal_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "gdal_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
