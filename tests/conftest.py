import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_textsearch_spark.spark_utils import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pgts-tests", cpus=int(os.environ.get("TEST_CPUS", "8")),
                  shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
