import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TINY_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from quickwit_spark.session import get_spark

    # small core count keeps test startup/shuffles fast
    spark = get_spark(app_name="quickwit_spark_tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tiny_dir():
    return TINY_DIR
