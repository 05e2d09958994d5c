import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lighter session for tests

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bbt_etl_dw_spark.session import get_spark

    s = get_spark(app_name="bbt-etl-dw-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
