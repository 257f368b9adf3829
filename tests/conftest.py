from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eth_event_stream_spark.session import get_spark  # noqa: E402
from eth_event_stream_spark.sources.fixtures import generate_eth_logs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="eth_event_stream_spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def eth_logs_fixture(tmp_path_factory):
    fx = generate_eth_logs()
    path = str(tmp_path_factory.mktemp("ethlogs") / "eth_logs.parquet")
    fx.write_parquet(path)
    return fx, path


@pytest.fixture(scope="session")
def eth_logs(spark, eth_logs_fixture):
    _, path = eth_logs_fixture
    return spark.read.parquet(path)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
