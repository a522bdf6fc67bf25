from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jibaro_spark.session import build_session  # noqa: E402
from jibaro_spark.streaming.windows import enable_tws_runtime  # noqa: E402
from jibaro_spark.testing import duckdb_connection  # noqa: E402

# Must run at import time, BEFORE the session fixture builds the JVM:
# Python workers inherit $PYTHONPATH from the driver environment, so a
# later call could enable transformWithStateInPandas on the driver but
# not on workers.  No-op where google.protobuf is already installed.
enable_tws_runtime()

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("JIBARO_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="jibaro_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE
