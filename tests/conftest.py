"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from storm_netmonitor_spark import registry  # noqa: E402
from storm_netmonitor_spark.session import get_spark  # noqa: E402

registry.load_all()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(app_name="netmonitor-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
