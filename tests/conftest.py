"""Shared fixtures: one SparkSession per test session, sized for the tiny
sf0.001 fixtures (a handful of local threads beats 32 for sub-second tests).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysqldump_to_parquet_spark.protoshim import ensure_protobuf  # noqa: E402
from mysqldump_to_parquet_spark.session import get_spark  # noqa: E402

# Activate the vendored protobuf shim (no-op when the real wheel exists)
# BEFORE any SparkSession: the transformWithState protocol client runs in
# Python worker processes, which inherit PYTHONPATH at JVM launch.
ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mtps-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CORRECT
