"""Shared test fixtures: one SparkSession per run + the oracle harness."""

from __future__ import annotations

import os
import sys

import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_TESTS_DIR)
sys.path.insert(0, _REPO_DIR)

# Python workers spawned by the local-mode JVM inherit this env, not the
# driver's sys.path — make test modules importable for pickled closures.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO_DIR, _TESTS_DIR, os.environ.get("PYTHONPATH")) if p
)

from cooler_mapreduce_spark.session import get_session  # noqa: E402

SMOKE_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_session("cooler-mapreduce-spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SMOKE_SF


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return ORACLE_SF
