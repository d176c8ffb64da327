"""Shared pytest fixtures.

A single local SparkSession is shared across the whole test run (JVM
startup dominates otherwise).  Tests that don't need Spark import only
the pure-Python core and stay fast.
"""

from __future__ import annotations

import json
import os
import pathlib

import pytest

FIXTURE_DIR = pathlib.Path(__file__).parent / "fixtures"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def load_scan_fixtures() -> dict:
    with open(FIXTURE_DIR / "scan_fixtures.json") as f:
        return json.load(f)


@pytest.fixture(scope="session")
def scan_fixtures() -> dict:
    return load_scan_fixtures()


@pytest.fixture(scope="session")
def spark():
    from turtle_spark.session import get_spark

    s = get_spark(app_name="turtle-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return f"{TESTDATA}/sf0.001"
