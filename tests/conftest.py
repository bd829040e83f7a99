"""Shared fixtures. One SparkSession for the whole run (JVM start dominates
otherwise); tests must not stop() it."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_service_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_dir_large() -> str:
    """Largest local corpus, for cross-regime identity checks. Overridable
    via its OWN env var (not SPARK_GRAFT_SF_DIR, which selfcheck/service
    sessions export at SMALL corpora — inheriting it would silently run
    the tie-dense 2000-vector identity checks on a 50-vector smoke corpus
    while still reporting green)."""
    return os.environ.get("SPARK_GRAFT_SF_LARGE", "/root/testdata/sf0.1")
