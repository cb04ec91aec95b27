"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dirt_hadoop_similarity_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="dhs-tests",
        master="local[4]",
        shuffle_partitions=8,
        # the single shared JVM accumulates listener/UI retained state
        # across ~1,500 tests; at the 1g local-mode default the heap can
        # OOM late in the run (observed r16: test_cli's chunk count, in
        # ArrayList.grow, green in isolation) — give the session real
        # headroom and retain fewer finished executions
        extra_conf={
            "spark.driver.memory": "6g",
            "spark.sql.ui.retainedExecutions": "50",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True, scope="module")
def _clear_spark_cache_between_modules(request):
    """Drop cached relations when a test module finishes: operators
    .cache() internally, and across ~370 tests the accumulated storage
    memory can OOM the single session JVM late in the run (observed
    once as a TorrentBroadcast heap failure in the IVF-PQ recall test —
    green in isolation).  Module scope keeps within-module reuse."""
    yield
    if "spark" in request.fixturenames:
        try:
            request.getfixturevalue("spark").catalog.clearCache()
            from dirt_hadoop_similarity_spark.operators import (
                _tracked_cache,
            )

            _tracked_cache.release_all()
        except Exception:
            pass
