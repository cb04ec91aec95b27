"""Timestamp-dialect robustness: every events-reading query must give
identical results whether the parquet `ts` column surfaces as TIMESTAMP
or TIMESTAMP_NTZ (Spark 4 infers NTZ from naive parquet micros; round 3
lost its whole bench to an `unix_micros(NTZ)` analysis error — this
pins the fix).  The session is UTC (conftest via get_spark), so the two
dialects carry identical values and only the TYPE differs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.plans.queries import ordered_registry

EVENT_TS_QUERIES = [
    "sessionize",
    "asof_join_events",
    "range_join_events",
    "window_range_frame",
    "window_sliding",
    "window_tumbling",
    "window_cumsum",
]


@pytest.fixture(scope="module")
def both_dialects(spark, sf_dir, tmp_path_factory):
    """The same events data written twice: once NTZ (as generated), once
    cast to TIMESTAMP."""
    base = str(tmp_path_factory.mktemp("ntz"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    ntz_dir, tz_dir = f"{base}/ntz", f"{base}/tz"
    ev.write.parquet(f"{ntz_dir}/events.parquet")
    ev.withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        f"{tz_dir}/events.parquet"
    )
    return ntz_dir, tz_dir


def test_fixed_offset_tz_guard(spark):
    from dirt_hadoop_similarity_spark.session import require_fixed_offset_tz

    assert require_fixed_offset_tz(spark) == "UTC"
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        # 'Etc/UTC' is what a VANILLA session (the driver harness's)
        # resolves from a UTC container — the guard must accept the
        # fixed-offset Etc/ region ids, not just the literal 'UTC'
        for ok in ("GMT", "UTC", "+05:30", "-08", "GMT+02:00",
                   "Etc/UTC", "Etc/GMT-5"):
            spark.conf.set("spark.sql.session.timeZone", ok)
            assert require_fixed_offset_tz(spark) == ok
        for bad in ("America/New_York", "Europe/Berlin"):
            spark.conf.set("spark.sql.session.timeZone", bad)
            with pytest.raises(ValueError, match="fixed-offset"):
                require_fixed_offset_tz(spark)
        # the shim itself enforces it at plan-build time
        from dirt_hadoop_similarity_spark.plans.queries_more import ts_micros

        with pytest.raises(ValueError, match="fixed-offset"):
            ts_micros(F.lit("2024-01-01 00:00:00"))
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


@pytest.mark.parametrize("name", EVENT_TS_QUERIES)
def test_query_agrees_across_ts_dialects(spark, both_dialects, name):
    ntz_dir, tz_dir = both_dialects
    reg = ordered_registry()

    def rows(sf_dir):
        df = reg[name].fn(spark, sf_dir)
        # normalize any timestamp-typed output column to comparable values
        cols = [
            F.col(c).cast("timestamp_ntz").alias(c)
            if t in ("timestamp", "timestamp_ntz")
            else F.col(c)
            for c, t in df.dtypes
        ]
        return sorted(map(tuple, df.select(cols).collect()))

    assert rows(ntz_dir) == rows(tz_dir)
