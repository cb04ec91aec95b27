"""Every registered query runs against an events table with NULL
event-times, NULL user ids (anonymous events), NULL values, and NULL
props — the dirty shapes real event streams deliver that the sf
testdata never does.

Round-12 contract decisions this gate enforces:
  * Spark's NATIVE event-time operators (session_window, window()) DROP
    null event-times — the batch twin of the streaming watermark, and
    the intended contract.  Three oracles (session_windows,
    window_sliding, stream_windowed_counts) wrongly kept null-ts rows
    as a NULL time bucket; they now filter ts IS NOT NULL.
  * anomaly.value_stats excluded NULL values from the per-key moment
    statistics: previously n counted every row while s/q summed only
    non-null values, silently deflating the mean and inflating the
    variance for keys with nulls — undetectable by oracle comparison
    because the oracle replayed the same count(*).
  * The ORDERING-BASED time operators (lag-gap sessionize family,
    window_cumsum's running sum, the as-of join) adopted the same
    drop-null-event-time contract in round 13: the engine filters
    ``ts IS NOT NULL`` before ordering (an unstamped event has no
    place in a time-ordered computation, and Spark orders NULLS FIRST
    where DuckDB orders NULLS LAST), every oracle carries the same
    predicate, and the gap-bucket family drops null ts in its shared
    bucket collapse (a null ts previously emitted a phantom
    (user, NULL) session per user on the skew-safe route — ADVICE
    r12).  The r12 must-fail pins flipped to green sweep rows.
"""

from __future__ import annotations

import glob
import os

import pytest

from dirt_hadoop_similarity_spark.plans.queries import ordered_registry
from oracle_harness import compare_query

REGISTRY = ordered_registry()

#: empty since the r13 rotation landed the drop-null-event-time
#: contract on the ordering-based family; kept as the mechanism for
#: any future known-divergent query
R13_QUEUED_DIVERGENT: set[str] = set()

NULL_RULES = {
    "ts": "event_id % 31 = 8",
    "user_id": "event_id % 29 = 3",
    "value": "event_id % 23 = 5",
    "props": "event_id % 19 = 2",
}


@pytest.fixture(scope="module")
def evnull_dir(tmp_path_factory):
    import duckdb

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("evnull_tables")
    conn = duckdb.connect()
    for p in sorted(glob.glob(f"{src}/*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        if t == "events":
            cols = [
                r[0]
                for r in conn.execute(
                    f"DESCRIBE SELECT * FROM '{p}'"
                ).fetchall()
            ]
            sel = [
                f'CASE WHEN {NULL_RULES[c]} THEN NULL ELSE "{c}" END AS "{c}"'
                if c in NULL_RULES
                else f'"{c}"'
                for c in cols
            ]
            conn.execute(
                f"COPY (SELECT {', '.join(sel)} FROM '{p}') TO "
                f"'{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            conn.execute(
                f"COPY (SELECT * FROM '{p}') TO '{dst}/{t}.parquet' "
                "(FORMAT PARQUET)"
            )
    conn.close()
    return str(dst)


@pytest.fixture(scope="module")
def evnull_spark(spark):
    """Vanilla driver-shape session (the test_oracle_all discipline)."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle_with_event_nulls(name, evnull_spark, evnull_dir):
    r = compare_query(evnull_spark, name, evnull_dir)
    if name in R13_QUEUED_DIVERGENT:
        # pinned: both engines run and agree on columns; the values (or
        # null-bucket row counts) diverge for the documented ordering
        # reason.  If this starts PASSING, the r13 fix landed — remove
        # the name from the whitelist.
        assert r["cols_match"], r
        assert not r["ok"], (
            f"{name} now matches its oracle on the events-null corpus — "
            "the r13 null-event-time fix must remove it from "
            "R13_QUEUED_DIVERGENT so regressions are caught"
        )
        return
    assert r["ok"], {k: v for k, v in r.items() if k != "name"}


def test_divergence_whitelist_is_current():
    missing = R13_QUEUED_DIVERGENT - set(REGISTRY)
    assert not missing, missing
