"""Every registered query runs against its DuckDB oracle on every
pytest run — the local replica of the driver's correctness gate.

This closes round 2's verification hole: the driver samples only the
first ``DRIVER_WINDOW`` registry entries per round, so for the deferred
tail (``queries._DEFERRED``) THIS test is the per-round gate.  A query
can no longer ship with an oracle that has never been executed.

The session is a ``newSession()`` with the events-nanos conf forced
back to the driver's vanilla default, so any conf a query needs must be
set in the query path itself (the round-1 lesson: the tuned test
session masked a 7-query driver failure).
"""

from __future__ import annotations

import pytest

from dirt_hadoop_similarity_spark.plans.queries import (
    DRIVER_WINDOW,
    ordered_registry,
)
from oracle_harness import compare_query

REGISTRY = ordered_registry()


@pytest.fixture(scope="module")
def oracle_spark(spark):
    s = spark.newSession()
    # Replicate the driver's vanilla session where it bit us before:
    # events.parquet is TIMESTAMP(NANOS) and the QUERY PATH must set
    # nanosAsLong itself (plans/queries.load), not inherit it.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle(name, oracle_spark, sf_dir):
    r = compare_query(oracle_spark, name, sf_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "name"}


def _driver_checked_queries() -> set[str]:
    """Names with at least one driver row across ALL committed
    CORRECTNESS_r*.json files — a HASH-green oracle row (rows_match
    alone is not evidence the values matched; ADVICE r8), or (for the
    whitelisted rows-only queries) a recorded rows-only run."""
    import glob
    import json
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for p in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(p)).items():
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                seen.add(name)
    return seen


def test_driver_window_contract():
    """Queries needing a fresh driver row this round sit inside the
    window; everything past the window is oracle-backed (gated above).

    VERDICT r7 task 2: the never-driver-checked set is COMPUTED from the
    committed CORRECTNESS_r*.json files, not trusted to the list author
    — "registered a query, forgot the window" is a test failure here,
    not a judge finding.  The companion staleness mode (code changed
    after the last green row) is machine-checked too, by
    test_deferred_plans_unchanged below against the committed
    analyzed-plan fingerprint snapshot.
    """
    from dirt_hadoop_similarity_spark.plans.queries import (
        _PRIORITY,
        _ROWS_ONLY_PAST_WINDOW_OK,
    )

    names = list(REGISTRY)
    head = set(names[:DRIVER_WINDOW])
    missing = set(_PRIORITY) - head
    assert not missing, f"must sit in driver window: {missing}"
    for n in names[DRIVER_WINDOW:]:
        assert (
            REGISTRY[n].oracle is not None
            or n in _ROWS_ONLY_PAST_WINDOW_OK
        ), (
            f"{n} is past the driver window with no oracle — it would "
            "never be value-checked anywhere"
        )
    never = set(names) - _driver_checked_queries()
    past_window_never = never - head
    assert not past_window_never, (
        "registered but never driver-checked AND outside the window — "
        f"rotate these into _PRIORITY: {sorted(past_window_never)}"
    )


def test_registry_size_frozen():
    """Registry-size policy, machine-checked (VERDICT r11 task 5 —
    until now the freeze was a comment in plans/queries.py only).

    The registry holds at 130 with a 50-slot driver window: a full
    evidence sweep already takes ~3 rounds, the documented ceiling for
    "no driver row older than two rounds".  Net-new registrations are
    frozen — a new query must RETIRE an existing one (same operator
    surface, better coverage: delete the old @register, re-back the
    name, or replace the entry outright) so cardinality stays <= 130.
    New OPERATORS still land freely; they back an existing query name
    or earn evidence through pytest.  Escape hatch: if the driver's
    window ever grows past 50, raise REGISTRY_CAP in the same commit
    that documents the new window size in plans/queries.py.
    """
    REGISTRY_CAP = 130
    assert len(REGISTRY) <= REGISTRY_CAP, (
        f"registry grew to {len(REGISTRY)} (> {REGISTRY_CAP}): the "
        "freeze policy requires retiring an existing query per new "
        "registration — see plans/queries.py registry-size policy"
    )


def test_deferred_plans_unchanged(oracle_spark):
    """The contract's second failure mode, machine-checked (VERDICT r7
    found it could only be a review rule — it no longer is): a deferred
    query's analyzed-plan fingerprint must match the committed snapshot
    taken when the window was last rotated.  An operator edit that
    changes any deferred query's plan fails HERE, naming the queries to
    rotate into _PRIORITY (then regenerate the snapshot with
    tools/plan_fingerprints.py).  UDF-body-only changes are the known
    blind spot — covered by each UDF's own pytest suite."""
    import json
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.plan_fingerprints import (
        SF_DIR,
        fingerprint,
        udf_source_hashes,
    )

    from dirt_hadoop_similarity_spark.plans.queries import _DEFERRED

    with open(os.path.join(repo, "tests", "plan_fingerprints.json")) as f:
        snapshot = json.load(f)
    # UDF bodies execute outside the plan text — their modules are
    # hashed whole: an edit demands rotating that module's queries even
    # though no plan changed
    got_udf = udf_source_hashes()
    changed_udf = [
        rel for rel, h in got_udf.items()
        if snapshot.get("__udf_sources__", {}).get(rel) != h
    ]
    assert not changed_udf, (
        "UDF-bearing modules changed since the snapshot — rotate their "
        "queries into _PRIORITY and regenerate plan_fingerprints.json: "
        f"{changed_udf}"
    )
    stale = []
    for name in _DEFERRED:
        if name not in REGISTRY:
            continue
        assert name in snapshot, (
            f"{name} is deferred but missing from plan_fingerprints.json "
            "— regenerate with tools/plan_fingerprints.py"
        )
        got = fingerprint(REGISTRY[name].fn(oracle_spark, SF_DIR))
        if got != snapshot[name]:
            stale.append(name)
    assert not stale, (
        "deferred queries whose plan changed since the snapshot — their "
        "driver-green rows no longer cover the current code; move them "
        f"into _PRIORITY and regenerate the snapshot: {stale}"
    )


def test_fingerprint_canonicalizer_is_session_stable(spark):
    """Guard for the canonicalizer itself (VERDICT r8 task 7): the same
    query fingerprinted in two FRESH sessions must hash identically —
    every session-dependent counter Spark injects into the analyzed
    plan (expression ids, lambda variable ids, CTE ids, split counts)
    must be stripped by tools.plan_fingerprints.canonical_plan.  If
    Spark grows a NEW nondeterminism source, this test fails as
    "canonicalizer gap" with the first differing plan line, instead of
    the rotation contract failing spuriously as "stale plan".

    The sample set exercises each strip rule: joins/aggregates
    (expression ids), higher-order functions (lambda ids), the SQL
    front-end (CTE ids), and a repartition-bearing plan (split counts).
    """
    import difflib
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.plan_fingerprints import SF_DIR, canonical_plan

    samples = [
        "dirt_sim",              # joins, aggregates, caches
        "dedup_minhash_lsh",     # transform/filter lambdas
        "sql_monthly_top_orders",  # SQL front-end: CTEs, window
        "dirt_extract_counts",   # repartition + pandas-UDF extraction
    ]
    for name in samples:
        plans = [
            canonical_plan(REGISTRY[name].fn(spark.newSession(), SF_DIR))
            for _ in range(2)
        ]
        if plans[0] != plans[1]:
            diff = "\n".join(
                difflib.unified_diff(
                    plans[0].splitlines(), plans[1].splitlines(), lineterm=""
                )
            )[:2000]
            raise AssertionError(
                f"canonicalizer gap: {name} fingerprints differently in "
                f"two fresh sessions — a new nondeterminism source needs "
                f"a strip rule in tools/plan_fingerprints.canonical_plan:\n"
                f"{diff}"
            )


def test_entry_contract(oracle_spark, sf_dir):
    """The driver's smoke check, locally: entry() runs on a vanilla-conf
    session and yields rows with a stable schema; queries()/oracle_sql()
    keys line up."""
    import __spark_entry__ as e

    df = e.entry(oracle_spark)
    assert df.columns == ["p1", "p2", "score"]
    assert len(df.take(1)) == 1
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(fn) for fn in qs.values())
