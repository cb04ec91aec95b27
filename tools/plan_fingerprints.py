"""Per-query ANALYZED-plan fingerprints — the machine check for the
driver-window contract's second failure mode.

The contract (plans/queries.py): a query may sit in the deferred tail
only while its code is UNCHANGED since its last driver-green row.  The
"never had a row" mode is computed from the committed CORRECTNESS files
(tests/test_oracle_all.py); this module closes the "changed since its
row" mode: the committed ``tests/plan_fingerprints.json`` snapshots a
canonical hash of every query's analyzed logical plan, and
``tests/test_oracle_all.py::test_deferred_plans_unchanged`` fails if a
deferred query's current plan no longer matches — "edited an operator,
forgot to rotate its queries into the window" becomes a test failure,
not a judge finding.

Why the ANALYZED plan (pre-optimization): it reflects the user code
directly, and the optimizer is where cross-session nondeterminism lives
(observed: RewriteDistinctAggregates orders two countDistinct rewrites
by hash-set iteration).  Canonicalization strips the remaining
session-dependent counters: expression ids (``#123``), lambda variable
ids (``lambda x_17#``), CTE definition ids (``CTERelationDef 3``).

Known limitation (documented, accepted): a change INSIDE a Python UDF
body does not alter the plan text, so UDF-backed queries (extraction
UDTF, media_*, stateful streaming) need their pytest suites — which
they have — not this check.  Plan-shape changes, new columns, changed
literals, reordered stages: all caught.

Regenerate (after every rotation, or when a PRIORITY query's plan
legitimately changes):  python tools/plan_fingerprints.py
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "plan_fingerprints.json")
SF_DIR = "/root/testdata/sf0.001"


def canonical_plan(df) -> str:
    """The analyzed logical plan with session-dependent counters
    stripped (expression ids, lambda variable ids, CTE ids)."""
    s = df._jdf.queryExecution().analyzed().toString()
    s = re.sub(r"#\d+L?", "#", s)
    s = re.sub(r"\blambda ([A-Za-z]+)_\d+#", r"lambda \1#", s)
    s = re.sub(r"\bCTERelation(Def|Ref) \d+", r"CTERelation\1 N", s)
    # partition counts derive from the session's parallelism (operators
    # size repartitions off defaultParallelism), not from query code
    s = re.sub(r"\bRepartition \d+", "Repartition N", s)
    s = re.sub(r"\bRepartitionByExpression (\[[^\]]*\]), \d+",
               r"RepartitionByExpression \1, N", s)
    s = re.sub(r"splits=Some\(\d+\)", "splits=Some(N)", s)
    return s


def fingerprint(df) -> str:
    return hashlib.sha256(canonical_plan(df).encode()).hexdigest()[:16]


def compute_all(spark, sf_dir: str = SF_DIR) -> dict[str, str]:
    from dirt_hadoop_similarity_spark.plans.queries import ordered_registry

    reg = ordered_registry()
    return {name: fingerprint(q.fn(spark, sf_dir)) for name, q in reg.items()}


def main() -> None:
    from dirt_hadoop_similarity_spark.session import get_spark

    spark = get_spark(app_name="dhs-plan-fingerprints", master="local[8]",
                      shuffle_partitions=8)
    fps = compute_all(spark)
    spark.stop()
    with open(SNAPSHOT, "w") as f:
        json.dump(fps, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(fps)} fingerprints to {SNAPSHOT}")


if __name__ == "__main__":
    main()
