"""Measure how the heaviest registered queries scale with corpus size —
the evidence behind PERF.md's 100 TB design claims (VERDICT r6/r7: plan
shape alone is an argument, not a measurement).

Runs each query at the base sf dir AND at an N× replica corpus built by
tools/gen_scale_corpus.py, with bench.py's methodology (isolated cache,
noop sink, min over repeats) plus INTERLEAVED legs — each pass times
(query@base, query@scaled) adjacently with leg order alternating across
passes, because running one leg to completion first hands the other all
the JVM warm-up (measured 1.3-4.2× first-leg bias on identical data).
Reports per-query:

  * seconds at each scale and the time ratio;
  * OUTPUT ROWS at each scale and the row ratio — the candidate-growth
    diagnostic: a banded/bucketed candidate generator whose output grows
    ~linearly is scale-safe, one whose output grows ~quadratically has a
    fan-out problem no partitioning will save.

A time ratio near or below the data ratio (after subtracting fixed
startup/stage-scheduling overhead, which dominates sub-second queries at
sf0.1) is the pass bar; super-linear growth names the query to fix.

Run:  python tools/scale_bench.py [--mult 10] [--repeats 2]
          [--queries name1,name2,...]
Prints one JSON line; paste the table into PERF.md via --markdown.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The heaviest cost classes by BENCH_r07 plus the named VERDICT r7 set:
# inverted-index all-pairs + kNN, the full DIRT pipeline, iterative graph
# (PageRank + star components), the 5-stage curation funnel, exact
# tercile tiering, cross-split contamination (MinHash chain), and two
# non-document anchors (heavy agg over lineitem, stateful sessionize
# over events) so fact-table scaling is covered too.
DEFAULT_QUERIES = [
    "text_cosine_pairs",
    "text_cosine_topk",
    "dirt_full_pipeline",
    "dedup_pagerank",
    "dedup_components_ls",
    "curation_funnel",
    "lm_perplexity_tiers",
    "split_contamination",
    "q1_pricing_summary",
    "sessionize",
]


def _time_queries_interleaved(spark, queries, base_dir: str,
                              scaled_dir: str, repeats: int):
    """Time every query at BOTH scales with the legs interleaved.

    Running one leg to completion before the other (the round-8 shape)
    hands the second leg all the JVM/JIT/codegen warmth the first leg
    paid for: a base-vs-base control run measured the first leg 1.3-4.2x
    slower on IDENTICAL data (curation_funnel 16.7s -> 3.95s), which is
    bias larger than the effect being measured.  Instead, each pass runs
    (query@base, query@scaled) adjacently, and the leg order flips on
    alternating passes, so with min-over->=2-passes each leg's minimum
    comes from an equally warm position.
    """
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    if repeats < 2:
        # with one pass the leg order never alternates (base always
        # first), silently reintroducing the exact first-leg warm-up
        # bias the interleaving exists to remove (ADVICE r9)
        print(
            "WARNING: --repeats 1 never alternates leg order; the "
            "first-timed leg eats the 1.3-4.2x JVM warm-up bias. Use "
            "--repeats >= 2 for comparable ratios.",
            file=sys.stderr,
        )

    secs: dict[tuple[str, str], float] = {}
    rows: dict[tuple[str, str], int] = {}

    def one(name: str, sf_dir: str) -> None:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        key = (name, sf_dir)
        secs[key] = min(secs.get(key, el), el)

    for i in range(repeats):
        legs = (base_dir, scaled_dir) if i % 2 == 0 else (
            scaled_dir, base_dir)
        for name in queries:
            for sf_dir in legs:
                one(name, sf_dir)
    for name in queries:
        for sf_dir in (base_dir, scaled_dir):
            spark.catalog.clearCache()
            rows[(name, sf_dir)] = QUERIES[name].fn(spark, sf_dir).count()
    base_s = {n: secs[(n, base_dir)] for n in queries}
    base_r = {n: rows[(n, base_dir)] for n in queries}
    scaled_s = {n: secs[(n, scaled_dir)] for n in queries}
    scaled_r = {n: rows[(n, scaled_dir)] for n in queries}
    return base_s, base_r, scaled_s, scaled_r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scaled", default=None,
                    help="default: /tmp/dhs_scale/x<mult>")
    ap.add_argument("--repeats", type=int, default=2,
                    help="timing passes per leg; MINIMUM 2 for unbiased "
                         "ratios (leg order alternates across passes — "
                         "a single pass re-admits first-leg warm-up "
                         "bias)")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--markdown", action="store_true",
                    help="also print the PERF.md table")
    args = ap.parse_args()
    scaled = args.scaled or f"/tmp/dhs_scale/x{args.mult}"
    queries = args.queries.split(",")

    from dirt_hadoop_similarity_spark.session import get_spark
    from dirt_hadoop_similarity_spark.plans import (  # noqa: F401
        queries_analytics,
        queries_ext,
        queries_more,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Spark's 1g driver-memory default is the LOCAL-MODE heap for all N
    # task threads — fine at sf0.1, GCLocker-thrash death at 10×.  Size
    # the heap like a real executor would be sized (must be set before
    # the JVM launches, so it cannot ride spark.conf.set).
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="dhs-scale-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={"spark.driver.memory": mem})
    # Warm up the JVM/codegen on whatever table the scaled dir actually
    # has — gen_scale_corpus --tables can omit documents (ADVICE r8), and
    # the dims are always present, so fall back to any parquet found.
    import glob as _glob
    warm = sorted(
        _glob.glob(os.path.join(scaled, "documents.parquet"))
        or _glob.glob(os.path.join(scaled, "*.parquet"))
    )
    if warm:
        spark.read.parquet(warm[0]).count()

    base_s, base_r, scaled_s, scaled_r = _time_queries_interleaved(
        spark, queries, args.base, scaled, args.repeats)
    spark.stop()

    report = {
        name: {
            "base_sec": base_s[name], "scaled_sec": scaled_s[name],
            "time_ratio": round(scaled_s[name] / max(base_s[name], 1e-9), 2),
            "base_rows": base_r[name], "scaled_rows": scaled_r[name],
            "row_ratio": round(scaled_r[name] / max(base_r[name], 1), 2),
        }
        for name in queries
    }
    print(json.dumps({
        "metric": "scale_ratio", "mult": args.mult, "base": args.base,
        "scaled": scaled, "repeats": args.repeats, "queries": report,
    }))
    if args.markdown:
        base_lbl = os.path.basename(args.base.rstrip("/"))
        scaled_lbl = os.path.basename(scaled.rstrip("/"))
        print()
        print(f"| query | {base_lbl} s | {scaled_lbl} s | time ratio | "
              f"{base_lbl} rows | {scaled_lbl} rows | row ratio |")
        print("|---|---|---|---|---|---|---|")
        for n, r in report.items():
            print(f"| {n} | {r['base_sec']} | {r['scaled_sec']} | "
                  f"{r['time_ratio']}x | {r['base_rows']} | "
                  f"{r['scaled_rows']} | {r['row_ratio']}x |")


if __name__ == "__main__":
    main()
