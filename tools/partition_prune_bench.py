"""Measure what the date-partitioned write path actually buys at scale:
planning-time partition pruning on a time-ranged query (VERDICT r10
task 4 — the write path landed in round 10 with plan-pinned tests;
this adds the 10x measured evidence).

Writes the source events table Hive-partitioned by event date
(operators/scale.write_date_partitioned) next to an UNPARTITIONED
parquet copy of the same rows, then times one day's aggregation
against both layouts, interleaved (memory: first-leg JVM warm-up bias
is 1.3-4.2x — never time base-then-scaled sequentially).  Alongside
wall time it records the physical evidence that doesn't breathe with
the host: the file count each plan actually reads (DataFrame.inputFiles
reflects post-pruning file-index listing) and whether PartitionFilters
made it into the scan.

Run:  python tools/partition_prune_bench.py [--dir /root/testdata/sf0.1]
          [--out /tmp/dhs_prune] [--repeats 2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


DAY = "2024-01-15"  # mid-range of the testdata's 30 event days


def sum_numfiles(node) -> int:
    """Recursive walk to every scan's numFiles metric.  Under AQE the
    executed plan's collectLeaves() stops at ShuffleQueryStageExec —
    the FileSourceScanExec is nested inside the stage — so descend
    through AdaptiveSparkPlanExec (.executedPlan()) and *QueryStageExec
    (.plan()) wrappers explicitly (ADVICE r11: the leaf-only version
    summed 0 on any shuffle-bearing query; pinned by
    tests/test_scale_tools.py::test_sum_numfiles_sees_through_aqe)."""
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        return sum_numfiles(node.executedPlan())
    if cls.endswith("QueryStageExec"):
        return sum_numfiles(node.plan())
    if cls == "ReusedExchangeExec":
        return sum_numfiles(node.child())
    total = 0
    m = node.metrics()
    if m.contains("numFiles"):
        total += m.apply("numFiles").value()
    it = node.children().iterator()
    while it.hasNext():
        total += sum_numfiles(it.next())
    return total


def files_scanned(df) -> int:
    """Post-pruning file count from the EXECUTED scan's numFiles metric
    (DataFrame.inputFiles lists the relation's whole file index, pruned
    or not)."""
    df.collect()
    return sum_numfiles(df._jdf.queryExecution().executedPlan())


def day_rollup(df, partitioned: bool):
    """The measured query: one day's per-type event counts — the
    time-ranged access pattern the partition layout exists for.  The
    partitioned layout additionally gets the equivalent partition-key
    predicate (that is the deployment contract: time-ranged readers
    filter the partition column); the flat layout can only row-filter
    inside every file it opens.  Both produce identical values."""
    q = df.filter(
        (F.col("ts") >= DAY) & (F.col("ts") < "2024-01-16")
    )
    if partitioned:
        q = q.filter(F.col("event_date") == DAY)
    return q.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mult", type=int, default=10,
                    help="replicate events this many times before the "
                         "write (10 = the campaign's x10 leg)")
    ap.add_argument("--out", default="/tmp/dhs_prune")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    if args.repeats < 1:
        ap.error("--repeats must be >= 1 (timing needs at least one "
                 "pass; min-of-2 interleaved is the estimator)")

    from dirt_hadoop_similarity_spark.operators import scale
    from dirt_hadoop_similarity_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="dhs-prune-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    # x-mult replica: shift event ids per copy, keep timestamps (the
    # partition key distribution is the thing under test)
    base = spark.read.parquet(f"{args.dir}/events.parquet")
    n_base = base.count()
    ev = base
    if args.mult > 1:
        ev = base.crossJoin(
            spark.range(args.mult).select(F.col("id").alias("_copy"))
        ).withColumn(
            "event_id",
            F.col("event_id") + F.col("_copy") * F.lit(10_000_000_000),
        ).drop("_copy")

    # the flat layout gets the SAME file count as the partitioned one
    # has date dirs, hash-distributed so every file spans all dates
    # (parquet min/max row-group stats can't skip — the realistic
    # un-partitioned table shape); otherwise a small input collapses to
    # ONE flat file and the files-read contrast degenerates to 1-vs-1
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    part_path = os.path.join(args.out, f"events_part_x{args.mult}")
    flat_path = os.path.join(args.out, f"events_flat_x{args.mult}")
    if not os.path.exists(part_path):
        scale.write_date_partitioned(ev, part_path)
    if not os.path.exists(flat_path):
        ev.repartition(n_days).write.mode("overwrite").parquet(flat_path)

    part = spark.read.parquet(part_path)
    flat = spark.read.parquet(flat_path)
    part_q = day_rollup(part, partitioned=True)
    flat_q = day_rollup(flat, partitioned=False)

    # physical evidence, independent of host breathing: the file count
    # each plan actually reads (post-pruning), and the PartitionFilters
    # entry in the scan node
    files_part = files_scanned(part_q)
    files_flat = files_scanned(flat_q)
    plan = part_q._jdf.queryExecution().executedPlan().toString()
    has_part_filters = "PartitionFilters: [" in plan and \
        "event_date" in plan.split("PartitionFilters", 1)[1][:200]

    part_s = flat_s = None
    for i in range(args.repeats):
        pair = [("part", part_q), ("flat", flat_q)]
        if i % 2:
            pair.reverse()
        for kind, df in pair:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            if kind == "part":
                part_s = el if part_s is None else min(part_s, el)
            else:
                flat_s = el if flat_s is None else min(flat_s, el)

    # value identity: both layouts answer the day query identically
    a = {tuple(r) for r in part_q.collect()}
    b = {tuple(r) for r in flat_q.collect()}
    assert a == b, "partitioned and flat layouts disagree on the day query"

    spark.stop()
    print(json.dumps({
        "metric": "partition_prune", "mult": args.mult,
        "base_rows": n_base, "repeats": args.repeats,
        "partitioned_sec": round(part_s, 3), "flat_sec": round(flat_s, 3),
        "speedup": round(flat_s / max(part_s, 1e-9), 2),
        "files_read_partitioned": files_part,
        "files_read_flat": files_flat,
        "files_total_each_layout": n_days,
        "partition_filters_in_plan": bool(has_part_filters),
    }))


if __name__ == "__main__":
    main()
