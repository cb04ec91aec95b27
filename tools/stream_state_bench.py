"""Measure Structured Streaming STATE at scale — the evidence VERDICT r8
task 4 asked for: scale_bench times batch queries, but a streaming
operator's real 100 TB risk is state-store growth, which wall time alone
hides.  This harness drives the two stateful streaming operators with
the largest state classes over a corpus dir and reports, per query:

  * wall seconds for the availableNow-style full replay;
  * output rows;
  * final state rows + state bytes, read from the streaming query's own
    progress metrics (``lastProgress.stateOperators``) — the number that
    must stay watermark-bounded as volume grows.

Queries:
  * ``dedup`` — dropDuplicatesWithinWatermark over a DOUBLED event
    stream (every event delivered twice, the at-least-once shape).
    State = keys within the watermark horizon.  The testdata's event
    times span days while the watermark is sized to the span, so on
    this corpus state holds every key — the WORST case; the measured
    point is that state rows track |events within horizon| exactly and
    never exceed it.
  * ``interval_join`` — the stream-stream purchases-before-errors join;
    state = both sides' rows within the join horizon.

Pass ``--dirs`` base and scaled corpus dirs; ratios print alongside so
"state grows like volume within the horizon, not superlinearly" is a
number, not a claim.

Run:  python tools/stream_state_bench.py \
          [--dirs /root/testdata/sf0.1,/tmp/dhs_scale/x10] [--markdown]
Prints one JSON line (+ optional markdown table for PERF.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _drain(df, name: str):
    """Run a streaming frame to a memory sink until exhausted; return
    (seconds, output_rows, state_rows, state_bytes)."""
    spark = df.sparkSession
    t0 = time.perf_counter()
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # the LAST progress entry with state operators carries the final
        # store size; processAllAvailable guarantees it exists for a
        # stateful query that saw data
        state_rows = state_bytes = 0
        for p in reversed(q.recentProgress):
            ops = p.get("stateOperators") or []
            if ops:
                state_rows = sum(int(o.get("numRowsTotal", 0)) for o in ops)
                state_bytes = sum(
                    int(o.get("memoryUsedBytes", 0)) for o in ops
                )
                break
    finally:
        q.stop()
    secs = round(time.perf_counter() - t0, 3)
    out_rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return secs, out_rows, state_rows, state_bytes


def run_one(spark, sf_dir: str) -> dict:
    from dirt_hadoop_similarity_spark.streaming import events as sev

    res = {}
    doubled = sev.stream_events(spark, sf_dir).unionByName(
        sev.stream_events(spark, sf_dir)
    )
    # watermark sized to the corpus' full span (the registry query's
    # setting): every key is in-horizon → state == |distinct events|,
    # the measured worst case
    s, o, sr, sb = _drain(
        sev.dedup_events(doubled, watermark="30 days"), "ssb_dedup"
    )
    res["dedup"] = {"sec": s, "out_rows": o, "state_rows": sr,
                    "state_bytes": sb}

    s, o, sr, sb = _drain(
        sev.purchases_before_errors(sev.stream_events(spark, sf_dir)),
        "ssb_ivjoin",
    )
    res["interval_join"] = {"sec": s, "out_rows": o, "state_rows": sr,
                            "state_bytes": sb}
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs",
                    default="/root/testdata/sf0.1,/tmp/dhs_scale/x10")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()
    dirs = args.dirs.split(",")

    from dirt_hadoop_similarity_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="dhs-stream-state-bench",
                      master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={"spark.driver.memory": mem})

    report = {d: run_one(spark, d) for d in dirs}
    spark.stop()
    print(json.dumps({"metric": "stream_state", "dirs": dirs,
                      "report": report}))
    if args.markdown and len(dirs) == 2:
        base, scaled = dirs
        print()
        print("| query | base s | scaled s | base out | scaled out | "
              "base state rows | scaled state rows | state-row ratio | "
              "base state MiB | scaled state MiB |")
        print("|---|---|---|---|---|---|---|---|---|---|")
        for qn in report[base]:
            b, s = report[base][qn], report[scaled][qn]
            ratio = round(s["state_rows"] / max(b["state_rows"], 1), 2)
            print(f"| {qn} | {b['sec']} | {s['sec']} | {b['out_rows']} | "
                  f"{s['out_rows']} | {b['state_rows']} | "
                  f"{s['state_rows']} | {ratio}x | "
                  f"{round(b['state_bytes'] / 2**20, 1)} | "
                  f"{round(s['state_bytes'] / 2**20, 1)} |")


if __name__ == "__main__":
    main()
