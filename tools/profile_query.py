"""Per-stage profile of one bench query from the Spark event log.

Runs the named bench queries exactly as bench.py times them (isolated
cache, noop sink) with spark.eventLog enabled, then parses the event
log into a per-job / per-stage cost table: wall span, summed task
time, shuffle bytes, input bytes, task count.  The output answers
"where do the seconds actually go" — the guide's §1 empirical loop —
without a live UI in this headless sandbox.

Run:  python tools/profile_query.py <query>[,<query>...] [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/dhs_eventlog"


def profile(spark, log_path: str) -> None:
    jobs = {}          # jobId -> dict
    stages = {}        # stageId -> dict
    with open(log_path) as f:
        for line in f:
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                }
            elif t == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages.setdefault(si["Stage ID"], {}).update({
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                })
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = stages.setdefault(sid, {})
                agg["task_ms"] = agg.get("task_ms", 0) + (
                    m.get("Executor Run Time") or 0
                )
                agg["gc_ms"] = agg.get("gc_ms", 0) + (m.get("JVM GC Time") or 0)
                agg["ser_ms"] = agg.get("ser_ms", 0) + (
                    (m.get("Executor Deserialize Time") or 0)
                    + (m.get("Result Serialization Time") or 0)
                )
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                agg["sh_read"] = agg.get("sh_read", 0) + (
                    (sr.get("Remote Bytes Read") or 0)
                    + (sr.get("Local Bytes Read") or 0)
                )
                agg["fetch_ms"] = agg.get("fetch_ms", 0) + (
                    sr.get("Fetch Wait Time") or 0
                )
                agg["sh_write"] = agg.get("sh_write", 0) + (
                    sw.get("Shuffle Bytes Written") or 0
                )
                inp = m.get("Input Metrics") or {}
                agg["input"] = agg.get("input", 0) + (inp.get("Bytes Read") or 0)

    tot_wall = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        wall = (j["t1"] - j["t0"]) / 1000.0
        tot_wall += wall
        parts = []
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or s.get("t0") is None:
                continue
            parts.append(
                f"    stage {sid} [{s.get('tasks', '?')}t] "
                f"wall={((s.get('t1') or 0) - (s.get('t0') or 0)) / 1000.0:6.2f}s "
                f"task={s.get('task_ms', 0) / 1000.0:7.2f}s "
                f"gc={s.get('gc_ms', 0) / 1000.0:5.2f}s "
                f"ser={s.get('ser_ms', 0) / 1000.0:5.2f}s "
                f"fetch={s.get('fetch_ms', 0) / 1000.0:5.2f}s "
                f"shR={s.get('sh_read', 0) / 1048576.0:7.2f}M "
                f"shW={s.get('sh_write', 0) / 1048576.0:7.2f}M "
                f"in={s.get('input', 0) / 1048576.0:7.2f}M  {s.get('name', '')}"
            )
        print(f"  job {jid:3d} wall={wall:6.2f}s  {j['desc']}")
        for p in parts:
            print(p)
    print(f"  == sum of job walls: {tot_wall:.2f}s "
          f"(gaps between jobs = driver/plan time)")


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else ["dirt_sim"]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from dirt_hadoop_similarity_spark.session import get_spark
    from dirt_hadoop_similarity_spark.plans import (  # noqa: F401
        queries_analytics,
        queries_ext,
        queries_more,
    )
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    spark = get_spark(
        app_name="dhs-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from bench import _release_tracked_caches

    for name in names:
        for rep in range(repeats):
            spark.catalog.clearCache()
            _release_tracked_caches()
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            el = time.perf_counter() - t0
            print(f"\n=== {name} rep{rep}: {el:.3f}s ===")
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    spark.stop()
    time.sleep(1.0)
    logs = [
        os.path.join(EVDIR, p) for p in os.listdir(EVDIR)
        if os.path.isfile(os.path.join(EVDIR, p))
    ]
    profile(None, max(logs, key=os.path.getmtime))


if __name__ == "__main__":
    main()
