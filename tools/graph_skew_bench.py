"""Degree-skew the graph operators (VERDICT r9 task 7): components and
PageRank are measured at uniform 10x/30x/100x (PERF.md), but a real
dedup graph has hubs — boilerplate text whose near-dup cluster touches a
large fraction of the corpus.  This harness generates the graph analogue
of the lineitem hot key: one hub node carrying ~30% of all edge
endpoints, vs a uniform random graph at CONSTANT |V| and |E|, and times
the two iterative operators on both, interleaved min-over-repeats
(scale_bench's estimator).

Why the hub should be absorbed, per round, by design:

  * ``connected_components_star`` — each round's relabeling is a keyed
    join + groupBy-min; the hub's fan-in collapses map-side (partial
    min per input partition) before the shuffle, so the hub's reducer
    receives |partitions| rows, not |degree|.
  * ``pagerank`` — the per-round mass transfer is an |edges|-keyed join
    + groupBy-sum with the same partial-aggregation property.

The measured pass bar: skew/uniform time ratio stays near 1 (no
straggler), while the degree profile confirms the hub is real (x_avg in
the thousands).  A ratio well above the documented environmental band
names the operator to fix — which round 10 did: the plain pagerank's
per-round SMJ measured 1.5-1.6x on the hub graph (AQE skew split
silent — the hot partition sits below its production bytes threshold
at this absolute size), so ``pagerank(salt=8)`` wires the salted-join
mitigation (hub ratio 1.07x measured) and is timed here alongside the
plain variant; ``salt="auto"`` routes by probing the degree relation.

Run:  python tools/graph_skew_bench.py [--nodes 1000000]
          [--edges 5000000] [--hub-pct 30] [--repeats 2] [--markdown]
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


def gen_edges(spark, out_root: str, n_nodes: int, n_edges: int,
              hub_pct: int) -> dict[str, str]:
    """Write uniform/ and hub-skewed/ edge tables (id_a, id_b) —
    deterministic hash-derived endpoints, node 0 is the hub."""
    dirs = {}
    for kind in ("uniform", "hub"):
        # ADVICE r10: encode every generation parameter in the path —
        # a parameter change regenerates instead of silently reusing a
        # stale corpus labeled with the new parameters (hub_pct only
        # shapes the hub corpus, so uniform omits it and stays shared)
        tag = f"{int(n_nodes)}x{int(n_edges)}"
        if kind == "hub":
            tag += f"_h{int(hub_pct)}"
        out = os.path.join(out_root, f"graph_{kind}_{tag}")
        dirs[kind] = out
        dest = os.path.join(out, "edges.parquet")
        if os.path.exists(dest):
            continue
        a_uni = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes))
        b = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes))
        if kind == "hub":
            a = F.when(
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100)) < hub_pct,
                F.lit(0),
            ).otherwise(a_uni)
        else:
            a = a_uni
        (
            spark.range(n_edges)
            .select(a.cast("long").alias("id_a"),
                    b.cast("long").alias("id_b"))
            .write.mode("overwrite")
            .parquet(dest)
        )
    return dirs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--hub-pct", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=2,
                    help="timing passes; minimum 2 — leg order "
                         "alternates to cancel first-leg warm-up bias")
    ap.add_argument("--out", default="/tmp/dhs_scale")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    from dirt_hadoop_similarity_spark.operators import components, scale
    from dirt_hadoop_similarity_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="dhs-graph-skew", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={"spark.driver.memory": mem})

    dirs = gen_edges(spark, args.out, args.nodes, args.edges, args.hub_pct)

    def edges(kind):
        return spark.read.parquet(f"{dirs[kind]}/edges.parquet")

    # degree diagnosis: is the hub real?
    prof = {
        kind: [
            {"key": r["key"], "n": r["n"], "x_avg": r["x_avg"]}
            for r in scale.key_skew_profile(
                edges(kind), "id_a", top=3
            ).collect()
        ]
        for kind in dirs
    }

    ops = {
        "components_star": lambda e: components.connected_components_star(e),
        "pagerank": lambda e: components.pagerank(e, iters=5),
        # the wired mitigation for the hub straggler the plain variant
        # measures: per-round salted rank->edge join (bit-identical
        # output; operators/components.pagerank docstring)
        "pagerank_salted": lambda e: components.pagerank(e, iters=5,
                                                         salt=8),
    }
    secs: dict[tuple[str, str], float] = {}
    for i in range(args.repeats):
        legs = ("uniform", "hub") if i % 2 == 0 else ("hub", "uniform")
        for op_name, fn in ops.items():
            for kind in legs:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(edges(kind)).write.format("noop").mode(
                    "overwrite").save()
                el = round(time.perf_counter() - t0, 3)
                key = (op_name, kind)
                secs[key] = min(secs.get(key, el), el)
    spark.stop()

    report = {
        "metric": "graph_skew", "nodes": args.nodes, "edges": args.edges,
        "hub_pct": args.hub_pct, "repeats": args.repeats,
        "degree_profile": prof,
        "ops": {
            n: {
                "uniform_sec": secs[(n, "uniform")],
                "hub_sec": secs[(n, "hub")],
                "ratio": round(
                    secs[(n, "hub")] / max(secs[(n, "uniform")], 1e-9), 2
                ),
            }
            for n in ops
        },
    }
    print(json.dumps(report))
    if args.markdown:
        print()
        print("| operator | uniform s | hub s | ratio |")
        print("|---|---|---|---|")
        for n, r in report["ops"].items():
            print(f"| {n} | {r['uniform_sec']} | {r['hub_sec']} | "
                  f"{r['ratio']}x |")


if __name__ == "__main__":
    main()
