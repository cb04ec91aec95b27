"""Skew the DIRT path distribution ITSELF and measure the engine's own
flagship on it (VERDICT r9 task 4).

SURVEY §7.3 names skewed path frequencies — a handful of linguistic
paths like `have` / `be in` carrying a large share of all extractions
(DirtDriver.java:404-411 context) — as the real 100x-scale risk for the
MI/similarity pipeline.  tools/skew_check.py measures skew mechanics on
the generic TPC-H tables; this harness generates the NAMED risk and runs
the DIRT queries themselves:

  * two synthetic document corpora at CONSTANT volume (same doc count,
    same 6-token sentence shape): `dirt_uniform` draws the verb and the
    source uniformly from 500-value vocabularies; `dirt_skew` puts ~50%
    of all docs on 2 hot verbs AND 2 hot sources (the `have`/`be in`
    frequency shape — spelled with non-auxiliary stand-in verbs, since
    the engine's P4 stoplist deliberately DROPS literal have/be before
    extraction ever sees them);
  * the verb skews dirt_extract_counts / dirt_full_pipeline, whose path
    is the stemmed verb; the source skews dirt_mi, whose path is the
    source column — so every DIRT path-keyed aggregate and join sees a
    hot key;
  * timing is interleaved min-over-repeats (scale_bench's estimator),
    uniform vs skewed — the ratio IS the straggler diagnosis;
  * the mitigation claim is plan-checked on the skewed corpus: the
    triple count and the path-margin sum must both run a PARTIAL
    aggregate below the exchange (positional check, same discipline as
    skew_check), which collapses the hot path to one row per input
    partition per distinct group before any shuffle.

Run:  python tools/dirt_skew_check.py [--docs 500000] [--repeats 2]
          [--out /tmp/dhs_scale] [--markdown]
Prints one JSON line; exit 1 if a partial aggregate is missing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

# the `have` / `be in` frequency shape with non-auxiliary spellings:
# P4's 23-word stoplist drops literal have/be at parse time, which would
# delete the skew instead of exercising it
HOT_VERBS = ("contain", "hold")
HOT_SHARE_PCT = 50


def _h(seed: int, mod: int):
    return F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(mod))


def gen_corpora(spark, out_root: str, n_docs: int) -> dict[str, str]:
    """Write dirt_uniform/ and dirt_skew/ documents tables (schema
    matches the testdata documents: doc_id, text, lang, source,
    n_chars).  Deterministic (hash-derived), constant volume."""
    dirs = {}
    for kind in ("uniform", "skew"):
        # ADVICE r10: the generation parameter lives in the directory
        # name, so rerunning with a different --docs can never silently
        # reuse a stale corpus labeled with the new size
        out = os.path.join(out_root, f"dirt_{kind}_{int(n_docs)}")
        dirs[kind] = out
        if os.path.exists(os.path.join(out, "documents.parquet")):
            continue
        hot = _h(9, 100) < HOT_SHARE_PCT
        uni_verb = F.concat(F.lit("v"), _h(1, 500).cast("string"))
        uni_src = F.concat(F.lit("src"), _h(7, 500).cast("string"))
        if kind == "skew":
            verb = F.when(
                hot,
                F.when(_h(10, 2) == 0, F.lit(HOT_VERBS[0])).otherwise(
                    F.lit(HOT_VERBS[1])
                ),
            ).otherwise(uni_verb)
            src = F.when(
                hot, F.concat(F.lit("srchot"), _h(8, 2).cast("string"))
            ).otherwise(uni_src)
        else:
            verb, src = uni_verb, uni_src
        text = F.concat_ws(
            " ",
            F.concat(F.lit("n"), _h(2, 200).cast("string")),
            verb,
            F.concat(F.lit("m"), _h(3, 200).cast("string")),
            F.concat(F.lit("n"), _h(4, 200).cast("string")),
            F.concat(F.lit("p"), _h(5, 10).cast("string")),
            F.concat(F.lit("m"), _h(6, 200).cast("string")),
        )
        (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                text.alias("text"),
                F.lit("en").alias("lang"),
                src.alias("source"),
                F.length(text).alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out, "documents.parquet"))
        )
    return dirs


def _partial_below_exchange(df, marker: str) -> bool:
    """Positional plan check (skew_check's discipline): the partial
    aggregate marker must first appear BELOW the first Exchange in the
    top-down executed-plan text."""
    df.collect()
    lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
    exch = [i for i, ln in enumerate(lines) if "Exchange" in ln]
    return bool(exch) and any(marker in ln for ln in lines[exch[0] + 1:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="/tmp/dhs_scale")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    from scale_bench import _time_queries_interleaved

    from dirt_hadoop_similarity_spark.operators import counting, scale
    from dirt_hadoop_similarity_spark.plans import (  # noqa: F401
        queries_analytics,
        queries_ext,
        queries_more,
    )
    from dirt_hadoop_similarity_spark.plans.queries import _doc_facts
    from dirt_hadoop_similarity_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="dhs-dirt-skew", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={"spark.driver.memory": mem})

    dirs = gen_corpora(spark, args.out, args.docs)

    # 1. diagnosis: how hot did the path distribution actually get?
    # (facts path = source — dirt_mi's key; extraction-path skew is the
    # same construction on the verb column)
    prof = {
        kind: [
            {"key": r["key"], "n": r["n"], "x_avg": r["x_avg"]}
            for r in scale.key_skew_profile(
                _doc_facts(spark, d).withColumn(
                    "path", F.xxhash64("path")
                ),
                "path", top=3,
            ).collect()
        ]
        for kind, d in dirs.items()
    }

    # 2. uniform vs skewed timing at constant volume, interleaved
    queries = ["dirt_extract_counts", "dirt_mi", "dirt_full_pipeline"]
    base_s, base_r, sk_s, sk_r = _time_queries_interleaved(
        spark, queries, dirs["uniform"], dirs["skew"], args.repeats
    )

    # 3. mitigation plan check on the SKEWED corpus: triple count and
    # path-margin sum both partial-aggregate below the exchange
    facts = _doc_facts(spark, dirs["skew"])
    triples = counting.triples(facts)
    # marker "partial_" covers the planner's spelling of each partial
    # aggregate (the triple count compiles to partial_sum(1), not
    # partial_count)
    checks = {
        "triples_partial_below_exchange": _partial_below_exchange(
            triples, "partial_"
        ),
        "path_margins_partial_below_exchange": _partial_below_exchange(
            counting.path_margins(triples), "partial_"
        ),
    }
    spark.stop()

    report = {
        "metric": "dirt_skew", "docs": args.docs,
        "hot_share_pct": HOT_SHARE_PCT, "repeats": args.repeats,
        "hot_paths": prof,
        "queries": {
            n: {
                "uniform_sec": base_s[n], "skew_sec": sk_s[n],
                "ratio": round(sk_s[n] / max(base_s[n], 1e-9), 2),
                "uniform_rows": base_r[n], "skew_rows": sk_r[n],
            }
            for n in queries
        },
        **checks,
    }
    print(json.dumps(report))
    if args.markdown:
        print()
        print("| query | uniform s | skew s | ratio | uniform rows | "
              "skew rows |")
        print("|---|---|---|---|---|---|")
        for n in queries:
            q = report["queries"][n]
            print(f"| {n} | {q['uniform_sec']} | {q['skew_sec']} | "
                  f"{q['ratio']}x | {q['uniform_rows']} | "
                  f"{q['skew_rows']} |")
    if not all(checks.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
