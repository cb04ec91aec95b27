"""semantic_dedup cell-scaling leg (VERDICT r13 task 4): demonstrate
that occupancy-scaled cells keep the cell self-join's candidate volume
— and time — growing ~linearly with the corpus, where the fixed 8-bit
grid (the oracle-checkable small-scale default) degrades quadratically
(measured 78.9x at 100x in round 13).

Method: bench.py discipline — interleaved legs, min-of-N, cleared
caches, noop sink.  For each mode (fixed 8-bit grid vs
target_cell_rows=250, which resolves to the SAME 8 bits at the sf0.1
base and to occupancy-scaled bits at x100) and each corpus (base,
x100), report:

  * seconds (min over repeats);
  * candidate pairs: sum over cells of d*(d-1)/2 — the exact size of
    the id_a<id_b cell self-join the operator feeds to the threshold
    filter (computed by a separate cheap aggregation, not inferred);
  * output rows.

Run:  python tools/semantic_cells_bench.py [--mult 100] [--repeats 2]
Requires the gen_scale_corpus.py replica corpus under /tmp/dhs_scale.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def candidate_pairs(spark, path: str, bits: int) -> int:
    from pyspark.sql import functions as F

    from dirt_hadoop_similarity_spark.operators.similarity import sign_bucket

    emb = spark.read.parquet(f"{path}/embeddings.parquet")
    per_cell = (
        emb.select(sign_bucket(F.col("embedding"), bits).alias("cell"))
        .groupBy("cell").agg(F.count(F.lit(1)).alias("d"))
    )
    row = per_cell.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("pairs")
    ).first()
    return int(row["pairs"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--scale-dir", default="/tmp/dhs_scale")
    ap.add_argument("--target", type=int, default=250)
    args = ap.parse_args()

    from dirt_hadoop_similarity_spark.operators import similarity
    from dirt_hadoop_similarity_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    scaled = f"{args.scale_dir}/x{args.mult}"
    legs = []
    for path, tag in ((args.base, "base"), (scaled, f"x{args.mult}")):
        n = spark.read.parquet(f"{path}/embeddings.parquet").count()
        auto_bits = similarity.semantic_dedup_auto_bits(
            n, target_cell_rows=args.target)
        for mode, kw, bits in (
            ("fixed8", {"bits": 8}, 8),
            (f"auto{args.target}", {"target_cell_rows": args.target},
             auto_bits),
        ):
            legs.append({"tag": tag, "mode": mode, "path": path, "n": n,
                         "bits": bits, "kw": kw})

    results = {}
    for leg in legs:
        key = (leg["tag"], leg["mode"])
        results[key] = {
            "n_vectors": leg["n"], "bits": leg["bits"],
            "candidate_pairs": candidate_pairs(
                spark, leg["path"], leg["bits"]),
            "secs": [], "rows": None,
        }

    for rep in range(args.repeats):
        order = legs if rep % 2 == 0 else list(reversed(legs))
        for leg in order:
            spark.catalog.clearCache()
            emb = spark.read.parquet(f"{leg['path']}/embeddings.parquet")
            t0 = time.perf_counter()
            out = similarity.semantic_dedup(emb, threshold=0.7, **leg["kw"])
            out.write.format("noop").mode("overwrite").save()
            el = round(time.perf_counter() - t0, 3)
            r = results[(leg["tag"], leg["mode"])]
            r["secs"].append(el)
            if r["rows"] is None:
                r["rows"] = out.count()

    report = {}
    for (tag, mode), r in results.items():
        report[f"{tag}/{mode}"] = {
            "n_vectors": r["n_vectors"], "bits": r["bits"],
            "candidate_pairs": r["candidate_pairs"],
            "sec_min": min(r["secs"]), "runs": r["secs"],
            "out_rows": r["rows"],
        }
    for mode in ("fixed8", f"auto{args.target}"):
        b = report[f"base/{mode}"]
        s = report[f"x{args.mult}/{mode}"]
        report[f"ratio/{mode}"] = {
            "data_x": round(s["n_vectors"] / b["n_vectors"], 1),
            "pairs_x": round(s["candidate_pairs"] / b["candidate_pairs"], 1),
            "time_x": round(s["sec_min"] / b["sec_min"], 1),
        }
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
