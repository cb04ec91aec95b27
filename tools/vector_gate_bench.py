"""Measure what the valid_vectors admission gate costs — and what it
buys — on a dirty-vector corpus (VERDICT r12 task 6: the gate was
asserted "a plain scan-level filter, free at any scale"; this records
the number instead of the adjective).

Three legs on an x-mult replica of the sf embeddings table:

  * overhead — the SAME exact-scoring query (cosine top-k, 10-query
    panel) timed gated vs ungated on the CLEAN corpus, interleaved
    min-of-N.  The gate keeps every row there, so the delta is the
    filter's pure cost in a real scoring plan.
  * dirty corpus — 10% of rows NULLed (failed embedding jobs) and 10%
    truncated to half length (mixed model versions).  The gated query
    must run (ungated, this corpus NULL-pads zip_with dot products)
    and its timing is recorded.
  * post-gate correctness — the gated query on the dirty corpus must
    be ROW-IDENTICAL to the same query on a corpus with the invalid
    rows physically removed: the gate admits exactly the valid subset,
    no more, no less.

Run:  python tools/vector_gate_bench.py [--dir /root/testdata/sf0.1]
          [--mult 10] [--repeats 2]
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

DIM = 64
QUERY_IDS = list(range(10))


def timed_min(pairs, repeats: int, spark) -> dict[str, float]:
    """Interleaved min-of-N noop-sink timing (the campaign estimator)."""
    best: dict[str, float] = {}
    for i in range(repeats):
        order = list(pairs)
        if i % 2:
            order.reverse()
        for kind, df in order:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best[kind] = min(best.get(kind, el), el)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    if args.repeats < 1:
        ap.error("--repeats must be >= 1")
    if args.mult < 1:
        ap.error("--mult must be >= 1")

    from dirt_hadoop_similarity_spark.operators import similarity
    from dirt_hadoop_similarity_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="dhs-vector-gate-bench",
                      master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    base = spark.read.parquet(f"{args.dir}/embeddings.parquet")
    n_base = base.count()
    emb = base
    if args.mult > 1:
        # id-shifted replicas; replica 0 keeps the original ids so the
        # query panel (vec_id 0-9) is identical at every mult
        emb = base.crossJoin(
            spark.range(args.mult).select(F.col("id").alias("_copy"))
        ).select(
            (F.col("vec_id") + F.col("_copy") * F.lit(1_000_000_000))
            .alias("vec_id"),
            "embedding",
        )
    clean = emb.cache()
    n_clean = clean.count()

    # dirty twin: deterministic id-keyed corruption, replica-independent.
    # The 10-query panel (vec_id 0-9) is EXEMPT so the dirty legs score
    # exactly the same panel as the clean legs — corrupting a query id
    # would silently shrink the dirty legs to an 8-query comparison.
    vid = F.col("vec_id") % 10
    panel_safe = F.col("vec_id") >= len(QUERY_IDS)
    dirty = clean.select(
        "vec_id",
        F.when(panel_safe & (vid == 3), F.lit(None).cast("array<float>"))
        .when(panel_safe & (vid == 7), F.slice("embedding", 1, DIM // 2))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    ).cache()
    n_invalid = dirty.filter(
        F.col("embedding").isNull() | (F.size("embedding") != DIM)
    ).count()
    # the physically-cleaned control: invalid rows removed before the
    # engine ever sees them — the gate must reproduce exactly this
    control = dirty.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == DIM)
    )

    def q(rel):
        return similarity.cosine_topk(rel, QUERY_IDS, k=5)

    # leg 1: pure gate overhead on the clean corpus (gate keeps all rows)
    t = timed_min(
        [("ungated", q(clean)),
         ("gated", q(similarity.valid_vectors(clean, DIM)))],
        args.repeats, spark,
    )
    # leg 2: gated on the dirty corpus (the shape a 100 TB corpus has)
    td = timed_min(
        [("gated_dirty", q(similarity.valid_vectors(dirty, DIM)))],
        args.repeats, spark,
    )

    # leg 3: post-gate correctness — gate == physical removal
    gated_rows = q(similarity.valid_vectors(dirty, DIM))
    control_rows = q(control)
    diff = gated_rows.exceptAll(control_rows).count() \
        + control_rows.exceptAll(gated_rows).count()
    assert diff == 0, (
        f"gated output differs from the physically-cleaned control "
        f"by {diff} rows"
    )

    clean.unpersist()
    dirty.unpersist()
    spark.stop()
    print(json.dumps({
        "metric": "vector_gate", "mult": args.mult,
        "base_rows": n_base, "corpus_rows": n_clean,
        "invalid_rows": n_invalid,
        "repeats": args.repeats,
        "ungated_clean_sec": round(t["ungated"], 3),
        "gated_clean_sec": round(t["gated"], 3),
        "gate_overhead_ratio": round(t["gated"] / t["ungated"], 3),
        "gated_dirty_sec": round(td["gated_dirty"], 3),
        "post_gate_row_identical": True,
    }))


if __name__ == "__main__":
    main()
