"""Capture .explain("formatted") for bench-headline queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's evidence
files (the judge checks plan claims against these).

Run:  python tools/capture_plans.py <tag> <suffix> [name,name,...]
e.g.  python tools/capture_plans.py r16 before

Streaming queries (stream_*) execute a real streaming query inside
their fn; their captured plan is the memory-sink table scan plus the
streaming plan recorded from the query's lastExecution is not
reachable here, so for them we capture the BATCH twin expression where
one exists (documented in the file header we write).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE
    from dirt_hadoop_similarity_spark.session import get_spark
    from dirt_hadoop_similarity_spark.plans import (  # noqa: F401
        queries_analytics,
        queries_ext,
        queries_more,
    )
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    spark = get_spark(app_name="dhs-capture-plans",
                      shuffle_partitions=32)

    # the bench's split entries map back to their composed registered
    # queries; media_decode_pixels has no registered query (bench-local
    # panel) — capture the decode plan over a tiny inline panel instead
    name_map = {
        "ann_ivfpq_build": "ann_ivfpq_topk",
        "ann_ivfpq_search": None,
        "text_knn_build": None,  # text_cosine_topk already in HEADLINE
        "text_knn_serve": None,
    }

    for name in HEADLINE:
        reg = name_map.get(name, name)
        if reg is None or (only and name not in only and reg not in only):
            continue
        path = os.path.join(out_dir, f"{reg}_{suffix}.txt")
        try:
            if name == "media_decode_pixels":
                from dirt_hadoop_similarity_spark.operators import multimodal
                panel = spark.createDataFrame(
                    [(0, "image", bytearray(b"\x89PNG\r\n\x1a\n"))],
                    "media_id long, kind string, payload binary",
                )
                df = multimodal.decode_pixels(panel, decoder="real")
                header = ("-- media_decode_pixels: decode_pixels("
                          "decoder='real') over the bench panel schema\n")
            elif name.startswith("stream_"):
                # fn() runs the real stream; the interesting plan is the
                # batch twin of the same expression
                from dirt_hadoop_similarity_spark.streaming import (
                    events as sev,
                )
                from dirt_hadoop_similarity_spark.plans.queries import load
                ev = load(spark, sf_dir, "events")
                if name == "stream_interval_join":
                    df = sev.purchases_before_errors(ev, window_seconds=1800)
                    header = ("-- stream_interval_join: BATCH TWIN of the "
                              "streaming interval join (the registered fn "
                              "runs a real watermarked stream; this is the "
                              "same join expression over the batch "
                              "source)\n")
                elif name == "stream_dedup_events":
                    df = sev.dedup_events(ev)
                    header = ("-- stream_dedup_events: BATCH TWIN of the "
                              "streaming dedup\n")
                else:
                    continue
            else:
                df = QUERIES[reg].fn(spark, sf_dir)
                header = f"-- {reg}\n"
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(path, "w") as f:
                f.write(header + plan)
            print(f"wrote {path}")
        except Exception as e:  # capture everything we can; report rest
            print(f"FAILED {name}: {type(e).__name__}: {e}")

    spark.stop()


if __name__ == "__main__":
    main()
