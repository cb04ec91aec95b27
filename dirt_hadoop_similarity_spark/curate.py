"""Training-data curation CLI: documents parquet -> curated, mixed,
sharded training corpus.

    python -m dirt_hadoop_similarity_spark.curate SF_DIR --out DIR
        [--clf-threshold 0.0] [--langs en] [--budget-fraction 0.5]
        [--lm-threshold MICRO] [--dsir-min-weight MICRO]
        [--mixture en=5,zh=2] [--max-repeat 2] [--shards 8]
        [--chunk MAX[:STRIDE]] [--master M]

The batch composition of the engine's curation stages, in the order
that keeps candidate volumes bounded (see operators/curation.py):

  1. ``redact_and_score``   PII redaction + linear quality model (map-only)
  2. ``bigram_lm_scores``   CCNet-style LM perplexity filter, trained on
                            the in-langs subset (opt., --lm-threshold)
  3. ``dsir_weights``       DSIR importance filter vs the in-langs target
                            distribution (opt., --dsir-min-weight)
  4. ``curate``             exact dedup -> MinHash-LSH near dedup ->
                            heuristic quality/lang gate -> token budget
  5. ``mixture_resample``   target group mixture w/ epoch upsampling (opt.)
  6. ``write_shards``       deterministic shard layout, parquet per shard

Outputs under --out:
    shards/            parquet, one ``shard=<n>/`` directory per shard
    packing/           (with --pack N) sample_id -> bin_id/token_offset
    chunks/            (with --chunk) sample_id -> token-window chunks
    summary.json       per-stage row counts + final per-lang composition
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F


def _parse_mixture(spec: str) -> dict[str, int]:
    parts: dict[str, int] = {}
    for item in spec.split(","):
        k, _, v = item.partition("=")
        if not k or not v:
            raise SystemExit(f"bad --mixture item {item!r} (want lang=int)")
        parts[k.strip()] = int(v)
    return parts


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m dirt_hadoop_similarity_spark.curate",
        description="documents parquet -> curated, mixed, sharded corpus",
    )
    p.add_argument("sf_dir", help="directory holding documents.parquet")
    p.add_argument("--out", default="curate_out", help="output directory")
    p.add_argument("--clf-threshold", type=float, default=0.0,
                   help="quality-model logit threshold (0 = p 0.5)")
    p.add_argument("--langs", default="en",
                   help="comma-separated langs the heuristic gate admits")
    p.add_argument("--budget-fraction", type=float, default=0.5,
                   help="token-budget fraction kept by the funnel")
    p.add_argument("--lm-threshold", type=int, default=None, metavar="MICRO",
                   help="min mean log-prob in micro-nats under the bigram "
                        "LM trained on the in-langs subset (e.g. -3420000; "
                        "omit: no LM filter)")
    p.add_argument("--dsir-min-weight", type=int, default=None,
                   metavar="MICRO",
                   help="min DSIR importance weight in micro-nats vs the "
                        "in-langs target distribution (0 = more "
                        "target-like than raw; omit: no DSIR filter)")
    p.add_argument("--mixture", default=None,
                   help="target mixture, e.g. en=5,zh=2 (omit: no resample)")
    p.add_argument("--max-repeat", type=int, default=2,
                   help="max epochs per group for mixture upsampling")
    p.add_argument("--shards", type=int, default=8,
                   help="training shard count (scale with corpus size)")
    p.add_argument("--pack", type=int, default=None, metavar="SEQ_LEN",
                   help="also emit concat-and-chunk packing assignments "
                        "(packing/ parquet: sample_id, bin_id, token_offset)")
    p.add_argument("--chunk", default=None, metavar="MAX[:STRIDE]",
                   help="also emit overlapping token-window chunks of the "
                        "final corpus (chunks/ parquet), e.g. 64:48")
    p.add_argument("--master", default=None, help="Spark master override")
    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    from dirt_hadoop_similarity_spark.session import get_spark
    from dirt_hadoop_similarity_spark.operators import curation, sampling
    from dirt_hadoop_similarity_spark.sources.sinks import write_shards

    # getOrCreate: shares an existing session (tests); never stopped here
    # (matches __main__.py — process exit owns the real CLI's shutdown)
    spark = get_spark(
        app_name="dhs-curate",
        master=args.master or os.environ.get("SPARK_MASTER", "local[4]"),
    )
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    summary: dict = {"input_rows": docs.count()}

    scored = curation.redact_and_score(docs, threshold=args.clf_threshold)
    admitted = scored.filter("clf_keep").drop("clf_logit", "clf_keep")
    summary["after_model_filter"] = admitted.count()

    langs = tuple(l.strip() for l in args.langs.split(",") if l.strip())
    if not langs:
        raise SystemExit("--langs must name at least one language")

    if args.lm_threshold is not None:
        from dirt_hadoop_similarity_spark.operators import lm

        verdicts = lm.bigram_lm_scores(
            admitted, F.col("lang").isin(*langs),
            mean_lp_min_micro=args.lm_threshold,
        )
        admitted = admitted.join(
            verdicts.filter("keep").select("doc_id"), "doc_id"
        )
        summary["after_lm_filter"] = admitted.count()

    if args.dsir_min_weight is not None:
        weights = sampling.dsir_weights(admitted, F.col("lang").isin(*langs))
        admitted = admitted.join(
            weights.filter(
                F.col("weight_micro") >= args.dsir_min_weight
            ).select("doc_id"),
            "doc_id",
        )
        summary["after_dsir_filter"] = admitted.count()

    curated = curation.curate(
        admitted,
        langs=langs,
        budget_fraction=args.budget_fraction,
    )
    summary["after_funnel"] = curated.count()

    if args.mixture:
        parts = _parse_mixture(args.mixture)
        mixed = sampling.mixture_resample(
            curated, parts, "lang", "doc_id", max_repeat=args.max_repeat)
        summary["mixture"] = parts
    else:
        mixed = curated.withColumn("epoch", F.lit(1).cast("long"))
    # after epoch upsampling the row identity is (doc_id, epoch)
    final = mixed.withColumn(
        "sample_id",
        F.concat(F.col("doc_id").cast("string"), F.lit("#"),
                 F.col("epoch").cast("string")),
    )
    summary["final_rows"] = final.count()
    summary["composition"] = {
        r["lang"]: r["n"]
        for r in final.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }

    os.makedirs(args.out, exist_ok=True)
    write_shards(final, os.path.join(args.out, "shards"),
                 "sample_id", args.shards)
    if args.pack:
        from dirt_hadoop_similarity_spark.functions import textfns

        packed = curation.pack_sequences(
            final.withColumn(
                "n_tokens", textfns.token_count(F.col("text")).cast("long")),
            seq_len=args.pack, id_col="sample_id",
        )
        packed.select("sample_id", "bin_id", "token_offset").write.mode(
            "overwrite").parquet(os.path.join(args.out, "packing"))
        summary["packed_bins"] = packed.agg(
            (F.max("bin_id") + 1).cast("long").alias("b")).first()["b"]
    if args.chunk:
        mx, _, stride = args.chunk.partition(":")
        try:
            max_tokens = int(mx)
            chunk_stride = int(stride) if stride else max_tokens
        except ValueError:
            raise SystemExit(f"bad --chunk {args.chunk!r} (want MAX[:STRIDE])")
        chunks = curation.chunk_documents(
            final, max_tokens=max_tokens, stride=chunk_stride,
            id_col="sample_id",
        )
        chunks.write.mode("overwrite").parquet(
            os.path.join(args.out, "chunks"))
        summary["chunks"] = chunks.count()
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    print(json.dumps(summary, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
