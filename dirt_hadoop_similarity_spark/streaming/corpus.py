"""Structured Streaming over the documents corpus: gate at ingest.

A continuously-ingesting training corpus wants its cheap, stateless
curation decisions made ON the stream (quality scoring, language-ID,
per-batch annotation) so junk never lands in the corpus at all; the
stateful passes (exact/near dedup, token budget) run as batch or
watermark-bounded jobs downstream.  ``operators/curation.quality_gate``
is written statelessly for exactly this reason — this module is the
plumbing that runs it as a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dirt_hadoop_similarity_spark.operators import curation

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the static documents parquet (smoke/demo;
    in production the source is the landing bucket / message bus)."""
    return (
        spark.readStream.format("parquet")
        .schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def run_quality_gate_smoke(
    spark: SparkSession, sf_dir: str,
    query_name: str = "quality_gate_smoke",
    min_quality: float = 0.35,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Drive the stateless gate through a real append-mode streaming
    query into a memory sink; returns the materialized survivors."""
    gated = curation.quality_gate(
        stream_documents(spark, sf_dir),
        min_quality=min_quality, langs=langs,
    )
    q = (
        gated.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
