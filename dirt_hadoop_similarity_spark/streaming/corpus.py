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
from pyspark.sql import functions as F

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


def run_incremental_dedup_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    min_est_jaccard: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    query_name: str = "incremental_dedup",
) -> None:
    """Near-dup dedup AT INGEST: each micro-batch is checked against the
    persisted corpus signature index (``operators/dedup.signature_index``
    parquet at ``index_path``) and only documents with no near-duplicate
    in the corpus land in ``out_path``.

    ``foreachBatch`` because the per-batch logic is a JOIN against a
    batch-side relation Structured Streaming's incremental planner
    can't express as a stateful op: the batch's banded rows broadcast
    against the (bucketable, partition-prunable) index — exactly
    ``dedup.incremental_near_duplicates``'s daily-ingest plan, run once
    per micro-batch.  The index stays FIXED for the run: intra-ingest
    duplicates (two new docs duplicating each other) are intentionally
    left to the downstream batch components pass, which keeps every
    micro-batch's decision independent — so stream output == the batch
    operator's output on the same documents regardless of how the
    source was split into batches (asserted in test_streaming), and
    foreachBatch's at-least-once re-delivery is harmless because the
    decision for a given doc is deterministic and the sink is the
    batch-id-keyed idempotent overwrite
    (``sinks.idempotent_batch_append`` — a plain append would
    duplicate a re-delivered batch).

    A nightly compaction then appends the day's survivors' signatures
    to the index (one batch ``signature_index`` run) — read-modify-write
    on the index stays OUT of the hot ingest path.
    """
    from dirt_hadoop_similarity_spark.operators import dedup
    from dirt_hadoop_similarity_spark.sources.sinks import (
        idempotent_batch_append,
    )

    index_df = spark.read.parquet(index_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        dups = dedup.incremental_near_duplicates(
            index_df,
            batch_df,
            num_hashes=num_hashes,
            bands=bands,
            rows_per_band=rows_per_band,
        ).filter(F.col("est_jaccard") >= min_est_jaccard)
        survivors = batch_df.join(
            dups.select(F.col("batch_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        idempotent_batch_append(survivors, out_path, batch_id)

    q = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()


def run_redaction_gate_smoke(
    spark: SparkSession, sf_dir: str,
    query_name: str = "redaction_gate_smoke",
    threshold: float = 0.0,
) -> DataFrame:
    """PII redaction + model scoring as an append-mode stream into a
    memory sink; returns the materialized redacted/scored rows."""
    scored = curation.redact_and_score(
        stream_documents(spark, sf_dir), threshold=threshold
    )
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def run_lm_score_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    uni_path: str,
    bi_path: str,
    out_path: str,
    checkpoint: str,
    alpha: float = 0.5,
    mean_lp_min_micro: int = -8_000_000,
    query_name: str = "lm_score",
) -> None:
    """LM quality scoring AT INGEST: every micro-batch is scored against
    the PERSISTED bigram LM (``operators/lm.train_bigram_lm`` count
    tables written as parquet at ``uni_path`` / ``bi_path``) and lands
    in ``out_path`` with its (n_transitions, lp_micro_sum, keep) verdict
    attached — the train-offline / score-at-ingest split of the CCNet
    recipe.

    ``foreachBatch`` because scoring aggregates per document (the
    bigram-count groupBy), which Structured Streaming would treat as
    unbounded state; per batch it is a bounded batch plan.  The model
    stays FIXED for the run, and a document's score depends only on
    (model, document) — every micro-batch's decision is independent, so
    stream output == ``lm.score_documents`` on the same documents
    regardless of batch splits (asserted in test_streaming), and
    re-delivery is harmless for the same reason as the dedup stream.
    Retraining is a nightly batch job that rewrites the count tables —
    model read-modify-write stays OUT of the hot ingest path.
    """
    from dirt_hadoop_similarity_spark.operators import lm
    from dirt_hadoop_similarity_spark.sources.sinks import (
        idempotent_batch_append,
    )

    uni = spark.read.parquet(uni_path).cache()
    bi = spark.read.parquet(bi_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        scored = lm.score_documents(
            batch_df, uni, bi,
            alpha=alpha, mean_lp_min_micro=mean_lp_min_micro,
        )
        idempotent_batch_append(
            batch_df.join(scored, "doc_id"), out_path, batch_id
        )
        # score_documents caches two relations the write just
        # materialized; without this a long-running ingest leaks two
        # cached relations PER MICRO-BATCH (the parquet write above is
        # the materialization point, so releasing here is safe —
        # foreachBatch runs _process on the driver)
        lm.release_caches()

    q = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the model cache is per-RUN (shared across batches); release it
        # when the run ends so back-to-back runs don't stack model copies
        uni.unpersist()
