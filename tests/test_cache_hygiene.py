"""Tracked-cache hygiene: operators that cache relations their returned
lazy plans still read must register them with their module's
CacheTracker, so long-lived sessions (notebooks, oracle sweeps, and
especially per-micro-batch foreachBatch scorers) can release them
instead of leaking one cached relation per call.

The contract generalizes textsim.release_caches (VERDICT r6 ADVICE #4)
to every caching operator module; test_textsim pins the textsim side.
"""

import pyspark.sql.functions as F


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def _drain(spark):
    from dirt_hadoop_similarity_spark.operators import _tracked_cache

    _tracked_cache.release_all()
    spark.catalog.clearCache()


def test_lm_scoring_caches_are_tracked_and_released(spark, sf_dir):
    from dirt_hadoop_similarity_spark.operators import lm

    _drain(spark)
    cm = _cache_manager(spark)
    assert cm.isEmpty()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for _ in range(2):  # two back-to-back scoring passes, one session
        lm.bigram_lm_scores(docs, F.col("lang") == "en").count()
    assert not cm.isEmpty()
    # 3 tracked caches per pass: the training unigrams + the per-doc
    # bigram relation + the per-type log-prob table
    assert lm.release_caches() == 6
    assert cm.isEmpty()


def test_perplexity_tiers_cache_is_tracked(spark, sf_dir):
    from dirt_hadoop_similarity_spark.operators import lm

    _drain(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = lm.bigram_lm_scores(docs, F.col("lang") == "en")
    lm.perplexity_tiers(scored).count()
    assert lm.release_caches() == 4  # 3 scoring caches + the means cut
    assert _cache_manager(spark).isEmpty()


def test_dedup_near_dup_caches_are_tracked_and_released(spark, sf_dir):
    from dirt_hadoop_similarity_spark.operators import dedup

    _drain(spark)
    cm = _cache_manager(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dedup.verified_near_duplicates(docs).count()
    assert not cm.isEmpty()
    # signature cache (inside minhash_near_duplicates) + candidate
    # relation + the verification shingles
    assert dedup.release_caches() == 3
    assert cm.isEmpty()


def test_sampling_dsir_caches_are_tracked(spark, sf_dir):
    from dirt_hadoop_similarity_spark.operators import sampling

    _drain(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sampling.dsir_weights(docs, F.col("lang") == "en").count()
    assert sampling.release_caches() == 2  # dcounts + bucket stats
    assert _cache_manager(spark).isEmpty()


def test_curation_funnel_release_spans_modules(spark, sf_dir):
    """The funnel composes dedup operators: full cleanup takes both
    modules' trackers (or release_all)."""
    from dirt_hadoop_similarity_spark.operators import curation, dedup

    _drain(spark)
    cm = _cache_manager(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    curation.funnel_summary(docs).count()
    assert not cm.isEmpty()
    assert curation.release_caches() == 2  # annotate's scored + ann
    assert dedup.release_caches() == 1  # the near-dup signature cache
    assert cm.isEmpty()


def test_release_all_drains_every_module(spark, sf_dir):
    from dirt_hadoop_similarity_spark.operators import (
        _tracked_cache,
        curation,
        sampling,
    )

    _drain(spark)
    cm = _cache_manager(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    curation.funnel_summary(docs).count()
    sampling.dsir_weights(docs, F.col("lang") == "en").count()
    assert not cm.isEmpty()
    assert _tracked_cache.release_all() == 5  # 2 curation + 1 dedup + 2 dsir
    assert cm.isEmpty()
    assert _tracked_cache.release_all() == 0  # idempotent


def test_lm_stream_releases_caches_per_batch(spark, sf_dir, tmp_path):
    """The score-at-ingest LM stream must not leak cached relations per
    micro-batch: score_documents caches two relations per call and the
    runner calls it once per batch — after a 2-batch run the session's
    cache manager must be EMPTY (per-batch releases + the model cache
    unpersisted when the run ends)."""
    from dirt_hadoop_similarity_spark.operators import lm
    from dirt_hadoop_similarity_spark.streaming import corpus as sco

    _drain(spark)
    cm = _cache_manager(spark)
    assert cm.isEmpty()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    uni, bi = lm.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    uni_path, bi_path = str(tmp_path / "uni"), str(tmp_path / "bi")
    uni.write.parquet(uni_path)
    bi.write.parquet(bi_path)

    incoming = docs.filter(F.col("doc_id") >= 400)
    landing = tmp_path / "landing"
    incoming.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(landing / "f0"))
    incoming.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(landing / "f1"))
    stream = (
        spark.readStream.format("parquet")
        .schema(sco.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .load(str(landing))
    )
    sco.run_lm_score_stream(
        spark, stream, uni_path, bi_path, str(tmp_path / "scored"),
        str(tmp_path / "ckpt"), query_name="lm_cache_hygiene_test",
    )
    assert spark.read.parquet(str(tmp_path / "scored")).count() \
        == incoming.count()
    assert cm.isEmpty()  # nothing cached survived the run
    assert lm.release_caches() == 0  # the runner already drained them


def test_anomaly_stream_releases_stats_cache(spark, tmp_path):
    from dirt_hadoop_similarity_spark.operators import anomaly
    from dirt_hadoop_similarity_spark.streaming import events as sev

    _drain(spark)
    cm = _cache_manager(spark)
    history = spark.createDataFrame(
        [(i, i % 5, 10.0 + (i % 3) + (50.0 if i % 17 == 0 else 0.0))
         for i in range(100)],
        ["event_id", "user_id", "value"],
    )
    stats_path = str(tmp_path / "stats")
    anomaly.value_stats(history).write.parquet(stats_path)
    landing = tmp_path / "landing"
    history.coalesce(1).write.parquet(str(landing / "f0"))
    stream = (
        spark.readStream.format("parquet")
        .schema("event_id long, user_id long, value double")
        .option("recursiveFileLookup", "true")
        .load(str(landing))
    )
    sev.run_anomaly_score_stream(
        spark, stream, stats_path, str(tmp_path / "flagged"),
        str(tmp_path / "ckpt"), z_threshold=2.0,
        query_name="anomaly_cache_hygiene_test",
    )
    assert cm.isEmpty()  # the per-run stats cache was released
