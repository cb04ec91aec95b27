"""End-to-end DIRT pipeline: one lazy DataFrame DAG.

The reference's five MapReduce jobs with S3-materialized text between
every stage (DirtDriver.java:981-1092) collapse into:

    read → parse → explode(extract) → groupBys (triples + marginals)
         → broadcast-join word margins → join path margins → MI + filter
         → [branch A: ΣMI per (path,slot)]
         → [branch B: pair fan-out → feature intersection → numerators]
         → join pivoted ΣMI denominators → sqrt(simX·simY)

The only true barriers are the scalar N collect and the cache points:
``triples`` feeds three marginals, ``mi`` feeds both branches.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from dirt_hadoop_similarity_spark.operators import counting, mi as mi_ops, overlap
from dirt_hadoop_similarity_spark.operators.extraction import extractions, facts
from dirt_hadoop_similarity_spark.sources.biarcs import (
    parse_biarc_lines,
    read_biarc_lines,
    with_tokens,
)


def rebalance_for_extraction(parsed: DataFrame, spark: SparkSession) -> DataFrame:
    """The extraction UDF is a pure map, so its parallelism equals the
    input's split count.  A tiny local corpus (one parquet/text split)
    would run the UDF serially on one core; rebalance up to the
    session's parallelism.  Real corpora have >= cores splits, making
    this a no-op — a guard, not a standing shuffle tax.

    Caveat: the ``.rdd`` partition probe materializes upstream query
    stages when the input's lineage contains a shuffle (AQE must run
    them to know the partitioning) — for the in-repo callers the
    lineage is a narrow scan/projection (no job), but callers feeding
    a shuffle-bearing DataFrame through ``run_pipeline`` should
    pre-partition it themselves and accept the probe's cost."""
    target = spark.sparkContext.defaultParallelism
    if parsed.rdd.getNumPartitions() < target:
        return parsed.repartition(target)
    return parsed


@dataclass
class DirtResult:
    """Every intermediate of the pipeline, lazily defined."""

    triples: DataFrame
    word_margins: DataFrame
    path_margins: DataFrame
    n_total: int
    mi: DataFrame
    sum_mi: DataFrame
    sims: DataFrame | None


def run_pipeline(
    spark: SparkSession,
    corpus: str | DataFrame,
    pairs_df: DataFrame | None = None,
    cache: bool = True,
) -> DirtResult:
    """Run the full DIRT computation.

    ``corpus``: path to biarc text files, or a pre-parsed DataFrame of raw
    lines with a ``value`` column.  ``pairs_df``: (p1, p2[, label]) path
    pairs to score; if None, stops after ΣMI.
    """
    if isinstance(corpus, str):
        biarcs = read_biarc_lines(spark, corpus)
    else:
        biarcs = parse_biarc_lines(corpus)
    parsed = rebalance_for_extraction(with_tokens(biarcs), spark)

    # `parsed` is scan-rooted, so its Catalyst estimate is the corpus's
    # real byte size — size the aggregate/join exchanges (and the cached
    # plans compiled inside the scope) statically off it instead of
    # paying AQE's stage-materialization job per exchange on a small
    # corpus (scale.loop_conf; no-op at cluster volume, where AQE keeps
    # the skew/join machinery this DAG then genuinely wants)
    from dirt_hadoop_similarity_spark.operators.scale import loop_conf

    with loop_conf(spark, parsed):
        triples = counting.triples(facts(extractions(parsed)))
        if cache:
            triples = triples.cache()

        sw = counting.word_margins(triples)
        ps = counting.path_margins(triples)
        n_total = counting.global_n(triples)

        mi_df = mi_ops.mi_table(triples, sw, ps, n_total)
        if cache:
            mi_df = mi_df.cache()
    sum_mi_df = mi_ops.sum_mi(mi_df)

    sims = None
    if pairs_df is not None:
        sims = overlap.similarities(mi_df, pairs_df, sum_mi_df)

    return DirtResult(
        triples=triples,
        word_margins=sw,
        path_margins=ps,
        n_total=n_total,
        mi=mi_df,
        sum_mi=sum_mi_df,
        sims=sims,
    )
