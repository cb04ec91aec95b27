"""dirt_hadoop_similarity_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
repo ``Gal-Schwartz/dirt-hadoop-similarity`` (a 5-job Hadoop MapReduce
implementation of the DIRT algorithm, Lin & Pantel KDD 2001), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB corpus engine needs.

Design stance (SURVEY.md §7.1):
  * DataFrame / Spark SQL first — declare logical plans, let Catalyst and
    Tungsten pick physical strategy (broadcast vs SMJ, partial aggs,
    pushdown, AQE skew handling).
  * Pandas UDFs only where the semantics genuinely exceed relational
    algebra (Porter stemmer, dependency-path extraction).
  * Explicit StructType schemas; Parquet for intermediates; no RDDs.
  * Every operator is a pure ``DataFrame -> DataFrame`` function so it is
    unit-testable and composable into one lazy DAG.
"""

__version__ = "0.1.0"
