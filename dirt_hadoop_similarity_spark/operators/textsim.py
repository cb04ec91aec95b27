"""Sparse TF-IDF all-pairs cosine similarity over text shingles.

The lexical twin of the embedding ANN stack (operators/similarity.py):
instead of dense vectors, each document is a sparse bag of word-n-gram
shingles weighted by TF-IDF, and similar pairs are found with an
inverted-index equi-join — the classic all-pairs similarity-search
shape (Bayardo, Ma, Srikant, "Scaling Up All Pairs Similarity Search",
WWW 2007): never a cartesian product, candidates are generated only
for documents that SHARE a surviving term.

Scale contract (100 TB):
  * Shingling/tf is a map-only pass (native split/transform/slice — no
    UDF, stays in whole-stage codegen).
  * The document-frequency cut (``min_df``/``max_df_frac``) is the
    fan-out bound: a term appearing in d documents contributes
    d·(d-1)/2 candidate partials, so dropping the high-df head keeps
    the inverted-index join quadratic only in the (bounded) per-term
    posting list, not in the corpus.  At production scale pass an
    ABSOLUTE ``max_df`` as well — a fraction of a 10^10-doc corpus is
    not a bound.
  * Weights are quantized to int64 once (round(idf·scale)·tf), so the
    dot product is an EXACT integer sum — associativity-free, which
    also makes the result bit-identical across engines and partition
    orders (the same trick as the GEMM scorer's int64 matmul).
  * The per-doc norm relation is tiny (one row per doc) and joined by
    doc id; Catalyst broadcasts it at test scale, AQE decides at real
    scale.

Reference parity note: the reference engine has no lexical similarity
join; this extends its DIRT Lin-similarity idea (shared-feature
overlap, DirtDriver.java:529-608) to raw-text near-duplicate mining,
complementing the MinHash/SimHash estimators in operators/dedup.py
with an exact-TF-IDF scorer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.operators._tracked_cache import CacheTracker

#: idf quantization scale.  ln(N/df) < 30 for any N < 10^13, so a
#: quantized idf is < 3·10^5.  The binding constraint is on SUMS, not
#: single weights — see the overflow bound in tfidf_vectors.
IDF_SCALE = 10_000

#: cached relations created by this module and not yet released — each
#: tfidf_vectors/cosine_pairs call caches one relation that the returned
#: lazy plan reads, so it cannot be unpersisted eagerly here.  Owners
#: making repeated in-session calls (registries, notebooks) call
#: :func:`release_caches` between passes; a one-shot job, or anything
#: behind spark.catalog.clearCache() (the bench harness), need not.
_CACHES = CacheTracker()


def _cache_tracked(df: DataFrame) -> DataFrame:
    return _CACHES.track(df)


def release_caches() -> int:
    """Unpersist every cached relation this module has created since the
    last release.  Call AFTER the consuming DataFrames are materialized
    (unpersisting earlier silently recomputes their lineage instead of
    breaking).  Returns the number of relations released."""
    return _CACHES.release()


def shingle_tf(docs: DataFrame, n: int = 3, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Word-n-gram shingle term frequencies per document.

    Lowercases, splits on single spaces (the corpus tokenization
    contract shared with functions/bpe.py), and KEEPS duplicate
    shingles as counts — unlike dedup.word_shingles, which is a set.
    Documents shorter than ``n`` words yield their full token join as
    one shingle; empty/whitespace-only documents yield NO terms (the
    would-be '' shingle is filtered) and therefore drop out of the
    df/N statistics entirely — without the filter, two blank docs
    share '' as a real term and score sim=1.0.

    The token array is BOUND to a projected column before the shingle
    ``transform`` — a lambda that captures the raw
    ``split(lower(text))`` expression re-evaluates it once per shingle
    position (codegen subexpression elimination does not reach inside
    higher-order-function lambdas), turning tokenization O(L) into
    O(L²) per document.  Measured at sf0.1 (5k docs, ~54 tokens avg):
    2.35 s → 0.67 s for the tf relation; on a real corpus with
    10⁴-token documents the inline form is ~10⁴× more token-scan work
    per doc.  The intermediate projection survives optimization because
    the alias is referenced more than once (CollapseProject's
    non-cheap/multi-reference guard) and the consumer is a Generate —
    pinned in tests/test_textsim.py.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")
    bound = F.col("_toks")
    k = F.greatest(F.size(bound) - (n - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(bound, i, n), " "),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", F.explode(shingles).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_vectors(tf: DataFrame, min_df: int = 2,
                  max_df_frac: float = 0.10,
                  max_df: int | None = None,
                  scale: int = IDF_SCALE) -> DataFrame:
    """Quantized-int64 TF-IDF weights: (doc_id, term, w).

    idf = ln(N/df) over the documents present in ``tf``; weights are
    ``tf · round(idf·scale)`` as BIGINT so downstream sums are exact.

    Overflow bound — the binding constraint is the downstream SUMS
    (per-doc norm Σw² and per-pair dot Σw_a·w_b), not a single weight:
    with T distinct surviving terms per document the contract is
    T · w_max² < 2^63.  At scale=10^4 (idf_q ≤ 3·10^5): tf ≤ 10 gives
    w ≤ 3·10^6 and headroom for T ≤ 10^6 terms/doc; tf ≤ 10^3 gives
    w ≤ 3·10^8 and T ≤ 10^2.  For corpora with both huge tf and huge
    vocabularies per document, lower ``scale`` (cosine is invariant to
    the uniform factor up to quantization error).  Note Spark's
    non-ANSI long sum WRAPS silently on overflow (→ negative norm →
    NaN sim → pair silently dropped) while DuckDB errors — stay inside
    the bound.  At the test corpus (tf < 10^2, T < 10^3) headroom is
    ~10^4.

    The df band [min_df, max_df_frac·N] is the candidate-bound: df=1
    terms can never produce a pair, and the high-df head is where the
    quadratic fan-out (and, for TF-IDF, near-zero weight) lives.

    ``max_df`` is the ABSOLUTE posting-list cap production scale
    REQUIRES: a fractional cut of a 10^10-doc corpus is not a bound —
    a term at df = 0.09·N still fans out ~4·10^17 candidate partials.
    When set, a term survives only if df ≤ min(max_df, max_df_frac·N),
    capping per-term fan-out at max_df·(max_df−1)/2 regardless of
    corpus size.  Left None here only because the test corpora are
    small; pass it explicitly in any production plan.

    ``tf`` feeds three consumers here (the df aggregate, the N
    aggregate, and the weight join), so it is cached — otherwise the
    upstream shingle explode + first aggregation re-executes per
    consumer when the vectors relation materializes.  The cache is
    tracked: long-lived sessions call :func:`release_caches` between
    passes instead of accumulating one relation per call.
    """
    tf = _cache_tracked(tf)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    w = (
        F.col("tf")
        * F.round(F.log(F.col("n_docs") / F.col("df")) * scale).cast("long")
    )
    band = (F.col("df") >= min_df) & (
        F.col("df") <= F.col("n_docs") * max_df_frac
    )
    if max_df is not None:
        band = band & (F.col("df") <= int(max_df))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .filter(band)
        .select("doc_id", "term", w.alias("w"))
    )


def cosine_pairs(vectors: DataFrame, threshold: float = 0.35) -> DataFrame:
    """All document pairs with TF-IDF cosine ≥ threshold.

    Inverted-index join: posting lists meet on ``term`` (an equi-join
    — the ONLY shuffle wider than the corpus), partial products are
    summed per (lo, hi) pair as exact int64, and the one float op —
    dot / (√n_lo·√n_hi) — happens once per surviving pair, so the
    result is deterministic under any partitioning.
    Returns (doc_lo, doc_hi, sim) with sim rounded to 6 dp.

    ``vectors`` feeds three consumers (the norm aggregate and both
    posting-list sides), so it is cached here — without it the whole
    shingle→tf→df chain re-executes per consumer (measured 3.2× at
    sf0.1).  A production run over a persistent corpus would write the
    vectors out as the index (the same persisted-index split as
    similarity.ivfpq_build/search; the parquet round-trip is
    row-identical to the in-memory composition — exact int64 weights —
    pinned in tests/test_textsim.py).  The cache is tracked — see
    :func:`release_caches`.
    """
    vectors = _cache_tracked(vectors)
    # Loud overflow guard.  Under ANSI mode (the Spark 4 default) an
    # overflowing w·w already raises ARITHMETIC_OVERFLOW; but with
    # spark.sql.ansi.enabled=false the long sum WRAPS silently, a
    # wrapped Σw² is negative with high probability, sqrt() goes NaN,
    # and every pair touching the doc is silently DROPPED.  The assert
    # is spliced into the norm value itself (assert_true yields NULL on
    # success → coalesce 0 → identity) so column pruning can never elide
    # it; in-bound corpora (tfidf_vectors' documented T·w_max² < 2^63
    # contract) pay one comparison per doc row.  Both failure modes are
    # pinned in tests/test_textsim.py.
    nrm = F.sum(F.col("w") * F.col("w"))
    guarded = nrm + F.coalesce(
        F.assert_true(
            nrm >= 0,
            "textsim: int64 overflow in Σw² — lower tfidf_vectors' "
            "`scale` (see the overflow bound in its docstring)",
        ).cast("long"),
        F.lit(0),
    )
    norms = vectors.groupBy("doc_id").agg(guarded.alias("nrm"))
    a = vectors.select(F.col("doc_id").alias("doc_lo"), "term",
                       F.col("w").alias("w_lo"))
    b = vectors.select(F.col("doc_id").alias("doc_hi"), "term",
                       F.col("w").alias("w_hi"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_lo") < F.col("doc_hi"))
        .groupBy("doc_lo", "doc_hi")
        .agg(F.sum(F.col("w_lo") * F.col("w_hi")).alias("dot"))
    )
    sim = F.round(
        F.col("dot")
        / (F.sqrt(F.col("n_lo").cast("double")) * F.sqrt(F.col("n_hi").cast("double"))),
        6,
    )
    return (
        dots.join(norms.select(F.col("doc_id").alias("doc_lo"),
                               F.col("nrm").alias("n_lo")), "doc_lo")
        .join(norms.select(F.col("doc_id").alias("doc_hi"),
                           F.col("nrm").alias("n_hi")), "doc_hi")
        .select("doc_lo", "doc_hi", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def cosine_topk_neighbors(vectors: DataFrame, k: int = 3,
                          threshold: float = 0.2) -> DataFrame:
    """Per-document lexical k-nearest-neighbors over the TF-IDF index.

    Symmetric closure of :func:`cosine_pairs` (each unordered pair
    serves both members) ranked per document by (sim desc, neighbor id)
    — a total order, so ranks are deterministic.  The rank filter
    compiles to WindowGroupLimit (per-task top-k BEFORE the shuffle),
    pinned in tests/test_plans.py.  Returns
    (doc_id, neighbor_id, sim, rank), rank <= k.

    The closure EXPLODES each pair into its two directed rows in one
    pass instead of unioning two projections of the pairs relation — a
    union re-executes the whole inverted-index join + pair aggregation
    per branch (no exchange reuse across the branches; measured 4.16 s
    → 3.42 s at sf0.1), and at scale the double execution is the
    dominant cost, not a constant.
    """
    pairs = cosine_pairs(vectors, threshold)
    sym = pairs.select(
        F.explode(F.array(
            F.struct(F.col("doc_lo").alias("doc_id"),
                     F.col("doc_hi").alias("neighbor_id")),
            F.struct(F.col("doc_hi").alias("doc_id"),
                     F.col("doc_lo").alias("neighbor_id")),
        )).alias("e"),
        "sim",
    ).select("e.doc_id", "e.neighbor_id", "sim")
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
