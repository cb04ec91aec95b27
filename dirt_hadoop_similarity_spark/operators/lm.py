"""N-gram language-model quality scoring — the CCNet-style "perplexity
filter" (Wenzek et al. 2020, arXiv:1911.00359): train a small LM on
trusted target text (there: Wikipedia via KenLM; here: an in-corpus
target subset via bigram counts), score every document by its per-token
log-probability, and filter or tier the corpus on that score.

Spark-first shape: the LM "model" is a pair of count DataFrames
(unigrams, bigrams) — trainable offline, persistable as parquet, and
joinable; scoring computes integer micro-nat log-probs once per
distinct bigram TYPE of the scored batch (vocab-bounded) and equi-joins
them to per-document bigram counts — never a per-token UDF, never a
broadcast of a corpus-vocab model.  Quantizing before the per-document
sum (the quantized_cosine trick) makes scores exact integer arithmetic:
order-independent across partitionings and engines, value-checkable by
the DuckDB oracle.  Because a document's score depends only on (model,
document), scoring is micro-batch independent — the streaming runner in
``streaming/corpus.py`` reuses :func:`score_documents` verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.functions.textfns import tokens

MICRO = 1_000_000

_BIGRAMS = (
    "transform(sequence(0, size(t) - 2),"
    " i -> struct(t[i] AS v, t[i + 1] AS w))"
)


def _tokenized(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("t")
    )


def train_bigram_lm(target_docs: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Train the LM: returns ``(unigrams, bigrams)`` count tables —
    ``(u, cu)`` and ``(v, w, cb)`` over lowercase whitespace tokens.
    This pair IS the persistable model (two parquet writes);
    :func:`score_documents` recovers the scalars (token count, vocab
    size) from the unigram table, so nothing else needs saving."""
    base = _tokenized(target_docs, text_col, id_col)
    uni = (
        base.select(F.explode("t").alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    bi = (
        base.filter(F.size("t") >= 2)
        .select(F.explode(F.expr(_BIGRAMS)).alias("p"))
        .select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    return uni, bi


def score_documents(docs: DataFrame, uni: DataFrame, bi: DataFrame,
                    alpha: float = 0.5,
                    mean_lp_min_micro: int = -8_000_000,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Score documents under a trained add-1-smoothed interpolated
    bigram LM:

        p(w | v) = alpha * (c_bi(v,w) + 1) / (c_uni(v) + V)
                 + (1-alpha) * (c_uni(w) + 1) / (N + V)

    with N = target token count and V = |target vocab| + 1 (one shared
    out-of-vocabulary class — unseen words hit the c=0 smoothing floor
    through the left joins, no special casing).  A document's score is
    the sum of log p over its token transitions; dividing by
    ``n_transitions`` gives mean log-prob (perplexity = exp(-mean)).
    The output keeps the exact integer pieces instead of the division:
    ``lp_micro_sum`` (micro-nats) and ``n_transitions``, plus ``keep``
    = lp_micro_sum >= mean_lp_min_micro * n_transitions — an integer
    comparison, so the threshold decision is also engine-exact.
    Documents with < 2 tokens have no transitions: score 0, keep false.

    Scale: log-probs are computed once per DISTINCT bigram type of the
    scored batch (vocab-bounded, not corpus-bounded) and cached; the
    corpus-sized relations only ever shuffle (doc_id, v, w, count)
    rows.  The scalar (N, V) closes over a 1-row broadcast crossJoin.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")

    doc_bi = (
        _tokenized(docs, text_col, id_col)
        .filter(F.size("t") >= 2)
        .select(F.col(id_col), F.explode(F.expr(_BIGRAMS)).alias("p"))
        .select(F.col(id_col), F.col("p.v").alias("v"),
                F.col("p.w").alias("w"))
        .groupBy(id_col, "v", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    ).cache()  # feeds the type list AND the per-doc sum — one pass

    scal = uni.agg(
        F.sum("cu").alias("n_tok"),
        (F.count(F.lit(1)) + 1).alias("vsize"),
    )
    types = doc_bi.select("v", "w").distinct()
    lp = (
        types.join(bi, ["v", "w"], "left")
        .join(uni.select(F.col("u").alias("v"),
                         F.col("cu").alias("cv")), "v", "left")
        .join(uni.select(F.col("u").alias("w"),
                         F.col("cu").alias("cw")), "w", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "v", "w",
            F.round(
                F.log(
                    alpha * ((F.coalesce("cb", F.lit(0)) + 1.0)
                             / (F.coalesce("cv", F.lit(0)) + F.col("vsize")))
                    + (1.0 - alpha) * ((F.coalesce("cw", F.lit(0)) + 1.0)
                                       / (F.col("n_tok") + F.col("vsize")))
                ) * MICRO
            ).cast("long").alias("lp_micro"),
        )
    ).cache()

    scored = (
        doc_bi.join(lp, ["v", "w"])
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_transitions"),
            F.sum(F.col("c") * F.col("lp_micro")).alias("lp_micro_sum"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_transitions", F.lit(0)).cast("long")
            .alias("n_transitions"),
            F.coalesce("lp_micro_sum", F.lit(0)).cast("long")
            .alias("lp_micro_sum"),
            (
                (F.coalesce("n_transitions", F.lit(0)) > 0)
                & (F.coalesce("lp_micro_sum", F.lit(0))
                   >= F.lit(int(mean_lp_min_micro))
                   * F.coalesce("n_transitions", F.lit(0)))
            ).alias("keep"),
        )
    )


def bigram_lm_scores(docs: DataFrame, is_target: Column,
                     alpha: float = 0.5,
                     mean_lp_min_micro: int = -8_000_000,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Train-and-score in one call: the LM is trained on the
    ``is_target`` subset of ``docs`` and every document is scored under
    it (see :func:`score_documents` for the model and output contract).
    For the train-offline / score-at-ingest split, call
    :func:`train_bigram_lm` + :func:`score_documents` directly."""
    uni, bi = train_bigram_lm(
        docs.filter(is_target), text_col=text_col, id_col=id_col
    )
    return score_documents(
        docs, uni.cache(), bi,
        alpha=alpha, mean_lp_min_micro=mean_lp_min_micro,
        text_col=text_col, id_col=id_col,
    )
