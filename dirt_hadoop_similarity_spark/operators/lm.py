"""N-gram language-model quality scoring — the CCNet-style "perplexity
filter" (Wenzek et al. 2020, arXiv:1911.00359): train a small LM on
trusted target text (there: Wikipedia via KenLM; here: an in-corpus
target subset via bigram counts), score every document by its per-token
log-probability, and filter or tier the corpus on that score.

Spark-first shape: the LM "model" is a DataFrame of distinct bigram
types with integer micro-nat log-probs, built from two explode+groupBy
passes over the target subset (vocab-bounded, map-side combined).
Scoring is an equi-join of per-document bigram counts against that
table — never a per-token UDF, never a broadcast of a corpus-vocab
model.  All log-probs are quantized to integer micro-nats BEFORE the
per-document sum (the quantized_cosine trick), so scores are exact
integer arithmetic: order-independent across partitionings and engines,
value-checkable by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.functions.textfns import tokens

MICRO = 1_000_000


def bigram_lm_scores(docs: DataFrame, is_target: Column,
                     alpha: float = 0.5,
                     mean_lp_min_micro: int = -8_000_000,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Score every document under an add-1-smoothed interpolated bigram
    LM trained on the ``is_target`` subset.

    Model, over lowercase whitespace tokens:

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
    scored corpus (vocab-bounded, not corpus-bounded) and cached; the
    corpus-sized relations only ever shuffle (doc_id, v, w, count)
    rows.  The scalar (N, V) closes over a 1-row broadcast crossJoin.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")

    base = docs.select(
        F.col(id_col),
        is_target.alias("is_tgt"),
        tokens(F.lower(F.col(text_col))).alias("t"),
    )
    bi = F.expr(
        "transform(sequence(0, size(t) - 2),"
        " i -> struct(t[i] AS v, t[i + 1] AS w))"
    )
    doc_bi = (
        base.filter(F.size("t") >= 2)
        .select(F.col(id_col), "is_tgt", F.explode(bi).alias("p"))
        .select(F.col(id_col), "is_tgt", F.col("p.v").alias("v"),
                F.col("p.w").alias("w"))
        .groupBy(id_col, "is_tgt", "v", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    ).cache()  # feeds LM training AND scoring — one explode pass

    tgt_uni = (
        base.filter("is_tgt")
        .select(F.explode("t").alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("cu"))
    ).cache()
    tgt_bi = (
        doc_bi.filter("is_tgt")
        .groupBy("v", "w")
        .agg(F.sum("c").alias("cb"))
    )
    scal = tgt_uni.agg(
        F.sum("cu").alias("n_tok"),
        (F.count(F.lit(1)) + 1).alias("vsize"),
    )

    # log-prob per distinct bigram TYPE of the scored corpus
    types = doc_bi.select("v", "w").distinct()
    lp = (
        types.join(tgt_bi, ["v", "w"], "left")
        .join(tgt_uni.select(F.col("u").alias("v"),
                             F.col("cu").alias("cv")), "v", "left")
        .join(tgt_uni.select(F.col("u").alias("w"),
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
