"""Bigram LM quality scoring: model semantics the oracle can't express
(the oracle checks arithmetic equality; these check the MODEL is right).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.operators.lm import bigram_lm_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


def test_in_domain_text_scores_higher(spark):
    # target distribution: "the cat sat" patterns; doc 100 repeats them,
    # doc 101 is out-of-domain gibberish of the same length
    rows = (
        [(i, "the cat sat on the mat " * 10, True) for i in range(5)]
        + [(100, "the cat sat on the mat", False),
           (101, "zq xv qp wk zq mv plf", False)]
    )
    out = {r["doc_id"]: r for r in
           bigram_lm_scores(_docs(spark, rows), F.col("tgt")).collect()}
    mean_100 = out[100]["lp_micro_sum"] / out[100]["n_transitions"]
    mean_101 = out[101]["lp_micro_sum"] / out[101]["n_transitions"]
    assert mean_100 > mean_101


def test_seen_bigram_beats_unseen_with_seen_unigrams(spark):
    # "cat sat" is a trained transition; "sat cat" never occurs — the
    # bigram term must distinguish them even though unigrams are shared
    rows = [(0, "cat sat cat sat cat sat", True),
            (100, "cat sat", False), (101, "sat cat", False)]
    out = {r["doc_id"]: r for r in
           bigram_lm_scores(_docs(spark, rows), F.col("tgt")).collect()}
    assert out[100]["lp_micro_sum"] > out[101]["lp_micro_sum"]


def test_short_docs_are_total_and_not_kept(spark):
    rows = [(0, "a b a b", True), (1, "single", False), (2, "", False)]
    out = {r["doc_id"]: r for r in
           bigram_lm_scores(_docs(spark, rows), F.col("tgt")).collect()}
    assert set(out) == {0, 1, 2}
    for d in (1, 2):
        assert out[d]["n_transitions"] == 0
        assert out[d]["lp_micro_sum"] == 0
        assert out[d]["keep"] is False


def test_score_stable_under_repartition(spark):
    rows = [(i, f"w{i % 5} w{(i + 1) % 7} w{i % 3} w{i % 11}", i % 2 == 0)
            for i in range(40)]
    docs = _docs(spark, rows)
    a = {r["doc_id"]: r["lp_micro_sum"]
         for r in bigram_lm_scores(docs, F.col("tgt")).collect()}
    b = {r["doc_id"]: r["lp_micro_sum"]
         for r in bigram_lm_scores(
             docs.repartition(13), F.col("tgt")).collect()}
    assert a == b  # integer micro-nat sums: order-independent


def test_alpha_validation(spark):
    with pytest.raises(ValueError, match="alpha"):
        bigram_lm_scores(_docs(spark, [(0, "a b", True)]),
                         F.col("tgt"), alpha=1.5)


class TestPerplexityTiers:
    def _scored(self, spark, sums):
        # (doc_id, n_transitions, lp_micro_sum): one transition each so
        # mean == sum, making thresholds easy to hand-check
        return spark.createDataFrame(
            [(i, 1, s) for i, s in enumerate(sums)],
            ["doc_id", "n_transitions", "lp_micro_sum"],
        )

    def test_equal_mass_and_order(self, spark):
        from dirt_hadoop_similarity_spark.operators import lm

        sums = [-(i + 1) * 37_000 for i in range(90)]  # distinct values
        out = {r["doc_id"]: r["tier"] for r in
               lm.perplexity_tiers(self._scored(spark, sums)).collect()}
        counts = {"head": 0, "middle": 0, "tail": 0}
        for t in out.values():
            counts[t] += 1
        assert counts == {"head": 30, "middle": 30, "tail": 30}
        # lower (more negative) mean -> worse tier: doc 0 best, doc 89 worst
        assert out[0] == "head" and out[89] == "tail"
        order = {"head": 2, "middle": 1, "tail": 0}
        vals = sorted((sums[i], order[t]) for i, t in out.items())
        ranks = [r for _, r in vals]
        assert ranks == sorted(ranks)  # tiers are value-monotone

    def test_ties_go_to_lower_tier_deterministically(self, spark):
        from dirt_hadoop_similarity_spark.operators import lm

        # 6 docs all with the same score: the single value reaches both
        # cuts, so everything lands in 'tail' (value <= t_lo) — the
        # deterministic convention, engine-identical
        out = {r["doc_id"]: r["tier"] for r in lm.perplexity_tiers(
            self._scored(spark, [-5_000_000] * 6)).collect()}
        assert set(out.values()) == {"tail"}

    def test_unscorable_docs_excluded_and_repartition_stable(self, spark):
        from dirt_hadoop_similarity_spark.operators import lm

        rows = [(i, 1 if i % 5 else 0, -(i + 1) * 10_000) for i in range(40)]
        df = spark.createDataFrame(
            rows, ["doc_id", "n_transitions", "lp_micro_sum"])
        a = {(r["doc_id"], r["tier"])
             for r in lm.perplexity_tiers(df).collect()}
        b = {(r["doc_id"], r["tier"])
             for r in lm.perplexity_tiers(df.repartition(7)).collect()}
        assert a == b
        assert all(i % 5 != 0 for i, _ in a)  # n_transitions=0 excluded


def test_floordiv_full_int64_domain(spark):
    """ADVICE r7: lm._floordiv must floor exactly across the FULL int64
    domain — including dividends within b of the domain minimum, where
    the old subtract-remainder-first spelling underflowed (ANSI mode
    raised ARITHMETIC_OVERFLOW) — under both ANSI settings."""
    from pyspark.sql import functions as F

    from dirt_hadoop_similarity_spark.operators.lm import _floordiv

    vals = [(-(1 << 63), 7), (-(1 << 63) + 3, 1000000), ((1 << 62) + 5, 3),
            (-8_000_001, 2), (0, 5), (9, 4), (-9, 4)]
    df = spark.createDataFrame(vals, "a long, b long")
    for ansi in ("false", "true"):
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        try:
            got = [r.q for r in df.select(
                _floordiv(F.col("a"), F.col("b")).alias("q")).collect()]
            assert got == [a // b for a, b in vals], f"ansi={ansi}"
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "false")
