"""Unit tests for operators/textsim.py — sparse TF-IDF all-pairs
cosine: shingling semantics, the df candidate band, exact-integer
weight quantization, and partitioning-invariance of the result."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.operators import textsim


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_tf_counts_and_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d a b c"),   # 'a b c' appears twice
            (2, "x y"),             # shorter than n → one full-join shingle
            (3, "solo"),
        ],
    )
    got = {
        (r.doc_id, r.term): r.tf
        for r in textsim.shingle_tf(df, n=3).collect()
    }
    assert got[(1, "a b c")] == 2
    assert got[(1, "b c d")] == 1
    assert got[(2, "x y")] == 1
    assert got[(3, "solo")] == 1
    # doc 1 has 5 shingle positions: abc, bcd, cda, dab, abc
    assert sum(tf for (d, _), tf in got.items() if d == 1) == 5


def test_shingle_tf_lowercases(spark):
    df = _docs(spark, [(1, "Foo BAR baz")])
    terms = [r.term for r in textsim.shingle_tf(df, n=3).collect()]
    assert terms == ["foo bar baz"]


def test_tfidf_df_band_cut(spark):
    # 30 docs → df band is [2, 3]: shingle 'c c c' in 27 docs → cut
    # (high-df head); 'a a a' in 2 docs → kept; 'b b b' in 1 doc
    # (df < min_df) → cut.
    rows = [(i, "c c c") for i in range(27)]
    rows += [(27, "a a a"), (28, "a a a"), (29, "b b b")]
    tf = textsim.shingle_tf(_docs(spark, rows), n=3)
    kept = textsim.tfidf_vectors(tf, min_df=2, max_df_frac=0.10)
    terms = {r.term for r in kept.collect()}
    assert terms == {"a a a"}


def test_cosine_pairs_hand_computed(spark):
    # Corpus engineered so docs 1 and 2 share exactly their rare
    # shingles; weights recomputed here with the same quantization.
    rows = [
        (1, "p q r s"),
        (2, "p q r t"),
        (3, "u v w x"),
        (4, "m n o"),
    ]
    tf = textsim.shingle_tf(_docs(spark, rows), n=3)
    # relax the df band so every term with df>=1 survives — isolates
    # the scoring math from the pruning (tested separately above)
    vecs = textsim.tfidf_vectors(tf, min_df=1, max_df_frac=1.0)
    got = {
        (r.doc_lo, r.doc_hi): r.sim
        for r in textsim.cosine_pairs(vecs, threshold=0.0).collect()
    }
    # replicate: n_docs=4; 'p q r' df=2, the others df=1
    w_shared = round(math.log(4 / 2) * textsim.IDF_SCALE)
    w_rare = round(math.log(4 / 1) * textsim.IDF_SCALE)
    dot = w_shared * w_shared
    nrm = w_shared**2 + w_rare**2  # each of docs 1,2: one shared + one rare
    expect = round(dot / (math.sqrt(nrm) * math.sqrt(nrm)), 6)
    assert got == {(1, 2): pytest.approx(expect, abs=0)}


def test_cosine_pairs_partitioning_invariant(spark):
    rows = [
        (i, f"tok{i % 4} shared shingle body tok{(i * 7) % 5} tail {i % 3}")
        for i in range(40)
    ]
    base = _docs(spark, rows)
    def run(df):
        tf = textsim.shingle_tf(df, n=3)
        vecs = textsim.tfidf_vectors(tf, min_df=2, max_df_frac=0.5)
        return sorted(
            (r.doc_lo, r.doc_hi, r.sim)
            for r in textsim.cosine_pairs(vecs, threshold=0.1).collect()
        )
    a = run(base.repartition(1))
    b = run(base.repartition(7, F.col("doc_id")))
    assert a == b and len(a) > 0
