"""Similarity-search operator tests."""

import math

import pytest

from dirt_hadoop_similarity_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [1.0, 0.0, 0.1, 0.0]),   # close to 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(emb):
    out = similarity.cosine_topk(emb, [0], k=4).collect()
    ranked = [(r.rank, r.neighbor_id) for r in sorted(out, key=lambda r: r.rank)]
    # cos(0,4)=0.995..., cos(0,1)=0.993..., cos(0,2)=0, cos(0,3)=-1
    assert [n for _, n in ranked] == [4, 1, 2, 3]
    cos = {r.neighbor_id: r.cos for r in out}
    assert cos[4] == pytest.approx(1 / math.sqrt(1.01), abs=1e-6)
    assert cos[2] == 0.0
    assert cos[3] == -1.0


def test_cosine_topk_excludes_self(emb):
    out = similarity.cosine_topk(emb, [0], k=10).collect()
    assert all(r.neighbor_id != 0 for r in out)


def test_sign_bucket_groups_by_signs(emb):
    from pyspark.sql import functions as F

    b = emb.select(
        "vec_id", similarity.sign_bucket(F.col("embedding"), bits=4).alias("b")
    )
    got = {r.vec_id: r.b for r in b.collect()}
    # vec 0,1,2,4 all have non-negative coords → bucket 15; vec 3 differs
    assert got[0] == got[1] == got[2] == got[4] == 15
    assert got[3] == 14  # first coord negative → bit0 off


def test_lsh_bucket_topk_subset_of_bucket(emb):
    out = similarity.lsh_bucket_topk(emb, [0], k=10, bits=4).collect()
    # vec 3 is in another bucket → absent from candidates
    assert sorted(r.neighbor_id for r in out) == [1, 2, 4]


def test_embedding_near_duplicates(emb):
    out = similarity.embedding_near_duplicates(emb, threshold=0.99, bits=4)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (0, 4) in pairs and (0, 1) in pairs
    assert all(3 not in p for p in pairs)
