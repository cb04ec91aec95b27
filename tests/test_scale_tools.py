"""The scale-measurement substrate (tools/gen_scale_corpus.py) has
invariants PERF.md's scaling table depends on — pin them at a tiny
multiplier so the tool can't silently regress into the naive-copy
behavior it exists to avoid (identical replicas would weld into one
near-dup cluster and make every 'linear growth' reading meaningless).

Pure pyarrow/numpy: no Spark session, runs in milliseconds.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scale"))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_scale_corpus.py"),
         "--mult", "3", "--src", SRC, "--out", out],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return os.path.join(out, "x3")


def test_row_counts_and_key_disjointness(corpus):
    for tab, key in (("documents", "doc_id"), ("events", "event_id"),
                     ("orders", "o_orderkey"), ("customer", "c_custkey"),
                     ("embeddings", "vec_id")):
        src = pq.read_table(f"{SRC}/{tab}.parquet")
        got = pq.read_table(f"{corpus}/{tab}.parquet")
        assert got.num_rows == 3 * src.num_rows, tab
        ids = got.column(key).to_pylist()
        assert len(ids) == len(set(ids)), f"{tab}.{key} collides"


def test_fk_join_stays_valid(corpus):
    orders = set(pq.read_table(f"{corpus}/orders.parquet",
                               columns=["o_orderkey"])
                 .column("o_orderkey").to_pylist())
    lines = set(pq.read_table(f"{corpus}/lineitem.parquet",
                              columns=["l_orderkey"])
                .column("l_orderkey").to_pylist())
    assert lines <= orders


def test_replica_dialects_differ_but_preserve_structure(corpus):
    src = pq.read_table(f"{SRC}/documents.parquet")
    got = pq.read_table(f"{corpus}/documents.parquet")
    n = src.num_rows
    texts = got.column("text").to_pylist()
    chars = got.column("n_chars").to_pylist()
    orig = src.column("text").to_pylist()
    # replica 0 is byte-identical; replicas 1,2 differ from it and from
    # each other (the dialect transform), with the SAME word count
    assert texts[:n] == orig
    for i in (1, 2):
        rep = texts[i * n:(i + 1) * n]
        assert rep != orig
        assert [len(t.split(" ")) for t in rep] == [
            len(t.split(" ")) for t in orig
        ]
        # every 3rd word carries the replica marker; the others are
        # untouched — within-replica shingle structure is preserved
        for a, b in zip(orig[:20], rep[:20]):
            wa, wb = a.split(" "), b.split(" ")
            for j, (x, y) in enumerate(zip(wa, wb)):
                if j % 3 == 0:
                    assert y == f"{x}~{i}"
                else:
                    assert y == x
    # n_chars recomputed from the transformed text
    assert chars == [len(t) for t in texts]


def test_embedding_roll_preserves_within_replica_geometry(corpus):
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    got = pq.read_table(f"{corpus}/embeddings.parquet")
    n = src.num_rows
    orig = [np.array(v) for v in src.column("embedding").to_pylist()]
    rep1 = [np.array(v)
            for v in got.column("embedding").to_pylist()[n:2 * n]]
    # a dimension roll is norm- and inner-product-preserving within the
    # replica, while de-aligning vectors across replicas
    for a, b in zip(orig[:10], rep1[:10]):
        assert np.allclose(np.linalg.norm(a), np.linalg.norm(b))
        assert np.allclose(b, np.roll(a, 1))
    assert float(np.dot(orig[0], orig[1])) == pytest.approx(
        float(np.dot(rep1[0], rep1[1])), rel=1e-6
    )


def test_events_timestamp_type_preserved(corpus):
    a = pq.ParquetFile(f"{SRC}/events.parquet").schema.column(1)
    b = pq.ParquetFile(f"{corpus}/events.parquet").schema.column(1)
    assert str(a.logical_type) == str(b.logical_type)
