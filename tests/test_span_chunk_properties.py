"""Property tests for duplicate_spans and chunk_documents: many seeded
random corpora checked against brute-force Python references.

Spans are corpus-global (gram counts), so independent random corpora are
NAMESPACED — every token is prefixed with its corpus id, grams can never
collide across corpora, and one Spark job checks them all at once
(hypothesis-per-example would pay Spark job latency hundreds of times).
"""

from __future__ import annotations

import hashlib
import random
from collections import Counter

from dirt_hadoop_similarity_spark.operators import curation, dedup

K = 3


def _random_corpora(seed: int, n_corpora: int = 40):
    rng = random.Random(seed)
    corpora = {}
    for c in range(n_corpora):
        vocab = [f"c{c}w{i}" for i in range(rng.randint(2, 5))]
        docs = {}
        for d in range(rng.randint(1, 6)):
            docs[d] = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        corpora[c] = docs
    return corpora


def _flatten(corpora):
    return [
        (c * 1000 + d, " ".join(toks))
        for c, docs in corpora.items()
        for d, toks in docs.items()
    ]


def _brute_spans(docs: dict[int, list[str]], k: int, min_occ: int = 2):
    grams = Counter()
    per_doc = {}
    for d, t in docs.items():
        gs = [tuple(t[i:i + k]) for i in range(len(t) - k + 1)]
        per_doc[d] = gs
        grams.update(gs)
    out = set()
    for d, gs in per_doc.items():
        dup = [i for i, g in enumerate(gs) if grams[g] >= min_occ]
        i = 0
        while i < len(dup):
            j = i
            while j + 1 < len(dup) and dup[j + 1] == dup[j] + 1:
                j += 1
            out.add((d, dup[i], dup[j] + k - 1, j - i + 1))
            i = j + 1
    return out


def test_duplicate_spans_matches_brute_force(spark):
    corpora = _random_corpora(seed=7)
    docs = spark.createDataFrame(
        _flatten(corpora), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in dedup.duplicate_spans(docs, k=K).collect()
    }
    want = set()
    for c, cdocs in corpora.items():
        for d, s, e, n in _brute_spans(cdocs, k=K):
            want.add((c * 1000 + d, s, e, n))
    assert got == want


def test_chunk_documents_matches_closed_form(spark):
    corpora = _random_corpora(seed=11)
    max_tokens, stride = 5, 3
    docs = spark.createDataFrame(
        _flatten(corpora), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"],
         r["chunk_hash"])
        for r in curation.chunk_documents(
            docs, max_tokens=max_tokens, stride=stride).collect()
    }
    want = set()
    for c, cdocs in corpora.items():
        for d, t in cdocs.items():
            for s in range(0, len(t), stride):
                piece = t[s:s + max_tokens]
                want.add((
                    c * 1000 + d, s // stride, s, len(piece),
                    hashlib.md5(" ".join(piece).encode()).hexdigest(),
                ))
    assert got == want
    # every token of every doc is covered by at least one chunk
    for c, cdocs in corpora.items():
        for d, t in cdocs.items():
            covered = set()
            for (did, _cid, s, n, _h) in got:
                if did == c * 1000 + d:
                    covered |= set(range(s, s + n))
            assert covered == set(range(len(t)))
