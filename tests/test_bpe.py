"""BPE trainer parity against a pure-Python reference implementation
of the Sennrich et al. 2016 algorithm (the SURVEY-§5 contract for
iterative operators with no SQL oracle)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.functions import bpe


# --- reference implementation (word-frequency table, greedy merges) ---

def _ref_word_freqs(texts):
    wf = Counter()
    for t in texts:
        # split on ' ' exactly, matching the engine-wide textfns.tokens
        # contract (space-separated; tabs/newlines stay inside tokens)
        for w in t.lower().split(" "):
            if w:
                wf[w] += 1
    return {tuple(w): c for w, c in wf.items()}


def _ref_pair_counts(vocab):
    pc = Counter()
    for syms, c in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += c
    return pc


def _ref_merge_word(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts, n_merges):
    vocab = _ref_word_freqs(texts)
    merges = []
    for _ in range(n_merges):
        pc = _ref_pair_counts(vocab)
        pc = {p: n for p, n in pc.items() if n >= 2}
        if not pc:
            break
        # max count, tie-broken by the SEP-joined pair string ascending
        best = min(pc.items(), key=lambda kv: (-kv[1], bpe.SEP.join(kv[0])))
        (left, right), freq = best
        merges.append((left, right, freq))
        vocab = {
            _ref_merge_word(s, (left, right)): c for s, c in vocab.items()
        }
    return merges


def test_space_only_tokenization_contract(spark):
    # tabs/newlines are NOT separators: 'a\tb' is ONE word (the
    # documented word_freqs contract), so its pair ('a\t','b')... i.e.
    # ('a','\t') etc. counts come from inside the token
    docs = spark.createDataFrame(
        [(0, "a\tb a\tb x y"), (1, "a\tb c d")], "doc_id long, text string"
    )
    got = bpe.train(docs, n_merges=1)
    want = _ref_train(["a\tb a\tb x y", "a\tb c d"], 1)
    assert got == want
    # the merged pair involves the tab-joined token's chars
    assert got and "\t" in (got[0][0] + got[0][1])


def _ref_encode(word, merges):
    syms = tuple(word.lower())
    for left, right, _ in merges:
        syms = _ref_merge_word(syms, (left, right))
    return list(syms)


CORPUS = [
    "the cat sat on the mat the cat ran",
    "abab abab abab banana bandana",
    "aaa aaaa aa the the the mat cat",
    "low lower lowest newer newest wide wider widest",
    "x.y x.y a$b a$b a$b (paren) (paren)",  # regex metachars as symbols
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_matches_reference_sequence(spark):
    got = bpe.train(_docs(spark), n_merges=12)
    want = _ref_train(CORPUS, 12)
    assert got == want
    assert len(got) == 12  # corpus is rich enough for all 12


def test_train_early_stop_when_dry(spark):
    docs = spark.createDataFrame([(0, "q w e r t y")], "doc_id long, text string")
    # every word is 1 char: no adjacent pairs at all -> zero merges
    assert bpe.train(docs, n_merges=5) == []


def test_back_to_back_occurrences_all_merge(spark):
    # "abab": after merging (a,b) BOTH occurrences must merge in one
    # pass (the zero-width-boundary property the docstring pins)
    docs = spark.createDataFrame(
        [(0, "abab abab")], "doc_id long, text string"
    )
    merges = bpe.train(docs, n_merges=2)
    assert merges == _ref_train(["abab abab"], 2)
    # second merge must see 'ab' as a single symbol on both sides
    assert merges[1][:2] == ("ab", "ab")


def test_apply_merges_matches_reference_encoder(spark):
    merges = _ref_train(CORPUS, 10)
    df = _docs(spark).select(
        "doc_id", bpe.apply_merges(F.col("text"), merges).alias("toks")
    )
    got = {r.doc_id: r.toks for r in df.collect()}
    for i, t in enumerate(CORPUS):
        want = [s for w in t.lower().split() if w for s in _ref_encode(w, merges)]
        assert got[i] == want, f"doc {i}"


def test_train_batched_batch1_is_sequential(spark):
    # batch=1 must reproduce the exact sequential algorithm: same
    # pairs, same frequencies, same order
    got = bpe.train_batched(_docs(spark), n_merges=10, batch=1)
    assert got == _ref_train(CORPUS, 10)


def test_train_batched_deterministic_and_complete(spark):
    import pytest

    merges = bpe.train_batched(_docs(spark), n_merges=12, batch=4)
    assert len(merges) == 12
    # determinism: same corpus -> same sequence
    assert merges == bpe.train_batched(_docs(spark), n_merges=12, batch=4)
    with pytest.raises(ValueError, match="batch"):
        bpe.train_batched(_docs(spark), n_merges=2, batch=0)


def test_pick_non_interfering_rules():
    S = bpe.SEP

    def pair(left, right, n):
        return (f"{left}{S}{right}", n)

    # shared symbol: (a,b) blocks (b,c)
    got = bpe.pick_non_interfering([pair("a", "b", 9), pair("b", "c", 8)], 4)
    assert [(left, right) for left, right, _ in got] == [("a", "b")]
    # product interference: (a,bc) produces "abc" == (abc,d)'s left —
    # applying (a,bc) first would CREATE new (abc,d) occurrences, so
    # the batch must defer (abc,d)
    got = bpe.pick_non_interfering([pair("a", "bc", 9), pair("abc", "d", 8)], 4)
    assert [(left, right) for left, right, _ in got] == [("a", "bc")]
    # reverse direction: (ab,c)'s product "abc" equals (abc,d)'s symbol
    got = bpe.pick_non_interfering([pair("abc", "d", 9), pair("ab", "c", 8)], 4)
    assert [(left, right) for left, right, _ in got] == [("abc", "d")]
    # genuinely disjoint picks coexist, in rank order, capped at want
    got = bpe.pick_non_interfering(
        [pair("a", "b", 9), pair("c", "d", 8), pair("e", "f", 7)], 2
    )
    assert [(left, right) for left, right, _ in got] == [("a", "b"), ("c", "d")]
    # the top pair always survives
    assert bpe.pick_non_interfering([pair("x", "x", 5)], 1) == [("x", "x", 5)]
    assert bpe.pick_non_interfering([], 3) == []


def test_pick_non_interfering_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.text(alphabet="ab", min_size=1, max_size=3)
    pairs = st.lists(
        st.tuples(sym, sym, st.integers(min_value=2, max_value=99)),
        min_size=0, max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(pairs=pairs, want=st.integers(min_value=1, max_value=6))
    def check(pairs, want):
        ranked = [(f"{a}{bpe.SEP}{b}", n) for a, b, n in pairs]
        picked = bpe.pick_non_interfering(ranked, want)
        # bounded by want, non-empty iff input non-empty, top pair first
        assert len(picked) <= want
        if ranked:
            top_l, top_r = ranked[0][0].split(bpe.SEP)
            assert picked and picked[0][:2] == (top_l, top_r)
        # pairwise non-interference: symbols and products all disjoint
        seen: set[str] = set()
        for left, right, _ in picked:
            assert not ({left, right, left + right} & seen)
            seen.update((left, right, left + right))
        # greedy maximality: every skipped candidate (up to the point
        # where want was reached) interferes with an earlier pick
        if len(picked) < want:
            for p, n in ranked:
                left, right = p.split(bpe.SEP)
                if (left, right, n) in picked:
                    continue
                assert {left, right, left + right} & seen

    check()


def test_merge_table_shape(spark):
    merges = bpe.train(_docs(spark), n_merges=3)
    tbl = bpe.merge_table(spark, merges)
    rows = tbl.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert all(r.pair_freq >= 2 for r in rows)


def test_encode_corpus_query_consistency(spark, sf_dir):
    """The registered encoder query's accounting must agree with a
    direct pure-Python re-encoding of a sample of documents."""
    from dirt_hadoop_similarity_spark.functions import bpe
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES
    from dirt_hadoop_similarity_spark.plans import queries_ext  # noqa: F401

    out = {r["doc_id"]: r for r in
           QUERIES["bpe_encode_corpus"].fn(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe.train(docs, n_merges=8)

    def encode_py(text):
        toks = []
        for w in text.lower().split(" "):
            if not w:
                continue
            syms = list(w)
            for left, right, _ in merges:
                i, merged = 0, []
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            toks.extend(syms)
        return toks

    sample = docs.limit(20).collect()
    assert sample
    for r in sample:
        toks = encode_py(r["text"])
        if not toks:
            assert r["doc_id"] not in out
            continue
        row = out[r["doc_id"]]
        assert row["n_bpe_tokens"] == len(toks)
        import hashlib
        assert row["stream_md5"] == hashlib.md5(
            " ".join(toks).encode()).hexdigest()
