"""Property-based tests (hypothesis) for the path-extraction core and
the Porter stemmer — invariants that must hold for ANY input, not just
the fixtures."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from dirt_hadoop_similarity_spark.functions.porter import porter_stem
from dirt_hadoop_similarity_spark.operators.extraction import extract_paths

WORDS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu")), min_size=1, max_size=12
)
POS = st.sampled_from(["NN", "NNS", "NNP", "VB", "VBP", "VBZ", "IN", "TO",
                       "JJ", "RB", "DT", "CC"])
DEPS = st.sampled_from(["nsubj", "dobj", "prep", "pobj", "amod", "ROOT",
                        "conj", "cc", "det"])


@st.composite
def token_lists(draw):
    n = draw(st.integers(min_value=0, max_value=10))
    return [
        {
            "word": draw(WORDS),
            "pos": draw(POS),
            "dep": draw(DEPS),
            # heads may be 0 (root), valid, or dangling out of range
            "head": draw(st.integers(min_value=-2, max_value=n + 3)),
        }
        for _ in range(n)
    ]


PATH_RE = re.compile(r"^N:(<|>)[^:]+:.*:(<|>)[^:]+:N$")


@settings(max_examples=300, deadline=None)
@given(token_lists())
def test_extraction_invariants(tokens):
    out = extract_paths(tokens)
    nouns = [t for t in tokens if t["pos"].startswith("N")]
    max_pairs = len(nouns) * (len(nouns) - 1) // 2
    assert len(out) <= max_pairs
    for rec in out:
        # path endpoints render as N with directed edges in between
        assert rec["path"].startswith("N:")
        assert rec["path"].endswith(":N")
        assert PATH_RE.match(rec["path"]) or rec["path"].count(":") >= 4
        # a valid path must contain a non-aux verb node or traverse one
        # (V: appears unless the verb is an endpoint noun — impossible)
        # endpoints are stemmed originals
        assert isinstance(rec["x"], str) and isinstance(rec["y"], str)


@settings(max_examples=500, deadline=None)
@given(WORDS)
def test_porter_never_crashes_or_grows_much(word):
    s = porter_stem(word)
    assert isinstance(s, str)
    # step1b may append one 'e'; nothing should grow beyond that
    assert len(s) <= len(word) + 1


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_porter_arbitrary_text_safe(text):
    # punctuation, digits, unicode — treated as consonants, never crash
    assert isinstance(porter_stem(text), str)
