"""Phrase→path compiler parity with DirtDriver.java:768-824 (java dialect)
and analysis/evaluate_dirt.py:11-38 (eval dialect)."""

import pytest

from dirt_hadoop_similarity_spark.functions.phrases import compile_phrase


@pytest.mark.parametrize(
    "phrase,expect",
    [
        ("X cause Y", "N:<nsubj:V:caus:>dobj:N"),
        ("X die from Y", "N:<nsubj:V:die:>prep:P:from:>pobj:N"),
        # passive: trailing "by"
        ("X cause by Y", "N:<nsubjpass:V:caus:>prep:P:by:>pobj:N"),
        # optional leading auxiliary is skipped
        ("X is caused by Y", "N:<nsubjpass:V:caus:>prep:P:by:>pobj:N"),
        ("X be associate with Y", "N:<nsubj:V:associ:>prep:P:with:>pobj:N"),
        # verb + particle collapse: composite stem of "pickup"
        ("X pick up from Y", "N:<nsubj:V:pickup:>prep:P:from:>pobj:N"),
        # unhandled arity → None
        ("X take a long walk with Y", None),
        # quirk preserved from the reference: "X Y" strips only "X " (the
        # \s+Y$ regex finds no preceding whitespace after the first strip),
        # leaving a bogus single-"verb" phrase "Y"
        ("X Y", "N:<nsubj:V:Y:>dobj:N"),
        ("", None),
    ],
)
def test_java_dialect(phrase, expect):
    assert compile_phrase(phrase) == expect


def test_eval_dialect_passive_uses_agent():
    assert (
        compile_phrase("X cause by Y", dialect="eval")
        == "N:<nsubjpass:V:caus:>agent:P:by:>pobj:N"
    )


def test_eval_dialect_strips_x_anywhere():
    # evaluate_dirt.py replaces X/Y anywhere, not only at the ends
    assert compile_phrase("X expose to Y", dialect="eval") == (
        "N:<nsubj:V:expos:>prep:P:to:>pobj:N"
    )


def test_injectable_stem_identity():
    assert compile_phrase("X causes Y", stem=lambda w: w) == (
        "N:<nsubj:V:causes:>dobj:N"
    )


def test_reference_testset_compile_counts():
    """Exact parity with the Java loader on the shipped test sets.

    The Java grammar only strips a LEADING X and TRAILING Y, so inverted
    "Y pred X" phrases (≈45% of the test set) fail to compile and the
    pair is dropped (DirtDriver.java:769-771,838-845) — faithfully
    reproduced here: 1386 of 2481 positive and 55 of 99 negative pairs
    survive."""
    from dirt_hadoop_similarity_spark.functions.phrases import compile_pair_file

    pos = compile_pair_file("/root/reference/analysis/positive-preds.txt", 1)
    neg = compile_pair_file("/root/reference/analysis/negative-preds.txt", 0)
    assert len(pos) == 1386
    assert len(neg) == 55
