"""Fuzz the SQL token parser against a Python port of the reference's
exact lastIndexOf-splitting semantics (DirtDriver.java:527-552) — one
vectorized Spark round per run, 300 generated ngram strings."""

import random
import string


def java_parse(ngram: str):
    """Literal semantics of the reference parser: per space token, split
    on the last three '/'; skip if fewer than 3 slashes or head is not a
    (Java-style) integer."""
    out = []
    for tok in ngram.split(" "):
        if not tok:
            continue
        last = tok.rfind("/")
        if last == -1:
            continue
        second = tok.rfind("/", 0, last)
        if second == -1:
            continue
        third = tok.rfind("/", 0, second)
        if third == -1:
            continue
        head_str = tok[last + 1:]
        try:
            # Java Integer.parseInt: optional sign, digits only
            if not head_str or not (
                head_str.lstrip("+-").isdigit() and head_str.lstrip("+-")
            ):
                continue
            head = int(head_str)
        except ValueError:
            continue
        out.append(
            (tok[:third], tok[third + 1:second], tok[second + 1:last], head)
        )
    return out


def _gen_ngrams(rng, n):
    alphabet = string.ascii_letters + "/--0123456789é"
    ngrams = []
    for _ in range(n):
        tokens = []
        for _ in range(rng.randint(0, 6)):
            kind = rng.random()
            if kind < 0.5:
                # well-formed token, word may contain slashes
                word = "".join(rng.choices(alphabet, k=rng.randint(0, 6)))
                tokens.append(f"{word}/{rng.choice(['NN','VB','IN'])}/"
                              f"{rng.choice(['nsubj','dobj'])}/{rng.randint(-3, 9)}")
            else:
                # arbitrary junk
                tokens.append("".join(rng.choices(alphabet + "/", k=rng.randint(1, 10))))
        ngrams.append(" ".join(tokens))
    return ngrams


def test_sql_parser_matches_java_semantics(spark):
    from dirt_hadoop_similarity_spark.sources.biarcs import with_tokens

    rng = random.Random(20260813)
    ngrams = _gen_ngrams(rng, 300)
    df = spark.createDataFrame(
        [(i, f"h\t{g}\t1") for i, g in enumerate(ngrams)], ["i", "value"]
    )
    from dirt_hadoop_similarity_spark.sources.biarcs import parse_biarc_lines

    parsed = with_tokens(parse_biarc_lines(df.select("value")))
    got = {
        r.ngram: [(t.word, t.pos, t.dep, t.head) for t in r.tokens]
        for r in parsed.collect()
    }
    mismatches = []
    for g in ngrams:
        expect = java_parse(g)
        actual = got.get(g, [])  # rows with zero tokens are dropped
        if expect != actual:
            mismatches.append((g, expect, actual))
    assert not mismatches, mismatches[:5]
