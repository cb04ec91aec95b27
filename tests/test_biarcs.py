"""Biarc line/token parsing semantics (DirtDriver.java:487-552)."""

from dirt_hadoop_similarity_spark.sources.biarcs import (
    parse_biarc_lines,
    with_tokens,
)


def _parse(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    return parse_biarc_lines(df)


def test_line_fields_and_count_fallback(spark):
    df = _parse(
        spark,
        [
            "head\tngram here\t42\t1999,1 2000,2",  # extra fields ignored
            "head\tngram here\tnotanum",            # bad count → 1
            "tooshort\tonly2",                      # <3 fields → dropped
            "",                                     # empty → dropped
        ],
    )
    rows = df.collect()
    assert [(r.head_word, r.n) for r in rows] == [("head", 42), ("head", 1)]


def test_token_parse_slash_in_word(spark):
    # word may contain '/': split happens on the LAST three slashes
    df = with_tokens(
        _parse(spark, ["h\tand/or/CC/cc/3 dogs/NNS/nsubj/2\t1"])
    )
    toks = df.select("tokens").first().tokens
    assert [(t.word, t.pos, t.dep, t.head) for t in toks] == [
        ("and/or", "CC", "cc", 3),
        ("dogs", "NNS", "nsubj", 2),
    ]


def test_malformed_tokens_skipped(spark):
    df = with_tokens(
        _parse(
            spark,
            [
                "h\tnoslash one/slash two/sl/ashes ok/NN/dep/1\t1",
                "h\tbadhead/NN/dep/xx\t1",  # head not an int → token skipped → row dropped
            ],
        )
    )
    rows = df.collect()
    assert len(rows) == 1
    assert [(t.word, t.head) for t in rows[0].tokens] == [("ok", 1)]


def test_trailing_empty_fields_rejected(spark):
    # Java's String.split("\t") drops trailing empty fields, so a line
    # 'head\tngram\t' has length 2 and is rejected (DirtDriver.java:487-492);
    # a real third field followed by trailing tabs is still accepted.
    df = _parse(
        spark,
        [
            "head\tngram\t",       # empty count field → len 2 in Java → dropped
            "head\tngram\t\t\t",   # all-trailing empties → dropped
            "head\tngram\t42\t",   # trailing tab after real count → kept
        ],
    )
    rows = df.collect()
    assert [(r.head_word, r.n) for r in rows] == [("head", 42)]


def test_empty_word_allowed(spark):
    # "/NN/dep/2" → empty word, still a token (matches reference substring math)
    df = with_tokens(_parse(spark, ["h\t/NN/dep/2 x/VB/ROOT/0\t1"]))
    toks = df.first().tokens
    assert toks[0].word == "" and toks[0].pos == "NN"
