"""TSV export / Parquet checkpoint round-trips."""

import tempfile

from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.sources import sinks


def test_tsv_roundtrip(spark):
    df = spark.createDataFrame(
        [("N:<nsubj:V:caus:>dobj:N", "N:<nsubj:V:lead:>prep:P:to:>pobj:N", 0.774),
         ("a", "b", 0.0)],
        ["p1", "p2", "score"],
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/sims_tsv"
        sinks.write_tsv(df, path, coalesce=1)
        back = sinks.read_tsv(spark, path, "p1 STRING, p2 STRING, score DOUBLE")
        got = {(r.p1, r.p2): r.score for r in back.collect()}
    assert got == {(r.p1, r.p2): r.score for r in df.collect()}


def test_checkpoint_parquet_roundtrip(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    )
    with tempfile.TemporaryDirectory() as d:
        back = sinks.checkpoint_parquet(df, f"{d}/ckpt", partition_by=["part"])
        assert back.count() == 100
        assert set(back.columns) == {"id", "part"}


def test_jsonl_roundtrip(spark, tmp_path):
    from dirt_hadoop_similarity_spark.sources.sinks import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, 'quotes " and\ttabs', "de")],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "jsonl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, schema="doc_id long, text string, lang string")
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_jsonl_corrupt_line_quarantined(spark, tmp_path):
    from dirt_hadoop_similarity_spark.sources.sinks import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json at all\n')
    back = read_jsonl(
        spark, str(p),
        schema="doc_id long, text string, _corrupt_record string",
    )
    rows = back.collect()
    assert len(rows) == 2
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["doc_id"] is None
