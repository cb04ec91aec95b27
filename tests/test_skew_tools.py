"""The round-10 skew-measurement substrates have invariants the PERF.md
skew tables depend on — pin them at tiny sizes:

  * tools/dirt_skew_check.gen_corpora — the skewed corpus must actually
    carry ~50% of docs on the 2 hot verbs/sources (and the uniform one
    must not), at constant volume and with the documents schema;
  * tools/graph_skew_bench.gen_edges — the hub must hold ~hub_pct% of
    edge endpoints at constant |E|;
  * tools/stream_state_bench.build_constant_user_events — same user
    population, mult x the events, and a single FILE named
    events.parquet (stream_events path-glob-filters for the file).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_dirt_skew_corpora_invariants(spark, tmp_path):
    from dirt_skew_check import HOT_VERBS, gen_corpora

    dirs = gen_corpora(spark, str(tmp_path), 5_000)
    docs = {
        kind: spark.read.parquet(f"{d}/documents.parquet")
        for kind, d in dirs.items()
    }
    # constant volume, documents schema, exactly 6 tokens per text
    for kind, df in docs.items():
        assert df.count() == 5_000, kind
        assert [f.name for f in df.schema.fields] == [
            "doc_id", "text", "lang", "source", "n_chars"
        ], kind
        assert df.filter(F.size(F.split("text", " ")) != 6).count() == 0

    def share(df, col_expr, values):
        n = df.filter(col_expr.isin(list(values))).count()
        return n / df.count()

    verb = F.split("text", " ")[1]
    # skewed: the 2 hot verbs and 2 hot sources carry ~50%
    assert abs(share(docs["skew"], verb, HOT_VERBS) - 0.5) < 0.05
    assert abs(
        share(docs["skew"], F.col("source"), ["srchot0", "srchot1"]) - 0.5
    ) < 0.05
    # uniform: no verb above a few percent
    top = (
        docs["uniform"].groupBy(verb.alias("v")).count()
        .agg(F.max("count")).first()[0]
    )
    assert top / 5_000 < 0.05

    # ADVICE r10: a different --docs lands in a DIFFERENT directory, so
    # the exists-skip can never serve a stale corpus for new parameters
    dirs2 = gen_corpora(spark, str(tmp_path), 1_000)
    assert dirs2["skew"] != dirs["skew"]
    assert spark.read.parquet(
        f"{dirs2['skew']}/documents.parquet"
    ).count() == 1_000


def test_graph_skew_edges_invariants(spark, tmp_path):
    from graph_skew_bench import gen_edges

    dirs = gen_edges(spark, str(tmp_path), n_nodes=2_000, n_edges=20_000,
                     hub_pct=30)
    edges = {
        kind: spark.read.parquet(f"{d}/edges.parquet")
        for kind, d in dirs.items()
    }
    for kind, df in edges.items():
        assert df.count() == 20_000, kind  # constant |E|
    hub_share = (
        edges["hub"].filter(F.col("id_a") == 0).count() / 20_000
    )
    assert abs(hub_share - 0.30) < 0.03
    uni_top = (
        edges["uniform"].groupBy("id_a").count()
        .agg(F.max("count")).first()[0]
    )
    assert uni_top / 20_000 < 0.01

    # ADVICE r10: parameters are path-encoded — a changed hub_pct (or
    # size) regenerates rather than reusing the stale corpus; uniform
    # ignores hub_pct and IS legitimately shared across hub_pct values
    dirs2 = gen_edges(spark, str(tmp_path), n_nodes=2_000, n_edges=20_000,
                      hub_pct=60)
    assert dirs2["hub"] != dirs["hub"]
    assert dirs2["uniform"] == dirs["uniform"]
    hub2 = spark.read.parquet(f"{dirs2['hub']}/edges.parquet")
    assert abs(hub2.filter(F.col("id_a") == 0).count() / 20_000 - 0.60) < 0.03


def test_constant_user_events_invariants(spark, tmp_path):
    from stream_state_bench import build_constant_user_events

    src = "/root/testdata/sf0.001"
    out = build_constant_user_events(spark, src, mult=3,
                                     out_root=str(tmp_path))
    dest = os.path.join(out, "events.parquet")
    # a single FILE, not a directory — stream_events' pathGlobFilter
    # matches the file name
    assert os.path.isfile(dest)
    base = spark.read.parquet(f"{src}/events.parquet")
    got = spark.read.parquet(dest)
    assert got.count() == 3 * base.count()
    base_users = {r[0] for r in base.select("user_id").distinct().collect()}
    got_users = {r[0] for r in got.select("user_id").distinct().collect()}
    assert got_users == base_users  # SAME population, not shifted
    assert dict(got.dtypes)["ts"] == "timestamp_ntz"
    # event ids stay unique after the replicate-and-shift
    assert got.select("event_id").distinct().count() == got.count()
