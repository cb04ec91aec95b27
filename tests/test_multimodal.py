"""Multimodal plumbing: fake-decoder determinism, shuffle-free plans,
feature quantization round-trip (the driver-oracle derivation)."""

import hashlib

from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.operators import multimodal


def _media(spark, texts):
    docs = spark.createDataFrame(
        [(i, "synthetic", t) for i, t in enumerate(texts)],
        ["doc_id", "source", "text"],
    )
    return multimodal.documents_as_media(docs)


def test_decode_metadata_matches_md5_derivation(spark):
    texts = ["hello world", "a", "multi modal payload bytes"]
    out = {
        r.media_id: r
        for r in multimodal.decode_metadata(_media(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        h = hashlib.md5(t.encode()).digest()
        r = out[i]
        assert r.width == 64 + int.from_bytes(h[0:2], "big") % 1960
        assert r.height == 64 + int.from_bytes(h[2:4], "big") % 1960
        assert r.channels == 1 + h[4] % 4
        assert r.n_bytes == len(t.encode())


def test_decode_metadata_plan_has_no_exchange(spark):
    # the old implementation repartition()-ed the payload relation — a
    # full shuffle of every media byte for zero semantic effect.  The
    # decode must run over source partitions as-is.
    decoded = multimodal.decode_metadata(_media(spark, ["x", "y"] * 10))
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_decode_metadata_leaves_session_conf_unchanged(spark):
    # regression: an earlier version set arrow.maxRecordsPerBatch
    # session-wide at plan-build time, silently changing Arrow batching
    # for every subsequent pandas-UDF query in the session.
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key, None)
    multimodal.decode_metadata(_media(spark, ["x"])).collect()
    assert spark.conf.get(key, None) == before


def test_feature_quantization_roundtrip(spark):
    # dim=16 == one md5 digest: de-quantizing (f + 0.5) * 255 must give
    # back the digest bytes exactly despite float32 storage — this is the
    # derivation media_features' DuckDB oracle relies on.
    texts = ["alpha", "beta gamma", ""]
    feats = multimodal.extract_features(_media(spark, texts), dim=16)
    rows = feats.select(
        "media_id", F.posexplode("feature").alias("i", "f")
    ).select(
        "media_id", "i", F.round((F.col("f") + 0.5) * 255).cast("int").alias("b")
    ).collect()
    got = {(r.media_id, r.i): r.b for r in rows}
    for mid, t in enumerate(texts):
        digest = hashlib.md5(t.encode()).digest()
        for i, byte in enumerate(digest):
            assert got[(mid, i)] == byte
    assert len(got) == len(texts) * 16


def test_feature_chain_beyond_one_digest(spark):
    # dim > 16 exercises the md5 chain: bytes 16.. come from md5(md5(p)).
    feats = multimodal.extract_features(_media(spark, ["chain me"]), dim=20)
    vec = feats.first().feature
    d1 = hashlib.md5(b"chain me").digest()
    d2 = hashlib.md5(d1).digest()
    expected = [b / 255.0 - 0.5 for b in (d1 + d2)[:20]]
    assert len(vec) == 20
    for got, exp in zip(vec, expected):
        assert abs(got - exp) < 1e-6


def test_sample_text_frames_reconstructs_prefix(spark):
    """Frame laws for the character-window sampler, on texts chosen to
    hit every boundary: empty, NULL, exactly one window, one char over,
    max_frames overflow, and multibyte characters (the class that
    crashed the byte-chunk + decode spelling).

      1. n_frames == min(ceil(len/W), max_frames), and 0 for NULL/empty;
      2. concatenating a doc's frames in index order reconstructs the
         first min(len, W*max_frames) CHARACTERS of the text exactly —
         no torn multibyte char, no gap, no overlap.
    """
    from dirt_hadoop_similarity_spark.operators import multimodal

    W, MF = 8, 3
    texts = {
        1: "",          # no frames
        2: None,        # no frames
        3: "abcdefgh",             # exactly one window
        4: "abcdefghi",            # one char over -> 2 frames
        5: "x" * (W * MF + 5),     # overflow -> capped at max_frames
        6: "héllo wörld 北京 ém",  # multibyte chars straddle windows
        7: "short",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    out = multimodal.sample_text_frames(
        docs, every_n_chars=W, max_frames=MF
    ).collect()

    by_doc: dict[int, dict[int, str]] = {}
    for r in out:
        by_doc.setdefault(r.media_id, {})[r.frame_index] = r.frame_text

    for k, t in texts.items():
        if not t:
            assert k not in by_doc, (k, by_doc.get(k))
            continue
        expect_n = min(-(-len(t) // W), MF)
        frames = by_doc[k]
        assert sorted(frames) == list(range(expect_n)), (k, frames)
        joined = "".join(frames[i] for i in range(expect_n))
        assert joined == t[: W * MF], (k, joined)
