"""Every registered query runs against a MESSY-text corpus — doubled
internal spaces, leading/trailing space runs, tabs inside tokens, empty
strings, appended non-ASCII (accented + CJK) words, and injected
newlines, each on a deterministic doc subset.  Real text is exactly
this dirty; the sf corpus is single-spaced ASCII, so the standard
sweep never exercises these paths.

Round-12 finds that motivated this gate (fixed):
  * empty/whitespace-only docs all paired as jaccard-1.0 "near-dups":
    a zero-token doc shingled to [""] and every empty doc landed in
    the same LSH buckets (word_shingles now requires >= 1 token; the
    shared shingle oracle SQL agrees);
  * media_frames_text crashed MALFORMED_CHARACTER_CODING: byte-chunk
    frames of UTF-8 text tear multibyte characters, and decode() raises
    on the torn edge (the query now samples CHARACTER windows via
    multimodal.sample_text_frames — byte chunks stay available for
    binary digests in media_frames);
  * the bag-of-words fingerprint oracle emitted NULL for empty docs
    (DuckDB array_to_string([]) is NULL) where the engine correctly
    fingerprints the empty bag.

Two DOCUMENTED oracle-expressibility limits are pinned below, not
papered over (the ENGINE side is correct in both):
  * dirt_full_pipeline — the oracle inlines the stemmer vocabulary as a
    lookup (FULL_PIPE_STEMS, coverage-pinned to the shipped corpus by
    tests/test_pipeline.py); out-of-vocabulary words drop out of the
    oracle while the live Porter stemmer handles any token, so scores
    diverge on corpora with novel words.
  * media_frames — frames are BYTE chunks (correct for binary media);
    DuckDB cannot substring BLOBs, so the oracle uses character
    arithmetic, exact only for ASCII payloads (stated in the query
    doc).  Non-ASCII payloads shift chunk boundaries and digests.
"""

from __future__ import annotations

import glob
import os

import pytest

from dirt_hadoop_similarity_spark.plans.queries import ordered_registry
from oracle_harness import compare_query

REGISTRY = ordered_registry()

#: oracle-expressibility limits (see module docstring) — the pinned
#: check still requires the Spark side to RUN and produce sane shapes
ORACLE_LIMIT_DIVERGENT = {"dirt_full_pipeline", "media_frames"}

_MESS_SQL = """
CASE doc_id % 17
  WHEN 1 THEN replace(text, ' ', '  ')
  WHEN 2 THEN '  ' || text || '   '
  WHEN 3 THEN replace(text, ' the ', chr(9) || 'the' || chr(9))
  WHEN 4 THEN ''
  WHEN 5 THEN text || ' héllo wörld 北京 ému'
  WHEN 6 THEN replace(text, '. ', '.' || chr(10))
  ELSE text END
"""


@pytest.fixture(scope="module")
def messy_dir(tmp_path_factory):
    import duckdb

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("messy_tables")
    conn = duckdb.connect()
    for p in sorted(glob.glob(f"{src}/*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        if t == "documents":
            conn.execute(
                f"COPY (SELECT doc_id, {_MESS_SQL} AS text, lang, source, "
                f"n_chars FROM '{p}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            conn.execute(
                f"COPY (SELECT * FROM '{p}') TO '{dst}/{t}.parquet' "
                "(FORMAT PARQUET)"
            )
    conn.close()
    return str(dst)


@pytest.fixture(scope="module")
def messy_spark(spark):
    """Vanilla driver-shape session (the test_oracle_all discipline)."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle_on_messy_text(name, messy_spark, messy_dir):
    if name in ORACLE_LIMIT_DIVERGENT:
        r = compare_query(messy_spark, name, messy_dir)
        # the engine side must still run and agree on SHAPE; only the
        # values may diverge, for the documented reason
        assert r["spark_rows"] > 0, r
        assert r["cols_match"], r
        return
    r = compare_query(messy_spark, name, messy_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "name"}


def test_divergence_whitelist_is_current():
    missing = ORACLE_LIMIT_DIVERGENT - set(REGISTRY)
    assert not missing, missing
