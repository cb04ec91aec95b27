"""Every registered query runs against a corpus where EVERY dirty shape
the per-table gates exercise is present SIMULTANEOUSLY: messy + null
document text, null sources, null event times/users/values/props, null
order/lineitem status strings, and NULL + ragged embedding vectors.

The five per-table sweeps (empty / null-strings / messy-text /
null-events / null-vectors) each corrupt ONE table, so a query reading
several tables (curation funnel, decontamination, the classifier
pipelines, split contamination) has never been tested with its inputs
dirty AT THE SAME TIME — yet that is exactly the state of a real
100 TB ingest.  This gate closes the cross-table interaction blind
spot; the corruption recipes are the per-table gates' own, verbatim,
so any failure here that the single-table gates miss is an interaction
bug by construction.

Inherited oracle-expressibility limits (see test_messy_inputs.py —
the ENGINE side is correct in both): dirt_full_pipeline's oracle
inlines the stemmer vocabulary, and media_frames' oracle uses
character arithmetic on what are byte chunks, so both may diverge on
the messy (non-ASCII-bearing) text this corpus carries.
"""

from __future__ import annotations

import glob
import os

import pytest

from dirt_hadoop_similarity_spark.plans.queries import ordered_registry
from oracle_harness import compare_query
from test_messy_inputs import _MESS_SQL

REGISTRY = ordered_registry()

#: oracle-expressibility limits inherited from the messy-text gate
ORACLE_LIMIT_DIVERGENT = {"dirt_full_pipeline", "media_frames"}

#: one SQL projection per corrupted table — each rule is the per-table
#: gate's recipe, applied together.  Null wins over mess (a NULL text
#: stays NULL; mess applies to surviving rows).
_DIRTY_SELECT = {
    "documents": f"""
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 3 THEN NULL
                    ELSE ({_MESS_SQL}) END AS text,
               lang,
               CASE WHEN doc_id % 7 = 2 THEN NULL ELSE source END AS source,
               n_chars
        FROM t
    """,
    "events": """
        SELECT CASE WHEN event_id % 29 = 3 THEN NULL ELSE user_id END
                 AS user_id,
               event_id,
               event_type_dirty AS event_type,
               CASE WHEN event_id % 31 = 8 THEN NULL ELSE ts END AS ts,
               CASE WHEN event_id % 23 = 5 THEN NULL ELSE value END AS value,
               CASE WHEN event_id % 19 = 2 THEN NULL ELSE props END AS props
        FROM (SELECT *, CASE WHEN event_id % 11 = 5 THEN NULL
                             ELSE event_type END AS event_type_dirty
              FROM t)
    """,
    "embeddings": """
        SELECT vec_id,
               CASE WHEN vec_id % 37 = 4 THEN NULL
                    WHEN vec_id % 41 = 6 THEN embedding[1:32]
                    ELSE embedding END AS embedding,
               label
        FROM t
    """,
    "orders": """
        SELECT * REPLACE (
          CASE WHEN o_orderkey % 19 = 4 THEN NULL ELSE o_orderstatus END
            AS o_orderstatus,
          CASE WHEN o_orderkey % 23 = 6 THEN NULL ELSE o_orderpriority END
            AS o_orderpriority)
        FROM t
    """,
    "lineitem": """
        SELECT * REPLACE (
          CASE WHEN l_orderkey % 29 = 7 THEN NULL ELSE l_returnflag END
            AS l_returnflag)
        FROM t
    """,
}


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    import duckdb

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("combined_dirty_tables")
    conn = duckdb.connect()
    for p in sorted(glob.glob(f"{src}/*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        sel = _DIRTY_SELECT.get(t, "SELECT * FROM t")
        conn.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{p}'")
        conn.execute(
            f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    conn.close()
    return str(dst)


@pytest.fixture(scope="module")
def dirty_spark(spark):
    """Vanilla driver-shape session (the test_oracle_all discipline)."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


def test_dirt_was_injected(dirty_dir):
    import duckdb

    conn = duckdb.connect()
    checks = {
        "documents": ["text IS NULL", "source IS NULL", "text = ''"],
        "events": ["ts IS NULL", "user_id IS NULL", "value IS NULL",
                   "props IS NULL", "event_type IS NULL"],
        "embeddings": ["embedding IS NULL", "len(embedding) = 32"],
        "orders": ["o_orderstatus IS NULL", "o_orderpriority IS NULL"],
        "lineitem": ["l_returnflag IS NULL"],
    }
    for t, preds in checks.items():
        for pred in preds:
            n = conn.execute(
                f"SELECT count(*) FROM '{dirty_dir}/{t}.parquet' WHERE {pred}"
            ).fetchone()[0]
            assert n > 0, f"{t}: fixture injected no rows with {pred}"
    conn.close()


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle_on_combined_dirt(name, dirty_spark,
                                               dirty_dir):
    if name in ORACLE_LIMIT_DIVERGENT:
        # engine must RUN and produce the declared shape; values may
        # diverge for the documented oracle-expressibility reason
        df = REGISTRY[name].fn(dirty_spark, dirty_dir)
        assert df.count() >= 0
        dirty_spark.catalog.clearCache()
        from dirt_hadoop_similarity_spark.operators import _tracked_cache

        _tracked_cache.release_all()
        return
    r = compare_query(dirty_spark, name, dirty_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "name"}
