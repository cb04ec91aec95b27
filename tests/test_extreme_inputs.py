"""Every registered query runs against an EXTREME-shapes corpus — the
pathological-but-legal rows that stress the classes the degenerate
gates (empty/null/messy) cannot: magnitude and ties.

  * documents: a cohort of GIANT docs (text repeated ~40x — the
    O(len²) trap class three rounds of HOF fixes came from), a cohort
    whose text is one 5,000-char token (no spaces — zero-token-ish for
    word splitters, enormous for char-level hashes), and a cohort
    sharing ONE identical text (exact-dup / fingerprint tie storm);
  * events: one user takes every third event (hot key), and a cohort
    of events collapses onto a single identical timestamp across users
    (ordering tie storm — every window must break ties on event_id,
    or the engines diverge);
  * embeddings: a cohort of ALL-ZERO vectors (zero-norm cosine
    contract: score 0.0, never NaN/crash) and a cohort of IDENTICAL
    vectors (rank tie storm — every top-k must break ties on
    neighbor_id).

All values stay ASCII and in-vocabulary (giant docs repeat existing
text), so the messy gate's oracle-expressibility limits mostly do not
apply here; the one exception is dirt_full_pipeline, whose oracle
inlines the stemmer vocabulary and the single-token cohort's 'xxx…'
word is out-of-vocabulary — pinned divergent-or-equal below, engine
must still run.
"""

from __future__ import annotations

import glob
import os

import pytest

from dirt_hadoop_similarity_spark.plans.queries import ordered_registry
from oracle_harness import compare_query

REGISTRY = ordered_registry()

#: engine must run and produce the declared shape; the oracle's inline
#: stemmer vocabulary cannot cover the novel single-token word
ORACLE_LIMIT_DIVERGENT = {"dirt_full_pipeline"}

_DIRTY_SELECT = {
    "documents": """
        SELECT doc_id,
               CASE WHEN doc_id % 101 = 5 THEN repeat(text || ' ', 40)
                    WHEN doc_id % 97 = 7 THEN repeat('x', 5000)
                    WHEN doc_id % 89 = 11
                      THEN 'the same exact tie storm document text'
                    ELSE text END AS text,
               lang, source, n_chars
        FROM t
    """,
    "events": """
        SELECT CASE WHEN event_id % 3 = 0 THEN 42 ELSE user_id END
                 AS user_id,
               event_id, event_type,
               CASE WHEN event_id % 61 = 9
                    THEN TIMESTAMP '2024-01-15 12:00:00'
                    ELSE ts END AS ts,
               value, props
        FROM t
    """,
    "embeddings": """
        SELECT vec_id,
               CASE WHEN vec_id % 53 = 13
                      THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                    WHEN vec_id % 47 = 17 THEN c.e0
                    ELSE embedding END AS embedding,
               label
        FROM t CROSS JOIN
             (SELECT embedding AS e0 FROM t WHERE vec_id = 1) c
    """,
}


@pytest.fixture(scope="module")
def extreme_dir(tmp_path_factory):
    import duckdb

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("extreme_tables")
    conn = duckdb.connect()
    for p in sorted(glob.glob(f"{src}/*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        sel = _DIRTY_SELECT.get(t, "SELECT * FROM t")
        conn.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{p}'")
        conn.execute(f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    conn.close()
    return str(dst)


@pytest.fixture(scope="module")
def extreme_spark(spark):
    """Vanilla driver-shape session (the test_oracle_all discipline)."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


def test_extremes_were_injected(extreme_dir):
    import duckdb

    conn = duckdb.connect()
    checks = {
        "documents": [
            "length(text) > 10000",
            "text = repeat('x', 5000)",
            "text = 'the same exact tie storm document text'",
        ],
        "events": ["ts = TIMESTAMP '2024-01-15 12:00:00'", "user_id = 42"],
        "embeddings": [
            "list_sum(list_transform(embedding, x -> abs(x))) = 0",
        ],
    }
    for t, preds in checks.items():
        for pred in preds:
            n = conn.execute(
                f"SELECT count(*) FROM '{extreme_dir}/{t}.parquet' "
                f"WHERE {pred}"
            ).fetchone()[0]
            assert n > 0, f"{t}: fixture injected no rows with {pred}"
    # the identical-vector cohort really is identical to vec 1
    n = conn.execute(
        f"""SELECT count(*) FROM '{extreme_dir}/embeddings.parquet' a,
            (SELECT embedding AS e0 FROM '{extreme_dir}/embeddings.parquet'
             WHERE vec_id = 1) b
            WHERE a.vec_id % 47 = 17 AND a.embedding = b.e0"""
    ).fetchone()[0]
    assert n > 0
    conn.close()


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle_on_extremes(name, extreme_spark, extreme_dir):
    if name in ORACLE_LIMIT_DIVERGENT:
        df = REGISTRY[name].fn(extreme_spark, extreme_dir)
        assert df.count() >= 0
        extreme_spark.catalog.clearCache()
        from dirt_hadoop_similarity_spark.operators import _tracked_cache

        _tracked_cache.release_all()
        return
    r = compare_query(extreme_spark, name, extreme_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "name"}
