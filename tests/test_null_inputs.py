"""Every registered query runs against a NULL-injected corpus — string
payload columns (document text/source, event types, order/lineitem
status fields) nulled on deterministic row subsets, keys left intact.
Real corpora carry nulls in exactly these columns; the sf testdata has
none, so the standard oracle sweep never exercises null paths.

Round-12 finds that motivated this gate (all fixed; each side of every
fix is the SQL-null contract, not a coalesce paper-over):
  * null-text docs all paired with each other in MinHash/LSH: a NULL
    token array shingles to [NULL], the all-NULL signature's band keys
    collapse to "" because concat_ws SKIPS nulls, and every null doc
    landed in one bucket (word_shingles now emits no shingles for null
    text — a doc with no text is in no near-dup relation);
  * the multimodal decode/featurize UDFs crashed on bytes(None) — one
    corrupt payload would fail a whole 100 TB job (decode now keeps the
    row with NULL metadata; featurize drops it);
  * sample_frames emitted max_frames NULL frames per NULL payload
    (least/greatest skip null arguments) and one empty frame per
    zero-byte payload, where the contract emits none;
  * the rolling-hash ORACLE coalesced NULL text to hash 0 via
    list_prepend (now null-propagates like the Spark side);
  * text_boilerplate counted the NULL shingle as a boilerplate n-gram.
"""

from __future__ import annotations

import glob
import os

import pytest

from dirt_hadoop_similarity_spark.plans.queries import ordered_registry
from oracle_harness import compare_query

REGISTRY = ordered_registry()

#: which columns go NULL, per table, on which deterministic subset —
#: string payloads only; join/grouping keys stay non-null (a null KEY
#: is a data-contract violation upstream of the engine, where a null
#: payload is everyday dirty data)
NULL_RULES = {
    "documents": {"text": "doc_id % 13 = 3", "source": "doc_id % 7 = 2"},
    "events": {"event_type": "event_id % 11 = 5"},
    "orders": {
        "o_orderstatus": "o_orderkey % 19 = 4",
        "o_orderpriority": "o_orderkey % 23 = 6",
    },
    "lineitem": {"l_returnflag": "l_orderkey % 29 = 7"},
}


@pytest.fixture(scope="module")
def nulled_dir(tmp_path_factory):
    import duckdb

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("nulled_tables")
    conn = duckdb.connect()
    for p in sorted(glob.glob(f"{src}/*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        cols = [
            r[0]
            for r in conn.execute(f"DESCRIBE SELECT * FROM '{p}'").fetchall()
        ]
        sel = []
        for c in cols:
            rule = NULL_RULES.get(t, {}).get(c)
            sel.append(
                f'CASE WHEN {rule} THEN NULL ELSE "{c}" END AS "{c}"'
                if rule
                else f'"{c}"'
            )
        conn.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{p}') TO '{dst}/{t}.parquet' "
            "(FORMAT PARQUET)"
        )
    conn.close()
    return str(dst)


@pytest.fixture(scope="module")
def nulled_spark(spark):
    """Vanilla driver-shape session (the test_oracle_all discipline)."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


def test_nulls_were_injected(nulled_dir):
    import duckdb

    conn = duckdb.connect()
    for t, rules in NULL_RULES.items():
        for c in rules:
            n = conn.execute(
                f"SELECT count(*) FROM '{nulled_dir}/{t}.parquet' "
                f'WHERE "{c}" IS NULL'
            ).fetchone()[0]
            assert n > 0, f"{t}.{c}: fixture injected no nulls"
    conn.close()


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle_with_nulls(name, nulled_spark, nulled_dir):
    r = compare_query(nulled_spark, name, nulled_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "name"}
