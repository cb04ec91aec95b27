"""Every registered query runs against an embeddings table carrying
NULL vectors (failed embedding jobs) and RAGGED half-length vectors
(mixed model versions) — the dirty vector shapes a 100 TB embeddings
corpus always contains and the sf testdata never does.

Round-12 contract: vectors must be non-null and exactly the declared
index dimension (``similarity.valid_vectors`` — the admission check
every real ANN system performs at index creation).  Without it the
sweep observed three failure modes: zip_with pads the short side of a
dot product with NULLs, the GEMM/IVF/PQ panel collects raise numpy
inhomogeneous-shape ValueErrors on the driver or executor, and
DuckDB's list_inner_product refuses mismatched lengths outright (the
ann_rh_topk ORACLE crashed before Spark ever ran).

Round-13 rotation: EVERY vector query now applies the gate (the
shared plans/queries_ext._emb load), with every oracle carrying the
same ``_VALID_EMB`` predicate — the r12 must-fail pins flipped to
green sweep rows and the divergence whitelist is empty.
"""

from __future__ import annotations

import glob
import os

import pytest

from dirt_hadoop_similarity_spark.plans.queries import ordered_registry
from oracle_harness import compare_query

REGISTRY = ordered_registry()

#: empty since the r13 rotation landed the valid_vectors gate on the
#: whole ANN family; kept as the mechanism for any future
#: known-divergent query
R13_QUEUED_DIVERGENT: set[str] = set()


@pytest.fixture(scope="module")
def embnull_dir(tmp_path_factory):
    import duckdb

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = tmp_path_factory.mktemp("embnull_tables")
    conn = duckdb.connect()
    for p in sorted(glob.glob(f"{src}/*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        if t == "embeddings":
            conn.execute(
                f"""COPY (SELECT vec_id,
                       CASE WHEN vec_id % 37 = 4 THEN NULL
                            WHEN vec_id % 41 = 6 THEN embedding[1:32]
                            ELSE embedding END AS embedding,
                       label
                      FROM '{p}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"""
            )
        else:
            conn.execute(
                f"COPY (SELECT * FROM '{p}') TO '{dst}/{t}.parquet' "
                "(FORMAT PARQUET)"
            )
    conn.close()
    return str(dst)


@pytest.fixture(scope="module")
def embnull_spark(spark):
    """Vanilla driver-shape session (the test_oracle_all discipline)."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle_with_dirty_vectors(name, embnull_spark,
                                                 embnull_dir):
    if name in R13_QUEUED_DIVERGENT:
        try:
            r = compare_query(embnull_spark, name, embnull_dir)
        except Exception:
            return  # pinned: crash is the documented pre-r13 behavior
        assert not r["ok"], (
            f"{name} now matches its oracle on the dirty-vector corpus — "
            "the r13 valid_vectors gate landed; remove it from "
            "R13_QUEUED_DIVERGENT so regressions are caught"
        )
        return
    r = compare_query(embnull_spark, name, embnull_dir)
    assert r["ok"], {k: v for k, v in r.items() if k != "name"}


def test_divergence_whitelist_is_current():
    missing = R13_QUEUED_DIVERGENT - set(REGISTRY)
    assert not missing, missing
