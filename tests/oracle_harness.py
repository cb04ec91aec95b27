"""Local replica of the driver's DuckDB-oracle correctness gate.

For each query name: run the Spark query and the oracle SQL on the same
parquet tables, then compare row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by their
full value tuple, floats compared to 1e-9 relative tolerance — slightly
LOOSER than the driver's value hash, which is why queries round their
float outputs: if a rounded value matches at 1e-9 it hash-matches too).
"""

from __future__ import annotations

import math

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_conn(sf_dir: str):
    import duckdb

    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return conn


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if isinstance(v, float):
            return round(v, 9)
        return v

    return sorted(
        (tuple(norm_cell(row[i]) for i in order) for row in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def _values_match(a, b) -> bool:
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-12):
                    return False
            elif va != vb:
                return False
    return True


def compare_query(spark, name: str, sf_dir: str) -> dict:
    from dirt_hadoop_similarity_spark.plans.queries import ordered_registry

    qd = ordered_registry()[name]
    try:
        sdf = qd.fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        # queries cache() internal relations and rely on the caller to
        # clear them (the bench does the same): without this, a 115-query
        # sweep accumulates every query's cached relations in one session
        spark.catalog.clearCache()
        # ... and drain the module cache trackers so the sweep doesn't
        # accumulate one dead DataFrame handle per tracked cache() call
        from dirt_hadoop_similarity_spark.operators import _tracked_cache

        _tracked_cache.release_all()

    result = {
        "name": name,
        "spark_rows": len(s_rows),
        "spark_cols": sorted(s_cols),
    }
    if qd.oracle is None:
        result["status"] = "rows_only"
        result["ok"] = len(s_rows) >= 0
        return result

    conn = duckdb_conn(sf_dir)
    cur = conn.execute(qd.oracle)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    conn.close()

    result["oracle_rows"] = len(o_rows)
    result["cols_match"] = sorted(s_cols) == sorted(o_cols)
    result["count_match"] = len(s_rows) == len(o_rows)
    values_ok = False
    if result["cols_match"] and result["count_match"]:
        values_ok = _values_match(
            _normalize(s_rows, s_cols), _normalize(o_rows, o_cols)
        )
    result["values_match"] = values_ok
    result["ok"] = result["cols_match"] and result["count_match"] and values_ok
    result["status"] = "ok" if result["ok"] else "MISMATCH"
    return result


def compare_all(spark=None, sf_dir: str = "/root/testdata/sf0.001", names=None):
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dirt_hadoop_similarity_spark.plans.queries import ordered_registry

    registry = ordered_registry()
    own_session = spark is None
    if own_session:
        # VANILLA session on purpose — the driver harness constructs its
        # own plain SparkSession, so any conf a query needs must be set
        # in the query path itself.  Round 1 shipped a 7-query failure
        # because this replica used the tuned get_spark() and masked it.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    results = []
    for name in names or registry:
        try:
            r = compare_query(spark, name, sf_dir)
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            r = {"name": name, "status": "ERROR", "ok": False, "error": str(e)[:500]}
        results.append(r)
        print(
            f"{r['name']:28} {r['status']:10} "
            f"rows={r.get('spark_rows', '?')}/{r.get('oracle_rows', '-')}"
        )
        if not r["ok"]:
            print("   detail:", {k: v for k, v in r.items() if k != "name"})
    n_bad = sum(1 for r in results if not r["ok"])
    print(f"== {len(results) - n_bad}/{len(results)} ok")
    if own_session:
        spark.stop()
    return results


if __name__ == "__main__":
    import sys

    compare_all(
        sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        names=sys.argv[2].split(",") if len(sys.argv) > 2 else None,
    )
