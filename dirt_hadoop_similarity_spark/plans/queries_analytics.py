"""Round-5 extension queries: lexical all-pairs similarity, multi-way
dimensional joins, grouping sets, and event-cadence analytics.

Registered into the shared ``QUERIES`` registry.  Conventions follow
plans/queries.py: identical aliases both engines, exact-integer sums
wherever the data allows, 4 dp rounding for money sums (the q1
precedent), 6 dp for ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.errors import PySparkException

from dirt_hadoop_similarity_spark.operators import textsim
from dirt_hadoop_similarity_spark.plans.queries import load, register
from dirt_hadoop_similarity_spark.plans.queries_more import ts_micros


def epoch_day(us: F.Column) -> F.Column:
    """Integer epoch-day bucket from epoch microseconds — pure integer
    arithmetic, no calendar/DST semantics.  ``us - us % c`` is an exact
    multiple of c, so the division is exact (remainder-subtracted
    division, the zorder_frame pattern).  Truncates toward zero where
    the oracles' ``//`` floors; equivalent here because event
    timestamps are post-1970 (non-negative micros).  The SQL twin
    literal ``// 86400000000`` appears in the rolling_distinct_users
    and timeseries_gapfill oracles — keep the constant in sync."""
    c = F.lit(86_400_000_000)
    return ((us - (us % c)) / c).cast("long")


# ---------------------------------------------------------------------------
# lexical all-pairs similarity (inverted-index TF-IDF cosine)
# ---------------------------------------------------------------------------

# Scored-pairs CTE chain shared by text_cosine_pairs (threshold filter)
# and text_cosine_topk (symmetric-closure per-doc ranking).
_COSINE_SCORED_CTE = """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS term
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i
            FROM base) expanded
    ), tf AS (
      -- mirror shingle_tf's empty-term filter: blank docs yield no terms
      SELECT doc_id, term, count(*) AS tf FROM sh
      WHERE term <> '' GROUP BY 1, 2
    ), nd AS (
      SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tf
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), kept AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * CAST(round(ln(n_docs / df) * 10000) AS BIGINT) AS w
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
      WHERE df >= 2 AND df <= n_docs * 0.10
    ), norms AS (
      SELECT doc_id, sum(w * w) AS nrm FROM kept GROUP BY 1
    ), dots AS (
      SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, sum(a.w * b.w) AS dot
      FROM kept a JOIN kept b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), scored AS (
      SELECT doc_lo, doc_hi,
             round(dot / (sqrt(CAST(n1.nrm AS DOUBLE)) * sqrt(CAST(n2.nrm AS DOUBLE))), 6) AS sim
      FROM dots
      JOIN norms n1 ON dots.doc_lo = n1.doc_id
      JOIN norms n2 ON dots.doc_hi = n2.doc_id
    )
"""

_COSINE_PAIRS_SQL = (
    _COSINE_SCORED_CTE
    + """
    SELECT doc_lo, doc_hi, sim FROM scored WHERE sim >= 0.35
"""
)


@register(
    "text_cosine_pairs",
    _COSINE_PAIRS_SQL,
    "Exact TF-IDF cosine all-pairs over word-trigram shingles via an "
    "inverted-index equi-join with a df-band candidate bound (Bayardo "
    "et al. 2007) — int64-quantized weights make the dot product an "
    "exact integer sum, bit-identical across engines and partitionings.",
)
def text_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tf = textsim.shingle_tf(docs, n=3)
    vecs = textsim.tfidf_vectors(tf, min_df=2, max_df_frac=0.10)
    return textsim.cosine_pairs(vecs, threshold=0.35)


# ---------------------------------------------------------------------------
# multi-way dimensional join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

@register(
    "join_region_revenue",
    """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND o_orderkey = l_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND c_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    "TPC-H Q5 shape: 6-table snowflake join with the local-supplier "
    "constraint (c_nationkey = s_nationkey) — dims broadcast, fact "
    "tables shuffle on their join keys, date filter pushed to the scan.",
)
def join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# grouping sets (beyond cube/rollup: explicit set list + grouping_id)
# ---------------------------------------------------------------------------

@register(
    "grouping_sets_status",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
    "Explicit GROUPING SETS with grouping_id — the general form of "
    "cube/rollup (one shuffle, Expand feeds partial aggregation).",
)
def grouping_sets_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price"
        )
    )


# ---------------------------------------------------------------------------
# event cadence: lag-based inter-arrival statistics
# ---------------------------------------------------------------------------

@register(
    "event_interarrival",
    """
    WITH gaps AS (
      SELECT user_id,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1000000, 6)
             AS mean_gap_secs,
           round(CAST(max(gap_us) AS DOUBLE) / 1000000, 6) AS max_gap_secs
    FROM gaps
    GROUP BY user_id
    HAVING count(gap_us) > 0
    """,
    "Per-user inter-event cadence: lag window (total order ts, "
    "event_id), exact int64 microsecond gaps aggregated per user — the "
    "mean is one deterministic float division over exact sums.",
)
def event_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (ts_micros(F.col("ts")) - ts_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("gap_us").alias("n_gaps"),
            F.round(
                F.sum("gap_us").cast("double") / F.count("gap_us") / 1_000_000,
                6,
            ).alias("mean_gap_secs"),
            F.round(F.max("gap_us").cast("double") / 1_000_000, 6).alias(
                "max_gap_secs"
            ),
        )
        .filter(F.col("n_gaps") > 0)
    )


# ---------------------------------------------------------------------------
# agg-filtered join-back (TPC-H Q18 shape)
# ---------------------------------------------------------------------------

@register(
    "join_top_spenders",
    """
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice, 2) AS total_price,
           big.sum_qty
    FROM (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 300) big
    JOIN orders   ON big.l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
    "TPC-H Q18 shape: aggregate-filtered fact (HAVING sum > k) joined "
    "back to orders and customer — the agg output is tiny, so the "
    "join-back broadcasts; quantities are integral, so sum_qty is an "
    "exact BIGINT.",
)
def join_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # filter on the UN-cast sum first (matches the oracle's HAVING,
    # which sees the raw sum) — casting before the comparison would
    # truncate a non-integral group sum (e.g. 300.5 → 300) and drop a
    # group DuckDB keeps; the integral-quantity contract makes them
    # equal on this data, but the order should not depend on it
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sum_qty_raw"))
        .filter(F.col("_sum_qty_raw") > 300)
        .select(
            "l_orderkey", F.col("_sum_qty_raw").cast("long").alias("sum_qty")
        )
    )
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# ntile quartile banding
# ---------------------------------------------------------------------------

@register(
    "ntile_quartiles",
    """
    SELECT quartile,
           CAST(count(*) AS BIGINT) AS n_customers,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
    FROM (SELECT c_acctbal,
                 CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
                   AS quartile
          FROM customer) t
    GROUP BY quartile
    """,
    "EXACT ntile(4) banding over a total order (acctbal, custkey "
    "tiebreak) computed WITHOUT a global sort: scale.exact_ntile's "
    "two-level bucket-spine rank (bounded spine cumsum + bucket-"
    "partitioned in-bucket windows) replaces the single-reducer "
    "unpartitioned window the naive ntile() plan serializes through — "
    "the oracle still runs the real ntile(), pinning the rewrite's "
    "row-for-row equivalence.  acctbal quantizes to cents exactly "
    "(2-decimal money), so the integer rank key preserves the double "
    "order.",
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dirt_hadoop_similarity_spark.operators.scale import exact_ntile

    c = load(spark, sf_dir, "customer").select(
        "c_acctbal",
        "c_custkey",
        # cents: exact for 2-decimal money doubles, order-preserving
        F.round(F.col("c_acctbal") * 100).cast("long").alias("_cents"),
    )
    return (
        exact_ntile(
            c, 4, value="_cents", tiebreak="c_custkey",
            out="quartile", coarse=10_000,
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


# ---------------------------------------------------------------------------
# correlated-subquery decorrelation (TPC-H Q17 shape)
# ---------------------------------------------------------------------------

@register(
    "subquery_below_avg",
    """
    WITH avgs AS (
      SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small,
           round(sum(l_extendedprice), 4) AS sum_price
    FROM lineitem JOIN avgs USING (l_partkey)
    WHERE l_quantity < 0.5 * avg_qty
    """,
    "TPC-H Q17 shape: the correlated scalar subquery (per-part average "
    "quantity) decorrelated into a grouped aggregate joined back to the "
    "fact — one partkey-keyed shuffle instead of a per-row subquery. "
    "Quantities are integral, so each avg is an exact-integer-sum "
    "division and the < comparison is deterministic in both engines.",
)
def subquery_below_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    avgs = li.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(avgs, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# rolling 7-day distinct users (sliding-window COUNT DISTINCT)
# ---------------------------------------------------------------------------

@register(
    "rolling_distinct_users",
    """
    WITH du AS (
      SELECT DISTINCT
             CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts)
                  // 86400000000 AS BIGINT) AS day,
             user_id
      FROM events
    ), days AS (SELECT DISTINCT day FROM du)
    SELECT d.day, CAST(count(DISTINCT du.user_id) AS BIGINT) AS users_7d
    FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
    "Rolling 7-day distinct users — COUNT DISTINCT over a sliding "
    "window, which no RANGE frame expresses.  Spark shape: each "
    "(day, user) row explodes into the <=7 window-end days it serves, "
    "then a day-keyed distinct count — all equi-shuffles, fan-out "
    "bounded by the window length, never a non-equi join against the "
    "day spine (the oracle's BETWEEN join is the same set "
    "mathematically).  Day = epoch-microseconds div 86400e6: pure "
    "integer arithmetic, no calendar/DST semantics.",
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    du = (
        ev.select(
            epoch_day(ts_micros(F.col("ts"))).alias("day"), "user_id"
        ).distinct()
    )
    days = du.select("day").distinct()
    # no distinct on the exploded contributions: countDistinct below
    # dedups (day, user) itself, and an explicit distinct would add a
    # full extra shuffle of the 7x-fanned relation
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("day"),
        "user_id",
    )
    return (
        contrib.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


# ---------------------------------------------------------------------------
# bivariate statistics: Pearson correlation from exact integer moments
# ---------------------------------------------------------------------------

@register(
    "corr_price_quantity",
    """
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(xq) AS sx, sum(yq) AS sy,
             sum(xq * xq) AS sxx, sum(yq * yq) AS syy,
             sum(xq * yq) AS sxy
      FROM (SELECT l_returnflag,
                   CAST(round(l_extendedprice) AS BIGINT) AS xq,
                   CAST(l_quantity AS BIGINT) AS yq
            FROM lineitem) q
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_items,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS corr_pq,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / (n - 1), 6) AS covar_pq
    FROM m
    """,
    "Pearson correlation + sample covariance per return flag, computed "
    "from EXACT integer moments (dollar-quantized price, integral "
    "quantity) — unlike the built-in corr()/covar_samp(), whose "
    "streaming double accumulation is partition-order-dependent, the "
    "five int64 sums commute exactly and the closed-form combination is "
    "one fixed sequence of correctly-rounded IEEE ops (the anomaly.py "
    "portability pattern).  Moment bound: sxx <= n·(max|x|)^2 must stay "
    "below 2^53 for the final double casts to be exact — holds to "
    "~1e5 rows/group at 1e5-dollar prices; rescale the quantization for "
    "bigger groups.",
)
def corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.round("l_extendedprice", 0).cast("long").alias("xq"),
        F.col("l_quantity").cast("long").alias("yq"),
    )
    m = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).alias("syy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    corr = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - sxd * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - syd * F.col("sy"))
    )
    covar = (F.col("sxy").cast("double") - sxd * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    return m.select(
        "l_returnflag",
        F.col("n").alias("n_items"),
        F.round(corr, 6).alias("corr_pq"),
        F.round(covar, 6).alias("covar_pq"),
    )


# ---------------------------------------------------------------------------
# decimal-exact money aggregation (associativity-free sums via DECIMAL)
# ---------------------------------------------------------------------------

@register(
    "decimal_revenue_exact",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE)
             AS sum_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    - CAST(l_extendedprice * l_discount AS DECIMAL(18, 4)))
                AS DOUBLE) AS sum_discounted
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    "Money sums through the DECIMAL type: each double rounds ONCE to a "
    "fixed scale at the row level, then the fixed-point sum is exact "
    "integer arithmetic — no partition-order sensitivity, unlike "
    "double sums (which the q1 family makes comparable only by "
    "rounding).  The one double op per row (price*discount) is "
    "identical IEEE in both engines; the final cast of the exact "
    "decimal total to double is correctly-rounded and unique.",
)
def decimal_revenue_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_dec = (F.col("l_extendedprice") * F.col("l_discount")).cast(
        "decimal(18,4)"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(price_dec).cast("double").alias("sum_price"),
            F.sum(price_dec.cast("decimal(18,4)") - disc_dec)
            .cast("double")
            .alias("sum_discounted"),
        )
    )


_COSINE_TOPK_SQL = (
    _COSINE_SCORED_CTE
    + """
    , sym AS (
      SELECT doc_lo AS doc_id, doc_hi AS neighbor_id, sim
      FROM scored WHERE sim >= 0.2
      UNION ALL
      SELECT doc_hi AS doc_id, doc_lo AS neighbor_id, sim
      FROM scored WHERE sim >= 0.2
    )
    SELECT doc_id, neighbor_id, sim, rank FROM (
      SELECT doc_id, neighbor_id, sim,
             CAST(row_number() OVER (PARTITION BY doc_id
                                     ORDER BY sim DESC, neighbor_id)
                  AS BIGINT) AS rank
      FROM sym) ranked
    WHERE rank <= 3
"""
)


@register(
    "text_cosine_topk",
    _COSINE_TOPK_SQL,
    "Per-document lexical kNN ('related documents'): symmetric closure "
    "of the inverted-index cosine pairs, ranked per doc by (sim desc, "
    "neighbor id) — rank filter compiles to WindowGroupLimit, so each "
    "task keeps k rows per doc before the shuffle.",
)
def text_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tf = textsim.shingle_tf(docs, n=3)
    vecs = textsim.tfidf_vectors(tf, min_df=2, max_df_frac=0.10)
    return textsim.cosine_topk_neighbors(vecs, k=3, threshold=0.2)


# ---------------------------------------------------------------------------
# SQL front-end: one dialect-common query text run by BOTH engines
# ---------------------------------------------------------------------------

_MONTHLY_TOP_SQL = """
    WITH rev AS (
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mth,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, year(o_orderdate), month(o_orderdate)
    )
    SELECT yr, mth, o_orderkey, revenue, rnk FROM (
      SELECT yr, mth, o_orderkey, revenue,
             CAST(row_number() OVER (PARTITION BY yr, mth
                                     ORDER BY revenue DESC, o_orderkey)
                  AS BIGINT) AS rnk
      FROM rev) ranked
    WHERE rnk <= 2
"""


@register(
    "sql_monthly_top_orders",
    _MONTHLY_TOP_SQL,
    "SQL front-end path: the SAME dialect-common query text (CTE + join "
    "+ agg + ranked window) executes via spark.sql over temp views AND "
    "as the DuckDB oracle — pins that the engine's SQL surface, not "
    "just the DataFrame API, matches.  Ranking is on the ROUNDED "
    "revenue with an orderkey tiebreak, so ranks are total-order "
    "deterministic.  Timestamps are NTZ: year()/month() are calendar "
    "functions on the naive value, timezone-free in both engines.",
)
def sql_monthly_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_frontend(
        spark, sf_dir, ("lineitem", "orders"), _MONTHLY_TOP_SQL
    )


def _sql_frontend(spark: SparkSession, sf_dir: str,
                  tables: tuple[str, ...], sql: str) -> DataFrame:
    """Run a dialect-common SQL text through the engine's SQL surface.

    Isolated child session: same SparkContext, shared cache, SEPARATE
    temp-view namespace — so registering table views here can never
    replace (or, on cleanup, delete) a view of the same name a
    long-lived caller session had registered.  The child session needs
    no teardown: its views die with it, and the returned DataFrame
    keeps it alive exactly as long as the result is in use.
    """
    s = spark.newSession()
    # newSession() starts from builder-time defaults, NOT the caller's
    # runtime confs — replay the caller's explicitly-set SQL confs (the
    # `SET` command lists exactly those) so ANSI/timezone/tuning sweeps
    # exercised on the caller session cover these queries too.  Static
    # or unsettable entries are skipped.
    for row in spark.sql("SET").collect():
        # `SET` redacts sensitive values (*password*, *token*, …) to a
        # literal placeholder — setting THAT string into the child would
        # corrupt the conf, so skip redacted entries (ADVICE r7)
        if "(redacted)" in str(row["value"]):
            continue
        try:
            if s.conf.get(row["key"], None) != row["value"]:
                s.conf.set(row["key"], row["value"])
        except PySparkException:
            # static/unsettable/validation-rejecting conf (e.g.
            # warehouse.dir raises AnalysisException, a value-validated
            # conf raises IllegalArgumentException) — the replay is
            # best-effort, so skip the entry and keep the default
            # (ADVICE r8: narrowing to AnalysisException alone aborted
            # the whole query on any other conf error type)
            pass
    for t in tables:
        load(s, sf_dir, t).createOrReplaceTempView(t)
    return s.sql(sql)


# SQL front-end parity as a CLASS, not a sample (VERDICT r6 task 7):
# three more dialect-common texts over shapes already verified through
# the DataFrame API — a correlated scalar subquery (the Q17
# decorrelation subquery_below_avg expresses by hand), a running-total
# window, and GROUPING SETS with GROUPING_ID.  Each text executes
# verbatim in BOTH engines.

_SQL_BELOW_AVG = """
    SELECT CAST(count(*) AS BIGINT) AS n_small,
           round(sum(l1.l_extendedprice), 4) AS sum_price
    FROM lineitem l1
    WHERE l1.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                           FROM lineitem l2
                           WHERE l2.l_partkey = l1.l_partkey)
"""


@register(
    "sql_below_avg",
    _SQL_BELOW_AVG,
    "SQL front-end: a genuinely CORRELATED scalar subquery (TPC-H Q17 "
    "shape) — Catalyst must decorrelate it into the grouped-aggregate "
    "join that subquery_below_avg hand-writes; the same text runs in "
    "DuckDB.  Quantities are integral, so the per-part average is an "
    "exact double and the < comparison is deterministic in both "
    "engines.",
)
def sql_below_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_frontend(spark, sf_dir, ("lineitem",), _SQL_BELOW_AVG)


_SQL_RUNNING_TOTAL = """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderkey) AS BIGINT) AS rn,
           CAST(sum(cents) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderkey) AS BIGINT)
             AS running_cents
    FROM (SELECT o_custkey, o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders) orev
"""


@register(
    "sql_running_total",
    _SQL_RUNNING_TOTAL,
    "SQL front-end: per-customer running revenue as one window text in "
    "both engines.  Prices quantize to integer cents BEFORE the window "
    "sum, so the cumulation is exact int64 no matter how each engine "
    "orders or trees its frame arithmetic (DuckDB segment-trees window "
    "aggregates — float running sums would diverge); o_orderkey is "
    "unique per customer, making the default RANGE frame equal ROWS "
    "and every rank deterministic.",
)
def sql_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_frontend(spark, sf_dir, ("orders",), _SQL_RUNNING_TOTAL)


_SQL_GROUPING_SETS = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT)
             AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
"""


@register(
    "sql_grouping_sets",
    _SQL_GROUPING_SETS,
    "SQL front-end: explicit GROUPING SETS + GROUPING_ID as one text in "
    "both engines — the SQL twin of grouping_sets_status (DataFrame "
    "groupingSets API), pinning that the Expand-based rollup plan is "
    "reachable through the SQL surface too.",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_frontend(spark, sf_dir, ("orders",), _SQL_GROUPING_SETS)


# ---------------------------------------------------------------------------
# time-series gap filling (generated day spine × observed dimensions)
# ---------------------------------------------------------------------------

@register(
    "timeseries_gapfill",
    """
    WITH daily AS (
      SELECT CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts)
                  // 86400000000 AS BIGINT) AS day,
             event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM daily
    ), spine AS (
      SELECT unnest(generate_series(lo, hi)) AS day FROM bounds
    ), types AS (SELECT DISTINCT event_type FROM daily)
    SELECT spine.day, types.event_type,
           CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events
    FROM spine CROSS JOIN types
    LEFT JOIN daily ON daily.day = spine.day
                   AND daily.event_type = types.event_type
    """,
    "Time-series gap filling: the day spine is GENERATED from the 1-row "
    "min/max bounds (sequence+explode — no calendar table dependency), "
    "crossed with the observed dimension values, and left-joined to the "
    "daily aggregate with zero-fill.  The only unbounded relation is "
    "the daily aggregate; spine × types is |days|·|dims| rows, and the "
    "deliberate cross join is between those two TINY generated sides — "
    "the fact table never meets a non-equi join.  Integer epoch-day "
    "arithmetic, no DST semantics.",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            epoch_day(ts_micros(F.col("ts"))).alias("day"), "event_type"
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()  # feeds bounds, types, and the left join
    )
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    types = daily.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# snapshot upsert (lakehouse MERGE shape: updates win, base carries)
# ---------------------------------------------------------------------------

@register(
    "snapshot_upsert",
    """
    WITH old AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0
    ), neu AS (
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 11 <> 0
    )
    SELECT coalesce(neu.doc_id, old.doc_id) AS doc_id,
           md5(coalesce(neu.text, old.text)) AS text_md5,
           neu.doc_id IS NOT NULL AS from_update
    FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
    """,
    "Lakehouse MERGE/upsert: the update batch wins per key, the base "
    "carries everything else — one key-equi full-outer join + coalesce "
    "(same simulated snapshots as corpus_diff, which CLASSIFIES the "
    "delta; this one MATERIALIZES the merged corpus).  Unlike the "
    "diff, the merge is a write path, so payloads legitimately ride "
    "the key shuffle; the md5 output keeps the oracle compare "
    "digest-sized.",
)
def snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    old = docs.filter(did % 13 != 0).select(
        "doc_id", F.col("text").alias("t_old")
    )
    new = (
        docs.filter(did % 11 != 0)
        .select(
            "doc_id",
            F.when(did % 17 == 0, F.concat("text", F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("t_new"),
            # row-presence marker: from_update must mean "this key was in
            # the update batch", not "its payload is non-null" — a NULL
            # text in the batch is still an update (matches the oracle's
            # neu.doc_id IS NOT NULL)
            F.lit(True).alias("in_update"),
        )
    )
    return (
        old.join(new, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.md5(F.coalesce("t_new", "t_old")).alias("text_md5"),
            F.coalesce("in_update", F.lit(False)).alias("from_update"),
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming with a driver-checkable face: the queries below
# run a REAL streaming query (writeStream → memory sink, watermarked
# state) to completion and return the materialized sink — so the
# correctness gate exercises the streaming code path itself, not just
# its batch twin.
# ---------------------------------------------------------------------------

def _stream_state_partitions(spark: SparkSession, sf_dir: str,
                             source: str = "events.parquet") -> int | None:
    """Scale-adaptive shuffle-partition count for a streaming start.

    A stateful streaming operator opens one state store PER shuffle
    partition, fixed at the query's first start; every micro-batch then
    pays a commit (delta file + fsync) and maintenance pass per store —
    a stream-stream join holds FOUR stores per partition.  For batch
    plans the session conf is safe at any scale because AQE coalesces
    small shuffles at runtime; AQE is disabled in stateful workloads,
    so the conf must be right at start.  Derive it from the source's
    actual size — one partition per ~32 MiB of source bytes, clamped to
    [1, session conf] — the same input-size heuristic AQE applies to
    batch exchanges.  At production volume the estimate saturates at
    the session conf (the cluster-sized value), so this removes idle
    state-store fixed cost on small streams without capping large ones.
    Returns None (leave the conf alone) when the source size cannot be
    read locally (non-local sf_dir)."""
    import os

    path = os.path.join(sf_dir, source)
    try:
        if os.path.isdir(path):
            total = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(path)
                for f in files
            )
        else:
            total = os.path.getsize(path)
    except OSError:
        return None
    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(conf, (total + (32 << 20) - 1) // (32 << 20)))


def _run_stream_to_memory(df: DataFrame, name: str, mode: str,
                          partitions: int | None = None) -> None:
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if partitions is not None:
        # scoped to the stream start (the value is pinned into the
        # query's state layout at start); restored before the batch
        # relation over the sink is built, so registered plans and any
        # concurrent batch work see the session conf unchanged
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@register(
    "stream_dedup_events",
    """
    SELECT CAST(event_id AS BIGINT) AS event_id, user_id, event_type,
           value, props,
           CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', ts)
                AS BIGINT) AS ts_us
    FROM events
    """,
    "Streaming exactly-once dedup, driver-checked END TO END: the events "
    "file is replayed as TWO unioned file-source streams (every event "
    "delivered twice — the at-least-once condition), pushed through "
    "dropDuplicatesWithinWatermark into a memory sink, and the "
    "materialized sink must equal the original events relation row for "
    "row (the batch-dedup oracle).  The watermark horizon is set past "
    "the corpus's time span so no key is evicted mid-replay; production "
    "tunes it to the source's real re-delivery window (state is bounded "
    "by watermark × arrival rate).",
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dirt_hadoop_similarity_spark.streaming import events as sev

    doubled = sev.stream_events(spark, sf_dir).unionByName(
        sev.stream_events(spark, sf_dir)
    )
    deduped = sev.dedup_events(
        doubled, key_cols=("event_id",), watermark="3650 days"
    )
    name = "stream_dedup_events_sink"
    _run_stream_to_memory(deduped, name, "append",
                          partitions=_stream_state_partitions(spark, sf_dir))
    return spark.table(name).select(
        "event_id", "user_id", "event_type", "value", "props",
        ts_micros(F.col("ts")).alias("ts_us"),
    )


@register(
    "stream_windowed_counts",
    """
    SELECT CAST(date_diff('microsecond', TIMESTAMP '1970-01-01',
                          date_trunc('hour', ts)) AS BIGINT)
             AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    "Streaming tumbling-window aggregation, driver-checked END TO END: "
    "the events file streams through the watermarked window aggregate "
    "(streaming/events.windowed_counts — real state store, real "
    "event-time windows) into a complete-mode memory sink; the "
    "materialized windows must equal the batch hourly aggregate.  "
    "Hour windows align to the epoch, so date_trunc on the naive "
    "timestamp is the exact oracle under the fixed-offset session zone "
    "ts_micros already enforces.",
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dirt_hadoop_similarity_spark.streaming import events as sev

    agg = sev.windowed_counts(sev.stream_events(spark, sf_dir))
    name = "stream_windowed_counts_sink"
    _run_stream_to_memory(agg, name, "complete",
                          partitions=_stream_state_partitions(spark, sf_dir))
    return spark.table(name).select(
        ts_micros(F.col("window_start")).alias("window_start_us"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("total_value", 4).alias("total_value"),
    )


def _sessionize_oracle() -> str:
    # the batch sessionize window query IS the semantic spec for the
    # stateful operator — share its oracle text verbatim
    from dirt_hadoop_similarity_spark.plans.queries import QUERIES

    return QUERIES["sessionize"].oracle


@register(
    "stream_sessionize",
    _sessionize_oracle(),
    "CUSTOM STATEFUL streaming operator, driver-checked END TO END: "
    "per-user session counting via applyInPandasWithState (30-minute "
    "gap rule) over the replayed events stream, update-mode memory "
    "sink; the per-user MAX over emitted updates is the final state "
    "(both counters are monotone), and it must equal the batch window "
    "sessionize — the one registry entry exercising the arbitrary-"
    "stateful API, not a built-in streaming aggregate.  Replay caveat: "
    "state updates sort events per user within a batch, so cross-batch "
    "disorder would need watermark-delayed finalization in production; "
    "the file replay delivers whole files per batch, keeping each "
    "user's stream in order.",
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dirt_hadoop_similarity_spark.streaming import events as sev

    out = sev.sessionize_stateful(sev.stream_events(spark, sf_dir))
    name = "stream_sessionize_sink"
    _run_stream_to_memory(out, name, "update",
                          partitions=_stream_state_partitions(spark, sf_dir))
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").cast("long").alias("n_sessions"),
            F.max("n_events").cast("long").alias("n_events"),
        )
    )


@register(
    "stream_interval_join",
    """
    SELECT e.user_id,
           CAST(e.event_id AS BIGINT) AS error_id,
           CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', e.ts)
                AS BIGINT) AS error_ts_us,
           CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', p.ts)
                AS BIGINT) AS purchase_ts_us
    FROM events e JOIN events p
      ON p.user_id = e.user_id
     AND e.event_type = 'error' AND p.event_type = 'purchase'
     AND p.ts < e.ts
     AND p.ts >= e.ts - INTERVAL 30 MINUTE
    """,
    "STREAM-STREAM interval join, driver-checked END TO END: the events "
    "file streams through streaming/events.purchases_before_errors — a "
    "real watermarked two-stream join (both sides carry 1-hour "
    "watermarks bounding the join state; inner-join matches emit "
    "without waiting for the watermark, which only evicts state) — "
    "into an append-mode memory sink, and the materialized matches "
    "must equal the batch range join row for row (the "
    "range_join_events oracle shape, row-level instead of counted).  "
    "The last of the four streaming operators to earn a driver row; "
    "its batch twin is queries_more.range_join_events.",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dirt_hadoop_similarity_spark.streaming import events as sev

    joined = sev.purchases_before_errors(
        sev.stream_events(spark, sf_dir), window_seconds=1800
    )
    name = "stream_interval_join_sink"
    _run_stream_to_memory(joined, name, "append",
                          partitions=_stream_state_partitions(spark, sf_dir))
    return spark.table(name).select(
        "user_id",
        F.col("error_id").cast("long").alias("error_id"),
        ts_micros(F.col("error_ts")).alias("error_ts_us"),
        ts_micros(F.col("purchase_ts")).alias("purchase_ts_us"),
    )
