"""Additional operator coverage, batch 3: temporal weighting, data-
quality audits, SQL subquery surface, exact money allocation, robust
statistics, and customer segmentation.

Every query keeps the cross-engine determinism rules from
``registry.py``: money and measures are carried as exact BIGINT
(cents / milli-units), group sums happen on integers, and any division
happens exactly once at the end on the already-exact operands.

Reference parity: the reference repo has none of these (its pipeline
stops at feature engineering + regression); these are north-star
operators a production lake needs around that pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realestate_engine.ordered import distributed_prefix_sum
from realestate_engine.registry import register, t


@register(
    "x14_time_weighted_avg",
    """
    WITH iv AS (
        SELECT user_id,
               CAST(FLOOR(value * 1000) AS BIGINT) AS value_milli,
               (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                - epoch_us(ts)) // 1000000 AS dur_s
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_s,
           CAST(SUM(value_milli * dur_s) AS DOUBLE)
             / CAST(NULLIF(SUM(dur_s), 0) AS DOUBLE) / 1000.0 AS twa_value
    FROM iv
    WHERE dur_s IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def x14_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14: time-weighted average (interval-weighted aggregation) — the
    sensor/billing semantics where a reading holds until the next one,
    so a value held for an hour counts 3600x a value held a second.
    Plain AVG over irregular samples is biased; TWA weights each value
    by its holding duration.

    Determinism: value -> exact milli-units, duration -> whole seconds
    (integer division of epoch micros), so the weighted numerator and
    denominator are exact BIGINT group sums (order-independent); ONE
    double division at the end. The lead window is user-partitioned —
    scales out on the user key with no global ordering."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        F.floor(F.col("value") * 1000).alias("value_milli"),
        (
            (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts"))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("dur_s"),
    ).where(F.col("dur_s").isNotNull())
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dur_s").cast("bigint").alias("total_s"),
            (
                F.sum(F.col("value_milli") * F.col("dur_s")).cast("double")
                / F.nullif(F.sum("dur_s"), F.lit(0)).cast("double")
                / F.lit(1000.0)
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


@register(
    "dq6_functional_dependency",
    """
    WITH pk AS (
        SELECT l_partkey AS k, COUNT(DISTINCT l_suppkey) AS nd, COUNT(*) AS n
        FROM lineitem GROUP BY l_partkey
    ),
    ok AS (
        SELECT l_orderkey AS k, COUNT(DISTINCT l_returnflag) AS nd, COUNT(*) AS n
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT fd, n_keys, n_violating_keys, max_distinct, n_violating_rows
    FROM (
        SELECT 'l_partkey->l_suppkey' AS fd,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
               CAST(MAX(nd) AS BIGINT) AS max_distinct,
               CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT) AS n_violating_rows
        FROM pk
        UNION ALL
        SELECT 'l_orderkey->l_returnflag' AS fd,
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(MAX(nd) AS BIGINT),
               CAST(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END) AS BIGINT)
        FROM ok
    )
    ORDER BY fd
    """,
)
def dq6_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ6: functional-dependency audit — does A determine B in the
    data? Profilers (Metanome-style) phrase candidate FDs as 'every A
    value maps to exactly one B value'; the violation count is the
    repair workload. One groupBy per candidate (distributed, two-level
    agg), then a tiny union of per-FD summary rows."""
    li = t(spark, sf_dir, "lineitem")

    def audit(key: str, dep: str, fd_name: str) -> DataFrame:
        per_key = li.groupBy(F.col(key).alias("k")).agg(
            F.countDistinct(dep).alias("nd"), F.count(F.lit(1)).alias("n")
        )
        return per_key.agg(
            F.lit(fd_name).alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_keys"),
            F.max("nd").cast("bigint").alias("max_distinct"),
            F.sum(F.when(F.col("nd") > 1, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_violating_rows"),
        )

    return (
        audit("l_partkey", "l_suppkey", "l_partkey->l_suppkey")
        .unionAll(audit("l_orderkey", "l_returnflag", "l_orderkey->l_returnflag"))
        .orderBy("fd")
    )


_SQL_EXISTS = """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_loyal_small
    FROM {customer} c
    WHERE EXISTS (SELECT 1 FROM {orders} o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM {orders} o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_totalprice > 450000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@register(
    "sql_exists_subquery",
    _SQL_EXISTS.format(customer="customer", orders="orders"),
)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL6: correlated EXISTS / NOT EXISTS subqueries — the same SQL
    text runs on both engines. Catalyst rewrites EXISTS to a left-semi
    join and NOT EXISTS to a left-anti join (RewritePredicateSubquery),
    so the physical plan is two hash joins on o_custkey — fully
    distributed, no per-row subquery execution."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("_sql_ex_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("_sql_ex_orders")
    return spark.sql(
        _SQL_EXISTS.format(customer="_sql_ex_customer", orders="_sql_ex_orders")
    )


@register(
    "x15_largest_remainder_allocation",
    """
    WITH base AS (
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(l.l_quantity AS BIGINT) AS q
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sh AS (
        SELECT *,
               SUM(q) OVER (PARTITION BY l_orderkey) AS big_q,
               (total_cents * q) // SUM(q) OVER (PARTITION BY l_orderkey) AS floor_cents,
               (total_cents * q) % SUM(q) OVER (PARTITION BY l_orderkey) AS rem
        FROM base
    ),
    rk AS (
        SELECT *,
               total_cents - SUM(floor_cents) OVER (PARTITION BY l_orderkey) AS leftover,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY rem DESC, l_linenumber) AS rn
        FROM sh
    )
    SELECT l_orderkey, l_linenumber,
           CAST(floor_cents + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_cents
    FROM rk
    ORDER BY l_orderkey, l_linenumber
    """,
)
def x15_largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15: exact proportional allocation (largest-remainder method) —
    split each order's total across its line items proportional to
    quantity so the parts sum back to the whole EXACTLY. Naive
    ROUND(total * q/Q) drifts by cents; largest-remainder gives each
    row FLOOR(total*q/Q) and hands the leftover cents to the rows with
    the biggest remainders (l_linenumber tiebreak → deterministic).
    The billing/revenue-recognition primitive.

    All windows share one l_orderkey partitioning → a single shuffle;
    integer arithmetic throughout (max product ~5e7*50 << 2^63)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("o_totalprice") * 100).alias("total_cents"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    wp = Window.partitionBy("l_orderkey")
    sh = base.select(
        "l_orderkey",
        "l_linenumber",
        "total_cents",
        F.expr("total_cents * q div sum(q) over (partition by l_orderkey)").alias(
            "floor_cents"
        ),
        (F.col("total_cents") * F.col("q") % F.sum("q").over(wp)).alias("rem"),
    )
    rk = sh.select(
        "l_orderkey",
        "l_linenumber",
        "floor_cents",
        (F.col("total_cents") - F.sum("floor_cents").over(wp)).alias("leftover"),
        F.row_number()
        .over(Window.partitionBy("l_orderkey").orderBy(F.desc("rem"), "l_linenumber"))
        .alias("rn"),
    )
    return rk.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("floor_cents")
            + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_cents"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "a27_grouped_mode",
    """
    WITH cnt AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS c
        FROM lineitem GROUP BY l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT)
    )
    SELECT l_returnflag, l_linestatus,
           CAST(ARG_MAX(qty, c * 1000 - qty) AS BIGINT) AS mode_qty,
           CAST(MAX(c) AS BIGINT) AS mode_count
    FROM cnt
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def a27_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27: deterministic grouped mode — the most frequent value per
    group with an explicit smallest-value tiebreak. Built-in mode()
    breaks ties arbitrarily (engine- and partition-order-dependent →
    not reproducible); packing (count, -value) into one BIGINT priority
    and taking arg_max makes the answer a pure function of the data.
    Two-level aggregation: count per (group, value) shuffles on the
    composite key (no skew), then a tiny per-group reduction."""
    li = t(spark, sf_dir, "lineitem")
    cnt = li.groupBy(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("qty"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.max_by("qty", F.col("c") * 1000 - F.col("qty"))
            .cast("bigint")
            .alias("mode_qty"),
            F.max("c").cast("bigint").alias("mode_count"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "ev7_rfm_segmentation",
    """
    WITH cust AS (
        SELECT o_custkey,
               DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE),
                         (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS rec_days,
               CAST(COUNT(*) AS BIGINT) AS freq,
               SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS mon_cents
        FROM orders GROUP BY o_custkey
    ),
    cuts AS (
        SELECT quantile_cont(rec_days, [0.2, 0.4, 0.6, 0.8]) AS rc,
               quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fc,
               quantile_cont(mon_cents, [0.2, 0.4, 0.6, 0.8]) AS mc
        FROM cust
    )
    SELECT r_score, f_score, m_score, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
        SELECT 1 + CAST(rec_days > rc[1] AS INT) + CAST(rec_days > rc[2] AS INT)
                 + CAST(rec_days > rc[3] AS INT) + CAST(rec_days > rc[4] AS INT) AS r_score,
               1 + CAST(freq > fc[1] AS INT) + CAST(freq > fc[2] AS INT)
                 + CAST(freq > fc[3] AS INT) + CAST(freq > fc[4] AS INT) AS f_score,
               1 + CAST(mon_cents > mc[1] AS INT) + CAST(mon_cents > mc[2] AS INT)
                 + CAST(mon_cents > mc[3] AS INT) + CAST(mon_cents > mc[4] AS INT) AS m_score
        FROM cust, cuts
    )
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def ev7_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV7: RFM customer segmentation — quintile scores on Recency
    (days since last order, higher = staler), Frequency (order count)
    and Monetary (lifetime cents), then segment population counts.

    Scale shape: one groupBy(custkey) pass builds the RFM triple; the
    four quintile cuts per dimension are ONE exact-percentile aggregate
    producing a single 12-number row that broadcasts back (a23's
    percentile-cuts-broadcast pattern — no global NTILE sort, no
    1-partition window). Threshold scoring (not ranking) means ties
    are handled identically in both engines; percentile interpolation
    on exact integers is bit-identical cross-engine."""
    o = t(spark, sf_dir, "orders")
    max_date = o.agg(F.max(F.to_date("o_orderdate")).alias("gmax"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_date"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum(F.floor(F.col("o_totalprice") * 100)).alias("mon_cents"),
        )
        .crossJoin(F.broadcast(max_date))
        .select(
            F.datediff("gmax", "last_date").cast("bigint").alias("rec_days"),
            "freq",
            "mon_cents",
        )
    )
    cuts = cust.agg(
        F.expr("percentile(rec_days, array(0.2, 0.4, 0.6, 0.8))").alias("rc"),
        F.expr("percentile(freq, array(0.2, 0.4, 0.6, 0.8))").alias("fc"),
        F.expr("percentile(mon_cents, array(0.2, 0.4, 0.6, 0.8))").alias("mc"),
    )

    def score(col: str, cuts_col: str) -> F.Column:
        e = F.lit(1)
        for i in range(4):
            e = e + (F.col(col) > F.col(cuts_col)[i]).cast("int")
        return e

    scored = cust.crossJoin(F.broadcast(cuts)).select(
        score("rec_days", "rc").alias("r_score"),
        score("freq", "fc").alias("f_score"),
        score("mon_cents", "mc").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "a28_chi2_independence",
    """
    WITH joint AS (
        SELECT c_mktsegment AS seg, o_orderpriority AS prio,
               CAST(COUNT(*) AS BIGINT) AS obs
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    rt AS (SELECT seg, SUM(obs) AS r FROM joint GROUP BY seg),
    ct AS (SELECT prio, SUM(obs) AS c FROM joint GROUP BY prio),
    nn AS (SELECT SUM(obs) AS n FROM joint)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((SELECT COUNT(*) FROM rt) - 1 AS BIGINT)
             * CAST((SELECT COUNT(*) FROM ct) - 1 AS BIGINT) AS dof,
           CAST(ANY_VALUE(nn.n) AS BIGINT) AS n_obs,
           ROUND(SUM(
               CAST((joint.obs * nn.n - rt.r * ct.c) AS DOUBLE)
                 * (joint.obs * nn.n - rt.r * ct.c)
                 / (CAST(rt.r AS DOUBLE) * ct.c * nn.n)
           ), 6) AS chi2
    FROM joint
    JOIN rt USING (seg)
    JOIN ct USING (prio)
    CROSS JOIN nn
    """,
)
def a28_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A28: chi-square test of independence between customer market
    segment and order priority — the categorical-association screen of
    a feature-selection pass, computed DISTRIBUTED as three aggregates
    over the joint contingency (never a driver-side crosstab: the
    reference's pandas-first stats would collect the join).

    Plan: one shuffle builds the joint (seg, prio) counts; the row/
    column margins reduce FROM THE JOINT (25 rows), not the base data,
    so the margin joins are trivially broadcast. The statistic uses the
    cross-multiplied form (obs*N - r*c)^2 / (r*c*N): every product is
    an exact BIGINT (max ~1e18 here), with ONE double division per cell
    and a 25-term sum rounded to 6 decimals — stable across engines.
    At 100 TB only the first aggregate sees data volume; the rest is
    margin-sized. MLlib's ChiSquareTest gives the same statistic with a
    p-value; this form is the oracle-checkable core."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    joint = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("prio"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    )
    rt = joint.groupBy("seg").agg(F.sum("obs").alias("r"))
    ct = joint.groupBy("prio").agg(F.sum("obs").alias("c"))
    nn = joint.agg(F.sum("obs").alias("n"))
    n_r = rt.agg(F.count(F.lit(1)).alias("nr"))
    n_c = ct.agg(F.count(F.lit(1)).alias("nc"))
    cell = (
        joint.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "prio")
        .crossJoin(F.broadcast(nn))
        .select(
            "obs",
            "n",
            ((F.col("obs") * F.col("n") - F.col("r") * F.col("c")).cast("double")
             * (F.col("obs") * F.col("n") - F.col("r") * F.col("c"))
             / (F.col("r").cast("double") * F.col("c") * F.col("n"))).alias("term"),
        )
    )
    return (
        cell.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.any_value(F.col("n")).cast("bigint").alias("n_obs"),
            F.round(F.sum("term"), 6).alias("chi2"),
        )
        .crossJoin(F.broadcast(n_r))
        .crossJoin(F.broadcast(n_c))
        .select(
            "n_cells",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
            "n_obs",
            "chi2",
        )
    )


@register(
    "a29_sliding_distinct_users",
    """
    WITH du AS (
        SELECT DISTINCT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day AS day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    ORDER BY d.day
    """,
)
def a29_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A29: trailing-7-day distinct users per day (rolling WAU) — the
    windowed-cardinality metric. COUNT(DISTINCT) OVER a sliding frame
    does not exist as a Spark window function, and the naive per-day
    self-join re-scans the activity relation once per day. Scale shape
    instead: dedup to (day, user) grain (one shuffle, the big one),
    EXPLODE each activity day into the <=7 window-end days it covers
    (sequence+explode, data-local multiply by window length), then one
    distinct+count agg keyed by (window_day, user). Cost is
    O(activity x window_days) rows shuffled once — independent of the
    calendar span, no per-day rescans; the same shape extends to any
    window length or to HLL sketches (a18) when exact distinct is too
    wide. Window-end days with no activity in range simply don't
    appear (matches the oracle's days-from-activity domain); the final
    filter drops partial windows only if the caller wants full weeks —
    here all trailing windows count (standard WAU)."""
    ev = t(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    covered = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
        "user_id",
    )
    return (
        covered.join(days.select(F.col("day").alias("wday")), "wday", "left_semi")
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
        # timestamp, not date: Spark DateType reaches pandas as object
        # (datetime.date) while DuckDB DATE fetches as datetime64 — the
        # driver's type-strict hash needs both in the datetime family
        # (same idiom as driver-green f10_monthly_revenue)
        .select(F.col("wday").cast("timestamp").alias("day"), "wau")
        .orderBy("day")
    )


@register(
    "a30_welch_ttest",
    """
    WITH g AS (
        SELECT l_returnflag AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
        GROUP BY l_returnflag
    ),
    m AS (
        SELECT
            MAX(CASE WHEN grp = 'R' THEN n END) AS n1,
            MAX(CASE WHEN grp = 'R' THEN s1 END) AS s1_1,
            MAX(CASE WHEN grp = 'R' THEN s2 END) AS s2_1,
            MAX(CASE WHEN grp = 'N' THEN n END) AS n2,
            MAX(CASE WHEN grp = 'N' THEN s1 END) AS s1_2,
            MAX(CASE WHEN grp = 'N' THEN s2 END) AS s2_2
        FROM g
    )
    SELECT n1, n2,
           ROUND(CAST(s1_1 AS DOUBLE) / n1, 6) AS mean_r,
           ROUND(CAST(s1_2 AS DOUBLE) / n2, 6) AS mean_n,
           ROUND((CAST(s1_1 AS DOUBLE) / n1 - CAST(s1_2 AS DOUBLE) / n2)
                 / SQRT((CAST(n1 * s2_1 - s1_1 * s1_1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)))
                      + (CAST(n2 * s2_2 - s1_2 * s1_2 AS DOUBLE) / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)))), 6)
               AS t_stat
    FROM m
    """,
)
def a30_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A30: Welch's unequal-variance two-sample t statistic — mean
    l_quantity of returned (R) vs non-returned (N) lineitems: the A/B
    comparison primitive, computed from distributable MOMENTS (n, Σx,
    Σx²) rather than a variance pass: one partial-aggregated groupBy,
    then scalar math on a 2-row frame. Variance uses the exact-integer
    cross form (n·Σx² - (Σx)²) — quantity ≤ 50 keeps every product well
    inside BIGINT — with double division LAST, so Spark and DuckDB agree
    to the rounded 6 decimals. At 100 TB only the moments aggregate
    touches data; adding Welch's dof or more groups is free scalar math
    on the moment frame (the same moments feed a15's regression
    aggregates)."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag").isin("R", "N"))
    q = F.col("l_quantity").cast("bigint")
    g = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q).cast("bigint").alias("s1"),
        F.sum(q * q).cast("bigint").alias("s2"),
    )
    m = g.agg(
        F.max(F.when(F.col("grp") == "R", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == "R", F.col("s1"))).alias("s1_1"),
        F.max(F.when(F.col("grp") == "R", F.col("s2"))).alias("s2_1"),
        F.max(F.when(F.col("grp") == "N", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == "N", F.col("s1"))).alias("s1_2"),
        F.max(F.when(F.col("grp") == "N", F.col("s2"))).alias("s2_2"),
    )
    var1 = (F.col("n1") * F.col("s2_1") - F.col("s1_1") * F.col("s1_1")).cast("double") / (
        F.col("n1").cast("double") * F.col("n1") * (F.col("n1") - 1)
    )
    var2 = (F.col("n2") * F.col("s2_2") - F.col("s1_2") * F.col("s1_2")).cast("double") / (
        F.col("n2").cast("double") * F.col("n2") * (F.col("n2") - 1)
    )
    mean1 = F.col("s1_1").cast("double") / F.col("n1")
    mean2 = F.col("s1_2").cast("double") / F.col("n2")
    return m.select(
        "n1",
        "n2",
        F.round(mean1, 6).alias("mean_r"),
        F.round(mean2, 6).alias("mean_n"),
        F.round((mean1 - mean2) / F.sqrt(var1 + var2), 6).alias("t_stat"),
    )


@register(
    "ev10_funnel_latency",
    """
    WITH fc AS (
        SELECT user_id, MIN(ts) AS first_click
        FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    fp AS (
        SELECT e.user_id,
               (epoch_us(MIN(e.ts)) - epoch_us(ANY_VALUE(fc.first_click))) // 1000000
                   AS latency_s
        FROM events e JOIN fc ON e.user_id = fc.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
        GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(quantile_disc(latency_s, 0.5) AS BIGINT) AS p50_s,
           CAST(quantile_disc(latency_s, 0.9) AS BIGINT) AS p90_s,
           CAST(MAX(latency_s) AS BIGINT) AS max_s
    FROM fp
    """,
)
def ev10_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV10: conversion-latency distribution — per user, whole seconds
    from FIRST click to the first purchase at-or-after it, summarized
    as exact discrete percentiles: the time-to-convert metric product
    funnels report next to ev_funnel_conversion's rates. Two
    first-event aggregates share the user_id shuffle key; latencies are
    exact integer seconds (truncating division of epoch micros);
    percentiles use the GK-with-accuracy>n trick (see
    a6_approx_quantile) so the discrete element matches DuckDB's
    quantile_disc bit-for-bit. Latency lives on a per-user frame
    (bounded by |users|, not events) — at 100 TB the percentile sketch
    is the only structure that sees the full latency vector, at
    O(accuracy log n) memory."""
    ev = t(spark, sf_dir, "events")
    fc = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .where(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(
            (
                (F.unix_micros(F.min("ts")) - F.unix_micros(F.any_value(F.col("first_click"))))
                / F.lit(1_000_000)
            )
            .cast("bigint")
            .alias("latency_s")
        )
    )
    exact_gk = 10_000_000
    return fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.percentile_approx("latency_s", 0.5, exact_gk).cast("bigint").alias("p50_s"),
        F.percentile_approx("latency_s", 0.9, exact_gk).cast("bigint").alias("p90_s"),
        F.max("latency_s").cast("bigint").alias("max_s"),
    )


@register(
    "a31_grouped_percentiles",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_disc(l_extendedprice, 0.5) AS p50_price,
           quantile_disc(l_extendedprice, 0.95) AS p95_price,
           quantile_disc(l_extendedprice, 0.99) AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a31_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A31: per-group exact discrete percentiles (p50/p95/p99 price per
    return flag) — the tail-latency-style summary, GROUPED: one
    partial-aggregated GK sketch per group merged map-side, never a
    per-group sort. The accuracy>n pin makes each group's element exact
    (= DuckDB quantile_disc; see a6). At 100 TB with high-cardinality
    groups, drop accuracy to its default: memory per group falls to
    O(accuracy log n) and the answer degrades gracefully to rank-error
    n/accuracy — the knob, not the plan, changes."""
    li = t(spark, sf_dir, "lineitem")
    exact_gk = 10_000_000
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.percentile_approx("l_extendedprice", 0.5, exact_gk).alias("p50_price"),
            F.percentile_approx("l_extendedprice", 0.95, exact_gk).alias("p95_price"),
            F.percentile_approx("l_extendedprice", 0.99, exact_gk).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "dq7_seasonal_anomaly",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               ISODOW(o_orderdate) - 1 AS dow,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1, 2
    ),
    med AS (
        SELECT dow, CAST(quantile_disc(rev_cents, 0.5) AS BIGINT) AS med_cents
        FROM daily GROUP BY dow
    ),
    dev AS (
        SELECT daily.d, daily.dow, daily.rev_cents, med.med_cents,
               ABS(daily.rev_cents - med.med_cents) AS adev
        FROM daily JOIN med USING (dow)
    ),
    mad AS (
        SELECT dow, CAST(quantile_disc(adev, 0.5) AS BIGINT) AS mad_cents
        FROM dev GROUP BY dow
    )
    SELECT dev.d AS day, CAST(dev.dow AS BIGINT) AS dow,
           dev.rev_cents, dev.med_cents, mad.mad_cents
    FROM dev JOIN mad USING (dow)
    WHERE dev.adev > 3 * mad.mad_cents
    ORDER BY day
    """,
)
def dq7_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ7: seasonality-aware anomaly flags — daily revenue compared to
    its OWN day-of-week median with a 3x MAD band (weekends differ from
    Tuesdays; a global band flags every Saturday). Median + MAD instead
    of mean + stddev because both are outlier-robust — the anomaly
    can't drag its own baseline. All arithmetic is exact: integer
    cents, discrete medians via the GK accuracy>n pin (= DuckDB
    quantile_disc), integer absolute deviations, integer 3*MAD
    threshold — no float anywhere, so the flag set is bit-stable.
    Scale: the raw scan reduces to a days-sized frame in one
    partial-agg shuffle; the two median passes run on that tiny frame
    (at 100 TB: still |days| rows). Day-of-week convention pinned to
    0=Monday on both engines (Spark weekday(), DuckDB ISODOW-1)."""
    o = t(spark, sf_dir, "orders")
    exact_gk = 10_000_000
    daily = (
        o.groupBy(
            F.col("o_orderdate").cast("date").alias("d"),
            F.weekday("o_orderdate").alias("dow"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("rev_cents"))
    )
    med = daily.groupBy("dow").agg(
        F.percentile_approx("rev_cents", 0.5, exact_gk).cast("bigint").alias("med_cents")
    )
    dev = daily.join(F.broadcast(med), "dow").withColumn(
        "adev", F.abs(F.col("rev_cents") - F.col("med_cents"))
    )
    mad = dev.groupBy("dow").agg(
        F.percentile_approx("adev", 0.5, exact_gk).cast("bigint").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "dow")
        .where(F.col("adev") > 3 * F.col("mad_cents"))
        # timestamp output (f10_monthly_revenue idiom): keeps the day
        # column in the datetime family on both fetch paths
        .select(
            F.col("d").cast("timestamp").alias("day"),
            F.col("dow").cast("bigint").alias("dow"),
            "rev_cents",
            "med_cents",
            "mad_cents",
        )
        .orderBy("day")
    )


@register(
    "x20_cdc_apply",
    """
    WITH log AS (
        SELECT user_id AS k, ts, event_id,
               CASE event_type WHEN 'signup' THEN 'I'
                               WHEN 'error' THEN 'D'
                               ELSE 'U' END AS op,
               CAST(FLOOR(value * 100) AS BIGINT) AS val_cents
        FROM events
        WHERE event_type IN ('signup', 'click', 'view', 'purchase', 'error')
    ),
    last_op AS (
        SELECT k, op, val_cents
        FROM log
        QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT k AS user_id, op AS last_op, val_cents
    FROM last_op
    WHERE op <> 'D'
    ORDER BY user_id
    """,
)
def x20_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: change-data-capture apply — collapse an ordered I/U/D
    changelog (Debezium-shaped: signup=insert, activity=update,
    error=delete here) into the final table state: per key the LAST
    operation wins, and a last-op DELETE removes the key entirely.
    This is the semantics x7's keep-latest upsert lacks (upsert never
    forgets); the delete branch is what makes CDC replication and
    GDPR-erasure pipelines correct.

    Plan: one window rank per key ordered by (ts, event_id) DESC — a
    single shuffle on the key, group state bounded by events-per-key —
    then a filter. At 100 TB the same query runs incrementally: new
    changelog batches fold in via x8's agg-state merge or as a
    MERGE INTO against the materialized state; the batch form here is
    the semantics oracle."""
    ev = t(spark, sf_dir, "events")
    # same domain filter as the oracle: a future event type outside the
    # changelog vocabulary must be excluded on BOTH sides, not silently
    # mapped to 'U' here while the oracle drops it
    log = ev.where(
        F.col("event_type").isin("signup", "click", "view", "purchase", "error")
    ).select(
        F.col("user_id").alias("k"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.floor(F.col("value") * 100).cast("bigint").alias("val_cents"),
    )
    w = Window.partitionBy("k").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(F.col("k").alias("user_id"), F.col("op").alias("last_op"), "val_cents")
        .orderBy("user_id")
    )


@register(
    "dq8_id_gap_islands",
    """
    WITH ok AS (
        SELECT event_id FROM events WHERE event_type <> 'error'
    ),
    grp AS (
        SELECT event_id,
               event_id - ROW_NUMBER() OVER (ORDER BY event_id) AS island_key
        FROM ok
    ),
    islands AS (
        SELECT CAST(MIN(event_id) AS BIGINT) AS island_start,
               CAST(MAX(event_id) AS BIGINT) AS island_end,
               CAST(COUNT(*) AS BIGINT) AS island_len
        FROM grp GROUP BY island_key
    )
    SELECT island_start, island_end, island_len
    FROM islands
    ORDER BY island_len DESC, island_start
    LIMIT 50
    """,
)
def dq8_id_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ8: gaps-and-islands over a surrogate-key sequence — the
    completeness audit that answers "which id ranges are missing?"
    after filtering out quarantined rows (here: 'error' events play the
    dropped records). Classic islands construction: id minus its row
    number is constant within every contiguous run. The global
    ROW_NUMBER is computed as a distributed_prefix_sum running count
    over range partitions of event_id (two-phase, ordered.py) — no
    single-partition global window anywhere in the plan, so the audit
    scales with the table instead of funneling it through one task.
    Top-50 longest islands returned (exact integers throughout)."""
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("event_type") != "error")
        .select("event_id", F.lit(1).alias("one"))
    )
    # rank = running count of rows in event_id order == ROW_NUMBER
    ranked = distributed_prefix_sum(ev, [F.col("event_id")], "one", out_col="rn")
    grp = ranked.select(
        "event_id", (F.col("event_id") - F.col("rn")).alias("island_key")
    )
    return (
        grp.groupBy("island_key")
        .agg(
            F.min("event_id").cast("bigint").alias("island_start"),
            F.max("event_id").cast("bigint").alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("island_len"),
        )
        .select("island_start", "island_end", "island_len")
        .orderBy(F.desc("island_len"), "island_start")
        .limit(50)
    )


@register(
    "ev11_pareto_concentration",
    """
    WITH per_user AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    cut AS (SELECT CAST(quantile_disc(cents, 0.9) AS BIGINT) AS p90 FROM per_user)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN cents > p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
           CAST(SUM(CASE WHEN cents > p90 THEN cents ELSE 0 END) AS BIGINT) AS top_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           ROUND(CAST(SUM(CASE WHEN cents > p90 THEN cents ELSE 0 END) AS DOUBLE)
                 / SUM(cents), 6) AS top_share
    FROM per_user, cut
    """,
)
def ev11_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV11: revenue-concentration (Pareto) audit — what share of total
    revenue the strictly-above-p90 customers hold: the whale-dependence
    metric behind "80/20" dashboards, and the skew signal that decides
    when x4/x12 salting is worth it. One per-user aggregate, one exact
    discrete p90 (GK accuracy>n, see a6), then a single conditional
    aggregation against the 1-row broadcast cut — exact integer cents
    everywhere, one double division for the share. The strict >
    comparison pins tie semantics identically on both engines."""
    o = t(spark, sf_dir, "orders")
    per_user = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents")
    )
    cut = per_user.agg(
        F.percentile_approx("cents", 0.9, 10_000_000).cast("bigint").alias("p90")
    )
    top = F.when(F.col("cents") > F.col("p90"), F.col("cents")).otherwise(F.lit(0))
    return per_user.crossJoin(F.broadcast(cut)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("cents") > F.col("p90"), 1).otherwise(0)).cast("bigint").alias("n_top"),
        F.sum(top).cast("bigint").alias("top_cents"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.round(F.sum(top).cast("double") / F.sum("cents"), 6).alias("top_share"),
    )


@register(
    "a33_runs_test",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    med AS (SELECT CAST(quantile_disc(rev, 0.5) AS BIGINT) AS m FROM daily),
    flagged AS (
        SELECT d, CASE WHEN rev > m THEN 1 ELSE 0 END AS above
        FROM daily, med
    ),
    runs AS (
        SELECT CAST(1 + SUM(CASE WHEN above <> prev THEN 1 ELSE 0 END) AS BIGINT) AS r,
               CAST(SUM(above) AS BIGINT) AS n1,
               CAST(SUM(1 - above) AS BIGINT) AS n2
        FROM (
            SELECT above, LAG(above) OVER (ORDER BY d) AS prev
            FROM flagged
        )
        WHERE prev IS NOT NULL OR TRUE
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2) * (n1 + n2 - 1))), 6) AS z_score
    FROM runs
    """,
)
def a33_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A33: Wald-Wolfowitz runs test — is the daily-revenue sequence
    random around its median, or does it trend/cluster? (|z| > 1.96
    rejects randomness: too few runs = momentum, too many =
    oscillation.) The sequence statistic (runs = 1 + sign changes via
    lag) runs on the DAYS-sized frame — one partial-agg shuffle reduces
    the raw scan, then the window sorts |days| rows regardless of data
    size. Counts are exact integers (strict > vs the exact discrete
    median pins ties); the z formula is evaluated over those integers
    in the same operand order on both engines, rounded to 6."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("rev")
    )
    med = daily.agg(F.percentile_approx("rev", 0.5, 10_000_000).cast("bigint").alias("m"))
    flagged = daily.crossJoin(F.broadcast(med)).select(
        "d", F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("above")
    )
    # days-sized frame: lag(above) = flag at the latest earlier day,
    # via broadcast non-equi self-join + max_by (days² cells on an
    # already-aggregated frame) instead of an unpartitioned window —
    # keeps every plan free of single-partition WindowExec
    fa = flagged.alias("fa")
    fb = flagged.alias("fb")
    seq = (
        fa.join(F.broadcast(fb), F.col("fb.d") < F.col("fa.d"), "left")
        .groupBy(F.col("fa.d").alias("d"), F.col("fa.above").alias("above"))
        .agg(F.max_by(F.col("fb.above"), F.col("fb.d")).alias("prev"))
        .select("above", "prev")
    )
    runs = seq.agg(
        (1 + F.sum(F.when(F.col("above") != F.col("prev"), 1).otherwise(0)))
        .cast("bigint")
        .alias("r"),
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
    )
    return runs.selectExpr(
        "r AS n_runs",
        "n1 AS n_above",
        "n2 AS n_below",
        """ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2) * (n1 + n2 - 1))), 6) AS z_score""",
    )


@register(
    "dq9_referential_integrity",
    """
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           CAST((SELECT COUNT(*) FROM supplier s
                 WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)) AS BIGINT)
    UNION ALL
    SELECT 'nation.n_regionkey -> region',
           CAST((SELECT COUNT(*) FROM nation n
                 WHERE NOT EXISTS (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)) AS BIGINT)
    UNION ALL
    SELECT 'events.user_id -> customer',
           CAST((SELECT COUNT(*) FROM events e
                 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS BIGINT)
    ORDER BY fk
    """,
)
def dq9_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ9: whole-schema referential-integrity sweep — one query that
    anti-joins every declared FK edge of the star schema and reports
    orphan counts per edge (the audit a warehouse runs after every
    load; a non-zero row is a broken pipeline, not a data fact). Each
    leg is an anti join against the parent's key — Spark broadcasts
    the small parents and shuffle-joins the big ones, every leg
    partial-aggregates to ONE row before the 8-row union, so the sweep
    costs one pass over each child table regardless of scale. events →
    customer is intentionally included: user_id is only a SOFT
    reference, so its orphan count documents the real referential
    status of the event stream rather than assuming it."""
    edges = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey -> region", "nation", "n_regionkey", "region", "r_regionkey"),
        ("events.user_id -> customer", "events", "user_id", "customer", "c_custkey"),
    ]
    parts = []
    for fk, child, ck, parent, pk in edges:
        orphans = (
            t(spark, sf_dir, child)
            .select(F.col(ck).alias("k"))
            .join(
                t(spark, sf_dir, parent).select(F.col(pk).alias("k")),
                "k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            .select(F.lit(fk).alias("fk"), "n_orphans")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fk")


@register(
    "dq10_uniqueness_audit",
    """
    SELECT 'customer.c_custkey' AS pk,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT) AS n_keys
    UNION ALL
    SELECT 'events.event_id',
           CAST((SELECT COUNT(*) FROM events) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT event_id) FROM events) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber,l_suppkey,l_partkey)',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT CONCAT(
                    COALESCE(CAST(l_orderkey AS VARCHAR), chr(1)), ':',
                    COALESCE(CAST(l_linenumber AS VARCHAR), chr(1)), ':',
                    COALESCE(CAST(l_suppkey AS VARCHAR), chr(1)), ':',
                    COALESCE(CAST(l_partkey AS VARCHAR), chr(1)))) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'nation.n_nationkey',
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT n_nationkey) FROM nation) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_orderkey',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'part.p_partkey',
           CAST((SELECT COUNT(*) FROM part) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT p_partkey) FROM part) AS BIGINT)
    UNION ALL
    SELECT 'region.r_regionkey',
           CAST((SELECT COUNT(*) FROM region) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT r_regionkey) FROM region) AS BIGINT)
    UNION ALL
    SELECT 'supplier.s_suppkey',
           CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT s_suppkey) FROM supplier) AS BIGINT)
    ORDER BY pk
    """,
)
def dq10_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ10: primary-key uniqueness sweep — rows vs distinct keys for
    every table's declared (or candidate) key, the load audit that
    catches double-ingestion before joins fan out. Notably lineitem's
    key must be the FULL (orderkey, linenumber, suppkey, partkey)
    tuple: (l_orderkey, l_linenumber) alone is NOT unique in this
    testdata — a fact several window tiebreaks in the engine already
    encode, now stated as a checked row. Each leg is one
    partial-aggregated count-distinct; the sweep is one pass per
    table."""
    keys = [
        ("customer.c_custkey", "customer", ["c_custkey"]),
        ("events.event_id", "events", ["event_id"]),
        (
            "lineitem.(l_orderkey,l_linenumber,l_suppkey,l_partkey)",
            "lineitem",
            ["l_orderkey", "l_linenumber", "l_suppkey", "l_partkey"],
        ),
        ("nation.n_nationkey", "nation", ["n_nationkey"]),
        ("orders.o_orderkey", "orders", ["o_orderkey"]),
        ("part.p_partkey", "part", ["p_partkey"]),
        ("region.r_regionkey", "region", ["r_regionkey"]),
        ("supplier.s_suppkey", "supplier", ["s_suppkey"]),
    ]
    parts = []
    for pk, table, cols in keys:
        if len(cols) == 1:
            # single-column: COUNT(DISTINCT col) skips NULLs
            # identically in both engines
            key_count = F.count_distinct(F.col(cols[0]))
        else:
            # multi-column: Spark's count_distinct drops a tuple if ANY
            # field is null, DuckDB's row-tuple distinct keeps it — the
            # exact condition a uniqueness audit must detect. Canonical
            # sentinel key (chr(1) per null field) agrees on both sides
            # and counts null-bearing tuples as distinct keys.
            key_count = F.count_distinct(
                F.concat_ws(
                    ":",
                    *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols],
                )
            )
        parts.append(
            t(spark, sf_dir, table).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                key_count.cast("bigint").alias("n_keys"),
            ).select(F.lit(pk).alias("pk"), "n_rows", "n_keys")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("pk")


@register(
    "dq11_table_fingerprint",
    """
    WITH o AS (
        SELECT COUNT(*) AS n,
               SUM(('0x' || SUBSTR(MD5(CONCAT(CAST(o_orderkey AS VARCHAR), ':',
                    CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR))), 1, 8))::BIGINT) AS fp
        FROM orders
    ),
    l AS (
        SELECT COUNT(*) AS n,
               SUM(('0x' || SUBSTR(MD5(CONCAT(CAST(l_orderkey AS VARCHAR), ':',
                    CAST(l_linenumber AS VARCHAR), ':', CAST(l_suppkey AS VARCHAR), ':',
                    CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS VARCHAR))), 1, 8))::BIGINT) AS fp
        FROM lineitem
    ),
    c AS (
        SELECT COUNT(*) AS n,
               SUM(('0x' || SUBSTR(MD5(CONCAT(CAST(c_custkey AS VARCHAR), ':',
                    CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR))), 1, 8))::BIGINT) AS fp
        FROM customer
    )
    SELECT 'customer' AS table_name, CAST(n AS BIGINT) AS n_rows, CAST(fp AS BIGINT) AS fingerprint FROM c
    UNION ALL
    SELECT 'lineitem', CAST(n AS BIGINT), CAST(fp AS BIGINT) FROM l
    UNION ALL
    SELECT 'orders', CAST(n AS BIGINT), CAST(fp AS BIGINT) FROM o
    ORDER BY table_name
    """,
)
def dq11_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ11: content fingerprints — an order-independent checksum per
    table (SUM of a portable row hash over key + value columns), the
    cheap equality proof replication/migration pipelines compare
    instead of diffing rows: two copies agree iff (n_rows,
    fingerprint) agree, across engines, partitionings and file
    layouts. The row hash is the md5-prefix integer (portable_hash32)
    of a canonical key:value string; the SUM is commutative so any
    execution order gives the same BIGINT (2^32-bounded terms overflow
    signed 64-bit only past ~2^31 rows — shard the sum by key range
    beyond that). One map-side pass + 1-row aggregate per table."""
    from realestate_engine.dedup import portable_hash32

    def fp(df, parts) -> DataFrame:
        key = F.concat_ws(":", *parts)
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(portable_hash32(key)).cast("bigint").alias("fingerprint"),
        )

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    rows = [
        fp(c, [F.col("c_custkey").cast("string"),
               F.round(F.col("c_acctbal") * 100).cast("bigint").cast("string")])
        .select(F.lit("customer").alias("table_name"), "n_rows", "fingerprint"),
        fp(li, [F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"),
                F.col("l_suppkey").cast("string"),
                F.round(F.col("l_extendedprice") * 100).cast("bigint").cast("string")])
        .select(F.lit("lineitem").alias("table_name"), "n_rows", "fingerprint"),
        fp(o, [F.col("o_orderkey").cast("string"),
               F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string")])
        .select(F.lit("orders").alias("table_name"), "n_rows", "fingerprint"),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("table_name")


@register(
    "a50_anova_oneway",
    """
    WITH base AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        FROM base GROUP BY grp
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_all, CAST(SUM(s) AS BIGINT) AS s_all,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ),
    ss AS (
        SELECT
            (SELECT CAST(SUM(CAST(FLOOR(
                 (cents - CAST(t.s_all AS DOUBLE) / t.n_all)
               * (cents - CAST(t.s_all AS DOUBLE) / t.n_all) / 10000) AS BIGINT))
               AS BIGINT) FROM base, tot t) AS ss_total_sq,
            (SELECT CAST(SUM(CAST(FLOOR(g.n *
                 (CAST(g.s AS DOUBLE) / g.n - CAST(t.s_all AS DOUBLE) / t.n_all)
               * (CAST(g.s AS DOUBLE) / g.n - CAST(t.s_all AS DOUBLE) / t.n_all)
               / 10000) AS BIGINT)) AS BIGINT) FROM g, tot t) AS ss_between_sq,
            t.n_all, t.k
        FROM tot t
    )
    SELECT k AS n_groups, n_all,
           ss_between_sq AS ss_between_sq_units,
           CAST(ss_total_sq - ss_between_sq AS BIGINT) AS ss_within_sq_units,
           CAST(FLOOR(1000000.0
               * (CAST(ss_between_sq AS DOUBLE) / (k - 1))
               / (CAST(ss_total_sq - ss_between_sq AS DOUBLE) / (n_all - k)))
               AS BIGINT) AS f_stat_micro
    FROM ss
    """,
)
def a50_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across order priorities: between/within sums of
    squares and the F statistic — the k-group generalization of a30's
    Welch t-test. Per-row and per-group squared deviations run through
    one fixed IEEE tree each and are FLOOR-scaled (to whole squared
    currency units) BEFORE summation — the standing order-free rule —
    so SS_between, SS_within, and the micro F all hash-compare.
    SS_within = SS_total - SS_between (the ANOVA identity) instead of
    a second per-row pass over group means.

    Plan: one scan computes per-row terms against the 1-row broadcast
    grand mean; group stats are a 5-row frame. At 100 TB the test is
    one map-side-combinable aggregation."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    g = o.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("cents").cast("bigint").alias("s")
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("s").cast("bigint").alias("s_all"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    dev = "(cents - CAST(s_all AS DOUBLE) / n_all)"
    ss_total = (
        o.crossJoin(F.broadcast(tot))
        .selectExpr(f"CAST(FLOOR({dev} * {dev} / 10000) AS BIGINT) AS term")
        .agg(F.sum("term").cast("bigint").alias("ss_total_sq"))
    )
    gdev = "(CAST(s AS DOUBLE) / n - CAST(s_all AS DOUBLE) / n_all)"
    ss_between = (
        g.crossJoin(F.broadcast(tot))
        .selectExpr(f"CAST(FLOOR(n * {gdev} * {gdev} / 10000) AS BIGINT) AS term")
        .agg(F.sum("term").cast("bigint").alias("ss_between_sq"))
    )
    return (
        tot.crossJoin(F.broadcast(ss_total))
        .crossJoin(F.broadcast(ss_between))
        .selectExpr(
            "k AS n_groups",
            "n_all",
            "ss_between_sq AS ss_between_sq_units",
            "CAST(ss_total_sq - ss_between_sq AS BIGINT) AS ss_within_sq_units",
            "CAST(FLOOR(1000000.0 * (CAST(ss_between_sq AS DOUBLE) / (k - 1))"
            " / (CAST(ss_total_sq - ss_between_sq AS DOUBLE) / (n_all - k))) AS BIGINT)"
            " AS f_stat_micro",
        )
    )


# Spearman rho in micro units, as ONE shared SQL text used verbatim on
# both engines: all rank moments are exact BIGINT; the only floating
# point is the final sqrt/divide/multiply chain, each step correctly
# rounded per IEEE-754 (sqrt included), so the floored micro value is
# bit-reproducible cross-engine.
_SPEARMAN_RHO = (
    "CAST(CASE WHEN ssx = 0 OR ssy = 0 THEN 0 ELSE"
    " FLOOR(CAST(sxy AS DOUBLE)"
    " / (SQRT(CAST(ssx AS DOUBLE)) * SQRT(CAST(ssy AS DOUBLE)))"
    " * 1000000) END AS BIGINT)"
)

_A51_ORACLE = f"""
    WITH per_cust AS (
        SELECT o_custkey AS ck, COUNT(*) AS n_orders,
               SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS spend_cents
        FROM orders GROUP BY 1
    ),
    labeled AS (
        SELECT n.n_name, p.n_orders, p.spend_cents
        FROM per_cust p
        JOIN customer c ON c.c_custkey = p.ck
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    ranked AS (
        SELECT n_name,
               2 * RANK() OVER (PARTITION BY n_name ORDER BY n_orders)
                 + COUNT(*) OVER (PARTITION BY n_name, n_orders) - 1 AS rx2,
               2 * RANK() OVER (PARTITION BY n_name ORDER BY spend_cents)
                 + COUNT(*) OVER (PARTITION BY n_name, spend_cents) - 1 AS ry2,
               COUNT(*) OVER (PARTITION BY n_name) AS n
        FROM labeled
    ),
    moms AS (
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM((rx2 - (n + 1)) * (ry2 - (n + 1))) AS BIGINT) AS sxy,
               CAST(SUM((rx2 - (n + 1)) * (rx2 - (n + 1))) AS BIGINT) AS ssx,
               CAST(SUM((ry2 - (n + 1)) * (ry2 - (n + 1))) AS BIGINT) AS ssy
        FROM ranked GROUP BY n_name
    )
    SELECT n_name AS nation, n_customers,
           {_SPEARMAN_RHO} AS spearman_micro
    FROM moms ORDER BY nation
"""


@register("a51_spearman_corr", _A51_ORACLE)
def a51_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A51: per-nation Spearman rank correlation between customer order
    COUNT and customer total SPEND — the robust (monotone, outlier-
    immune) complement to a8's Pearson: "do customers who order more
    often also spend more, rank-for-rank?". Tie handling is the exact
    textbook average-rank: carried as DOUBLED average ranks
    (2*avg = 2*min_rank + tie_count - 1, both window functions), which
    stay integers, and the per-partition mean of the doubled ranks is
    EXACTLY n+1 (sum of average ranks is n(n+1)/2 regardless of ties),
    so centered deviations are exact BIGINTs with no division — rank
    moments never see a float. rho = sxy/sqrt(ssx*ssy) is evaluated as
    the shared IEEE text _SPEARMAN_RHO (sqrt of each factor separately:
    ssx*ssy as a single product would overflow BIGINT at ~55k rows per
    group, sqrt'ing each factor is exact-rounded and never overflows).
    Deviation products stay under 2^63 for any group below ~1.3M rows
    (4n^3 bound); beyond that, pre-bucketing ranks or a HUGEINT-style
    decimal(38) carry is the documented scale path. Plan: one
    orders-sized groupBy, two node-sized joins, windows all PARTITIONED
    by nation — no global sort, no unpartitioned window."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("spend_cents"),
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    labeled = per_cust.join(
        cust, per_cust.o_custkey == cust.c_custkey
    ).join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        "n_name", "n_orders", "spend_cents"
    )
    wn = Window.partitionBy("n_name")
    ranked = labeled.select(
        "n_name",
        (
            2 * F.rank().over(wn.orderBy("n_orders"))
            + F.count(F.lit(1)).over(Window.partitionBy("n_name", "n_orders"))
            - 1
        ).alias("rx2"),
        (
            2 * F.rank().over(wn.orderBy("spend_cents"))
            + F.count(F.lit(1)).over(Window.partitionBy("n_name", "spend_cents"))
            - 1
        ).alias("ry2"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    moms = (
        ranked.select(
            "n_name",
            (F.col("rx2") - (F.col("n") + 1)).alias("dx"),
            (F.col("ry2") - (F.col("n") + 1)).alias("dy"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
            F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("ssx"),
            F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("ssy"),
        )
    )
    return moms.select(
        F.col("n_name").alias("nation"),
        "n_customers",
        F.expr(_SPEARMAN_RHO).alias("spearman_micro"),
    ).orderBy("nation")
