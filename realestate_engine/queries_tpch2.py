"""TPC-H query shapes 2/8/9/11/13/15/16/17/20/21/22 — the half of the
suite queries_functions.py doesn't cover — adapted to the driver
testdata's reduced schema (TESTDATA.md: no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no c_phone):

- partsupp-based queries (Q2/Q9/Q11/Q16/Q20) use ``lineitem`` as the
  part↔supplier bridge, or ``supplier.s_acctbal`` where the query is
  really about a value share (Q11);
- Q21's "kept waiting" predicate becomes shipped-late
  (l_shipdate > o_orderdate + 60 days), the same proxy tpch_q4 uses;
- Q22's phone country code becomes c_nationkey.

Each keeps the structural shape that makes the original interesting —
correlated min (Q2), two-sided dimension join + share-of-total (Q8),
scalar-subquery HAVING (Q11), outer-join histogram (Q13), view + max
subquery (Q15), correlated avg (Q17), nested semi-joins (Q20),
EXISTS/NOT EXISTS (Q21), anti-join + global-avg threshold (Q22).

Money aggregates follow the exact-integer-cents discipline documented
at tpch_q7 (queries_functions.py): sum cents (× discount basis points)
as BIGINT on both sides, divide once at the end, never ROUND a float
group sum. Comparisons against computed thresholds are done in pure
integers wherever the operands are 2-decimal money. At true 100 TB row
counts the exact sums would widen to DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realestate_engine.registry import register, t


def _cents(col: str):
    """2-decimal money column → exact integer cents (BIGINT)."""
    return F.round(F.col(col) * 100).cast("bigint")


_REV_UNITS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"


def _rev_units():
    """Revenue in exact integer units (cents × discount basis points);
    divide by 10000.0 once at the end for the dollar value."""
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


@register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH eu AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    unit AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(FLOOR(l_extendedprice * 1000 / l_quantity) AS BIGINT)) AS unit_mills
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM eu)
        GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT *, MIN(unit_mills) OVER (PARTITION BY l_partkey) AS best_mills
        FROM unit
    )
    SELECT s_name, n_name, p_partkey, p_name,
           best_mills / 1000.0 AS min_unit_price
    FROM best
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE unit_mills = best_mills
      AND p_size = 15 AND p_type = 'STANDARD'
    ORDER BY p_partkey, s_name
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated-min subquery): the cheapest supplier
    per part. partsupp doesn't exist in the testdata, so observed unit
    price from lineitem (floor'd to integer mills — FLOOR is unambiguous
    across engines, ROUND-half behavior is not) plays ps_supplycost.
    As in the real Q2, the min is taken over the region's candidate
    suppliers only (EUROPE, via a broadcast semi-join before the agg);
    the correlated `= (SELECT MIN ...)` becomes a window MIN over the
    already-aggregated (part, supp) rollup — one shuffle on l_partkey,
    reused by the window. Dimension sides broadcast."""
    n_all = t(spark, sf_dir, "nation")
    r_eu = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n_all), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r_eu), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(F.col("l_extendedprice") * 1000 / F.col("l_quantity")).cast("bigint")
        ).alias("unit_mills")
    )
    best = unit.withColumn(
        "best_mills", F.min("unit_mills").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit_mills") == F.col("best_mills"))
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    # Explicit aliases: supplier/nation also feed the `eu` semi-join
    # side above, and t() memoizes the scan relation per table (r15),
    # so both occurrences are the same Dataset — qualified names keep
    # the second join unambiguous (the standard self-join discipline).
    s = t(spark, sf_dir, "supplier").alias("s2")
    n = t(spark, sf_dir, "nation").alias("n2")
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == F.col("s2.s_suppkey"))
        .join(F.broadcast(n), F.col("s2.s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("best_mills") / 1000.0).alias("min_unit_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


@register(
    "tpch_q8_market_share",
    f"""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
           SUM(CASE WHEN n1.n_name = 'NATION_7' THEN {_REV_UNITS} ELSE 0 END) * 1.0
             / SUM({_REV_UNITS}) AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n2.n_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_7's share of
    supply revenue to EUROPE customers per year. nation joins twice
    (supplier + customer side), both broadcast. The share divides two
    exact BIGINT sums — identical integers give bit-identical doubles,
    so no rounding is needed on either side."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    units = _rev_units()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_7", units).otherwise(F.lit(0)))
                * 1.0
                / F.sum(units)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    f"""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           SUM({_REV_UNITS}) / 10000.0 AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation/year). Without
    partsupp there is no supply cost, so profit = discounted revenue on
    '%widget%' parts. The part filter broadcasts and prunes lineitem
    before the orders join — the selective dimension goes first."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(_rev_units()) / 10000.0).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_balance",
    """
    WITH per_nation AS (
        SELECT n_name,
               SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS bal_cents
        FROM supplier JOIN nation ON n_nationkey = s_nationkey
        GROUP BY n_name
    )
    SELECT n_name, bal_cents / 100.0 AS total_balance
    FROM per_nation
    WHERE bal_cents * 20 > (SELECT SUM(bal_cents) FROM per_nation)
    ORDER BY n_name
    """,
)
def tpch_q11_important_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (scalar-subquery HAVING): nations holding > 5%
    of global supplier account balance (s_acctbal plays ps_supplycost×
    ps_availqty). The 5% threshold compares pure integers
    (bal_cents × 20 > global_cents) — no float boundary. The global
    scalar is a 1-row aggregate broadcast cross-joined back (same idiom
    as tpch_q22) — no unpartitioned window, even over 25 rows."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    per_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_cents("s_acctbal")).alias("bal_cents"))
    )
    global_sum = per_nation.agg(F.sum("bal_cents").alias("global_cents"))
    return (
        per_nation.crossJoin(F.broadcast(global_sum))
        .filter(F.col("bal_cents") * 20 > F.col("global_cents"))
        .select("n_name", (F.col("bal_cents") / 100.0).alias("total_balance"))
        .orderBy("n_name")
    )


@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (outer-join histogram): distribution of
    non-urgent order counts per customer, zero-order customers
    included via the left join (COUNT(o_orderkey) skips the nulls).
    Two shuffles: the join/first groupBy share the c_custkey hash
    partitioning; the histogram regroup is on the tiny reduced set."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({_REV_UNITS}) AS total_units
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_units / 10000.0 AS total_revenue
    FROM revenue JOIN supplier ON s_suppkey = supplier_no
    WHERE total_units = (SELECT MAX(total_units) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (view + max scalar subquery): the supplier(s)
    with peak quarterly revenue. The revenue 'view' is computed once
    and reused for both the max scalar and the final filter; the max is
    a 1-row aggregate broadcast cross-joined back (per-supplier rows
    grow with scale, so no single-partition window over them), and the
    tie on exact integer units makes `= MAX` deterministic across
    engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_units()).alias("total_units")
    )
    max_rev = revenue.agg(F.max("total_units").alias("max_units"))
    s = t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_units") == F.col("max_units"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("total_units") / 10000.0).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_count",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (distinct-count per part attribute): how many
    suppliers ship each qualifying (brand, type, size). lineitem is the
    part↔supplier bridge (no partsupp); the part filter broadcasts so
    the fact scan prunes before the expensive distinct aggregation."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
    WITH liq AS (
        SELECT l_partkey, l_quantity, l_extendedprice,
               AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
        FROM lineitem
    )
    SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 700.0 AS avg_yearly
    FROM liq JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND l_quantity < 0.2 * avg_qty
    ORDER BY avg_yearly
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated AVG subquery): revenue lost if
    small-quantity orders of Brand#23 MEDIUM parts went unfilled. The
    correlated per-part AVG becomes a window AVG partitioned by
    l_partkey. Quantities are small integral doubles, so the float AVG
    is exact and order-insensitive; the revenue sum uses exact cents."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    )
    liq = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).withColumn(
        "avg_qty", F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    )
    return (
        liq.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(_cents("l_extendedprice")) / 700.0).alias("avg_yearly"))
    )


@register(
    "tpch_q20_potential_promotion",
    """
    SELECT s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 30
      )
    ORDER BY s_name
    """,
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested semi-join chain): NATION_3 suppliers who
    moved >30 units of any 'small%' part in 1996. The partsupp
    availability check becomes a shipped-quantity HAVING over the
    lineitem bridge; the supplier qualification is a LEFT SEMI join so
    no duplicate suppliers survive. Quantity sums are exact (small
    integral doubles)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualified, s.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_5'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS): suppliers solely
    responsible for late multi-supplier 'F' orders. No
    l_receiptdate/l_commitdate in the testdata, so "late" is
    l_shipdate > o_orderdate + 60 days (tpch_q4's proxy).

    The EXISTS/NOT-EXISTS pair is rewritten to per-order supplier
    cardinalities (the standard Q21 decorrelation):
    - EXISTS other-supplier lineitem  <=> the order's FULL supplier
      set has >= 2 members (l1's own supplier is always a member);
    - NOT EXISTS other LATE supplier  <=> the order's LATE supplier
      set is exactly {l1.l_suppkey} <=> its size is 1.
    The naive semi+anti formulation scans the late subplan twice and
    lineitem three times; this form scans lineitem twice, gets the
    late-set size from a collect_set window on the SAME l_orderkey
    shuffle the late build already pays, and joins one 1-col-per-order
    aggregate — every leg still keyed on l_orderkey, group sizes
    bounded by lines-per-order, so the shape holds at 100 TB.

    Join order (round 4): the nation-filtered supplier dim (1/25
    selectivity) joins sole_late FIRST, so the l_orderkey join against
    the per-order aggregate moves 25x fewer rows; AQE picks broadcast
    for the filtered dim while it fits and degrades to shuffle at
    dim sizes where broadcast would not."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    # r15 (guide §2.3 — aggregate before you shuffle onward): the old
    # form kept every late ROW through a collect_set window (full sort
    # + per-row set buffers on the l_orderkey exchange) and carried
    # all of them into the supplier/multi_supp joins. A qualifying
    # order has EXACTLY ONE distinct late supplier, so its late rows
    # collapse to one aggregate row (that supplier = min = the only
    # one) carrying the row count; numwait sums the counts instead of
    # counting rows — same integer, one partial-aggregated row per
    # order moving through both joins instead of every lineitem.
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp_late"),
            F.min("l_suppkey").alias("l_suppkey"),
            F.count(F.lit(1)).alias("_n_rows"),
        )
        .filter(F.col("n_supp_late") == 1)
    )
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp_all"))
        .filter(F.col("n_supp_all") >= 2)
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s_nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    return (
        sole_late.join(s_nat, sole_late.l_suppkey == s_nat.s_suppkey)
        .join(multi_supp, "l_orderkey")
        .groupBy("s_name")
        .agg(F.sum("_n_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "tpch_q22_sales_opportunity",
    """
    WITH pos AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    thresh AS (
        SELECT SUM(bal_cents) AS total_cents, COUNT(*) AS cnt
        FROM pos WHERE bal_cents > 0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(bal_cents) / 100.0 AS totacctbal
    FROM pos, thresh
    WHERE bal_cents * cnt > total_cents
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (anti-join + global-average threshold):
    customers from 7 nations (c_nationkey plays the phone country
    code) with above-average positive balances and no URGENT orders
    (every customer in the synthetic data has *some* order, so the
    anti-join target is the urgent subset — same plan shape). The AVG
    comparison is done in pure integers (bal_cents × cnt > total_cents)
    so no float boundary can disagree; the scalar threshold broadcasts
    via a 1-row cross join."""
    c = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select("c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_cents"))
    thresh = (
        c.filter(F.col("bal_cents") > 0)
        .agg(F.sum("bal_cents").alias("total_cents"), F.count(F.lit(1)).alias("cnt"))
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("bal_cents") * F.col("cnt") > F.col("total_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_cents") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
