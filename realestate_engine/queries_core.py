"""Core relational operators: scans/sinks, projections, filters, joins,
aggregations, windows, sorts, set operations (SURVEY.md §2.1-2.7).

Each query is the Spark-first re-expression of a reference operator
(file:line cited per query); the paired oracle SQL is what DuckDB runs
on the same parquet for the driver's correctness gate.

Scale notes honored throughout:
- dimension tables (region/nation/supplier) joined via broadcast — no
  shuffle of the fact side's join keys;
- aggregations are expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the shuffle;
- top-k is orderBy+limit → Spark plans TakeOrderedAndProject (no global
  sort materialization);
- no .collect(), no Python row-at-a-time UDFs anywhere.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from realestate_engine.registry import register, stable_tmp, t
from realestate_engine.schemas import TESTDATA_SCHEMAS

# ---------------------------------------------------------------------------
# Flagship (entry()): revenue by nation = J1 + A2 + O1 analogue
# (reference: notebooks/00_prepare_data.py:57 join; notebooks/01:163-166
# group-avg + sort — re-expressed on the TPC-H testdata)
# ---------------------------------------------------------------------------


def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc())
    )


register(
    "flagship_revenue_by_nation",
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)(flagship_revenue_by_nation)


# ---------------------------------------------------------------------------
# S — scans / sinks (SURVEY §2.1)
# ---------------------------------------------------------------------------


@register("s1_csv_roundtrip", "SELECT r_regionkey, r_name FROM region")
def s1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S6: native CSV sink then explicit-schema CSV scan (reference
    scan: notebooks/00_prepare_data.py:43-53; reference sink detoured
    through pandas, src/webapp/app.py:153 — ours is distributed)."""
    out = stable_tmp("s1_csv")
    t(spark, sf_dir, "region").write.mode("overwrite").option("header", "true").csv(out)
    return spark.read.option("header", "true").schema(TESTDATA_SCHEMAS["region"]).csv(out)


@register(
    "s2_parquet_scan_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 45.0
    """,
)
def s2_parquet_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: parquet scan with filter + projection reaching the scan
    (PushedFilters/ReadSchema — verified in tests/test_plans.py).
    Reference: src/features/feature_engineering.py:401-404."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 45.0).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "s3_parquet_sink_partitioned",
    "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders",
)
def s3_parquet_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: partitioned parquet sink + read-back (partition pruning is the
    scale path: a status-filtered scan reads one directory).
    Reference sink: notebooks/00_prepare_data.py:91 (no partitionBy)."""
    out = stable_tmp("s3_parquet")
    (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    return spark.read.parquet(out).select("o_orderkey", "o_totalprice", "o_orderstatus")


@register(
    "s4_local_rows",
    """
    SELECT CAST(1 AS INTEGER) AS id, 'alpha' AS name, CAST(10.5 AS DOUBLE) AS score
    UNION ALL SELECT CAST(2 AS INTEGER), 'beta', NULL
    UNION ALL SELECT CAST(3 AS INTEGER), 'gamma', CAST(3.25 AS DOUBLE)
    """,
)
def s4_local_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: local-row source with explicit schema (reference:
    src/inference/predict.py:62, src/webapp/app.py:51)."""
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame([(1, "alpha", 10.5), (2, "beta", None), (3, "gamma", 3.25)], schema)


@register(
    "s6_csv_sink_native",
    "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem",
)
def s6_csv_sink_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: distributed CSV sink (exact-typed columns) + read-back."""
    out = stable_tmp("s6_csv")
    sub = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag")
    sub.write.mode("overwrite").option("header", "true").csv(out)
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
        ]
    )
    return spark.read.option("header", "true").schema(schema).csv(out)


# ---------------------------------------------------------------------------
# P — projections / filters / row-level predicates (SURVEY §2.2)
# ---------------------------------------------------------------------------


@register(
    "p1_cast_normalization",
    """
    SELECT CAST(l_orderkey AS VARCHAR) AS order_str,
           CAST(l_linenumber AS BIGINT) AS line_long,
           CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
           CAST(l_shipdate AS DATE) AS ship_date,
           l_extendedprice AS price
    FROM lineitem
    """,
)
def p1_cast_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: schema-normalization cast projection (reference: the 21-column
    cast list at notebooks/00_prepare_data.py:65-87). floor() before the
    double->int cast because Spark truncates while DuckDB rounds."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("order_str"),
        F.col("l_linenumber").cast("long").alias("line_long"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_extendedprice").alias("price"),
    )


@register("p2_column_subset", "SELECT doc_id, lang, n_chars FROM documents")
def p2_column_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (reference: notebooks/01:108,125-130 select subsets)."""
    return t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")


@register("p3_rename", "SELECT o_orderkey, o_totalprice AS price FROM orders")
def p3_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 (reference: src/inference/predict.py:24 withColumnRenamed)."""
    return t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").withColumnRenamed("o_totalprice", "price")


@register(
    "p4_null_filter",
    """
    SELECT event_id, event_type FROM events
    WHERE (CASE WHEN value >= 10.0 THEN value END) IS NULL
    """,
)
def p4_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: isNull predicate filter (reference: notebooks/01:78). Testdata
    has no physical nulls, so nulls are synthesized with a guard."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("v", F.when(F.col("value") >= 10.0, F.col("value")))
        .filter(F.col("v").isNull())
        .select("event_id", "event_type")
    )


@register(
    "p5_sql_string_filter",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 200000 AND o_orderstatus = 'F'
    """,
)
def p5_sql_string_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: SQL-string predicate parsed by Catalyst (reference:
    src/webapp/app.py:90)."""
    return (
        t(spark, sf_dir, "orders")
        .filter("o_totalprice > 200000 AND o_orderstatus = 'F'")
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "p6_range_filter_drop",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_quantity BETWEEN 10.0 AND 20.0
    """,
)
def p6_range_filter_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: value-range filter then column drop (reference:
    notebooks/04_model_improvement.py:88-90)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity").between(10.0, 20.0)).drop(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    )


@register(
    "p7_conditional_case",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_tier,
           CAST(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS BIGINT) AS is_urgent
    FROM orders
    """,
)
def p7_conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: when/otherwise chain + isin flag (reference:
    src/features/feature_engineering.py:94-126,171-180)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_tier"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).cast("long").alias("is_urgent"),
    )


@register(
    "p8_null_imputation",
    """
    SELECT event_id,
           COALESCE(CASE WHEN value >= 10.0 THEN value END, -1.0) AS value_filled
    FROM events
    """,
)
def p8_null_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: df.na.fill imputation (reference:
    src/features/feature_engineering.py:83-91 strict/permissive fill)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.withColumn("value_filled", F.when(F.col("value") >= 10.0, F.col("value")))
        .select("event_id", "value_filled")
        .na.fill({"value_filled": -1.0})
    )


@register(
    "p9_null_profile",
    """
    SELECT CAST(SUM(CASE WHEN (CASE WHEN value >= 10.0 THEN value END) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value,
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_type,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_props,
           COUNT(*) AS n_rows
    FROM events
    """,
)
def p9_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: ONE-pass missing-value profile. The reference issues one job
    per column (notebooks/01:73-86, src/webapp/app.py:89-92) — a
    scale-killer at 100 TB; ours is a single aggregate."""
    ev = t(spark, sf_dir, "events").withColumn("v", F.when(F.col("value") >= 10.0, F.col("value")))
    return ev.agg(
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).cast("long").alias("nulls_value"),
        F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0)).cast("long").alias("nulls_event_type"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).cast("long").alias("nulls_props"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# J — joins (SURVEY §2.3): the reference uses a single inner equi-join
# (notebooks/00_prepare_data.py:57) + a count-based integrity audit
# (:117-120); ours exposes the full join-type matrix.
# ---------------------------------------------------------------------------


@register(
    "j1_inner_join_using",
    """
    SELECT s_nationkey AS nationkey, s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def j1_inner_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join with USING semantics — key deduplicated in the
    output (reference: notebooks/00_prepare_data.py:57). Dimension side
    broadcast: zero shuffle at any scale."""
    s = t(spark, sf_dir, "supplier").withColumnRenamed("s_nationkey", "nationkey")
    n = t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "nationkey")
    return s.join(F.broadcast(n), "nationkey").select("nationkey", "s_suppkey", "s_name", "n_name")


@register(
    "j2_anti_join_audit",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j2_anti_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: join-integrity audit via anti-join — returns the actual
    unmatched rows instead of the reference's three count() jobs
    (notebooks/00_prepare_data.py:117-120)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "j3_left_outer",
    "SELECT c_custkey, o_orderkey FROM customer LEFT JOIN orders ON c_custkey = o_custkey",
)
def j3_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select("c_custkey", "o_orderkey")


@register(
    "j3_right_outer",
    "SELECT c_custkey, o_orderkey FROM orders RIGHT JOIN customer ON o_custkey = c_custkey",
)
def j3_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select("c_custkey", "o_orderkey")


@register(
    "j3_full_outer",
    """
    SELECT c_custkey, c_nationkey, s_suppkey, s_nationkey
    FROM customer FULL JOIN supplier ON c_nationkey = s_nationkey
    """,
)
def j3_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        "c_custkey", "c_nationkey", "s_suppkey", "s_nationkey"
    )


@register(
    "j3_left_semi",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j3_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@register("j3_cross", "SELECT r_name, n_name FROM region CROSS JOIN nation")
def j3_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "j3_broadcast_dim",
    """
    SELECT n_name, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j3_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of a dimension table: the fact side
    never shuffles for the join (tests assert BroadcastHashJoin in the
    plan)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
    )


# ---------------------------------------------------------------------------
# A — aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "a1_groupby_count_sort",
    """
    SELECT p_brand, COUNT(*) AS count FROM part
    GROUP BY p_brand ORDER BY count DESC, p_brand
    """,
)
def a1_groupby_count_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (reference: notebooks/00_prepare_data.py:114, notebooks/01:149-152)."""
    return (
        t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .count()
        .orderBy(F.col("count").desc(), F.col("p_brand"))
    )


@register(
    "a2_groupby_avg",
    """
    SELECT c_mktsegment, ROUND(AVG(c_acctbal), 4) AS avg_acctbal
    FROM customer GROUP BY c_mktsegment ORDER BY avg_acctbal DESC
    """,
)
def a2_groupby_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (reference: notebooks/01:163-166 groupBy avg price + sort)."""
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"))
        .orderBy(F.col("avg_acctbal").desc())
    )


@register(
    "a3_count_star_alias",
    "SELECT event_type, COUNT(*) AS count FROM events GROUP BY event_type",
)
def a3_count_star_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (reference: notebooks/02_feature_engineering.py:140-143)."""
    return t(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("count"))


@register(
    "a4_global_multiagg",
    """
    SELECT ROUND(AVG(l_quantity), 4) AS qty_mean,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS qty_std,
           MIN(l_quantity) AS qty_min,
           MAX(l_quantity) AS qty_max,
           ROUND(AVG(l_extendedprice), 4) AS price_mean,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS price_std,
           MIN(l_extendedprice) AS price_min,
           MAX(l_extendedprice) AS price_max,
           ROUND(AVG(l_discount), 6) AS disc_mean,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def a4_global_multiagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: all summary stats in ONE pass (reference computed 4×11
    aggregates in one select, notebooks/01:125-130 — kept; never one job
    per column)."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.avg("l_quantity"), 4).alias("qty_mean"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_std"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
        F.round(F.avg("l_extendedprice"), 4).alias("price_mean"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_std"),
        F.min("l_extendedprice").alias("price_min"),
        F.max("l_extendedprice").alias("price_max"),
        F.round(F.avg("l_discount"), 6).alias("disc_mean"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "a5_summary_profile",
    """
    SELECT COUNT(o_totalprice) AS count,
           ROUND(AVG(o_totalprice), 4) AS mean,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS stddev,
           MIN(o_totalprice) AS min,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS median,
           MAX(o_totalprice) AS max
    FROM orders
    """,
)
def a5_summary_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: summary() profile semantics with an EXACT interpolated median
    (both engines use linear interpolation) (reference:
    notebooks/00:111, src/features/target_transformer.py:34,43)."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count("o_totalprice").alias("count"),
        F.round(F.avg("o_totalprice"), 4).alias("mean"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("stddev"),
        F.min("o_totalprice").alias("min"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median"),
        F.max("o_totalprice").alias("max"),
    )


@register(
    "a6_approx_quantile",
    """
    SELECT quantile_disc(l_quantity, 0.01) AS qty_q01,
           quantile_disc(l_quantity, 0.5) AS qty_q50,
           quantile_disc(l_quantity, 0.99) AS qty_q99,
           quantile_disc(l_extendedprice, 0.01) AS price_q01,
           quantile_disc(l_extendedprice, 0.5) AS price_q50,
           quantile_disc(l_extendedprice, 0.99) AS price_q99,
           quantile_disc(l_discount, 0.01) AS disc_q01,
           quantile_disc(l_discount, 0.5) AS disc_q50,
           quantile_disc(l_discount, 0.99) AS disc_q99
    FROM lineitem
    """,
)
def a6_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: Greenwald-Khanna approximate quantiles, ONE call for all
    columns (the reference runs 11 sequential per-column jobs,
    src/features/feature_engineering.py:217-220 — a driver-loop
    anti-pattern at scale). Output is flattened to scalar columns —
    array-typed result columns break order-insensitive comparison
    (pandas cannot sort list cells).

    Oracle-checkable because GK with accuracy > n has rank error < 1
    row, i.e. it returns the exact discrete quantile element, which is
    DuckDB's quantile_disc (verified identical at sf0.001/sf0.01). In
    production the accuracy knob IS the approximation: the default 1e4
    bounds sketch memory to O(accuracy·log n) regardless of data size —
    that sketch path is what a9_approx_count_distinct/a22_count_min
    cover for cardinality/frequency."""
    li = t(spark, sf_dir, "lineitem")
    exact_gk = 10_000_000  # > any driver SF's row count -> exact element
    agged = li.agg(
        F.percentile_approx("l_quantity", [0.01, 0.5, 0.99], exact_gk).alias("qty_q"),
        F.percentile_approx("l_extendedprice", [0.01, 0.5, 0.99], exact_gk).alias("price_q"),
        F.percentile_approx("l_discount", [0.01, 0.5, 0.99], exact_gk).alias("disc_q"),
    )
    return agged.select(
        F.col("qty_q")[0].alias("qty_q01"),
        F.col("qty_q")[1].alias("qty_q50"),
        F.col("qty_q")[2].alias("qty_q99"),
        F.col("price_q")[0].alias("price_q01"),
        F.col("price_q")[1].alias("price_q50"),
        F.col("price_q")[2].alias("price_q99"),
        F.col("disc_q")[0].alias("disc_q01"),
        F.col("disc_q")[1].alias("disc_q50"),
        F.col("disc_q")[2].alias("disc_q99"),
    )


@register("a7_count_scalar", "SELECT COUNT(*) AS n_rows FROM lineitem")
def a7_count_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (reference: count() scalars everywhere, e.g. notebooks/00:94)."""
    return t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "a8_corr_distributed",
    """
    SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(CORR(l_extendedprice, l_discount), 6) AS corr_price_disc
    FROM lineitem
    """,
)
def a8_corr_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: DISTRIBUTED Pearson correlation — the reference collects to
    pandas first (notebooks/01:253-254), a driver OOM at scale."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("corr_price_disc"),
    )


@register(
    "a9_count_distinct",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem
    """,
)
def a9_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: exact distinct counts (expand+two-phase agg under AQE)."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
    )


@register(
    "a9_approx_count_distinct",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_within_10pct,
           TRUE AS orders_within_10pct
    FROM lineitem
    """,
)
def a9_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9b: HyperLogLog++ cardinality. At 100 TB the sketch alone is
    the query (no exact shuffle of distinct values); here the exact
    counts ride along so the driver can hash-compare something
    deterministic — the HLL estimate itself is engine-specific, so it
    is reported as a WITHIN-10%-of-exact boolean (the oracle states
    TRUE; a drifting sketch flips it and fails the hash)."""
    li = t(spark, sf_dir, "lineitem")
    # rsd 3% (vs the 5% default): the 10%-of-exact gate then sits at
    # >3 standard errors while the sketch stays in the cheap register
    # regime (rsd <= 0.02 switches to a dense high-precision layout
    # that costs 3x the wall time for accuracy the gate doesn't need)
    agg = li.agg(
        F.approx_count_distinct("l_partkey", 0.03).alias("ap"),
        F.approx_count_distinct("l_orderkey", 0.03).alias("ao"),
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.count_distinct("l_orderkey").cast("bigint").alias("exact_orders"),
    )

    def ok(approx: str, exact: str):
        return F.abs(F.col(approx) - F.col(exact)) <= F.greatest(
            F.lit(2), F.col(exact).cast("double") * 0.10
        )

    return agg.select(
        "exact_parts",
        "exact_orders",
        ok("ap", "exact_parts").alias("parts_within_10pct"),
        ok("ao", "exact_orders").alias("orders_within_10pct"),
    )


@register(
    "a10_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def a10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: rollup grouping sets (SURVEY §2.4 commitment)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "a10_cube",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def a10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"), F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# W — window functions (SURVEY §2.5; none executed in the reference —
# percent_rank imported-unused at src/features/feature_engineering.py:6)
# ---------------------------------------------------------------------------


@register(
    "w1_ranking",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER()   OVER w AS BIGINT) AS rn,
           CAST(RANK()         OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK()   OVER w AS BIGINT) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rnk,
           CAST(NTILE(4)       OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "w2_lag_lead",
    """
    SELECT user_id, event_id,
           LAG(value, 1)  OVER w AS prev_value,
           LEAD(value, 1) OVER w AS next_value,
           FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_value,
           LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("value").over(wfull).alias("first_value"),
        F.last("value").over(wfull).alias("last_value"),
    )


@register(
    "w3_frame_aggregates",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
           ROUND(AVG(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_extendedprice
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_price
    FROM lineitem
    """,
)
def w3_frame_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (l_orderkey, l_linenumber) is NOT unique in the testdata — the
    # frame order tiebreaks on the aggregated columns so the running
    # values are deterministic across engines.
    order = [F.col("l_linenumber"), F.col("l_quantity"), F.col("l_extendedprice")]
    wrun = Window.partitionBy("l_orderkey").orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmov = Window.partitionBy("l_orderkey").orderBy(*order).rowsBetween(-2, Window.currentRow)
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(wrun), 2).alias("running_qty"),
        F.round(F.avg("l_extendedprice").over(wmov), 4).alias("moving_avg_price"),
    )


# ---------------------------------------------------------------------------
# O — sorts / limits / top-k (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "o1_global_sort_desc",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey",
)
def o1_global_sort_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: range-partitioned distributed sort (reference:
    notebooks/00:114, notebooks/01:151,165)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


@register(
    "o2_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
    """,
)
def o2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    heap + driver merge of k rows, never a full sort). Total order via
    unique tiebreakers so the k rows are deterministic."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@register(
    "o3_distributed_topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal FROM customer
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) <= 3
    """,
)
def o3_distributed_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: distributed replacement for the reference's driver-side pandas
    sort (notebooks/01:89) — top-3 per group via a ranking window."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# SET — set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    """
    SELECT o_orderkey, 'big' AS src FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey", F.lit("big").alias("src"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", F.lit("urgent").alias("src"))
    return big.union(urgent)


@register(
    "set_union_by_name",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName resolves by column name, not position — the two inputs
    here have swapped column order."""
    o = t(spark, sf_dir, "orders")
    a = o.select("o_orderkey", "o_totalprice")
    b = o.select("o_totalprice", "o_orderkey")
    return a.unionByName(b)


@register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.intersect(o_cust)


@register(
    "set_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)  # EXCEPT DISTINCT semantics, matching SQL EXCEPT


@register(
    "set_drop_duplicates",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def set_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").dropDuplicates()


@register(
    "a11_pivot",
    """
    SELECT n_name,
           CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1996 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y1996_cents,
           CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1997 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y1997_cents,
           CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1998 THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y1998_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE YEAR(o_orderdate) BETWEEN 1996 AND 1998
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def a11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: groupBy().pivot() — wide reshaping. The pivot values are
    pinned explicitly (without them Spark runs an extra distinct job to
    discover columns — never do that at 100 TB). Sums are integer cents
    so the oracle's conditional-aggregation formulation is bit-exact."""
    o = t(spark, sf_dir, "orders").filter(F.year("o_orderdate").between(1996, 1998))
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("yr"), cents.alias("cents"))
    )
    pivoted = (
        base.groupBy("n_name")
        .pivot("yr", [1996, 1997, 1998])
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("c"))
    )
    return pivoted.select(
        "n_name",
        F.coalesce(F.col("1996"), F.lit(0)).alias("y1996_cents"),
        F.coalesce(F.col("1997"), F.lit(0)).alias("y1997_cents"),
        F.coalesce(F.col("1998"), F.lit(0)).alias("y1998_cents"),
    ).orderBy("n_name")


@register(
    "f11_pandas_udaf_weighted_avg",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def f11_pandas_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: custom aggregate via a GROUPED_AGG pandas_udf (Arrow-batched
    UDAF) — quantity-weighted mean price per return flag. The vectorized
    numpy body runs once per group partition; Spark handles the shuffle.
    This is the UDAF escape hatch pattern; the oracle states the same
    aggregate in SQL. (Ratio-of-sums is division-last, so the 4-decimal
    round is stable across engines.)"""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses `from __future__
    # import annotations`, which stringifies signature annotations and
    # breaks pandas_udf's type inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def weighted_avg(price, qty):
        return float((price * qty).sum() / qty.sum())

    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias("weighted_avg_price"))
        .orderBy("l_returnflag")
    )


@register(
    "a12_grouping_sets",
    """
    SELECT n_name, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderstatus), (n_name, o_orderstatus))
    ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST
    """,
)
def a12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: GROUPING SETS — the third member of the cube/rollup family,
    with explicit set selection (computes only the requested grouping
    combinations in one Expand + one shuffle, where chained unions would
    re-scan per set)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "o_orderstatus", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    )
    joined.createOrReplaceTempView("_gs_orders")
    return joined.sparkSession.sql(
        """
        SELECT n_name, o_orderstatus,
               COUNT(*) AS n_orders,
               SUM(cents) AS total_cents
        FROM _gs_orders
        GROUP BY GROUPING SETS ((n_name), (o_orderstatus), (n_name, o_orderstatus))
        ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST
        """
    )


# --- J15: point-in-polygon spatial join (exact integer ray casting) ----------

_PIP_POLYGONS = [
    # pid, vertex list (integer grid 0..999); one convex, one concave L
    (0, [(100, 100), (600, 150), (650, 550), (150, 500)]),
    (1, [(500, 500), (950, 500), (950, 950), (700, 950), (700, 700), (500, 700)]),
]


def _pip_edges_sql() -> str:
    rows = []
    for pid, verts in _PIP_POLYGONS:
        n = len(verts)
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % n]
            rows.append(f"({pid}, {x1}, {y1}, {x2}, {y2})")
    return f"(VALUES {', '.join(rows)}) AS e(pid, x1, y1, x2, y2)"


@register(
    "j15_point_in_polygon",
    f"""
    WITH pts AS (
        SELECT c_custkey AS pk,
               (c_custkey * 7919) % 1000 AS px,
               (c_custkey * 104729) % 1000 AS py
        FROM customer
    ),
    crossings AS (
        SELECT p.pk, e.pid,
               SUM(CASE WHEN (e.y1 > p.py) <> (e.y2 > p.py)
                         AND (CASE WHEN e.y2 - e.y1 > 0
                                   THEN (p.px - e.x1) * (e.y2 - e.y1)
                                        < (e.x2 - e.x1) * (p.py - e.y1)
                                   ELSE (p.px - e.x1) * (e.y2 - e.y1)
                                        > (e.x2 - e.x1) * (p.py - e.y1) END)
                        THEN 1 ELSE 0 END) AS n_cross
        FROM pts p JOIN {_pip_edges_sql()} ON TRUE
        GROUP BY p.pk, e.pid
    )
    SELECT CAST(pid AS BIGINT) AS pid,
           CAST(SUM(CASE WHEN n_cross % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inside,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MIN(CASE WHEN n_cross % 2 = 1 THEN pk END) AS BIGINT)
             AS first_inside_key
    FROM crossings GROUP BY pid ORDER BY pid
    """,
)
def j15_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15: point-in-polygon containment join — the geofencing /
    region-assignment primitive beyond j6's grid join, via the
    even-odd ray-casting rule done in EXACT integer arithmetic: the
    usual slope division is replaced by a cross-multiplied comparison
    whose direction flips with sign(dy), so no float ever enters and
    both engines count identical crossings (boundary-degenerate cases
    land deterministically on the same side). Points are a key-derived
    integer grid; polygons (one convex quad, one concave hexagon — the
    concave case is why even-odd counting is needed at all) fan out as
    a constant 10-edge broadcast. At 100 TB you'd prefilter with j6's
    grid cells (bbox -> candidate polygons) and run exactly this exact
    test on the survivors; this query IS that verification stage."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("pk"),
        ((F.col("c_custkey") * 7919) % 1000).alias("px"),
        ((F.col("c_custkey") * 104729) % 1000).alias("py"),
    )
    idx = (F.col("id") + 1).cast("int")
    flat = []
    for pid, verts in _PIP_POLYGONS:
        n = len(verts)
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % n]
            flat.append((pid, x1, y1, x2, y2))
    edges = spark.range(len(flat)).select(
        *[
            F.element_at(F.array(*[F.lit(r[j]) for r in flat]), idx).alias(nm)
            for j, nm in enumerate(("pid", "x1", "y1", "x2", "y2"))
        ]
    )
    lhs = (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    rhs = (F.col("x2") - F.col("x1")) * (F.col("py") - F.col("y1"))
    crossing = (
        ((F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py")))
        & F.when(F.col("y2") - F.col("y1") > 0, lhs < rhs).otherwise(lhs > rhs)
    )
    crossings = (
        pts.crossJoin(F.broadcast(edges))
        .groupBy("pk", "pid")
        .agg(F.sum(F.when(crossing, 1).otherwise(0)).alias("n_cross"))
    )
    return (
        crossings.groupBy("pid")
        .agg(
            F.sum(F.when(F.col("n_cross") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_inside"),
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.min(F.when(F.col("n_cross") % 2 == 1, F.col("pk")))
            .cast("bigint")
            .alias("first_inside_key"),
        )
        .select(F.col("pid").cast("bigint").alias("pid"), "n_inside", "n_points", "first_inside_key")
        .orderBy("pid")
    )


# --- J16: maximum concurrent intervals (delta-encoded stabbing) ---------------


@register(
    "j16_max_concurrent_intervals",
    """
    WITH iv AS (
        SELECT user_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + 1800 * 1000000 AS e
        FROM events
    ),
    deltas AS (
        SELECT user_id, s AS t, 1 AS d, 0 AS tie FROM iv
        UNION ALL
        SELECT user_id, e AS t, -1 AS d, 1 AS tie FROM iv
    ),
    runs AS (
        SELECT user_id,
               SUM(d) OVER (PARTITION BY user_id ORDER BY t, tie, d
                            ROWS UNBOUNDED PRECEDING) AS conc
        FROM deltas
    )
    SELECT user_id,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent,
           CAST(COUNT(*) // 2 AS BIGINT) AS n_intervals
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
)
def j16_max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16: maximum interval concurrency (the stabbing-depth /
    room-booking classic) via DELTA ENCODING — each 30-minute activity
    interval contributes a +1 at its start and a -1 at its end, and
    peak concurrency is the max running sum over the ordered deltas.
    This shape replaces the quadratic interval-overlap self-join
    (j9's job) when only DEPTH is needed: 2n rows, one partitioned
    window, no join at all. Ends sort AFTER coincident starts (tie
    key) so a touching pair counts as overlapping — stated, and
    identical on both engines via exact integer epoch-micros. Scale:
    per-user windows (parallelism = users); a global concurrency
    profile would use the two-phase prefix-sum ledger instead."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 1800 * 1_000_000).alias("e"),
    )
    deltas = iv.select(
        "user_id", F.col("s").alias("t"), F.lit(1).alias("d"), F.lit(0).alias("tie")
    ).unionByName(
        iv.select(
            "user_id", F.col("e").alias("t"), F.lit(-1).alias("d"), F.lit(1).alias("tie")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tie", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = deltas.select("user_id", F.sum("d").over(w).alias("conc"))
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("conc").cast("bigint").alias("max_concurrent"),
            F.expr("CAST(count(*) DIV 2 AS BIGINT)").alias("n_intervals"),
        )
        .orderBy("user_id")
    )
