"""Second-wave relational coverage: extra source/sink formats (ORC,
JSON lines) and operator shapes the first wave didn't register —
unpivot/melt, multi-distinct-count aggregation (Expand), and the
null-safe equi-join.

Same rules as queries_core.py: sinks round-trip through a temp dir and
the oracle checks the logical content; every computed column is
aliased identically on both sides; counts cast to BIGINT.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realestate_engine.registry import register, t


@register("s10_orc_roundtrip", "SELECT n_nationkey, n_name, n_regionkey FROM nation")
def s10_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: ORC sink + scan — Spark's second columnar format, same
    predicate-pushdown/column-pruning machinery as parquet. The ORC
    footer preserves exact types so no explicit read schema is needed."""
    out = tempfile.mkdtemp(prefix="re_s10_orc_")
    t(spark, sf_dir, "nation").write.mode("overwrite").orc(out)
    return spark.read.orc(out).select("n_nationkey", "n_name", "n_regionkey")


@register("s11_json_roundtrip", "SELECT s_suppkey, s_name, s_nationkey FROM supplier")
def s11_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: JSON-lines sink + explicit-schema scan (schema-on-read:
    inference would double-scan and widen ints — an explicit schema is
    the scale path for JSON sources)."""
    out = tempfile.mkdtemp(prefix="re_s11_json_")
    t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey").write.mode(
        "overwrite"
    ).json(out)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
        ]
    )
    return spark.read.schema(schema).json(out)


@register(
    "a12_unpivot_part_metrics",
    """
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    ORDER BY p_partkey, metric
    """,
)
def a12_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: unpivot/melt — wide part metrics to long (metric, value)
    rows, the shape feature stores and long-format training tables
    want. Spark's native unpivot is a zero-shuffle row expansion; the
    oracle states the same semantics as a UNION ALL."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("p_partkey", "metric")


@register(
    "a13_multi_distinct",
    """
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT DATE_TRUNC('day', o_orderdate)) AS BIGINT) AS n_order_days,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def a13_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: several DISTINCT aggregates over different columns in one
    pass — planned via Expand (each input row fans out per distinct
    group), one shuffle, no self-joins. The naive alternative (N
    separate distinct queries + join) scans the fact table N times."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct(F.date_trunc("day", "o_orderdate")).alias("n_order_days"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "j4_null_safe_join",
    """
    WITH keyed AS (
        SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_key FROM orders
    ),
    dim(status_key, label) AS (
        VALUES ('F', 'finished'), ('P', 'partial'), (NULL, 'open')
    )
    SELECT o_orderkey, d.label
    FROM keyed k JOIN dim d ON k.status_key IS NOT DISTINCT FROM d.status_key
    ORDER BY o_orderkey
    """,
)
def j4_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match NULL dim rows instead of dropping out — the dimension-decode
    pattern where 'unknown' is itself a category. eqNullSafe keeps the
    join a broadcast hash join (null-safe equality is still an
    equi-key), not a nested loop."""
    keyed = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_key")
    )
    dim = spark.createDataFrame(
        [("F", "finished"), ("P", "partial"), (None, "open")],
        T.StructType(
            [
                T.StructField("status_key", T.StringType(), True),
                T.StructField("label", T.StringType(), True),
            ]
        ),
    )
    return (
        keyed.join(F.broadcast(dim), keyed.status_key.eqNullSafe(dim.status_key))
        .select("o_orderkey", "label")
        .orderBy("o_orderkey")
    )
