"""Central query registry feeding the driver contract.

Every operator the engine implements is registered here as a named
query (a ``(spark, sf_dir) -> DataFrame`` callable) optionally paired
with an ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. The driver compares row-count + schema + order-insensitive
value-hash, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded identically on both sides (double
  summation order differs between engines);
- integer-valued computed columns are cast to BIGINT on both sides
  (DuckDB widens integer SUMs to HUGEINT, Spark to LONG).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``sql`` is the DuckDB oracle (omit for
    non-SQL-expressible operators → driver does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def stable_tmp(name: str) -> str:
    """Stable per-query scratch directory (not mkdtemp): repeated
    bench/correctness runs overwrite ONE directory instead of
    accumulating temp dirs, and the identical path keeps any cached
    scan's canonicalized plan shared across runs. Safe because every
    sink that round-trips through it writes mode('overwrite')."""
    import os
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"re_{name}")
    os.makedirs(out, exist_ok=True)
    return out


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table.

    The events table's ts column has varied across driver testdata
    generations: parquet TIMESTAMP(NANOS) (unmappable natively — read
    as long nanos via legacy.parquet.nanosAsLong and convert, no
    precision loss at the data's µs resolution) or TIMESTAMP(MICROS)
    with isAdjustedToUTC=false (read as TIMESTAMP_NTZ, which Spark 4
    rejects in unix_micros/window functions). Normalize both to plain
    TimestampType here; the session timezone is pinned UTC so the
    NTZ→TZ cast preserves wall-clock values and matches DuckDB's naive
    read of the same file.
    """
    from pyspark.sql import functions as F

    # The driver supplies its own SparkSession; pin the timezone so
    # timestamp-derived values (year/date_trunc/window) match the
    # DuckDB oracle regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import realestate_engine.queries_core  # noqa: F401
    import realestate_engine.queries_functions  # noqa: F401
    import realestate_engine.queries_tpch2  # noqa: F401
    import realestate_engine.queries_ml  # noqa: F401
    import realestate_engine.dedup  # noqa: F401
    import realestate_engine.similarity  # noqa: F401
    import realestate_engine.text  # noqa: F401
    import realestate_engine.streaming  # noqa: F401
    import realestate_engine.temporal  # noqa: F401
    import realestate_engine.multimodal  # noqa: F401
    import realestate_engine.timeseries  # noqa: F401
    import realestate_engine.packing  # noqa: F401
    import realestate_engine.queries_extra  # noqa: F401
    import realestate_engine.queries_extra2  # noqa: F401
    import realestate_engine.graph  # noqa: F401
    import realestate_engine.ordered  # noqa: F401
