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


_STABLE_ROOT: str | None = None


def _stable_root() -> str:
    """Session-private root for all scratch dirs: namespaced by user +
    repo checkout + PID (mode 0o700, ownership-checked, rmtree'd at
    exit). Concurrent processes — pytest alongside check_oracle, the
    driver alongside bench — get disjoint roots, so streaming
    checkpoints and sink round-trips can't clobber each other's state
    stores, and another user on a shared host can't pre-seed a
    predictable /tmp path that we'd read back as query results."""
    global _STABLE_ROOT
    if _STABLE_ROOT is None:
        import atexit
        import getpass
        import hashlib
        import os
        import shutil
        import tempfile

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tag = hashlib.md5(repo.encode()).hexdigest()[:8]
        root = os.path.join(
            tempfile.gettempdir(),
            f"re_{getpass.getuser()}_{tag}_{os.getpid()}",
        )
        os.makedirs(root, mode=0o700, exist_ok=True)
        st = os.stat(root)
        if hasattr(os, "getuid") and st.st_uid != os.getuid():
            raise RuntimeError(f"scratch root {root} not owned by this user")
        os.chmod(root, 0o700)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _STABLE_ROOT = root
    return _STABLE_ROOT


def stable_tmp(name: str) -> str:
    """Stable per-query scratch directory (not mkdtemp): within one
    process, repeated bench/correctness runs overwrite ONE directory
    instead of accumulating temp dirs, and the identical path keeps any
    cached scan's canonicalized plan shared across runs. Safe because
    every sink that round-trips through it writes mode('overwrite'),
    and the per-process root (see _stable_root) isolates concurrent
    sessions."""
    import os

    out = os.path.join(_stable_root(), f"re_{name}")
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
    import realestate_engine.tokenizers  # noqa: F401
    import realestate_engine.streaming  # noqa: F401
    import realestate_engine.temporal  # noqa: F401
    import realestate_engine.multimodal  # noqa: F401
    import realestate_engine.queries_media_probes  # noqa: F401
    import realestate_engine.timeseries  # noqa: F401
    import realestate_engine.packing  # noqa: F401
    import realestate_engine.queries_extra  # noqa: F401
    import realestate_engine.queries_extra2  # noqa: F401
    import realestate_engine.queries_extra3  # noqa: F401
    import realestate_engine.queries_extra4  # noqa: F401
    import realestate_engine.queries_extra5  # noqa: F401
    import realestate_engine.queries_sources_sql  # noqa: F401
    import realestate_engine.queries_experiments  # noqa: F401
    import realestate_engine.queries_quality  # noqa: F401
    import realestate_engine.queries_mleval  # noqa: F401
    import realestate_engine.queries_calibration  # noqa: F401
    import realestate_engine.queries_preference  # noqa: F401
    import realestate_engine.queries_lakehouse  # noqa: F401
    import realestate_engine.graph  # noqa: F401
    import realestate_engine.graph2  # noqa: F401
    import realestate_engine.ordered  # noqa: F401
