"""SparkSession factory with scale-safe defaults.

Re-derives the configuration surface of the reference's session factory
(reference: src/utils/spark_utils.py:26-47 — AQE + coalescing + skew
join, columnar cache, Arrow transfer, 100MB broadcast threshold) without
its hardcoded single-machine sizing (25g driver heap, 10 cores,
shuffle.partitions=40): at 100 TB those must come from the cluster
manager / AQE, not from code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for correctness + portability. Sizing knobs
# (executor memory/cores, shuffle partitions) are intentionally NOT
# pinned here beyond a local-mode fallback: on a real cluster they are
# provided by spark-submit, and AQE coalesces shuffle partitions at
# runtime regardless of the initial number.
_BASE_CONF = {
    # Adaptive execution: runtime re-plan, partition coalescing, skew
    # join splitting (reference: src/utils/spark_utils.py:31-34).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.localShuffleReader.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast threshold: dims (region/nation/customer at small SF)
    # broadcast for shuffle-free joins (reference: spark_utils.py:41).
    "spark.sql.autoBroadcastJoinThreshold": str(100 * 1024 * 1024),
    # Columnar compressed in-memory cache (reference: spark_utils.py:35-36).
    "spark.sql.inMemoryColumnarStorage.compressed": "true",
    "spark.sql.inMemoryColumnarStorage.batchSize": "10000",
    # Arrow for the Python<->JVM data plane (toPandas/createDataFrame,
    # pandas UDFs) (reference: spark_utils.py:43).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python UDTFs also ride Arrow (default is pickled row batches).
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    # Deterministic timestamp semantics for the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: vectorized reader + pushdown are on by default;
    # keep rebase modes deterministic.
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.datetimeRebaseModeInWrite": "CORRECTED",
}


def create_session(
    app_name: str = "realestate_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's config surface.

    In local mode defaults to ``local[$SPARK_GRAFT_CPUS or *]`` and a
    shuffle-partition count matched to local cores; on a cluster, pass
    ``master=None`` with externally-managed sizing.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(_BASE_CONF)
    if master and master.startswith("local"):
        # Spark's 1g default driver heap is the whole JVM in local mode;
        # a long session (hundreds of queries, cached shingle/edge
        # relations, accumulated broadcasts) exhausts it and then even a
        # 16k-row broadcast build fails ("Not enough memory to build and
        # broadcast"). Size the local JVM like the single machine it is.
        # Only effective at JVM creation — getOrCreate on a live session
        # keeps its existing heap.
        conf.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus and cpus.isdigit():
            shuffle_partitions = int(cpus)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    else:
        # UNSIZED session (no explicit width, no SPARK_GRAFT_CPUS):
        # shuffle.partitions stays Spark's static 200, so every cached
        # relation's build shuffle runs 200 tasks regardless of data
        # volume — AQE skips InMemoryRelation internals by default
        # (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning =
        # false). Let AQE re-plan inside cache builds ONLY here.
        # Measured at sf0.1 on the cache-heavy graph/dedup set, 3 runs
        # per setting: 200 partitions, flag off 59.8/66.0/71.5s vs on
        # 58.9/42.3/42.9s (~27% mean; graph_modularity 24.7->7.6s,
        # label-prop 12.3->5.0s). In SIZED sessions the flag is left at
        # the default: with partitions = cores a cache build is one
        # task wave and AQE can only UNDER-coalesce it (measured bench
        # pairs at 32 partitions: off 15.6/17.4s vs on 16.7/22.5s), and
        # a cached plan's re-planned output partitioning can force an
        # extra shuffle on consumers that expected the static layout —
        # the reason Spark defaults it off.
        conf.setdefault(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
