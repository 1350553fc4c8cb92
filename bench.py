"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ..., "duckdb": {...}, "duckdb_total": ...}.

Each query executes end-to-end via the noop sink (full computation, no
driver collect). First a warmup query amortizes JVM/session startup so
the numbers measure the plans, not the JIT.

The "duckdb" block is the external denominator the round-over-round
numbers lack: the same headline queries' ORACLE SQL timed on DuckDB
(all cores, same parquet files, fetchall-materialized) — an
engine-vs-engine single-node comparison for the "within 2× of a native
engine" gate. Queries without an oracle (pandas-UDF custom op) are
absent from the block.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_revenue_by_nation",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "w1_ranking",
    "dedup_keep_newest",
    "dedup_minhash_lsh",
    "sim_bruteforce_topk",
    "text_tfidf_top_term",
    "st_tumbling_window",
    "m11_regression_metrics_sql",
    "a4_global_multiagg",
    "asof_last_click_before_purchase",
    "range_join_clicks_before_purchase",
    "custom_running_total_pandas",
    "tpch_q7_nation_volume",
    "tpch_q18_large_orders",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_supplier",
    "graph_pagerank_trade",
    "j6_spatial_grid_join",
    "text_contamination_ngrams",
    "corpus_clean_pipeline",
    "x11_point_in_time_features",
    "a23_equidepth_histogram",
    "text_sparse_dot_pairs",
]


def _loadavg() -> list[float] | None:
    """1/5/15-min load averages, so a bench JSON recorded on a
    contended box carries its own discount factor (the r4 record was
    +40% purely from machine load)."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    # warn-and-retry on a busy machine: r5's first six queries regressed
    # 17-26% purely because the run started at loadavg 6 — wait out
    # transient contention (up to 2×30s) rather than record noise; if
    # the box stays busy, proceed but mark the run contended so
    # round-over-round comparison can discount it.
    quiet = int(cpus) / 4
    waits = 0
    while (la := _loadavg()) and la[0] > quiet and waits < 2:
        print(
            f"bench: loadavg {la[0]} > {quiet:.0f} (cpus/4) — waiting 30s "
            f"({waits + 1}/2) for a quiet machine",
            file=sys.stderr,
        )
        time.sleep(30)
        waits += 1
    loadavg_start = _loadavg()
    contended = bool(loadavg_start) and loadavg_start[0] > quiet

    from realestate_engine.registry import QUERIES, load_all
    from realestate_engine.session import create_session

    load_all()
    spark = create_session(
        "realestate_engine_bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: run every headline query once at sf0.001 — compiles the
    # same whole-stage-codegen units and spins up Python workers, so the
    # timed sf0.1 runs measure the plans, not JVM/JIT startup
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    # spin up the full Python worker pool (sf0.001 warmup runs coalesce
    # to few partitions and leave most workers unspawned)
    from pyspark.sql import functions as F

    (
        spark.range(0, 10_000, 1, int(cpus))
        .withColumn("g", F.col("id") % int(cpus))
        .groupBy("g")
        .applyInPandas(lambda p: p[["g"]].head(1), "g long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # best-of-3: single-shot timings swing ±2× on Python-worker and GC
    # state (the first sf0.1 run of a plan is routinely 1.5-2x its
    # steady state); the minimum reflects the plan's steady-state cost
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # DuckDB denominator: time each headline query's oracle SQL on the
    # same parquet files (views over read_parquet; default = all cores)
    import duckdb

    from realestate_engine.registry import ORACLES

    con = duckdb.connect()
    for tbl in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    duck: dict[str, float] = {}
    for name in HEADLINE:
        sql = ORACLES.get(name)
        if sql is None:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            best = min(best, time.time() - t0)
        duck[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "loadavg_start": loadavg_start,
                "loadavg_end": _loadavg(),
                "contended_start": contended,
                "contention_waits": waits,
                "duckdb": duck,
                "duckdb_total": round(sum(duck.values()), 3),
                # keep the comparison honest in BOTH directions: the
                # pagerank oracle is an unrolled recursive closure (a
                # correctness spec, not a tuned implementation), so the
                # total is also reported without it; conversely Spark's
                # ~0.3-0.5s per-query scheduling floor dominates at
                # sf0.1 and amortizes away at real scale.
                "duckdb_total_ex_pagerank": round(
                    sum(v for k, v in duck.items() if k != "graph_pagerank_trade"), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
