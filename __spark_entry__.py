"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the ``realestate_engine`` package; this module is
only the adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realestate_engine import registry
from realestate_engine.queries_core import flagship_revenue_by_nation

registry.load_all()

# The first entries of queries() are the driver's 50-query correctness
# window. The driver caps CORRECTNESS_r{N}.json at 50 entries, so the
# window ROTATES each round to accumulate driver-verified coverage:
# round 3 verified the per-family representatives (all green, see
# CORRECTNESS_r03.json); round 4 leads with the queries whose oracles
# or plans are NEW this round (minhash/simhash/LSH-ANN/packing/aHash/
# scene-cut upgraded from rows-only to full oracles; dq8/m23 and the
# tiny-frame windows rebuilt on prefix sums; the brand-new k-core,
# containment, temperature-mixture, leakage-safe-split, stream-stream
# join, foreachBatch-upsert and referential-integrity operators) and
# fills the rest with oracle-checked queries no driver round has seen
# yet — 48 of 50 entries are new vs r03. The remaining queries follow
# in registration order. TPC-H q2/q8/q13/q15/q17/q22 and x11 rotate
# into round 5's window (all green in the local full sweep).
_WINDOW = [
    "flagship_revenue_by_nation",
    # upgraded rows-only -> full oracle this round (portable hash family)
    "dedup_minhash_lsh", "dedup_minhash_incremental", "dedup_simhash",
    "sim_lsh_ann",
    # plans rebuilt this round (no single-partition windows anywhere)
    "dq8_id_gap_islands", "m23_roc_auc_ranksum", "x20_cdc_apply",
    "f16_mom_growth", "a33_runs_test", "ts_cusum_changepoints",
    "p14_dense_reid", "s22_csv_malformed_modes", "dedup_clusters_twostar",
    "corpus_token_budget", "x18_systematic_pps_sample",
    # never driver-verified: TPC-H core
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue", "tpch_q7_nation_volume",
    "tpch_q9_product_profit", "tpch_q18_large_orders",
    "tpch_q21_waiting_supplier",
    # upgraded rows-only -> full oracle / brand-new this round
    "pack_documents_greedy", "mm_ahash_neardup", "mm_scene_cut",
    "st_stateful_running_totals", "s24_bucketed_join_no_shuffle",
    "graph_kcore", "dedup_containment", "corpus_temperature_mixture",
    "dedup_leakage_safe_split", "st_stream_stream_join",
    "st_foreachbatch_upsert_sink", "dq9_referential_integrity",
    # never driver-verified: dedup / text / similarity north-star
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "dedup_clusters",
    "text_token_count", "text_quality_score", "text_langid",
    "text_contamination_ngrams", "corpus_clean_pipeline",
    # never driver-verified: streaming / temporal / graph / windows
    "st_sliding_window", "st_session_window", "st_watermark_dedup",
    "range_join_clicks_before_purchase", "graph_pagerank_trade",
    "graph_triangle_count", "scd2_intervals",
]


def _ordered() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {name: registry.QUERIES[name] for name in _WINDOW}
    out.update((n, f) for n, f in registry.QUERIES.items() if n not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    ordered = _ordered()
    return {n: registry.ORACLES[n] for n in ordered if n in registry.ORACLES}
