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
# window ROTATES each round to accumulate driver-verified coverage
# (rounds 2-4 verified 114 distinct queries — see COVERAGE.md's
# driver-window ledger). Round 5 leads with the queries whose plans or
# result columns CHANGED this round (the three de-funneled windows
# m11/q11/q15; containment + RRF moved to FLOOR-scaled micro columns;
# dq10's null-exact key; the atomic-swap foreachBatch sink; ps1's
# index_col), then the TPC-H shapes promised last round
# (q2/q8/q13/q17/q22 + x11), the newest operators, and fills with
# oracle-checked queries no driver round has seen — 46 of 50 entries
# are new vs r01-r04. The remaining queries follow in registration
# order. Round 6's window should lead with the round-5 additions that
# did not fit this window (graph_hits_authorities, a39-a43, ev12, m32,
# t19, p19, x26, j12_nearest_event_join, dedup_threshold_sweep — all
# certified sf0.001/0.01/0.1) plus never-verified fills from the
# ledger in COVERAGE.md.
_WINDOW = [
    "flagship_revenue_by_nation",
    # changed this round (re-verify under the driver)
    "m11_regression_metrics_sql", "tpch_q11_important_balance",
    "tpch_q15_top_supplier", "dedup_containment",
    "sim_reciprocal_rank_fusion", "dq10_uniqueness_audit",
    "st_foreachbatch_upsert_sink", "ps1_pandas_api_groupby",
    # promised in round 4: remaining TPC-H shapes + point-in-time
    "tpch_q2_min_cost_supplier", "tpch_q8_market_share",
    "tpch_q13_customer_distribution", "tpch_q17_small_quantity_revenue",
    "tpch_q22_sales_opportunity", "x11_point_in_time_features",
    # newest operators (round-4 additions, never driver-verified)
    "text_langid_confusion", "m29_lift_gains_table",
    "m27_ndcg_ranking_eval", "j9_interval_overlap_join", "ts_holt_int",
    "text_cdc_chunk_dedup", "mm_keyframe_select",
    # never driver-verified: remaining TPC-H + stats/ML
    "tpch_q16_supplier_count", "tpch_q20_potential_promotion",
    "a34_weighted_median_prefix", "m25_kmeans_fixed_point",
    "m26_ols_normal_equations", "m28_confusion_matrix",
    # brand-new round-5 operators (all certified sf0.001/0.01/0.1)
    "j10_bloom_join_prune", "x21_retraction_ivm", "dq13_psi_drift",
    "dq12_merkle_bucket_diff", "m30_woe_iv_binning", "sql_grouping_sets",
    "dedup_lsh_recall_report", "a38_skyline_frontier",
    # never driver-verified: similarity / text north-star
    "sim_ivf_cells", "sim_ann_recall_report", "text_bm25_ranking",
    "text_sparse_dot_pairs",
    # never driver-verified: temporal / CDC / graph
    # (x22 is round 5's CDC-extract twin of x20's apply)
    "x7_upsert_keep_latest", "x10_join_ivm", "x22_cdc_extract",
    "graph_label_propagation", "graph_personalized_pagerank",
    "graph_link_prediction",
    # never driver-verified: multimodal / SQL surface / DQ
    # (mm_jpeg_roundtrip is round 5's new baseline-DCT codec)
    "mm_png_decode", "mm_jpeg_roundtrip",
    "sql_recursive_reachability", "m31_conformal_interval",
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
