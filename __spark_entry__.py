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
# (rounds 2-6 verified 205 distinct queries — see COVERAGE.md's
# driver-window ledger). Round 7's window is ALL never-driver-verified
# names: the 26 round-6 late additions (third-wave operators, the
# codec/probe remainder, tpch_q14/q19), the full sql_* statement
# surface, the s1x source/sink formats, and ts_ewma_int (the most
# fragile oracle class — recursive CTE — still without driver
# evidence). 49 new names → cumulative ledger target 254. Round 8
# should rotate the streaming family (st_tumbling/sliding/session/
# watermark_dedup/stream_stream/foreachbatch, last driver-checked
# r4/r5) back in per VERDICT r6 #5, LEAD with round 7's ~47 new
# never-verified operators (first wave: mm_ogg_probe, mm_mp3_probe,
# t25_kneser_ney_bigram, dq19_t_closeness, p24_dp_noisy_counts,
# sim_ivf_pq, m37_linear_shap, x31_delta_log_replay, f27_ipv4_cidr,
# ts8_holt_winters_int, m38_viterbi_decode, graph_bfs_hops,
# ts9_seasonal_decompose, er2_sorted_neighborhood, mm_gif_roundtrip,
# p25_neyman_allocation, t26_wordpiece_tokenize, ev19_sprt_user,
# m39_gbm_stumps, f29_soundex_blocking, mm_mjpeg_avi,
# a45_kmv_distinct; second wave: sim_binary_hamming_topk,
# m41_naive_bayes, dq20_inclusion_dependencies,
# p26_quantile_normalization, sql_pipe_syntax, ts10_autocorrelation,
# m42_feature_hashing, j15_point_in_polygon, sql_collation,
# m43_logreg_newton, graph_boruvka_msf, graph_deterministic_walks,
# a46_heavy_hitters_two_phase, mm_tiff_probe, f30_luhn_check,
# dq21_order_reconciliation, m44_pca_closed_form, sql_lateral_join,
# s25_recursive_glob_scan, m45_gmm_em, t27_tokenizer_comparison,
# ts11_decomposition_strength, ev20_sequence_pattern_match,
# m46_cart_depth2 — two r8 windows' worth; prioritize the iterative/
# recurrence classes first, they are the most fragile oracles), then
# keep draining the never-verified ledger:
# ev3-ev11, dq_expectations/dq_drift/dq3-dq6, the f1x fills
# (f2/f4/f5/f8/f10x3, f12-f19), t14/t15, corpus_*,
# text_* remainder, sim_* remainder, m15/m17 ML-adjacent oracles,
# x8/x12-x15/x19, a1x-a3x remainder, j4-j8, p1x, w4/w5,
# pack_length_buckets, ts_gapfill/sessionize/rolling, mm_frame/
# audio/batch_resize, s22/s24 re-verify.
_WINDOW = [
    "flagship_revenue_by_nation",
    # round-6 late additions: third-wave operators (never verified)
    "dedup_semdedup", "t22_url_canonicalize", "t23_bigram_perplexity",
    "t24_weighted_sample_aes", "m34_calibration_bins",
    "m35_partial_dependence", "m36_poisson_bootstrap_ci",
    "mm_phash_dct", "mm_jpeg_lossless", "mm_mp4_probe",
    "ev13_kaplan_meier", "ev14_uplift_qini", "ev16_propensity_match",
    "ev17_cuped_adjustment", "ev18_shapley_attribution",
    "er_fellegi_sunter", "dq17_wasserstein_drift", "dq18_ks_test",
    "ts7_theil_sen_trend", "x27_compaction_planner",
    "x28_zorder_clustering_audit", "x29_rendezvous_sharding",
    "p23_pseudonymize_join_audit", "a44_trimmed_mean",
    "j13_allen_interval_algebra", "f25_geohash_buckets",
    "f26_snowflake_ids", "tpch_q14_promo_revenue",
    "tpch_q19_disjunctive_revenue",
    # the sql_* statement surface (never verified except grouping_sets/
    # recursive_reachability)
    "sql_cte_entry", "sql_group_by_all", "sql_pivot_syntax",
    "sql_session_variables", "sql_execute_immediate",
    "sql_scalar_udf", "sql_exists_subquery",
    # the s1x source/sink format surface (never verified)
    "s10_orc_roundtrip", "s11_json_roundtrip", "s12_xml_roundtrip",
    "s14_compaction_roundtrip", "s15_schema_evolution_merge",
    "s16_zorder_layout", "s17_python_datasource",
    "s18_permissive_corrupt_json", "s19_text_source",
    "s20_file_provenance", "s21_dynamic_partition_overwrite",
    "s23_dynamic_partition_pruning",
    # most fragile oracle class (recursive CTE), never verified
    "ts_ewma_int",
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
