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
# (rounds 2-5 verified 158 distinct queries — see COVERAGE.md's
# driver-window ledger). Round 6 leads with the round's changed/new
# queries: the a38 HUGEINT oracle fix plus every query whose output
# dtype was harmonized for the driver's type-strict hash (a23, a29,
# dq7, ev_cohort, f22, m18, dedup_threshold_sweep), a9's rework
# (last driver evidence was an r02 fail), the de-broadcast
# dedup_lsh_recall_report, the new hot-bucket guard + 12-bit
# multi-probe ANN + two-config recall report, and text_bpe (new
# oracle + the phantom-empty-symbol fix it caught). Then the round-5
# additions that never got a window slot, and never-verified fills
# (simple functions, ML featurizers, remaining TPC-H). Round 7's
# window should fill from the remaining ~110 never-verified ledger
# entries in COVERAGE.md (the sql_* surface, s1x sources, ev/ts/dq
# families, corpus/text remainder), plus the round-6 late additions
# that missed this window: dq17_wasserstein_drift, mm_mp4_probe,
# ev13_kaplan_meier, er_fellegi_sunter, the third-wave operators
# (dedup_semdedup, t22_url_canonicalize, m34_calibration_bins,
# mm_phash_dct, ev14_uplift_qini, mm_jpeg_lossless, dq18_ks_test,
# ts7_theil_sen_trend, x27_compaction_planner,
# p23_pseudonymize_join_audit, ev16_propensity_match,
# t23_bigram_perplexity, m35_partial_dependence,
# t24_weighted_sample_aes, f25_geohash_buckets,
# x28_zorder_clustering_audit, m36_poisson_bootstrap_ci,
# x29_rendezvous_sharding, ev17_cuped_adjustment,
# ev18_shapley_attribution, a44_trimmed_mean,
# j13_allen_interval_algebra, f26_snowflake_ids, tpch_q14,
# tpch_q19), and the
# f2/f4/f5/f8/f10x3 fills displaced by the second-wave swap.
_WINDOW = [
    "flagship_revenue_by_nation",
    # changed this round (oracle dtype harmonization / plan changes)
    "a38_skyline_frontier", "dedup_threshold_sweep",
    "a9_approx_count_distinct", "dedup_lsh_recall_report",
    "a23_equidepth_histogram", "a29_sliding_distinct_users",
    "dq7_seasonal_anomaly", "ev_cohort_retention",
    "f22_business_days", "m18_negative_sampling",
    # brand-new round-6 operators (all certified sf0.001/0.01/0.1)
    "dedup_lsh_hot_bucket_guard", "sim_lsh_ann_multiprobe",
    "sim_ann_recall_report", "text_bpe_merge_rounds",
    # round-5 additions that did not fit the r5 window
    "graph_hits_authorities", "a39_selfjoin_size_sketch",
    "a40_median_of_medians", "a41_hll_set_algebra",
    "a42_bitmap_distinct_rollup", "a43_histogram_quantile_rollup",
    "ev12_diff_in_diff", "m32_permutation_test",
    "t19_zipf_fit", "p19_schema_drift_audit",
    "x26_late_dimension_replay", "j12_nearest_event_join",
    "x25_bitemporal_asof", "p22_survivorship_golden_record",
    "m33_oof_target_encoding", "t21_source_reuse_matrix",
    "graph_degree_distribution",
    # brand-new round-6 operators, second wave (all certified
    # sf0.001/0.01, several at 0.1): real WAV codec round trip,
    # degree-ordered clustering coefficient, skipping audit, exact
    # PPJoin, observe() metrics, k-anonymity, Lloyd-trained PQ-ADC
    "mm_wav_roundtrip", "graph_clustering_coefficient",
    "dq14_skipping_audit", "dedup_prefix_filter_join",
    "dq15_observe_metrics", "dq16_k_anonymity", "sim_pq_adc",
    # never driver-verified: ML-featurizer surface
    "m2_onehot_encoder", "m3_vector_assembler", "m5_bucketizer",
    "m7_log_transform",
    # never driver-verified: remaining TPC-H
    "tpch_q4_priority_late_ship", "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items", "tpch_q12_priority_classes",
    # third wave: REAL progressive JPEG + REAL FLAC round trips (the
    # round's codec milestones; tpch_q14/q19 moved to the r7 fills)
    "mm_jpeg_progressive", "mm_flac_roundtrip",
    # upgraded rows-only -> full oracle this round (read_blob)
    "s13_binaryfile_scan",
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
