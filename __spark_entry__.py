"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the ``realestate_engine`` package; this module is
only the adapter.

The first entries of queries() are the driver's 50-query correctness
window. The driver caps CORRECTNESS_r{N}.json at 50 entries, so the
window ROTATES each round to accumulate driver-verified coverage.
The full per-round rotation history lives in COVERAGE.md's
"Driver-window ledger" section; after r12 the cumulative ledger held
491 of 498 registered queries.

Round 14's window (per VERDICT r13 #1, staged and 3-SF-pre-certified
at the r13 close): flagship + the 37 remaining r2/r3-era names + the
12 oldest r4-era names. Several of the r4-era slots are queries whose
internals were optimized in round 14 (OPTIMIZATION_r14.md), so this
window also gives that work fresh driver-hash evidence.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realestate_engine import registry
from realestate_engine.queries_core import flagship_revenue_by_nation

registry.load_all()

_WINDOW = [
    "flagship_revenue_by_nation",
    # --- r14 rotation, exactly as staged and 3-SF-pre-certified at the
    #     r13 close (VERDICT r13 ask #1): the 37 remaining r2/r3-era
    #     names, then the 12 oldest r4-era names in ledger order. The
    #     r4 block doubles as fresh driver evidence for this round's
    #     optimization work: text_tfidf_top_term, corpus_clean_pipeline,
    #     dedup_clusters/_twostar, dedup_embedding_cosine and
    #     dedup_leakage_safe_split were all restructured or
    #     cache-shared in r14 (see OPTIMIZATION_r14.md) and re-certified
    #     at all three SFs before this rotation.
    "a3_count_star_alias", "a7_count_scalar", "f1_log_guarded",
    "j3_broadcast_dim", "j3_cross", "j3_left_outer", "j3_left_semi",
    "j3_right_outer", "p2_column_subset", "p3_rename", "set_except",
    "set_intersect", "set_union_all", "set_union_by_name",
    "a6_approx_quantile", "asof_last_click_before_purchase",
    "dedup_exact", "dedup_keep_newest", "f10_monthly_revenue",
    "f3_haversine", "f6_quantile_clamp", "m1_string_indexer",
    "m4_pipeline_fit_transform", "m6_target_stats",
    "m8_smearing_inverse", "mm_image_features", "o1_global_sort_desc",
    "o2_topk", "p4_null_filter", "p5_sql_string_filter",
    "p6_range_filter_drop", "p7_conditional_case", "s4_local_rows",
    "s6_csv_sink_native", "set_drop_duplicates", "sim_bruteforce_topk",
    "text_tfidf_top_term",
    # --- oldest r4-era names
    "a33_runs_test", "corpus_clean_pipeline",
    "corpus_temperature_mixture", "corpus_token_budget",
    "dedup_clusters", "dedup_clusters_twostar",
    "dedup_embedding_cosine", "dedup_leakage_safe_split",
    "dedup_minhash_incremental", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash",
]
assert len(_WINDOW) == 50, len(_WINDOW)

# r15 window: continue the freshness rotation mechanically — flagship
# + the 49 stalest ledger names per `tools/ledger.py --stalest` after
# folding CORRECTNESS_r14 (the remaining r4-r7-era tail).


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
