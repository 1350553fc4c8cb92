"""Round-8 additions: DSIR importance weights, Gopher quality census,
ExactSubstr k-gram dedup, closed-form CUSUM, k-truss pruning, nearest
as-of join, multiline-CSV round-trip, and the planted-corruption Ogg
CRC audit (plus audit_ogg_pages, the non-raising page walk)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realestate_engine.registry import QUERIES, load_all

load_all()


def test_audit_ogg_pages_flags_exactly_the_flipped_page():
    from realestate_engine.ogg import audit_ogg_pages, encode_minimal_ogg_vorbis

    s = encode_minimal_ogg_vorbis(44100, 2, [("TITLE", "x")], serial=5, granule=441)
    clean = audit_ogg_pages(s)
    assert [p["seq"] for p in clean] == [0, 1, 2]
    assert all(p["crc_ok"] for p in clean)
    assert clean[2]["granule"] == 441  # EOS page carries the granule

    # flip one body byte of page 1: exactly page 1 flags, structure intact
    b = bytearray(s)
    at = s.index(b"OggS", 4)
    nseg = b[at + 26]
    b[at + 27 + nseg + 3] ^= 0xFF
    flagged = audit_ogg_pages(bytes(b))
    assert [p["crc_ok"] for p in flagged] == [True, False, True]

    # structural damage still raises (no census without a lacing walk)
    with pytest.raises(ValueError, match="capture pattern"):
        audit_ogg_pages(b"JUNK" + s)


def test_ogg_crc_audit_recall_is_exactly_the_planted_rule(spark, sf_dir):
    rows = QUERIES["mm_ogg_crc_audit"](spark, sf_dir).collect()
    assert rows, "audit returned no docs"
    for r in rows:
        planted = r.doc_id % 5 == 2
        assert (r.n_crc_bad, r.first_bad_page) == (
            (1, 1) if planted else (0, -1)
        ), f"doc {r.doc_id}"
        assert r.n_pages == 3


def test_cusum_matches_classic_recursion(spark, sf_dir):
    """The prefix-minus-running-min closed form equals the textbook
    S_i = max(0, S_{i-1} + dev_i) recursion, replayed in Python."""
    got = {r.user_id: r for r in QUERIES["ts12_cusum_changepoint"](spark, sf_dir).collect()}
    from realestate_engine.registry import t as load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", F.floor(F.col("value") * 1000).cast("long").alias("v"))
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    import math

    for uid, rows in list(by_user.items())[:25]:
        rows.sort(key=lambda r: (r.ts, r.event_id))
        n, s = len(rows), sum(r.v for r in rows)
        cusum, best, best_idx = 0, -math.inf, None
        for i, r in enumerate(rows):
            cusum = max(0, cusum + n * r.v - s)
            if cusum > best:
                best, best_idx = cusum, i
        g = got[uid]
        assert g.cusum_max_times_n == best, uid
        assert g.changepoint_event_id == rows[best_idx].event_id, uid


def test_ktruss_census_monotone_and_truss_property(spark, sf_dir):
    rows = QUERIES["graph_ktruss"](spark, sf_dir).collect()
    assert [r.round for r in rows] == [1, 2]
    for r in rows:
        assert r.n_edges_out <= r.n_edges_in
        assert r.n_removed == r.n_edges_in - r.n_edges_out
    # round 2 starts where round 1 ended
    assert rows[1].n_edges_in == rows[0].n_edges_out


def test_asof_nearest_is_closest_in_either_direction(spark, sf_dir):
    got = QUERIES["j17_asof_nearest_event"](spark, sf_dir)
    sample = got.limit(20).collect()
    assert sample
    from realestate_engine.registry import t as load_table

    ev = load_table(spark, sf_dir, "events").collect()
    clicks = [r for r in ev if r.event_type == "click"]
    purchases = {r.event_id: r for r in ev if r.event_type == "purchase"}
    for g in sample:
        assert abs(g.delta_us) <= 3_600_000_000
        p = purchases[g.event_id]
        best = min(
            abs(int((c.ts - p.ts).total_seconds() * 1_000_000))
            for c in clicks
            if c.user_id == p.user_id
            and abs((c.ts - p.ts).total_seconds()) <= 3600
        )
        assert abs(g.delta_us) == best, g.event_id


def test_dsir_weights_favor_target_sources(spark, sf_dir):
    """Top DSIR-weighted docs should be enriched for the target slice
    (they're scored by a target-vs-raw likelihood ratio)."""
    top = QUERIES["t28_dsir_importance_weights"](spark, sf_dir).collect()
    assert len(top) == 50
    scores = [r.dsir_logweight_micro for r in top]
    assert scores == sorted(scores, reverse=True)
    frac_target = sum(r.source in ("src0", "src1", "src2") for r in top) / len(top)
    assert frac_target >= 0.15  # 3/20 sources = 0.15 base rate; ratio scoring >= base


def test_gopher_census_counts_are_consistent(spark, sf_dir):
    rows = QUERIES["t29_gopher_quality_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for c in (
            "n_fail_wordcount",
            "n_fail_meanlen",
            "n_fail_stopword",
            "n_fail_bigram_rep",
            "n_fail_dup5gram",
            "n_pass_all",
        ):
            assert 0 <= getattr(r, c) <= r.n_docs, (r.source, c)
        # pass_all can't exceed docs minus the largest single failure bucket
        worst = max(
            r.n_fail_wordcount,
            r.n_fail_meanlen,
            r.n_fail_stopword,
            r.n_fail_bigram_rep,
            r.n_fail_dup5gram,
        )
        # a doc failing the worst rule cannot be in pass_all
        assert r.n_pass_all <= r.n_docs - worst, (r.source, worst)


def test_substring_kgram_census_finds_real_duplicates(spark, sf_dir):
    rows = QUERIES["dedup_substring_kgram"](spark, sf_dir).collect()
    assert rows, "synthetic word soup must contain repeated 20-grams"
    for r in rows:
        assert r.n_docs > 1
        assert r.n_occurrences >= r.n_docs
        assert 1 <= r.n_sources <= r.n_docs


def test_csv_multiline_roundtrip_counts_three_lines(spark, sf_dir):
    rows = QUERIES["s26_csv_multiline_roundtrip"](spark, sf_dir).collect()
    assert rows
    assert all(r.n_lines == 3 for r in rows)  # payload embeds exactly two newlines


def test_running_total_carry_spans_arrow_batches(spark, sf_dir):
    """Force tiny Arrow batches so users definitely span batch
    boundaries; the O(1) carry must keep totals exact."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = QUERIES["custom_running_total_pandas"](spark, sf_dir)
        from pyspark.sql.window import Window

        from realestate_engine.registry import t as load_table

        ev = load_table(spark, sf_dir, "events")
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ref = ev.select(
            "user_id",
            "event_id",
            "ts",
            F.sum(F.floor(F.col("value") * 100).cast("long")).over(w).alias("running_cents"),
        )
        assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_ivf_build_cells_partition_all_vectors(spark, sf_dir):
    rows = QUERIES["sim_ivf_build_exact"](spark, sf_dir).collect()
    from realestate_engine.registry import t as load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_vecs  # every vector lands in one cell
    assert len(rows) <= 8 and all(0 <= r.cell < 8 for r in rows)
    assert all(r.inertia >= 0 for r in rows)


def test_ivf_build_lloyd_rounds_never_increase_inertia(spark, sf_dir):
    """Re-run the exact trainer's assignment with the INITIAL centroids
    and compare: two Lloyd rounds must not increase total inertia."""
    from realestate_engine.registry import t as load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", F.posexplode("embedding").alias("dim", "e")).select(
        "vec_id", "dim", F.floor(F.col("e") * 1000).cast("long").alias("qv")
    )
    c0 = q.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), "dim", F.col("qv").alias("cv")
    )
    d2 = (F.col("qv") - F.col("cv")) * (F.col("qv") - F.col("cv"))
    init_inertia = (
        q.join(c0, "dim")
        .groupBy("vec_id", "cell")
        .agg(F.sum(d2).alias("dist"))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("d"))
        .agg(F.sum("d").alias("total"))
        .first()
        .total
    )
    trained = sum(r.inertia for r in QUERIES["sim_ivf_build_exact"](spark, sf_dir).collect())
    assert trained <= init_inertia


def test_streaming_cusum_matches_batch_recursion(spark, sf_dir):
    """The multi-micro-batch stateful run must equal the single-pass
    batch recursion — the streaming/batch parity contract."""
    got = {r.user_id: r for r in QUERIES["st_cusum_monitor"](spark, sf_dir).collect()}
    from realestate_engine.registry import t as load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value").collect()
    by: dict[int, list] = {}
    for r in ev:
        by.setdefault(r.user_id, []).append(r)
    assert set(got) == set(by)
    for uid, rows in by.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        cusum = cmax = 0
        for r in rows:
            cusum = max(0, cusum + int(round(r.value * 100)) - 5000)
            cmax = max(cmax, cusum)
        g = got[uid]
        assert (g.n_events, g.cusum_max_cents, g.cusum_final_cents) == (
            len(rows),
            cmax,
            cusum,
        ), uid


def test_holm_stepdown_is_monotone(spark, sf_dir):
    """Holm rejection is a prefix property: once a rank fails, no later
    rank may be rejected; rejected_holm implies rejected_raw."""
    rows = QUERIES["ev23_holm_bonferroni"](spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    seen_fail = False
    for r in rows:
        if r.rejected_holm:
            assert r.rejected_raw and not seen_fail, r.rank
        if not r.rejected_raw:
            seen_fail = True
        assert not (r.rejected_holm and seen_fail and not r.rejected_raw)


def test_coreset_sensitivity_orders_by_distance(spark, sf_dir):
    rows = QUERIES["sim_coreset_sensitivity"](spark, sf_dir).collect()
    assert len(rows) == 32
    sens = [r.sens_nano for r in rows]
    assert sens == sorted(sens, reverse=True)
    dmins = [r.d_min for r in rows]
    assert dmins == sorted(dmins, reverse=True)  # sens is affine in d_min
    assert all(r.d_min >= 0 for r in rows)


def test_knn_classifier_is_exact_vs_python_replay(spark, sf_dir):
    got = {r.probe_id: r for r in QUERIES["m51_knn_classifier"](spark, sf_dir).collect()}
    assert set(got) == set(range(8))
    from realestate_engine.registry import t as load_table

    import math

    vecs = {
        r.vec_id: ([math.floor(x * 1000) for x in r.embedding], r.label)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for pid in range(8):
        pv, plabel = vecs[pid]
        dists = sorted(
            (sum((a - b) ** 2 for a, b in zip(pv, gv)), gid, glabel)
            for gid, (gv, glabel) in vecs.items()
            if gid >= 8
        )[:5]
        votes: dict[int, tuple[int, int]] = {}
        for d, gid, gl in dists:
            n, closest = votes.get(gl, (0, None))
            votes[gl] = (n + 1, d if closest is None else min(closest, d))
        pred = min(votes.items(), key=lambda kv: (-kv[1][0], kv[1][1], kv[0]))[0]
        g = got[pid]
        assert (g.predicted_label, g.true_label, g.correct) == (pred, plabel, pred == plabel)


def test_curation_funnel_is_monotone_per_source(spark, sf_dir):
    rows = QUERIES["corpus_curation_funnel"](spark, sf_dir).collect()
    assert rows
    total_raw = sum(r.n_raw for r in rows)
    from realestate_engine.registry import t as load_table

    assert total_raw == load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert r.n_raw >= r.n_pass_quality >= r.n_after_dedup >= r.n_selected >= 0
        if r.n_selected:
            assert r.selected_tokens >= 20 * r.n_selected  # quality gate floor


def test_isotonic_fit_is_monotone_and_pools_violations(spark, sf_dir):
    rows = QUERIES["m52_isotonic_pav_exact"](spark, sf_dir).collect()
    assert len(rows) >= 5
    iso = [r.iso_rate_micro for r in rows]
    assert iso == sorted(iso)  # the whole point of the fit
    raw = [r.raw_rate_micro for r in rows]
    if raw == sorted(raw):
        assert not any(r.pooled for r in rows)  # already monotone -> identity
    else:
        assert any(r.pooled for r in rows)


def test_power_analysis_grid_is_monotone(spark, sf_dir):
    rows = QUERIES["ev24_power_analysis"](spark, sf_dir).collect()
    assert [r.delta_micro for r in rows] == [10000, 20000, 30000, 40000, 50000]
    ns = [r.n_required_per_arm for r in rows]
    assert ns == sorted(ns, reverse=True)  # smaller detectable lift needs more n
    assert all(n >= 1 for n in ns)


def test_vacuum_planner_agrees_with_log_replay(spark, sf_dir):
    """Eligibility must be consistent with x31's live-set algebra:
    a vacuum-eligible file is never live at the snapshot."""
    live = {r.file_id: r.live_at_v for r in QUERIES["x31_delta_log_replay"](spark, sf_dir).collect()}
    for r in QUERIES["x33_vacuum_planner"](spark, sf_dir).collect():
        if r.vacuum_eligible:
            assert not live[r.file_id]
            assert r.remove_version is not None and r.remove_version <= 7
            assert r.bytes_reclaimable > 0
        else:
            assert r.bytes_reclaimable == 0


def test_brier_decomposition_identity_bounds(spark, sf_dir):
    r = QUERIES["m53_brier_decomposition"](spark, sf_dir).first()
    assert r.n_bins >= 5
    # all components non-negative; uncertainty <= 1/4 (p(1-p) max)
    assert r.reliability_nano >= 0 and r.resolution_nano >= 0
    assert 0 <= r.uncertainty_nano <= 250_000_000
    # resolution can never exceed uncertainty (variance decomposition)
    assert r.resolution_nano <= r.uncertainty_nano + 1


def test_bpe_encode_census_conserves_corpus_mass(spark, sf_dir):
    """Total token occurrences across ALL tokens (not just top-40) must
    equal corpus chars minus 1 per merge applied per word occurrence —
    cheaper invariant: top tokens exist, lengths >= 1, and any token of
    length > 1 must be buildable from the learned merges."""
    rows = QUERIES["t30_bpe_encode"](spark, sf_dir).collect()
    assert rows and len(rows) <= 40
    merges = {
        (r.left, r.right)
        for r in QUERIES["text_bpe_merge_rounds"](spark, sf_dir).collect()
    }
    merged_tokens = {l + r for l, r in merges}
    for r in rows:
        assert r.token_len == len(r.token) >= 1
        assert r.n_occurrences >= r.n_word_types >= 1
        if r.token_len > 1:
            assert r.token in merged_tokens, r.token


def test_png_crc_audit_recall_is_exactly_the_planted_rule(spark, sf_dir):
    rows = QUERIES["mm_png_crc_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        planted = r.doc_id % 7 == 3
        assert (r.n_crc_bad, r.first_bad_chunk) == (
            (1, "IDAT") if planted else (0, "")
        ), f"doc {r.doc_id}"
        assert r.n_chunks == 3


def test_band_join_counts_match_brute_force(spark, sf_dir):
    got = {r.p_partkey: r.n_band_neighbors for r in QUERIES["j18_band_join"](spark, sf_dir).collect()}
    from realestate_engine.registry import t as load_table

    prices = {
        r.p_partkey: int(round(r.p_retailprice * 100))
        for r in load_table(spark, sf_dir, "part").collect()
    }
    vals = sorted(prices.values())
    import bisect

    for pk, n in list(got.items())[:20]:
        c = prices[pk]
        brute = bisect.bisect_right(vals, c + 5) - bisect.bisect_left(vals, c - 5) - 1
        assert n == brute, pk


def test_cohort_retention_week_zero_is_full(spark, sf_dir):
    rows = QUERIES["ev25_cohort_retention"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_active <= r.cohort_size
        assert 0 <= r.retention_micro <= 1_000_000
        if r.week_offset == 0:
            # every user is active in their own first week by construction
            assert r.n_active == r.cohort_size and r.retention_micro == 1_000_000


def test_pk_discovery_pins_the_lineitem_trap(spark, sf_dir):
    rows = {r.cols: r for r in QUERIES["dq24_pk_discovery"](spark, sf_dir).collect()}
    assert rows["o_orderkey"].is_unique_key
    assert rows["event_id"].is_unique_key
    assert not rows["o_custkey"].is_unique_key
    assert not rows["l_orderkey,l_linenumber"].is_unique_key  # the repo-wide trap
    # the 4-column composite is the real key at sf>=0.01; sf0.001's
    # generated lineitem contains exactly ONE fully-duplicated row
    # (orderkey 1294 line 4), so assert the census REPORTS it rather
    # than assuming uniqueness the data doesn't have
    full = rows["l_orderkey,l_linenumber,l_suppkey,l_partkey"]
    assert full.n_duplicates <= 1
    assert full.n_duplicates < rows["l_orderkey,l_linenumber"].n_duplicates


def test_anova_components_are_consistent(spark, sf_dir):
    r = QUERIES["a50_anova_oneway"](spark, sf_dir).first()
    assert r.n_groups >= 2
    assert r.ss_between_sq_units >= 0 and r.ss_within_sq_units >= 0
    assert r.f_stat_micro >= 0


def test_checkpoint_equivalence_holds(spark, sf_dir):
    r = QUERIES["x35_checkpoint_equivalence"](spark, sf_dir).first()
    assert r.checkpoint_equivalent  # the Delta invariant itself
    assert r.n_live_full_replay == r.n_live_ckpt_plus_tail
