"""Round-9 second late wave: Ljung-Box portmanteau test, per-nation
Spearman rank correlation, McNemar's paired classifier test, the
Goodman-Kruskal gamma ordinal association, the two-group log-rank
survival test, degree assortativity, discrete mutual information, the
phase-folding periodogram, the write-audit-publish gate, DeLong's
paired-AUC test, the OCC conflict audit, the sharp regression
discontinuity, the Mann-Kendall trend test, and the Friedman blocked
comparison — each replayed exactly in Python (the property-test
posture: the oracle proves cross-engine agreement, the replay proves
the MATH is the one we claim)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from realestate_engine.registry import QUERIES, load_all
from realestate_engine.registry import t as load_table

load_all()

_CHI2_95_NANO = {
    1: 3841458821,
    2: 5991464547,
    3: 7814727903,
    4: 9487729037,
    5: 11070497693,
    6: 12591587244,
    7: 14067140449,
}


def test_ljung_box_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["ts13_ljung_box"](spark, sf_dir).collect()
    assert [r.lag for r in rows] == list(range(1, 8))
    # epoch computed Spark-side: a naive collected timestamp round-
    # tripped through datetime.timestamp() is fold-ambiguous during a
    # DST fall-back hour under some host TZs (ADVICE r12); cast("long")
    # on TimestampType is the raw UTC epoch, no host-TZ involved.
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("long").alias("epoch"), "value"
    ).collect()
    daily = Counter()
    for r in ev:
        day = r.epoch // 86400 - 19723  # UTC days since 2024-01-01
        daily[day] += math.floor(r.value * 1000)
    n = len(daily)
    m = sum(daily.values()) // n
    dev = {d: v - m for d, v in daily.items()}
    ss = sum(x * x for x in dev.values())
    q = 0
    for r in rows:
        k = r.lag
        pairs = [(dev[d], dev[d + k]) for d in dev if d + k in dev]
        sxy = sum(a * b for a, b in pairs)
        acf = math.floor(sxy / ss * 1_000_000)
        term = n * (n + 2) * acf * acf // (n - k) // 1000
        q += term
        assert r.n_pairs == len(pairs)
        assert r.acf_micro == acf
        assert r.lb_term_nano == term
        assert r.lb_q_nano == q
        assert r.chi2_crit_nano == _CHI2_95_NANO[k]
        assert r.reject_h0 == (1 if q > _CHI2_95_NANO[k] else 0)
    # Q is a sum of non-negative terms, so it is monotone in K — the
    # structural invariant a wrong prefix-join predicate would break
    qs = [r.lb_q_nano for r in rows]
    assert qs == sorted(qs) and all(x >= 0 for x in qs)


def _avg_ranks_doubled(values):
    """2x average ranks with ties (integer-exact), matching the
    2*RANK() + tie_count - 1 window form."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    r2 = [0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and values[order[j]] == values[order[i]]:
            j += 1
        for k in range(i, j):
            r2[order[k]] = 2 * (i + 1) + (j - i) - 1
        i = j
    return r2


def test_spearman_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["a51_spearman_corr"](spark, sf_dir).collect()
    assert rows
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        ).collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        ).collect()
    }
    per = {}
    for r in orders:
        n, s = per.get(r.o_custkey, (0, 0))
        per[r.o_custkey] = (n + 1, s + math.floor(r.o_totalprice * 100))
    by_nation = {}
    for ck, (n_orders, spend) in per.items():
        by_nation.setdefault(nat[cust[ck]], []).append((n_orders, spend))
    for r in rows:
        pts = by_nation[r.nation]
        n = len(pts)
        assert r.n_customers == n
        rx = _avg_ranks_doubled([p[0] for p in pts])
        ry = _avg_ranks_doubled([p[1] for p in pts])
        assert sum(rx) == n * (n + 1) and sum(ry) == n * (n + 1)
        dx = [v - (n + 1) for v in rx]
        dy = [v - (n + 1) for v in ry]
        sxy = sum(a * b for a, b in zip(dx, dy))
        ssx = sum(a * a for a in dx)
        ssy = sum(b * b for b in dy)
        want = (
            0
            if ssx == 0 or ssy == 0
            else math.floor(sxy / (math.sqrt(ssx) * math.sqrt(ssy)) * 1_000_000)
        )
        assert r.spearman_micro == want
        assert -1_000_001 <= r.spearman_micro <= 1_000_000
    assert {r.nation for r in rows} == set(by_nation)


def _median_interp(values):
    s = sorted(values)
    n = len(s)
    if n % 2:
        return float(s[n // 2])
    return (s[n // 2 - 1] + s[n // 2]) / 2.0


def test_mcnemar_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["m57_mcnemar_test"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    orders = {
        o.o_orderkey: (round(o.o_totalprice * 100), 1 if o.o_orderpriority == "1-URGENT" else 0)
        for o in load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).collect()
    }
    items = Counter(
        li.l_orderkey
        for li in load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    )
    # population = orders WITH lineitems (the inner join's semantics;
    # driver testdata has a few childless orders)
    keys = [k for k in orders if items[k] > 0]
    med_c = _median_interp([orders[k][0] for k in keys])
    med_i = _median_interp([items[k] for k in keys])
    n11 = n10 = n01 = n00 = 0
    for k in keys:
        cents, label = orders[k]
        ok_a = (1 if cents > med_c else 0) == label
        ok_b = (1 if items[k] > med_i else 0) == label
        if ok_a and ok_b:
            n11 += 1
        elif ok_a:
            n10 += 1
        elif ok_b:
            n01 += 1
        else:
            n00 += 1
    n = len(keys)
    assert (r.n, r.n11, r.n10, r.n01, r.n00) == (n, n11, n10, n01, n00)
    assert r.acc_a_micro == (n11 + n10) * 1_000_000 // n
    assert r.acc_b_micro == (n11 + n01) * 1_000_000 // n
    disc = n10 + n01
    want = 0 if disc == 0 else (abs(n10 - n01) - 1) ** 2 * 1_000_000 // disc
    assert r.mcnemar_micro == want
    assert r.reject_h0 == (1 if want > 3841459 else 0)
    # the four cells partition the sample
    assert n11 + n10 + n01 + n00 == n


def test_gamma_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["a52_goodman_kruskal_gamma"](spark, sf_dir).collect()
    assert rows
    per = {}
    for o in load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect():
        n, s = per.get(o.o_custkey, (0, 0))
        per[o.o_custkey] = (n + 1, s + math.floor(o.o_totalprice * 100))
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        ).collect()
    }
    nat = {
        r.n_nationkey: r.n_regionkey
        for r in load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_regionkey"
        ).collect()
    }
    reg = {
        r.r_regionkey: r.r_name
        for r in load_table(spark, sf_dir, "region").select(
            "r_regionkey", "r_name"
        ).collect()
    }
    spends = sorted(s for _, s in per.values())

    def interp_q(p):
        # quantile_cont linear interpolation on the sorted sample
        pos = p * (len(spends) - 1)
        lo = int(pos)
        frac = pos - lo
        hi = min(lo + 1, len(spends) - 1)
        return spends[lo] + (spends[hi] - spends[lo]) * frac

    qs = [interp_q(v / 10.0) for v in range(1, 10)]
    cells = Counter()
    for ck, (n_ord, spend) in per.items():
        x = min(n_ord, 10)
        dec = 1 + sum(1 for q in qs if q < spend)
        cells[(reg[nat[cust[ck]]], x, dec)] += 1
    got = {r.region: r for r in rows}
    regions = {k[0] for k in cells}
    assert set(got) == regions
    for rname in regions:
        rc = [(x, d, f) for (rn, x, d), f in cells.items() if rn == rname]
        c_pairs = d_pairs = 0
        for xa, da, fa in rc:
            for xb, db, fb in rc:
                if xb > xa and db > da:
                    c_pairs += fa * fb
                elif xb > xa and db < da:
                    d_pairs += fa * fb
        r = got[rname]
        assert r.n_customers == sum(f for _, _, f in rc)
        assert (r.c_pairs, r.d_pairs) == (c_pairs, d_pairs)
        want = (
            0
            if c_pairs + d_pairs == 0
            else math.floor((c_pairs - d_pairs) / (c_pairs + d_pairs) * 1_000_000)
        )
        assert r.gamma_micro == want
        assert -1_000_001 <= r.gamma_micro <= 1_000_000


def test_logrank_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["ev27_logrank_test"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    done = {}
    for li in load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        d = li.l_shipdate.date() if hasattr(li.l_shipdate, "date") else li.l_shipdate
        if li.l_orderkey not in done or d > done[li.l_orderkey]:
            done[li.l_orderkey] = d
    subj = []
    for o in load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority"
    ).collect():
        if o.o_orderkey not in done:
            continue
        od = o.o_orderdate.date() if hasattr(o.o_orderdate, "date") else o.o_orderdate
        subj.append(
            (
                (done[o.o_orderkey] - od).days,
                1 if o.o_orderstatus == "F" else 0,
                1 if o.o_orderpriority in ("1-URGENT", "2-HIGH") else 0,
            )
        )
    per = {}
    for dur, ev, grp in subj:
        n, n1, da, d1 = per.get(dur, (0, 0, 0, 0))
        per[dur] = (n + 1, n1 + grp, da + ev, d1 + ev * grp)
    o1 = e1 = v = events = 0
    for dur, (_, _, da, d1) in per.items():
        if da == 0:
            continue
        n1r = sum(p[1] for d, p in per.items() if d >= dur)
        nr = sum(p[0] for d, p in per.items() if d >= dur)
        n2r = nr - n1r
        o1 += d1
        events += da
        e1 += da * n1r * 1_000_000 // nr
        if nr > 1:
            v += math.floor(
                (n1r * n2r) / (nr * nr) * (da * (nr - da)) / (nr - 1) * 1_000_000
            )
    assert (r.n1_subjects + r.n2_subjects) == len(subj)
    assert r.n1_subjects == sum(1 for _, _, g in subj if g == 1)
    assert (r.events_total, r.o1, r.e1_micro, r.v_micro) == (events, o1, e1, v)
    num = o1 * 1_000_000 - e1
    want = 0 if v == 0 else math.floor(num * num / v)  # doubles, IEEE order
    # replicate the shared-text double chain exactly: CAST both factors
    want = 0 if v == 0 else math.floor(float(num) * float(num) / float(v))
    assert r.logrank_chi2_micro == want
    assert r.reject_h0 == (1 if v > 0 and want > 3841459 else 0)


def test_assortativity_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["graph_degree_assortativity"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    o = {
        x.o_orderkey: x.o_custkey
        for x in load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        ).collect()
    }
    pairs = {
        (o[li.l_orderkey] * 2, li.l_suppkey * 2 + 1)
        for li in load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        ).collect()
    }
    edges = [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
    deg = Counter(s for s, _ in edges)
    jx = [deg[s] for s, d in edges]
    jy = [deg[d] for s, d in edges]
    m2 = len(edges)
    sx, sy = sum(jx), sum(jy)
    sxx = sum(v * v for v in jx)
    syy = sum(v * v for v in jy)
    sxy = sum(a * b for a, b in zip(jx, jy))
    assert (r.n_directed_edges, r.sum_src_deg, r.sum_deg_product) == (m2, sx, sxy)
    # symmetry of the bidirectional edge list
    assert sx == sy and sxx == syy
    vx, vy = m2 * sxx - sx * sx, m2 * syy - sy * sy
    want = (
        0
        if vx == 0 or vy == 0
        else math.floor(
            (float(m2) * float(sxy) - float(sx) * float(sy))
            / (math.sqrt(float(m2) * float(sxx) - float(sx) * float(sx))
               * math.sqrt(float(m2) * float(syy) - float(sy) * float(sy)))
            * 1_000_000
        )
    )
    assert r.assortativity_micro == want
    # bipartite trade graph: hubs serve long tails -> disassortative
    assert r.assortativity_micro < 0


def test_mutual_information_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["a53_mutual_information"](spark, sf_dir).collect()
    assert rows
    base = [
        (x.o_orderpriority, round(x.o_totalprice * 100))
        for x in load_table(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_totalprice"
        ).collect()
    ]
    cents = sorted(c for _, c in base)

    def interp_q(p):
        pos = p * (len(cents) - 1)
        lo = int(pos)
        hi = min(lo + 1, len(cents) - 1)
        return cents[lo] + (cents[hi] - cents[lo]) * (pos - lo)

    qs = [interp_q(v / 10.0) for v in range(1, 10)]
    cells, mi_m, mj_m = Counter(), Counter(), Counter()
    for pr, c in base:
        dec = 1 + sum(1 for q in qs if q < c)
        cells[(pr, dec)] += 1
        mi_m[pr] += 1
        mj_m[dec] += 1
    n_all = len(base)
    got = {(r.priority, r.decile): r for r in rows}
    assert set(got) == set(cells)
    total = 0
    for (pr, dec), n_ij in cells.items():
        r = got[(pr, dec)]
        assert (r.n_ij, r.n_i, r.n_j) == (n_ij, mi_m[pr], mj_m[dec])
        want = math.floor(
            float(n_ij)
            * math.log(float(n_ij) * float(n_all) / (float(mi_m[pr]) * float(mj_m[dec])))
            / float(n_all)
            * 1_000_000
        )
        assert r.mi_term_micronat == want
        total += want
    # total MI is non-negative up to per-cell floor slack
    assert total >= -len(cells)


def test_phase_folding_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["ts14_phase_folding_periodogram"](spark, sf_dir).collect()
    assert [r.period for r in rows] == list(range(2, 15))
    # Spark-side epoch: see test_ljung_box_matches_exact_replay
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("long").alias("epoch"), "value"
    ).collect()
    daily = Counter()
    for r in ev:
        day = r.epoch // 86400 - 19723  # UTC days since 2024-01-01
        daily[day] += math.floor(r.value * 1000)
    n = len(daily)
    m = sum(daily.values()) // n
    dev = {d: v - m for d, v in daily.items()}
    s_tot = sum(dev.values())
    sst = sum(x * x for x in dev.values())
    strengths = {}
    for r in rows:
        p = r.period
        groups = Counter()
        counts = Counter()
        for d, x in dev.items():
            groups[d % p] += x
            counts[d % p] += 1
        ssb = sum(
            math.floor(float(sk) * float(sk) / float(counts[k]))
            for k, sk in groups.items()
        ) - math.floor(float(s_tot) * float(s_tot) / float(n))
        assert r.n_days == n and r.sst == sst and r.ssb == ssb
        want = math.floor(float(ssb) / float(sst) * 1_000_000)
        assert r.strength_micro == want
        strengths[p] = want
    # SSB <= SST (up to floor slack), and every strength is a share
    assert all(0 <= v <= 1_000_000 + 13 for v in strengths.values())


def test_write_audit_publish_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["x36_write_audit_publish"](spark, sf_dir).collect()
    assert [r.version for r in rows] == list(range(10))
    commits = {}
    for doc_id in range(38):
        v = doc_id // 4
        rc = 0 if doc_id == 13 else 100 + doc_id * 7
        nc = (100 + doc_id * 7) // 10 if doc_id % 5 == 0 else doc_id % 7
        nf, tr, tn, mn = commits.get(v, (0, 0, 0, 1 << 60))
        commits[v] = (nf + 1, tr + rc, tn + nc, min(mn, rc))
    snapshot = 0
    published_flags = []
    for r in rows:
        nf, tr, tn, mn = commits[r.version]
        ratio = tn * 1_000_000 // tr
        ok_nulls = 1 if ratio <= 30_000 else 0
        ok_nonempty = 1 if mn > 0 else 0
        ok_minfiles = 1 if nf >= 4 else 0
        pub = ok_nulls * ok_nonempty * ok_minfiles
        snapshot += tr * pub
        assert (r.n_files, r.total_rows, r.total_nulls) == (nf, tr, tn)
        assert r.null_ratio_micro == ratio
        assert (r.rule_nulls_ok, r.rule_nonempty_ok, r.rule_minfiles_ok) == (
            ok_nulls, ok_nonempty, ok_minfiles,
        )
        assert r.published == pub
        assert r.snapshot_rows == snapshot
        published_flags.append(pub)
    # the planted failures actually fire: the empty file (doc 13 ->
    # commit 3), the short commit (v9, 2 files), and at least one
    # high-null commit; something still publishes
    assert published_flags[3] == 0 and published_flags[9] == 0
    assert 0 < sum(published_flags) < 10


def test_delong_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["m58_delong_auc_test"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    orders = {
        o.o_orderkey: (round(o.o_totalprice * 100), 1 if o.o_orderpriority == "1-URGENT" else 0)
        for o in load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ).collect()
    }
    items = Counter(
        li.l_orderkey
        for li in load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    )
    samples = [
        (orders[k][0], items[k], orders[k][1]) for k in orders if items[k] > 0
    ]
    np_ = sum(lab for _, _, lab in samples)
    nn = len(samples) - np_

    def vs(score_idx):
        neg = sorted(s[score_idx] for s in samples if s[2] == 0)
        pos = sorted(s[score_idx] for s in samples if s[2] == 1)
        import bisect

        v10 = {}
        v01 = {}
        out10, out01 = [], []
        for s_ in (x[score_idx] for x in samples if x[2] == 1):
            below = bisect.bisect_left(neg, s_)
            at = bisect.bisect_right(neg, s_) - below
            out10.append(2 * below + at)
        for s_ in (x[score_idx] for x in samples if x[2] == 0):
            above = len(pos) - bisect.bisect_right(pos, s_)
            at = bisect.bisect_right(pos, s_) - bisect.bisect_left(pos, s_)
            out01.append(2 * above + at)
        return out10, out01

    v10a, v01a = vs(0)
    v10b, v01b = vs(1)
    sa, sb = sum(v10a), sum(v10b)
    ta, tb = sum(v01a), sum(v01b)
    # structural identity: total concordance mass agrees across views
    assert sa == ta and sb == tb
    assert (r.n_pos, r.n_neg) == (np_, nn)
    assert (r.sum_v10_a, r.sum_v10_b, r.sum_v01_a, r.sum_v01_b) == (sa, sb, ta, tb)
    assert r.auc_a_micro == sa * 1_000_000 // (2 * np_ * nn)
    assert r.auc_b_micro == sb * 1_000_000 // (2 * np_ * nn)

    def var_s(xs):
        n = len(xs)
        s, ss = sum(xs), sum(x * x for x in xs)
        return (ss - s * s / n) / (n - 1)

    def cov_s(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        return (sxy - sx * sy / n) / (n - 1)

    var = (
        (var_s(v10a) + var_s(v10b) - 2 * cov_s(v10a, v10b)) / (4 * nn * nn) / np_
        + (var_s(v01a) + var_s(v01b) - 2 * cov_s(v01a, v01b)) / (4 * np_ * np_) / nn
    )
    if var > 0:
        z = (sa - sb) / (2 * np_ * nn) / math.sqrt(var)
        # the engines evaluate the identical double chain; replaying it
        # in a different association order can differ in the last ulp,
        # so compare the MICRO value with 1-unit slack
        assert abs(r.z_micro - math.floor(z * 1_000_000)) <= 1
        assert r.reject_h0 == (1 if abs(r.z_micro) > 1959964 else 0)
    # price should rank urgency no better than basket size on TPC-H-ish
    # uniform data: both AUCs near 1/2
    assert 400_000 < r.auc_a_micro < 600_000
    assert 400_000 < r.auc_b_micro < 600_000


def test_occ_protocol_matches_imperative_replay(spark, sf_dir):
    rows = QUERIES["x37_occ_conflict_audit"](spark, sf_dir).collect()
    assert [r.txn_id for r in rows] == list(range(12))
    committed = []  # (txn_id, {parts})
    version = 0
    for r in rows:
        parts = {r.txn_id % 5, (r.txn_id * 3 + 1) % 5}
        read_point = r.txn_id - 1 - r.txn_id % 3
        conflicts = [
            c for c, ps in committed if c > read_point and ps & parts
        ]
        ok = 0 if (conflicts and r.txn_id > 0) else 1
        if r.txn_id == 0:
            ok = 1
        if ok:
            committed.append((r.txn_id, parts))
            version += 1
        assert r.read_point == read_point
        assert {r.p1, r.p2} == parts
        assert r.n_conflicts == (0 if r.txn_id == 0 else len(conflicts))
        assert r.committed == ok
        assert r.commit_version == (version if ok else None)
    # the log plants both outcomes: some commits, some aborts
    n_ok = sum(r.committed for r in rows)
    assert 0 < n_ok < 12
    # committed versions are dense 1..n_ok in txn order
    assert [r.commit_version for r in rows if r.committed] == list(
        range(1, n_ok + 1)
    )


def test_rdd_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["ev28_regression_discontinuity"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    orders = {
        o.o_orderkey: round(o.o_totalprice * 100)
        for o in load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        ).collect()
    }
    items = Counter(
        li.l_orderkey
        for li in load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    )
    keys = [k for k in orders if items[k] > 0]
    cents = sorted(orders[k] for k in keys)

    def interp_q(p):
        pos = p * (len(cents) - 1)
        lo = int(pos)
        hi = min(lo + 1, len(cents) - 1)
        return cents[lo] + (cents[hi] - cents[lo]) * (pos - lo)

    c = math.floor(interp_q(0.5))
    h = math.floor((interp_q(0.75) - interp_q(0.25)) / 2)
    assert (r.cutoff_cents, r.bandwidth_cents) == (c, h)
    sides = {0: [], 1: []}
    for k in keys:
        if abs(orders[k] - c) <= h:
            # both engines TRUNCATE signed integer division toward
            # zero (Python // floors) — replicate truncation
            d_ = orders[k] - c
            xq = -((-d_) // 100) if d_ < 0 else d_ // 100
            sides[1 if orders[k] >= c else 0].append((xq, items[k]))

    def fit(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        icept = (sy - slope * sx) / n
        return n, slope, icept

    ln, lslope, licept = fit(sides[0])
    rn, rslope, ricept = fit(sides[1])
    assert (r.n_left, r.n_right) == (ln, rn)
    assert abs(r.slope_left_micro - math.floor(lslope * 1_000_000)) <= 1
    assert abs(r.slope_right_micro - math.floor(rslope * 1_000_000)) <= 1
    assert abs(r.intercept_left_micro - math.floor(licept * 1_000_000)) <= 1
    assert abs(r.intercept_right_micro - math.floor(ricept * 1_000_000)) <= 1
    assert abs(r.rdd_effect_micro - math.floor((ricept - licept) * 1_000_000)) <= 1
    # uniform data: no true discontinuity — effect within +-1 basket item
    assert abs(r.rdd_effect_micro) < 1_000_000


def test_mann_kendall_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["ts15_mann_kendall"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # Spark-side epoch: see test_ljung_box_matches_exact_replay
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("long").alias("epoch"), "value"
    ).collect()
    daily = Counter()
    for e in ev:
        day = e.epoch // 86400 - 19723  # UTC days since 2024-01-01
        daily[day] += math.floor(e.value * 1000)
    days = sorted(daily)
    vals = [daily[d] for d in days]
    n = len(vals)
    s = sum(
        (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_sizes = [t_ for t_ in Counter(vals).values() if t_ > 1]
    tie_corr = sum(t_ * (t_ - 1) * (2 * t_ + 5) for t_ in tie_sizes)
    var18 = n * (n - 1) * (2 * n + 5) - tie_corr
    assert (r.n_days, r.s_stat, r.n_tie_groups, r.var18) == (
        n, s, len(tie_sizes), var18,
    )
    if s != 0 and var18 > 0:
        z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18)
        assert abs(r.z_micro - math.floor(z * 1_000_000)) <= 1
    assert r.reject_h0 == (1 if abs(r.z_micro) > 1959964 else 0)
    # |S| can never exceed the pair count
    assert abs(s) <= n * (n - 1) // 2


def test_friedman_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["m59_friedman_test"](spark, sf_dir).collect()
    assert [r.rule for r in rows] == ["items", "maxline", "price"]
    orders = {
        o.o_orderkey: (round(o.o_totalprice * 100), o.o_custkey,
                       1 if o.o_orderpriority == "1-URGENT" else 0)
        for o in load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_custkey", "o_orderpriority"
        ).collect()
    }
    items = Counter()
    maxline = {}
    for li in load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).collect():
        items[li.l_orderkey] += 1
        v = round(li.l_extendedprice * 100)
        if li.l_orderkey not in maxline or v > maxline[li.l_orderkey]:
            maxline[li.l_orderkey] = v
    cust = {
        c.c_custkey: c.c_nationkey
        for c in load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        ).collect()
    }
    by_nat = {}
    for k, (price, ck, label) in orders.items():
        if items[k] == 0:
            continue
        by_nat.setdefault(cust[ck], []).append(
            {"price": price, "items": items[k], "maxline": maxline[k], "label": label}
        )

    def auc_micro(samples, rule):
        scores = [s[rule] for s in samples]
        r2 = _avg_ranks_doubled(scores)
        np_ = sum(s["label"] for s in samples)
        nn = len(samples) - np_
        if np_ == 0 or nn == 0:
            return None
        pos_r2 = sum(v for v, s in zip(r2, samples) if s["label"] == 1)
        return (pos_r2 - np_ * (np_ + 1)) * 1_000_000 // (2 * np_ * nn)

    rank_sums = Counter()
    blocks = 0
    means = {"price": [], "items": [], "maxline": []}
    for nat, samples in by_nat.items():
        aucs = {rl: auc_micro(samples, rl) for rl in ("price", "items", "maxline")}
        if any(v is None for v in aucs.values()):
            continue
        blocks += 1
        vals = [aucs[rl] for rl in ("price", "items", "maxline")]
        r2 = _avg_ranks_doubled(vals)
        for rl, rr in zip(("price", "items", "maxline"), r2):
            rank_sums[rl] += rr
            means[rl].append(aucs[rl])
    dev2 = sum((rank_sums[rl] - blocks * 4) ** 2 for rl in rank_sums)
    chi2 = math.floor(12.0 / (blocks * 3 * 4) * dev2 / 4 * 1_000_000)
    for r in rows:
        assert r.n_blocks == blocks
        assert r.rank2x_sum == rank_sums[r.rule]
        assert r.mean_auc_micro == sum(means[r.rule]) // len(means[r.rule])
        assert r.friedman_chi2_micro == chi2
        assert r.reject_h0 == (1 if chi2 > 5991465 else 0)
    # each block contributes 2*(1+2+3) = 12 doubled rank units total
    assert sum(rank_sums.values()) == 12 * blocks


def test_bh_matches_exact_replay_and_dominates_holm(spark, sf_dir):
    from statistics import NormalDist

    bh = {r.seg: r for r in QUERIES["ev29_benjamini_hochberg"](spark, sf_dir).collect()}
    holm = {r.seg: r for r in QUERIES["ev23_holm_bonferroni"](spark, sf_dir).collect()}
    assert set(bh) == set(holm) and len(bh) == 5
    # identical inputs: same z^2 and same descending rank per segment
    for seg in bh:
        assert bh[seg].z2_micro == holm[seg].z2_micro
        assert bh[seg].rank == holm[seg].rank
    # replay the step-up rule from the emitted z^2/rank columns
    crit = [
        int(NormalDist().inv_cdf(1 - 0.025 * i / 5) ** 2 * 1_000_000)
        for i in range(1, 6)
    ]
    rows = sorted(bh.values(), key=lambda r: r.rank)
    pass_own = [r.z2_micro >= crit[r.rank - 1] for r in rows]
    max_pass = max((r.rank for r, p in zip(rows, pass_own) if p), default=0)
    for r, p in zip(rows, pass_own):
        assert r.rejected_raw == p
        assert r.rejected_bh == (r.rank <= max_pass)
    # BH (FDR) is never less powerful than Holm (FWER) on the same data
    for seg in bh:
        if holm[seg].rejected_holm:
            assert bh[seg].rejected_bh


def test_rich_club_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["graph_rich_club"](spark, sf_dir).collect()
    assert [r.k for r in rows] == [1, 2, 4, 8, 16, 32]
    edges = _trade_graph_edges(spark, sf_dir)
    deg = Counter(s for s, _ in edges)
    m2 = len(edges)
    n_all = len(deg)
    for r in rows:
        rich = {n for n, d in deg.items() if d > r.k}
        e_dir = sum(1 for s, d in edges if s in rich and d in rich)
        assert (r.n_rich, r.e_rich_directed) == (len(rich), e_dir)
        want = (
            0
            if len(rich) < 2
            else e_dir * 1_000_000 // (len(rich) * (len(rich) - 1))
        )
        assert r.phi_micro == want
    # monotone threshold: rich node sets shrink as k grows
    ns = [r.n_rich for r in rows]
    assert ns == sorted(ns, reverse=True) and ns[0] <= n_all
    # bipartite structure keeps hub density below the complete-graph
    # ceiling by construction (same-side hubs never link)
    assert all(0 <= r.phi_micro < 1_000_000 for r in rows)
    assert m2 % 2 == 0  # symmetric edge list


def _trade_graph_edges(spark, sf_dir):
    o = {
        x.o_orderkey: x.o_custkey
        for x in load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        ).collect()
    }
    pairs = {
        (o[li.l_orderkey] * 2, li.l_suppkey * 2 + 1)
        for li in load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        ).collect()
    }
    return [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
