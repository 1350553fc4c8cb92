"""Round-9 second late wave: Ljung-Box portmanteau test — replayed
exactly in Python (the property-test posture: the oracle proves
cross-engine agreement, the replay proves the MATH is the one we
claim)."""

from __future__ import annotations

import math
from collections import Counter

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
    ev = load_table(spark, sf_dir, "events").select("ts", "value").collect()
    daily = Counter()
    for r in ev:
        day = (r.ts.date() - __import__("datetime").date(2024, 1, 1)).days
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
