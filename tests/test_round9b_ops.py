"""Round-9 late-wave additions: Adamic-Adar link prediction, the
Markov stationary distribution, and the label-propagation modularity
audit — each replayed exactly in Python (the property-test posture:
the oracle proves cross-engine agreement, the replay proves the MATH
is the one we claim)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from realestate_engine.registry import QUERIES, load_all
from realestate_engine.registry import t as load_table

load_all()


def _co_purchase_pairs(spark, sf_dir):
    """Support->=2 part co-purchase edge set {(u, v) u < v}, replayed."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(list)  # lineitem ROWS, not a set: support counts
    for r in li:  # row pairs, so a repeated part multiplies (the same
        by_order[r.l_orderkey].append(r.l_partkey)  # semantics as the triangle census)
    support = Counter()
    for parts in by_order.values():
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                if a != b:
                    support[(min(a, b), max(a, b))] += 1
    return {p for p, n in support.items() if n >= 2}


def test_adamic_adar_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["graph_adamic_adar"](spark, sf_dir).collect()
    assert rows, "no candidate pairs at sf0.001"
    pairs = _co_purchase_pairs(spark, sf_dir)
    nbrs = defaultdict(set)
    for u, v in pairs:
        nbrs[u].add(v)
        nbrs[v].add(u)
    scores = {}
    for u in nbrs:
        for v in nbrs:
            if u < v and (u, v) not in pairs:
                common = nbrs[u] & nbrs[v]
                if common:
                    aa = sum(math.floor(1_000_000.0 / math.log(len(nbrs[w]))) for w in common)
                    jac = len(common) * 1_000_000 // (len(nbrs[u]) + len(nbrs[v]) - len(common))
                    scores[(u, v)] = (len(common), aa, jac)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:25]
    got = [((r.u, r.v), (r.common_neighbors, r.aa_micro, r.jaccard_micro)) for r in rows]
    assert got == want


def test_markov_stationary_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["ev26_markov_stationary"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    trans = Counter()
    for seq in by_user.values():
        seq.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(seq, seq[1:]):
            trans[(a.event_type, b.event_type)] += 1
    rowtot = Counter()
    for (s, _), n in trans.items():
        rowtot[s] += n
    pmat = {(s, d): n * 1_000_000 // rowtot[s] for (s, d), n in trans.items()}
    states = sorted(rowtot)
    pi = {s: 1_000_000_000_000 // len(states) for s in states}
    for _ in range(3):
        nxt = defaultdict(int)
        for (s, d), p in pmat.items():
            if s in pi:
                nxt[d] += pi[s] * p // 1_000_000
        pi = nxt
    got = {r.event_type: r for r in rows}
    assert set(got) == set(states)
    for s in states:
        assert got[s].n_out_transitions == rowtot[s]
        assert got[s].self_loop_micro == pmat.get((s, s), 0)
        assert got[s].stationary_pico == pi.get(s, 0)
    # mass can only leak through floors / absorbing tails, never grow
    assert sum(r.stationary_pico for r in rows) <= 1_000_000_000_000


def _trade_graph(spark, sf_dir):
    """Symmetrized customer<->supplier trade edge list, replayed."""
    o = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    }
    pairs = {
        (o[r.l_orderkey] * 2, r.l_suppkey * 2 + 1)
        for r in load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").collect()
    }
    return [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]


def test_modularity_matches_exact_replay(spark, sf_dir):
    rows = QUERIES["graph_modularity"](spark, sf_dir).collect()
    assert rows
    edges = _trade_graph(spark, sf_dir)
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[s].append(d)
    labels = {n: n for n in nbrs}
    for _ in range(3):  # sync majority vote, ties -> smallest label
        nxt = {}
        for n, ns in nbrs.items():
            votes = Counter(labels[d] for d in ns)
            nxt[n] = min(l for l, c in votes.items() if c == max(votes.values()))
        labels = nxt
    m2 = len(edges)
    size, dsum, within = Counter(), Counter(), Counter()
    for n, ns in nbrs.items():
        size[labels[n]] += 1
        dsum[labels[n]] += len(ns)
    for s, d in edges:
        if labels[s] == labels[d]:
            within[labels[s]] += 1
    want = sorted(
        (
            (
                c,
                size[c],
                dsum[c],
                within[c],
                math.floor(within[c] / m2 * 1_000_000_000)
                - math.floor((dsum[c] / m2) * (dsum[c] / m2) * 1_000_000_000),
            )
            for c in size
        ),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    got = [
        (r.community, r.size, r.degree_sum, r.within_directed, r.modularity_term_nano)
        for r in rows
    ]
    assert got == want
    # degree mass is conserved and within-edges never exceed the total
    assert sum(dsum.values()) == m2
    assert sum(within.values()) <= m2
    # Newman's bounds: Q in [-1/2, 1). On the bipartite trade graph LP
    # labels the two SIDES (every edge crosses), so Q sits at exactly
    # -1/2 — the textbook anti-community case, and a real negative
    # control for the formula (a buggy sign or a dropped square would
    # leave the band).
    if len(want) == len(size):
        q_nano = sum(t[4] for t in want)
        assert -500_000_000 - len(size) <= q_nano < 1_000_000_000
