"""Tests for the graph module (fixed-point PageRank) and the
binaryFile source scan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realestate_engine.graph import SCALE, pagerank_fixed_point
from realestate_engine.queries_extra import s13_binaryfile_scan


def _reference_pagerank(edges: list[tuple[str, str]], n_iter: int) -> dict[str, int]:
    """Plain-Python mirror of the integer recurrence."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {v: SCALE // n for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += ranks[s] // deg[s]
        ranks = {v: (15 * SCALE) // (100 * n) + (85 * inflow[v]) // 100 for v in nodes}
    return ranks


def test_pagerank_matches_exact_recurrence(spark):
    edges = [
        ("a", "b"), ("b", "a"),
        ("a", "c"), ("c", "a"),
        ("b", "c"), ("c", "b"),
        ("c", "d"), ("d", "c"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank_micro"] for r in pagerank_fixed_point(df, 3).collect()}
    want = _reference_pagerank(edges, 3)
    assert got == want
    # total rank mass stays ~1.0 (floor losses only: < n_nodes units per step)
    assert abs(sum(got.values()) - SCALE) < 4 * len(want) * 4


def test_pagerank_hub_ordering(spark, sf_dir):
    from realestate_engine.graph import graph_pagerank_trade

    rows = graph_pagerank_trade(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    ranks = [r["rank_micro"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # suppliers aggregate many customers' mass -> the top hub is an 's' node
    assert rows[0]["node"].startswith("s")


def test_binaryfile_lengths_match_filesystem(spark, sf_dir):
    rows = s13_binaryfile_scan(spark, sf_dir).collect()
    assert {r["table_name"] for r in rows} == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for r in rows:
        path = os.path.join(sf_dir, r["table_name"] + ".parquet")
        assert r["n_bytes"] == os.path.getsize(path)
        assert r["content_bytes"] == r["n_bytes"]
