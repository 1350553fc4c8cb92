"""Property-based tests (hypothesis) for the deterministic kernels:
Z-order interleaving and fixed-point PageRank. Each example batches
many rows into ONE Spark job so the property sweep stays fast."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.test_graph_sources import _py_interleave, _reference_pagerank

COMMON = dict(
    deadline=None,
    max_examples=5,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)), min_size=1, max_size=64
    )
)
@settings(**COMMON)
def test_zorder_interleave_property(spark, pairs):
    from realestate_engine.queries_extra import _interleave_bits_expr

    df = spark.createDataFrame(pairs, ["xm", "ym"]).select(
        "xm", "ym", F.expr(_interleave_bits_expr("xm", "ym")).cast("bigint").alias("zval")
    )
    for r in df.collect():
        assert r["zval"] == _py_interleave(r["xm"], r["ym"])


@given(
    raw_edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    ),
    n_iter=st.integers(1, 3),
)
@settings(**COMMON)
def test_pagerank_property(spark, raw_edges, n_iter):
    from realestate_engine.graph import pagerank_fixed_point

    # undirected, deduped — matches the engine's edge contract
    edges = sorted({(f"n{a}", f"n{b}") for a, b in raw_edges} | {
        (f"n{b}", f"n{a}") for a, b in raw_edges
    })
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank_micro"] for r in pagerank_fixed_point(df, n_iter).collect()}
    assert got == _reference_pagerank(edges, n_iter)
