"""Graph analytics, file 2 — graph.py reached the 2,000-LoC line
(1,906 after round 9's modularity + assortativity), so new graph
operators land here (the VERDICT r8 #6 family-file rule).

Same contract as graph.py: integer node ids, cached src-partitioned
edge relations, BIGINT state, oracle SQL replaying the identical
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_engine.dedup import cache_once
from realestate_engine.graph import trade_edges
from realestate_engine.registry import register

_RICH_KS = [1, 2, 4, 8, 16, 32]

# Rich-club coefficient phi(k) = E_k / (N_k * (N_k - 1) / 2) with E_k
# the UNDIRECTED edge count among nodes of degree > k — carried as
# directed/2 exactly (the symmetric edge list makes e_dir even), so
# phi_micro = e_dir * 1e6 / (n * (n-1)) is ONE all-integer division
# (numerator <= m2 * 1e6: BIGINT-safe below ~9e12 directed edges;
# operands non-negative, where DIV and // agree). The operator spells
# integer division differently per engine (Spark DIV, DuckDB //), so
# the text takes it as a parameter.
def _rich_phi(idiv: str) -> str:
    return (
        "CAST(CASE WHEN n_rich < 2 THEN 0 ELSE"
        f" e_rich_directed * 1000000 {idiv} (n_rich * (n_rich - 1)) END AS BIGINT)"
    )

_RICH_ORACLE = f"""
    WITH pairs AS (
        SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT c AS src, s AS dst FROM pairs
        UNION ALL
        SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY src),
    ks AS (SELECT UNNEST({_RICH_KS}) AS k),
    nodes_k AS (
        SELECT ks.k, CAST(COUNT(deg.d) AS BIGINT) AS n_rich
        FROM ks LEFT JOIN deg ON deg.d > ks.k
        GROUP BY ks.k
    ),
    edges_k AS (
        SELECT ks.k, CAST(COUNT(j.d_src) AS BIGINT) AS e_rich_directed
        FROM ks
        LEFT JOIN (
            SELECT ds.d AS d_src, dd.d AS d_dst
            FROM edges e
            JOIN deg ds ON ds.node = e.src
            JOIN deg dd ON dd.node = e.dst
        ) j ON j.d_src > ks.k AND j.d_dst > ks.k
        GROUP BY ks.k
    )
    SELECT CAST(n.k AS BIGINT) AS k,
           n.n_rich,
           e.e_rich_directed,
           {_rich_phi("//")} AS phi_micro
    FROM nodes_k n JOIN edges_k e ON e.k = n.k
    ORDER BY k
"""


@register("graph_rich_club", _RICH_ORACLE)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the trade graph at degree thresholds
    k in {{1,2,4,8,16,32}} — phi(k) = density among nodes of degree
    > k: "do the hubs trade with EACH OTHER, or only with the
    periphery?" The structural complement to graph_degree_assortativity
    (assortativity is one correlation over all edges; the rich-club
    curve localizes it to the hub subgraph at each threshold — on a
    bipartite customer<->supplier graph hubs of the same side never
    link, so phi stays far below an equivalent unipartite graph's, and
    the replay test pins phi <= the overall density ratio shape).
    Plan: degree census off the cached src-partitioned edges (the
    assortativity shape), endpoint-degree join once, then a 6-way
    threshold fan-out of COUNTS — the k-grid multiplies a node/edge
    CENSUS, never the corpus. Exactness: counts are BIGINT; phi is one
    all-integer micro division (_rich_phi; e_dir is even by edge-list
    symmetry so the directed count IS 2x the undirected count the
    classic definition wants — the /2 cancels in the ratio)."""
    edges = trade_edges(spark, sf_dir)
    edges_p = cache_once(edges.repartition("src"))
    deg = edges_p.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ks = spark.range(0).sparkSession.createDataFrame(
        [(k,) for k in _RICH_KS], "k bigint"
    )
    nodes_k = (
        deg.join(F.broadcast(ks), deg.d > ks.k, "right")
        .groupBy("k")
        .agg(F.count(deg.d).cast("bigint").alias("n_rich"))
    )
    endp = (
        edges_p.join(
            deg.select(F.col("src").alias("e_src"), F.col("d").alias("d_src")),
            F.col("src") == F.col("e_src"),
        )
        .join(
            deg.select(F.col("src").alias("e_dst"), F.col("d").alias("d_dst")),
            F.col("dst") == F.col("e_dst"),
        )
        .select("d_src", "d_dst")
    )
    edges_k = (
        endp.join(
            F.broadcast(ks),
            (F.col("d_src") > F.col("k")) & (F.col("d_dst") > F.col("k")),
            "right",
        )
        .groupBy("k")
        .agg(F.count("d_src").cast("bigint").alias("e_rich_directed"))
    )
    return (
        nodes_k.join(edges_k, "k")
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_rich",
            "e_rich_directed",
            F.expr(_rich_phi("DIV")).alias("phi_micro"),
        )
        .orderBy("k")
    )
