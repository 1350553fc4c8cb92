"""Round-9 late-wave operators (new family file per VERDICT r8 #6 —
queries_extra.py and queries_experiments.py sit at the 2,000-LoC
line, so new assorted operators land here).

Contents: Markov transition matrix + stationary distribution (ev26).
Full-oracle, integer-exact under the registry's cross-engine
determinism rules (registry.py module docstring). (An earlier draft
also carried a time-RANGE window frame and a Zipf fit — both already
exist as ts_rolling_interval_window and t19_zipf_fit; dropped as
duplicates before registration.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realestate_engine.registry import register, t

# --- EV26: Markov transition matrix + stationary distribution ----------------

_MARKOV_SCALE = 1_000_000_000_000  # pi kept in 1e12 fixed-point units
_MARKOV_ITER = 3


def _markov_iter_sql(prev: str, out: str) -> str:
    """One unrolled power-iteration step: pi'_dst = sum over src of
    floor(pi_src * P_micro / 1e6) — per-term floor then BIGINT sum,
    order-free (the pagerank contract, graph.py module docstring)."""
    return f"""
    {out} AS (
        SELECT p.dst AS state,
               CAST(SUM(v.pi * p.p_micro // 1000000) AS BIGINT) AS pi
        FROM {prev} v JOIN pmat p ON p.src = v.state
        GROUP BY p.dst
    )"""


_EV26_ORACLE = f"""
    WITH seq AS (
        SELECT event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type AS src, event_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    rowtot AS (
        SELECT src, CAST(SUM(n) AS BIGINT) AS tot FROM trans GROUP BY src
    ),
    pmat AS MATERIALIZED (
        SELECT tr.src, tr.dst, tr.n,
               CAST(tr.n * 1000000 // rt.tot AS BIGINT) AS p_micro
        FROM trans tr JOIN rowtot rt ON rt.src = tr.src
    ),
    states AS (SELECT src AS state FROM rowtot),
    pi0 AS (
        SELECT state,
               CAST({_MARKOV_SCALE} // (SELECT COUNT(*) FROM states) AS BIGINT)
                   AS pi
        FROM states
    ),
    {",".join(_markov_iter_sql(f"pi{i}", f"pi{i + 1}") for i in range(_MARKOV_ITER))}
    SELECT s.state AS event_type,
           rt.tot AS n_out_transitions,
           CAST(COALESCE(
               (SELECT p.p_micro FROM pmat p
                WHERE p.src = s.state AND p.dst = s.state), 0) AS BIGINT)
               AS self_loop_micro,
           CAST(COALESCE(pf.pi, 0) AS BIGINT) AS stationary_pico
    FROM states s
    JOIN rowtot rt ON rt.src = s.state
    LEFT JOIN pi{_MARKOV_ITER} pf ON pf.state = s.state
    ORDER BY event_type
"""


@register("ev26_markov_stationary", _EV26_ORACLE)
def ev26_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV26: user-journey Markov chain — the event-type transition
    matrix estimated from per-user event sequences, plus the
    stationary distribution after 3 (_MARKOV_ITER) fixed-point power
    iterations from uniform. The product-analytics "where does the
    journey settle" readout (and the core of Markov attribution
    models). Emits per state: outgoing-transition count, self-loop
    probability, stationary mass.

    Split of work: the DATA-sized stage is one lag window per user
    (single shuffle on user_id) + one hash agg into the K x K count
    matrix; the ITERATION then runs on the K^2-row matrix — broadcast
    joins, never a corpus rescan (the pagerank posture, except here
    the state fits in one executor because event-type domains are
    small even at 100 TB). Determinism: row-normalized probabilities
    and every pi update are integer fixed-point with per-term floors
    (1e6-unit P, 1e12-unit pi), so the power iteration is bit-exact
    across engines; the oracle unrolls the same 3 steps as CTEs. States are the types with >=1 outgoing transition; mass
    reaching an absorbing tail type simply leaves the system —
    mirrored on both sides."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # K x K matrix: tiny from here on — cache the collected-size frames
    trans = trans.localCheckpoint()
    rowtot = trans.groupBy("src").agg(F.sum("n").cast("bigint").alias("tot"))
    pmat = (
        trans.join(F.broadcast(rowtot), "src")
        .select(
            "src",
            "dst",
            "n",
            F.expr("CAST(n * 1000000 DIV tot AS BIGINT)").alias("p_micro"),
        )
        .localCheckpoint()
    )
    states = rowtot.select(F.col("src").alias("state"))
    n_states = states.count()
    pi = states.select(
        "state", F.lit(_MARKOV_SCALE // n_states).cast("bigint").alias("pi")
    )
    for _ in range(_MARKOV_ITER):
        pi = (
            pi.join(F.broadcast(pmat), pi.state == pmat.src)
            .groupBy(F.col("dst").alias("state"))
            .agg(
                F.sum(F.expr("pi * p_micro DIV 1000000")).cast("bigint").alias("pi")
            )
        )
    self_loop = pmat.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("state"), F.col("p_micro").alias("self_loop_micro")
    )
    return (
        states.join(F.broadcast(rowtot), states.state == rowtot.src)
        .join(F.broadcast(self_loop), "state", "left")
        .join(F.broadcast(pi.withColumnRenamed("pi", "pi_final")), "state", "left")
        .select(
            F.col("state").alias("event_type"),
            F.col("tot").alias("n_out_transitions"),
            F.coalesce("self_loop_micro", F.lit(0)).cast("bigint").alias("self_loop_micro"),
            F.coalesce("pi_final", F.lit(0)).cast("bigint").alias("stationary_pico"),
        )
        .orderBy("event_type")
    )
