"""Round-5 operator additions: Bloom-filter join pruning, GROUPING
SETS, Merkle-style partition diffing, and WoE/IV feature binning.

Each query pairs a Spark-first plan with a DuckDB oracle built on the
repo's engine-portable integer idioms (md5-prefix hashes, integer
cents, FLOOR-scaled micros, bit_or lane aggregates) so every value
hash-compares across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_engine.dedup import cache_once, portable_hash32
from realestate_engine.registry import register, t

# --- Bloom-filter semi-join pruning ----------------------------------------
#
# The 100 TB pattern Spark's own runtime row-group filtering implements
# (spark.sql.optimizer.runtime.bloomFilter.enabled): build a compact
# Bloom filter over the small side's join keys, broadcast it, and drop
# non-matching fact rows BEFORE the shuffle. Here the filter is built
# with engine-portable arithmetic (two affine md5-prefix hashes over
# 2^16 bits packed into 1024 BIGINT lanes via bit_or), so DuckDB
# replays the exact same bit array and the false-positive accounting
# hash-compares. reference has no analogue; this is pure scale
# machinery the engine needs at 100 TB.

_BLOOM_BITS = 1 << 16
_BLOOM_LANES = _BLOOM_BITS // 64
# affine lane constants (same family as the minhash lanes in dedup.py)
_BLOOM_A = (769, 1543)
_BLOOM_B = (12289, 24593)
_BLOOM_P = 2_147_483_647  # 2^31 - 1


def _bloom_lane(h, i: int):
    """i-th Bloom bit index from ONE md5-prefix hash: double hashing —
    the md5 is computed once per key and both lanes are cheap affine
    transforms of it (standard Bloom practice; halves the dominant
    hash cost on both engines). Integer math only."""
    return ((h * _BLOOM_A[i] + _BLOOM_B[i]) % _BLOOM_P) % _BLOOM_BITS


_BLOOM_H_SQL = "(('0x' || SUBSTR(MD5(CAST({e} AS VARCHAR)), 1, 8))::BIGINT)"


def _bloom_lane_sql(hexpr: str, i: int) -> str:
    return f"(({hexpr} * {_BLOOM_A[i]} + {_BLOOM_B[i]}) % {_BLOOM_P}) % {_BLOOM_BITS}"


def _bit_sql(expr: str) -> str:
    """1 << (expr) as BIGINT in DuckDB; bit 63 spelled as the min-BIGINT
    literal because DuckDB raises on the overflowing shift (Spark's
    shiftleft wraps)."""
    return (
        f"CASE WHEN ({expr}) = 63 THEN (-9223372036854775807 - 1) "
        f"ELSE (1::BIGINT << ({expr})) END"
    )


@register(
    "j10_bloom_join_prune",
    f"""
    WITH keys AS (
        SELECT DISTINCT o_orderkey AS k
        FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    keyh AS (
        SELECT {_BLOOM_H_SQL.format(e='k')} AS h FROM keys
    ),
    bits AS (
        SELECT {_bloom_lane_sql('h', 0)} AS b FROM keyh
        UNION ALL
        SELECT {_bloom_lane_sql('h', 1)} AS b FROM keyh
    ),
    bloom AS (
        SELECT b // 64 AS lane, BIT_OR({_bit_sql('b % 64')}) AS lanebits
        FROM bits GROUP BY 1
    ),
    probes AS (
        SELECT l_orderkey,
               {_bloom_lane_sql('h', 0)} AS b0,
               {_bloom_lane_sql('h', 1)} AS b1
        FROM (SELECT l_orderkey, {_BLOOM_H_SQL.format(e='l_orderkey')} AS h FROM lineitem)
    ),
    candidates AS (
        SELECT p.l_orderkey
        FROM probes p
        JOIN bloom m0 ON m0.lane = p.b0 // 64
        JOIN bloom m1 ON m1.lane = p.b1 // 64
        WHERE (m0.lanebits & ({_bit_sql('p.b0 % 64')})) <> 0
          AND (m1.lanebits & ({_bit_sql('p.b1 % 64')})) <> 0
    ),
    stats AS (
        SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_probes,
               CAST((SELECT COUNT(*) FROM candidates) AS BIGINT) AS n_candidates,
               CAST((SELECT COUNT(*) FROM candidates c JOIN keys ON keys.k = c.l_orderkey)
                    AS BIGINT) AS n_matched
    )
    SELECT n_keys, n_probes, n_candidates, n_matched,
           n_candidates - n_matched AS n_false_pos,
           CAST(FLOOR((n_candidates - n_matched) * 1e6 /
                      GREATEST(n_probes - n_matched, 1)) AS BIGINT) AS fp_rate_micro
    FROM stats
    """,
)
def j10_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: Bloom-filter semi-join pruning — build a 2^16-bit Bloom
    filter (two affine md5-prefix hashes, bits packed into 1024 BIGINT
    lanes by bit_or) over the urgent orders' keys, broadcast it, and
    pre-filter lineitem before the real join would shuffle it. Reports
    the pruning ledger: probe count, Bloom-passed candidates, exact
    matches, false positives, and the realized FP rate in micros.

    Scale shape: the filter is <= 1024 rows regardless of key count —
    a broadcast, never a shuffle; each probe joins the broadcast lane
    table twice (BroadcastHashJoin) and the fact table is reduced
    BEFORE any wide operation. This is the manual form of Spark's
    runtime bloomFilter rewrite, with portable math so the oracle can
    replay the exact bit array."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    # the key set feeds the filter build, the exact-match flag AND the
    # ledger count — cache it once (bounded, see cache_once contract)
    keys = cache_once(
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    keyh = keys.select(portable_hash32(F.col("k").cast("string")).alias("h"))
    bits = keyh.select(_bloom_lane(F.col("h"), 0).alias("b")).unionAll(
        keyh.select(_bloom_lane(F.col("h"), 1).alias("b"))
    )
    bloom = bits.groupBy((F.col("b") / 64).cast("long").alias("lane")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(b % 64 AS INT))")).alias("lanebits")
    )
    probes = li.select(
        "l_orderkey", portable_hash32(F.col("l_orderkey").cast("string")).alias("h")
    ).select(
        "l_orderkey",
        _bloom_lane(F.col("h"), 0).alias("b0"),
        _bloom_lane(F.col("h"), 1).alias("b1"),
    )
    m0 = bloom.select(F.col("lane").alias("lane0"), F.col("lanebits").alias("bits0"))
    m1 = bloom.select(F.col("lane").alias("lane1"), F.col("lanebits").alias("bits1"))
    candidates = (
        probes.join(F.broadcast(m0), (F.col("b0") / 64).cast("long") == F.col("lane0"))
        .join(F.broadcast(m1), (F.col("b1") / 64).cast("long") == F.col("lane1"))
        .filter(
            (F.col("bits0").bitwiseAND(F.expr("shiftleft(1L, CAST(b0 % 64 AS INT))")) != 0)
            & (F.col("bits1").bitwiseAND(F.expr("shiftleft(1L, CAST(b1 % 64 AS INT))")) != 0)
        )
        .select("l_orderkey")
    )
    n_keys = keys.agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    n_probes = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_probes"))
    # one pass over the candidate set yields BOTH ledger counts: flag
    # each candidate against the key set and aggregate, instead of
    # counting candidates twice. No forced broadcast here — the key
    # set grows with the dim side, so Catalyst/AQE picks broadcast vs
    # shuffle by its actual size (only the <=1024-row lane table is
    # unconditionally broadcast-able)
    cand_stats = (
        candidates.join(
            keys.withColumn("m", F.lit(1)),
            candidates.l_orderkey == F.col("k"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).cast("bigint").alias("n_matched"),
        )
    )
    out = n_keys.crossJoin(F.broadcast(n_probes)).crossJoin(F.broadcast(cand_stats))
    return out.select(
        "n_keys",
        "n_probes",
        "n_candidates",
        "n_matched",
        (F.col("n_candidates") - F.col("n_matched")).alias("n_false_pos"),
        F.floor(
            (F.col("n_candidates") - F.col("n_matched"))
            * 1e6
            / F.greatest(F.col("n_probes") - F.col("n_matched"), F.lit(1))
        )
        .cast("bigint")
        .alias("fp_rate_micro"),
    )


@register(
    "sql_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
    ORDER BY gid, returnflag, linestatus
    """,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: explicit GROUPING SETS with grouping_id
    disambiguation — the general form behind rollup (a10) and cube
    (a11), here with a non-hierarchical set list (both margins + total)
    that neither rollup nor cube alone expresses. COALESCE + the
    grouping bits distinguish 'NULL because aggregated away' from a
    genuine NULL group value. One Expand + one hash aggregate; the
    expand factor equals the number of sets (4), and partial
    aggregation still applies before the shuffle."""
    li = t(spark, sf_dir, "lineitem")
    df = li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("bigint")
        .alias("gid"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return df.select(
        F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
        "gid",
        "rev_cents",
        "n",
    ).orderBy("gid", "returnflag", "linestatus")


@register(
    "dq12_merkle_bucket_diff",
    """
    WITH mutated AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0
                    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1
                    ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
        FROM orders
    ),
    a AS (
        SELECT o_orderkey % 64 AS bucket,
               CAST(SUM(('0x' || SUBSTR(MD5(CONCAT(CAST(o_orderkey AS VARCHAR), ':',
                    CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR))), 1, 8))::BIGINT)
                    AS BIGINT) AS fp,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    b AS (
        SELECT o_orderkey % 64 AS bucket,
               CAST(SUM(('0x' || SUBSTR(MD5(CONCAT(CAST(o_orderkey AS VARCHAR), ':',
                    CAST(cents AS VARCHAR))), 1, 8))::BIGINT) AS BIGINT) AS fp,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM mutated GROUP BY 1
    )
    SELECT a.bucket, a.n AS n_rows,
           (a.fp <> b.fp) AS differs
    FROM a JOIN b ON a.bucket = b.bucket
    WHERE a.fp <> b.fp
    ORDER BY a.bucket
    """,
)
def dq12_merkle_bucket_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ12: Merkle-style bucket diff — the anti-entropy primitive for
    synchronizing two 100 TB copies of a table without comparing rows:
    fingerprint each side per key-bucket (order-independent SUM of
    portable row hashes), join the two 64-row fingerprint frames, and
    only the buckets whose digests differ need row-level reconciliation
    (here: a deterministic mutation of every 97th order's cents, so
    exactly the buckets containing a multiple of 97 differ). Each side
    is one partial-aggregated scan; the diff join touches 64 rows
    regardless of table size — this is how dq11's whole-table
    fingerprint generalizes into an incremental-repair plan."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")

    def side(cents_col) -> DataFrame:
        row_fp = portable_hash32(
            F.concat_ws(":", F.col("o_orderkey").cast("string"), cents_col.cast("string"))
        )
        return o.groupBy((F.col("o_orderkey") % 64).alias("bucket")).agg(
            F.sum(row_fp).cast("bigint").alias("fp"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )

    a = side(cents)
    mutated = F.when(F.col("o_orderkey") % 97 == 0, cents + 1).otherwise(cents)
    b = side(mutated)
    return (
        a.alias("a")
        .join(b.alias("b"), "bucket")
        .filter(F.col("a.fp") != F.col("b.fp"))
        .select(
            "bucket",
            F.col("a.n").alias("n_rows"),
            (F.col("a.fp") != F.col("b.fp")).alias("differs"),
        )
        .orderBy("bucket")
    )


@register(
    "m30_woe_iv_binning",
    """
    WITH base AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        FROM orders
    ),
    cuts AS (
        SELECT quantile_disc(cents, [0.2, 0.4, 0.6, 0.8]) AS qs FROM base
    ),
    binned AS (
        SELECT pos,
               CASE WHEN cents <= qs[1] THEN 0
                    WHEN cents <= qs[2] THEN 1
                    WHEN cents <= qs[3] THEN 2
                    WHEN cents <= qs[4] THEN 3
                    ELSE 4 END AS bin
        FROM base, cuts
    ),
    tot AS (
        SELECT SUM(pos) AS n_pos_tot, SUM(1 - pos) AS n_neg_tot FROM binned
    ),
    per_bin AS (
        SELECT bin, CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(1 - pos) AS BIGINT) AS n_neg
        FROM binned GROUP BY bin
    )
    SELECT CAST(bin AS BIGINT) AS bin, n_pos, n_neg,
           CAST(FLOOR(LN((n_pos * 1.0 / n_pos_tot) / (n_neg * 1.0 / n_neg_tot)) * 1e6)
                AS BIGINT) AS woe_micro
    FROM per_bin, tot
    ORDER BY bin
    """,
)
def m30_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M30: weight-of-evidence feature binning — the credit-scoring /
    feature-engineering classic: bucket a numeric feature into
    population quintiles, then score each bin by ln((pos share)/(neg
    share)). Label = order status 'F'. The quintile cuts are an exact
    discrete quantile (GK accuracy > n, as a6/a23) broadcast as one
    row; binning is a codegen'd CASE; one partial-aggregated groupBy
    produces the 5-row ledger; totals broadcast back. WoE is reported
    as FLOOR-scaled micros: the shares are single IEEE divisions and
    ln is correctly-rounded-close across libm — floor-scaling absorbs
    the last-ulp wobble that ROUND could flip at a half boundary."""
    o = t(spark, sf_dir, "orders")
    base = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    cuts = base.agg(
        F.percentile_approx("cents", [0.2, 0.4, 0.6, 0.8], 10_000_000).alias("qs")
    )
    binned = base.crossJoin(F.broadcast(cuts)).select(
        "pos",
        F.when(F.col("cents") <= F.col("qs")[0], 0)
        .when(F.col("cents") <= F.col("qs")[1], 1)
        .when(F.col("cents") <= F.col("qs")[2], 2)
        .when(F.col("cents") <= F.col("qs")[3], 3)
        .otherwise(4)
        .alias("bin"),
    )
    tot = binned.agg(
        F.sum("pos").alias("n_pos_tot"), F.sum(1 - F.col("pos")).alias("n_neg_tot")
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            "n_pos",
            "n_neg",
            F.floor(
                F.log(
                    (F.col("n_pos") * 1.0 / F.col("n_pos_tot"))
                    / (F.col("n_neg") * 1.0 / F.col("n_neg_tot"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("woe_micro"),
        )
        .orderBy("bin")
    )


@register(
    "x21_retraction_ivm",
    """
    WITH base AS (
        SELECT o_orderpriority, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 5 <> 0
    ),
    deletes AS (
        SELECT * FROM base WHERE o_orderkey % 10 = 1
    ),
    inserts AS (
        SELECT o_orderpriority, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    state AS (
        SELECT o_orderpriority, SUM(cents) AS cents, CAST(COUNT(*) AS BIGINT) AS n,
               MIN(cents) AS min_cents
        FROM base GROUP BY 1
    ),
    delta AS (
        SELECT o_orderpriority, SUM(w * cents) AS cents, CAST(SUM(w) AS BIGINT) AS n
        FROM (
            SELECT o_orderpriority, cents, -1 AS w FROM deletes
            UNION ALL
            SELECT o_orderpriority, cents, 1 AS w FROM inserts
        )
        GROUP BY 1
    ),
    merged AS (
        SELECT o_orderpriority, SUM(cents) AS cents, SUM(n) AS n
        FROM (
            SELECT o_orderpriority, cents, n FROM state
            UNION ALL
            SELECT o_orderpriority, cents, n FROM delta
        )
        GROUP BY 1
    ),
    final_rows AS (
        SELECT o_orderpriority, cents FROM base
        WHERE o_orderkey % 10 <> 1
        UNION ALL
        SELECT o_orderpriority, cents FROM inserts
    ),
    direct AS (
        SELECT o_orderpriority, SUM(cents) AS cents, CAST(COUNT(*) AS BIGINT) AS n,
               MIN(cents) AS min_cents
        FROM final_rows GROUP BY 1
    ),
    min_hit AS (
        SELECT s.o_orderpriority,
               MAX(CASE WHEN d.cents = s.min_cents THEN 1 ELSE 0 END) AS hit
        FROM state s LEFT JOIN deletes d ON d.o_orderpriority = s.o_orderpriority
        GROUP BY 1
    )
    SELECT m.o_orderpriority,
           CAST(m.n AS BIGINT) AS n_orders,
           CAST(m.cents AS BIGINT) AS total_cents,
           (m.cents = d.cents AND m.n = d.n) AS matches_direct,
           CAST(d.min_cents AS BIGINT) AS min_cents,
           (h.hit = 1) AS min_recomputed
    FROM merged m
    JOIN direct d USING (o_orderpriority)
    JOIN min_hit h USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
)
def x21_retraction_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21: incremental view maintenance UNDER DELETES — the case x8's
    insert-only merge can't handle. A CDC batch arrives as signed rows
    (+1 inserts, -1 retractions); SUM/COUNT state absorbs both by
    weighted re-aggregation of mergeable integer state — no base
    re-scan — and the plan carries its own proof (matches_direct
    compares the maintained state against a direct recompute of the
    post-CDC table). MIN is deliberately included as the
    NON-retractable aggregate: when a retracted row equals the stored
    group minimum the state can't answer, so the query surfaces
    min_recomputed per group and takes the recompute fallback for the
    min column only — exactly the split a production IVM pipeline
    makes (accumulator aggregates absorb deltas; extrema trigger
    per-group repair). All state is exact integer cents, so the merge
    is associative and the oracle replays it bit-for-bit."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderpriority", "o_orderkey", cents.alias("cents")
    )
    deletes = base.filter(F.col("o_orderkey") % 10 == 1)
    inserts = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderpriority", "o_orderkey", cents.alias("cents")
    )
    state = base.groupBy("o_orderpriority").agg(
        F.sum("cents").alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("cents").alias("min_cents"),
    )
    delta = (
        deletes.select("o_orderpriority", "cents", F.lit(-1).alias("w"))
        .unionByName(inserts.select("o_orderpriority", "cents", F.lit(1).alias("w")))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("cents"),
            F.sum("w").cast("bigint").alias("n"),
        )
    )
    merged = (
        state.select("o_orderpriority", "cents", "n")
        .unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("cents").alias("cents"), F.sum("n").alias("n"))
    )
    final_rows = base.filter(F.col("o_orderkey") % 10 != 1).unionByName(inserts)
    direct = final_rows.groupBy("o_orderpriority").agg(
        F.sum("cents").alias("d_cents"),
        F.count(F.lit(1)).cast("bigint").alias("d_n"),
        F.min("cents").alias("d_min"),
    )
    min_hit = (
        state.select("o_orderpriority", "min_cents")
        .join(
            deletes.select("o_orderpriority", F.col("cents").alias("del_cents")),
            "o_orderpriority",
            "left",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.max(
                F.when(F.col("del_cents") == F.col("min_cents"), 1).otherwise(0)
            ).alias("hit")
        )
    )
    return (
        merged.join(direct, "o_orderpriority")
        .join(min_hit, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("cents").cast("bigint").alias("total_cents"),
            ((F.col("cents") == F.col("d_cents")) & (F.col("n") == F.col("d_n"))).alias(
                "matches_direct"
            ),
            F.col("d_min").cast("bigint").alias("min_cents"),
            (F.col("hit") == 1).alias("min_recomputed"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "dq13_psi_drift",
    """
    WITH bucketed AS (
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'a' ELSE 'b' END AS period
        FROM orders
    ),
    per AS (
        SELECT bucket,
               SUM(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS n_a,
               SUM(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS n_b
        FROM bucketed GROUP BY bucket
    ),
    tot AS (
        SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM per
    ),
    terms AS (
        SELECT CAST(FLOOR(((n_a + 1.0) / (tot_a + k) - (n_b + 1.0) / (tot_b + k))
                    * LN(((n_a + 1.0) / (tot_a + k)) / ((n_b + 1.0) / (tot_b + k)))
                    * 1e6) AS BIGINT) AS term_micro,
               n_a, n_b
        FROM per, tot
    )
    SELECT CAST(SUM(term_micro) AS BIGINT) AS psi_micro,
           CAST(SUM(n_a) AS BIGINT) AS n_period_a,
           CAST(SUM(n_b) AS BIGINT) AS n_period_b,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM terms
    """,
)
def dq13_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ13: population stability index between two periods — the
    industry drift score dq2's L1 audit deliberately avoided because
    PSI's ln() looked engine-unportable. The repo's integer-micro trick
    makes it oracle-able after all: Laplace-smoothed shares ((n+1)/
    (tot+k), so empty buckets never hit ln(0)) are single IEEE
    divisions — bit-identical cross-engine — each bucket's
    (pa-pb)·ln(pa/pb) term is FLOOR-scaled to integer micros
    INDIVIDUALLY, and the integer sum is order-free where a float sum
    would inherit summation-order ulps. One scan, one per-bucket
    aggregate, a broadcast 1-row totals join; PSI > 0.2 is the
    conventional 'retrain' alarm (here expressed in micros)."""
    o = t(spark, sf_dir, "orders")
    bucketed = o.select(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "a"
        ).otherwise("b").alias("period"),
    )
    per = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).alias("n_b"),
    )
    tot = per.agg(
        F.sum("n_a").alias("tot_a"),
        F.sum("n_b").alias("tot_b"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    pa = (F.col("n_a") + 1.0) / (F.col("tot_a") + F.col("k"))
    pb = (F.col("n_b") + 1.0) / (F.col("tot_b") + F.col("k"))
    terms = per.crossJoin(F.broadcast(tot)).select(
        F.floor((pa - pb) * F.log(pa / pb) * 1e6).cast("bigint").alias("term_micro"),
        "n_a",
        "n_b",
    )
    return terms.agg(
        F.sum("term_micro").cast("bigint").alias("psi_micro"),
        F.sum("n_a").cast("bigint").alias("n_period_a"),
        F.sum("n_b").cast("bigint").alias("n_period_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )


@register(
    "a38_skyline_frontier",
    """
    WITH pts AS (
        SELECT o_custkey,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY o_custkey
    ),
    sky AS (
        SELECT x, y FROM pts q
        WHERE NOT EXISTS (
            SELECT 1 FROM pts p
            WHERE p.x >= q.x AND p.y >= q.y AND (p.x > q.x OR p.y > q.y)
        )
    )
    SELECT CAST(x AS BIGINT) AS total_cents, CAST(y AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM sky GROUP BY x, y
    ORDER BY total_cents DESC
    """,
)
def a38_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A38: 2-D skyline (Pareto frontier) — customers not dominated on
    (total spend, order count), both maximized: the multi-objective
    'best customers' query no single ORDER BY can answer. The oracle
    states the textbook NOT-EXISTS dominance spec; the engine computes
    it WITHOUT the quadratic pair test and WITHOUT a global sort:

    1. collapse to one row per distinct x with max y (hash agg);
    2. decile-bucket x by broadcast percentile cuts (a23 idiom);
    3. per-bucket running max of y over x DESC — a PARTITIONED window
       (bucket count ~n/10 rows each, never a 1-task funnel);
    4. cross-bucket prefix max from the <=10-row bucket ledger via the
       broadcast non-equi self-join idiom;
    a point survives iff its y strictly exceeds the max y at any
    strictly-greater x (within-bucket window ∪ higher-bucket ledger)
    and it holds the max y of its own x group — the standard
    grid-partitioned skyline, linear in n with one partitioned window.
    Ties on both axes all survive (co-optimal points)."""
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    pts = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    per_x = pts.groupBy("x").agg(F.max("y").alias("max_y_at_x"))
    cuts = per_x.agg(
        F.percentile_approx("x", [i / 10 for i in range(1, 10)], 10_000_000).alias("qs")
    )
    bucketed = per_x.crossJoin(F.broadcast(cuts)).select(
        "x",
        "max_y_at_x",
        F.aggregate(
            "qs", F.lit(0), lambda acc, c: acc + F.when(F.col("x") > c, 1).otherwise(0)
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = bucketed.withColumn(
        "within_max", F.coalesce(F.max("max_y_at_x").over(w), F.lit(-1))
    )
    ledger = bucketed.groupBy("bucket").agg(F.max("max_y_at_x").alias("bmax"))
    lo, hi = ledger.alias("lo"), ledger.alias("hi")
    higher = (
        lo.crossJoin(F.broadcast(hi))
        .groupBy(F.col("lo.bucket").alias("bucket"))
        .agg(
            F.max(
                F.when(F.col("hi.bucket") > F.col("lo.bucket"), F.col("hi.bmax"))
            ).alias("hmax")
        )
    )
    sky_x = (
        within.join(F.broadcast(higher), "bucket", "left")
        .withColumn("prefix_max", F.greatest("within_max", F.coalesce("hmax", F.lit(-1))))
        .filter(F.col("max_y_at_x") > F.col("prefix_max"))
        .select("x", "max_y_at_x")
    )
    return (
        pts.join(F.broadcast(sky_x), "x")
        .filter(F.col("y") == F.col("max_y_at_x"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .select(
            F.col("x").alias("total_cents"),
            F.col("y").alias("n_orders"),
            "n_customers",
        )
        .orderBy(F.col("total_cents").desc())
    )


@register(
    "x22_cdc_extract",
    """
    WITH v1 AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    v2 AS (
        SELECT k,
               CASE WHEN k % 97 = 0 THEN cents + 1 ELSE cents END AS cents
        FROM v1 WHERE k % 89 <> 0
        UNION ALL
        SELECT k + 100000000 AS k, cents FROM v1 WHERE k % 101 = 0
    )
    SELECT COALESCE(v1.k, v2.k) AS k,
           CASE WHEN v1.k IS NULL THEN 'I'
                WHEN v2.k IS NULL THEN 'D'
                ELSE 'U' END AS op,
           v1.cents AS before_cents,
           v2.cents AS after_cents
    FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    WHERE v1.k IS NULL OR v2.k IS NULL OR v1.cents <> v2.cents
    ORDER BY k
    """,
)
def x22_cdc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22: CDC EXTRACTION — diff two table snapshots into the
    insert/update/delete changelog that x20_cdc_apply consumes and
    dq12's Merkle diff locates: the full snapshot-diff path of an
    incremental pipeline (extract -> locate -> apply). v2 is a
    deterministic mutation of orders (every 97th key repriced, every
    89th deleted, every 101st re-inserted under a new key); the diff
    is ONE full outer join on the key with unchanged rows filtered
    out, so the changelog costs one co-partitioned shuffle regardless
    of how few rows changed. At 100 TB the join keys would be
    pre-bucketed (s24 idiom) or the diff scoped to the buckets dq12
    flagged — extract-on-flagged-buckets turns a full-table diff into
    a 64th of the work per mutated bucket."""
    o = t(spark, sf_dir, "orders")
    v1 = o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    mutated = v1.filter(F.col("k") % 89 != 0).select(
        "k",
        F.when(F.col("k") % 97 == 0, F.col("cents") + 1).otherwise(F.col("cents")).alias("cents"),
    )
    inserted = v1.filter(F.col("k") % 101 == 0).select(
        (F.col("k") + 100_000_000).alias("k"), "cents"
    )
    v2 = mutated.unionByName(inserted)
    a = v1.alias("a")
    b = v2.alias("b")
    return (
        a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
        .filter(
            F.col("a.k").isNull()
            | F.col("b.k").isNull()
            | (F.col("a.cents") != F.col("b.cents"))
        )
        .select(
            F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
            F.when(F.col("a.k").isNull(), "I")
            .when(F.col("b.k").isNull(), "D")
            .otherwise("U")
            .alias("op"),
            F.col("a.cents").alias("before_cents"),
            F.col("b.cents").alias("after_cents"),
        )
        .orderBy("k")
    )


@register(
    "m31_conformal_interval",
    """
    WITH base AS (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               ('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 AS h
        FROM orders
    ),
    cal AS (SELECT * FROM base WHERE h < 5),
    tst AS (SELECT * FROM base WHERE h >= 5),
    model AS (
        SELECT o_orderpriority, SUM(cents) // COUNT(*) AS yhat_cents
        FROM cal GROUP BY o_orderpriority
    ),
    cal_resid AS (
        SELECT ABS(c.cents - m.yhat_cents) AS r
        FROM cal c JOIN model m USING (o_orderpriority)
    ),
    q AS (
        SELECT CAST(quantile_disc(r, 0.9) AS BIGINT) AS q90 FROM cal_resid
    ),
    scored AS (
        SELECT CASE WHEN ABS(t.cents - m.yhat_cents) <= q.q90 THEN 1 ELSE 0 END AS covered
        FROM tst t JOIN model m USING (o_orderpriority), q
    )
    SELECT CAST((SELECT q90 FROM q) AS BIGINT) AS q90_cents,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(covered) AS BIGINT) AS n_covered,
           CAST(FLOOR(SUM(covered) * 1e6 / COUNT(*)) AS BIGINT) AS coverage_micro,
           (SUM(covered) * 100 >= COUNT(*) * 85) AS coverage_ok
    FROM scored
    """,
)
def m31_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M31: split-conformal prediction intervals — the
    distribution-free uncertainty wrapper modern ML serving puts
    around ANY point predictor: fit on a calibration split, take the
    90th percentile of absolute calibration residuals as the interval
    half-width, and report the realized coverage on the held-out
    split (guaranteed >= 89%-ish by exchangeability). Everything is
    engine-exact: the split is the portable md5 permille hash (p10's
    idiom), the per-priority predictor is an INTEGER floor-mean
    (SUM//COUNT — a float avg would differ by summation-order ulps),
    residuals are exact cents, the q90 is an exact discrete quantile
    (GK accuracy > n), and coverage is a cross-multiplied integer
    test. Plan shape: two hash aggs, a 5-row model broadcast, a 1-row
    quantile broadcast — no windows, no shuffles beyond the groupBys."""
    o = t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        (
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 10
        ).alias("h"),
    )
    cal = base.filter(F.col("h") < 5)
    tst = base.filter(F.col("h") >= 5)
    # integer `div`, NOT float division + cast: sum/n as a double can
    # round UP across an integer boundary where DuckDB's BIGINT // floors
    model = (
        cal.groupBy("o_orderpriority")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("o_orderpriority", F.expr("s div n").alias("yhat_cents"))
    )
    cal_resid = cal.join(F.broadcast(model), "o_orderpriority").select(
        F.abs(F.col("cents") - F.col("yhat_cents")).alias("r")
    )
    q = cal_resid.agg(
        F.percentile_approx("r", 0.9, 10_000_000).cast("bigint").alias("q90")
    )
    scored = (
        tst.join(F.broadcast(model), "o_orderpriority")
        .crossJoin(F.broadcast(q))
        .select(
            "q90",
            F.when(
                F.abs(F.col("cents") - F.col("yhat_cents")) <= F.col("q90"), 1
            ).otherwise(0).alias("covered"),
        )
    )
    return scored.agg(
        F.max("q90").cast("bigint").alias("q90_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("covered").cast("bigint").alias("n_covered"),
        F.floor(F.sum("covered") * 1e6 / F.count(F.lit(1))).cast("bigint").alias("coverage_micro"),
        (F.sum("covered") * 100 >= F.count(F.lit(1)) * 85).alias("coverage_ok"),
    )


# --- CM-sketch join-size estimation ----------------------------------------

_CM_W = 1024  # cells per hash row
_CM_A = (769, 1543, 3079)
_CM_B = (12289, 24593, 49157)


def _cm_cell(h, j: int):
    return ((h * _CM_A[j] + _CM_B[j]) % _BLOOM_P) % _CM_W


def _cm_cell_sql(hexpr: str, j: int) -> str:
    return f"(({hexpr} * {_CM_A[j]} + {_CM_B[j]}) % {_BLOOM_P}) % {_CM_W}"


@register(
    "a39_selfjoin_size_sketch",
    f"""
    WITH keyed AS (
        SELECT ('0x' || SUBSTR(MD5(CAST(l_suppkey AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM lineitem
    ),
    cells AS (
        SELECT 0 AS j, {_cm_cell_sql('h', 0)} AS cell FROM keyed
        UNION ALL SELECT 1, {_cm_cell_sql('h', 1)} FROM keyed
        UNION ALL SELECT 2, {_cm_cell_sql('h', 2)} FROM keyed
    ),
    cm AS (
        SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS c
        FROM cells GROUP BY j, cell
    ),
    est AS (
        SELECT j, SUM(c * c) AS e FROM cm GROUP BY j
    ),
    exact AS (
        SELECT CAST(SUM(c * c) AS BIGINT) AS x
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY l_suppkey)
    )
    SELECT exact.x AS exact_size,
           CAST((SELECT MIN(e) FROM est) AS BIGINT) AS estimated_size,
           ((SELECT MIN(e) FROM est) >= exact.x) AS never_underestimates,
           CAST(FLOOR(((SELECT MIN(e) FROM est) - exact.x) * 1e6 / exact.x) AS BIGINT)
               AS over_micro
    FROM exact
    """,
)
def a39_selfjoin_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A39: join-size estimation from count-min sketches — the planner
    primitive that decides broadcast vs shuffle vs salt BEFORE running
    a join: the self-join size of lineitem on l_suppkey (the second
    frequency moment Σc(k)², i.e. the join's output rows) estimated as
    the MINIMUM over 3 hash rows of the sketch's cell-wise
    sum-of-squares, against the exact value computed alongside. CM
    inner products can only OVERestimate (colliding keys add cross
    terms), so `never_underestimates` is a structural invariant the
    oracle states, and `over_micro` is the realized overestimate. The
    sketch is 3x1024 integer cells — constant size however many keys —
    built with the repo's portable md5+affine hashes, so DuckDB
    rebuilds it bit-for-bit. One scan feeds both sketch and exact; at
    100 TB only the 3072-cell sketch would be kept per partition and
    merged (cells add), never the per-key map."""
    li = t(spark, sf_dir, "lineitem")
    keyed = li.select(
        portable_hash32(F.col("l_suppkey").cast("string")).alias("h")
    )
    cells = None
    for j in range(3):
        part = keyed.select(F.lit(j).alias("j"), _cm_cell(F.col("h"), j).alias("cell"))
        cells = part if cells is None else cells.unionByName(part)
    cm = cells.groupBy("j", "cell").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    est = cm.groupBy("j").agg(F.sum(F.col("c") * F.col("c")).alias("e"))
    est_min = est.agg(F.min("e").cast("bigint").alias("estimated_size"))
    exact = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_size"))
    )
    return exact.crossJoin(F.broadcast(est_min)).select(
        "exact_size",
        "estimated_size",
        (F.col("estimated_size") >= F.col("exact_size")).alias("never_underestimates"),
        F.floor(
            (F.col("estimated_size") - F.col("exact_size")) * 1e6 / F.col("exact_size")
        )
        .cast("bigint")
        .alias("over_micro"),
    )


@register(
    "a40_median_of_medians",
    """
    WITH cust AS (
        SELECT c_nationkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ),
    per_nation AS (
        SELECT c_nationkey, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med
        FROM cust GROUP BY c_nationkey
    ),
    mom AS (
        SELECT CAST(quantile_disc(med, 0.5) AS BIGINT) AS mom FROM per_nation
    ),
    gl AS (
        SELECT CAST(quantile_disc(cents, 0.5) AS BIGINT) AS gmed,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM cust
    ),
    rank_of AS (
        SELECT CAST(SUM(CASE WHEN cents < mom THEN 1 ELSE 0 END) AS BIGINT) AS below
        FROM cust, mom
    )
    SELECT gl.gmed AS global_median_cents,
           mom.mom AS mom_cents,
           CAST((SELECT COUNT(*) FROM per_nation) AS BIGINT) AS n_groups,
           CAST(FLOOR(rank_of.below * 1e6 / gl.n) AS BIGINT) AS rank_of_mom_micro,
           (rank_of.below * 5 >= gl.n AND rank_of.below * 5 <= gl.n * 4)
               AS mom_within_band
    FROM gl, mom, rank_of
    """,
)
def a40_median_of_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A40: federated quantiles — the median-of-medians a fleet of
    sites (or a per-partition first pass) reports when raw rows can't
    leave the group, against the true global median computed centrally:
    per-nation exact medians (25 groups), their median, the global
    median, and the MoM's exact rank in the global order (the quality
    certificate — medians-of-groups always land in the middle band,
    here checked as a cross-multiplied 20-80% test). All quantiles are
    exact discrete elements (GK accuracy > n == quantile_disc), the
    rank is an integer count — every column hash-compares. Plan: two
    hash aggs + 1-row broadcasts; the 25-row medians frame is the only
    'federated' traffic, exactly the point of the technique."""
    c = t(spark, sf_dir, "customer")
    cust = c.select(
        "c_nationkey", F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents")
    )
    per_nation = cust.groupBy("c_nationkey").agg(
        F.percentile_approx("cents", 0.5, 10_000_000).cast("bigint").alias("med")
    )
    mom = per_nation.agg(
        F.percentile_approx("med", 0.5, 10_000_000).cast("bigint").alias("mom"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    glob = cust.agg(
        F.percentile_approx("cents", 0.5, 10_000_000).cast("bigint").alias("gmed"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    ranked = (
        cust.crossJoin(F.broadcast(mom))
        .agg(
            F.sum(F.when(F.col("cents") < F.col("mom"), 1).otherwise(0))
            .cast("bigint")
            .alias("below"),
            F.first("mom").alias("mom"),
            F.first("n_groups").alias("n_groups"),
        )
    )
    return ranked.crossJoin(F.broadcast(glob)).select(
        F.col("gmed").alias("global_median_cents"),
        F.col("mom").alias("mom_cents"),
        "n_groups",
        F.floor(F.col("below") * 1e6 / F.col("n")).cast("bigint").alias("rank_of_mom_micro"),
        ((F.col("below") * 5 >= F.col("n")) & (F.col("below") * 5 <= F.col("n") * 4)).alias(
            "mom_within_band"
        ),
    )


@register(
    "ev12_diff_in_diff",
    """
    WITH cells AS (
        SELECT CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS exposed,
               CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS post,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    m AS (
        SELECT exposed, post,
               SUM(cents) // COUNT(*) AS mean_cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM cells GROUP BY exposed, post
    )
    SELECT CAST(exposed AS BIGINT) AS exposed,
           CAST(post AS BIGINT) AS post,
           CAST(mean_cents AS BIGINT) AS mean_cents,
           n,
           CAST((SELECT (e1.mean_cents - e0.mean_cents) - (c1.mean_cents - c0.mean_cents)
                 FROM m e1, m e0, m c1, m c0
                 WHERE e1.exposed = 1 AND e1.post = 1 AND e0.exposed = 1 AND e0.post = 0
                   AND c1.exposed = 0 AND c1.post = 1 AND c0.exposed = 0 AND c0.post = 0)
                AS BIGINT) AS did_cents
    FROM m
    ORDER BY exposed, post
    """,
)
def ev12_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV12: difference-in-differences — the quasi-experimental readout
    every growth team runs when an exposure wasn't randomized: compare
    the exposed cohort's pre->post change in mean order value against
    the control cohort's change over the same boundary; parallel-trend
    deltas cancel and what remains is the treatment effect estimate.
    Exposure here is the deterministic even-custkey cohort, the period
    boundary 1998-01-01. Cell means are INTEGER floor-means
    (SUM div COUNT — m31's trick: a float avg differs by summation-
    order ulps), so the four cells and the DiD contrast are exact
    BIGINTs. One scan, one 4-group partial-aggregated groupBy; the DiD
    scalar is derived from the 4-row frame itself."""
    o = t(spark, sf_dir, "orders")
    cells = o.select(
        F.when(F.col("o_custkey") % 2 == 0, 1).otherwise(0).alias("exposed"),
        F.when(
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"), 1
        ).otherwise(0).alias("post"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    m = (
        cells.groupBy("exposed", "post")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "exposed", "post", F.expr("s div n").alias("mean_cents"), "n"
        )
    )
    # pivot the 4-row frame into one DiD scalar and broadcast it back
    did = (
        m.agg(
            F.sum(
                F.when((F.col("exposed") == 1) & (F.col("post") == 1), F.col("mean_cents"))
                .when((F.col("exposed") == 1) & (F.col("post") == 0), -F.col("mean_cents"))
                .when((F.col("exposed") == 0) & (F.col("post") == 1), -F.col("mean_cents"))
                .otherwise(F.col("mean_cents"))
            ).cast("bigint").alias("did_cents")
        )
    )
    return (
        m.crossJoin(F.broadcast(did))
        .select(
            F.col("exposed").cast("bigint").alias("exposed"),
            F.col("post").cast("bigint").alias("post"),
            F.col("mean_cents").cast("bigint").alias("mean_cents"),
            "n",
            "did_cents",
        )
        .orderBy("exposed", "post")
    )


@register(
    "p19_schema_drift_audit",
    """
    SELECT 'o_orderkey' AS column_name, 'bigint' AS v1_type, 'int' AS v2_type,
           'type_changed' AS change
    UNION ALL
    SELECT 'o_orderpriority', 'string', NULL, 'removed'
    UNION ALL
    SELECT 'o_orderstatus', NULL, 'string', 'added'
    UNION ALL
    SELECT 'o_totalprice', 'double', 'double', 'unchanged'
    ORDER BY column_name
    """,
)
def p19_schema_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19: schema-drift audit — diff the ACTUAL schemas of two written
    table versions (the upstream-contract check that runs before any
    data comparison makes sense): v2 narrows a key type, drops a
    column, and adds another; the audit reads both parquet footers and
    reports per-column added/removed/type_changed/unchanged. The
    result frame is O(columns) driver metadata (like m10's CV params —
    an allowlisted local frame); the oracle states the expected
    contract literally, so a silent writer-side schema change flips
    the hash. At 100 TB this is a footer-metadata operation — no data
    pages are read."""
    from realestate_engine.registry import stable_tmp

    o = t(spark, sf_dir, "orders")
    v1_dir, v2_dir = stable_tmp("p19_v1"), stable_tmp("p19_v2")
    o.select("o_orderkey", "o_totalprice", "o_orderpriority").write.mode(
        "overwrite"
    ).parquet(v1_dir)
    o.select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    ).write.mode("overwrite").parquet(v2_dir)
    s1 = dict(spark.read.parquet(v1_dir).dtypes)
    s2 = dict(spark.read.parquet(v2_dir).dtypes)
    rows = []
    for col in sorted(set(s1) | set(s2)):
        t1, t2 = s1.get(col), s2.get(col)
        change = (
            "added" if t1 is None
            else "removed" if t2 is None
            else "type_changed" if t1 != t2
            else "unchanged"
        )
        rows.append((col, t1, t2, change))
    return spark.createDataFrame(
        rows, "column_name string, v1_type string, v2_type string, change string"
    ).orderBy("column_name")


@register(
    "a42_bitmap_distinct_rollup",
    f"""
    WITH lanes AS (
        SELECT o_orderpriority,
               o_custkey // 64 AS lane,
               BIT_OR({_bit_sql('o_custkey % 64')}) AS bits
        FROM orders
        GROUP BY o_orderpriority, o_custkey // 64
    ),
    per_group AS (
        SELECT o_orderpriority,
               CAST(SUM(BIT_COUNT(bits)) AS BIGINT) AS n_distinct
        FROM lanes GROUP BY o_orderpriority
    ),
    global_lanes AS (
        SELECT lane, BIT_OR(bits) AS bits FROM lanes GROUP BY lane
    ),
    rolled AS (
        SELECT CAST(SUM(BIT_COUNT(bits)) AS BIGINT) AS n_distinct
        FROM global_lanes
    ),
    direct AS (
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n FROM orders
    )
    SELECT o_orderpriority, n_distinct,
           (SELECT rolled.n_distinct = direct.n FROM rolled, direct) AS rollup_exact
    FROM per_group
    UNION ALL
    SELECT 'ALL', rolled.n_distinct,
           rolled.n_distinct = direct.n
    FROM rolled, direct
    ORDER BY o_orderpriority
    """,
)
def a42_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A42: EXACT mergeable distinct counts via bitmaps — the roaring-
    bitmap pattern warehouses use when a18's HLL error is not
    acceptable: per group, distinct customers are a set of 64-bit
    lanes (lane = key div 64, bit = key mod 64) built by bit_or;
    cardinality = sum of popcounts; and unlike plain counts the lane
    bitmaps MERGE losslessly — the global figure is the OR of the
    per-group lanes, never a rescan — with the in-plan proof
    rollup_exact comparing the merged rollup to a direct
    count-distinct. Lane state is |key-space|/64 bits spread across
    ordinary rows (shuffled by lane like any aggregate), so the
    pattern scales horizontally where a driver-side bitset cannot.
    Spark's shiftleft wraps at bit 63 while DuckDB raises — the
    oracle spells bit 63 as the min-BIGINT literal (j10's trick)."""
    o = t(spark, sf_dir, "orders")
    lanes = o.groupBy(
        "o_orderpriority", (F.col("o_custkey") / 64).cast("long").alias("lane")
    ).agg(F.bit_or(F.expr("shiftleft(1L, CAST(o_custkey % 64 AS INT))")).alias("bits"))
    per_group = lanes.groupBy("o_orderpriority").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct")
    )
    global_lanes = lanes.groupBy("lane").agg(F.bit_or("bits").alias("bits"))
    rolled = global_lanes.agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct")
    )
    direct = o.agg(F.count_distinct("o_custkey").cast("bigint").alias("n"))
    proof = rolled.crossJoin(F.broadcast(direct)).select(
        F.col("n_distinct"), (F.col("n_distinct") == F.col("n")).alias("rollup_exact")
    )
    return (
        per_group.crossJoin(F.broadcast(proof.select("rollup_exact")))
        .select("o_orderpriority", "n_distinct", "rollup_exact")
        .unionByName(
            proof.select(
                F.lit("ALL").alias("o_orderpriority"), "n_distinct", "rollup_exact"
            )
        )
        .orderBy("o_orderpriority")
    )


_PERM_K = 20


@register(
    "m32_permutation_test",
    f"""
    WITH cells AS (
        SELECT o_custkey,
               CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS exposed,
               CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS post,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    labeled AS (
        SELECT r.i, cells.post, cells.cents,
               CASE WHEN r.i = 0 THEN cells.exposed
                    ELSE ('0x' || SUBSTR(MD5(CAST(cells.o_custkey AS VARCHAR) || ':' ||
                          CAST(r.i AS VARCHAR)), 1, 8))::BIGINT % 2 END AS e
        FROM cells CROSS JOIN (SELECT UNNEST(RANGE(0, {_PERM_K + 1})) AS i) r
    ),
    m AS (
        SELECT i, e, post, SUM(cents) // COUNT(*) AS mean_cents
        FROM labeled GROUP BY i, e, post
    ),
    did AS (
        SELECT i,
               SUM(CASE WHEN e = 1 AND post = 1 THEN mean_cents
                        WHEN e = 1 AND post = 0 THEN -mean_cents
                        WHEN e = 0 AND post = 1 THEN -mean_cents
                        ELSE mean_cents END) AS d
        FROM m GROUP BY i
    )
    SELECT CAST((SELECT d FROM did WHERE i = 0) AS BIGINT) AS observed_did_cents,
           CAST({_PERM_K} AS BIGINT) AS n_perms,
           CAST((SELECT COUNT(*) FROM did
                 WHERE i > 0 AND ABS(d) >= ABS((SELECT d FROM did WHERE i = 0)))
                AS BIGINT) AS n_as_extreme,
           CAST(FLOOR((SELECT COUNT(*) FROM did
                       WHERE i > 0 AND ABS(d) >= ABS((SELECT d FROM did WHERE i = 0)))
                      * 1e6 / {_PERM_K}) AS BIGINT) AS p_micro
    """,
)
def m32_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M32: permutation test for ev12's difference-in-differences —
    the nonparametric significance check: re-assign the exposure label
    {_PERM_K} times by a PORTABLE hash of (custkey, permutation index)
    — deterministic 'randomness' both engines replay, the same trick
    as the mixture samplers — recompute the integer DiD under each
    null labeling, and report how many null DiDs are at least as
    extreme as the observed one (the permutation p-value, in micros).
    One pass: rows explode K+1 ways (i=0 is the REAL labeling), one
    partial-aggregated groupBy over (K+1)x4 cells, a (K+1)-row DiD
    frame — the data is scanned once however many permutations are
    probed. Integer floor-means throughout (m31's div trick)."""
    o = t(spark, sf_dir, "orders")
    cells = o.select(
        "o_custkey",
        F.when(F.col("o_custkey") % 2 == 0, 1).otherwise(0).alias("exposed"),
        F.when(
            F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"), 1
        ).otherwise(0).alias("post"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    perm_hash = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("o_custkey").cast("string"), F.col("i").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    labeled = cells.select(
        "post",
        "cents",
        F.explode(F.array(*[F.lit(i) for i in range(_PERM_K + 1)])).alias("i"),
        "exposed",
        "o_custkey",
    ).select(
        "i",
        "post",
        "cents",
        F.when(F.col("i") == 0, F.col("exposed")).otherwise(perm_hash).alias("e"),
    )
    m = (
        labeled.groupBy("i", "e", "post")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("i", "e", "post", F.expr("s div n").alias("mean_cents"))
    )
    did = m.groupBy("i").agg(
        F.sum(
            F.when((F.col("e") == 1) & (F.col("post") == 1), F.col("mean_cents"))
            .when((F.col("e") == 1) & (F.col("post") == 0), -F.col("mean_cents"))
            .when((F.col("e") == 0) & (F.col("post") == 1), -F.col("mean_cents"))
            .otherwise(F.col("mean_cents"))
        ).alias("d")
    )
    obs = did.filter(F.col("i") == 0).select(F.col("d").alias("obs"))
    return (
        did.filter(F.col("i") > 0)
        .crossJoin(F.broadcast(obs))
        .agg(
            F.first("obs").cast("bigint").alias("observed_did_cents"),
            F.lit(_PERM_K).cast("bigint").alias("n_perms"),
            F.sum(F.when(F.abs(F.col("d")) >= F.abs(F.col("obs")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_as_extreme"),
            F.floor(
                F.sum(F.when(F.abs(F.col("d")) >= F.abs(F.col("obs")), 1).otherwise(0))
                * 1e6
                / _PERM_K
            )
            .cast("bigint")
            .alias("p_micro"),
        )
    )


_HQ_BUCKETS = 64
_HQ_MAX_CENTS = 60_000_000  # fixed domain: orders totalprice < 600k


@register(
    "a43_histogram_quantile_rollup",
    f"""
    WITH cents AS (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    hist AS (
        SELECT o_orderpriority,
               LEAST(c * {_HQ_BUCKETS} // {_HQ_MAX_CENTS}, {_HQ_BUCKETS - 1}) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM cents GROUP BY 1, 2
    ),
    merged AS (
        SELECT bucket, CAST(SUM(n) AS BIGINT) AS n FROM hist GROUP BY bucket
    ),
    tot AS (SELECT SUM(n) AS total FROM merged),
    med_bucket AS (
        SELECT MIN(bucket) AS mb FROM (
            SELECT bucket,
                   SUM(n) OVER (ORDER BY bucket) AS cum,
                   (SELECT total FROM tot) AS total
            FROM merged
        ) WHERE cum * 2 >= total
    ),
    exact AS (
        SELECT CAST(quantile_disc(c, 0.5) AS BIGINT) AS med FROM cents
    )
    SELECT CAST((SELECT mb FROM med_bucket) AS BIGINT) AS median_bucket,
           CAST((SELECT mb FROM med_bucket) * {_HQ_MAX_CENTS} // {_HQ_BUCKETS} AS BIGINT)
               AS bucket_lo_cents,
           CAST(((SELECT mb FROM med_bucket) + 1) * {_HQ_MAX_CENTS} // {_HQ_BUCKETS} AS BIGINT)
               AS bucket_hi_cents,
           exact.med AS exact_median_cents,
           (exact.med >= (SELECT mb FROM med_bucket) * {_HQ_MAX_CENTS} // {_HQ_BUCKETS}
            AND exact.med < ((SELECT mb FROM med_bucket) + 1) * {_HQ_MAX_CENTS} // {_HQ_BUCKETS})
               AS median_in_bucket
    FROM exact
    """,
)
def a43_histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A43: mergeable quantiles via fixed-domain histograms — the
    third tier of the quantile stack (a6/a20 exact; a34 weighted;
    this one MERGEABLE): each group keeps a 64-bucket integer
    histogram over a fixed cents domain; histograms merge by summing
    buckets (associative, unlike any exact quantile state), and the
    merged histogram answers the median to within one bucket width —
    the in-plan proof checks the exact median falls inside the bucket
    the merged sketch selects. The cumulative scan runs over the
    <=64-row merged frame (tiny ordered frame — DuckDB windows it; the
    Spark side uses the broadcast rank idiom, no unpartitioned
    WindowExec). This is how a 1000-executor fleet reports latency
    percentiles without shipping raw values."""
    o = t(spark, sf_dir, "orders")
    cents = o.select(
        "o_orderpriority", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    bucket = F.least(
        F.expr(f"c * {_HQ_BUCKETS} div {_HQ_MAX_CENTS}"), F.lit(_HQ_BUCKETS - 1)
    )
    hist = cents.groupBy("o_orderpriority", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    merged = hist.groupBy("bucket").agg(F.sum("n").cast("bigint").alias("n"))
    tot = merged.agg(F.sum("n").alias("total"))
    # cumulative over the <=64-row bucket frame via the broadcast
    # non-equi self-join idiom (no unpartitioned window)
    m2 = merged.select(F.col("bucket").alias("b2"), F.col("n").alias("n2"))
    cum = (
        merged.crossJoin(F.broadcast(m2))
        .filter(F.col("b2") <= F.col("bucket"))
        .groupBy("bucket")
        .agg(F.sum("n2").alias("cum"))
    )
    med_bucket = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 2 >= F.col("total"))
        .agg(F.min("bucket").cast("bigint").alias("mb"))
    )
    exact = cents.agg(
        F.percentile_approx("c", 0.5, 10_000_000).cast("bigint").alias("med")
    )
    lo = F.expr(f"mb * {_HQ_MAX_CENTS} div {_HQ_BUCKETS}")
    hi = F.expr(f"(mb + 1) * {_HQ_MAX_CENTS} div {_HQ_BUCKETS}")
    return med_bucket.crossJoin(F.broadcast(exact)).select(
        F.col("mb").alias("median_bucket"),
        lo.cast("bigint").alias("bucket_lo_cents"),
        hi.cast("bigint").alias("bucket_hi_cents"),
        F.col("med").alias("exact_median_cents"),
        ((F.col("med") >= lo) & (F.col("med") < hi)).alias("median_in_bucket"),
    )


@register(
    "x26_late_dimension_replay",
    """
    WITH dim_v1 AS (
        SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 10 <> 3
    ),
    facts AS (
        SELECT o_orderkey, o_custkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    first_pass AS (
        SELECT f.o_orderkey, f.o_custkey, f.cents, d.c_nationkey
        FROM facts f LEFT JOIN dim_v1 d ON d.c_custkey = f.o_custkey
    ),
    resolved_v1 AS (
        SELECT o_orderkey, c_nationkey, cents FROM first_pass WHERE c_nationkey IS NOT NULL
    ),
    parked AS (
        SELECT o_orderkey, o_custkey, cents FROM first_pass WHERE c_nationkey IS NULL
    ),
    replay AS (
        SELECT p.o_orderkey, c.c_nationkey, p.cents
        FROM parked p JOIN customer c ON c.c_custkey = p.o_custkey
    ),
    final AS (
        SELECT * FROM resolved_v1 UNION ALL SELECT * FROM replay
    ),
    direct AS (
        SELECT f.o_orderkey, c.c_nationkey, f.cents
        FROM facts f JOIN customer c ON c.c_custkey = f.o_custkey
    )
    SELECT CAST((SELECT COUNT(*) FROM facts) AS BIGINT) AS n_facts,
           CAST((SELECT COUNT(*) FROM parked) AS BIGINT) AS n_parked,
           CAST((SELECT COUNT(*) FROM replay) AS BIGINT) AS n_replayed,
           CAST((SELECT COUNT(*) FROM final) AS BIGINT) AS n_final,
           ((SELECT COUNT(*) FROM final) = (SELECT COUNT(*) FROM direct)
            AND (SELECT COALESCE(SUM(c_nationkey * cents), 0) FROM final)
                = (SELECT COALESCE(SUM(c_nationkey * cents), 0) FROM direct))
               AS replay_complete
    """,
)
def x26_late_dimension_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X26: LATE-ARRIVING DIMENSION handling — the pipeline pattern for
    facts that reference dim rows not yet ingested: join against the
    dim version available at load time (here v1 is missing every 10th
    customer), PARK the orphaned facts instead of dropping or
    null-filling them, and when the dim catches up REPLAY only the
    parked rows — never the resolved ones. The in-plan proof compares
    the union of first-pass hits + replayed rows against a direct join
    on the complete dim (row count AND a value checksum), so a replay
    that loses, duplicates, or mis-keys rows flips the hash-compared
    boolean. Cost: the replay join touches |parked| rows — at 100 TB
    that is the whole point (re-joining only the orphan fraction,
    not re-running the full fact join)."""
    c = t(spark, sf_dir, "customer")
    dim_v1 = c.filter(F.col("c_custkey") % 10 != 3).select("c_custkey", "c_nationkey")
    facts = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    first_pass = facts.join(
        F.broadcast(dim_v1), facts.o_custkey == dim_v1.c_custkey, "left"
    )
    resolved = first_pass.filter(F.col("c_nationkey").isNotNull()).select(
        "o_orderkey", "c_nationkey", "cents"
    )
    parked = first_pass.filter(F.col("c_nationkey").isNull()).select(
        "o_orderkey", "o_custkey", "cents"
    )
    replay = parked.join(
        F.broadcast(c.select(F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("nk"))),
        parked.o_custkey == F.col("k"),
    ).select("o_orderkey", F.col("nk").alias("c_nationkey"), "cents")
    final = resolved.unionByName(replay)
    direct = facts.join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        facts.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "c_nationkey", "cents")

    def stats(df, label):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_{label}"),
            F.coalesce(F.sum(F.col("c_nationkey") * F.col("cents")), F.lit(0))
            .cast("bigint")
            .alias(f"sum_{label}"),
        )

    n_facts = facts.agg(F.count(F.lit(1)).cast("bigint").alias("n_facts"))
    n_parked = parked.agg(F.count(F.lit(1)).cast("bigint").alias("n_parked"))
    n_replay = replay.agg(F.count(F.lit(1)).cast("bigint").alias("n_replayed"))
    fin = stats(final, "final")
    dir_ = stats(direct, "direct")
    return (
        n_facts.crossJoin(F.broadcast(n_parked))
        .crossJoin(F.broadcast(n_replay))
        .crossJoin(F.broadcast(fin))
        .crossJoin(F.broadcast(dir_))
        .select(
            "n_facts",
            "n_parked",
            "n_replayed",
            "n_final",
            (
                (F.col("n_final") == F.col("n_direct"))
                & (F.col("sum_final") == F.col("sum_direct"))
            ).alias("replay_complete"),
        )
    )


@register(
    "x25_bitemporal_asof",
    """
    WITH versions AS (
        SELECT o_orderkey,
               o_orderdate AS valid_from,
               o_orderdate + INTERVAL 30 DAY AS valid_to,
               o_orderdate AS tx_from,
               o_orderdate + INTERVAL 10 DAY AS tx_to,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               1 AS version
        FROM orders
        UNION ALL
        SELECT o_orderkey,
               o_orderdate,
               o_orderdate + INTERVAL 30 DAY,
               o_orderdate + INTERVAL 10 DAY,
               NULL,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100,
               2
        FROM orders
    ),
    belief AS (
        SELECT * FROM versions
        WHERE valid_from <= TIMESTAMP '1997-06-20'
          AND valid_to > TIMESTAMP '1997-06-20'
          AND tx_from <= TIMESTAMP '1997-07-01'
          AND (tx_to IS NULL OR tx_to > TIMESTAMP '1997-07-01')
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
           CAST(SUM(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_v2,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           (COUNT(*) = COUNT(DISTINCT o_orderkey)) AS one_version_per_key
    FROM belief
    """,
)
def x25_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25: BITEMPORAL as-of — the two-axis time query SCD2 (x13, one
    axis) cannot answer: "what did we BELIEVE on 1997-07-01 (transaction
    time) the price valid on 1997-06-20 (valid time) was?". The ledger
    carries both intervals per version (v1 as loaded; v2 a correction
    recorded 10 days later, +100 cents, open transaction interval);
    the query is two interval containments — pure pushdown-able
    filters, no joins — and the audit boolean proves the bitemporal
    invariant that exactly ONE version per key survives the double
    containment (overlapping tx intervals would silently double-count
    revenue). At 100 TB both axes are partition/cluster columns and
    the containment prunes files."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = o.select("o_orderkey", "o_orderdate", cents.alias("cents"))
    v1 = base.select(
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("valid_to"),
        F.col("o_orderdate").alias("tx_from"),
        (F.col("o_orderdate") + F.expr("INTERVAL 10 DAY")).alias("tx_to"),
        "cents",
        F.lit(1).alias("version"),
    )
    v2 = base.select(
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("valid_to"),
        (F.col("o_orderdate") + F.expr("INTERVAL 10 DAY")).alias("tx_from"),
        F.lit(None).cast("timestamp").alias("tx_to"),
        (F.col("cents") + 100).alias("cents"),
        F.lit(2).alias("version"),
    )
    V = F.lit("1997-06-20").cast("timestamp")
    T = F.lit("1997-07-01").cast("timestamp")
    belief = (
        v1.unionByName(v2)
        .filter(
            (F.col("valid_from") <= V)
            & (F.col("valid_to") > V)
            & (F.col("tx_from") <= T)
            & (F.col("tx_to").isNull() | (F.col("tx_to") > T))
        )
    )
    return belief.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.sum(F.when(F.col("version") == 1, 1).otherwise(0)).cast("bigint").alias("n_v1"),
        F.sum(F.when(F.col("version") == 2, 1).otherwise(0)).cast("bigint").alias("n_v2"),
        F.count_distinct("o_orderkey").cast("bigint").alias("n_keys"),
        (F.count(F.lit(1)) == F.count_distinct("o_orderkey")).alias("one_version_per_key"),
    )


@register(
    "p22_survivorship_golden_record",
    """
    WITH ranked AS (
        SELECT o_custkey, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderstatus, o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END DESC,
                            o_orderdate DESC,
                            CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                            o_orderkey ASC
               ) AS rn
        FROM orders
    )
    SELECT o_custkey,
           o_orderkey AS golden_orderkey,
           o_orderstatus AS golden_status,
           o_orderdate AS golden_date,
           cents AS golden_cents
    FROM ranked WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def p22_survivorship_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P22: survivorship (golden record) selection — the MDM rule
    cascade that picks ONE surviving record per entity: prefer
    finalized status, then the newest date, then the highest amount,
    then the lowest key as the deterministic last resort. The engine
    expresses the whole cascade as a single max_by over a packed
    comparison struct — ONE partial-aggregated groupBy, no window and
    no self-join (the oracle's ROW_NUMBER form is the spec; a window
    would sort every group's rows where the aggregate keeps one
    running champion per group map-side). The key tiebreak is negated
    inside the struct so lexicographic struct max implements 'lowest
    key wins'."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    pref = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    champ = F.max(
        F.struct(
            pref.alias("p"),
            F.col("o_orderdate").alias("d"),
            cents.alias("c"),
            (-F.col("o_orderkey")).alias("nk"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("st"),
        )
    ).alias("g")
    return (
        o.groupBy("o_custkey")
        .agg(champ)
        .select(
            "o_custkey",
            F.col("g.k").alias("golden_orderkey"),
            F.col("g.st").alias("golden_status"),
            F.col("g.d").alias("golden_date"),
            F.col("g.c").alias("golden_cents"),
        )
        .orderBy("o_custkey")
    )


@register(
    "m33_oof_target_encoding",
    """
    WITH rows_f AS (
        SELECT o_orderpriority,
               ('0x' || SUBSTR(MD5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 5 AS fold,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    per_fold AS (
        SELECT o_orderpriority, fold, SUM(cents) AS s, CAST(COUNT(*) AS BIGINT) AS n
        FROM rows_f GROUP BY o_orderpriority, fold
    ),
    per_cat AS (
        SELECT o_orderpriority, SUM(s) AS st, SUM(n) AS nt
        FROM per_fold GROUP BY o_orderpriority
    )
    SELECT f.o_orderpriority,
           CAST(f.fold AS BIGINT) AS fold,
           f.n AS n_in_fold,
           CAST((c.st - f.s) // (c.nt - f.n) AS BIGINT) AS oof_mean_cents,
           CAST(c.st // c.nt AS BIGINT) AS full_mean_cents,
           ((c.st - f.s) // (c.nt - f.n) <> c.st // c.nt OR f.n = 0) AS excludes_own_fold
    FROM per_fold f JOIN per_cat c USING (o_orderpriority)
    ORDER BY o_orderpriority, fold
    """,
)
def m33_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M33: OUT-OF-FOLD target encoding — the leakage-safe form of the
    strongest categorical feature there is: each row's category is
    encoded with the target mean computed over the OTHER hash folds
    ((total - own_fold) / (n_total - n_own)), so a row never sees its
    own target. Folds come from the portable md5 permille hash (p10's
    idiom); means are integer floor-divisions of exact cent sums
    (m31's trick), so every encoding value hash-compares. One
    (category x fold) aggregate plus a category rollup — the
    per-row encoded column at scale is one broadcast join of this
    25-row frame back onto the facts. The excludes_own_fold flag
    pins the leakage property: the OOF mean must differ from the full
    mean wherever the fold is non-empty (identical means would imply
    the fold contributed nothing to exclude)."""
    o = t(spark, sf_dir, "orders")
    rows_f = o.select(
        "o_orderpriority",
        (
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 5
        ).alias("fold"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    per_fold = rows_f.groupBy("o_orderpriority", "fold").agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_cat = per_fold.groupBy("o_orderpriority").agg(
        F.sum("s").alias("st"), F.sum("n").alias("nt")
    )
    return (
        per_fold.join(F.broadcast(per_cat), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("fold").cast("bigint").alias("fold"),
            F.col("n").alias("n_in_fold"),
            F.expr("(st - s) div (nt - n)").cast("bigint").alias("oof_mean_cents"),
            F.expr("st div nt").cast("bigint").alias("full_mean_cents"),
            (
                (F.expr("(st - s) div (nt - n)") != F.expr("st div nt"))
                | (F.col("n") == 0)
            ).alias("excludes_own_fold"),
        )
        .orderBy("o_orderpriority", "fold")
    )



# --- Kaplan-Meier survival table ---------------------------------------------


@register(
    "ev13_kaplan_meier",
    """
    WITH done AS (
        SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS done_date
        FROM lineitem GROUP BY 1
    ),
    subj AS (
        SELECT DATE_DIFF('day', CAST(o.o_orderdate AS DATE), d.done_date) AS dur,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
        FROM orders o JOIN done d ON d.l_orderkey = o.o_orderkey
    ),
    per AS (
        SELECT dur, COUNT(*) AS n, SUM(ev) AS d, COUNT(*) - SUM(ev) AS c
        FROM subj GROUP BY dur
    ),
    at_risk AS (
        SELECT a.dur, a.d, a.c, SUM(b.n) AS n_at_risk
        FROM per a JOIN per b ON b.dur >= a.dur
        GROUP BY a.dur, a.d, a.c
    ),
    terms AS (
        SELECT dur, d, c, n_at_risk,
               CASE WHEN d > 0 AND d < n_at_risk
                    THEN CAST(FLOOR(LN((n_at_risk - d) * 1.0 / n_at_risk) * 1e6) AS BIGINT)
                    WHEN d > 0 THEN NULL
                    ELSE CAST(0 AS BIGINT) END AS term_micro
        FROM at_risk
    )
    SELECT CAST(a.dur AS INTEGER) AS t_days,
           CAST(a.n_at_risk AS BIGINT) AS n_at_risk,
           CAST(a.d AS BIGINT) AS n_events,
           CAST(a.c AS BIGINT) AS n_censored,
           CAST(SUM(b.term_micro) AS BIGINT) AS surv_log_micro
    FROM terms a JOIN terms b ON b.dur <= a.dur
    WHERE a.d > 0
    GROUP BY a.dur, a.n_at_risk, a.d, a.c
    ORDER BY t_days
    """,
)
def ev13_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV13: Kaplan-Meier survival table — the NONPARAMETRIC
    complement to m24's parametric AFT fit. Study framing: time from
    order placement to full delivery (last lineitem ship); orders
    not yet finalized ('O'/'P') are right-censored at their observed
    duration. Emits the classic KM table at each event time: number
    at risk, events, censored, and the log survival curve as the
    cumulative sum of FLOOR-micro ln((n-d)/n) terms — the dq13 idiom
    that makes a product of fractions hash-comparable across engines
    (each ln is one IEEE double op, each term an integer, the sum
    order-free). Scale shape: subjects collapse to a per-duration
    census first (ONE groupBy; duration domain is the bounded
    order-to-ship day range, ~130 values), then both the
    at-risk suffix count and the cumulative hazard run as broadcast
    non-equi self-joins over that tiny frame — the repo's standard
    alternative to an unpartitioned window, O(days^2) of a hundreds-row
    frame, never a subjects-sized sort. The d = n_at_risk boundary
    (everyone at risk dies at once: S hits exact 0, ln undefined)
    yields NULL by the same CASE on both engines."""
    li = t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("done_date")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderstatus")
    subj = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.datediff("done_date", F.col("o_orderdate").cast("date")).alias("dur"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("ev"),
    )
    per = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ev").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).alias("c"),
    )
    a, b = per.alias("a"), per.alias("b")
    at_risk = (
        a.join(F.broadcast(b), F.col("b.dur") >= F.col("a.dur"))
        .groupBy(F.col("a.dur").alias("dur"), F.col("a.d").alias("d"), F.col("a.c").alias("c"))
        .agg(F.sum("b.n").alias("n_at_risk"))
    )
    terms = at_risk.select(
        "dur",
        "d",
        "c",
        "n_at_risk",
        F.when(
            (F.col("d") > 0) & (F.col("d") < F.col("n_at_risk")),
            F.floor(
                F.log((F.col("n_at_risk") - F.col("d")) * 1.0 / F.col("n_at_risk")) * 1e6
            ).cast("long"),
        )
        .when(F.col("d") > 0, F.lit(None).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("term_micro"),
    )
    ta, tb = terms.alias("ta"), terms.alias("tb")
    return (
        ta.join(F.broadcast(tb), F.col("tb.dur") <= F.col("ta.dur"))
        .filter(F.col("ta.d") > 0)
        .groupBy(
            F.col("ta.dur").cast("int").alias("t_days"),
            F.col("ta.n_at_risk").cast("bigint").alias("n_at_risk"),
            F.col("ta.d").cast("bigint").alias("n_events"),
            F.col("ta.c").cast("bigint").alias("n_censored"),
        )
        .agg(F.sum("tb.term_micro").cast("bigint").alias("surv_log_micro"))
        .orderBy("t_days")
    )


# --- Fellegi-Sunter probabilistic record linkage -----------------------------


@register(
    "er_fellegi_sunter",
    """
    WITH cts AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ),
    dirty AS (
        SELECT c_custkey AS d_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN 'Cstmr' || SUBSTRING(c_name, 9)
                    WHEN c_custkey % 3 = 0 THEN c_name || 'x'
                    ELSE c_name END AS d_name,
               c_nationkey AS d_nationkey,
               c_mktsegment AS d_mktsegment,
               cents + CASE WHEN c_custkey % 5 = 0 THEN 7 ELSE 0 END AS d_cents
        FROM cts
    ),
    pairs AS (
        SELECT CASE WHEN levenshtein(d.d_name, c.c_name) <= 1 THEN 1 ELSE 0 END AS name_agree,
               CASE WHEN d.d_cents = c.cents THEN 1 ELSE 0 END AS cents_agree,
               CASE WHEN CAST(FLOOR(d.d_cents / 100000.0) AS BIGINT)
                         = CAST(FLOOR(c.cents / 100000.0) AS BIGINT) THEN 1 ELSE 0 END AS band_agree,
               CASE WHEN d.d_custkey = c.c_custkey THEN 1 ELSE 0 END AS is_match
        FROM dirty d
        JOIN cts c ON d.d_nationkey = c.c_nationkey AND d.d_mktsegment = c.c_mktsegment
    ),
    rates AS (
        SELECT CAST(SUM(is_match) AS BIGINT) AS m_tot,
               CAST(COUNT(*) - SUM(is_match) AS BIGINT) AS u_tot,
               CAST(SUM(name_agree * is_match) AS BIGINT) AS ma_name,
               CAST(SUM(name_agree * (1 - is_match)) AS BIGINT) AS ua_name,
               CAST(SUM(cents_agree * is_match) AS BIGINT) AS ma_cents,
               CAST(SUM(cents_agree * (1 - is_match)) AS BIGINT) AS ua_cents,
               CAST(SUM(band_agree * is_match) AS BIGINT) AS ma_band,
               CAST(SUM(band_agree * (1 - is_match)) AS BIGINT) AS ua_band
        FROM pairs
    ),
    pat AS (
        SELECT name_agree, cents_agree, band_agree,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(is_match) AS BIGINT) AS n_matches
        FROM pairs GROUP BY 1, 2, 3
    )
    SELECT CAST(p.name_agree AS INTEGER) AS name_agree,
           CAST(p.cents_agree AS INTEGER) AS cents_agree,
           CAST(p.band_agree AS INTEGER) AS band_agree,
           p.n_pairs, p.n_matches,
           CAST(CASE WHEN p.name_agree = 1
                THEN CAST(FLOOR(LN((r.ma_name + 1) * (r.u_tot + 2) * 1.0
                                   / ((r.ua_name + 1) * (r.m_tot + 2))) * 1e6) AS BIGINT)
                ELSE CAST(FLOOR(LN((r.m_tot - r.ma_name + 1) * (r.u_tot + 2) * 1.0
                                   / ((r.u_tot - r.ua_name + 1) * (r.m_tot + 2))) * 1e6) AS BIGINT) END
             + CASE WHEN p.cents_agree = 1
                THEN CAST(FLOOR(LN((r.ma_cents + 1) * (r.u_tot + 2) * 1.0
                                   / ((r.ua_cents + 1) * (r.m_tot + 2))) * 1e6) AS BIGINT)
                ELSE CAST(FLOOR(LN((r.m_tot - r.ma_cents + 1) * (r.u_tot + 2) * 1.0
                                   / ((r.u_tot - r.ua_cents + 1) * (r.m_tot + 2))) * 1e6) AS BIGINT) END
             + CASE WHEN p.band_agree = 1
                THEN CAST(FLOOR(LN((r.ma_band + 1) * (r.u_tot + 2) * 1.0
                                   / ((r.ua_band + 1) * (r.m_tot + 2))) * 1e6) AS BIGINT)
                ELSE CAST(FLOOR(LN((r.m_tot - r.ma_band + 1) * (r.u_tot + 2) * 1.0
                                   / ((r.u_tot - r.ua_band + 1) * (r.m_tot + 2))) * 1e6) AS BIGINT) END
             AS BIGINT) AS weight_micro
    FROM pat p CROSS JOIN rates r
    ORDER BY name_agree DESC, cents_agree DESC, band_agree DESC
    """,
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER: Fellegi-Sunter probabilistic record linkage — the missing
    entity-resolution family member between j5's blocked fuzzy join
    (candidate generation) and p22's survivorship (post-merge). A
    deterministically perturbed copy of customer (name edit at
    custkey%3/%7, +7-cent balance shift at %5) is linked back against
    the clean table: candidates come ONLY from (nationkey, mktsegment)
    blocks — never all-pairs, the same blocking posture as j5 — and
    each candidate pair is scored on a 3-field comparison vector
    (levenshtein<=1 name agreement, exact cents, $1000 balance band).
    m_k = P(agree|match) and u_k = P(agree|non-match) are estimated
    from the blocked pairs in ONE global aggregate (ground truth =
    same custkey; Laplace +1/+2 smoothing so no zero cell can reach
    the log), and the classic per-pattern log-likelihood weight
    sum(ln(m/u) or ln((1-m)/(1-u))) is emitted per agreement pattern
    in FLOOR-micro integers — exact-product BIGINT numerators (all
    < 2^53), ONE IEEE division, one libm ln per field, the dq13 idiom
    that hash-compares across engines. Scale shape: the pair join is
    a blocked equi-join (a hash join, never cartesian), the rates
    frame is a broadcast 1-row aggregate, and the pattern rollup has
    at most 8 groups; at 100 TB you refine the blocking key (add a
    name-prefix leg), not the algorithm."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    dirty = c.select(
        F.col("c_custkey").alias("d_custkey"),
        F.when(
            F.col("c_custkey") % 7 == 0,
            F.concat(F.lit("Cstmr"), F.expr("substring(c_name, 9)")),
        )
        .when(F.col("c_custkey") % 3 == 0, F.concat(F.col("c_name"), F.lit("x")))
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_mktsegment"),
        (
            F.col("cents")
            + F.when(F.col("c_custkey") % 5 == 0, F.lit(7)).otherwise(F.lit(0))
        ).alias("d_cents"),
    )
    pairs = cache_once(
        dirty.join(
            c,
            (F.col("d_nationkey") == F.col("c_nationkey"))
            & (F.col("d_mktsegment") == F.col("c_mktsegment")),
        ).select(
            F.when(F.levenshtein("d_name", "c_name") <= 1, 1).otherwise(0).alias("name_agree"),
            F.when(F.col("d_cents") == F.col("cents"), 1).otherwise(0).alias("cents_agree"),
            F.when(
                F.floor(F.col("d_cents") / F.lit(100000.0)).cast("long")
                == F.floor(F.col("cents") / F.lit(100000.0)).cast("long"),
                1,
            )
            .otherwise(0)
            .alias("band_agree"),
            F.when(F.col("d_custkey") == F.col("c_custkey"), 1).otherwise(0).alias("is_match"),
        )
    )
    rates = pairs.agg(
        F.sum("is_match").cast("long").alias("m_tot"),
        (F.count(F.lit(1)) - F.sum("is_match")).cast("long").alias("u_tot"),
        F.sum(F.col("name_agree") * F.col("is_match")).cast("long").alias("ma_name"),
        F.sum(F.col("name_agree") * (1 - F.col("is_match"))).cast("long").alias("ua_name"),
        F.sum(F.col("cents_agree") * F.col("is_match")).cast("long").alias("ma_cents"),
        F.sum(F.col("cents_agree") * (1 - F.col("is_match"))).cast("long").alias("ua_cents"),
        F.sum(F.col("band_agree") * F.col("is_match")).cast("long").alias("ma_band"),
        F.sum(F.col("band_agree") * (1 - F.col("is_match"))).cast("long").alias("ua_band"),
    )
    pat = pairs.groupBy("name_agree", "cents_agree", "band_agree").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("is_match").cast("long").alias("n_matches"),
    )

    def w(agree_col: str, ma: str, ua: str):
        agree_w = F.floor(
            F.log(
                ((F.col(ma) + 1) * (F.col("u_tot") + 2)).cast("double")
                / ((F.col(ua) + 1) * (F.col("m_tot") + 2))
            )
            * 1e6
        ).cast("long")
        disagree_w = F.floor(
            F.log(
                ((F.col("m_tot") - F.col(ma) + 1) * (F.col("u_tot") + 2)).cast("double")
                / ((F.col("u_tot") - F.col(ua) + 1) * (F.col("m_tot") + 2))
            )
            * 1e6
        ).cast("long")
        return F.when(F.col(agree_col) == 1, agree_w).otherwise(disagree_w)

    return (
        pat.crossJoin(F.broadcast(rates))
        .select(
            F.col("name_agree").cast("int").alias("name_agree"),
            F.col("cents_agree").cast("int").alias("cents_agree"),
            F.col("band_agree").cast("int").alias("band_agree"),
            "n_pairs",
            "n_matches",
            (
                w("name_agree", "ma_name", "ua_name")
                + w("cents_agree", "ma_cents", "ua_cents")
                + w("band_agree", "ma_band", "ua_band")
            )
            .cast("long")
            .alias("weight_micro"),
        )
        .orderBy(
            F.col("name_agree").desc(),
            F.col("cents_agree").desc(),
            F.col("band_agree").desc(),
        )
    )


@register(
    "m34_calibration_bins",
    """
    WITH scored AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                    THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    binned AS (
        SELECT LEAST(9, cents // 5000000) AS bin, cents, y FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS positives,
           CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS rate_micro,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def m34_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M34: calibration / reliability table — the model-monitoring
    counterpart to m31_conformal_interval: bucket a score into fixed
    equal-width bins and report the empirical positive rate per bin
    (the reliability-diagram input; a well-calibrated score has
    rate ~ bin midpoint). The score here is the deterministic
    order-value signal (integer cents; fixed edges, so bin assignment
    is exact integer math — no NTILE global window, no float edge
    hazard) and the outcome is the high-priority flag. rate in exact
    integer micros (positives*1e6 div n), the repo-wide ratio idiom.

    Scale: single hash-agg on a 10-value key — partial aggregation
    collapses everything map-side; the shuffle moves ≤10 rows per
    task regardless of corpus size."""
    o = t(spark, sf_dir, "orders")
    scored = o.select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.when(
            F.col("o_orderpriority").startswith("1-") | F.col("o_orderpriority").startswith("2-"),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("y"),
    )
    binned = scored.select(F.least(F.lit(9), F.expr("cents div 5000000")).cast("long").alias("bin"), "cents", "y")
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("positives"),
            F.expr("CAST(SUM(y) * 1000000 DIV COUNT(*) AS BIGINT)").alias("rate_micro"),
            F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("avg_cents"),
        )
        .orderBy("bin")
    )


@register(
    "ev14_uplift_qini",
    """
    WITH pop AS (
        SELECT c_custkey,
               ('0x' || SUBSTR(MD5('u' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 AS treated,
               LEAST(9, GREATEST(0, CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 120000) AS bin
        FROM customer
    ),
    outcome AS (
        SELECT o_custkey, 1 AS y FROM orders GROUP BY o_custkey
        HAVING SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) >= 50000000
    ),
    scored AS (
        SELECT p.bin, p.treated, COALESCE(o.y, 0) AS y
        FROM pop p LEFT JOIN outcome o ON p.c_custkey = o.o_custkey
    ),
    per_bin AS (
        SELECT bin,
               SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS nt,
               SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS nc,
               SUM(CASE WHEN treated = 1 THEN y ELSE 0 END) AS yt,
               SUM(CASE WHEN treated = 0 THEN y ELSE 0 END) AS yc
        FROM scored GROUP BY bin
    ),
    cum AS (
        SELECT b.bin,
               SUM(b2.nt) AS cnt, SUM(b2.nc) AS cnc,
               SUM(b2.yt) AS cyt, SUM(b2.yc) AS cyc
        FROM per_bin b JOIN per_bin b2 ON b2.bin >= b.bin
        GROUP BY b.bin
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(cnt AS BIGINT) AS cum_treated, CAST(cnc AS BIGINT) AS cum_control,
           CAST(cyt AS BIGINT) AS cum_y_treated, CAST(cyc AS BIGINT) AS cum_y_control,
           CAST((cyt * cnc - cyc * cnt) * 1000000 // cnc AS BIGINT) AS qini_micro
    FROM cum ORDER BY bin
    """,
)
def ev14_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV14: uplift-modeling Qini curve — the causal counterpart of
    m34_calibration_bins: customers hash-split into treatment/control
    (the portable-md5 coin, the repo's A/B idiom since m32), outcome =
    lifetime order value over a threshold, score bins = fixed
    integer-cent acctbal edges (descending richness proxy). Per
    descending-score prefix: cumulative treated/control counts and
    responders, and the Qini value Q(k) = Yt_k - Yc_k * Nt_k/Nc_k in
    exact integer micros via cross-multiplication (no float division
    either engine).

    The 10-row cumulative runs as the broadcast non-equi self-join
    (b2.bin >= b.bin) — the repo's no-unpartitioned-window idiom: the
    heavy work (per-customer outcome agg, bin agg) is ordinary
    partial-agg shuffles; only the 10-row frontier is quadratic, and
    10x10 is free. At 100 TB nothing changes: bins are fixed, the
    per-bin table is O(10) regardless of population."""
    c = t(spark, sf_dir, "customer")
    pop = c.select(
        "c_custkey",
        (portable_hash32(F.concat(F.lit("u"), F.col("c_custkey").cast("string"))) % 2).alias("treated"),
        F.greatest(F.lit(0).cast("long"), F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000")).alias("raw"),
    ).select("c_custkey", "treated", F.expr("CAST(least(9, raw div 120000) AS BIGINT)").alias("bin"))
    outcome = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.expr("SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))").alias("cents"))
        .filter(F.col("cents") >= 50000000)
        .select("o_custkey", F.lit(1).alias("y"))
    )
    scored = pop.join(outcome, pop.c_custkey == outcome.o_custkey, "left").select(
        "bin", "treated", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    per_bin = scored.groupBy("bin").agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0)).alias("yt"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0)).alias("yc"),
    )
    b, b2 = per_bin.alias("b"), F.broadcast(per_bin.alias("b2"))
    cum = (
        b.join(b2, F.col("b2.bin") >= F.col("b.bin"))
        .groupBy(F.col("b.bin").alias("bin"))
        .agg(
            F.sum("b2.nt").alias("cnt"),
            F.sum("b2.nc").alias("cnc"),
            F.sum("b2.yt").alias("cyt"),
            F.sum("b2.yc").alias("cyc"),
        )
    )
    return cum.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("cnt").cast("long").alias("cum_treated"),
        F.col("cnc").cast("long").alias("cum_control"),
        F.col("cyt").cast("long").alias("cum_y_treated"),
        F.col("cyc").cast("long").alias("cum_y_control"),
        F.expr("CAST((cyt * cnc - cyc * cnt) * 1000000 DIV cnc AS BIGINT)").alias("qini_micro"),
    ).orderBy("bin")


@register(
    "dq18_ks_test",
    """
    WITH tagged AS (
        SELECT c.c_nationkey AS nation,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o.o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END AS period
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    per_value AS (
        SELECT nation, cents,
               SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS a,
               SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS b
        FROM tagged GROUP BY nation, cents
    ),
    cum AS (
        SELECT nation,
               ABS(SUM(a) OVER (PARTITION BY nation ORDER BY cents)
                     * SUM(b) OVER (PARTITION BY nation)
                   - SUM(b) OVER (PARTITION BY nation ORDER BY cents)
                     * SUM(a) OVER (PARTITION BY nation)) AS gap,
               SUM(a) OVER (PARTITION BY nation) AS na,
               SUM(b) OVER (PARTITION BY nation) AS nb
        FROM per_value
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(ANY_VALUE(na) AS BIGINT) AS n_pre,
           CAST(ANY_VALUE(nb) AS BIGINT) AS n_post,
           CAST(MAX(gap) * 1000000 // (ANY_VALUE(na) * ANY_VALUE(nb)) AS BIGINT) AS ks_micro,
           CAST(CASE WHEN MAX(gap) * 10 > ANY_VALUE(na) * ANY_VALUE(nb)
                THEN 1 ELSE 0 END AS BIGINT) AS drifted
    FROM cum GROUP BY nation ORDER BY nation
    """,
)
def dq18_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ18: two-sample Kolmogorov-Smirnov drift test per nation — the
    nonparametric sibling of dq13_psi_drift (binned) and
    dq17_wasserstein_drift (transport): KS = max ECDF gap between the
    pre-/post-1998 order-value samples. Everything stays exact
    integer: the gap |F_a - F_b| is cross-multiplied
    (|ca*nb - cb*na| over na*nb), reported in floor micros, and the
    drift flag is the 0.1-threshold comparison done as integers too —
    nothing for libm to disagree on.

    Plan shape: hash-agg to distinct (nation, cents) first (collapses
    ties and bounds the window input), then cumulative sums over a
    window PARTITIONED by nation (no global funnel; the per-nation
    totals ride the same partition), one final max-agg. At 100 TB the
    dedup-then-window pattern keeps per-task state at the distinct
    value count of one nation, and nation is the natural partition
    key."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    from pyspark.sql.window import Window

    tagged = o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey")).select(
        F.col("c_nationkey").alias("nation"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 0).otherwise(1).alias("period"),
    )
    per_value = tagged.groupBy("nation", "cents").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("b"),
    )
    w_cum = Window.partitionBy("nation").orderBy("cents")
    w_tot = Window.partitionBy("nation")
    cum = per_value.select(
        "nation",
        F.abs(
            F.sum("a").over(w_cum) * F.sum("b").over(w_tot)
            - F.sum("b").over(w_cum) * F.sum("a").over(w_tot)
        ).alias("gap"),
        F.sum("a").over(w_tot).alias("na"),
        F.sum("b").over(w_tot).alias("nb"),
    )
    return (
        cum.groupBy(F.col("nation").cast("long").alias("nation"))
        .agg(
            F.first("na").cast("long").alias("n_pre"),
            F.first("nb").cast("long").alias("n_post"),
            F.expr("CAST(MAX(gap) * 1000000 DIV (FIRST(na) * FIRST(nb)) AS BIGINT)").alias("ks_micro"),
            F.expr(
                "CAST(CASE WHEN MAX(gap) * 10 > FIRST(na) * FIRST(nb) THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("drifted"),
        )
        .orderBy("nation")
    )


@register(
    "ts7_theil_sen_trend",
    """
    WITH monthly AS (
        SELECT c.c_nationkey AS nation,
               CAST(YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate) AS BIGINT) AS m,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY nation, m
    ),
    slopes AS (
        SELECT a.nation,
               (b.rev - a.rev) * 1000 // (b.m - a.m) AS slope_milli,
               ROW_NUMBER() OVER (
                   PARTITION BY a.nation
                   ORDER BY (b.rev - a.rev) * 1000 // (b.m - a.m), a.m, b.m
               ) AS rn,
               COUNT(*) OVER (PARTITION BY a.nation) AS np
        FROM monthly a JOIN monthly b ON a.nation = b.nation AND a.m < b.m
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(ANY_VALUE(np) AS BIGINT) AS n_pairs,
           CAST(MAX(CASE WHEN rn = (np + 1) // 2 THEN slope_milli END) AS BIGINT)
               AS median_slope_milli
    FROM slopes GROUP BY nation ORDER BY nation
    """,
)
def ts7_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS7: Theil-Sen robust trend per nation — the median of all
    pairwise slopes of the monthly-revenue series, immune to the
    outlier months that wreck the OLS fit (t19_zipf_fit's estimator).
    Slopes are exact integers (cents*1000 per month, both engines'
    integer division truncating toward zero identically) and the
    median is the deterministic lower median by (slope, m1, m2)
    ROW_NUMBER — no float quantile anywhere.

    Scale: the pair join is per-nation over the ~80-row monthly
    aggregate (6.4k pairs/nation, CONSTANT in corpus size — the raw
    scan collapses to months first), the ranking window is partitioned
    by nation. At 100 TB only the first aggregation grows; the
    Theil-Sen stage is fixed work."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    from pyspark.sql.window import Window

    monthly = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long").alias("m"),
        )
        .agg(F.expr("SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))").alias("rev"))
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(
        b, (F.col("a.nation") == F.col("b.nation")) & (F.col("a.m") < F.col("b.m"))
    ).select(
        F.col("a.nation").alias("nation"),
        F.expr("(b.rev - a.rev) * 1000 DIV (b.m - a.m)").alias("slope_milli"),
        F.col("a.m").alias("m1"),
        F.col("b.m").alias("m2"),
    )
    w_rank = Window.partitionBy("nation").orderBy("slope_milli", "m1", "m2")
    w_n = Window.partitionBy("nation")
    ranked = slopes.select(
        "nation",
        "slope_milli",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("np"),
    )
    return (
        ranked.groupBy(F.col("nation").cast("long").alias("nation"))
        .agg(
            F.first("np").cast("long").alias("n_pairs"),
            F.expr("CAST(MAX(CASE WHEN rn = (np + 1) DIV 2 THEN slope_milli END) AS BIGINT)")
            .alias("median_slope_milli"),
        )
        .orderBy("nation")
    )


@register(
    "x27_compaction_planner",
    """
    WITH files AS (
        SELECT CAST(YEAR(l_shipdate) * 100 + MONTH(l_shipdate) AS BIGINT) AS part,
               CAST(l_suppkey % 8 AS BIGINT) AS file_id,
               CAST(COUNT(*) * 128 AS BIGINT) AS bytes
        FROM lineitem GROUP BY part, file_id
    ),
    planned AS (
        SELECT part, file_id, bytes,
               COALESCE(SUM(bytes) OVER (
                   PARTITION BY part ORDER BY bytes DESC, file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM files
    )
    SELECT part,
           CAST(cum_before // 65536 AS BIGINT) AS compaction_group,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS group_bytes,
           CAST(SUM(CASE WHEN bytes < 16384 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_files
    FROM planned
    GROUP BY part, compaction_group
    ORDER BY part, compaction_group
    """,
)
def x27_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27: small-file compaction planning — the lakehouse maintenance
    op every 100 TB table needs (thousands of tiny files per partition
    kill scan throughput; OPTIMIZE/rewrite jobs consume a plan exactly
    like this). The file inventory is simulated from lineitem
    ((ship-month, supplier-bucket) -> bytes proxy); within each
    partition, files ordered largest-first are assigned to compaction
    groups by EXCLUSIVE-prefix-sum div target (64 KiB here) — the
    deterministic one-window formulation of greedy size packing (the
    same running-state idea as pack_documents_greedy, but closed-form:
    group = floor(bytes-before / target), no recursion needed).
    Output: one row per (partition, group) with file count, group
    bytes, and the small-file census driving the rewrite decision.

    Scale: one hash-agg builds the inventory (tiny: files-per-
    partition, not rows), the window is PARTITIONED by the table
    partition, and the plan is O(files) regardless of data volume."""
    li = t(spark, sf_dir, "lineitem")
    from pyspark.sql.window import Window

    files = li.groupBy(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long").alias("part"),
        (F.col("l_suppkey") % 8).cast("long").alias("file_id"),
    ).agg((F.count(F.lit(1)) * 128).cast("long").alias("bytes"))
    w = (
        Window.partitionBy("part")
        .orderBy(F.col("bytes").desc(), "file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.select(
        "part",
        "file_id",
        "bytes",
        F.coalesce(F.sum("bytes").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        planned.groupBy("part", F.expr("CAST(cum_before DIV 65536 AS BIGINT)").alias("compaction_group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("group_bytes"),
            F.sum(F.when(F.col("bytes") < 16384, 1).otherwise(0)).cast("long").alias("n_small_files"),
        )
        .orderBy("part", "compaction_group")
    )


@register(
    "p23_pseudonymize_join_audit",
    """
    WITH c_tok AS (
        SELECT ('0x' || SUBSTR(MD5('pepper-' || CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT AS c_tok,
               c_nationkey
        FROM customer
    ),
    o_tok AS (
        SELECT ('0x' || SUBSTR(MD5('pepper-' || CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS o_tok,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    joined AS (
        SELECT c.c_nationkey AS nation, o.cents
        FROM o_tok o JOIN c_tok c ON o.o_tok = c.c_tok
    ),
    direct AS (
        SELECT c.c_nationkey AS nation, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    collisions AS (
        SELECT COUNT(*) - COUNT(DISTINCT c_tok) AS n FROM c_tok
    )
    SELECT j.nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(j.cents) AS BIGINT) AS revenue_cents,
           CAST(CASE WHEN COUNT(*) = (SELECT COUNT(*) FROM direct d WHERE d.nation = j.nation)
                      AND SUM(j.cents) = (SELECT SUM(d.cents) FROM direct d WHERE d.nation = j.nation)
                THEN 1 ELSE 0 END AS BIGINT) AS join_preserved,
           CAST((SELECT n FROM collisions) AS BIGINT) AS token_collisions
    FROM joined j GROUP BY j.nation ORDER BY j.nation
    """,
)
def p23_pseudonymize_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P23: join-preserving pseudonymization — the GDPR-compliance
    counterpart of t14_pii_redaction: the natural key (custkey) is
    replaced on BOTH tables with a keyed-hash surrogate (48-bit md5
    token with a pepper, the portable-hash family), and the audit
    proves analytics survive tokenization: per nation, the
    surrogate-key join reproduces the direct join's row count and
    revenue exactly (join_preserved), and the token space is
    collision-free on this population (token_collisions = 0 — at
    100 TB the token widens, same 5-character change as every hash in
    this repo).

    Plan shape: tokenization is a per-row codegen'd expression (no
    lookup-table shuffle — deterministic keyed hashing is exactly what
    makes pseudonymized joins scale); the audit joins are ordinary
    shuffle joins; the collision census is one distinct-agg broadcast
    onto the group frame."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")

    def tok(col):
        return F.conv(F.substring(F.md5(F.concat(F.lit("pepper-"), col.cast("string"))), 1, 12), 16, 10).cast("long")

    c_tok = c.select(tok(F.col("c_custkey")).alias("c_tok"), "c_nationkey")
    o_tok = o.select(
        tok(F.col("o_custkey")).alias("o_tok"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    joined = (
        o_tok.join(c_tok, o_tok.o_tok == c_tok.c_tok)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"), F.sum("cents").cast("long").alias("revenue_cents"))
    )
    direct = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("d_n"), F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias("d_rev"))
    )
    collisions = c_tok.agg(
        (F.count(F.lit(1)) - F.countDistinct("c_tok")).cast("long").alias("token_collisions")
    )
    return (
        joined.join(direct, "nation")
        .crossJoin(F.broadcast(collisions))
        .select(
            "nation",
            "n_orders",
            "revenue_cents",
            F.when((F.col("n_orders") == F.col("d_n")) & (F.col("revenue_cents") == F.col("d_rev")), 1)
            .otherwise(0)
            .cast("long")
            .alias("join_preserved"),
            "token_collisions",
        )
        .orderBy("nation")
    )


_PSM_ORACLE = """
    WITH pop AS (
        SELECT c_custkey AS k, c_nationkey AS nation,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS score,
               ('0x' || SUBSTR(MD5('psm-' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 AS treated
        FROM customer
    ),
    outcome AS (
        SELECT o_custkey AS ok, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT p.k, p.nation, p.score, p.treated, COALESCE(o.y, 0) AS y,
               LAST_VALUE(CASE WHEN treated = 0 THEN score END IGNORE NULLS) OVER w_prev AS ps,
               LAST_VALUE(CASE WHEN treated = 0 THEN k END IGNORE NULLS) OVER w_prev AS pk,
               FIRST_VALUE(CASE WHEN treated = 0 THEN score END IGNORE NULLS) OVER w_next AS ns,
               FIRST_VALUE(CASE WHEN treated = 0 THEN k END IGNORE NULLS) OVER w_next AS nk
        FROM pop p LEFT JOIN outcome o ON p.k = o.ok
        WINDOW
          w_prev AS (PARTITION BY nation ORDER BY score, k
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          w_next AS (PARTITION BY nation ORDER BY score, k
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    matched AS (
        SELECT nation, k, y, score,
               CASE WHEN ps IS NULL AND ns IS NULL THEN NULL
                    WHEN ns IS NULL THEN pk
                    WHEN ps IS NULL THEN nk
                    WHEN (score - ps) <= (ns - score) THEN pk ELSE nk END AS mk,
               CASE WHEN ps IS NULL AND ns IS NULL THEN NULL
                    WHEN ns IS NULL THEN score - ps
                    WHEN ps IS NULL THEN ns - score
                    WHEN (score - ps) <= (ns - score) THEN score - ps ELSE ns - score END AS dist
        FROM ranked WHERE treated = 1
    )
    SELECT CAST(m.nation AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_treated,
           CAST(COUNT(m.mk) AS BIGINT) AS n_matched,
           CAST(CASE WHEN COUNT(m.mk) = 0 THEN NULL
                ELSE SUM(CASE WHEN m.mk IS NOT NULL THEN m.y - COALESCE(oc.y, 0) END)
                     // COUNT(m.mk) END AS BIGINT) AS att_cents,
           CAST(CASE WHEN COUNT(m.mk) = 0 THEN NULL
                ELSE SUM(m.dist) // COUNT(m.mk) END AS BIGINT) AS avg_match_dist_cents
    FROM matched m LEFT JOIN outcome oc ON m.mk = oc.ok
    GROUP BY m.nation ORDER BY nation
"""


@register("ev16_propensity_match", _PSM_ORACLE)
def ev16_propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV16: propensity-score matching (with replacement) — completes
    the causal toolkit (ev12 DiD, ev14 Qini, m32 permutation): each
    hash-treated customer is matched to its nearest control on the
    score axis WITHIN nation, and the ATT is the matched outcome gap.
    Nearest-neighbor-on-a-sort-key is the as-of join's symmetric twin:
    one nation-PARTITIONED ordered window gives every row its last
    preceding and first following control (ignorenulls last/first),
    and the closer one wins with deterministic tie-break toward the
    lower score — no per-treated scan, no cross join, all integer
    cents.

    Scale: the sort is per-nation (the shuffle key), controls are
    reusable so no iterative assignment pass, and the match is O(n log
    n) in the partition — at 100 TB this is exactly the sorted-merge
    shape AQE loves."""
    from pyspark.sql.window import Window

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    pop = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nation"),
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("score"),
        (portable_hash32(F.concat(F.lit("psm-"), F.col("c_custkey").cast("string"))) % 2).alias("treated"),
    )
    outcome = o.groupBy(F.col("o_custkey").alias("ok")).agg(
        F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias("y")
    )
    w_prev = Window.partitionBy("nation").orderBy("score", "k").rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.partitionBy("nation").orderBy("score", "k").rowsBetween(1, Window.unboundedFollowing)
    ctl_score = F.when(F.col("treated") == 0, F.col("score"))
    ctl_key = F.when(F.col("treated") == 0, F.col("k"))
    ranked = (
        pop.join(outcome, pop.k == outcome.ok, "left")
        .select("k", "nation", "score", "treated", F.coalesce("y", F.lit(0)).alias("y"))
        .select(
            "*",
            F.last(ctl_score, ignorenulls=True).over(w_prev).alias("ps"),
            F.last(ctl_key, ignorenulls=True).over(w_prev).alias("pk"),
            F.first(ctl_score, ignorenulls=True).over(w_next).alias("ns"),
            F.first(ctl_key, ignorenulls=True).over(w_next).alias("nk"),
        )
    )
    prev_closer = (F.col("score") - F.col("ps")) <= (F.col("ns") - F.col("score"))
    matched = ranked.filter(F.col("treated") == 1).select(
        "nation",
        "y",
        F.when(F.col("ps").isNull() & F.col("ns").isNull(), F.lit(None))
        .when(F.col("ns").isNull(), F.col("pk"))
        .when(F.col("ps").isNull(), F.col("nk"))
        .when(prev_closer, F.col("pk"))
        .otherwise(F.col("nk"))
        .alias("mk"),
        F.when(F.col("ps").isNull() & F.col("ns").isNull(), F.lit(None))
        .when(F.col("ns").isNull(), F.col("score") - F.col("ps"))
        .when(F.col("ps").isNull(), F.col("ns") - F.col("score"))
        .when(prev_closer, F.col("score") - F.col("ps"))
        .otherwise(F.col("ns") - F.col("score"))
        .alias("dist"),
    )
    oc = outcome.select(F.col("ok").alias("c_ok"), F.col("y").alias("cy"))
    return (
        matched.join(oc, matched.mk == oc.c_ok, "left")
        .groupBy(F.col("nation").cast("long").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_treated"),
            F.count("mk").cast("long").alias("n_matched"),
            F.expr(
                "CAST(CASE WHEN COUNT(mk) = 0 THEN NULL ELSE "
                "SUM(CASE WHEN mk IS NOT NULL THEN y - COALESCE(cy, 0) END) DIV COUNT(mk) END AS BIGINT)"
            ).alias("att_cents"),
            F.expr(
                "CAST(CASE WHEN COUNT(mk) = 0 THEN NULL ELSE SUM(dist) DIV COUNT(mk) END AS BIGINT)"
            ).alias("avg_match_dist_cents"),
        )
        .orderBy("nation")
    )


@register(
    "m35_partial_dependence",
    """
    WITH pop AS (
        SELECT c_custkey AS k, c_mktsegment AS mkt,
               LEAST(9, GREATEST(0, CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 120000)
                   AS bucket
        FROM customer
    ),
    outcome AS (
        SELECT o_custkey AS ok, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY o_custkey
    ),
    joined AS (
        SELECT p.k, p.mkt, p.bucket, COALESCE(o.y, 0) AS y
        FROM pop p LEFT JOIN outcome o ON p.k = o.ok
    ),
    bucket_means AS (
        SELECT bucket, CAST(SUM(y) // COUNT(*) AS BIGINT) AS bm FROM joined GROUP BY bucket
    ),
    resid AS (
        SELECT j.mkt, j.y - b.bm AS r
        FROM joined j JOIN bucket_means b ON j.bucket = b.bucket
    ),
    mkt_adj AS (
        SELECT mkt, CAST(SUM(r) // COUNT(*) AS BIGINT) AS madj FROM resid GROUP BY mkt
    ),
    pop_adj AS (
        SELECT CAST(SUM(m.madj) // COUNT(*) AS BIGINT) AS mean_adj
        FROM joined j JOIN mkt_adj m ON j.mkt = m.mkt
    )
    SELECT b.bucket,
           CAST(b.bm AS BIGINT) AS bucket_mean_cents,
           CAST(b.bm + (SELECT mean_adj FROM pop_adj) AS BIGINT) AS pdp_cents,
           CAST((SELECT mean_adj FROM pop_adj) AS BIGINT) AS population_adj_cents
    FROM bucket_means b ORDER BY b.bucket
    """,
)
def m35_partial_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M35: partial-dependence table — the model-explainability
    companion to m12_feature_importances: for the additive two-term
    model fitted right here (bucket mean of lifetime order value +
    market-segment residual adjustment, all integer floor-means — the
    m6 target-stats idiom), PDP(bucket g) = E_population[f(g, mkt_i)]
    = bucket_mean(g) + mean_i(mkt_adj(mkt_i)). Because the model is
    additive, the expectation collapses to one broadcast scalar — the
    PDP grid never cross-joins the population (the naive PDP is
    grid x N; the factored one is O(grid + N), which is the 100 TB
    point of this query).

    Plan: three hash-aggs (bucket means, residual adjustments,
    population mean adjustment) chained by broadcast joins; output is
    the 10-row grid."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    pop = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("mkt"),
        F.expr(
            "CAST(least(9, greatest(CAST(0 AS BIGINT), CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) DIV 120000) AS BIGINT)"
        ).alias("bucket"),
    )
    outcome = o.groupBy(F.col("o_custkey").alias("ok")).agg(
        F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias("y")
    )
    joined = pop.join(outcome, pop.k == outcome.ok, "left").select(
        "k", "mkt", "bucket", F.coalesce("y", F.lit(0)).alias("y")
    )
    bucket_means = joined.groupBy("bucket").agg(F.expr("CAST(SUM(y) DIV COUNT(*) AS BIGINT)").alias("bm"))
    resid = joined.join(F.broadcast(bucket_means), "bucket").select("mkt", (F.col("y") - F.col("bm")).alias("r"))
    mkt_adj = resid.groupBy("mkt").agg(F.expr("CAST(SUM(r) DIV COUNT(*) AS BIGINT)").alias("madj"))
    pop_adj = (
        joined.join(F.broadcast(mkt_adj), "mkt")
        .agg(F.expr("CAST(SUM(madj) DIV COUNT(*) AS BIGINT)").alias("mean_adj"))
    )
    return (
        bucket_means.crossJoin(F.broadcast(pop_adj))
        .select(
            "bucket",
            F.col("bm").cast("long").alias("bucket_mean_cents"),
            (F.col("bm") + F.col("mean_adj")).cast("long").alias("pdp_cents"),
            F.col("mean_adj").cast("long").alias("population_adj_cents"),
        )
        .orderBy("bucket")
    )


def _zorder_oracle_sql() -> str:
    inter = " + ".join(
        f"((d1 // {1 << j}) % 2) * {1 << (2 * j + 1)} + ((d2 // {1 << j}) % 2) * {1 << (2 * j)}"
        for j in range(10)
    )
    return f"""
    WITH pts AS (
        SELECT c_custkey % 1024 AS d1,
               LEAST(1023, GREATEST(0, CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) // 1200)
                   AS d2
        FROM customer
    ),
    keyed AS (
        SELECT d1, d2, CAST({inter} AS BIGINT) AS z FROM pts
    ),
    files AS (
        SELECT 'zorder' AS layout, z // 16384 AS file_id, d2 FROM keyed
        UNION ALL
        SELECT 'linear' AS layout, d1 // 16 AS file_id, d2 FROM keyed
    ),
    stats AS (
        SELECT layout, file_id, MIN(d2) AS mn, MAX(d2) AS mx, COUNT(*) AS n_rows
        FROM files GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN mn <= 400 AND mx >= 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
           CAST(SUM(CASE WHEN mn <= 400 AND mx >= 300 THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_scanned,
           CAST(SUM(CASE WHEN mn <= 400 AND mx >= 300 THEN 0 ELSE 1 END) AS BIGINT)
               AS files_pruned
    FROM stats GROUP BY layout ORDER BY layout
    """


@register("x28_zorder_clustering_audit", _zorder_oracle_sql())
def x28_zorder_clustering_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X28: Z-order clustering audit — the quantified case for
    multi-dimensional layout at 100 TB: rows carry two independent
    dimensions (key bucket, value bucket); files are simulated under
    (a) Z-ORDER layout (files = ranges of the 20-bit Morton interleave
    of both dims — the f25 bit trick re-aimed at clustering) and (b)
    the naive linear layout (files = ranges of dim-1 only). The audit
    replays min/max data skipping for a dim-2 probe range against
    each layout's per-file zone map: the linear layout scans every
    file (dim-2 spreads uniformly through all of them), the Z-ordered
    layout prunes most — the exact effect OPTIMIZE ZORDER buys, stated
    as hash-checked numbers instead of a slogan.

    Plan: codegen'd interleave, one hash-agg for the zone maps, one
    2-row rollup."""
    c = t(spark, sf_dir, "customer")
    inter = " + ".join(
        f"((d1 DIV {1 << j}) % 2) * {1 << (2 * j + 1)} + ((d2 DIV {1 << j}) % 2) * {1 << (2 * j)}"
        for j in range(10)
    )
    pts = c.select(
        (F.col("c_custkey") % 1024).cast("long").alias("d1"),
        F.expr(
            "CAST(least(1023, greatest(CAST(0 AS BIGINT),"
            " CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) DIV 1200) AS BIGINT)"
        ).alias("d2"),
    )
    keyed = pts.select("d1", "d2", F.expr(f"CAST({inter} AS BIGINT)").alias("z"))
    z_files = keyed.select(F.lit("zorder").alias("layout"), F.expr("z DIV 16384").alias("file_id"), "d2")
    lin_files = keyed.select(F.lit("linear").alias("layout"), F.expr("d1 DIV 16").alias("file_id"), "d2")
    stats = (
        z_files.unionByName(lin_files)
        .groupBy("layout", "file_id")
        .agg(F.min("d2").alias("mn"), F.max("d2").alias("mx"), F.count(F.lit(1)).alias("n_rows"))
    )
    hit = (F.col("mn") <= 400) & (F.col("mx") >= 300)
    return (
        stats.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("files_scanned"),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("long").alias("rows_scanned"),
            F.sum(F.when(hit, 0).otherwise(1)).cast("long").alias("files_pruned"),
        )
        .orderBy("layout")
    )


# Poisson(1) inverse-CDF thresholds on u in [0, 2^32): P(W<=k) * 2^32
# rounded once in host Python, injected verbatim into both engines.
_POIS1_T = [1580030169, 3160060337, 3950075422, 4213413783, 4279248374, 4292415292]


def _poisson_bootstrap_oracle() -> str:
    w_case = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POIS1_T)
    )
    return f"""
    WITH rows_ AS (
        SELECT o_orderkey AS k, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    reps AS (SELECT UNNEST(RANGE(0, 32)) AS r),
    hashed AS (
        SELECT r.r, rows_.cents,
               ('0x' || SUBSTR(MD5('bs' || CAST(r.r AS VARCHAR) || '-' || CAST(rows_.k AS VARCHAR)), 1, 8))::BIGINT AS u
        FROM rows_ CROSS JOIN reps r
    ),
    weighted AS (
        SELECT r, cents, CASE {w_case} ELSE {len(_POIS1_T)} END AS w
        FROM hashed
    ),
    rep_means AS (
        SELECT r, CAST(SUM(w * cents) // SUM(w) AS BIGINT) AS mean_cents
        FROM weighted GROUP BY r HAVING SUM(w) > 0
    ),
    ranked AS (
        SELECT mean_cents, ROW_NUMBER() OVER (ORDER BY mean_cents, mean_cents) AS rk,
               COUNT(*) OVER () AS n
        FROM rep_means
    ),
    point AS (SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pm FROM rows_)
    SELECT CAST((SELECT pm FROM point) AS BIGINT) AS point_mean_cents,
           CAST(MAX(CASE WHEN rk = 1 THEN mean_cents END) AS BIGINT) AS ci_lo_cents,
           CAST(MAX(CASE WHEN rk = n THEN mean_cents END) AS BIGINT) AS ci_hi_cents,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_replicates
    FROM ranked
    """


@register("m36_poisson_bootstrap_ci", _poisson_bootstrap_oracle())
def m36_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M36: Poisson bootstrap — THE resampling method that works at
    100 TB (multinomial bootstrap needs the global N per resample;
    Poisson(1) weights are independent per row, so every replicate is
    one weighted aggregate in the SAME single pass over the data).
    Here 32 replicates of the mean order value: each (row, replicate)
    draws its weight from the portable-md5 u via fixed integer
    inverse-CDF thresholds (computed once in host Python — no float
    RNG in either engine), replicate means are exact integer
    floor-means, and the CI endpoints are order statistics of the
    32-row replicate frame (min/max here = the ~3%/97% envelope at
    K=32; K is a parameter).

    Plan: one scan fans out x32 via a broadcast replicate range (the
    m32/m18 K-row idiom), partial aggregation collapses map-side, and
    the order-statistics window runs over 32 rows partitioned...
    deliberately ordered GLOBALLY — but over a 32-row frame, which is
    the documented broadcast-scale exception class; see plan_audit
    allowlist entry."""
    o = t(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    rows_ = o.select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    reps = t(spark, sf_dir, "orders").sparkSession.range(0, 32).select(F.col("id").alias("r"))
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("bs"), F.col("r").cast("string"), F.lit("-"), F.col("k").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    w_expr = F.lit(len(_POIS1_T))
    for kk in range(len(_POIS1_T) - 1, -1, -1):
        w_expr = F.when(u < _POIS1_T[kk], kk).otherwise(w_expr)
    weighted = rows_.crossJoin(F.broadcast(reps)).select("r", "cents", w_expr.alias("w"))
    rep_means = (
        weighted.groupBy("r")
        .agg(F.expr("CAST(SUM(w * cents) DIV SUM(w) AS BIGINT)").alias("mean_cents"), F.sum("w").alias("tw"))
        .filter(F.col("tw") > 0)
        .select("r", "mean_cents")
    )
    # order statistics over the 32-row replicate frame: broadcast
    # non-equi rank (the repo's no-global-window idiom)
    a, b = rep_means.alias("a"), F.broadcast(rep_means.alias("b"))
    ranked = (
        a.join(b, (F.col("b.mean_cents") < F.col("a.mean_cents")) | ((F.col("b.mean_cents") == F.col("a.mean_cents")) & (F.col("b.r") <= F.col("a.r"))))
        .groupBy(F.col("a.r").alias("r"), F.col("a.mean_cents").alias("mean_cents"))
        .agg(F.count(F.lit(1)).alias("rk"))
    )
    n_reps = rep_means.agg(F.count(F.lit(1)).alias("n"))
    point = rows_.agg(F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("pm"))
    return (
        ranked.crossJoin(F.broadcast(n_reps))
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("mean_cents"))).cast("long").alias("ci_lo_cents"),
            F.max(F.when(F.col("rk") == F.col("n"), F.col("mean_cents"))).cast("long").alias("ci_hi_cents"),
            F.first("n").cast("long").alias("n_replicates"),
        )
        .crossJoin(F.broadcast(point))
        .select(
            F.col("pm").cast("long").alias("point_mean_cents"),
            "ci_lo_cents",
            "ci_hi_cents",
            "n_replicates",
        )
    )


def _hrw_oracle_sql() -> str:
    return """
    WITH shards7 AS (SELECT UNNEST(RANGE(0, 7)) AS s),
    shards8 AS (SELECT UNNEST(RANGE(0, 8)) AS s),
    a7 AS (
        SELECT doc_id, ARG_MAX(s, h) AS shard FROM (
            SELECT d.doc_id, s.s,
                   ('0x' || SUBSTR(MD5('hrw-' || CAST(s.s AS VARCHAR) || '-' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT * 16 + s.s AS h
            FROM documents d CROSS JOIN shards7 s
        ) GROUP BY doc_id
    ),
    a8 AS (
        SELECT doc_id, ARG_MAX(s, h) AS shard FROM (
            SELECT d.doc_id, s.s,
                   ('0x' || SUBSTR(MD5('hrw-' || CAST(s.s AS VARCHAR) || '-' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT * 16 + s.s AS h
            FROM documents d CROSS JOIN shards8 s
        ) GROUP BY doc_id
    )
    SELECT CAST(a8.shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN a7.shard <> a8.shard THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_in
    FROM a8 JOIN a7 ON a8.doc_id = a7.doc_id
    GROUP BY a8.shard ORDER BY shard
    """


@register("x29_rendezvous_sharding", _hrw_oracle_sql())
def x29_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29: rendezvous (highest-random-weight) sharding — how you grow
    a 100 TB cluster from 7 to 8 shards WITHOUT reshuffling the world:
    each doc goes to the shard with the highest hash(shard, doc), so
    adding shard 7 steals ~1/8 of every old shard's docs and moves
    NOTHING between old shards. The output states that property as
    hash-checked numbers: per new-layout shard, total docs and docs
    that changed assignment — n_moved_in is nonzero ONLY for shard 7
    (the test pins it; consistent-hash rings buy the same guarantee
    with worse balance). The weight is the portable-md5 hash with the
    shard id folded into the low bits as the deterministic tiebreak.

    Plan: two broadcast fan-outs (x7, x8 — constant frames), two
    max_by aggregates keyed by doc, one join + rollup. Linear in the
    corpus, constant in shard count."""
    d = t(spark, sf_dir, "documents").select("doc_id")

    def assign(k: int):
        shards = d.sparkSession.range(0, k).select(F.col("id").alias("s"))
        h = (
            portable_hash32(
                F.concat(F.lit("hrw-"), F.col("s").cast("string"), F.lit("-"), F.col("doc_id").cast("string"))
            )
            * 16
            + F.col("s")
        ).alias("h")
        return (
            d.crossJoin(F.broadcast(shards))
            .select("doc_id", "s", h)
            .groupBy("doc_id")
            .agg(F.expr("max_by(s, h)").alias("shard"))
        )

    a7 = assign(7).select(F.col("doc_id"), F.col("shard").alias("shard7"))
    a8 = assign(8).select(F.col("doc_id"), F.col("shard").alias("shard8"))
    return (
        a8.join(a7, "doc_id")
        .groupBy(F.col("shard8").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("shard7") != F.col("shard8"), 1).otherwise(0)).cast("long").alias("n_moved_in"),
        )
        .orderBy("shard")
    )


@register(
    "ev17_cuped_adjustment",
    """
    WITH pop AS (
        SELECT c_custkey AS k,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x,
               ('0x' || SUBSTR(MD5('cuped-' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 AS t
        FROM customer
    ),
    outcome AS (
        SELECT o_custkey AS ok, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY o_custkey
    ),
    units AS (
        SELECT p.k, p.t, p.x, COALESCE(o.y, 0) AS y
        FROM pop p LEFT JOIN outcome o ON p.k = o.ok
    ),
    means AS (
        SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) AS mx,
               CAST(SUM(y) // COUNT(*) AS BIGINT) AS my,
               COUNT(*) AS n
        FROM units
    ),
    centered AS (
        SELECT u.k, u.t, u.y, u.x - m.mx AS cx, u.y - m.my AS cy
        FROM units u CROSS JOIN means m
    ),
    theta AS (
        SELECT CAST(SUM(cx * cy) * 1000 // SUM(cx * cx) AS BIGINT) AS th
        FROM centered
    ),
    adjusted AS (
        SELECT c.t, c.y, c.cy,
               (c.y * 1000 - t.th * c.cx) // 1000 AS ya
        FROM centered c CROSS JOIN theta t
    ),
    arm AS (
        SELECT t,
               COUNT(*) AS n,
               CAST(SUM(y) // COUNT(*) AS BIGINT) AS mean_y,
               CAST(SUM(ya) // COUNT(*) AS BIGINT) AS mean_ya
        FROM adjusted GROUP BY t
    ),
    adj_mean AS (
        SELECT CAST(SUM(ya) // COUNT(*) AS BIGINT) AS mya FROM adjusted
    ),
    vars_ AS (
        SELECT CAST(SUM(((a.cy) // 100) * ((a.cy) // 100)) // COUNT(*) AS BIGINT) AS var_u_h,
               CAST(SUM(((a.ya - m.mya) // 100) * ((a.ya - m.mya) // 100)) // COUNT(*) AS BIGINT) AS var_a_h
        FROM adjusted a CROSS JOIN adj_mean m
    )
    SELECT (SELECT th FROM theta) AS theta_milli,
           CAST((SELECT MAX(CASE WHEN t = 1 THEN mean_y END) - MAX(CASE WHEN t = 0 THEN mean_y END) FROM arm) AS BIGINT) AS effect_unadj_cents,
           CAST((SELECT MAX(CASE WHEN t = 1 THEN mean_ya END) - MAX(CASE WHEN t = 0 THEN mean_ya END) FROM arm) AS BIGINT) AS effect_cuped_cents,
           CAST(100 - var_a_h * 100 // var_u_h AS BIGINT) AS var_reduction_pct,
           CAST((SELECT MAX(CASE WHEN t = 1 THEN n END) FROM arm) AS BIGINT) AS n_treated,
           CAST((SELECT MAX(CASE WHEN t = 0 THEN n END) FROM arm) AS BIGINT) AS n_control
    FROM vars_
    """,
)
def ev17_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV17: CUPED variance reduction — the experimentation-platform
    standard (Deng et al., WSDM'13): adjust the experiment metric with
    the pre-experiment covariate, ya = y - theta*(x - E[x]), theta =
    cov(x,y)/var(x), and the treatment-effect estimate keeps its mean
    while its variance drops by corr²(x,y). Everything is exact
    integer arithmetic in a fixed overflow budget: center FIRST (so
    cross-products stay under int64 — the naive n*Σxy form overflows
    at 1e21), theta in FLOOR-milli, adjusted outcomes in floor-cents,
    variances over hectocent deviations. Output: theta, both effect
    estimates, the realized variance-reduction percentage, arm sizes.

    Plan: three global aggregates chained by 1-row broadcast cross
    joins (the repo's no-global-window scalar idiom) plus one 2-row
    arm rollup — every pass is a map-side-combining scan."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    pop = c.select(
        F.col("c_custkey").alias("k"),
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("x"),
        (portable_hash32(F.concat(F.lit("cuped-"), F.col("c_custkey").cast("string"))) % 2).alias("t"),
    )
    outcome = o.groupBy(F.col("o_custkey").alias("ok")).agg(
        F.expr("CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias("y")
    )
    units = pop.join(outcome, pop.k == outcome.ok, "left").select(
        "k", "t", "x", F.coalesce("y", F.lit(0)).alias("y")
    )
    means = units.agg(
        F.expr("CAST(SUM(x) DIV COUNT(*) AS BIGINT)").alias("mx"),
        F.expr("CAST(SUM(y) DIV COUNT(*) AS BIGINT)").alias("my"),
    )
    centered = units.crossJoin(F.broadcast(means)).select(
        "k", "t", "y", (F.col("x") - F.col("mx")).alias("cx"), (F.col("y") - F.col("my")).alias("cy")
    )
    theta = centered.agg(F.expr("CAST(SUM(cx * cy) * 1000 DIV SUM(cx * cx) AS BIGINT)").alias("th"))
    adjusted = centered.crossJoin(F.broadcast(theta)).select(
        "t", "y", "cy", F.expr("(y * 1000 - th * cx) DIV 1000").alias("ya"), "th"
    )
    arm = adjusted.groupBy("t").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(y) DIV COUNT(*) AS BIGINT)").alias("mean_y"),
        F.expr("CAST(SUM(ya) DIV COUNT(*) AS BIGINT)").alias("mean_ya"),
    )
    arm_row = arm.agg(
        F.expr("CAST(MAX(CASE WHEN t = 1 THEN mean_y END) - MAX(CASE WHEN t = 0 THEN mean_y END) AS BIGINT)").alias("effect_unadj_cents"),
        F.expr("CAST(MAX(CASE WHEN t = 1 THEN mean_ya END) - MAX(CASE WHEN t = 0 THEN mean_ya END) AS BIGINT)").alias("effect_cuped_cents"),
        F.expr("CAST(MAX(CASE WHEN t = 1 THEN n END) AS BIGINT)").alias("n_treated"),
        F.expr("CAST(MAX(CASE WHEN t = 0 THEN n END) AS BIGINT)").alias("n_control"),
    )
    adj_mean = adjusted.agg(F.expr("CAST(SUM(ya) DIV COUNT(*) AS BIGINT)").alias("mya"))
    vars_ = (
        adjusted.crossJoin(F.broadcast(adj_mean))
        .agg(
            F.expr("CAST(SUM((cy DIV 100) * (cy DIV 100)) DIV COUNT(*) AS BIGINT)").alias("var_u_h"),
            F.expr("CAST(SUM(((ya - mya) DIV 100) * ((ya - mya) DIV 100)) DIV COUNT(*) AS BIGINT)").alias("var_a_h"),
        )
    )
    return (
        vars_.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(arm_row))
        .select(
            F.col("th").cast("long").alias("theta_milli"),
            "effect_unadj_cents",
            "effect_cuped_cents",
            F.expr("CAST(100 - var_a_h * 100 DIV var_u_h AS BIGINT)").alias("var_reduction_pct"),
            "n_treated",
            "n_control",
        )
    )


@register(
    "ev18_shapley_attribution",
    """
    WITH touched AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             + MAX(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
             + MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) AS bits,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    seen AS (
        SELECT bits, COUNT(*) AS n_s, SUM(conv) AS c_s FROM touched GROUP BY bits
    ),
    subsets AS (
        SELECT u.s AS bits,
               COALESCE((SELECT CAST(c_s * 1000000 // n_s AS BIGINT) FROM seen WHERE seen.bits = u.s), 0) AS v
        FROM (SELECT UNNEST(RANGE(0, 8)) AS s) u
    ),
    channels(ch, b) AS (VALUES ('view', 1), ('click', 2), ('signup', 4)),
    marginals AS (
        SELECT c.ch,
               CASE BIT_COUNT(s0.bits) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END
                 * (s1.v - s0.v) AS term
        FROM channels c
        JOIN subsets s0 ON (s0.bits & c.b) = 0
        JOIN subsets s1 ON s1.bits = (s0.bits | c.b)
    )
    SELECT ch AS channel,
           CAST(SUM(term) // 6 AS BIGINT) AS shapley_micro
    FROM marginals GROUP BY ch ORDER BY channel
    """,
)
def ev18_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV18: exact Shapley channel attribution — the game-theoretic
    upgrade over ev3's last-click rule (the marketing-measurement
    standard): each channel's credit is its average marginal lift in
    conversion rate across every coalition it can join. With 3
    channels the coalition space is 8 subsets, so Shapley is EXACT —
    characteristic values v(S) are floor-micro conversion rates per
    observed touch-bitmap (unobserved subsets contribute v=0), and the
    weights |S|!(n-|S|-1)!/n! become the integers {2,1,2}/6, so the
    whole computation is integer arithmetic over an 8-row frame.

    Plan: one hash-agg to per-user bitmaps (the only data-sized
    shuffle), one to the 8-row coalition census; the Shapley sum is a
    broadcast 3x8 join. At 100 TB only the bitmap agg grows; 10+
    channels would need sampled coalitions (the documented frontier —
    exact Shapley is exponential by nature)."""
    ev = t(spark, sf_dir, "events")
    touched = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
            + F.max(F.when(F.col("event_type") == "click", 2).otherwise(0))
            + F.max(F.when(F.col("event_type") == "signup", 4).otherwise(0))
        ).alias("bits"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
    )
    seen = touched.groupBy("bits").agg(
        F.count(F.lit(1)).alias("n_s"), F.sum("conv").alias("c_s")
    )
    allsets = ev.sparkSession.range(0, 8).select(F.col("id").cast("int").alias("bits"))
    subsets = (
        allsets.join(seen, "bits", "left")
        .select(
            "bits",
            F.coalesce(F.expr("CAST(c_s * 1000000 DIV n_s AS BIGINT)"), F.lit(0)).alias("v"),
        )
    )
    channels = ev.sparkSession.createDataFrame([("view", 1), ("click", 2), ("signup", 4)], "ch string, b int")
    s0 = subsets.select(F.col("bits").alias("bits0"), F.col("v").alias("v0"))
    s1 = subsets.select(F.col("bits").alias("bits1"), F.col("v").alias("v1"))
    marginals = (
        F.broadcast(channels)
        .join(F.broadcast(s0), F.expr("(bits0 & b) = 0"))
        .join(F.broadcast(s1), F.expr("bits1 = (bits0 | b)"))
        .select(
            "ch",
            (
                F.when(F.bit_count("bits0") == 0, 2)
                .when(F.bit_count("bits0") == 1, 1)
                .otherwise(2)
                * (F.col("v1") - F.col("v0"))
            ).alias("term"),
        )
    )
    return (
        marginals.groupBy(F.col("ch").alias("channel"))
        .agg(F.expr("CAST(SUM(term) DIV 6 AS BIGINT)").alias("shapley_micro"))
        .orderBy("channel")
    )


@register(
    "a44_trimmed_mean",
    """
    WITH vals AS (
        SELECT c.c_nationkey AS nation, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    ranked AS (
        SELECT nation, cents,
               ROW_NUMBER() OVER (PARTITION BY nation ORDER BY cents, cents) AS rk,
               COUNT(*) OVER (PARTITION BY nation) AS n
        FROM vals
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(ANY_VALUE(n) AS BIGINT) AS n,
           CAST(SUM(cents) // COUNT(*) AS BIGINT) AS raw_mean_cents,
           CAST(SUM(CASE WHEN rk > n // 10 AND rk <= n - n // 10 THEN cents END)
                // SUM(CASE WHEN rk > n // 10 AND rk <= n - n // 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS trimmed_mean_cents,
           CAST(SUM(CASE WHEN rk <= n // 10 OR rk > n - n // 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_trimmed
    FROM ranked GROUP BY nation ORDER BY nation
    """,
)
def a44_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A44: 10%-trimmed mean per nation — the robust-metric hygiene
    every experimentation/monitoring platform applies before comparing
    heavy-tailed money metrics (one whale order moves a raw mean;
    the trimmed mean drops the top and bottom decile COUNT exactly,
    floor(n/10) each side, by rank). Rank ties break on the value
    itself so trimming is deterministic; means are exact integer
    floor-division.

    Plan: one join, one nation-PARTITIONED ranking window (the
    repo-wide no-global-window discipline), one final hash-agg — the
    window input is the per-nation order list, which is also the
    natural 100 TB partition."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    vals = o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey")).select(
        F.col("c_nationkey").alias("nation"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    w_rk = Window.partitionBy("nation").orderBy("cents")
    w_n = Window.partitionBy("nation")
    ranked = vals.select(
        "nation",
        "cents",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    keep = (F.col("rk") > F.expr("n DIV 10")) & (F.col("rk") <= F.expr("n - n DIV 10"))
    return (
        ranked.groupBy(F.col("nation").cast("long").alias("nation"))
        .agg(
            F.first("n").cast("long").alias("n"),
            F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("raw_mean_cents"),
            F.expr(
                "CAST(SUM(CASE WHEN rk > n DIV 10 AND rk <= n - n DIV 10 THEN cents END)"
                " DIV SUM(CASE WHEN rk > n DIV 10 AND rk <= n - n DIV 10 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("trimmed_mean_cents"),
            F.sum(F.when(~keep, 1).otherwise(0)).cast("long").alias("n_trimmed"),
        )
        .orderBy("nation")
    )


_ALLEN_CASE = """
    CASE
        WHEN ae < bs THEN 'before'
        WHEN as_ > be THEN 'after'
        WHEN as_ = bs AND ae = be THEN 'equals'
        WHEN ae = bs THEN 'meets'
        WHEN as_ = be THEN 'met_by'
        WHEN as_ = bs AND ae < be THEN 'starts'
        WHEN as_ = bs AND ae > be THEN 'started_by'
        WHEN ae = be AND as_ > bs THEN 'finishes'
        WHEN ae = be AND as_ < bs THEN 'finished_by'
        WHEN as_ > bs AND ae < be THEN 'during'
        WHEN as_ < bs AND ae > be THEN 'contains'
        WHEN as_ < bs AND ae > bs AND ae < be THEN 'overlaps'
        ELSE 'overlapped_by'
    END
"""


@register(
    "j13_allen_interval_algebra",
    f"""
    WITH iv AS (
        SELECT user_id, event_type,
               EPOCH_US(MIN(ts)) AS s, EPOCH_US(MAX(ts)) AS e
        FROM events GROUP BY user_id, event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.s AS as_, a.e AS ae, b.s AS bs, b.e AS be
        FROM iv a JOIN iv b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
    )
    SELECT type_a, type_b, {_ALLEN_CASE} AS relation,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY type_a, type_b, relation
    ORDER BY type_a, type_b, relation
    """,
)
def j13_allen_interval_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: Allen's interval algebra — the COMPLETE temporal-relation
    classification (all 13 relations: before/meets/overlaps/starts/
    during/finishes, inverses, equals) that the asof/range/interval
    joins (j9/j12/temporal.py) each hard-code one slice of. Per user,
    each event type's activity span [min ts, max ts] is an interval;
    every type pair is classified with ONE branch-ordered CASE over
    exact epoch-microsecond integers (the SAME SQL text runs on both
    engines — equality cases are decided before containment, so the
    cascade is total and unambiguous), then the corpus rolls up to
    (type_a, type_b, relation) counts — the temporal-profile
    fingerprint of the event stream.

    Plan: one (user, type) agg, one per-user self-join (bounded: 5
    types -> 10 pairs per user), one rollup — all partial-agg
    shuffles keyed by user then by the 75-value rollup key."""
    ev = t(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", "event_type").agg(
        F.unix_micros(F.min("ts")).alias("s"), F.unix_micros(F.max("ts")).alias("e")
    )
    a = iv.select(F.col("user_id"), F.col("event_type").alias("type_a"), F.col("s").alias("as_"), F.col("e").alias("ae"))
    b = iv.select(F.col("user_id").alias("ub"), F.col("event_type").alias("type_b"), F.col("s").alias("bs"), F.col("e").alias("be"))
    pairs = a.join(b, (a.user_id == b.ub) & (F.col("type_a") < F.col("type_b")))
    return (
        pairs.select("type_a", "type_b", F.expr(_ALLEN_CASE).alias("relation"))
        .groupBy("type_a", "type_b", "relation")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("type_a", "type_b", "relation")
    )


@register(
    "f26_snowflake_ids",
    """
    WITH ordered AS (
        SELECT event_id, EPOCH_MS(ts) AS ts_ms,
               CAST(user_id % 32 AS BIGINT) AS worker,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id % 32, EPOCH_MS(ts)
                   ORDER BY event_id) - 1 AS seq
        FROM events
    ),
    ids AS (
        SELECT event_id, worker,
               ts_ms * 131072 + worker * 4096 + seq AS snowflake_id
        FROM ordered WHERE seq < 4096
    )
    SELECT CAST(worker AS BIGINT) AS worker,
           CAST(COUNT(*) AS BIGINT) AS n_ids,
           CAST(COUNT(DISTINCT snowflake_id) AS BIGINT) AS n_distinct,
           CAST(MIN(snowflake_id) AS BIGINT) AS min_id,
           CAST(MAX(snowflake_id) AS BIGINT) AS max_id
    FROM ids GROUP BY worker ORDER BY worker
    """,
)
def f26_snowflake_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F26: Snowflake-style distributed ID generation — the
    coordination-free unique-id scheme every large ingest pipeline
    uses: id = timestamp_ms << 17 | worker << 12 | sequence (5 worker
    bits, 12 sequence bits here). The sequence is a ROW_NUMBER
    partitioned by (worker, millisecond) with a deterministic
    tiebreak, so ids are unique BY CONSTRUCTION without any global
    counter — exactly why the scheme scales: each worker mints ids
    from local state only. The audit reports per-worker id counts,
    distinct counts (uniqueness evidence the test pins globally) and
    id ranges (time-ordering evidence: ids sort by timestamp across
    workers).

    Plan: one partitioned ranking window + one hash-agg; the window
    key (worker, ms) is tiny per partition — no global funnel."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy(F.expr("user_id % 32"), F.expr("unix_millis(ts)")).orderBy("event_id")
    ordered = ev.select(
        "event_id",
        F.expr("unix_millis(ts)").alias("ts_ms"),
        F.expr("CAST(user_id % 32 AS BIGINT)").alias("worker"),
        (F.row_number().over(w) - 1).alias("seq"),
    )
    ids = ordered.filter(F.col("seq") < 4096).select(
        "event_id",
        "worker",
        (F.col("ts_ms") * 131072 + F.col("worker") * 4096 + F.col("seq")).alias("snowflake_id"),
    )
    return (
        ids.groupBy(F.col("worker").cast("long").alias("worker"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ids"),
            F.countDistinct("snowflake_id").cast("long").alias("n_distinct"),
            F.min("snowflake_id").cast("long").alias("min_id"),
            F.max("snowflake_id").cast("long").alias("max_id"),
        )
        .orderBy("worker")
    )
