"""Temporal join operators: as-of join, binned range join, and an
Arrow-batched custom operator (SURVEY.md §2.5/§2.10 gap-fillers; the
reference has no temporal joins — these are the operators a
training-data / event-log pipeline needs that Spark lacks as built-ins).

Scale notes (the 100 TB design):

- **as-of join** uses the union+window formulation, NOT join+filter:
  tag both inputs, union, one shuffle on the key, then
  ``last(right_cols, ignorenulls)`` over an unbounded-preceding window.
  A key with n left × m right rows costs n+m window rows — the
  join-then-rank formulation materializes n·m pairs per key before
  filtering, which dies on hot keys. One shuffle total, no range
  predicate the optimizer can't handle.
- **range join** turns an inequality join (which Spark executes as a
  broadcast-nested-loop or a per-key cartesian) into an equi hash join
  by binning time: the left side explodes to the coarse bins its window
  overlaps (≤ window/bin_size + 1 bins), the right side joins on its own
  bin, and an exact filter trims bin-edge false positives. Shuffle
  volume is |left|·bins + |right|, never |left|·|right|.
- **applyInPandas** custom op: the escape hatch pattern for semantics
  built-ins can't express — grouped Arrow batches, vectorized pandas
  inside, explicit result schema. Kept integer-exact (cent cumsum) so
  the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realestate_engine.registry import register, t


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the columns of the single
    right row with the greatest ``right_ts`` <= ``left_ts`` (backward;
    forward = smallest >=), matching on ``on`` keys. Left rows with no
    match keep nulls (left-outer semantics).

    ``right_cols`` maps right column name -> output column name.

    Implementation: union trick (see module docstring). Right rows sort
    before left rows at equal timestamps, so the match is inclusive
    (at-or-before). Deterministic for duplicate right timestamps via the
    ordered right_cols tiebreak only if the caller's right side is
    unique per (on, right_ts) — event logs with sub-second resolution
    are; otherwise pre-aggregate the right side first.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    r = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        *[F.col(src).alias(dst) for src, dst in right_cols.items()],
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_ats", F.col(left_ts)).withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    order = [F.col("_ats"), F.col("_side")]
    if direction == "forward":
        order = [F.col("_ats").desc(), F.col("_side")]
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for dst in right_cols.values():
        u = u.withColumn(dst, F.last(dst, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side", "_ats")


@register(
    "asof_last_click_before_purchase",
    """
    SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
           c.ts AS last_click_ts, c.event_id AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event annotated with the user's most
    recent click at-or-before it. The oracle is DuckDB's native ASOF
    JOIN — same semantics, independent implementation."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols={"ts": "last_click_ts", "event_id": "last_click_id"},
    ).select("event_id", "user_id", "ts", "purchase_value", "last_click_ts", "last_click_id")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    bin_seconds: int | None = None,
) -> DataFrame:
    """Inner range join: pairs (l, r) sharing ``on`` keys with
    ``r[right_ts]`` in the half-open window (l[left_ts] - window,
    l[left_ts]]. Executed as an equi hash join on (keys, time bin): the
    left row explodes to every bin its window can overlap, the exact
    range predicate filters bin-edge false positives. Returns all left
    columns plus all right columns (caller pre-aliases collisions)."""
    bin_s = bin_seconds or window_seconds
    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))
    lb = left.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor((l_epoch - window_seconds) / bin_s), F.floor(l_epoch / bin_s))),
    )
    rb = right.withColumn("_bin", F.floor(r_epoch / bin_s))
    exact = (F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECOND")) & (
        F.col(right_ts) <= F.col(left_ts)
    )
    return lb.join(rb, [*on, "_bin"]).filter(exact).drop("_bin")


@register(
    "range_join_clicks_before_purchase",
    """
    SELECT p.event_id, p.user_id,
           CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks_1h
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within the hour preceding each purchase,
    counted per purchase (0 for none). The binned inner join feeds a
    per-purchase count; purchases without candidates re-enter via a
    left join against the counts."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    matched = range_join_binned(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="c_ts", window_seconds=3600
    )
    counts = matched.groupBy("event_id", "user_id").agg(F.count("c_id").alias("n_clicks_1h"))
    return (
        purchases.join(counts, ["event_id", "user_id"], "left")
        .select("event_id", "user_id", F.coalesce("n_clicks_1h", F.lit(0)).alias("n_clicks_1h"))
    )


@register(
    "custom_running_total_pandas",
    """
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
    FROM events
    """,
)
def custom_running_total_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via the Arrow escape hatch: per-user
    running total as a partition-streaming mapInPandas. The input is
    hash-partitioned on user_id (every user wholly in one partition) and
    sorted within partitions by (user_id, ts, event_id); each Arrow
    batch then computes a vectorized ``groupby(user_id).cumsum()`` and
    threads an O(1) carry — only the batch-boundary user can continue
    into the next batch under that sort. Python invocations scale with
    partitions x Arrow batches, NOT group count: the r7 grouped
    applyInPandas form paid one Python call per user (1,500 calls at
    sf0.1; millions at 100 TB), this pays ~one per 10k-row batch. The
    arithmetic is integer cents (floor, then int64 cumsum) so the result
    is bit-exact against the SQL-window oracle.

    Width (r15): bytes-derived with the cores/4 Python-worker floor
    (registry.input_width). The r8 "width follows core count" sweep
    predates the r14 partition-streaming rewrite — with ~one Python
    call per 10k-row Arrow batch instead of per group, extra width
    past the worker floor only adds near-empty tasks: re-measured at
    sf0.1 on local[32], width 8 = 0.32s best-of-3 vs 32 = 0.40s (and
    the r14 driver's 8-core run beat the 32-core time for exactly this
    reason). At real volume bytes/32MB >> cores and the clamp
    saturates to defaultParallelism — same production behavior."""

    def running_stream(batches):
        import numpy as np

        carry_user, carry_total = None, 0
        for pdf in batches:
            if pdf.empty:
                continue
            cents = np.floor(pdf["value"].to_numpy() * 100).astype("int64")
            pdf = pdf.assign(_cents=cents)
            csum = pdf.groupby("user_id", sort=False, dropna=False)["_cents"].cumsum()
            if carry_user is not None:
                csum = csum + np.where(
                    pdf["user_id"].to_numpy() == carry_user, carry_total, 0
                )
            pdf["running_cents"] = csum
            carry_user = pdf["user_id"].iloc[-1]
            carry_total = int(pdf["running_cents"].iloc[-1])
            yield pdf[["user_id", "event_id", "ts", "running_cents"]]

    from realestate_engine.registry import input_width

    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    # Explicit repartition with an explicit count: AQE would coalesce
    # this ~2 MB shuffle to 1 partition, serializing every batch through
    # a single Python worker (measured 8x slower at sf0.1).
    n_part = input_width(spark, sf_dir, "events", python_floor=True)
    return (
        ev.repartition(n_part, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            running_stream,
            schema="user_id long, event_id long, ts timestamp, running_cents long",
        )
    )


def salted_groupby_sum(
    df: DataFrame,
    key: str,
    value: str,
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-resistant aggregation: salt the hot key with a deterministic
    hash of ``salt_col`` (any high-cardinality column), partially
    aggregate on (key, salt) — spreading one hot key over ``buckets``
    reducers — then combine partials on the bare key. Two shuffles, but
    the second carries ≤ |keys|·buckets rows. Semantically identical to
    the plain groupBy (sums are associative); use when one key holds a
    double-digit percentage of the data and AQE skew-join can't help
    (it splits join partitions, not aggregation groups)."""
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(salt_col)), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias(f"sum_{value}"), F.sum("_pcnt").cast("bigint").alias("n_rows")
    )


@register(
    "skew_salted_agg",
    """
    SELECT user_id,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY user_id
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over events.user_id (the hot-key
    mitigation, oracle-checked equal to the plain groupBy). Values sum
    as integer cents so the two-level association is bit-exact."""
    ev = t(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100).cast("bigint")
    )
    out = salted_groupby_sum(ev, key="user_id", value="cents", salt_col="event_id")
    return out.select("user_id", F.col("sum_cents"), "n_rows")


@register(
    "x7_upsert_keep_latest",
    """
    WITH changes AS (
        -- deterministic synthetic CDC batch: every 10th order re-priced,
        -- plus brand-new keys above the current max
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) * 11 / 1000.0 AS o_totalprice,
               o_orderstatus, 2 AS version
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice, 'N' AS o_orderstatus, 2 AS version
        FROM orders WHERE o_orderkey % 1000 = 7
    ),
    unioned AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus, 1 AS version FROM orders
        UNION ALL
        SELECT * FROM changes
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        FROM unioned
    )
    SELECT o_orderkey, o_totalprice, o_orderstatus, CAST(version AS INT) AS version
    FROM ranked WHERE rn = 1
    ORDER BY o_orderkey
    """,
)
def x7_upsert_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: MERGE/upsert without a table format — the CDC apply step:
    base ∪ change-batch → row_number keep-highest-version per key.
    One shuffle on the merge key; at 100 TB the base is written
    bucketed by o_orderkey so only the union's change side shuffles.
    The change batch here is derived deterministically from the base so
    the oracle can state it."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    base = o.withColumn("version", F.lit(1))
    # +10% in exact integer cents (ROUND(x*1.1, 2) lands on half-cent
    # boundaries where Spark and DuckDB round differently)
    repriced = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn(
            "o_totalprice",
            F.round(F.col("o_totalprice") * 100).cast("bigint") * 11 / 1000.0,
        )
        .withColumn("version", F.lit(2))
    )
    inserted = (
        o.filter(F.col("o_orderkey") % 1000 == 7)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10000000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("version", F.lit(2))
    )
    unioned = base.unionByName(repriced).unionByName(inserted)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus", F.col("version").cast("int").alias("version"))
        .orderBy("o_orderkey")
    )


@register(
    "x8_incremental_agg_maintenance",
    """
    WITH old_part AS (
        SELECT o_orderpriority,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'
        GROUP BY 1
    ),
    delta_part AS (
        SELECT o_orderpriority,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        GROUP BY 1
    ),
    merged AS (
        SELECT o_orderpriority, SUM(cents) AS cents, SUM(n) AS n
        FROM (SELECT * FROM old_part UNION ALL SELECT * FROM delta_part)
        GROUP BY 1
    ),
    direct AS (
        SELECT o_orderpriority,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    )
    SELECT m.o_orderpriority,
           CAST(m.n AS BIGINT) AS n_orders,
           m.cents / 100.0 AS total_price,
           (m.cents = d.cents AND m.n = d.n) AS matches_direct
    FROM merged m JOIN direct d USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
)
def x8_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: incremental rollup maintenance — yesterday's partial
    aggregate + today's delta merge by re-aggregating the mergeable
    state (integer cent sums and counts), no base re-scan. The query
    carries its own proof: matches_direct compares the merged state to
    a direct full recompute inside the plan. This is why the engine's
    money aggregates are kept in exact cents: float partials would NOT
    merge associatively."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cutoff = F.lit("2001-01-01").cast("timestamp")

    def part(df):
        return df.groupBy("o_orderpriority").agg(
            F.sum(cents).alias("cents"), F.count(F.lit(1)).alias("n")
        )

    old_part = part(o.filter(F.col("o_orderdate") < cutoff))
    delta_part = part(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        old_part.unionByName(delta_part)
        .groupBy("o_orderpriority")
        .agg(F.sum("cents").alias("cents"), F.sum("n").alias("n"))
    )
    direct = part(o).select(
        "o_orderpriority", F.col("cents").alias("d_cents"), F.col("n").alias("d_n")
    )
    return (
        merged.join(direct, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("n").cast("bigint").alias("n_orders"),
            (F.col("cents") / 100.0).alias("total_price"),
            ((F.col("cents") == F.col("d_cents")) & (F.col("n") == F.col("d_n"))).alias(
                "matches_direct"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "x10_join_ivm",
    """
    WITH ao AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 7 <> 0),
    da AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 7 = 0),
    bo AS (SELECT l_orderkey, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem WHERE l_linenumber < 5),
    db AS (SELECT l_orderkey, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem WHERE l_linenumber >= 5),
    maintained AS (
        SELECT o_orderpriority, SUM(cents) AS cents, COUNT(*) AS n FROM (
            SELECT ao.o_orderpriority, bo.cents FROM ao JOIN bo ON bo.l_orderkey = ao.o_orderkey
            UNION ALL
            SELECT da.o_orderpriority, bo.cents FROM da JOIN bo ON bo.l_orderkey = da.o_orderkey
            UNION ALL
            SELECT ao.o_orderpriority, db.cents FROM ao JOIN db ON db.l_orderkey = ao.o_orderkey
            UNION ALL
            SELECT da.o_orderpriority, db.cents FROM da JOIN db ON db.l_orderkey = da.o_orderkey
        ) GROUP BY 1
    ),
    direct AS (
        SELECT o_orderpriority, SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cents,
               COUNT(*) AS n
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY 1
    )
    SELECT m.o_orderpriority,
           CAST(m.n AS BIGINT) AS n_items,
           CAST(m.cents AS BIGINT) AS rev_cents,
           (m.cents = d.cents AND m.n = d.n) AS matches_direct
    FROM maintained m JOIN direct d USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
)
def x10_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: incremental JOIN view maintenance — the delta rule
    J(A∪ΔA, B∪ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, the identity that
    lets a materialized join view absorb a day's inserts by joining
    only the deltas against the base (plus the tiny ΔA⋈ΔB corner)
    instead of re-running the full join. Extends x8 (aggregate IVM) to
    the join operator; together they cover the two relational-view
    classes that dominate warehouse materializations. The query splits
    both inputs deterministically, maintains the view from the four
    parts, and proves in-plan that the result matches a direct full
    join (matches_direct). All money in exact integer cents."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    ao = o.where(F.col("o_orderkey") % 7 != 0)
    da = o.where(F.col("o_orderkey") % 7 == 0)
    bo = li.where(F.col("l_linenumber") < 5).select("l_orderkey", "cents")
    db = li.where(F.col("l_linenumber") >= 5).select("l_orderkey", "cents")

    def j(a, b):
        return a.join(b, b.l_orderkey == a.o_orderkey).select("o_orderpriority", "cents")

    maintained = (
        j(ao, bo).unionAll(j(da, bo)).unionAll(j(ao, db)).unionAll(j(da, db))
        .groupBy("o_orderpriority")
        .agg(F.sum("cents").alias("m_cents"), F.count(F.lit(1)).alias("m_n"))
    )
    direct = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("cents").alias("d_cents"), F.count(F.lit(1)).alias("d_n"))
    )
    return (
        maintained.join(direct, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("m_n").cast("bigint").alias("n_items"),
            F.col("m_cents").cast("bigint").alias("rev_cents"),
            ((F.col("m_cents") == F.col("d_cents")) & (F.col("m_n") == F.col("d_n"))).alias(
                "matches_direct"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "x11_point_in_time_features",
    """
    WITH u AS (
        SELECT user_id, ts, event_id, event_type, value
        FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ),
    enriched AS (
        SELECT user_id, ts, event_id, event_type,
               LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_value,
               LAST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_value,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_purchases
        FROM u
    )
    SELECT event_id, user_id, last_click_value, last_view_value,
           CAST(COALESCE(prior_purchases, 0) AS BIGINT) AS prior_purchases
    FROM enriched WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def x11_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11: point-in-time feature join — for every label event
    (purchase) attach feature values exactly as they stood strictly
    BEFORE the label's timestamp: last click value, last view value,
    and running prior-purchase count. This is the feature-store
    primitive that prevents label leakage in training-data generation,
    and the multi-feature generalization of the X1 as-of join: instead
    of one merge join per feature table, ALL feature streams union into
    one user-partitioned ordered window pass (frame ...PRECEDING AND 1
    PRECEDING = strictly-before semantics), so N features cost one
    shuffle, not N. Raw values, no float aggregation — hash-stable."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True)
        .over(w)
        .alias("last_click_value"),
        F.last(F.when(F.col("event_type") == "view", F.col("value")), ignorenulls=True)
        .over(w)
        .alias("last_view_value"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(w)
        .alias("prior_purchases0"),
    )
    return (
        enriched.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "last_click_value",
            "last_view_value",
            F.coalesce(F.col("prior_purchases0"), F.lit(0)).cast("bigint").alias("prior_purchases"),
        )
        .orderBy("event_id")
    )


_J9_SESSION_CTE = """
    {name} AS (
        SELECT user_id,
               MIN(ts) AS s_start,
               MAX(ts) + INTERVAL 30 MINUTE AS s_end
        FROM (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                                 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events WHERE event_type = '{etype}'
            )
        )
        GROUP BY user_id, session_id
    )"""


@register(
    "j9_interval_overlap_join",
    "    WITH"
    + _J9_SESSION_CTE.format(name="cs", etype="click")
    + ","
    + _J9_SESSION_CTE.format(name="ps", etype="purchase")
    + """
    SELECT c.user_id,
           c.s_start AS click_session_start,
           p.s_start AS purchase_session_start,
           CAST(EPOCH_US(LEAST(c.s_end, p.s_end)) - EPOCH_US(GREATEST(c.s_start, p.s_start)) AS BIGINT)
               AS overlap_micros
    FROM cs c JOIN ps p
      ON c.user_id = p.user_id
     AND c.s_start <= p.s_end AND p.s_start <= c.s_end
    ORDER BY c.user_id, click_session_start, purchase_session_start
    """,
)
def j9_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: interval-overlap join — the last classic non-equi join shape
    (x1 as-of = point-to-latest-point, x2 range = point-in-window; this
    is WINDOW-to-WINDOW): which of each user's click sessions overlap
    which purchase sessions. The naive form is an inequality join
    (nested loop); the scale form bins every interval into the epoch
    HOURS it spans (sequence + explode), equi-joins on (user, hour),
    dedups, and applies the exact overlap predicate as a residual —
    candidate volume scales with per-(user, hour) interval counts,
    never |sessions|². Both interval sets come from one
    session_window pass each (gap 30 min; end = last event + gap,
    matching the oracle's gaps-and-islands construction), and
    overlap_micros is an exact BIGINT microsecond difference
    (second-truncated unix_timestamp diffs are off by one when the
    endpoints carry sub-second fractions)."""
    ev = t(spark, sf_dir, "events")

    def sessions(etype: str, prefix: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == etype)
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.col("w.start").alias(f"{prefix}_start"),
                F.col("w.end").alias(f"{prefix}_end"),
            )
        )

    def binned(df: DataFrame, prefix: str) -> DataFrame:
        hours = F.sequence(
            F.floor(F.unix_timestamp(f"{prefix}_start") / 3600).cast("long"),
            F.floor(F.unix_timestamp(f"{prefix}_end") / 3600).cast("long"),
        )
        return df.select("user_id", f"{prefix}_start", f"{prefix}_end", F.explode(hours).alias("hr"))

    cs = binned(sessions("click", "c"), "c")
    ps = binned(sessions("purchase", "p"), "p")
    pairs = (
        cs.join(ps, ["user_id", "hr"])
        .drop("hr")
        .dropDuplicates(["user_id", "c_start", "p_start"])
        .where((F.col("c_start") <= F.col("p_end")) & (F.col("p_start") <= F.col("c_end")))
    )
    return pairs.select(
        "user_id",
        F.col("c_start").alias("click_session_start"),
        F.col("p_start").alias("purchase_session_start"),
        (
            F.unix_micros(F.least("c_end", "p_end"))
            - F.unix_micros(F.greatest("c_start", "p_start"))
        )
        .cast("bigint")
        .alias("overlap_micros"),
    ).orderBy("user_id", "click_session_start", "purchase_session_start")


@register(
    "j12_nearest_event_join",
    """
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts, MIN(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    b AS (
        SELECT p.event_id, p.user_id, p.ts,
               c.click_id AS b_id, c.ts AS b_ts
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    f AS (
        SELECT p.event_id, c.click_id AS f_id, c.ts AS f_ts
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts < c.ts
    )
    SELECT b.event_id, b.user_id,
           CASE
             WHEN b.b_id IS NULL AND f.f_id IS NULL THEN NULL
             WHEN f.f_id IS NULL THEN b.b_id
             WHEN b.b_id IS NULL THEN f.f_id
             WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                  <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_id
             ELSE f.f_id
           END AS nearest_click_id,
           CASE
             WHEN b.b_id IS NULL AND f.f_id IS NULL THEN NULL
             WHEN f.f_id IS NULL THEN epoch_us(b.b_ts) - epoch_us(b.ts)
             WHEN b.b_id IS NULL THEN epoch_us(f.f_ts) - epoch_us(b.ts)
             WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                  <= epoch_us(f.f_ts) - epoch_us(b.ts)
                  THEN epoch_us(b.b_ts) - epoch_us(b.ts)
             ELSE epoch_us(f.f_ts) - epoch_us(b.ts)
           END AS delta_us
    FROM b JOIN f ON f.event_id = b.event_id
    ORDER BY b.event_id
    """,
)
def j12_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: NEAREST-event temporal join — each purchase annotated with
    the click closest in time in EITHER direction (attribution when
    the click can legitimately land after the purchase event arrives,
    e.g. delayed client batching). Neither an as-of (backward-only)
    nor a range join (all-in-window) answers this; the engine runs the
    union+window as-of idiom TWICE — once forward, once on reversed
    time — and picks the smaller |delta| (ties -> the earlier click;
    equal-ts clicks are pre-collapsed to min event_id so both engines
    break ties identically). Cost: two partitioned windows over n+m
    rows per user — still no pair materialization, immune to hot-key
    blowup. The signed delta_us (negative = click before purchase) is
    exact integer microseconds on both engines."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
    )
    from pyspark.sql import Window

    # one union feeds both directional scans
    u = p.select(
        "user_id", "ts", F.col("event_id").alias("p_id"), F.lit(None).cast("long").alias("c_id")
    ).unionByName(
        c.select("user_id", "ts", F.lit(None).cast("long").alias("p_id"), F.col("click_id").alias("c_id"))
    )
    # backward (<=): clicks sort before purchases at equal ts so a
    # same-instant click is visible
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.when(F.col("c_id").isNotNull(), 0).otherwise(1))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward (>): purchases sort before clicks at equal ts in the
    # reversed scan so a same-instant click is NOT forward-visible
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.when(F.col("p_id").isNotNull(), 0).otherwise(1))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = (
        u.withColumn("b_id", F.last(F.when(F.col("c_id").isNotNull(), F.col("c_id")), ignorenulls=True).over(wb))
        .withColumn("b_ts", F.last(F.when(F.col("c_id").isNotNull(), F.col("ts")), ignorenulls=True).over(wb))
        .withColumn("f_id", F.last(F.when(F.col("c_id").isNotNull(), F.col("c_id")), ignorenulls=True).over(wf))
        .withColumn("f_ts", F.last(F.when(F.col("c_id").isNotNull(), F.col("ts")), ignorenulls=True).over(wf))
        .filter(F.col("p_id").isNotNull())
    )
    dp = F.unix_micros(F.col("ts"))
    db = dp - F.unix_micros(F.col("b_ts"))  # >= 0
    df_ = F.unix_micros(F.col("f_ts")) - dp  # > 0
    back_wins = F.col("f_id").isNull() | (F.col("b_id").isNotNull() & (db <= df_))
    return ann.select(
        F.col("p_id").alias("event_id"),
        "user_id",
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None).cast("long"))
        .when(back_wins, F.col("b_id"))
        .otherwise(F.col("f_id"))
        .alias("nearest_click_id"),
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None).cast("long"))
        .when(back_wins, -db)
        .otherwise(df_)
        .alias("delta_us"),
    ).orderBy("event_id")


@register(
    "j17_asof_nearest_event",
    """
    SELECT p_id AS event_id, user_id, nearest_click_id, delta_us
    FROM (
        SELECT p.event_id AS p_id, p.user_id,
               c.event_id AS nearest_click_id,
               CAST(EPOCH_US(c.ts) - EPOCH_US(p.ts) AS BIGINT) AS delta_us,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY ABS(EPOCH_US(c.ts) - EPOCH_US(p.ts)), c.ts, c.event_id
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR
         AND c.ts <= p.ts + INTERVAL 1 HOUR
    )
    WHERE rn = 1
    ORDER BY event_id
    """,
)
def j17_asof_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join, BOTH directions: each purchase pairs
    with its temporally closest click within +/-1 h for the same user
    (ties: earlier click, then smaller id). Complements the backward-
    only ASOF join (asof_last_click_before_purchase) — this is the
    sensor-alignment/entity-snapping form.

    Plan: the +/-window candidate set comes from the same binned
    equi-join strategy as range_join_binned (left rows explode to the
    three 1 h bins their window overlaps; exact predicate trims edges),
    so there is NO interval cross join at any scale; the per-purchase
    argmin is a purchase-keyed window. Candidate volume is bounded by
    clicks-per-user-per-hour, not corpus size."""
    ev = t(spark, sf_dir, "events")
    win = 3600
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    p_epoch, c_epoch = F.unix_timestamp("p_ts"), F.unix_timestamp("c_ts")
    pb = p.withColumn(
        "_bin",
        F.explode(
            F.sequence(F.floor((p_epoch - win) / win), F.floor((p_epoch + win) / win))
        ),
    )
    cb = c.withColumn("_bin", F.floor(c_epoch / win))
    exact = (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {win} SECOND")) & (
        F.col("c_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {win} SECOND")
    )
    cand = pb.join(cb, ["user_id", "_bin"]).filter(exact).drop("_bin")
    delta = (F.unix_micros("c_ts") - F.unix_micros("p_ts")).cast("bigint")
    pick = Window.partitionBy("p_id").orderBy(F.abs(delta), "c_ts", "c_id")
    return (
        cand.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p_id").alias("event_id"),
            "user_id",
            F.col("c_id").alias("nearest_click_id"),
            delta.alias("delta_us"),
        )
        .orderBy("event_id")
    )


@register(
    "j18_band_join",
    """
    WITH p AS (
        SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
        FROM part
    )
    SELECT a.p_partkey, a.cents AS price_cents,
           CAST(COUNT(*) AS BIGINT) AS n_band_neighbors
    FROM p a JOIN p b
      ON b.p_partkey <> a.p_partkey
     AND b.cents BETWEEN a.cents - 5 AND a.cents + 5
    GROUP BY a.p_partkey, a.cents
    ORDER BY n_band_neighbors DESC, a.p_partkey
    LIMIT 50
    """,
)
def j18_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric band join (|price_a - price_b| <= 5 cents) executed as a
    bucketed EQUI join, never an inequality join: each left row
    explodes to the three 5-cent buckets its band can overlap, the
    right side joins on its own bucket, and the exact band predicate
    trims bucket-edge false positives — the numeric twin of the
    temporal range join (range_join_binned) and the spatial grid join
    (j6). Spark would otherwise execute the pure inequality condition
    as a broadcast-nested-loop; bucketing makes it a hash join whose
    candidate volume is band-density-bounded (|rows| x neighbors-per-
    band), not |rows|^2. Integer cents end to end."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey", F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents")
    )
    band = 5
    a = p.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor((F.col("cents") - band) / band), F.floor((F.col("cents") + band) / band)
            )
        ),
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("cents").alias("b_cents"),
        F.floor(F.col("cents") / band).alias("_b"),
    )
    return (
        a.join(b, "_b")
        .filter(
            (F.col("b_key") != F.col("p_partkey"))
            & (F.col("b_cents") >= F.col("cents") - band)
            & (F.col("b_cents") <= F.col("cents") + band)
        )
        .groupBy("p_partkey", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_band_neighbors"))
        .select(F.col("p_partkey"), F.col("cents").alias("price_cents"), "n_band_neighbors")
        .orderBy(F.col("n_band_neighbors").desc(), "p_partkey")
        .limit(50)
    )
