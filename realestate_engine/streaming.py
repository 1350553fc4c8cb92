"""Event-time windowing operators (SURVEY.md §2.10 commitment).

The reference has no streaming surface; ours adds tumbling / sliding /
session windows + watermark semantics on the events table. The same
``F.window`` / ``F.session_window`` expressions run identically over
batch DataFrames (how the driver's oracle checks them) and over
``readStream`` sources (how they deploy — see ``streamify`` and the
pytest streaming test).

Scale: windowed aggregation shuffles on (window, key); the watermark
bounds state so a 100 TB/day stream holds only the open windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_engine.registry import register, stable_tmp, t


def tumbling_counts(events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time windows + watermark. Works on batch and
    streaming inputs alike (withWatermark is a no-op in batch)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "st_tumbling_window",
    """
    SELECT MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) * 1000000) AS window_start,
           MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 600) * 600 + 600 AS BIGINT) * 1000000) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1a: 10-minute tumbling windows (epoch-aligned, same alignment
    DuckDB's floor-of-epoch reproduces)."""
    return tumbling_counts(t(spark, sf_dir, "events"))


@register(
    "st_sliding_window",
    """
    SELECT MAKE_TIMESTAMP(CAST(FLOOR((EPOCH(ts) - k.k * 300) / 600) * 600 + k.k * 300 AS BIGINT) * 1000000) AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
    GROUP BY 1, 2
    """,
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1b: 10-minute windows sliding every 5 — each event lands in 2
    windows (the oracle reproduces the assignment by shifting two
    tumbling grids)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@register(
    "st_session_window",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1c: session windows with a 30-minute gap. Spark's
    session_window end = last event + gap; the oracle reproduces it with
    a gaps-and-islands construction."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "st_watermark_dedup",
    """
    SELECT user_id, event_type, MIN(event_id) AS first_event_id, COUNT(*) AS n_dups
    FROM events GROUP BY user_id, event_type
    """,
)
def st_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1d: streaming dedup shape — dropDuplicates within the watermark
    keeps one row per key; here the batch equivalent returns the first
    event per (user, type) plus how many duplicates were folded."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n_dups")
    )


def streamify(spark: SparkSession, parquet_dir: str, schema) -> DataFrame:
    """Open a directory of parquet files as a file-source stream — the
    deployment form of every operator above (used by the pytest
    streaming round-trip test)."""
    return spark.readStream.schema(schema).parquet(parquet_dir)


def _stream_state_partitions(
    spark: SparkSession, *src_dirs: str, python_state: bool = False
) -> int:
    """State-store partition count for a bounded availableNow drain,
    derived from the source snapshot's actual bytes instead of a
    constant (r14; guide §2 — make partitioning scale-adaptive, not a
    constant tuned for local mode or the cluster): one state partition
    per ~32 MB of source, clamped to [1, defaultParallelism], with
    $SPARK_GRAFT_STREAM_PARTS as the production override for clusters
    whose state must spread wider than the drain's compute width.

    Why it matters: the partition count is baked into the checkpoint
    at stream start, and every HDFS-backed state store pays
    per-partition open/snapshot/commit I/O per micro-batch (a
    stream-stream join keeps FOUR stores per partition). Measured at
    sf0.1 (~1 MB source, 2 availableNow batches): the identical
    stream-stream join ran 10.0s warm at 32 partitions vs 2.1s at 4 —
    pure state-store fixed cost. At production volumes bytes/32MB far
    exceeds any core count, so the clamp reproduces the previous
    defaultParallelism behavior exactly; only the tiny-snapshot regime
    changes.

    ``python_state=True`` marks applyInPandasWithState /
    transformWithStateInPandas drains, whose per-batch cost is
    dominated by per-GROUP Python round-trips that parallelize per
    PARTITION — a bytes-only derivation collapses a tiny snapshot to 1
    partition and serializes thousands of group calls through one
    Python worker (measured st_cusum_monitor: 24s at 1 partition vs
    7.9s at 8 vs 9.3s at 32 — the old constant — at sf0.1). Those
    drains keep a cores/4 parallelism floor: enough Python workers to
    spread the group loop, a quarter of the per-partition state-store
    commits of the old constant."""
    import math
    import os as _os

    env = _os.environ.get("SPARK_GRAFT_STREAM_PARTS")
    if env and env.isdigit() and int(env) > 0:
        return int(env)
    size = 0
    for d in src_dirs:
        for root, _dirs, files in _os.walk(d):
            size += sum(
                _os.path.getsize(_os.path.join(root, f))
                for f in files
                if not f.startswith("_")
            )
    need = max(1, math.ceil(size / (32 << 20)))
    width = spark.sparkContext.defaultParallelism
    if python_state:
        need = max(need, math.ceil(width / 4))
    return min(need, width)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (n_events, total_value) maintained across
    micro-batches. This is the arbitrary-state escape hatch for
    semantics windowed aggregation can't express (per-key accumulators,
    custom eviction, ML feature state).

    State is one small tuple per user — bounded by |keys|, not events
    seen, so a 100 TB/day stream holds |users| rows of state. Emits the
    updated running totals for every user touched by the micro-batch
    (use outputMode("update"))."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "st_stateful_running_totals",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def st_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 as a driver-checked query: run an ACTUAL streaming query —
    parquet file source → applyInPandasWithState per-user running
    (n_events, total_cents) → memory sink, Trigger.AvailableNow — then
    read the sink and keep each user's LAST update (n_events is
    strictly monotone per user across micro-batches, so max_by picks
    the final state). The cents conversion happens Spark-side BEFORE
    the Python state (F.round half-up, matching the oracle's ROUND),
    so the stateful accumulator is exact integer math and the final
    totals are independent of how availableNow slices micro-batches.
    State is one (long, long) tuple per user — bounded by |users|.
    The checkpoint is recreated per invocation (committed offsets
    would otherwise mark the input as already processed and yield an
    empty second run); the input snapshot overwrites one stable dir."""
    import shutil

    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("value_cents")
    )
    src = stable_tmp("st3_events")
    ev.write.mode("overwrite").parquet(src)
    ckpt = stable_tmp("st3_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value_cents"].sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    stream = streamify(spark, src, ev.schema)
    updates = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_cents long",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # the state-store partition count is baked into the checkpoint at
    # stream START from spark.sql.shuffle.partitions — size it from the
    # source snapshot (see _stream_state_partitions) so a plain driver
    # session neither spreads tiny state over 200 partitions nor pays
    # 32 state-store commits per micro-batch for a ~MB drain;
    # restored after the stream finishes (it runs to completion here)
    key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(key)
    try:
        spark.conf.set(key, str(_stream_state_partitions(spark, src, python_state=True)))
        q = (
            updates.writeStream.format("memory")
            .queryName("re_st3_totals")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old_parts)
    sink = spark.table("re_st3_totals")
    return (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_cents", "n_events").alias("total_cents"),
        )
        .orderBy("user_id")
    )


def stream_stream_click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's clicks within the preceding ``window``. Both sides carry
    watermarks and the join condition time-bounds the buffered state, so
    Spark can evict rows older than watermark+window — without the time
    bound a stream-stream join buffers forever."""
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    ).withWatermark("c_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    ).withWatermark("p_ts", watermark)
    return p.join(
        c,
        F.expr(
            f"c_user = p_user AND c_ts > p_ts - INTERVAL {window} AND c_ts <= p_ts"
        ),
        "inner",
    )


def enrich_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """ST5 core: stream-static enrichment join — each micro-batch hash-
    joins against the broadcast static dimension; no state, no
    watermark needed (the static side is re-broadcast per batch only if
    it changes). Works identically on batch and streaming inputs."""
    dim = F.broadcast(customers.select("c_custkey", "c_mktsegment"))
    return events.join(dim, events.user_id == dim.c_custkey, "left")


@register(
    "st_stream_static_enrich",
    """
    SELECT c_mktsegment, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events LEFT JOIN customer ON c_custkey = user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def st_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5: stream-static enrichment + rollup, batch form (the oracle
    path; tests/test_plans_and_streaming.py runs the same enrich_events
    over an actual readStream). Value sums in exact integer cents."""
    ev = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    return (
        enrich_events(ev, c)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias("total_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


def stream_stream_left_outer_purchases(
    clicks: DataFrame, purchases: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """ST6: stream-stream LEFT OUTER join — every purchase emits, with
    click columns null when no click preceded it in ``window``. Outer
    results cannot stream eagerly: a purchase may still find its match
    later, so Spark holds it in state and emits the null-padded row
    only once the watermark passes the join window's upper bound and no
    match can arrive. This is the semantics that distinguishes
    streaming outer joins from batch ones — correctness depends on the
    watermark, and an unmatched row's latency is watermark + window.
    State stays bounded exactly as in the inner variant (time-bound
    condition on both sides). Streaming-vs-batch parity is tested in
    tests/test_temporal.py::test_stream_stream_left_outer_matches_batch."""
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    ).withWatermark("c_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    ).withWatermark("p_ts", watermark)
    return p.join(
        c,
        F.expr(f"c_user = p_user AND c_ts > p_ts - INTERVAL {window} AND c_ts <= p_ts"),
        "left_outer",
    )


def stateful_sessions_event_timeout(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """ST8: gap-based sessionization as a CUSTOM stateful operator with
    EVENT-TIME TIMEOUT — the streaming twin of the batch
    ts_sessionize_gap window query, but sessions CLOSE and emit only
    when the watermark passes last-event + gap, i.e. when no late event
    can reopen them. This is the state-GC pattern session_window gives
    you for free, reproduced in the arbitrary-state API where you also
    control what the state holds (here: open-session aggregates; in an
    ML pipeline: per-key feature accumulators).

    Per key the state is ONE open session tuple (bounded by |users|);
    each closed session emits exactly once, in (user, session start)
    order per user because event-time timeouts fire in watermark order.
    Emits (user_id, n_events, session_start, session_end)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:  # timeout firing: close and emit the open session
            if state.exists:
                start_us, end_us, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(end_us, unit="us")],
                    }
                )
            return
        batch = pd.concat(rows).sort_values(["ts", "event_id"])
        out = []
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = None, None, 0
        for ts in batch["ts"]:
            t_us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                start_us, end_us, n = t_us, t_us, 1
            elif t_us - end_us > gap_us:
                out.append((key[0], n, start_us, end_us))
                start_us, end_us, n = t_us, t_us, 1
            else:
                end_us, n = t_us, n + 1
        state.update((start_us, end_us, n))
        # close the open session once the watermark clears its gap
        state.setTimeoutTimestamp(end_us // 1000 + gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "n_events": [o[1] for o in out],
                    "session_start": [pd.Timestamp(o[2], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[3], unit="us") for o in out],
                }
            )

    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, session_start timestamp, session_end timestamp",
            stateStructType="start_us long, end_us long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


@register(
    "st_stream_stream_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts > p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    ORDER BY purchase_id, click_id
    """,
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 as a driver-checked query: an ACTUAL stream-stream inner
    join run — clicks and purchases as two parquet file streams, the
    time-bounded join condition (click within the hour before the
    purchase) bounding both buffers, availableNow trigger, memory sink
    — compared against the batch inner join the oracle states. Inner
    stream-stream joins emit matches as both sides arrive (the
    watermark exists to GC state, not to gate emission), so the
    availableNow run must produce EXACTLY the batch result — this
    equality, checked by value hash, is the streaming-vs-batch parity
    contract for joins. State per key is bounded by watermark + window
    (2h + 1h of events), the property that lets a 100 TB/day
    stream-stream join run indefinitely."""
    import os
    import shutil

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    # r14 (guide §1.2): ONE partitioned write instead of two separately
    # filtered full scans — partitionBy splits the snapshot into
    # event_type=click/ and event_type=purchase/ subdirs in a single
    # pass (measured 3.1s -> 0.9s for the source build at sf0.1); each
    # stream reads its subdir directly (the partition column is not in
    # the files, matching the explicit schema). makedirs guards the
    # no-rows-of-a-type case, where partitionBy writes no subdir.
    both_src = stable_tmp("st6_src")
    (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(both_src)
    )
    clicks_src = os.path.join(both_src, "event_type=click")
    purchases_src = os.path.join(both_src, "event_type=purchase")
    os.makedirs(clicks_src, exist_ok=True)
    os.makedirs(purchases_src, exist_ok=True)
    ckpt = stable_tmp("st6_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    schema = ev.drop("event_type").schema
    joined = stream_stream_click_purchase_join(
        streamify(spark, clicks_src, schema), streamify(spark, purchases_src, schema)
    )
    key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(key)
    try:
        spark.conf.set(
            key, str(_stream_state_partitions(spark, clicks_src, purchases_src))
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("re_st6_pairs")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old_parts)
    return (
        spark.table("re_st6_pairs")
        .select(
            F.col("p_id").alias("purchase_id"),
            F.col("c_id").alias("click_id"),
            F.col("p_user").alias("user_id"),
        )
        .orderBy("purchase_id", "click_id")
    )


@register(
    "st_foreachbatch_upsert_sink",
    """
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           CAST(ROUND(value * 100) AS BIGINT) AS last_value_cents
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
    """,
)
def st_foreachbatch_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 as a driver-checked query: the foreachBatch UPSERT sink —
    the pattern every production stream that maintains a keyed TABLE
    (not an append log) uses: per micro-batch, merge the batch into
    the materialized state keeping the newest row per key, write
    atomically, repeat. Here the merge is read-state ∪ batch →
    keep-latest window → overwrite (the parquet form of MERGE INTO;
    on a lakehouse table the same callback issues a real MERGE).
    After availableNow drains the source, the state table must equal
    the batch keep-latest query the oracle states — upsert⁻-fold
    equals final-wins, regardless of how the source was sliced into
    batches, BECAUSE the merge is associative on (ts, event_id) order.
    Batch ids are checkpoint-tracked, so a restart re-applies an
    in-flight batch idempotently (same keys, same newest rows)."""
    import shutil

    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    src = stable_tmp("st4_events")
    ev.write.mode("overwrite").parquet(src)
    state_dir = stable_tmp("st4_state")
    shutil.rmtree(state_dir, ignore_errors=True)
    ckpt = stable_tmp("st4_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from pyspark.errors import AnalysisException

        s = batch_df.sparkSession
        try:
            current = s.read.parquet(state_dir)
            current.schema  # force resolution so a missing dir raises HERE
        except AnalysisException:  # first batch: no state yet; any
            # other failure (transient IO, corrupt file) must propagate
            # rather than silently resetting state to the current batch
            current = None
        merged = batch_df if current is None else current.unionByName(batch_df)
        latest = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # write the merged state to a sibling dir, then swap: the merge
        # plan never writes over the directory it is reading (cache()
        # would not guarantee that — an evicted block recomputes against
        # the dir mid-delete). The swap itself is two fast metadata ops
        # with no reader in flight; on a lakehouse table this whole
        # callback is a single atomic MERGE INTO instead.
        next_dir = state_dir + "_next"
        latest.write.mode("overwrite").parquet(next_dir)
        shutil.rmtree(state_dir, ignore_errors=True)
        os.rename(next_dir, state_dir)

    q = (
        streamify(spark, src, ev.schema)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(state_dir)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value_cents").alias("last_value_cents"),
        )
        .orderBy("user_id")
    )


def _transform_with_state_available() -> bool:
    """transformWithStateInPandas speaks protobuf to its JVM-side state
    server; this container ships a broken google.protobuf (no
    descriptor module), so the query registers only where the runtime
    can actually execute it — the import-try gate the environment
    mandates for missing deps. The operator code below is real and the
    pytest exercises it wherever protobuf exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_TWS_ORACLE = """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """


def st_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3's semantics on Spark 4's NATIVE arbitrary-state API:
    ``transformWithStateInPandas`` with a ``StatefulProcessor`` +
    ``ValueState`` (the successor to applyInPandasWithState — typed
    state handles, timers, TTL, initial-state injection; this is the
    API new stateful operators should target). Same contract as
    st_stateful_running_totals: per-user running (n_events,
    total_cents) in exact integer math, memory sink, availableNow run
    to completion, last update per user via the monotone n_events —
    and the SAME oracle, so the two state APIs are pinned to agree
    with each other and with the relational aggregate. State: one
    (long, long) ValueState per user, bounded by |users| at 100 TB."""
    import shutil

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("value_cents")
    )
    src = stable_tmp("st9_events")
    ev.write.mode("overwrite").parquet(src)
    ckpt = stable_tmp("st9_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.totals = handle.getValueState("totals", "n LONG, cents LONG")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self.totals.get() if self.totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["value_cents"].sum())
            self.totals.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    stream = streamify(spark, src, ev.schema)
    updates = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n_events long, total_cents long",
        outputMode="Update",
        timeMode="None",
    )
    key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(key)
    try:
        spark.conf.set(key, str(_stream_state_partitions(spark, src, python_state=True)))
        q = (
            updates.writeStream.format("memory")
            .queryName("re_st9_totals")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old_parts)
    sink = spark.table("re_st9_totals")
    return (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_cents", "n_events").alias("total_cents"),
        )
        .orderBy("user_id")
    )


if _transform_with_state_available():  # pragma: no cover - environment-dependent
    register("st_transform_with_state", _TWS_ORACLE)(st_transform_with_state)


_CUSUM_TARGET_CENTS = 5000  # fixed monitoring target (classic CUSUM tracks a known reference)


@register(
    "st_cusum_monitor",
    f"""
    WITH base AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT) - {_CUSUM_TARGET_CENTS} AS dev
        FROM events
    ),
    pre AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(dev) OVER w AS BIGINT) AS p
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    stat AS (
        SELECT user_id, ts, event_id,
               CAST(p - LEAST(MIN(p) OVER w, 0) AS BIGINT) AS s
        FROM pre
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    fin AS (
        SELECT user_id, s,
               LAST_VALUE(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS s_final
        FROM stat
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(s) AS BIGINT) AS cusum_max_cents,
           CAST(MAX(s_final) AS BIGINT) AS cusum_final_cents
    FROM fin
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def st_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM drift monitor: per-user S_i = max(0, S_(i-1) +
    (cents_i - target)) maintained as applyInPandasWithState state
    across REAL micro-batches, with the running max emitted as the
    alarm statistic. Determinism across batch slicing is engineered,
    not assumed: the source snapshot is repartitionByRange(ts) +
    sortWithinPartitions(ts) (ascending part files = ascending time
    ranges) and the stream reads maxFilesPerTrigger=1, so every user's
    rows arrive in global ts order and the order-SENSITIVE recursion
    is reproducible — the file-source analogue of per-key Kafka
    ordering. The oracle replays the recursion in closed form
    (prefix sums minus running min including the empty prefix, the
    ts12_cusum_changepoint identity) over the same integer cents.

    State per user: (cusum, cusum_max, n) — three BIGINTs, bounded by
    |users| forever. At 100 TB/day this is the canonical metric-drift
    alarm: partitioned state, integer-exact, emit-on-update.

    r15 (VERDICT r14 #3): TWO ts-range slices instead of four. Every
    micro-batch pays the full state machinery (per-partition store
    open/snapshot/commit, one Python round-trip per user) for the same
    ~15-user state, so batch count is a pure fixed-cost multiplier at
    snapshot scale — measured 6.6s at 4 slices vs 3.4s at 2, final
    rows byte-identical (the recursion's correctness never depended on
    the slice COUNT, only on slice ORDER, which the stamped-mtime
    scheme preserves for any count; the multi-batch carry contract is
    demonstrated by ≥2 ordered batches and stays pinned by the
    streaming≡batch parity test). A RocksDB state store was measured
    too (5.4s at 4 slices) — kept OFF: the slice cut dominates and the
    default store avoids a per-query native-lib spin-up. At real
    volume the slice count is a deployment choice (Kafka offsets /
    file granularity), not query semantics."""
    import shutil

    import glob
    import os

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100).cast("long") - _CUSUM_TARGET_CENTS).alias("dev"),
    )
    src = stable_tmp("st_cusum_src")
    # Ordered ts-range slices, each a single sorted file with an
    # explicitly stamped, strictly increasing mtime: FileStreamSource
    # orders files by modification time, and a single bulk write gives
    # every part file the same mtime (measured: the resulting
    # arbitrary order breaks the order-sensitive recursion).
    # Bounds as exact integers computed IN Spark: datetime.timestamp()
    # on the collected naive datetimes would interpret them in the OS
    # timezone (shifting every cut on non-UTC hosts) and round through
    # float microseconds (clipping the max-ts event) — unix_micros has
    # neither failure mode.
    #
    # r14 (guide §1.2): the four slices used to be four SEQUENTIAL
    # filtered scans + coalesce(1) writes (four full passes, four
    # single-threaded sort+write jobs); now ONE job computes the slice
    # id ((ts_us - lo) DIV step, the identical range cuts), partitions
    # by it, and sorts within partitions by (slice, ts, event_id) — so
    # each slice still lands as one file whose rows are (ts, event_id)
    # sorted, byte-identical stream input. The driver then renames the
    # slice files into src with the same stamped mtimes as before.
    n_slices = 2  # see docstring: fixed-cost-per-batch measurement, r15
    lo_us, hi_us = ev.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).first()
    hi_us += 1
    step = (hi_us - lo_us + n_slices - 1) // n_slices
    build = src + "_build"
    shutil.rmtree(build, ignore_errors=True)
    (
        ev.withColumn(
            "sl",
            F.least(
                F.lit(n_slices - 1),
                F.expr(f"CAST((unix_micros(ts) - {lo_us}L) DIV {step}L AS INT)"),
            ),
        )
        .repartition(n_slices, "sl")
        .sortWithinPartitions("sl", "ts", "event_id")
        .write.mode("overwrite")
        .partitionBy("sl")
        .parquet(build)
    )
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    for i in range(n_slices):
        for j, f in enumerate(sorted(glob.glob(os.path.join(build, f"sl={i}", "part-*")))):
            dst = os.path.join(src, f"slice-{i}-{j}.parquet")
            os.rename(f, dst)
            # Stride 1000 per slice (ADVICE r14): the old i*4+j stamp
            # assumed <=4 part files per slice; a writer rollover
            # (maxRecordsPerFile etc.) would interleave mtimes ACROSS
            # slices and FileStreamSource would silently replay slices
            # out of order, corrupting the order-sensitive recursion.
            # repartition(4, "sl") makes >1 file per slice impossible
            # today; the assert keeps a violated assumption loud.
            assert j < 1000, f"slice {i} produced {j + 1}+ part files"
            mt = 1_000_000_000 + i * 1000 + j
            os.utime(dst, (mt, mt))
    shutil.rmtree(build, ignore_errors=True)
    ckpt = stable_tmp("st_cusum_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        cusum, cmax, n = state.get if state.exists else (0, 0, 0)
        rows = [pdf for pdf in pdfs if len(pdf)]
        if rows:
            batch = pd.concat(rows).sort_values(["ts", "event_id"])
            for dev in batch["dev"]:
                cusum = max(0, cusum + int(dev))
                cmax = max(cmax, cusum)
            n += len(batch)
        state.update((cusum, cmax, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "cusum_max_cents": [cmax],
                "cusum_final_cents": [cusum],
            }
        )

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    updates = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, n_events long, cusum_max_cents long, cusum_final_cents long"
        ),
        stateStructType="cusum long, cmax long, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(key)
    try:
        spark.conf.set(key, str(_stream_state_partitions(spark, src, python_state=True)))
        q = (
            updates.writeStream.format("memory")
            .queryName("re_st_cusum")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old_parts)
    sink = spark.table("re_st_cusum")
    return (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("cusum_max_cents", "n_events").alias("cusum_max_cents"),
            F.max_by("cusum_final_cents", "n_events").alias("cusum_final_cents"),
        )
        .orderBy("user_id")
    )
