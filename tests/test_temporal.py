"""As-of join, binned range join, applyInPandas custom op, and the
applyInPandasWithState stateful streaming operator — planted fixtures
with hand-computable answers, plus a streaming-vs-batch equivalence."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from realestate_engine.registry import QUERIES, load_all, t
from realestate_engine.streaming import stateful_user_totals, streamify
from realestate_engine.temporal import asof_join, range_join_binned

load_all()


def ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, "A", ts(10)), (2, "A", ts(30)), (3, "B", ts(5)), (4, "C", ts(20))],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [("A", ts(9), 100.0), ("A", ts(10), 101.0), ("A", ts(29, 59), 102.0), ("B", ts(6), 50.0)],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward_inclusive_and_unmatched(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: (r.px, r.q_ts)
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
            right_cols={"px": "px", "ts": "q_ts"},
        ).collect()
    }
    assert out[1] == (101.0, ts(10))  # at-or-before: equal ts matches
    assert out[2] == (102.0, ts(29, 59))  # most recent, not first
    assert out[3] == (None, None)  # quote is AFTER the trade -> no match
    assert out[4] == (None, None)  # no quotes for C at all
    assert len(out) == 4  # left-outer: every trade survives


def test_asof_forward_direction(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on=["sym"], left_ts="ts", right_ts="ts",
            right_cols={"px": "px"}, direction="forward",
        ).collect()
    }
    assert out[3] == 50.0  # B's quote at 12:06 is the first at-or-after 12:05
    assert out[1] == 101.0  # equal ts matches forward too
    assert out[2] is None  # nothing after A's last trade


def test_range_join_binned_window_edges(spark):
    left = spark.createDataFrame([(1, "A", ts(30))], "lid long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("A", ts(20), 1), ("A", ts(29), 2), ("A", ts(30), 3), ("A", ts(31), 4), ("B", ts(30), 5)],
        "k string, r_ts timestamp, rid long",
    )
    got = sorted(
        r.rid
        for r in range_join_binned(
            left, right, on=["k"], left_ts="ts", right_ts="r_ts", window_seconds=600
        ).collect()
    )
    # (ts-10min, ts]: 12:20 is EXCLUDED (exactly window start), 12:29 and
    # 12:30 in, 12:31 after, B wrong key
    assert got == [2, 3]


def test_registry_range_join_counts_match_brute_force(spark, sf_dir):
    out = QUERIES["range_join_clicks_before_purchase"](spark, sf_dir)
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    brute = (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("ts")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("c_ts").alias("n"))
    )
    diff = (
        out.join(brute, "event_id")
        .filter(F.col("n_clicks_1h") != F.col("n"))
        .count()
    )
    assert diff == 0
    assert out.count() == p.count()


def test_stateful_user_totals_streaming_matches_batch(spark, sf_dir, tmp_path):
    events = t(spark, sf_dir, "events")
    src = str(tmp_path / "stateful_src")
    events.write.parquet(src)
    stream = streamify(spark, src, events.schema)
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            # keep only each user's LAST update (multiple micro-batches
            # emit intermediate running totals)
            "SELECT user_id, n_events, total_value FROM ("
            "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn"
            "  FROM stateful_totals) WHERE rn = 1"
        ).collect()
    }
    want = {
        r.user_id: (r.n, r.tot)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tot"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert got[u][1] == pytest.approx(want[u][1], abs=0.05)


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    ev = t(spark, sf_dir, "events").withColumn("cents", F.floor(F.col("value") * 100).cast("bigint"))
    from realestate_engine.temporal import salted_groupby_sum

    salted = salted_groupby_sum(ev, key="user_id", value="cents", salt_col="event_id")
    plain = ev.groupBy("user_id").agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    diff = (
        salted.join(plain, "user_id")
        .filter((F.col("sum_cents") != F.col("s")) | (F.col("n_rows") != F.col("n")))
        .count()
    )
    assert diff == 0
    assert salted.count() == plain.count()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Bucketing pays the shuffle at write time: a join between two
    tables bucketed on the same key by the same bucket count compiles
    with NO Exchange on either side."""
    from realestate_engine.io import write_bucketed

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            ["o_orderkey"],
            n_buckets=8,
            sort_cols=["o_orderkey"],
        )
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(joined._jdf.queryExecution(), "formatted")
        assert "Exchange" not in plan
        assert joined.count() == t(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    from realestate_engine.streaming import stream_stream_click_purchase_join, streamify

    events = t(spark, sf_dir, "events")
    src = str(tmp_path / "ss_src")
    events.write.parquet(src)
    stream = streamify(spark, src, events.schema)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    q = (
        stream_stream_click_purchase_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM ss_join").first().n

    bc = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    bp = events.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    batch_n = bp.join(
        bc,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("ts")),
    ).count()
    assert got == batch_n


def test_stream_stream_left_outer_matches_batch(spark, sf_dir, tmp_path):
    from realestate_engine.streaming import stream_stream_left_outer_purchases, streamify

    events = t(spark, sf_dir, "events")
    src = str(tmp_path / "sslo_src")
    out = str(tmp_path / "sslo_out")
    ckpt = str(tmp_path / "sslo_ckpt")
    events.write.parquet(src)

    def run_once():
        stream = streamify(spark, src, events.schema)
        clicks = stream.filter(F.col("event_type") == "click")
        purchases = stream.filter(F.col("event_type") == "purchase")
        q = (
            stream_stream_left_outer_purchases(clicks, purchases)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Outer rows only emit once the watermark passes their horizon, and
    # the watermark only advances from data in COMPLETED batches — so
    # drain the real data, then push the watermark past every real
    # timestamp with two far-future sentinel batches (the second is
    # needed because a batch evicts with the PREVIOUS batch's
    # watermark). After that, streaming vs batch parity is exact.
    run_once()
    max_ts = events.agg(F.max("ts").alias("m")).first().m
    for i, days in enumerate([30, 60]):
        # one sentinel per SIDE: each withWatermark sits after its
        # event_type filter, so both branches need future data to
        # advance the (min-combined) global watermark
        sent = spark.sql(
            f"""SELECT CAST(-{2 * i + 1} AS BIGINT) AS event_id,
                   TIMESTAMP '{max_ts}' + INTERVAL {days} DAYS AS ts,
                   CAST(-1 AS BIGINT) AS user_id,
                   'click' AS event_type, CAST(0.0 AS DOUBLE) AS value,
                   '{{}}' AS props
                UNION ALL
                SELECT CAST(-{2 * i + 2} AS BIGINT),
                   TIMESTAMP '{max_ts}' + INTERVAL {days} DAYS,
                   CAST(-1 AS BIGINT), 'purchase', CAST(0.0 AS DOUBLE), '{{}}'"""
        )
        sent.select([F.col(f.name).cast(f.dataType) for f in events.schema.fields]).write.mode(
            "append"
        ).parquet(src)
        run_once()

    got = (
        spark.read.parquet(out)
        .where(F.col("p_user") != -1)
        .agg(
            F.count(F.when(F.col("c_id").isNotNull(), 1)).alias("n_matched"),
            F.count(F.when(F.col("c_id").isNull(), 1)).alias("n_unmatched"),
        )
        .first()
    )

    bc = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    bp = events.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    batch = (
        bp.join(
            bc,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") > F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("ts")),
            "left_outer",
        )
        .agg(
            F.count(F.when(F.col("c_id").isNotNull(), 1)).alias("n_matched"),
            F.count(F.when(F.col("c_id").isNull(), 1)).alias("n_unmatched"),
        )
        .first()
    )
    assert got.n_matched == batch.n_matched
    assert got.n_unmatched == batch.n_unmatched


def test_stateful_sessions_event_timeout_match_batch(spark, sf_dir, tmp_path):
    from realestate_engine.streaming import stateful_sessions_event_timeout, streamify

    events = t(spark, sf_dir, "events")
    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    events.write.parquet(src)

    def run_once():
        stream = streamify(spark, src, events.schema)
        q = (
            stateful_sessions_event_timeout(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    max_ts = events.agg(F.max("ts").alias("m")).first().m
    for i, days in enumerate([30, 60]):
        sent = spark.sql(
            f"""SELECT CAST(-{i + 1} AS BIGINT) AS event_id,
                   TIMESTAMP '{max_ts}' + INTERVAL {days} DAYS AS ts,
                   CAST(-1 AS BIGINT) AS user_id,
                   'click' AS event_type, CAST(0.0 AS DOUBLE) AS value,
                   '{{}}' AS props"""
        )
        sent.select([F.col(f.name).cast(f.dataType) for f in events.schema.fields]).write.mode(
            "append"
        ).parquet(src)
        run_once()

    got = sorted(
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in spark.read.parquet(out).where(F.col("user_id") != -1).collect()
    )
    want = sorted(
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in QUERIES["ts_sessionize_gap"](spark, sf_dir)
        .select("user_id", "n_events", "session_start", "session_end")
        .collect()
    )
    assert got == want
