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
