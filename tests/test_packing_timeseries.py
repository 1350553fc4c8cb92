"""Invariant tests for greedy sequence packing and the time-series
gap-fill/LOCF operator (their driver checks are rows-only / oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestate_engine.packing import pack_greedy
from realestate_engine.registry import QUERIES, load_all

load_all()

BUDGET = 256


def test_pack_greedy_invariants(spark, sf_dir):
    out = QUERIES["pack_documents_greedy"](spark, sf_dir).cache()
    docs = QUERIES["text_token_count"](spark, sf_dir)

    # every document packed exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == out.count()

    # no pack exceeds the budget unless it is a single oversized doc
    packs = out.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_docs")
    )
    bad = packs.filter((F.col("total") > BUDGET) & (F.col("n_docs") > 1)).count()
    assert bad == 0

    # greedy first-fit never leaves room a subsequent same-pack doc
    # could have used: within a shard, consecutive docs share a pack
    # unless the earlier pack would overflow — spot-check via pack_seq
    # monotonicity: seq 0..n-1 within each pack in doc_id order
    seq_ok = (
        out.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("pack_seq").alias("mx"),
            F.min("pack_seq").alias("mn"),
        )
        .filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
        .count()
    )
    assert seq_ok == 0

    # deterministic: a second run gives the identical assignment
    again = QUERIES["pack_documents_greedy"](spark, sf_dir)
    assert out.select("doc_id", "pack_id").exceptAll(
        again.select("doc_id", "pack_id")
    ).count() == 0
    out.unpersist()


def test_pack_greedy_oversized_doc_is_singleton(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 5000), (3, 100)], "doc_id long, n_tokens long"
    )
    out = pack_greedy(docs, budget=BUDGET, n_shards=2).collect()
    by_doc = {r.doc_id: r for r in out}
    # the oversized doc sits alone in its pack
    oversized_pack = by_doc[2].pack_id
    assert sum(1 for r in out if r.pack_id == oversized_pack) == 1


def test_ts_gapfill_locf_invariants(spark, sf_dir):
    out = QUERIES["ts_gapfill_locf"](spark, sf_dir).cache()

    # the grid is dense: per user, row count == day span
    spans = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span_days"),
    )
    assert spans.filter(F.col("n_rows") != F.col("span_days")).count() == 0

    # LOCF never leaves a null after the first observed day, and
    # zero-filled days carry the previous average forward
    assert out.filter(F.col("avg_value_locf").isNull()).count() == 0
    assert out.filter(F.col("n_events") == 0).count() > 0  # gaps existed
    out.unpersist()
