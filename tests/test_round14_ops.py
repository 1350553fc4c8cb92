"""Round-14 optimization pins: each test locks the OUTPUT of an
operator whose internals changed this round (guide §1 — every
substantive plan change ships with a regression pin).

Changed internals covered here:
- text_phrase_search: interpreted filter-over-sequence lambda ->
  codegen'd regexp_count (plus the 1-token-document crash the old
  form had);
- ts_ewma_int / ts_holt_int / ts8_holt_winters_int: grouped
  applyInPandas (one Python call per user) -> partition-streaming
  _user_recurrence_map with carry across Arrow batch boundaries;
- text_tfidf_top_term: df derived from the tf aggregate instead of a
  second corpus tokenization;
- tpch_q18_large_orders: lineitem pre-aggregation before the joins;
- dedup_pipeline_summary: one shared clustering pass instead of two.
The full value check against DuckDB stays with check_oracle; these
pins guard the specific equivalences the rewrites rely on.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from realestate_engine.registry import QUERIES, load_all

load_all()


# --- text_phrase_search: regexp_count == token-pair semantics ---------------

PHRASE_CASES = [
    "table hash", " table hash ", "table  hash", "table\thash",
    "table hash table hash", "table table hash", "hash table hash",
    "table hashx", "xtable hash", "tables hash", "table hash hash table",
    "table", "hash", "", "   ", "table hash\ntable hash",
    "a table hash b table hash c", "TABLE HASH", "table, hash",
    "table table table hash hash", "table\r\nhash", " table  hash  table   hash",
]


def _ref_pairs(s: str) -> int:
    # the old HOF's semantics: ASCII-\s+ split of lower(trim), count
    # adjacent (table, hash) token pairs; empty prefix token like
    # Spark's split (trim removes outer whitespace first)
    w = re.split(r"[ \t\n\x0b\f\r]+", s.strip().lower())
    return sum(1 for i in range(len(w) - 1) if w[i] == "table" and w[i + 1] == "hash")


def test_phrase_regex_matches_token_pair_semantics(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(PHRASE_CASES)], "doc_id long, text string"
    )
    rx = F.regexp_count(
        F.lower(F.trim(F.col("text"))), F.lit(r"(?:^|\s)table\s+hash(?=\s|$)")
    )
    got = {r.doc_id: r.n for r in df.select("doc_id", rx.alias("n")).collect()}
    for i, s in enumerate(PHRASE_CASES):
        assert got[i] == _ref_pairs(s), (s, got[i], _ref_pairs(s))


def test_phrase_search_survives_one_token_docs(spark, sf_dir):
    # the pre-r14 filter-over-sequence form raised INVALID_ARRAY_INDEX
    # on a 1-token document (sequence(0, -1) descends); the regex form
    # must simply return no hits. Exercise the registered query on a
    # frame containing such a doc via the real code path shape.
    rx = F.regexp_count(
        F.lower(F.trim(F.col("text"))), F.lit(r"(?:^|\s)table\s+hash(?=\s|$)")
    )
    df = spark.createDataFrame([(1, "table"), (2, "table hash")], "doc_id long, text string")
    out = df.select("doc_id", rx.cast("bigint").alias("n_hits")).where(
        F.col("n_hits") > 0
    ).collect()
    assert [(r.doc_id, r.n_hits) for r in out] == [(2, 1)]


# --- ts recurrences: mapInPandas carry == per-group reference ---------------


def _events_pdf(spark, sf_dir):
    from realestate_engine.registry import t

    return (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )


def _ref_recurrences(pdf):
    ewma, holt, hw = {}, {}, {}
    for uid, g in pdf.groupby("user_id", sort=True):
        st = None
        lvl = trend = None
        hlvl = htrend = None
        season = [0, 0, 0, 0]
        rn = 0
        for x in g["value"]:
            v = int(math.floor(x * 1000))
            rn += 1
            st = v if st is None else (st + v) // 2
            if lvl is None:
                lvl, trend = v, 0
            else:
                nl = (lvl + trend + v) // 2
                trend = (trend + nl - lvl) // 2
                lvl = nl
            if hlvl is None:
                hlvl, htrend = v, 0
            else:
                i = (rn - 1) % 4
                nl = (v - season[i] + hlvl + htrend) // 2
                htrend = (htrend + nl - hlvl) // 2
                season[i] = (v - nl + season[i]) // 2
                hlvl = nl
        ewma[uid] = (rn, st)
        holt[uid] = (rn, lvl, trend, lvl + trend)
        hw[uid] = (rn, hlvl, htrend, hlvl + htrend + season[rn % 4])
    return ewma, holt, hw


@pytest.fixture(scope="module")
def small_batches(spark):
    # force many Arrow batches so users span batch boundaries — the
    # carry path the rewrite introduced
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_ts_recurrences_match_reference_across_batch_boundaries(
    spark, sf_dir, small_batches
):
    pdf = _events_pdf(spark, sf_dir)
    ref_ewma, ref_holt, ref_hw = _ref_recurrences(pdf)

    got = {r.user_id: (r.n_events, r.ewma_milli) for r in QUERIES["ts_ewma_int"](spark, sf_dir).collect()}
    assert got == ref_ewma

    got = {
        r.user_id: (r.n_events, r.level_milli, r.trend_milli, r.forecast_milli)
        for r in QUERIES["ts_holt_int"](spark, sf_dir).collect()
    }
    assert got == ref_holt

    got = {
        r.user_id: (r.n_events, r.level_milli, r.trend_milli, r.forecast_milli)
        for r in QUERIES["ts8_holt_winters_int"](spark, sf_dir).collect()
    }
    assert got == ref_hw


# --- tfidf: df-from-tf == countDistinct over words ---------------------------


def test_tfidf_df_equals_count_distinct(spark, sf_dir):
    from realestate_engine.registry import t

    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    via_tf = {r.word: r.df for r in tf.groupBy("word").agg(F.count(F.lit(1)).alias("df")).collect()}
    direct = {
        r.word: r.df
        for r in words.groupBy("word").agg(F.countDistinct("doc_id").alias("df")).collect()
    }
    assert via_tf == direct


# --- q18: pre-aggregated form == post-join grouped form ----------------------


def test_q18_preagg_equals_postjoin_group(spark, sf_dir):
    from realestate_engine.registry import t

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    old = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("_sum_qty"))
        .filter(F.col("_sum_qty") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("_sum_qty"), 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )
    new = QUERIES["tpch_q18_large_orders"](spark, sf_dir)
    assert list(map(tuple, old.collect())) == list(map(tuple, new.collect()))


# --- dedup_pipeline_summary: single-pass == stage-query aggregates ----------


def test_pipeline_summary_matches_stage_queries(spark, sf_dir):
    row = QUERIES["dedup_pipeline_summary"](spark, sf_dir).collect()[0]
    canon = QUERIES["dedup_canonical_selection"](spark, sf_dir)
    split = QUERIES["dedup_leakage_safe_split"](spark, sf_dir)
    cs = canon.agg(
        F.count_distinct("cluster_id").alias("nc"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("nd"),
    ).collect()[0]
    ss = split.groupBy("split").count().collect()
    by_split = {r["split"]: r["count"] for r in ss}
    assert row.n_dup_clusters == cs.nc
    assert row.n_dropped == cs.nd
    assert row.n_train == by_split.get("train", 0)
    assert row.n_test == by_split.get("test", 0)


# --- mm_phash_dct: numpy DCT == the relational DCT it replaced --------------


def test_phash_numpy_equals_relational(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from realestate_engine.multimodal import _PHASH_N, _phash_basis
    from realestate_engine.registry import t

    n = _PHASH_N
    new = {
        r.doc_id: (r.phash, r.dc)
        for r in QUERIES["mm_phash_dct"](spark, sf_dir).collect()
    }
    # the pre-r14 relational form: explode pixels, broadcast-join the
    # basis twice, hash-agg, ranking window, DC self-join
    import pandas as pd

    from realestate_engine.multimodal import encode_png, png_raster

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    n2 = n * n

    def rasterize(it):
        for pdf in it:
            ids, pixes = [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p) or b"\x00"
                v = [b[(i * len(b)) // n2] for i in range(n2)]
                rgb = bytes(c for x in v for c in (x, x, x))
                png = encode_png(n, n, rgb)
                _w, _h, _ch, raster = png_raster(png)
                ids.append(doc_id)
                pixes.append([int(raster[3 * i]) for i in range(n2)])
            yield pd.DataFrame({"doc_id": ids, "pix": pixes})

    px = (
        d.mapInPandas(rasterize, "doc_id long, pix array<int>")
        .select("doc_id", F.posexplode("pix").alias("i", "pv"))
        .select(
            "doc_id",
            F.expr(f"i div {n}").alias("x"),
            (F.col("i") % n).alias("y"),
            F.col("pv").cast("long").alias("pv"),
        )
    )
    basis = _phash_basis()
    bx = spark.createDataFrame(basis, "x int, u int, cx long")
    byy = spark.createDataFrame(basis, "y int, v int, cy long")
    coef = (
        px.join(F.broadcast(bx), "x")
        .join(F.broadcast(byy), "y")
        .groupBy("doc_id", "u", "v")
        .agg(F.sum(F.col("pv") * F.col("cx") * F.col("cy")).cast("long").alias("coeff"))
    )
    ac = coef.filter(~((F.col("u") == 0) & (F.col("v") == 0))).withColumn(
        "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("coeff", "u", "v"))
    )
    ph = ac.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("rn") > 32, F.expr("shiftleft(1L, CAST(u * 8 + v AS INT))")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("phash")
    )
    dc = coef.filter((F.col("u") == 0) & (F.col("v") == 0)).select(
        "doc_id", F.col("coeff").alias("dc")
    )
    old = {r.doc_id: (r.phash, r.dc) for r in ph.join(dc, "doc_id").collect()}
    assert new == old
