"""Invariant tests for the round-2 extension operators (beyond the
oracle hash-compare): redaction completeness, split partitioning,
quantization bounds, dense-id contiguity, attribution credit caps,
lateral top-k shape."""

from __future__ import annotations

from realestate_engine.registry import QUERIES, load_all

load_all()


def test_pii_redaction_removes_all_pii(spark, sf_dir):
    rows = QUERIES["t14_pii_redaction"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert "@" not in r["redacted"]
        assert "+1-800-" not in r["redacted"]
        assert "<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"]
        assert r["n_emails"] == 1 and r["n_phones"] == 1


def test_hash_split_partitions_every_row(spark, sf_dir):
    rows = {r["split"]: r["n"] for r in QUERIES["p13_hash_split"](spark, sf_dir).collect()}
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(rows.values()) == total
    # 12/16 : 2/16 : 2/16 expectation — train strictly dominates
    assert rows["train"] > rows["val"] and rows["train"] > rows["test"]


def test_quantize_int8_digests_match_exact_reference(spark, sf_dir):
    """Recompute the int8 quantization per vector in pure Python (same
    IEEE double ops) and require the (q_sum, q_wsum) digests to match
    exactly."""
    import math

    rows = {r["vec_id"]: r for r in QUERIES["sim_quantize_int8"](spark, sf_dir).collect()}
    assert rows
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding").collect()
    for e in embs:
        vec = [float(x) for x in e["embedding"]]
        max_abs = max(abs(x) for x in vec)
        r = rows[e["vec_id"]]
        if max_abs == 0.0:
            assert r["q_sum"] is None
            continue
        q = [math.floor(x * 127.0 / max_abs) for x in vec]
        assert all(-128 <= v <= 127 for v in q)
        assert r["q_sum"] == sum(q)
        assert r["q_wsum"] == sum(v * (i + 1) for i, v in enumerate(q))
        assert r["max_abs"] == max_abs


def test_label_centroids_account_for_every_vector(spark, sf_dir):
    rows = QUERIES["sim_label_centroids"](spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    at_pos1 = [r for r in rows if r["pos"] == 1]
    assert sum(r["n"] for r in at_pos1) == n_vecs
    assert {r["pos"] for r in rows} == set(range(1, 65))


def test_dense_reid_contiguous(spark, sf_dir):
    rows = QUERIES["p14_dense_reid"](spark, sf_dir).collect()
    ids = [r["new_id"] for r in rows]
    assert ids == list(range(1, len(rows) + 1))
    # key order preserved
    docs = [r["doc_id"] for r in rows]
    assert docs == sorted(docs)


def test_attribution_credit_caps(spark, sf_dir):
    rows = QUERIES["ev3_attribution"](spark, sf_dir).collect()
    assert rows
    by_purchase: dict[int, list] = {}
    for r in rows:
        by_purchase.setdefault(r["purchase_id"], []).append(r)
    for grp in by_purchase.values():
        # linear split: same credit per touch, total <= 10000
        assert len({r["credit_bp"] for r in grp}) == 1
        assert grp[0]["credit_bp"] * len(grp) <= 10000
        assert any(r["is_first"] for r in grp) and any(r["is_last"] for r in grp)


def test_lateral_topk_shape(spark, sf_dir):
    rows = QUERIES["j7_lateral_topk"](spark, sf_dir).collect()
    per_nation: dict[str, list] = {}
    for r in rows:
        per_nation.setdefault(r["n_name"], []).append(r["c_acctbal"])
    assert all(len(v) <= 2 for v in per_nation.values())
    assert all(v == sorted(v, reverse=True) for v in per_nation.values())


def test_triangle_count_nonnegative(spark, sf_dir):
    r = QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]
    assert r["n_edges"] > 0 and r["n_triangles"] >= 0


def test_sparse_dot_pairs_ordered_and_positive(spark, sf_dir):
    rows = QUERIES["text_sparse_dot_pairs"](spark, sf_dir).collect()
    dots = [r["dot"] for r in rows]
    assert dots == sorted(dots, reverse=True)
    assert all(d > 0 for d in dots)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_als_recommendations_shape(spark, sf_dir):
    rows = QUERIES["m16_als_recommend"](spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user"], []).append(r)
    assert len(by_user) <= 20
    import math
    for grp in by_user.values():
        assert [g["rec_rank"] for g in grp] == list(range(1, len(grp) + 1))
        scores = [g["score"] for g in grp]
        assert all(math.isfinite(s) for s in scores)
        assert scores == sorted(scores, reverse=True)  # ranked by predicted score


def test_isotonic_predictions_monotone(spark, sf_dir):
    rows = QUERIES["m17_isotonic_calibration"](spark, sf_dir).collect()
    assert len(rows) > 10
    xs = [r["quantity"] for r in rows]
    ys = [r["iso_cents"] for r in rows]
    assert xs == sorted(xs)
    # cent floors of a non-decreasing fit stay non-decreasing
    assert all(a <= b for a, b in zip(ys, ys[1:]))


def test_mom_growth_diff_consistency(spark, sf_dir):
    rows = QUERIES["f16_mom_growth"](spark, sf_dir).collect()
    assert rows[0]["prev_cents"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["prev_cents"] == prev["rev_cents"]
        assert cur["diff_cents"] == cur["rev_cents"] - prev["rev_cents"]


def test_bpe_merges_match_exact_reference(spark, sf_dir):
    """Re-derive the 3 BPE merges with an exact in-memory reference and
    compare merge choices AND weighted pair counts."""
    rows = QUERIES["text_bpe_merge_rounds"](spark, sf_dir).collect()
    assert len(rows) == 3

    import collections
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    freq: collections.Counter = collections.Counter()
    for r in docs:
        for w in re.split(r"\s+", r["text"].strip().lower()):
            freq[w] += 1
    vocab = {tuple(w): n for w, n in freq.items()}

    def pair_counts(v):
        pc: collections.Counter = collections.Counter()
        for sym, n in v.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += n
        return pc

    def merge(v, pair):
        out = {}
        joined = pair[0] + pair[1]
        for sym, n in v.items():
            s, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    s.append(joined)
                    i += 2
                else:
                    s.append(sym[i])
                    i += 1
            out[tuple(s)] = out.get(tuple(s), 0) + n
        return out

    for r in rows:
        pc = pair_counts(vocab)
        # argmax with (count desc, l asc, r asc) tie-break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        assert (r["left"], r["right"]) == best[0]
        assert r["pair_count"] == best[1]
        vocab = merge(vocab, best[0])


def test_fpgrowth_supports_recounted(spark, sf_dir):
    """Every reported 1- and 2-itemset support must equal a direct SQL
    re-count over the baskets."""
    rows = QUERIES["m19_fpgrowth_baskets"](spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey").distinct()
    orders_with = {}
    for r in li.collect():
        orders_with.setdefault(r["l_partkey"], set()).add(r["l_orderkey"])
    n_checked = 0
    for r in rows:
        items = [int(x) for x in r["itemset"].split(",")]
        if len(items) == 1:
            assert len(orders_with[items[0]]) == r["support"]
            n_checked += 1
        elif len(items) == 2:
            assert len(orders_with[items[0]] & orders_with[items[1]]) == r["support"]
            n_checked += 1
    assert n_checked > 0
    sup = [r["support"] for r in rows]
    assert sup == sorted(sup, reverse=True)


def test_ahash_neardup_matches_exact_reference(spark, sf_dir):
    """Recompute every 64-bit aHash and all hamming<=7 pairs in pure
    Python; the banded-join pipeline must find exactly that set."""
    rows = QUERIES["mm_ahash_neardup"](spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()

    def ahash(b: bytes, bits: int = 64) -> int:
        if not b:
            return 0
        mean = sum(b) / len(b)
        h = 0
        for i in range(bits):
            if b[(i * len(b)) // bits] > mean:
                h |= 1 << i
        return h

    hashes = {r["doc_id"]: ahash(r["text"].encode("utf-8")) for r in docs}
    ids = sorted(hashes)
    expected = {}
    for i, x in enumerate(ids):
        for y in ids[i + 1:]:
            d = bin(hashes[x] ^ hashes[y]).count("1")
            if d <= 7:
                expected[(x, y)] = d
    assert got == expected


def test_als_recall_eval_bounds(spark, sf_dir):
    rows = QUERIES["m20_als_recall_eval"](spark, sf_dir).collect()
    n_users = sum(r["n_users"] for r in rows)
    n_hits = sum(r["n_hits"] for r in rows)
    assert n_users > 0
    assert 0 <= n_hits <= n_users
    assert all(0 <= r["n_hits"] <= r["n_users"] for r in rows)


def test_bm25_matches_exact_reference(spark, sf_dir):
    """Replay BM25 (k1=1.2, b=0.75, Lucene idf) in pure Python; the
    distributed ranking must match exactly and scores to 1e-9."""
    import collections
    import math
    import re

    rows = QUERIES["text_bm25_ranking"](spark, sf_dir).collect()
    assert rows

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()
    terms = ("data", "model", "spark")
    k1, b = 1.2, 0.75
    tfs, dls = {}, {}
    for r in docs:
        words = re.split(r"\s+", r["text"].strip().lower())
        dls[r["doc_id"]] = len(words)
        c = collections.Counter(w for w in words if w in terms)
        if c:
            tfs[r["doc_id"]] = c
    n_docs = len(docs)
    avgdl = sum(dls.values()) / n_docs
    dfs = collections.Counter(t_ for c in tfs.values() for t_ in c)
    scores = {}
    for doc_id, c in tfs.items():
        s = 0.0
        for t_, tf in sorted(c.items()):
            idf = math.log((n_docs - dfs[t_] + 0.5) / (dfs[t_] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dls[doc_id] / avgdl))
        scores[doc_id] = round(s, 9)
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["doc_id"], r["bm25"]) for r in rows]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for (gd, gs), (ed, es) in zip(got, expected):
        assert abs(gs - es) < 1e-9, (gd, gs, es)


def test_glm_poisson_fit_sane(spark, sf_dir):
    rows = QUERIES["m21_glm_poisson"](spark, sf_dir).collect()
    # output is term-sorted since the round-11 full-oracle upgrade
    assert [r["term"] for r in rows] == ["f_month", "f_price", "intercept"]
    for r in rows:
        assert r["deviance_micro"] >= 0 and r["dof"] > 0
    # a refit must reproduce the same estimates (deterministic IRLS)
    rows2 = QUERIES["m21_glm_poisson"](spark, sf_dir).collect()
    assert [(r["term"], r["est_micro"]) for r in rows] == [
        (r["term"], r["est_micro"]) for r in rows2
    ]


def test_largest_remainder_allocation_sums_exactly(spark, sf_dir):
    from pyspark.sql import functions as F

    alloc = QUERIES["x15_largest_remainder_allocation"](spark, sf_dir)
    per_order = alloc.groupBy("l_orderkey").agg(F.sum("alloc_cents").alias("s"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", F.floor(F.col("o_totalprice") * 100).alias("total_cents")
    )
    bad = (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .where(F.col("s") != F.col("total_cents"))
        .count()
    )
    assert bad == 0  # every order's parts sum back to the whole, to the cent


def test_rfm_scores_bounded_and_conserve_customers(spark, sf_dir):
    rows = QUERIES["ev7_rfm_segmentation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust


def test_grouped_mode_matches_pandas(spark, sf_dir):
    rows = QUERIES["a27_grouped_mode"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    li["qty"] = li["l_quantity"].astype("int64")
    for r in rows:
        grp = li[(li.l_returnflag == r["l_returnflag"]) & (li.l_linestatus == r["l_linestatus"])]
        vc = grp["qty"].value_counts()
        top = vc[vc == vc.max()].index.min()  # smallest-value tiebreak
        assert r["mode_qty"] == top and r["mode_count"] == vc.max()


def test_time_weighted_avg_within_value_range(spark, sf_dir):
    rows = QUERIES["x14_time_weighted_avg"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_intervals"] >= 1 and r["total_s"] >= 0
        if r["twa_value"] is not None:
            assert 0.0 <= r["twa_value"] <= 491.0  # convex combination of held values


def test_token_budget_is_prefix_of_score_order(spark, sf_dir):
    rows = QUERIES["corpus_token_budget"](spark, sf_dir).collect()
    assert rows
    # cum_tok is the running sum of tok in (score desc, doc_id) order
    run = 0
    for r in sorted(rows, key=lambda r: (-r["score_milli"], r["doc_id"])):
        run += r["tok"]
        assert r["cum_tok"] == run
    # the selection is a prefix: everything dropped scores <= everything kept
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    total_docs = len(docs)
    assert len(rows) < total_docs  # budget is 1/4 of tokens -> a strict subset


def test_mixture_sample_matches_exact_recount(spark, sf_dir):
    rows = {r["lang"]: r for r in QUERIES["corpus_mixture_sample"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    rates = {"en": 400, "de": 800, "es": 800, "fr": 800, "zh": 800}
    for lang, grp in docs.groupby("lang"):
        kept = sum(1 for i in grp["doc_id"] if (int(i) * 2654435761) % 1000 < rates[lang])
        assert rows[lang]["n_total"] == len(grp)
        assert rows[lang]["n_kept"] == kept


def test_ewma_matches_pure_python(spark, sf_dir):
    import math

    rows = {r["user_id"]: r for r in QUERIES["ts_ewma_int"](spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev = ev.sort_values(["ts", "event_id"])
    for uid, grp in ev.groupby("user_id"):
        state = None
        for x in grp["value"]:
            v = int(math.floor(x * 1000))
            state = v if state is None else (state + v) // 2
        assert rows[uid]["n_events"] == len(grp)
        assert rows[uid]["ewma_milli"] == state


def test_matryoshka_prefix_selfmatch_and_bounds(spark, sf_dir):
    rows = QUERIES["sim_matryoshka_topk"](spark, sf_dir).collect()
    assert rows and rows[0]["vec_id"] == 0  # self-match ranks first
    assert abs(rows[0]["cosine16"] - 1.0) < 1e-6 and abs(rows[0]["cosine64"] - 1.0) < 1e-6
    for r in rows:
        assert -1.000001 <= r["cosine16"] <= 1.000001
        assert -1.000001 <= r["cosine64"] <= 1.000001


def test_hard_negatives_exclude_probe_label(spark, sf_dir):
    rows = QUERIES["sim_hard_negatives"](spark, sf_dir).collect()
    assert len(rows) == 10
    probe_label = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").where("vec_id = 0").first().label
    )
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    for r in rows:
        assert r["label"] != probe_label
        assert -1.000001 <= r["cosine"] <= 1.000001


def test_length_buckets_conserve_docs_and_bound_waste(spark, sf_dir):
    rows = QUERIES["pack_length_buckets"](spark, sf_dir).collect()
    n_docs_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    for r in rows:
        assert r["padding_waste"] == r["n_docs"] * r["max_tok"] - r["sum_tok"] >= 0
        assert r["bucket_min_tok"] <= r["max_tok"] < 2 * r["bucket_min_tok"]


def test_chi2_matches_scipy_free_reference(spark, sf_dir):
    row = QUERIES["a28_chi2_independence"](spark, sf_dir).first()
    import pandas as pd

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey", "o_orderpriority").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_mktsegment").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    ct = pd.crosstab(j["c_mktsegment"], j["o_orderpriority"])
    n = ct.values.sum()
    exp = ct.sum(1).values[:, None] * ct.sum(0).values[None, :] / n
    chi2 = ((ct.values - exp) ** 2 / exp).sum()
    assert row.n_obs == n
    assert row.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(row.chi2 - chi2) < 1e-4


def test_sliding_distinct_users_brute_force(spark, sf_dir):
    # a29 emits timestamps (datetime-family alignment with the DuckDB
    # oracle, round 6) — key the comparison by UTC calendar date.
    # Epoch is computed Spark-side (cast("long") on TimestampType is
    # the raw UTC epoch): collect() localizes through the OS TZ and a
    # naive->timestamp() round-trip is fold-ambiguous during DST
    # fall-back (the ADVICE r12 class).
    import datetime

    from pyspark.sql import functions as F

    rows = {
        datetime.datetime.fromtimestamp(
            r["epoch"], datetime.timezone.utc
        ).date(): r["wau"]
        for r in QUERIES["a29_sliding_distinct_users"](spark, sf_dir)
        .select(F.col("day").cast("long").alias("epoch"), "wau")
        .collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev["day"] = ev["ts"].dt.floor("D").dt.date
    days = sorted(ev["day"].unique())
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=6)
        want = ev[(ev["day"] >= lo) & (ev["day"] <= d)]["user_id"].nunique()
        assert rows[d] == want
    assert set(rows) == set(days)


def test_prefixspan_supports_recount(spark, sf_dir):
    rows = QUERIES["m22_prefixspan_sequences"](spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev = ev.sort_values(["ts", "event_id"])
    journeys = ev.groupby("user_id")["event_type"].apply(list)

    def contains(seq, pat):
        i = 0
        for x in seq:
            if i < len(pat) and x == pat[i]:
                i += 1
        return i == len(pat)

    for r in rows[:10]:
        pat = [p for p in r["pattern"].split(">")]
        assert all("+" not in p for p in pat)  # single-event itemsets
        want = sum(1 for s in journeys if contains(s, pat))
        assert r["support"] == want


def test_roc_auc_matches_sklearn_free_reference(spark, sf_dir):
    row = QUERIES["m23_roc_auc_ranksum"](spark, sf_dir).first()
    import pandas as pd

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    score = (o["o_totalprice"] * 100).round().astype("int64")
    label = (o["o_orderpriority"] == "1-URGENT").astype(int)
    r = pd.Series(score).rank(method="average")
    n_pos, n_neg = int(label.sum()), int((1 - label).sum())
    auc = (r[label == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert abs(row.auc - auc) < 1e-6


def test_aft_survival_fit_sane(spark, sf_dir):
    rows = {r["term"]: r["est_e4"] for r in QUERIES["m24_aft_survival"](spark, sf_dir).collect()}
    assert set(rows) == {"intercept", "coef_n_events", "coef_avg_value", "scale"}
    assert rows["scale"] > 0  # 1e-4-floored Weibull scale stays positive


def test_kmeans_fixed_point_partitions_all_vectors(spark, sf_dir):
    rows = QUERIES["m25_kmeans_fixed_point"](spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n"] for r in rows) == n_vecs
    assert sorted(r["cid"] for r in rows) == [0, 1, 2]
    for r in rows:
        for c in ("c1", "c2", "c3", "c4"):
            assert -2_000_000 <= r[c] <= 2_000_000  # micro-units of unit-ish floats


def test_csv_mode_matrix_contracts(spark, sf_dir, tmp_path):
    """DROPMALFORMED keeps a subset of PERMISSIVE's good rows;
    FAILFAST throws on the first malformed line."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out = str(tmp_path / "csv_modes")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    n.write.mode("overwrite").option("header", "false").csv(out)
    bad = ["1,extra,2,3,4", "2", '3,"unclosed quote,0', "notanint,BADLAND,0", "9,NINE,notanint"]
    with open(os.path.join(out, "part-malformed.csv"), "w") as f:
        f.write("\n".join(bad) + "\n")
    schema3 = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.LongType(), True),
        ]
    )
    n_clean = n.count()
    # parse fully (all three columns referenced) so pruning can't hide errors
    dropped = (
        spark.read.schema(schema3).option("mode", "DROPMALFORMED").csv(out)
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )
    assert n_clean <= len(dropped) <= n_clean + len(bad)
    clean_keys = {r.n_nationkey for r in n.collect()}
    kept_keys = [r.n_nationkey for r in dropped]
    assert clean_keys <= set(kept_keys)  # never drops a well-formed row

    with _pytest.raises(Exception):
        spark.read.schema(schema3).option("mode", "FAILFAST").csv(out).select(
            "n_nationkey", "n_name", "n_regionkey"
        ).collect()


def test_pps_sample_weight_proportionality(spark, sf_dir):
    rows = QUERIES["x18_systematic_pps_sample"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    import re

    wt = {
        int(r.doc_id): len(re.split(r"\s+", r.text.strip().lower()))
        for r in docs.itertuples()
    }
    total = sum(wt.values())
    step = total // 50
    # exact replay of the integer grid rule over the doc_id order
    cum, want = 0, []
    for d in sorted(wt):
        cum += wt[d]
        hi = (cum - 1) // step
        if step > 0 and hi >= 1 and hi * step >= cum - wt[d]:
            want.append(d)
    got = [r.doc_id for r in rows]
    assert got == want
    # every selected doc's interval really contains a grid point
    assert len(got) <= 51


def test_scene_cut_exact_replay(spark, sf_dir):
    rows = {r["doc_id"]: r for r in QUERIES["mm_scene_cut"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()

    def ahash(b: bytes, bits: int = 64) -> int:
        if not b:
            return 0
        mean = sum(b) / len(b)
        h = 0
        for i in range(bits):
            if b[(i * len(b)) // bits] > mean:
                h |= 1 << i
        return h  # unsigned; xor/popcount below is sign-agnostic

    n_frames = 4
    for r in docs[:50]:
        payload = r.text.encode("utf-8")
        hashes = []
        for k in range(n_frames):
            off = int(k * len(payload) / n_frames)
            hashes.append(ahash(payload[off : off + 32]))
        hams = [bin(a ^ b).count("1") for a, b in zip(hashes, hashes[1:])]
        got = rows[r.doc_id]
        assert got["n_transitions"] == len(hams)
        assert got["total_hamming"] == sum(hams)
        assert got["n_cuts"] == sum(1 for h in hams if h > 16)


def test_queries_survive_empty_tables(spark, sf_dir, tmp_path):
    """Graceful degradation on 0-row inputs: a representative query per
    family must plan and execute over an EMPTY copy of every table
    (schema preserved, no rows) without raising — the behavior that
    matters when a partition filter or upstream stage yields nothing.
    Aggregation-only queries may return their single global row."""
    import os

    empty_dir = str(tmp_path / "sf_empty")
    os.makedirs(empty_dir, exist_ok=True)
    from realestate_engine.registry import QUERIES, t

    for tbl in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        t(spark, sf_dir, tbl).limit(0).write.mode("overwrite").parquet(
            f"{empty_dir}/{tbl}.parquet"
        )
    representative = [
        "flagship_revenue_by_nation",   # join + agg
        "tpch_q1_pricing_summary",      # wide agg
        "dedup_exact",                  # dedup family
        "dedup_minhash_lsh",            # LSH pipeline (explode/groupBy)
        "text_tfidf_top_term",          # text family (window over empty)
        "st_tumbling_window",           # event-time windows
        "pack_documents_greedy",        # applyInPandas stateful scan
        "asof_last_click_before_purchase",  # union + window as-of
        "w1_ranking",                   # ranking windows
        "corpus_clean_pipeline",        # multi-stage filter chain
        "mm_ahash_neardup",             # mapInPandas + band self-join
        "x20_cdc_apply",                # changelog collapse
        "j10_bloom_join_prune",         # bloom build over an empty key set
        "x21_retraction_ivm",           # IVM merge with no state and no deltas
        "dq13_psi_drift",               # smoothed PSI over zero buckets
        "mm_jpeg_roundtrip",            # codec pipeline over empty doc set
    ]
    for name in representative:
        rows = QUERIES[name](spark, empty_dir).collect()
        assert isinstance(rows, list), name


def test_bucketed_join_rerun_same_session(spark, sf_dir):
    """s24 must survive repeated invocation in ONE session (table
    re-registration + overwrite of the stable bucket dirs)."""
    a = QUERIES["s24_bucketed_join_no_shuffle"](spark, sf_dir).collect()
    b = QUERIES["s24_bucketed_join_no_shuffle"](spark, sf_dir).collect()
    assert a == b and len(a) == 5


def test_table_fingerprint_is_layout_independent(spark, sf_dir):
    """dq11's claim: the fingerprint is a commutative SUM, so any
    partitioning/layout of the same rows yields the same value."""
    from pyspark.sql import functions as F
    from realestate_engine.dedup import portable_hash32
    from realestate_engine.registry import t

    o = t(spark, sf_dir, "orders")
    key = F.concat_ws(
        ":",
        F.col("o_orderkey").cast("string"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
    )
    base = o.agg(F.sum(portable_hash32(key)).alias("fp")).first()["fp"]
    shuffled = (
        o.repartition(7, "o_custkey").agg(F.sum(portable_hash32(key)).alias("fp")).first()["fp"]
    )
    assert base == shuffled
    row = {r["table_name"]: r["fingerprint"] for r in QUERIES["dq11_table_fingerprint"](spark, sf_dir).collect()}
    assert row["orders"] == base


def test_temperature_mixture_budget_accounting(spark, sf_dir):
    """Selected counts per source never exceed the source size, and the
    total never exceeds the target N (a source smaller than its budget
    under-fills rather than over-samples)."""
    from pyspark.sql import functions as F
    from realestate_engine.registry import t
    from realestate_engine.text import _TEMP_MIX_N

    sel = QUERIES["corpus_temperature_mixture"](spark, sf_dir)
    per_src = {r["source"]: r["n"] for r in sel.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {
        r["source"]: r["n"]
        for r in t(spark, sf_dir, "documents").groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(per_src.values()) <= _TEMP_MIX_N
    for src, n in per_src.items():
        assert n <= sizes[src]
