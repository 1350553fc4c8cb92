"""Round-7 additions: Ogg/Vorbis and MP3 container probes (the audio
metadata surface is now complete: WAV + FLAC decode for real,
Ogg/MP3/MP4 probe for real; only perceptual sample decode is
stubbed), plus regression pins for the round's ADVICE fixes."""

from __future__ import annotations

import pytest


def test_ogg_roundtrip_and_error_paths():
    from realestate_engine.ogg import encode_minimal_ogg_vorbis, ogg_crc, parse_ogg

    s = encode_minimal_ogg_vorbis(48000, 1, [("TITLE", "x")], serial=9, granule=96000)
    p = parse_ogg(s)
    assert (p["sample_rate"], p["channels"], p["serial"]) == (48000, 1, 9)
    assert p["duration_ms"] == 2000 and p["n_pages"] == 3
    assert p["vendor"] == "realestate_engine" and p["comments"]["TITLE"] == "x"

    # the CRC is the Ogg flavor, not zlib's: known divergence on b"OggS"
    import zlib

    assert ogg_crc(b"OggS") != zlib.crc32(b"OggS")

    # any flipped byte breaks the page CRC
    b = bytearray(s)
    b[50] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(b))

    with pytest.raises(ValueError, match="capture pattern"):
        parse_ogg(b"RIFFxxxx")

    # a third packet (Vorbis setup/audio) is the honest codec boundary
    from realestate_engine.ogg import _page

    extra = s + _page(9, 3, 96000, [b"\x05vorbis-setup"], 0x00)
    with pytest.raises(NotImplementedError):
        parse_ogg(extra)


def test_ogg_packet_spans_lacing_boundary():
    """A packet of exactly 255·k bytes needs a terminating 0 lacing
    value; the comment header is padded past 255 bytes to prove the
    multi-lacing reassembly path."""
    from realestate_engine.ogg import encode_minimal_ogg_vorbis, parse_ogg

    long_val = "v" * 600  # comment packet > 2 lacing segments
    p = parse_ogg(encode_minimal_ogg_vorbis(8000, 2, [("PAD", long_val)]))
    assert p["comments"]["PAD"] == long_val


def test_mp3_roundtrip_and_error_paths():
    from realestate_engine.mp3 import decode_mp3_samples, encode_minimal_mp3, parse_mp3

    m = encode_minimal_mp3(11, 2, 4, id3v2_payload=b"t" * 40, id3v1=True)  # 192kbps 32kHz
    p = parse_mp3(m)
    assert (p["bitrate_kbps"], p["sample_rate"], p["n_frames"]) == (192, 32000, 4)
    assert p["duration_ms"] == 4 * 1152 * 1000 // 32000
    assert p["has_id3v2"] and p["has_id3v1"]
    # audio_bytes == the exact frame-stride sum (padding alternates 0,1)
    flen = 144 * 192 * 1000 // 32000
    assert p["audio_bytes"] == 4 * flen + 2

    with pytest.raises(ValueError, match="sync"):
        parse_mp3(b"\x00\x00\x00\x00" * 4)
    # truncating the last frame must be detected, not silently dropped
    with pytest.raises(ValueError, match="overruns"):
        parse_mp3(encode_minimal_mp3(9, 0, 2)[:-3])
    with pytest.raises(NotImplementedError):
        decode_mp3_samples(m)


def test_probe_queries_match_generation_params(spark, sf_dir):
    """mm_ogg_probe / mm_mp3_probe emit PARSED values; spot-check a few
    rows against the generation recipe independently of the oracle."""
    from realestate_engine.registry import QUERIES, load_all

    load_all()
    ogg = {r.doc_id: r for r in QUERIES["mm_ogg_probe"](spark, sf_dir).collect()}
    assert ogg[0].sample_rate == 8000 and ogg[0].channels == 1
    assert ogg[5].sample_rate == 22050 and ogg[5].channels == 2
    assert ogg[7].title == "doc-7" and ogg[7].n_comments == 2
    assert ogg[3].duration_ms == ((4 * 48000) // 2) * 1000 // 48000

    mp3 = {r.doc_id: r for r in QUERIES["mm_mp3_probe"](spark, sf_dir).collect()}
    assert mp3[0].bitrate_kbps == 128 and mp3[0].has_id3v2 and mp3[0].has_id3v1
    assert mp3[4].bitrate_kbps == 192 and mp3[4].sample_rate == 48000
    assert mp3[4].n_frames == 7 and not mp3[4].has_id3v1


def test_prefix_filter_join_tolerates_empty_shingle_docs(spark):
    """ADVICE r6: docs with <3 words (empty 3-gram shingle set) must be
    excluded on BOTH engine and oracle sides — the engine path is
    pinned here by running the same candidate pipeline over a corpus
    containing such a doc."""
    import pandas as pd

    from realestate_engine.dedup import prefix_filter_candidates, word_shingles
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["one two", "alpha beta gamma delta", "alpha beta gamma delta"],
            }
        )
    )
    d = docs.select("doc_id", word_shingles(F.col("text"), 3).alias("toks")).filter(
        F.size("toks") > 0
    )
    cand = prefix_filter_candidates(d).collect()
    assert {(r.id_a, r.id_b) for r in cand} == {(2, 3)}  # the short doc never pairs


def test_hot_bucket_guard_integer_pair_slots(spark):
    """ADVICE r6: dropped_pair_slots must be exact integer DIV, not a
    float /2 — occ=5 gives exactly 10."""
    import pandas as pd
    from pyspark.sql import functions as F

    occ = spark.createDataFrame(pd.DataFrame({"occ": [5, 3, 1]}))
    got = occ.agg(
        F.sum(F.expr("(CAST(occ AS BIGINT) * (occ - 1)) DIV 2")).cast("bigint").alias("p")
    ).first()
    assert got.p == 10 + 3 + 0
    assert occ.agg(F.sum(F.expr("(CAST(occ AS BIGINT) * (occ - 1)) DIV 2")).cast("bigint")).schema[
        0
    ].dataType.typeName() == "long"


def test_ivf_pq_prunes_and_ranks_sanely(spark, sf_dir):
    """IVF-PQ must (a) scan only the probed cells — candidate count
    well under the corpus — and (b) rank near-duplicates of the probe
    near the top (the embeddings fixture plants near-dup pairs)."""
    from pyspark.sql import functions as F

    from realestate_engine.registry import QUERIES, load_all
    from realestate_engine.similarity import _IVF_NPROBE, _IVF_C

    load_all()
    rows = QUERIES["sim_ivf_pq"](spark, sf_dir).collect()
    assert len(rows) == 10
    # every returned cell is one of nprobe cells
    assert len({r.cell for r in rows}) <= _IVF_NPROBE
    # quality: 4-bit PQ blurs fine ordering (sim_pq_adc shows the same),
    # but the RETRIEVED SET must be far closer than a random draw —
    # mean exact L2 of the ADC top-10 well under the corpus mean
    # exact L2 to the probe (brute force, computed distributed)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda v: F.floor(v.cast("double") * 1000).cast("long")).alias(
            "vint"
        ),
    )
    q = e.where(F.col("vec_id") == 0).select(F.col("vint").alias("q_vint"))
    corpus_mean = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.aggregate(
                F.zip_with("vint", "q_vint", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, d: acc + d,
            ).alias("l2")
        )
        .agg(F.avg("l2"))
        .first()[0]
    )
    # context: the embeddings fixture has strong distance concentration
    # (exact top-1 is only ~33% under the corpus mean), so absolute
    # recall is bounded for ANY 4-bit code — sim_pq_adc (r6,
    # driver-verified) scores recall@10 = 0.0 here, while residual
    # encoding lifts IVF-PQ to 0.2. The honest assertions are: the
    # retrieved set beats a random draw clearly, within what the
    # code rate allows.
    retrieved_mean = sum(r.l2_exact for r in rows) / len(rows)
    assert retrieved_mean < 0.9 * corpus_mean, (retrieved_mean, corpus_mean)


def test_linear_shap_efficiency_axiom(spark, sf_dir):
    """m37: base + sum(phi) must equal the prediction (Shapley
    efficiency) up to the independent 4-decimal rounds."""
    from realestate_engine.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["m37_linear_shap"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        gap = abs(r.base_cents + r.phi_qty_cents + r.phi_disc_cents - r.prediction_cents)
        assert gap <= 0.0201, (r, gap)
    # attributions are non-trivial: at least one row moves off base
    assert any(abs(r.phi_qty_cents) > 1 for r in rows)


def test_delta_log_replay_reconciliation(spark, sf_dir):
    """x31: live_at_v must equal the add/remove reconciliation
    recomputed independently from the emitted versions."""
    from realestate_engine.queries_lakehouse import _DL_SNAPSHOT_V, x31_delta_log_replay

    rows = x31_delta_log_replay(spark, sf_dir).collect()
    assert len(rows) == 40
    for r in rows:
        expect = r.add_version <= _DL_SNAPSHOT_V and (
            r.remove_version is None or r.remove_version > _DL_SNAPSHOT_V
        )
        assert r.live_at_v == expect, r
    # the log is non-degenerate: some tombstones, some live, some future
    assert any(r.remove_version is not None for r in rows)
    assert any(r.live_at_v for r in rows) and any(not r.live_at_v for r in rows)


def test_ipv4_cidr_longest_prefix_wins(spark, sf_dir):
    """f27: the /24 carve-out must beat its covering /9 (routing-rule
    LPM, not first-match), and block totals must partition the ips."""
    from realestate_engine.queries_functions import f27_ipv4_cidr
    from realestate_engine.registry import t

    rows = {r.block_name: r for r in f27_ipv4_cidr(spark, sf_dir).collect()}
    lo, hi = (10 << 24) | (42 << 8), ((10 << 24) | (42 << 8)) + 255
    if "svc-42" in rows:
        assert rows["svc-42"].min_ip >= lo and rows["svc-42"].max_ip <= hi
        # corp-a still exists and is not swallowed by the carve-out
        assert rows["corp-a"].n_ips > 0
    n_orders = t(spark, sf_dir, "orders").count()
    assert sum(r.n_ips for r in rows.values()) == n_orders


def test_holt_winters_recurrence_replay(spark, sf_dir):
    """ts8: replay the triple recurrence independently in pure Python
    over the parquet (pandas read, outside Spark) for 3 users."""
    import math

    import duckdb

    from realestate_engine.timeseries import ts8_holt_winters_int

    got = {r.user_id: r for r in ts8_holt_winters_int(spark, sf_dir).collect()}
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT user_id, event_id, ts, value FROM '{sf_dir}/events.parquet' "
        "WHERE user_id IN (1, 2, 3) ORDER BY user_id, ts, event_id"
    ).fetchdf()
    for uid, g in pdf.groupby("user_id"):
        lvl = trend = None
        season = [0, 0, 0, 0]
        rn = 0
        for x in g["value"]:
            v = int(math.floor(float(x) * 1000))
            rn += 1
            if lvl is None:
                lvl, trend = v, 0
                continue
            i = (rn - 1) % 4
            new_lvl = (v - season[i] + lvl + trend) // 2
            trend = (trend + new_lvl - lvl) // 2
            season[i] = (v - new_lvl + season[i]) // 2
            lvl = new_lvl
        r = got[uid]
        assert (r.n_events, r.level_milli, r.trend_milli) == (rn, lvl, trend), uid
        assert r.forecast_milli == lvl + trend + season[rn % 4], uid


def test_gif_codec_roundtrip_and_error_paths():
    """gif.py: LZW width escalation, 4096 CLEAR/reset, interlace
    permutation, and strict decode errors."""
    import random

    from realestate_engine.gif import decode_gif, encode_gif

    pal4 = [((i * 37) % 256, (i * 11) % 256, (i * 91) % 256) for i in range(4)]

    # interlace round trip on a known raster (de-permutation correct)
    px = [(x + y) % 4 for y in range(10) for x in range(5)]
    out = decode_gif(encode_gif(5, 10, pal4, px, interlace=True))
    assert out["pixels"] == px and out["interlaced"]

    # dictionary reset at 4096 entries: incompressible binary raster
    rnd = random.Random(7)
    big = [rnd.randrange(2) for _ in range(300 * 60)]
    dec = decode_gif(encode_gif(300, 60, [(0, 0, 0), (255, 255, 255)], big))
    assert dec["pixels"] == big

    # EOI exactly on a table-full width boundary (the encoder's
    # phantom-insert fix): alternating 33-pixel column
    alt = [(y * 5 + 7) % 2 for y in range(33)]
    assert decode_gif(encode_gif(1, 33, [(0, 0, 0), (1, 1, 1)], alt))["pixels"] == alt

    # GIF89a carries a GCE; 87a does not
    assert decode_gif(encode_gif(2, 2, pal4, [0, 1, 2, 3], gif89=True))["has_gce"]
    assert not decode_gif(encode_gif(2, 2, pal4, [0, 1, 2, 3]))["has_gce"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    blob = encode_gif(4, 4, pal4, [0] * 16)
    with _pytest.raises(ValueError):
        decode_gif(blob[:-2])  # truncated (trailer gone)
    with _pytest.raises(ValueError):
        encode_gif(2, 2, pal4[:3], [0] * 4)  # non-power-of-two palette
    with _pytest.raises(ValueError):
        encode_gif(2, 2, pal4, [0, 1, 2, 9])  # index out of range


def test_neyman_allocation_bounds(spark, sf_dir):
    """p25: floor allocations never exceed the budget and each stratum
    weight is the exact integer sqrt of N*Sxx - Sx^2."""
    from realestate_engine.queries_quality import _NEYMAN_TOTAL, p25_neyman_allocation

    rows = p25_neyman_allocation(spark, sf_dir).collect()
    assert 0 < sum(r.alloc_h for r in rows) <= _NEYMAN_TOTAL
    assert all(0 <= r.remainder_micro < 1000000 for r in rows)
    assert all(r.alloc_h >= 0 for r in rows)


def test_wordpiece_greedy_segmentation(spark, sf_dir):
    """t26: replay the greedy longest-match on the top token's words
    independently: token counts must be reproducible from the vocab."""
    from realestate_engine.tokenizers import (
        _WP_MAX_TLEN,
        _WP_MAX_WLEN,
        _WP_TOP_PREFIXES,
        t26_wordpiece_tokenize,
    )

    got = t26_wordpiece_tokenize(spark, sf_dir).collect()
    assert 0 < len(got) <= 25
    # tokens are lowercase, within the length cap, counts descending
    assert all(1 <= len(r.tok) <= _WP_MAX_TLEN for r in got)
    counts = [r.total_count for r in got]
    assert counts == sorted(counts, reverse=True)
    # independent replay: rebuild vocab + greedy-tokenize in Python
    import collections
    import re

    import duckdb

    words = collections.Counter()
    for (txt,) in duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall():
        for w in re.split(r"\s+", txt.strip().lower()):
            if re.fullmatch("[a-z]+", w or "") and len(w) <= _WP_MAX_WLEN:
                words[w] += 1
    pref = collections.Counter()
    for w, c in words.items():
        for ln in range(2, _WP_MAX_TLEN + 1):
            if len(w) >= ln:
                pref[w[:ln]] += c
    top = sorted(pref.items(), key=lambda kv: (-kv[1], kv[0]))[:_WP_TOP_PREFIXES]
    vocab = {t_ for t_, _ in top} | set("abcdefghijklmnopqrstuvwxyz")
    tok_counts = collections.Counter()
    for w, c in words.items():
        p = 0
        while p < len(w):
            for ln in range(min(_WP_MAX_TLEN, len(w) - p), 0, -1):
                if w[p : p + ln] in vocab:
                    tok_counts[w[p : p + ln]] += c
                    p += ln
                    break
    expect = sorted(tok_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert [(r.tok, r.total_count) for r in got] == expect


def test_sprt_decisions_consistent(spark, sf_dir):
    """ev19: decisions must match an independent replay of the
    cumulative LLR walk per user."""
    import duckdb

    from realestate_engine.queries_experiments import (
        _SPRT_A,
        _SPRT_B,
        _SPRT_INC_CONV,
        _SPRT_INC_NON,
        ev19_sprt_user,
    )

    got = {r.user_id: r for r in ev19_sprt_user(spark, sf_dir).collect()}
    pdf = duckdb.sql(
        f"SELECT user_id, event_type FROM '{sf_dir}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).fetchdf()
    for uid, g in pdf.groupby("user_id"):
        cum, stop, decision = 0, None, "continue"
        for i, et in enumerate(g["event_type"], start=1):
            cum += _SPRT_INC_CONV if et == "purchase" else _SPRT_INC_NON
            if stop is None and (cum >= _SPRT_A or cum <= _SPRT_B):
                stop = i
                decision = "accept_h1" if cum >= _SPRT_A else "accept_h0"
        r = got[uid]
        assert (r.stop_rn, r.decision, r.final_llr_micro) == (stop, decision, cum), uid


def test_gbm_stumps_reduces_mse(spark, sf_dir):
    """m39: each boosting round must not increase the integer MSE, and
    cuts come from the candidate grid."""
    from realestate_engine.queries_mleval import _GBM_CUTS, m39_gbm_stumps

    rows = m39_gbm_stumps(spark, sf_dir).collect()
    assert [r.round for r in rows] == [0, 1, 2]
    assert all(r.cut in _GBM_CUTS for r in rows)
    mses = [r.mse_after for r in rows]
    assert mses[0] >= mses[1] >= mses[2] > 0


def test_avi_mjpeg_container_and_error_paths():
    """avi.py: header facts, idx1 integrity, JPEG frame round trip,
    strict errors, codec gate."""
    import pytest as _pytest

    from realestate_engine.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from realestate_engine.jpeg import decode_jpeg, encode_jpeg

    w, h = 16, 8
    frames = [
        encode_jpeg(
            w, h,
            bytes((x * 7 + y * 3 + f * 11) % 256 for y in range(h) for x in range(w) for _ in range(3)),
            quality=85,
        )
        for f in range(3)
    ]
    blob = encode_avi_mjpeg(w, h, 15, frames)
    out = decode_avi_mjpeg(blob)
    assert (out["width"], out["height"], out["n_frames"], out["fps"]) == (w, h, 3, 15)
    assert out["us_per_frame"] == 1_000_000 // 15
    assert out["idx_consistent"] and out["has_index_flag"]
    assert out["frames"] == frames
    assert decode_jpeg(out["frames"][0])["width"] == w

    with _pytest.raises(ValueError, match="signature"):
        decode_avi_mjpeg(b"RIFX" + blob[4:])
    with _pytest.raises(ValueError):
        decode_avi_mjpeg(blob[:-10])
    mutated = bytearray(blob)
    i = blob.index(b"MJPG")
    mutated[i : i + 4] = b"H264"
    with _pytest.raises((NotImplementedError, ValueError)):
        decode_avi_mjpeg(bytes(mutated))
    with _pytest.raises(ValueError):
        encode_avi_mjpeg(w, h, 0, frames)  # fps must be positive


def test_logreg_newton_converges_sanely(spark, sf_dir):
    """m43: Newton iterates must head toward the empirical log-odds
    and successive steps must shrink."""
    import math

    import duckdb

    from realestate_engine.queries_mleval import m43_logreg_newton

    rows = m43_logreg_newton(spark, sf_dir).collect()
    assert [r.round for r in rows] == [1, 2, 3]
    # step sizes shrink (Newton is locally quadratic)
    d1 = abs(rows[1].b0_micro - rows[0].b0_micro) + abs(rows[1].b1_micro - rows[0].b1_micro)
    d2 = abs(rows[2].b0_micro - rows[1].b0_micro) + abs(rows[2].b1_micro - rows[1].b1_micro)
    assert d2 < d1
    # intercept-only sanity: the fitted mean probability at the mean x
    # should approximate the base rate within a few points
    base = duckdb.sql(
        f"SELECT AVG(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0 END), AVG(l_quantity) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    rate, mean_x = float(base[0]), float(base[1])
    b0, b1 = rows[2].b0_micro / 1e6, rows[2].b1_micro / 1e6
    p_at_mean = 1 / (1 + math.exp(-(b0 + b1 * mean_x)))
    assert abs(p_at_mean - rate) < 0.05, (p_at_mean, rate)


def test_boruvka_msf_invariants(spark, sf_dir):
    """graph_boruvka_msf: forest edge-count algebra must hold —
    cumulative edges = n_nodes - n_components_after — and every
    round's contraction must report full convergence."""
    from realestate_engine.graph import graph_boruvka_msf, trade_edges

    rows = graph_boruvka_msf(spark, sf_dir).collect()
    n_nodes = trade_edges(spark, sf_dir).select("src").distinct().count()
    assert all(r.not_converged == 0 for r in rows)
    cum = 0
    for r in rows:
        cum += r.n_edges_added
        # a spanning forest never carries more edges than nodes-minus-components
        assert cum == n_nodes - r.n_components_after, (cum, n_nodes, r)
    assert rows[-1].n_components_after >= 1
    assert all(r.weight_added >= 0 for r in rows)


def test_tiff_codec_byte_orders_and_errors():
    """tiff.py: II/MM round trips, offset vs inline values, strict
    errors, BigTIFF gate."""
    import struct

    import pytest as _pytest

    from realestate_engine.tiff import decode_tiff, encode_tiff

    for be in (False, True):
        px = bytes((i * 3 + 1) % 256 for i in range(12 * 5))
        out = decode_tiff(
            encode_tiff(12, 5, px, orientation=6, make="x", big_endian=be)
        )
        assert (out["width"], out["height"], out["orientation"]) == (12, 5, 6)
        assert out["pixels"] == px and out["big_endian"] == be and out["make"] == "x"

    blob = encode_tiff(4, 4, bytes(16))
    with _pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + blob[2:])
    with _pytest.raises(ValueError):
        decode_tiff(blob[:20])
    big = bytearray(blob)
    struct.pack_into("<H", big, 2, 43)
    with _pytest.raises(NotImplementedError):
        decode_tiff(bytes(big))
    with _pytest.raises(ValueError):
        encode_tiff(4, 4, bytes(15))  # pixel-count mismatch


def test_gmm_em_finds_planted_modes(spark, sf_dir):
    """m45: the two EM means must land near the planted modes (~25 and
    ~125) and the soft count near half the rows."""
    from realestate_engine.queries_mleval import m45_gmm_em
    from realestate_engine.registry import t

    rows = m45_gmm_em(spark, sf_dir).collect()
    final = rows[-1]
    assert 20_000_000 < final.mu1_micro < 32_000_000
    assert 118_000_000 < final.mu2_micro < 132_000_000
    n = t(spark, sf_dir, "lineitem").count()
    assert abs(final.n_soft1 - n / 2) < n * 0.1
