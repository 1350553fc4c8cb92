"""Round-6 operator tests: LSH hot-bucket guard bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from realestate_engine.dedup import (
    _HOT_BUCKET_CAP,
    _banded_signature,
    minhash_lsh_candidates,
)
from realestate_engine.registry import QUERIES, load_all

load_all()


def _skewed_corpus(spark, n_clones: int = 200, n_normal: int = 30):
    """A degenerate corpus: n_clones byte-identical documents (every
    band lands in one bucket) plus distinct normal docs."""
    clone_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, clone_text) for i in range(n_clones)]
    rows += [
        (10_000 + i, f"unique document number {i} with its own words {i * 7} {i * 13}")
        for i in range(n_normal)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_hot_bucket_guard_bounds_candidate_volume(spark):
    df = _skewed_corpus(spark)
    banded = _banded_signature(df, "doc_id", "text")
    occ = banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("occ"))
    hot = occ.filter(F.col("occ") > _HOT_BUCKET_CAP).count()
    assert hot >= 8, "all 8 bands of the clone block should be hot"

    guarded = minhash_lsh_candidates(
        df, "doc_id", "text", max_bucket_size=_HOT_BUCKET_CAP
    )
    n_guarded = guarded.count()
    # unguarded would enumerate C(200,2)=19900 clone pairs; the guard
    # refuses the hot buckets entirely, and per-bucket work is <= cap^2
    assert n_guarded <= (_HOT_BUCKET_CAP * (_HOT_BUCKET_CAP - 1) // 2) * 8 + 100
    clone_pairs = guarded.filter(
        (F.col("id_a") < 10_000) & (F.col("id_b") < 10_000)
    ).count()
    assert clone_pairs == 0


def test_hot_bucket_guard_is_identity_on_normal_data(spark, sf_dir):
    from realestate_engine.registry import t

    d = t(spark, sf_dir, "documents")
    unguarded = minhash_lsh_candidates(d, "doc_id", "text")
    guarded = minhash_lsh_candidates(
        d, "doc_id", "text", max_bucket_size=_HOT_BUCKET_CAP
    )
    # natural occupancy never reaches the cap, so the guarded candidate
    # SET (not just the count) is identical
    assert unguarded.exceptAll(guarded).count() == 0
    assert guarded.exceptAll(unguarded).count() == 0


def test_guard_query_reports_zero_drops_on_testdata(spark, sf_dir):
    row = QUERIES["dedup_lsh_hot_bucket_guard"](spark, sf_dir).collect()[0]
    assert row.n_hot_buckets == 0
    assert row.dropped_pair_slots == 0
    assert row.n_pairs_emitted > 0
    assert row.n_buckets > 0


def test_ann_recall_report_has_both_configs(spark, sf_dir):
    rows = {r.config: r for r in QUERIES["sim_ann_recall_report"](spark, sf_dir).collect()}
    assert set(rows) == {"lsh_4bit", "lsh_12bit_multiprobe"}
    for r in rows.values():
        assert 0 <= r.n_hits <= r.k == 20
        assert r.recall_micro == r.n_hits * 1_000_000 // 20
    assert rows["lsh_4bit"].bits == 4 and rows["lsh_4bit"].n_probe_buckets == 1
    mp = rows["lsh_12bit_multiprobe"]
    assert mp.bits == 12 and mp.n_probe_buckets == 13


def test_multiprobe_widens_candidate_set(spark, sf_dir):
    """At fixed bits, probing Hamming-1 neighbors can only ADD
    candidates — the single-probe result set is a subset."""
    from realestate_engine.registry import t
    from realestate_engine.similarity import lsh_ann_topk

    e = t(spark, sf_dir, "embeddings")
    single = {r.vec_id for r in lsh_ann_topk(e, bits=12, multiprobe=0, k=1000).collect()}
    multi = {r.vec_id for r in lsh_ann_topk(e, bits=12, multiprobe=12, k=1000).collect()}
    assert single <= multi
    assert 0 in single  # the probe always finds itself


# ---- round 6: real RIFF/WAVE PCM codec (wav.py) ----


def test_wav_roundtrip_all_param_combos():
    from realestate_engine.wav import decode_wav, encode_wav

    for bits in (8, 16):
        mod, base = (256, 128) if bits == 8 else (4096, 2048)
        for ch in (1, 2, 3):
            for rate in (8000, 16000, 44100):
                samples = [((7 * i + 13 * c) % mod) - base for i in range(97) for c in range(ch)]
                out = decode_wav(encode_wav(rate, ch, bits, samples))
                assert out["samples"] == samples
                assert (out["sample_rate"], out["channels"], out["bits"]) == (rate, ch, bits)
                assert out["n_frames"] == 97


def test_wav_decoder_skips_metadata_chunks_with_odd_padding():
    from realestate_engine.wav import decode_wav, encode_wav

    samples = list(range(-50, 50))
    # odd-length chunk exercises the RIFF pad byte on the walk
    blob = encode_wav(8000, 1, 16, samples, [(b"LIST", b"INFOIART\x07\x00\x00\x00graft\x00!")])
    bare = encode_wav(8000, 1, 16, samples)
    assert decode_wav(blob)["samples"] == decode_wav(bare)["samples"] == samples


def test_wav_decoder_error_and_unsupported_paths():
    import struct

    import pytest

    from realestate_engine.wav import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"not a riff at all")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data chunks
    blob = encode_wav(8000, 1, 16, [1, 2, 3])
    with pytest.raises(ValueError):
        decode_wav(blob[:-2])  # truncated data chunk
    non_pcm = bytearray(blob)
    struct.pack_into("<H", non_pcm, 20, 3)  # fmt.audio_format = IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(non_pcm))


def test_extract_audio_features_decodes_riff_for_real(spark):
    import pandas as pd

    from realestate_engine.multimodal import extract_audio_features
    from realestate_engine.wav import encode_wav

    samples = [((i * 11) % 4096) - 2048 for i in range(16000)]  # exactly 1s at 16 kHz
    blob = encode_wav(16000, 1, 16, samples)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "payload": [blob]}))
    row = extract_audio_features(df).collect()[0]
    assert row.sample_rate == 16000 and row.duration_ms == 1000
    exact_rms = (sum(s * s for s in samples) / len(samples)) ** 0.5
    assert abs(row.rms - round(exact_rms, 4)) < 1e-9


# ---- round 6: clustering coefficient, Count-Min, Z-order layout ----


def test_clustering_coefficient_census_invariants(spark, sf_dir):
    r = QUERIES["graph_clustering_coefficient"](spark, sf_dir).collect()[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    # every triangle closes exactly 3 wedges; coefficient in [0, 1e6]
    assert 3 * r.n_triangles <= r.n_wedges
    assert 0 <= r.clustering_coeff_micro <= 1_000_000
    assert r.clustering_coeff_micro == 3 * r.n_triangles * 1_000_000 // r.n_wedges


def test_zorder_tiles_skip_where_linear_cannot(spark, sf_dir):
    rows = QUERIES["dq14_skipping_audit"](spark, sf_dir).collect()
    by_layout: dict = {}
    for r in rows:
        s = by_layout.setdefault(r.layout, {"rows": 0, "scanned": 0, "tiles": 0})
        s["rows"] += r.n_rows
        s["tiles"] += 1
        s["scanned"] += bool(r.scanned_by_y_probe)
    z, lin = by_layout["zorder"], by_layout["linear"]
    assert z["rows"] == lin["rows"]  # same data, layout is the only variable
    # the y-only probe must scan strictly fewer z-tiles than linear strips
    assert z["scanned"] < lin["scanned"]
