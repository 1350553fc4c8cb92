"""Property-based codec tests (hypothesis): lossless invariants hold
for ARBITRARY inputs, not just the example fixtures — any
counterexample shrinks to a minimal failing case."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from realestate_engine.flac import decode_flac, encode_flac
from realestate_engine.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_lossless,
    encode_jpeg_progressive,
)


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
    channels=st.integers(1, 2),
    blocksize=st.sampled_from([64, 256, 1024]),
)
def test_flac_roundtrip_property(samples, channels, blocksize):
    if len(samples) % channels:
        samples = samples[: len(samples) - len(samples) % channels]
    if not samples:
        samples = [0] * channels
    dec = decode_flac(encode_flac(8000, channels, samples, blocksize=blocksize))
    assert dec["samples"] == samples
    assert dec["channels"] == channels


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    predictor=st.integers(1, 7),
    data=st.data(),
)
def test_lossless_jpeg_roundtrip_property(w, h, predictor, data):
    img = data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    dec = decode_jpeg(encode_jpeg_lossless(w, h, img, predictor=predictor))
    assert dec["samples"] == img


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(8, 24),
    quality=st.sampled_from([25, 85, 95]),
    subsample=st.booleans(),
    data=st.data(),
)
def test_progressive_equals_baseline_property(w, h, quality, subsample, data):
    rgb = bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)))
    base = decode_jpeg(encode_jpeg(w, h, rgb, quality, subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, quality, subsample=subsample))
    assert prog["rgb"] == base["rgb"]
