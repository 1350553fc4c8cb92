"""FLAC codec tests: lossless round trips over every encoder path,
plus handcrafted bitstreams for the decoder-only paths (LPC subframes,
multi-partition Rice, wasted bits) and corruption detection."""

from __future__ import annotations

import math
import random
import struct

import pytest

from realestate_engine.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    _write_residuals,
    decode_flac,
    encode_flac,
)


def test_roundtrip_matrix():
    rng = random.Random(5)
    n = 3000
    sine = [int(12000 * math.sin(i / 30)) for i in range(n)]
    cases = [
        ("sine-mono", 16000, 1, sine, 1024),
        ("sine-stereo-correlated", 16000, 2,
         [v for i in range(n) for v in (sine[i], sine[i] - 100)], 1024),
        ("ramp", 8000, 1, [((i * 3) % 4000) - 2000 for i in range(n)], 512),
        ("silence", 44100, 2, [0] * 4096, 1024),
        ("noise-verbatim", 22050, 1, [rng.randrange(-32768, 32768) for _ in range(2500)], 1024),
        ("tiny", 8000, 1, [5, -3, 7], 1024),
        ("edge-values", 8000, 1, [32767, -32768] * 64, 64),
    ]
    for name, sr, ch, samples, bs in cases:
        payload = encode_flac(sr, ch, samples, blocksize=bs)
        dec = decode_flac(payload)
        assert dec["samples"] == samples, name
        assert dec["sample_rate"] == sr and dec["channels"] == ch, name
    # prediction must actually compress smooth content
    smooth = encode_flac(16000, 1, sine)
    assert len(smooth) < 2 * n * 0.5


def test_corruption_detected():
    payload = bytearray(encode_flac(8000, 1, [int(1000 * math.sin(i / 9)) for i in range(2000)]))
    payload[len(payload) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(payload))
    with pytest.raises(ValueError):
        decode_flac(b"NOPE" + bytes(payload[4:]))


def _handcraft_stream(nb: int, samples: list[int], write_subframe) -> bytes:
    """Assemble a valid single-frame mono 16-bit FLAC stream around a
    caller-supplied subframe writer — used to exercise decoder paths
    the repo's encoder never emits."""
    import hashlib

    info = _BitWriter()
    info.put(nb, 16)
    info.put(nb, 16)
    info.put(0, 24)
    info.put(0, 24)
    info.put(8000, 20)
    info.put(0, 3)  # mono
    info.put(15, 5)  # 16 bps
    info.put(nb, 36)
    streaminfo = bytes(info.buf) + hashlib.md5(struct.pack(f"<{nb}h", *samples)).digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    w = _BitWriter()
    w.put(0b11111111111110, 14)
    w.put(0, 2)
    w.put(0b0111, 4)
    w.put(0b0000, 4)
    w.put(0, 4)  # mono
    w.put(0b100, 3)
    w.put(0, 1)
    _utf8_number(w, 0)
    w.put(nb - 1, 16)
    w.align()
    w.put(_crc8(bytes(w.buf)), 8)
    write_subframe(w)
    w.align()
    body = bytes(w.buf)
    out += body + struct.pack(">H", _crc16(body))
    return bytes(out)


def test_decode_lpc_subframe():
    """LPC reconstruction: x[i] = e[i] + ((3*x[i-1] - 1*x[i-2]) >> 2)."""
    nb, order, shift = 64, 2, 2
    coefs = [3, -1]
    rng = random.Random(9)
    x = [100, 90]
    res = [rng.randrange(-40, 40) for _ in range(nb - order)]
    for e in res:
        pred = (coefs[0] * x[-1] + coefs[1] * x[-2]) >> shift
        x.append(e + pred)

    def sub(w: _BitWriter) -> None:
        w.put(0, 1)
        w.put(0b100000 | (order - 1), 6)
        w.put(0, 1)  # no wasted bits
        for v in x[:order]:
            w.put(v & 0xFFFF, 16)
        w.put(12 - 1, 4)  # precision 12
        w.put(shift, 5)
        for c in coefs:
            w.put(c & 0xFFF, 12)
        _write_residuals(w, res, 16)

    dec = decode_flac(_handcraft_stream(nb, x, sub))
    assert dec["samples"] == x


def test_decode_multipartition_rice_and_wasted_bits():
    """Partition order 2 (four Rice partitions) + wasted-bits shift —
    both decoder paths the encoder doesn't emit."""
    nb = 64
    base = [((i * 11) % 50) - 25 for i in range(nb)]
    x = [v << 1 for v in base]  # one wasted bit everywhere

    def sub(w: _BitWriter) -> None:
        w.put(0, 1)
        w.put(0b001000 | 0, 6)  # FIXED order 0 (residuals = values)
        w.put(1, 1)  # wasted-bits flag
        w.put(1, 1)  # unary 0 -> wasted = 1
        w.put(0, 2)  # rice method 0
        w.put(2, 4)  # partition order 2 -> 4 partitions of nb/4
        for part in range(4):
            seg = base[part * (nb // 4) : (part + 1) * (nb // 4)]
            w.put(6, 4)
            for rv in seg:
                u = (rv << 1) if rv >= 0 else ((-rv) << 1) - 1
                w.put_unary(u >> 6)
                w.put(u & 63, 6)

    dec = decode_flac(_handcraft_stream(nb, x, sub))
    assert dec["samples"] == x


def test_stereo_decorrelation_modes_exercised():
    """Correlated stereo must pick a decorrelated assignment (the
    frame header's channel-assignment nibble is 8, 9 or 10), and
    decode exactly."""
    n = 2048
    left = [int(9000 * math.sin(i / 25)) for i in range(n)]
    right = [v - 250 for v in left]  # constant side channel
    inter = [v for i in range(n) for v in (left[i], right[i])]
    payload = encode_flac(16000, 2, inter, blocksize=1024)
    dec = decode_flac(payload)
    assert dec["samples"] == inter
    # frame header starts right after the metadata block: find sync
    i = payload.index(b"\xff\xf8", 4)
    assignment = payload[i + 3] >> 4
    assert assignment in (8, 9, 10)
