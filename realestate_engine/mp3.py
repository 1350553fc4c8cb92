"""Pure-stdlib MPEG-1 Layer III frame-header parser + minimal writer.

Completes the audio-container metadata surface next to wav.py
(decoded), flac.py (decoded) and ogg.py (probed): an MP3 file is a
sequence of self-describing frames — 4-byte header (11-bit sync,
version/layer bits, bitrate index, sample-rate index, padding bit)
followed by ``144 * bitrate / sample_rate + padding`` bytes —
optionally wrapped in an ID3v2 tag (front, synchsafe length) and an
ID3v1 tag (fixed 128-byte trailer). Walking that gives frame count,
bitrate, sample rate and exact duration (1152 samples per MPEG-1
Layer III frame) without any psychoacoustic decode — the probe pass
a 100 TB audio corpus runs before deciding what to really decode.

Scope: MPEG-1 Layer III, the bitrate/sample-rate index tables,
padding, ID3v2.3/2.4 skip via synchsafe size, ID3v1 detection.
Malformed structure raises ``ValueError``; Huffman/subband sample
decode raises ``NotImplementedError`` — the honest codec boundary.

Used by the ``mm_mp3_probe`` query, whose DuckDB oracle recomputes
every emitted field analytically from the generation parameters
(same contract as mm_mp4_probe / mm_ogg_probe).
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III tables (ISO 11172-3). Index 0 is "free format" and
# index 15 is forbidden — neither is generated or accepted here.
BITRATE_KBPS = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None)
SAMPLE_RATE_HZ = (44100, 48000, 32000, None)
SAMPLES_PER_FRAME = 1152


def _frame_len(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def _frame_header(bitrate_idx: int, rate_idx: int, padding: int) -> bytes:
    # sync(11) version=MPEG1(0b11) layer=III(0b01) no-crc(1) |
    # bitrate(4) samplerate(2) padding(1) private(0) |
    # mode=stereo(0b00) ... emphasis none
    b0 = 0xFF
    b1 = 0xFB  # 111 1101 1: MPEG-1, Layer III, protection off
    b2 = (bitrate_idx << 4) | (rate_idx << 2) | (padding << 1)
    b3 = 0x00
    return bytes([b0, b1, b2, b3])


def _synchsafe(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def encode_minimal_mp3(
    bitrate_idx: int,
    rate_idx: int,
    n_frames: int,
    id3v2_payload: bytes = b"",
    id3v1: bool = False,
) -> bytes:
    """Minimal-but-valid MPEG-1 Layer III stream: optional ID3v2 tag,
    ``n_frames`` frames (padding bit alternating so both frame lengths
    exercise), optional ID3v1 trailer. Frame bodies are deterministic
    filler — the parser never reads them, exactly like real probes."""
    br = BITRATE_KBPS[bitrate_idx]
    sr = SAMPLE_RATE_HZ[rate_idx]
    if br is None or sr is None:
        raise ValueError("free-format/forbidden bitrate or reserved sample rate")
    out = bytearray()
    if id3v2_payload:
        out += b"ID3" + bytes([4, 0, 0]) + _synchsafe(len(id3v2_payload)) + id3v2_payload
    for i in range(n_frames):
        padding = i & 1
        flen = _frame_len(br, sr, padding)
        body = bytes((i * 37 + j) % 256 for j in range(flen - 4))
        out += _frame_header(bitrate_idx, rate_idx, padding) + body
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Walk an MP3 stream; return ``{"n_frames", "bitrate_kbps",
    "sample_rate", "duration_ms", "has_id3v2", "has_id3v1",
    "audio_bytes"}``. CBR assumed (VBR would report per-frame)."""
    pos, end = 0, len(payload)
    has_id3v2 = False
    if payload[:3] == b"ID3":
        if end < 10:
            raise ValueError("truncated ID3v2 header")
        if any(b & 0x80 for b in payload[6:10]):
            raise ValueError("ID3v2 size bytes not synchsafe")
        size = (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
        pos = 10 + size
        has_id3v2 = True
        if pos > end:
            raise ValueError("ID3v2 tag overruns file")
    has_id3v1 = end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG"
    if has_id3v1:
        end -= 128
    n_frames, bitrate, sample_rate = 0, None, None
    while pos < end:
        if pos + 4 > end:
            raise ValueError("truncated frame header")
        h = struct.unpack_from(">I", payload, pos)[0]
        if h >> 21 != 0x7FF:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (h >> 19) & 0x3
        layer = (h >> 17) & 0x3
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError("only MPEG-1 Layer III is parsed here")
        br = BITRATE_KBPS[(h >> 12) & 0xF]
        sr = SAMPLE_RATE_HZ[(h >> 10) & 0x3]
        if br is None or sr is None:
            raise ValueError("free-format/forbidden bitrate or reserved sample rate")
        if bitrate is None:
            bitrate, sample_rate = br, sr
        elif (br, sr) != (bitrate, sample_rate):
            raise NotImplementedError("VBR streams not summarized (per-frame rates differ)")
        padding = (h >> 9) & 0x1
        flen = _frame_len(br, sr, padding)
        if pos + flen > end:
            raise ValueError("frame overruns file")
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("no MPEG frames found")
    return {
        "n_frames": n_frames,
        "bitrate_kbps": bitrate,
        "sample_rate": sample_rate,
        "duration_ms": n_frames * SAMPLES_PER_FRAME * 1000 // sample_rate,
        "has_id3v2": has_id3v2,
        "has_id3v1": has_id3v1,
        "audio_bytes": pos - (10 + ((payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]) if has_id3v2 else 0),
    }


def decode_mp3_samples(payload: bytes) -> list[int]:
    """PCM decode would need the full polyphase/IMDCT psychoacoustic
    pipeline — out of scope in this container, kept as an explicit
    boundary exactly like Ogg/Vorbis DSP."""
    raise NotImplementedError("MP3 sample decode (psychoacoustics) is stubbed in this environment")
