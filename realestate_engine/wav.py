"""Pure-stdlib RIFF/WAVE PCM codec (encode + decode).

Closes the last *container-level* audio stub: RIFF/WAVE with integer
PCM payloads is plain struct unpacking, so gating it behind
``NotImplementedError`` (multimodal.py:401 before round 6) was an
unnecessarily wide boundary. Entropy-coded audio (FLAC, Ogg/Vorbis,
MP3) stays honestly stubbed — those need real codec libraries that are
not in this container.

Scope: canonical PCM, 8-bit unsigned / 16-bit signed little-endian,
1..8 channels, arbitrary non-data chunks (LIST/INFO metadata etc.)
before or after the data chunk, RIFF even-byte chunk padding. Decode
is a strict chunk walk: truncated or malformed containers raise
``ValueError``; non-PCM formats (IEEE float, ADPCM, extensible) raise
``NotImplementedError`` so callers can tell "broken file" from
"unsupported codec".

Used by ``multimodal.extract_audio_features`` (RIFF payloads now
decode for real) and the ``mm_wav_roundtrip`` query, whose DuckDB
oracle recomputes the generated waveform analytically — a pass proves
encode→decode inverted bit-exactly on every (bits, channels, rate,
metadata-chunk) combination.
"""

from __future__ import annotations

import struct

_PCM_FORMAT = 1


def encode_wav(
    sample_rate: int,
    channels: int,
    bits: int,
    samples: list[int],
    info_chunks: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    """Encode interleaved signed integer samples as a PCM WAV blob.

    ``samples`` is frame-major interleaved (f0c0, f0c1, f1c0, ...);
    8-bit samples are signed [-128, 127] here and stored unsigned per
    the WAV convention. ``info_chunks`` are extra (fourcc, payload)
    chunks written BEFORE the data chunk — decoders must skip them.
    """
    if bits not in (8, 16):
        raise NotImplementedError(f"PCM{bits} encode not supported (8/16 only)")
    if not 1 <= channels <= 8:
        raise ValueError(f"channels out of range: {channels}")
    if len(samples) % channels:
        raise ValueError("sample count is not a whole number of frames")
    if bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        data = struct.pack(f"<{len(samples)}h", *samples)

    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", _PCM_FORMAT, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    body = bytearray(b"WAVE")
    chunks: list[tuple[bytes, bytes]] = [(b"fmt ", fmt)]
    chunks += list(info_chunks or [])
    chunks.append((b"data", data))
    for fourcc, payload in chunks:
        body += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:  # RIFF chunks are padded to even offsets
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def decode_wav(payload: bytes) -> dict:
    """Decode a PCM WAV blob into params + interleaved signed samples.

    Returns ``{"sample_rate", "channels", "bits", "n_frames",
    "samples"}`` where samples are frame-major interleaved signed ints
    (8-bit rebased from unsigned storage). Walks the chunk list
    strictly: unknown chunks are skipped via their declared (padded)
    size, so metadata-bearing files decode identically to bare ones.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    declared = struct.unpack_from("<I", payload, 4)[0]
    if declared + 8 > len(payload):
        raise ValueError("truncated RIFF container")

    fmt: dict | None = None
    data: bytes | None = None
    pos = 12
    end = 8 + declared
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body_at = pos + 8
        if body_at + size > end:
            raise ValueError(f"truncated chunk {fourcc!r}")
        if fourcc == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            audio_format, channels, sample_rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload, body_at
            )
            if audio_format != _PCM_FORMAT:
                raise NotImplementedError(f"non-PCM WAV (format {audio_format}) not supported")
            if bits not in (8, 16):
                raise NotImplementedError(f"PCM{bits} decode not supported (8/16 only)")
            fmt = {"sample_rate": sample_rate, "channels": channels, "bits": bits}
        elif fourcc == b"data":
            data = payload[body_at : body_at + size]
        pos = body_at + size + (size % 2)  # skip pad byte

    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    bits, channels = fmt["bits"], fmt["channels"]
    if bits == 8:
        samples = [b - 128 for b in data]
    else:
        if len(data) % 2:
            raise ValueError("odd PCM16 data length")
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    if len(samples) % channels:
        raise ValueError("data length is not a whole number of frames")
    return {**fmt, "n_frames": len(samples) // channels, "samples": samples}
