"""Pure-stdlib ISO-BMFF (MP4) box parser + minimal writer.

The video-side counterpart of wav.py: an MP4 container is a tree of
[size][fourcc][payload] boxes — walking it is plain struct unpacking,
so container-level metadata (brand, movie timescale/duration, payload
bytes) needs no codec. This is the ffprobe-before-decode pass a 100 TB
video corpus runs first: route/filter/dedup on container facts, decode
frames (stubbed here — real codecs aren't in this container) only for
the rows that survive.

Scope: top-level box walk with 32-bit, 64-bit (size==1 + largesize),
and to-end (size==0) box sizes; recursion into ``moov``; ``mvhd``
version 0 (32-bit times) and version 1 (64-bit times). Malformed
structure raises ``ValueError``; compressed movie boxes (``cmov``)
raise ``NotImplementedError`` — a real but rare variant that needs
zlib-on-moov plumbing, kept as an explicit boundary.

Used by the ``mm_mp4_probe`` query, whose DuckDB oracle recomputes
every emitted field analytically from the generation parameters.
"""

from __future__ import annotations

import struct


def _box(fourcc: bytes, payload: bytes, extended: bool = False) -> bytes:
    if extended:
        return struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def encode_minimal_mp4(
    timescale: int,
    duration: int,
    mdat_payload: bytes,
    mvhd_version: int = 0,
    extended_mdat: bool = False,
) -> bytes:
    """Minimal-but-valid ISO-BMFF: ftyp + moov(mvhd) + mdat."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    if mvhd_version == 0:
        body = struct.pack(">B3xIIII", 0, 0, 0, timescale, duration)
    elif mvhd_version == 1:
        body = struct.pack(">B3xQQIQ", 1, 0, 0, timescale, duration)
    else:
        raise ValueError(f"mvhd version {mvhd_version} not a thing")
    # rate 1.0, volume 1.0, reserved, unity matrix, predefineds, next track id
    body += struct.pack(">iH2x8x9i6I", 0x00010000, 0x0100, *([0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000][i] for i in range(9)), 0, 0, 0, 0, 0, 2)
    moov = _box(b"moov", _box(b"mvhd", body))
    mdat = _box(b"mdat", mdat_payload, extended=extended_mdat)
    return ftyp + moov + mdat


def parse_mp4_boxes(payload: bytes) -> dict:
    """Walk an ISO-BMFF container; return
    ``{"brand", "n_boxes", "box_types", "timescale", "duration",
    "mdat_bytes"}`` (n_boxes counts top-level boxes only)."""
    if len(payload) < 8:
        raise ValueError("not an ISO-BMFF container (too short)")

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos < end:
            if pos + 8 > end:
                raise ValueError("truncated box header")
            size = struct.unpack_from(">I", buf, pos)[0]
            fourcc = buf[pos + 4 : pos + 8]
            body_at = pos + 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("truncated largesize header")
                size = struct.unpack_from(">Q", buf, pos + 8)[0]
                body_at = pos + 16
            elif size == 0:
                size = end - pos
            if size < body_at - pos or pos + size > end:
                raise ValueError(f"box {fourcc!r} overruns container")
            yield fourcc, body_at, pos + size
            pos += size

    out: dict = {"brand": None, "n_boxes": 0, "box_types": [], "timescale": None, "duration": None, "mdat_bytes": 0}
    for fourcc, body_at, box_end in walk(payload, 0, len(payload)):
        out["n_boxes"] += 1
        out["box_types"].append(fourcc.decode("latin1"))
        if fourcc == b"ftyp":
            out["brand"] = payload[body_at : body_at + 4].decode("latin1")
        elif fourcc == b"mdat":
            out["mdat_bytes"] = box_end - body_at
        elif fourcc == b"moov":
            for fc2, b2, e2 in walk(payload, body_at, box_end):
                if fc2 == b"cmov":
                    raise NotImplementedError("compressed moov (cmov) not supported")
                if fc2 == b"mvhd":
                    version = payload[b2]
                    if version == 0:
                        _, _, ts, dur = struct.unpack_from(">4x" + "IIII", payload, b2)
                    elif version == 1:
                        _, _, ts, dur = struct.unpack_from(">4x" + "QQIQ", payload, b2)
                    else:
                        raise NotImplementedError(f"mvhd version {version} not supported")
                    out["timescale"], out["duration"] = ts, dur
    if out["timescale"] is None:
        raise ValueError("missing moov/mvhd")
    return out
