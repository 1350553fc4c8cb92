"""Pure-stdlib RIFF/AVI Motion-JPEG container codec (encode + decode).

Closes the video-frame gap honestly: an AVI with 'MJPG' streams is a
RIFF container (like WAV) whose '00dc' chunks are ordinary baseline
JPEGs — and this repo already ships a REAL baseline-DCT JPEG codec
(jpeg.py, round 5). Composing the two gives true end-to-end video
decode: container walk -> per-frame entropy decode -> pixels. What
remains stubbed after this is only INTER-frame video (H.264 etc.,
which needs motion compensation state), a boundary multimodal.py
documents.

Scope: single 'vids' stream, 'MJPG' handler, BITMAPINFOHEADER strf,
mandatory idx1 index (AVIF_HASINDEX), even-byte chunk padding. Decode
is a strict walk: bad fourccs, truncated lists, size mismatches, or
an idx1 entry that disagrees with the actual chunk layout raise
``ValueError``; non-MJPG handlers raise ``NotImplementedError`` so
callers can tell broken from unsupported.

Used by ``mm_mjpeg_avi`` (multimodal.py), whose oracle states the
analytic header facts and reconstruction bounds; pytest drives the
error paths and index consistency.
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(width: int, height: int, fps: int, frames: list[bytes]) -> bytes:
    """Encode JPEG blobs as a single-stream MJPG AVI with an idx1."""
    if fps <= 0 or not frames:
        raise ValueError("avi: need fps > 0 and at least one frame")
    n = len(frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # us per frame
            0,                 # max bytes/sec (advisory)
            0,                 # padding granularity
            _AVIF_HASINDEX,
            n, 0, 1, 0,        # total frames, initial frames, streams, sug. buffer
            width, height,
            0, 0, 0, 0,        # reserved
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<10I4H", 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0, 0, 0, width, height),
    )
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                    width * height * 3, 0, 0, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_chunks = []
    idx_entries = []
    offset = 4  # idx1 offsets are relative to the 'movi' fourcc
    for fr in frames:
        ck = _chunk(b"00dc", fr)
        movi_chunks.append(ck)
        idx_entries.append(struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, offset, len(fr)))
        offset += len(ck)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_chunks(buf: bytes, start: int, end: int):
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("avi: truncated chunk header")
        fourcc = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(f"avi: chunk {fourcc!r} overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size % 2)


def decode_avi_mjpeg(blob: bytes) -> dict:
    """Strict AVI walk. Returns header facts, the JPEG frame blobs in
    stream order, and whether idx1 matches the actual chunk layout."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("avi: bad RIFF/AVI signature")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    if 8 + riff_size > len(blob):
        raise ValueError("avi: RIFF size overruns the blob")
    avih = strh = strf = None
    handler = None
    movi_span = None
    idx_raw = None
    for fourcc, body, size in _walk_chunks(blob, 12, 8 + riff_size):
        if fourcc == b"LIST":
            kind = blob[body : body + 4]
            if kind == b"hdrl":
                for f2, b2, s2 in _walk_chunks(blob, body + 4, body + size):
                    if f2 == b"avih":
                        avih = struct.unpack_from("<14I", blob, b2)
                    elif f2 == b"LIST" and blob[b2 : b2 + 4] == b"strl":
                        for f3, b3, s3 in _walk_chunks(blob, b2 + 4, b2 + s2):
                            if f3 == b"strh":
                                if blob[b3 : b3 + 4] != b"vids":
                                    raise ValueError("avi: first stream is not video")
                                handler = blob[b3 + 4 : b3 + 8]
                                strh = struct.unpack_from("<10I", blob, b3 + 8)
                            elif f3 == b"strf":
                                strf = struct.unpack_from("<IiiHH4s", blob, b3)
            elif kind == b"movi":
                movi_span = (body, body + size)
        elif fourcc == b"idx1":
            idx_raw = blob[body : body + size]
    if avih is None or strh is None or strf is None:
        raise ValueError("avi: missing avih/strh/strf headers")
    if movi_span is None:
        raise ValueError("avi: missing movi list")
    if handler != b"MJPG" or strf[5] != b"MJPG":
        raise NotImplementedError(f"avi: unsupported codec {handler!r}")
    frames = []
    offsets = []
    for fourcc, body, size in _walk_chunks(blob, movi_span[0] + 4, movi_span[1]):
        if fourcc == b"00dc":
            fr = blob[body : body + size]
            if fr[:2] != b"\xff\xd8":
                raise ValueError("avi: 00dc chunk is not a JPEG (no SOI)")
            frames.append(fr)
            offsets.append((body - 8 - movi_span[0], size))
    if avih[4] != len(frames) or strh[6] != len(frames):
        raise ValueError("avi: frame count disagrees with headers")
    idx_consistent = False
    if idx_raw is not None and len(idx_raw) == 16 * len(frames):
        idx_consistent = all(
            struct.unpack_from("<4sIII", idx_raw, 16 * i)
            == (b"00dc", _AVIIF_KEYFRAME, offsets[i][0], offsets[i][1])
            for i in range(len(frames))
        )
    return {
        "width": avih[8],
        "height": avih[9],
        "us_per_frame": avih[0],
        "fps": strh[4] // max(strh[3], 1),
        "n_frames": len(frames),
        "frames": frames,
        "idx_consistent": idx_consistent,
        "has_index_flag": bool(avih[3] & _AVIF_HASINDEX),
    }
