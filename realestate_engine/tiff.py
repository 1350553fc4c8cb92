"""Pure-stdlib baseline-TIFF codec (encode + strict IFD decode).

The image-METADATA counterpart of the pixel codecs: TIFF's IFD
structure is also the container of EXIF blocks inside JPEG (the APP1
payload is a TIFF), so a correct IFD walk — both byte orders, the
value-or-offset rule, typed tag entries — is the load-bearing piece
of every "read the orientation/timestamp before decoding pixels"
pipeline step.

Scope: classic TIFF (magic 42), one IFD, uncompressed single-strip
8-bit grayscale pixel data, tags ImageWidth/ImageLength/BitsPerSample/
Compression/Orientation/Make/DateTime/StripOffsets/StripByteCounts,
both 'II' (little) and 'MM' (big) byte orders. Decode is strict:
wrong magic, truncated IFDs, entry counts that overrun, or strip
geometry that disagrees with the pixel payload raise ``ValueError``.
BigTIFF (magic 43) raises ``NotImplementedError``.

Used by ``mm_tiff_probe`` (multimodal.py) whose oracle recomputes all
parsed fields analytically from the generation recipe.
"""

from __future__ import annotations

import struct

_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG = 1, 2, 3, 4

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_MAKE = 271
_TAG_STRIP_OFFSETS = 273
_TAG_ORIENTATION = 274
_TAG_DATETIME = 306
_TAG_STRIP_COUNTS = 279


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    orientation: int = 1,
    make: str = "realestate_engine",
    datetime_str: str = "2024:01:01 00:00:00",
    big_endian: bool = False,
) -> bytes:
    """Single-strip 8-bit grayscale classic TIFF, chosen byte order."""
    if len(pixels) != width * height:
        raise ValueError("tiff: pixels length != width*height")
    bo = ">" if big_endian else "<"
    make_b = make.encode() + b"\x00"
    dt_b = datetime_str.encode() + b"\x00"
    if len(dt_b) != 20:
        raise ValueError("tiff: DateTime must be exactly 19 chars + NUL")
    entries = []  # (tag, type, count, inline_value or ('ptr', payload))
    entries.append((_TAG_WIDTH, _T_LONG, 1, width))
    entries.append((_TAG_LENGTH, _T_LONG, 1, height))
    entries.append((_TAG_BITS, _T_SHORT, 1, 8))
    entries.append((_TAG_COMPRESSION, _T_SHORT, 1, 1))
    entries.append((_TAG_MAKE, _T_ASCII, len(make_b), ("ptr", make_b)))
    entries.append((_TAG_STRIP_OFFSETS, _T_LONG, 1, ("strip",)))
    entries.append((_TAG_ORIENTATION, _T_SHORT, 1, orientation))
    entries.append((_TAG_STRIP_COUNTS, _T_LONG, 1, len(pixels)))
    entries.append((_TAG_DATETIME, _T_ASCII, len(dt_b), ("ptr", dt_b)))
    entries.sort(key=lambda e: e[0])  # spec: ascending tag order
    header = struct.pack(f"{bo}2sHI", b"MM" if big_endian else b"II", 42, 8)
    ifd_start = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ptr_area = ifd_start + ifd_size
    ptrs = []
    pos = ptr_area
    for e in entries:
        # spec: values whose total size fits in 4 bytes are stored
        # INLINE in the value slot, never behind an offset
        if isinstance(e[3], tuple) and e[3][0] == "ptr" and len(e[3][1]) > 4:
            ptrs.append((e, pos))
            pos += len(e[3][1]) + (len(e[3][1]) % 2)
    strip_at = pos
    out = bytearray(header)
    out.extend(struct.pack(f"{bo}H", len(entries)))
    for e in entries:
        tag, typ, cnt, val = e
        if isinstance(val, tuple) and val[0] == "ptr":
            if len(val[1]) <= 4:
                out.extend(struct.pack(f"{bo}HHI", tag, typ, cnt))
                out.extend(val[1].ljust(4, b"\x00"))
            else:
                at = next(p for ee, p in ptrs if ee is e)
                out.extend(struct.pack(f"{bo}HHII", tag, typ, cnt, at))
        elif isinstance(val, tuple) and val[0] == "strip":
            out.extend(struct.pack(f"{bo}HHII", tag, typ, cnt, strip_at))
        elif typ == _T_SHORT:
            # SHORT inline values sit in the FIRST two bytes of the slot
            out.extend(struct.pack(f"{bo}HHI", tag, typ, cnt))
            out.extend(struct.pack(f"{bo}HH", val, 0))
        else:
            out.extend(struct.pack(f"{bo}HHII", tag, typ, cnt, val))
    out.extend(struct.pack(f"{bo}I", 0))  # next-IFD pointer: none
    for e, _at in ptrs:
        payload = e[3][1]
        out.extend(payload)
        if len(payload) % 2:
            out.append(0)
    out.extend(pixels)
    return bytes(out)


def decode_tiff(blob: bytes) -> dict:
    """Strict classic-TIFF parse; returns header facts and pixels."""
    if len(blob) < 8:
        raise ValueError("tiff: truncated header")
    if blob[:2] == b"II":
        bo = "<"
    elif blob[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    magic, ifd_off = struct.unpack_from(f"{bo}HI", blob, 2)
    if magic == 43:
        raise NotImplementedError("tiff: BigTIFF out of scope")
    if magic != 42:
        raise ValueError("tiff: bad magic")
    if ifd_off + 2 > len(blob):
        raise ValueError("tiff: IFD offset overruns")
    (n,) = struct.unpack_from(f"{bo}H", blob, ifd_off)
    if ifd_off + 2 + 12 * n + 4 > len(blob):
        raise ValueError("tiff: IFD entries overrun")
    tags: dict[int, object] = {}
    for i in range(n):
        at = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(f"{bo}HHI", blob, at)
        if typ == _T_SHORT and cnt == 1:
            (v,) = struct.unpack_from(f"{bo}H", blob, at + 8)
            tags[tag] = v
        elif typ == _T_LONG and cnt == 1:
            (v,) = struct.unpack_from(f"{bo}I", blob, at + 8)
            tags[tag] = v
        elif typ == _T_ASCII:
            (off,) = struct.unpack_from(f"{bo}I", blob, at + 8)
            if cnt <= 4:
                raw = blob[at + 8 : at + 8 + cnt]
            else:
                if off + cnt > len(blob):
                    raise ValueError("tiff: ASCII value overruns")
                raw = blob[off : off + cnt]
            tags[tag] = raw.rstrip(b"\x00").decode()
        else:
            raise ValueError(f"tiff: unsupported type {typ} for tag {tag}")
    for req in (_TAG_WIDTH, _TAG_LENGTH, _TAG_STRIP_OFFSETS, _TAG_STRIP_COUNTS):
        if req not in tags:
            raise ValueError(f"tiff: missing required tag {req}")
    w, h = tags[_TAG_WIDTH], tags[_TAG_LENGTH]
    off, cnt = tags[_TAG_STRIP_OFFSETS], tags[_TAG_STRIP_COUNTS]
    if cnt != w * h:
        raise ValueError("tiff: strip byte count disagrees with dimensions")
    if off + cnt > len(blob):
        raise ValueError("tiff: strip overruns the blob")
    return {
        "width": w,
        "height": h,
        "bits": tags.get(_TAG_BITS, 1),
        "orientation": tags.get(_TAG_ORIENTATION, 1),
        "make": tags.get(_TAG_MAKE, ""),
        "datetime": tags.get(_TAG_DATETIME, ""),
        "big_endian": bo == ">",
        "n_ifd_entries": n,
        "pixels": blob[off : off + cnt],
    }
