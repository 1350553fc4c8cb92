"""Pure-stdlib BMP (Windows DIB) codec: 24-bit BI_RGB and 8-bit
palettized BI_RLE8, both directions, top-down and bottom-up row
orders.

Completes the still-image codec matrix next to png.py / jpeg.py /
gif.py / tiff.py: BMP is the one mainstream raster container the
engine did not yet parse, and its quirks — bottom-up row order,
4-byte row stride padding, BGR channel order, BGRA palette quads,
and the RLE8 escape-code bytestream (end-of-line / end-of-bitmap /
absolute mode / delta) — are all real decode paths a 100 TB image
lake must handle. No third-party imaging library exists in this
environment, and none is needed: BMP is struct-packing.

The reference repo never decodes any media at all (its README
multimodal story is an unshipped benchmark); this module is
beyond-reference surface like the other codecs.
"""

from __future__ import annotations

import struct

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)

BI_RGB = 0
BI_RLE8 = 1


def _stride(width: int, bpp: int) -> int:
    return ((width * bpp + 31) // 32) * 4


def _rle8_encode_row(row: list[int]) -> bytes:
    """One row as encoded-mode RLE8 runs + end-of-line marker."""
    out = bytearray()
    i = 0
    while i < len(row):
        j = i
        while j < len(row) and j - i < 255 and row[j] == row[i]:
            j += 1
        out += bytes((j - i, row[i]))
        i = j
    out += b"\x00\x00"  # end of line
    return bytes(out)


def encode_bmp(
    width: int,
    height: int,
    pixels: list,
    *,
    topdown: bool = False,
    palette: list | None = None,
    rle8: bool = False,
) -> bytes:
    """Encode a top-down row-major image.

    ``palette is None``: 24-bit BI_RGB, ``pixels`` is a list of
    (r, g, b) tuples of length width*height. With a palette (list of
    (r, g, b), max 256 entries): 8-bit indexed, ``pixels`` is a list
    of indices; ``rle8`` selects BI_RLE8 compression (bottom-up only,
    per the format: RLE8 forbids top-down).
    """
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    if palette is None:
        bpp, n_colors, compression = 24, 0, BI_RGB
    else:
        if rle8 and topdown:
            raise ValueError("BI_RLE8 must be bottom-up")
        bpp, n_colors = 8, len(palette)
        compression = BI_RLE8 if rle8 else BI_RGB
    rows = [pixels[y * width : (y + 1) * width] for y in range(height)]
    if not topdown:
        rows = rows[::-1]  # file stores bottom row first
    if compression == BI_RLE8:
        body = b"".join(_rle8_encode_row([int(v) for v in row]) for row in rows)
        body = body[:-2] + b"\x00\x01"  # last EOL becomes end-of-bitmap
    else:
        stride = _stride(width, bpp)
        out = bytearray()
        for row in rows:
            if bpp == 24:
                raw = b"".join(bytes((b_, g, r)) for r, g, b_ in row)  # BGR
            else:
                raw = bytes(int(v) for v in row)
            out += raw + b"\x00" * (stride - len(raw))
        body = bytes(out)
    pal_bytes = (
        b"".join(bytes((b_, g, r, 0)) for r, g, b_ in palette) if palette else b""
    )
    offset = _FILE_HDR.size + _INFO_HDR.size + len(pal_bytes)
    info = _INFO_HDR.pack(
        _INFO_HDR.size,
        width,
        -height if topdown else height,
        1,
        bpp,
        compression,
        len(body),
        2835,  # 72 DPI in pixels/metre, both axes
        2835,
        n_colors,
        0,
    )
    file_hdr = _FILE_HDR.pack(b"BM", offset + len(body), 0, 0, offset)
    return file_hdr + info + pal_bytes + body


def decode_bmp(data: bytes) -> dict:
    """Decode to a dict with width/height/bpp/topdown/compression and
    ``pixels``: top-down row-major (r, g, b) tuples (palette entries
    resolved). Supports 24-bit BI_RGB and 8-bit BI_RGB / BI_RLE8
    (encoded runs, absolute mode, end-of-line, end-of-bitmap, delta)."""
    magic, _file_size, _r1, _r2, offset = _FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP stream")
    (
        hdr_size,
        width,
        raw_height,
        planes,
        bpp,
        compression,
        _size_image,
        _xppm,
        _yppm,
        clr_used,
        _clr_important,
    ) = _INFO_HDR.unpack_from(data, _FILE_HDR.size)
    if hdr_size < _INFO_HDR.size or planes != 1:
        raise ValueError("unsupported DIB header")
    if bpp not in (8, 24) or compression not in (BI_RGB, BI_RLE8):
        raise ValueError(f"unsupported bpp/compression: {bpp}/{compression}")
    topdown = raw_height < 0
    height = -raw_height if topdown else raw_height
    palette = []
    if bpp == 8:
        n = clr_used or 256
        pal_off = _FILE_HDR.size + hdr_size
        for i in range(n):
            b_, g, r = data[pal_off + 4 * i : pal_off + 4 * i + 3]
            palette.append((r, g, b_))
    if compression == BI_RLE8:
        if topdown:
            raise ValueError("BI_RLE8 must be bottom-up")
        grid = _decode_rle8(data[offset:], width, height)
    else:
        stride = _stride(width, bpp)
        grid = []
        for y in range(height):
            rowb = data[offset + y * stride : offset + y * stride + stride]
            if bpp == 24:
                grid.append(
                    [
                        (rowb[3 * x + 2], rowb[3 * x + 1], rowb[3 * x])
                        for x in range(width)
                    ]
                )
            else:
                grid.append([rowb[x] for x in range(width)])
    if not topdown:
        grid = grid[::-1]
    if bpp == 8:
        pixels = [palette[v] for row in grid for v in row]
    else:
        pixels = [px for row in grid for px in row]
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "topdown": topdown,
        "compression": compression,
        "n_palette": len(palette),
        "pixels": pixels,
    }


def _decode_rle8(body: bytes, width: int, height: int) -> list[list[int]]:
    """RLE8 bytestream -> bottom-up-ordered index grid (file order).

    Every write and cursor move is bounds-checked against the declared
    width/height so a hostile stream raises ValueError (the module's
    error contract) instead of growing rows past ``width`` via slice
    assignment or escaping with a bare IndexError.
    """
    grid = [[0] * width for _ in range(height)]
    x = y = i = 0
    while i + 1 < len(body):
        n, v = body[i], body[i + 1]
        i += 2
        if n > 0:  # encoded run
            if y >= height or x + n > width:
                raise ValueError("RLE8 run crosses row/image bounds")
            grid[y][x : x + n] = [v] * n
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y > height:
                raise ValueError("RLE8 end-of-line past last row")
        elif v == 1:  # end of bitmap
            return grid
        elif v == 2:  # delta: move cursor right/up in file order
            if i + 1 >= len(body):
                raise ValueError("RLE8 delta truncated")
            x += body[i]
            y += body[i + 1]
            i += 2
            if x > width or y >= height:
                raise ValueError("RLE8 delta moves cursor out of bounds")
        else:  # absolute mode: v literal bytes, word-aligned
            if i + v > len(body):
                raise ValueError("RLE8 absolute block truncated")
            if y >= height or x + v > width:
                raise ValueError("RLE8 absolute block crosses row/image bounds")
            grid[y][x : x + v] = list(body[i : i + v])
            x += v
            i += v + (v & 1)
    raise ValueError("RLE8 stream ended without end-of-bitmap")
