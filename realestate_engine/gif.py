"""Pure-stdlib GIF87a/GIF89a codec (encode + decode).

Extends the real-codec matrix (PNG, baseline/progressive/lossless
JPEG, WAV, FLAC) with the last classic raster format: GIF with its
variable-width LSB-first LZW entropy coder — a genuinely different
compression family from PNG's DEFLATE and JPEG's Huffman/DCT, so the
round trip exercises new machinery: dynamic dictionary growth, code
width escalation (3..12 bits), the 4096-entry CLEAR/reset protocol,
sub-block framing, and the 4-pass row interlace permutation.

Scope: global color table only (2..256 colors), one image per file,
GIF87a plain or GIF89a with a Graphic Control Extension, interlaced
and sequential row order. Decode is strict: bad signature, truncated
blocks, out-of-range LZW codes, or pixel-count mismatches raise
``ValueError``. Animation (multiple frames) and local color tables
are out of scope — the single-frame path covers every coding-layer
branch; a second frame re-runs identical code.

Used by the ``mm_gif_roundtrip`` query, whose DuckDB oracle
recomputes the deterministic pixel field analytically — a pass proves
encode→LZW→decode inverted exactly on every (size, palette, interlace,
89a) combination, including dictionary growth past each width step.
"""

from __future__ import annotations

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXT_INTRO = 0x21
_GCE_LABEL = 0xF9
_MAX_CODE = 4096


def _interlace_rows(height: int) -> list[int]:
    """GIF 4-pass interlace: the file stores rows in this order."""
    rows: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, height, step))
    return rows


class _BitWriter:
    """LSB-first bit packer (the GIF/LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> bytes:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW: CLEAR first, grow width when the NEXT code
    would not fit, CLEAR + reset at the 4096-entry cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()

    def fresh() -> dict[tuple[int, ...], int]:
        return {(i,): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    w.write(clear, width)
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        w.write(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= _MAX_CODE:
            w.write(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (idx,)
    if buf:
        w.write(table[buf], width)
        # The decoder reconstructs one table entry for EVERY data code
        # after the first — including this final one, which the encoder
        # never inserts (no successor symbol exists). Mirror that
        # phantom insert's width-growth check, or an EOI landing
        # exactly on a table-full boundary is written one bit narrower
        # than the decoder reads it.
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
    w.write(eoi, width)
    return w.flush()


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    """Strict inverse: standard table reconstruction including the
    cScSc (code == next_code) case; raises on out-of-range codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit cursor
    total_bits = len(data) * 8
    width = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    prev: tuple[int, ...] | None = None
    out: list[int] = []

    def read() -> int:
        nonlocal pos
        if pos + width > total_bits:
            raise ValueError("gif: truncated LZW stream")
        end = (pos + width + 7) // 8
        chunk = int.from_bytes(data[pos // 8 : end], "little")
        code = (chunk >> (pos % 8)) & ((1 << width) - 1)
        pos += width
        return code

    while True:
        code = read()
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out.extend(entry)
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("gif: more pixels than the image descriptor declares")
    if len(out) != n_expected:
        raise ValueError("gif: pixel count mismatch")
    return out


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: list[int],
    interlace: bool = False,
    gif89: bool = False,
) -> bytes:
    """Encode one indexed-color frame. Palette size must be a power of
    two in 2..256; ``indices`` is row-major top-to-bottom."""
    n = len(palette)
    if n < 2 or n > 256 or n & (n - 1):
        raise ValueError("gif: palette size must be a power of two in 2..256")
    if len(indices) != width * height:
        raise ValueError("gif: indices length != width*height")
    if any(i < 0 or i >= n for i in indices):
        raise ValueError("gif: index out of palette range")
    gct_bits = max(1, n.bit_length() - 1)
    out = bytearray(b"GIF89a" if gif89 else b"GIF87a")
    out.extend(width.to_bytes(2, "little"))
    out.extend(height.to_bytes(2, "little"))
    out.append(0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1))  # GCT flag/size
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio
    for r, g, b in palette:
        out.extend((r, g, b))
    if gif89:
        out.extend((_EXT_INTRO, _GCE_LABEL, 4, 0x04, 0x0A, 0x00, 0x00, 0x00))
    out.append(_IMAGE_SEP)
    out.extend((0).to_bytes(2, "little"))  # left
    out.extend((0).to_bytes(2, "little"))  # top
    out.extend(width.to_bytes(2, "little"))
    out.extend(height.to_bytes(2, "little"))
    out.append(0x40 if interlace else 0x00)  # no LCT
    stored = indices
    if interlace:
        stored = []
        for row in _interlace_rows(height):
            stored.extend(indices[row * width : (row + 1) * width])
    min_code_size = max(2, gct_bits)
    out.append(min_code_size)
    out.extend(_sub_blocks(_lzw_encode(stored, min_code_size)))
    out.append(_TRAILER)
    return bytes(out)


def decode_gif(blob: bytes) -> dict:
    """Strict single-frame decode. Returns width/height/palette/pixels
    (row-major, de-interlaced) plus the parsed flags."""
    if len(blob) < 13:
        raise ValueError("gif: truncated header")
    sig = blob[:6]
    if sig not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw = int.from_bytes(blob[6:8], "little")
    sh = int.from_bytes(blob[8:10], "little")
    packed = blob[10]
    if not packed & 0x80:
        raise ValueError("gif: global color table required in this scope")
    gct_n = 2 << (packed & 0x07)
    pos = 13
    if pos + 3 * gct_n > len(blob):
        raise ValueError("gif: truncated global color table")
    palette = [tuple(blob[pos + 3 * i : pos + 3 * i + 3]) for i in range(gct_n)]
    pos += 3 * gct_n
    has_gce = False
    while True:
        if pos >= len(blob):
            raise ValueError("gif: missing trailer")
        b0 = blob[pos]
        if b0 == _EXT_INTRO:
            if pos + 2 > len(blob):
                raise ValueError("gif: truncated extension")
            has_gce = has_gce or blob[pos + 1] == _GCE_LABEL
            pos += 2
            while True:  # skip sub-blocks
                if pos >= len(blob):
                    raise ValueError("gif: truncated extension sub-blocks")
                sz = blob[pos]
                pos += 1 + sz
                if sz == 0:
                    break
        elif b0 == _IMAGE_SEP:
            break
        elif b0 == _TRAILER:
            raise ValueError("gif: trailer before any image")
        else:
            raise ValueError(f"gif: unexpected block 0x{b0:02x}")
    if pos + 10 > len(blob):
        raise ValueError("gif: truncated image descriptor")
    iw = int.from_bytes(blob[pos + 5 : pos + 7], "little")
    ih = int.from_bytes(blob[pos + 7 : pos + 9], "little")
    ipacked = blob[pos + 9]
    if ipacked & 0x80:
        raise NotImplementedError("gif: local color tables out of scope")
    interlaced = bool(ipacked & 0x40)
    pos += 10
    if pos >= len(blob):
        raise ValueError("gif: missing LZW min code size")
    min_code_size = blob[pos]
    if not 2 <= min_code_size <= 11:
        raise ValueError("gif: bad LZW min code size")
    pos += 1
    payload = bytearray()
    while True:
        if pos >= len(blob):
            raise ValueError("gif: truncated image data")
        sz = blob[pos]
        pos += 1
        if sz == 0:
            break
        if pos + sz > len(blob):
            raise ValueError("gif: truncated image sub-block")
        payload.extend(blob[pos : pos + sz])
        pos += sz
    if pos >= len(blob) or blob[pos] != _TRAILER:
        raise ValueError("gif: missing trailer")
    stored = _lzw_decode(bytes(payload), min_code_size, iw * ih)
    if interlaced:
        pixels = [0] * (iw * ih)
        for file_row, img_row in enumerate(_interlace_rows(ih)):
            pixels[img_row * iw : (img_row + 1) * iw] = stored[
                file_row * iw : (file_row + 1) * iw
            ]
    else:
        pixels = stored
    return {
        "width": iw,
        "height": ih,
        "screen_width": sw,
        "screen_height": sh,
        "palette": palette,
        "pixels": pixels,
        "interlaced": interlaced,
        "gif89": sig == b"GIF89a",
        "has_gce": has_gce,
    }
