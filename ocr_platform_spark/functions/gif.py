"""Pure-stdlib GIF codec (87a/89a): palette + LZW, first frame.

Closes the last common-web-image stub in the multimodal family (PNG and
baseline JPEG are already real — functions/png.py, functions/jpeg.py).
The encoder exists to synthesize deterministic test payloads (datagen):
it quantizes RGB to the fixed 3-3-2 palette (grayscale maps through the
same palette), so encode→decode is exactly reproducible in pure Python —
the fixture-oracle property every codec here must have. The decoder
handles what the format commonly carries: global/local color tables,
extension blocks (skipped), LZW image data with full code-table
growth/reset semantics, interlaced row order (appendix-E four-pass).
Animation beyond the first frame is out of scope (first frame decoded,
rest ignored — the feature-extraction contract).

Reference seam: the rasterization path (apps/queue/src/lib/ocr.ts:56-71)
— image bytes → pixels; GIF is the third format a web crawl actually
contains.
"""

from __future__ import annotations

MAX_PIXELS = 4 << 20            # same poison-pill cap as png.py


class GifError(ValueError):
    """Stable, library-independent GIF parse failure."""


# fixed 3-3-2 palette: index = (r>>5)<<5 | (g>>5)<<2 | b>>6
def _palette_332() -> bytes:
    out = bytearray()
    for i in range(256):
        r = (i >> 5) & 7
        g = (i >> 2) & 7
        b = i & 3
        out += bytes(((r * 255) // 7, (g * 255) // 7, (b * 255) // 3))
    return bytes(out)


_PALETTE = _palette_332()


def quantize_332(w: int, h: int, channels: int, px: bytes) -> bytes:
    """Pixel indices into the 3-3-2 palette (gray/RGB/RGBA accepted;
    alpha is dropped — GIF has no partial transparency)."""
    idx = bytearray(w * h)
    for p in range(w * h):
        if channels == 1:
            r = g = b = px[p]
        else:
            r, g, b = px[p * channels:p * channels + 3]
        idx[p] = ((r >> 5) << 5) | ((g >> 5) << 2) | (b >> 6)
    return bytes(idx)


# ---------------------------------------------------------------- LZW

def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    buf = b""
    for byte in indices:
        nxt = buf + bytes([byte])
        if nxt in table:
            buf = nxt
        else:
            emit(table[buf])
            table[nxt] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
            elif next_code >= 4096:
                emit(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                width = min_code_size + 1
            buf = bytes([byte])
    if buf:
        emit(table[buf])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_out: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while len(out) < n_out:
        while nbits < width:
            if pos >= n:
                raise GifError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifError("bad LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_out:
        raise GifError("LZW stream ended early")
    return bytes(out[:n_out])


# ---------------------------------------------------------------- encode

def encode_gif(w: int, h: int, channels: int, px: bytes) -> bytes:
    """Deterministic GIF89a: fixed 3-3-2 global palette, one
    non-interlaced frame of the quantized pixels."""
    if len(px) != w * h * channels:
        raise GifError("pixel buffer size mismatch")
    indices = quantize_332(w, h, channels, px)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes((0xF7, 0, 0))          # GCT present, 8-bit, 256 entries
    out += _PALETTE
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") \
        + h.to_bytes(2, "little") + b"\x00"
    out.append(8)                        # LZW min code size
    lzw = _lzw_encode(indices)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"                   # block terminator + trailer
    return bytes(out)


# ---------------------------------------------------------------- decode

def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """First frame of a GIF → (width, height, 3, RGB bytes)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    gct: bytes | None = None
    if flags & 0x80:
        size = 2 << (flags & 7)
        gct = data[pos:pos + 3 * size]
        if len(gct) < 3 * size:
            raise GifError("truncated color table")
        pos += 3 * size
    while True:
        if pos >= len(data):
            raise GifError("no image data")
        block = data[pos]
        pos += 1
        if block == 0x3B:                # trailer before any frame
            raise GifError("no image data")
        if block == 0x21:                # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(data):
                    raise GifError("truncated extension")
                ln = data[pos]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if block != 0x2C:
            raise GifError("unexpected block")
        break
    if pos + 9 > len(data):
        raise GifError("truncated image descriptor")
    w = int.from_bytes(data[pos + 4:pos + 6], "little")
    h = int.from_bytes(data[pos + 6:pos + 8], "little")
    iflags = data[pos + 8]
    pos += 9
    if w == 0 or h == 0 or w * h > MAX_PIXELS:
        raise GifError("image exceeds pixel cap")
    interlaced = bool(iflags & 0x40)
    table = gct
    if iflags & 0x80:
        size = 2 << (iflags & 7)
        table = data[pos:pos + 3 * size]
        if len(table) < 3 * size:
            raise GifError("truncated color table")
        pos += 3 * size
    if table is None:
        raise GifError("no color table")
    if pos >= len(data):
        raise GifError("truncated image data")
    min_code = data[pos]
    pos += 1
    if not 2 <= min_code <= 8:
        raise GifError("bad LZW minimum code size")
    lzw = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated image data")
        ln = data[pos]
        pos += 1
        if ln == 0:
            break
        lzw += data[pos:pos + ln]
        if len(data) - pos < ln:
            raise GifError("truncated image data")
        pos += ln
    indices = _lzw_decode(bytes(lzw), min_code, w * h)
    if interlaced:
        # GIF89a appendix E: rows arrive in four passes (start 0 step 8,
        # start 4 step 8, start 2 step 4, start 1 step 2)
        rows = bytearray(w * h)
        src = 0
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            for y in range(start, h, step):
                rows[y * w:(y + 1) * w] = indices[src:src + w]
                src += w
        indices = bytes(rows)
    ncolors = len(table) // 3
    rgb = bytearray(w * h * 3)
    for i, ix in enumerate(indices):
        if ix >= ncolors:
            raise GifError("palette index out of range")
        rgb[i * 3:i * 3 + 3] = table[ix * 3:ix * 3 + 3]
    # note: (sw, sh) is the logical screen; the frame's own (w, h) is the
    # decoded geometry (they match in everything datagen emits)
    del sw, sh
    return w, h, 3, bytes(rgb)
