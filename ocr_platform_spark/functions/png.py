"""Pure-stdlib PNG codec (encode + decode) for the multimodal path.

The container has no image libraries, but PNG is zlib + simple per-scanline
filters — both stdlib. This makes the S4 decode step REAL for PNG payloads
(reference analogue: page rasterization to PNG buffers,
apps/queue/src/lib/ocr.ts:56-71); JPEG/audio/video remain declared stubs
(their codecs genuinely are not installable here).

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
non-interlaced AND Adam7-interlaced (each of the 7 passes is an
independently-filtered sub-image scattered back on its lattice; PNG is
lossless, so interlaced decode is pinned bit-identical to sequential).
Everything else raises PngError — callers route it into the never-drop
error envelope.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
# poison-pill guard: a hostile IHDR can declare absurd dimensions and a
# tiny IDAT can decompress to gigabytes (zip bomb), and the pure-Python
# per-byte defilter loop (Sub/Avg/Paeth) costs ~minutes per 100 Mpx — so a
# max-size filtered PNG would stall one executor core in the never-drop
# pipeline. Thumbnails/channel stats don't need big images: cap LOW and
# fail oversized rows into the error envelope (cap × per-byte cost bounds
# worst-case single-row CPU to well under a second).
MAX_PIXELS = 4 << 20   # 4 Mpx ≈ 16 MiB of RGBA


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """payload → (width, height, n_channels, raw pixel bytes row-major)."""
    if not payload.startswith(_SIGNATURE):
        raise PngError("not a PNG signature")
    pos = len(_SIGNATURE)
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color}")
            if interlace not in (0, 1):
                raise PngError(f"unknown interlace method {interlace}")
            adam7 = interlace == 1
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    if width == 0 or height == 0:
        raise PngError("zero-dimension image")
    if width * height > MAX_PIXELS:
        raise PngError(f"image exceeds {MAX_PIXELS} pixel cap")
    stride = width * channels
    if adam7:
        sub_dims = [(pw, ph) for pw, ph in _adam7_pass_dims(width, height)]
        expected = sum((pw * channels + 1) * ph
                       for pw, ph in sub_dims if pw and ph)
    else:
        expected = (stride + 1) * height
    try:
        # cap decompression at the size IHDR promises — a bomb that
        # inflates past it errors instead of allocating unboundedly
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected)
        if d.decompress(b"", 1) or not d.eof and d.unconsumed_tail:
            raise PngError("IDAT decompresses past declared dimensions")
    except zlib.error:
        # fixed message: embedding zlib's exception text would make the
        # oracled decode_error column depend on the zlib build
        raise PngError("bad IDAT stream") from None
    if len(raw) != expected:
        raise PngError("IDAT length does not match dimensions")

    if not adam7:
        out = _defilter(raw, height, stride, channels)
        return width, height, channels, bytes(out)

    # Adam7: seven independently-filtered sub-images, scattered back on
    # their (x0, y0, dx, dy) lattices (PNG spec 4.5.2 / 13.8)
    out = bytearray(stride * height)
    pos2 = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, sub_dims):
        if pw == 0 or ph == 0:
            continue
        pstride = pw * channels
        size = (pstride + 1) * ph
        sub = _defilter(raw[pos2:pos2 + size], ph, pstride, channels)
        pos2 += size
        for i in range(ph):
            yy = y0 + i * dy
            srow = sub[i * pstride:(i + 1) * pstride]
            for j in range(pw):
                xx = (x0 + j * dx) * channels
                out[yy * stride + xx:yy * stride + xx + channels] = \
                    srow[j * channels:(j + 1) * channels]
    return width, height, channels, bytes(out)


# Adam7 pass lattices: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _adam7_pass_dims(width: int, height: int) -> list:
    return [((width - x0 + dx - 1) // dx, (height - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7]


def _defilter(raw: bytes, height: int, stride: int,
              channels: int) -> bytearray:
    """Undo per-scanline filters over one (sub-)image of ``height`` rows
    of ``stride`` bytes each (raw rows are prefixed by the filter byte)."""
    import numpy as np

    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1: row_start + 1 + stride])
        if ftype == 1:    # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # Up — no intra-row dependency: whole-row numpy
            row = bytearray((np.frombuffer(bytes(row), np.uint8)
                             + np.frombuffer(prev, np.uint8)).tobytes())
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown filter type {ftype}")
        out[y * stride:(y + 1) * stride] = row
        prev = bytes(row)
    return out


def encode_png(width: int, height: int, channels: int, pixels: bytes,
               interlace: bool = False) -> bytes:
    """Minimal encoder (filter 0 rows, one IDAT), optionally
    Adam7-interlaced — the test/datagen side."""
    color = {1: 0, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError("pixel buffer does not match dimensions")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0,
                       1 if interlace else 0)
    if interlace:
        parts = []
        for (x0, y0, dx, dy), (pw, ph) in zip(
                _ADAM7, _adam7_pass_dims(width, height)):
            if pw == 0 or ph == 0:
                continue
            for i in range(ph):
                yy = y0 + i * dy
                parts.append(b"\x00" + b"".join(
                    pixels[(yy * width + x0 + j * dx) * channels:
                           (yy * width + x0 + j * dx) * channels + channels]
                    for j in range(pw)))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                       for y in range(height))
    return (_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))
