"""Deterministic PDF page rasterization (pure stdlib).

The one reference operator with no analogue here until round 5 was
page→image rendering: the reference rasterizes each PDF page at scale 2
before OCR (``pdfToImg(..., {scale: 2})``, apps/queue/src/lib/ocr.ts:
56-71). This module re-expresses that *what* deterministically: the
text-operator runs recovered by ``pdftext._interpret`` are rendered as
glyph BOXES — per-character filled rectangles with Helvetica-like
metrics — into an 8-bit grayscale bitmap at ``RENDER_SCALE``x page
resolution. The point is page→image with real geometry (the downstream
image pipeline sees genuine ink distribution, column gaps, bands), not
font rendering; the reference's raster feeds a network OCR service this
engine replaces with the deterministic parser, so boxes are the honest
fidelity level.

Everything is deterministic and engine-portable: integer pixel indices
from IEEE-pinned float products, a fixed per-character ink shade (so the
bitmap has texture for the stats kernels), and stats computed in exact
integer arithmetic. The bitmap round-trips through the pure-stdlib PNG
codec (functions/png.py) inside the kernel, so every rendered page also
exercises encode→decode losslessness.
"""

from __future__ import annotations

import hashlib

from ocr_platform_spark.functions.pdftext import PAGE_H, PAGE_W, _Run

RENDER_SCALE = 2                      # the reference's pdfToImg scale
IMG_W, IMG_H = PAGE_W * RENDER_SCALE, PAGE_H * RENDER_SCALE

# Helvetica-like box metrics in em units: ascent/descent bound the glyph
# box vertically around the baseline; advance is the per-char cursor
# step; the inked box is slightly narrower so adjacent glyphs stay
# visually (and statistically) distinct.
_ASCENT, _DESCENT = 0.74, 0.21
_ADVANCE, _INKED = 0.60, 0.52

INK_THRESHOLD = 128                   # pixels darker than this count as ink
# translate()-based popcount: C-speed ink counting over ~2M px/page
_INK_TABLE = bytes(1 if v < INK_THRESHOLD else 0 for v in range(256))


def _char_shade(ch: str) -> int:
    """Stable per-character gray (16..175): gives the bitmap real texture
    so channel means / thumbnails differ between pages with the same ink
    coverage but different text."""
    return 16 + (ord(ch) * 37) % 160


def render_page(runs: list[_Run], scale: int = RENDER_SCALE) -> bytes:
    """Rasterize interpreted text runs to an 8-bit grayscale bitmap
    (row-major, white background). Pure function of the runs."""
    w, h = PAGE_W * scale, PAGE_H * scale
    img = bytearray(b"\xff" * (w * h))
    for run in runs:
        top = int(scale * (PAGE_H - run.y - _ASCENT * run.size))
        bot = int(scale * (PAGE_H - run.y + _DESCENT * run.size))
        y0, y1 = max(top, 0), min(bot, h)
        if y0 >= y1:
            continue
        x_cursor = run.x
        for ch in run.text:
            if not ch.isspace():
                x0 = int(scale * x_cursor)
                x1 = int(scale * (x_cursor + _INKED * run.size))
                x0, x1 = max(x0, 0), min(x1, w)
                if x0 < x1:
                    row = bytes([_char_shade(ch)]) * (x1 - x0)
                    for y in range(y0, y1):
                        base = y * w
                        img[base + x0:base + x1] = row
            x_cursor += _ADVANCE * run.size
    return bytes(img)


def page_render_stats(runs: list[_Run], scale: int = RENDER_SCALE) -> dict:
    """Render a page and reduce it to exact-integer stats; the bitmap is
    also pushed through the PNG codec round-trip (losslessness asserted —
    a codec regression surfaces as a PdfRenderError, routed by callers)."""
    from ocr_platform_spark.functions.png import decode_png, encode_png

    w, h = PAGE_W * scale, PAGE_H * scale
    pixels = render_page(runs, scale)
    rw, rh, rch, rpx = decode_png(encode_png(w, h, 1, pixels))
    if (rw, rh, rch, rpx) != (w, h, 1, pixels):
        raise ValueError("png round-trip diverged")  # pragma: no cover
    n = w * h
    ink = sum(pixels.translate(_INK_TABLE))
    return {
        "width": w,
        "height": h,
        "n_runs": len(runs),
        "ink_ppm": (ink * 1_000_000) // n,
        "mean_x1e6": (sum(pixels) * 1_000_000) // (255 * n),
        "pixels_sha256": hashlib.sha256(pixels).hexdigest(),
    }
