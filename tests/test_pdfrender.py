"""PDF page rasterization (functions/pdfrender.py + the
extract_pdf_render kernel): geometry, determinism, encryption routing,
and the PNG-codec round-trip baked into the stats path."""

from __future__ import annotations

import hashlib

from ocr_platform_spark.functions.pdfrender import (
    IMG_H, IMG_W, INK_THRESHOLD, RENDER_SCALE, page_render_stats,
    render_page)
from ocr_platform_spark.functions.pdftext import (
    PAGE_H, PAGE_W, _Run, build_pdf, parse_pdf_runs)
from ocr_platform_spark.operators.pdf_extract import pdf_render_rows


def test_blank_page_is_white():
    img = render_page([])
    assert len(img) == IMG_W * IMG_H
    assert set(img) == {0xFF}
    s = page_render_stats([])
    assert s["ink_ppm"] == 0 and s["n_runs"] == 0
    assert s["mean_x1e6"] == 1_000_000
    assert s["pixels_sha256"] == hashlib.sha256(img).hexdigest()


def test_single_glyph_box_geometry():
    """One 10pt 'A' at (100, 700): the inked box sits at scale*x..scale*
    (x+0.52*size) horizontally and spans ascent..descent around the
    baseline, flipped into image coordinates."""
    run = _Run(100.0, 700.0, 10.0, "A")
    img = render_page([run])
    x0, x1 = 2 * 100, int(2 * (100 + 0.52 * 10))
    y0 = int(2 * (PAGE_H - 700 - 0.74 * 10))
    y1 = int(2 * (PAGE_H - 700 + 0.21 * 10))
    inked = {(x, y) for y in range(IMG_H) for x in range(IMG_W)
             if img[y * IMG_W + x] != 0xFF}
    assert inked == {(x, y) for y in range(y0, y1) for x in range(x0, x1)}
    # the shade is the stable per-char gray, dark enough to count as ink
    assert img[y0 * IMG_W + x0] == 16 + (ord("A") * 37) % 160 < INK_THRESHOLD


def test_spaces_advance_without_ink():
    a = render_page([_Run(72.0, 400.0, 10.0, "ab")])
    b = render_page([_Run(72.0, 400.0, 10.0, "a b")])
    # 'b' in the spaced variant starts one advance further right; total
    # ink is identical (space contributes none)
    assert sum(1 for p in a if p != 0xFF) == sum(1 for p in b if p != 0xFF)
    assert a != b


def test_clipping_never_raises():
    runs = [_Run(-50.0, -20.0, 40.0, "edge"),
            _Run(PAGE_W - 2.0, PAGE_H + 5.0, 30.0, "off"),
            _Run(PAGE_W + 10.0, 300.0, 12.0, "gone")]
    img = render_page(runs)
    assert len(img) == IMG_W * IMG_H


def test_render_deterministic_and_text_sensitive():
    text = "the quick brown fox " * 120
    runs = parse_pdf_runs(build_pdf(1, text))[0]
    s1, s2 = page_render_stats(runs), page_render_stats(runs)
    assert s1 == s2
    other = parse_pdf_runs(build_pdf(1, text.replace("fox", "foz")))[0]
    assert page_render_stats(other)["pixels_sha256"] != s1["pixels_sha256"]


def test_scale_matches_reference_contract():
    """scale 2 like the reference's pdfToImg: image dims are exactly 2x
    the US-Letter point grid."""
    assert RENDER_SCALE == 2
    assert (IMG_W, IMG_H) == (2 * PAGE_W, 2 * PAGE_H)
    s = page_render_stats(parse_pdf_runs(build_pdf(2, "hello " * 300))[0])
    assert (s["width"], s["height"]) == (IMG_W, IMG_H)
    assert 0 < s["ink_ppm"] < 500_000          # a text page is mostly white
    assert s["mean_x1e6"] < 1_000_000          # but not blank


def test_kernel_routes_encryption_like_pages_kernel():
    text = "alpha beta " * 80
    locked = pdf_render_rows(9, text)          # 9 % 31 == 9
    assert len(locked) == 1
    assert locked[0]["render_error"] == "encrypted PDF (password required)"
    opened = pdf_render_rows(10, text)         # 10 % 7 == 3, openable
    assert all(r["render_error"] is None for r in opened)
    # decryption is transparent: the encrypted doc renders to exactly the
    # bitmaps of its own unencrypted form (same doc_id = same layout seed)
    expect = [page_render_stats(runs)["pixels_sha256"]
              for runs in parse_pdf_runs(build_pdf(10, text))]
    assert [r["pixels_sha256"] for r in opened] == expect
