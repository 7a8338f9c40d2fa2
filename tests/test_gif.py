"""GIF codec (functions/gif.py): palette/LZW round-trips, table-reset
coverage, hand-decoded vector, hostile payloads, decode_image dispatch."""

from __future__ import annotations

import random

import pytest

from ocr_platform_spark.functions.gif import (
    _PALETTE, GifError, decode_gif, encode_gif, quantize_332)


def _expected_rgb(w, h, ch, px):
    idx = quantize_332(w, h, ch, px)
    return b"".join(_PALETTE[i * 3:i * 3 + 3] for i in idx)


@pytest.mark.parametrize("w,h,ch", [
    (1, 1, 1), (1, 1, 3), (7, 3, 4), (16, 16, 3), (33, 9, 1), (40, 25, 3),
])
def test_roundtrip_shapes(w, h, ch):
    rng = random.Random(w * 1000 + h * 10 + ch)
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    W, H, C, rgb = decode_gif(encode_gif(w, h, ch, px))
    assert (W, H, C) == (w, h, 3)
    assert rgb == _expected_rgb(w, h, ch, px)


def test_roundtrip_noise_forces_lzw_table_reset():
    """128x128 noise pushes the LZW code table past 4096 — both the
    encoder's reset emission and the decoder's reset handling run."""
    rng = random.Random(99)
    px = bytes(rng.randrange(256) for _ in range(128 * 128 * 3))
    _, _, _, rgb = decode_gif(encode_gif(128, 128, 3, px))
    assert rgb == _expected_rgb(128, 128, 3, px)


def test_hand_built_gif_with_extension_block():
    """2x1 image through a hand-assembled GIF with a 2-color local table
    and a graphic-control extension the decoder must skip. LZW stream
    hand-packed: min code size 2, codes [clear=4, 0, 1, end=5] at 3 bits
    LSB-first => bytes 0b001_000_100, 0b0000_101_0 -> 0x44, 0x0A."""
    gif = (b"GIF89a" + b"\x02\x00\x01\x00" + b"\x00\x00\x00"  # no GCT
           + b"\x21\xf9\x04\x00\x00\x00\x00\x00"              # GCE ext
           + b"\x2c" + b"\x00\x00\x00\x00" + b"\x02\x00\x01\x00"
           + b"\x80"                                           # LCT, 2
           + b"\x10\x20\x30" + b"\x40\x50\x60"
           + b"\x02" + b"\x02" + b"\x44\x0a" + b"\x00" + b"\x3b")
    w, h, c, rgb = decode_gif(gif)
    assert (w, h, c) == (2, 1, 3)
    assert rgb == b"\x10\x20\x30\x40\x50\x60"


@pytest.mark.parametrize("payload,msg", [
    (b"", "not a GIF"),
    (b"GIF89a", "not a GIF"),
    (b"NOTGIF" + bytes(20), "not a GIF"),
    (b"GIF89a" + b"\x02\x00\x01\x00\x00\x00\x00" + b"\x3b",
     "no image data"),
])
def test_hostile_stable_errors(payload, msg):
    with pytest.raises(GifError, match=msg):
        decode_gif(payload)


def test_truncated_variants_raise_giferror():
    good = encode_gif(8, 8, 3, bytes((i * 3) & 0xFF for i in range(8 * 8 * 3)))
    for cut in (10, len(good) // 3, len(good) - 3):
        with pytest.raises(GifError):
            decode_gif(good[:cut])


def test_interlaced_rows_reordered():
    """Encode a 8x8 gradient, rewrite the payload as interlaced (permute
    the index rows into GIF pass order + set the interlace flag): the
    decoder must reproduce the original sequential image."""
    w = h = 8
    px = bytes((x * 8 + y * 32) & 0xFF
               for y in range(h) for x in range(w) for _ in range(3))
    sequential = decode_gif(encode_gif(w, h, 3, px))[3]

    idx = quantize_332(w, h, 3, px)
    order = ([y for y in range(0, h, 8)] + [y for y in range(4, h, 8)]
             + [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)])
    permuted = b"".join(idx[y * w:(y + 1) * w] for y in order)
    from ocr_platform_spark.functions.gif import _PALETTE as PAL, _lzw_encode
    out = bytearray(b"GIF89a" + w.to_bytes(2, "little")
                    + h.to_bytes(2, "little") + bytes((0xF7, 0, 0)) + PAL)
    out += (b"\x2c" + bytes(4) + w.to_bytes(2, "little")
            + h.to_bytes(2, "little") + b"\x40")        # interlace flag
    out.append(8)
    lzw = _lzw_encode(permuted)
    for i in range(0, len(lzw), 255):
        out.append(len(lzw[i:i + 255]))
        out += lzw[i:i + 255]
    out += b"\x00\x3b"
    assert decode_gif(bytes(out))[3] == sequential


def test_decode_image_dispatch_and_media_mix():
    from ocr_platform_spark.datagen import gen_media
    from ocr_platform_spark.operators.multimodal import (
        decode_image, sniff_format)

    formats = set()
    for i in range(60):
        d = gen_media(i, seed=42)
        fmt = sniff_format(bytes(d["media"]))
        formats.add(fmt)
        if fmt == "gif" and i % 13 != 5 and i % 17 != 3:
            w, h, c, px = decode_image(bytes(d["media"]))
            assert c == 3 and len(px) == w * h * 3
    assert {"png", "jpeg", "gif"} <= formats
