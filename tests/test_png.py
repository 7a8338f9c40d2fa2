"""Pure-stdlib PNG codec tests (no Spark): round-trip, all five filter
types on the decode path, error envelope, and media datagen determinism."""

from __future__ import annotations

import struct
import zlib

import pytest

from ocr_platform_spark.functions.png import (
    PngError, _paeth, decode_png, encode_png)


def _pixels(w, h, ch, fn):
    return bytes(fn(x, y, c) & 0xFF
                 for y in range(h) for x in range(w) for c in range(ch))


class TestRoundTrip:
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_encode_decode(self, ch):
        w, h = 13, 7   # deliberately non-power-of-two
        px = _pixels(w, h, ch, lambda x, y, c: 11 * x + 23 * y + 41 * c)
        got = decode_png(encode_png(w, h, ch, px))
        assert got == (w, h, ch, px)

    def test_single_pixel(self):
        assert decode_png(encode_png(1, 1, 3, b"\x01\x02\x03")) == \
            (1, 1, 3, b"\x01\x02\x03")


def _manual_png(w, h, ch, px, filter_type):
    """Assemble a PNG whose scanlines use ``filter_type``, applying the
    FORWARD filter (what an encoder would write) so decode must invert it."""
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = px[y * stride:(y + 1) * stride]
        filt = bytearray()
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if filter_type == 0:
                filt.append(row[i])
            elif filter_type == 1:
                filt.append((row[i] - left) & 0xFF)
            elif filter_type == 2:
                filt.append((row[i] - up) & 0xFF)
            elif filter_type == 3:
                filt.append((row[i] - ((left + up) >> 1)) & 0xFF)
            else:
                filt.append((row[i] - _paeth(left, up, ul)) & 0xFF)
        raw.append(filter_type)
        raw.extend(filt)
        prev = row

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + \
            struct.pack(">I", crc)

    color = {1: 0, 3: 2, 4: 6}[ch]
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


class TestFilters:
    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("ch", [1, 3])
    def test_filter_inversion(self, ftype, ch):
        w, h = 9, 5
        px = _pixels(w, h, ch, lambda x, y, c: 17 * x * y + 7 * x + 3 * c)
        got = decode_png(_manual_png(w, h, ch, px, ftype))
        assert got == (w, h, ch, px)


class TestErrors:
    def test_not_png(self):
        with pytest.raises(PngError):
            decode_png(b"\xff\xd8\xffJFIF not a png")

    def test_truncated(self):
        full = encode_png(8, 8, 3, _pixels(8, 8, 3, lambda x, y, c: x))
        with pytest.raises((PngError, Exception)):
            decode_png(full[: len(full) * 2 // 3])

    def test_bad_depth(self):
        bad = bytearray(encode_png(2, 2, 3, b"\x00" * 12))
        # IHDR bit-depth byte sits at offset 8(sig)+8(len/type)+8(w+h)
        bad[24] = 16
        with pytest.raises(PngError, match="bit depth"):
            decode_png(bytes(bad))

    def test_dimension_mismatch(self):
        with pytest.raises(PngError):
            encode_png(4, 4, 3, b"\x00" * 10)

    def test_zip_bomb_rejected(self):
        """IDAT inflating past the IHDR-declared size must error, not
        allocate unboundedly (poison-pill guard)."""
        good = encode_png(2, 2, 1, b"\x00" * 4)
        # splice an IDAT that decompresses to 1 MiB into a 2x2 header
        bomb_raw = zlib.compress(b"\x00" * (1 << 20))

        def chunk(ctype, data):
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return struct.pack(">I", len(data)) + ctype + data + \
                struct.pack(">I", crc)

        ihdr_end = 8 + 8 + 13 + 4
        bombed = (good[:ihdr_end] + chunk(b"IDAT", bomb_raw)
                  + chunk(b"IEND", b""))
        with pytest.raises(PngError):
            decode_png(bombed)

    def test_absurd_dimensions_rejected(self):
        bad = bytearray(encode_png(2, 2, 1, b"\x00" * 4))
        # overwrite IHDR width/height with 2^30 each (offset 16 = after
        # signature + IHDR length/type)
        bad[16:24] = struct.pack(">II", 1 << 30, 1 << 30)
        with pytest.raises(PngError, match="pixel cap"):
            decode_png(bytes(bad))


class TestHypothesisRoundTrip:
    def test_random_images_round_trip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(st.integers(1, 9), st.integers(1, 9),
               st.sampled_from([1, 3, 4]), st.randoms(use_true_random=False))
        def check(w, h, ch, rng):
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            assert decode_png(encode_png(w, h, ch, px)) == (w, h, ch, px)

        check()


class TestGenMedia:
    def test_deterministic_and_mixed(self):
        from ocr_platform_spark.datagen import gen_media
        from ocr_platform_spark.operators.multimodal import image_stats

        a = [gen_media(i, 42) for i in range(60)]
        b = [gen_media(i, 42) for i in range(60)]
        assert [r["media"] for r in a] == [r["media"] for r in b]
        ok = err = 0
        for r in a:
            try:
                w, h, ch, means, thumb = image_stats(r["media"])
                assert 16 <= w <= 32 and 12 <= h <= 24
                assert len(means) == ch
                assert all(0 <= m <= 255 * 10 ** 6 for m in means)
                vals = [int(v) for v in thumb.split(",")]
                assert len(vals) == 16 and all(0 <= v <= 255 for v in vals)
                ok += 1
            except Exception:
                err += 1
        assert ok > 0 and err > 0   # both decode and error paths exercised


class TestAdam7:
    """Interlaced PNG: lossless, so interlaced decode is pinned
    bit-identical to the sequential encode of the same pixels."""

    @pytest.mark.parametrize("dims", [(1, 1), (7, 7), (8, 8), (9, 23),
                                      (33, 17), (40, 40)])
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_roundtrip_exact(self, dims, ch):
        w, h = dims
        px = bytes((w * 31 + h * 7 + i * 13) & 0xFF
                   for i in range(w * h * ch))
        blob = encode_png(w, h, ch, px, interlace=True)
        assert decode_png(blob) == (w, h, ch, px)
        assert decode_png(blob) == decode_png(encode_png(w, h, ch, px))

    def test_interlace_flag_in_ihdr(self):
        blob = encode_png(8, 8, 3, bytes(192), interlace=True)
        ihdr = blob.index(b"IHDR")
        assert blob[ihdr + 4 + 12] == 1    # interlace byte

    def test_truncated_interlaced_raises(self):
        blob = encode_png(20, 20, 3, bytes(1200), interlace=True)
        with pytest.raises(PngError):
            decode_png(blob[: len(blob) // 2])

    def test_unknown_interlace_method_rejected(self):
        blob = bytearray(encode_png(8, 8, 1, bytes(64)))
        ihdr = blob.index(b"IHDR")
        blob[ihdr + 4 + 12] = 2            # invalid method
        # fix the CRC so only the method byte is at fault
        import zlib as _z
        data = bytes(blob[ihdr:ihdr + 4 + 13])
        crc = _z.crc32(data) & 0xFFFFFFFF
        blob[ihdr + 17:ihdr + 21] = struct.pack(">I", crc)
        with pytest.raises(PngError, match="interlace"):
            decode_png(bytes(blob))
