"""Charset sniffing (extract/charset.py): WHATWG subset, never raises.

The synthetic corpus is all-UTF-8, so these vectors are the coverage for
the legacy-web paths (BOMs, meta labels, windows-125x, UTF-16) — plus the
bit-identity guarantee for UTF-8 inputs that keeps every golden stable.
"""

from __future__ import annotations

import codecs

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_platform_spark.extract.charset import decode_html, sniff_charset
from ocr_platform_spark.extract.pipeline import extract_document

AR = "مرحبا بالعالم"          # cp1256-encodable Arabic
FR = "héllo «monde» à côté"    # cp1252-encodable Latin-1-ish


class TestBom:
    def test_utf8_bom_consumed(self):
        text, enc = decode_html(codecs.BOM_UTF8 + "hi".encode("utf-8"))
        assert (text, enc) == ("hi", "utf-8")

    def test_utf16_le(self):
        text, enc = decode_html(codecs.BOM_UTF16_LE + AR.encode("utf-16-le"))
        assert (text, enc) == (AR, "utf-16-le")

    def test_utf16_be(self):
        text, enc = decode_html(codecs.BOM_UTF16_BE + AR.encode("utf-16-be"))
        assert (text, enc) == (AR, "utf-16-be")

    def test_utf32_not_mistaken_for_utf16(self):
        # UTF-32-LE BOM starts with the UTF-16-LE BOM bytes
        text, enc = decode_html(codecs.BOM_UTF32_LE + "x".encode("utf-32-le"))
        assert (text, enc) == ("x", "utf-32-le")

    def test_bom_beats_meta(self):
        payload = codecs.BOM_UTF16_LE + (
            '<meta charset="windows-1256">ok'.encode("utf-16-le"))
        text, enc = decode_html(payload)
        assert enc == "utf-16-le"
        assert "ok" in text


class TestMetaLabel:
    def test_meta_charset_cp1256(self):
        raw = f'<html><head><meta charset="windows-1256"></head>{AR}'.encode("cp1256")
        text, enc = decode_html(raw)
        assert enc == "cp1256"
        assert AR in text

    def test_http_equiv_form(self):
        raw = ('<meta http-equiv="Content-Type" '
               'content="text/html; charset=windows-1252">' + FR).encode("cp1252")
        text, enc = decode_html(raw)
        assert enc == "cp1252"
        assert FR in text

    def test_latin1_label_maps_to_cp1252(self):
        # WHATWG: iso-8859-1 means windows-1252 on the web; 0x92 is a
        # cp1252 right-quote and an ISO-8859-1 control char
        raw = b'<meta charset="iso-8859-1">it\x92s'
        text, enc = decode_html(raw)
        assert enc == "cp1252"
        assert "it’s" in text

    def test_meta_utf16_label_treated_as_utf8(self):
        raw = '<meta charset="utf-16">plain'.encode("utf-8")
        text, enc = decode_html(raw)
        assert enc == "utf-8"
        assert "plain" in text

    def test_unknown_label_falls_through(self):
        raw = b'<meta charset="klingon-8">ok'
        text, enc = decode_html(raw)
        assert (enc, "ok" in text) == ("utf-8", True)

    def test_meta_outside_prescan_window_ignored(self):
        raw = b"<p>" + b"x" * 1500 + b'<meta charset="windows-1256">'
        _, enc = decode_html(raw)
        assert enc == "utf-8"

    def test_charset_word_in_body_text_not_a_label(self):
        # 'charset=' outside a <meta> tag must not trigger
        raw = b"<p>use charset=windows-1256 in your meta tag</p>"
        _, enc = decode_html(raw)
        assert enc == "utf-8"


class TestFallbacks:
    def test_valid_utf8_bit_identical(self):
        raw = f"<p>{AR} {FR}</p>".encode("utf-8")
        text, enc = decode_html(raw)
        assert (text, enc) == (raw.decode("utf-8"), "utf-8")

    def test_undeclared_cp1252_recovers(self):
        # the pre-sniffing engine turned 0x92 into U+FFFD; now cp1252
        text, enc = decode_html(b"it\x92s fine")
        assert (text, enc) == ("it’s fine", "cp1252")

    def test_declared_utf8_but_invalid_stays_utf8_replace(self):
        raw = b'<meta charset="utf-8">ab\xff\xfe'
        text, enc = decode_html(raw)
        assert enc == "utf-8"
        assert "�" in text and "ab" in text


class TestPipelineIntegration:
    def test_cp1256_page_extracts_real_text(self):
        body = f"<html><head><meta charset=windows-1256></head><body><main><p>{AR} {AR} {AR}</p></main></body></html>"
        res = extract_document("https://x.test/a", body.encode("cp1256"))
        assert res.failed_stage is None
        assert AR in res.extracted_text

    def test_utf16_page_extracts(self):
        body = f"<html><body><main><p>{FR} {FR}</p></main></body></html>"
        res = extract_document(
            "https://x.test/b", codecs.BOM_UTF16_LE + body.encode("utf-16-le"))
        assert res.failed_stage is None
        assert FR in res.extracted_text


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_never_raises_and_deterministic(payload):
    a = decode_html(payload)
    b = decode_html(payload)
    assert a == b
    assert isinstance(a[0], str) and isinstance(a[1], str)
    assert sniff_charset(payload) == sniff_charset(payload)


class TestUnquotedContentValue:
    """WHATWG prescan: an unquoted attribute value runs to whitespace or
    '>' — '/' and ';' are ordinary value bytes. A '/'-terminated tokenizer
    strands ';charset=x' as a fake bare charset attribute and labels pages
    that carry no http-equiv pragma."""

    def test_unquoted_content_without_pragma_does_not_label(self):
        raw = b'<meta content=text/html;charset=gb2312><p>plain utf-8</p>'
        text, enc = decode_html(raw)
        assert enc == "utf-8"
        assert "plain utf-8" in text

    def test_unquoted_content_with_pragma_labels(self):
        raw = (b'<meta http-equiv=content-type '
               b'content=text/html;charset=windows-1252>it\x92s')
        text, enc = decode_html(raw)
        assert enc == "cp1252"
        assert "it’s" in text

    def test_self_closing_bare_charset_still_labels(self):
        raw = '<meta charset=windows-1256/>'.encode() + AR.encode("cp1256")
        text, enc = decode_html(raw)
        assert enc == "cp1256"
        assert AR in text


class TestTransportLabel:
    """The HTTP-header charset is authoritative AS-IS (WHATWG returns the
    transport encoding with confidence certain) — the 'utf-16 label is a
    lie' remap applies only to in-document meta declarations."""

    def test_transport_utf16le_decodes_bomless_payload(self):
        body = "<html><p>hello transport</p></html>".encode("utf-16-le")
        text, enc = decode_html(body, transport_label="utf-16le")
        assert enc == "utf-16-le"
        assert "hello transport" in text

    def test_bare_utf16_transport_label_pins_le(self):
        body = "<p>le pinned</p>".encode("utf-16-le")
        text, enc = decode_html(body, transport_label="utf-16")
        assert enc == "utf-16-le"
        assert "le pinned" in text

    def test_meta_utf16_still_remapped_to_utf8(self):
        raw = '<meta charset="utf-16">still utf-8'.encode()
        text, enc = decode_html(raw)
        assert enc == "utf-8"
        assert "still utf-8" in text

    def test_bom_outranks_transport(self):
        import codecs as _c
        body = _c.BOM_UTF8 + "<p>bom wins</p>".encode("utf-8")
        text, enc = decode_html(body, transport_label="koi8-r")
        assert enc == "utf-8"
        assert "bom wins" in text


class TestHostileLabels:
    """codecs.lookup resolves non-text codecs too — a hostile meta label
    must fall through to content sniffing, never raise."""

    def test_bytes_transform_codec_labels_ignored(self):
        for label in ("hex", "rot13", "zlib", "base64", "uu", "bz2"):
            raw = f'<meta charset="{label}">plain text'.encode()
            text, enc = decode_html(raw)
            assert enc == "utf-8", label
            assert "plain text" in text

    def test_punycode_label_never_raises(self):
        # punycode IS a text encoding but its decoder can reject inputs
        # despite errors="replace"; must degrade, not raise
        raw = b'<meta charset="punycode">\xff\xff overflow \xff'
        text, enc = decode_html(raw)
        assert isinstance(text, str) and isinstance(enc, str)


class TestWorldLabels:
    """Non-Latin legacy families resolve through stdlib codecs with no
    aliasing needed — pin the big ones a real crawl actually contains."""

    def test_shift_jis(self):
        jp = "こんにちは世界"
        raw = f'<meta charset="shift_jis">{jp}'.encode("shift_jis")
        text, enc = decode_html(raw)
        assert jp in text and enc == "shift_jis"

    def test_gb2312(self):
        zh = "你好世界"
        raw = f'<meta charset="gb2312">{zh}'.encode("gb2312")
        text, enc = decode_html(raw)
        assert zh in text

    def test_big5(self):
        zh = "世界你好"
        raw = f'<meta charset="big5">{zh}'.encode("big5")
        text, enc = decode_html(raw)
        assert zh in text and enc == "big5"

    def test_koi8_r(self):
        ru = "привет мир"
        raw = f'<meta charset="koi8-r">{ru}'.encode("koi8_r")
        text, enc = decode_html(raw)
        assert ru in text and enc == "koi8-r"

    def test_euc_kr(self):
        ko = "안녕하세요"
        raw = f'<meta charset="euc-kr">{ko}'.encode("euc_kr")
        text, enc = decode_html(raw)
        assert ko in text

    def test_iso_8859_6_arabic(self):
        raw = f'<meta charset="iso-8859-6">{AR}'.encode("iso8859_6")
        text, enc = decode_html(raw)
        assert AR in text and enc == "iso8859-6"
