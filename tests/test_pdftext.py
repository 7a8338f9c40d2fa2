"""PDF codec + layout-analyzer tests (functions/pdftext.py) and the
pipeline's %PDF- dispatch (extract/pipeline.py::extract_pdf_payload).

The writer emits draw operators in seeded-scrambled order, so every
round-trip assertion here is also a reading-order-reconstruction
assertion: stream-order concatenation would fail these tests.
"""

from __future__ import annotations

import zlib

import duckdb
import pytest

from ocr_platform_spark.extract.pipeline import extract_document
from ocr_platform_spark.functions.pdftext import (
    PdfError, build_pdf, layout_pages, parse_pdf)

SF = "/root/testdata/sf0.01"


def _docs(n=80):
    return duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        f"ORDER BY doc_id LIMIT {n}").fetchall()


# ------------------------------------------------------------- round-trip

def test_roundtrip_word_perfect_all_layouts():
    """body+footnotes in reading order must equal the source word sequence
    for every seeded layout (1/2 columns, header, footnotes, page nums)."""
    saw_two_col = saw_multipage = saw_feet = saw_header = False
    for doc_id, text in _docs():
        pages = parse_pdf(build_pdf(doc_id, text))
        got = " ".join(" ".join(p.body.split()) for p in pages).split()
        got += " ".join(p.footnotes or "" for p in pages).split()
        assert got == text.split(), f"doc {doc_id} lost reading order"
        saw_two_col |= any(p.n_columns == 2 for p in pages)
        saw_multipage |= len(pages) > 1
        saw_feet |= any(p.footnotes for p in pages)
        saw_header |= any(p.header for p in pages)
    assert saw_two_col and saw_multipage and saw_feet and saw_header, \
        "sample did not exercise every layout variant"


def test_page_numbers_sequential_and_excluded_from_text():
    for doc_id, text in _docs(40):
        for i, p in enumerate(parse_pdf(build_pdf(doc_id, text))):
            if p.page_number is not None:
                assert p.page_number == i + 1
                # the printed number is navigation, not content: it must
                # not surface as a standalone body line
                assert str(p.page_number) not in p.body.split("\n")


def test_header_matches_spec():
    for doc_id, text in _docs(40):
        spec = layout_pages(doc_id, text)
        pages = parse_pdf(build_pdf(doc_id, text))
        assert [p.header for p in pages] == [s.header for s in spec]
        assert [p.footnotes or None for p in pages] == \
            ["\n".join(s.footnotes) or None for s in spec]


# -------------------------------------------------- adversarial layouts

def _minimal_pdf(content: bytes, compress=True) -> bytes:
    """Hand-rolled single-page PDF around an arbitrary content stream."""
    data = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>"),
        5: (b"<< /Length %d%s >>\nstream\n" % (len(data), filt))
           + data + b"\nendstream",
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in sorted(objs):
        offs[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for n in range(1, 6):
        out += b"%010d 00000 n \n" % offs[n]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref
    return bytes(out)


def test_reading_order_from_coordinates_not_stream_order():
    # draw order: col2 line, page number, col1 line 2, header, col1 line 1
    content = (b"BT /F1 10 Tf 1 0 0 1 322 714 Tm (column two) Tj ET\n"
               b"BT /F1 10 Tf 1 0 0 1 306 40 Tm (7) Tj ET\n"
               b"BT /F1 10 Tf 1 0 0 1 72 700 Tm (line two) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 756 Tm (The Header) Tj ET\n"
               b"BT /F1 10 Tf 1 0 0 1 72 714 Tm (line one) Tj ET\n")
    (page,) = parse_pdf(_minimal_pdf(content))
    assert page.header == "The Header"
    assert page.body == "line one\nline two\ncolumn two"
    assert page.n_columns == 2
    assert page.page_number == 7


def test_td_tstar_relative_positioning_and_tj_kerning():
    content = (b"BT /F1 10 Tf 16 TL 1 0 0 1 72 714 Tm "
               b"[(hello) -333 (world)] TJ T* "
               b"[(kern) -100 (joined)] TJ 0 -16 Td (third) Tj ET\n")
    (page,) = parse_pdf(_minimal_pdf(content))
    # -333 em/1000 reads as a word gap; -100 does not
    assert page.body == "hello world\nkernjoined\nthird"


def test_string_escapes_hex_strings_and_octal():
    content = (b"BT /F1 10 Tf 1 0 0 1 72 714 Tm "
               b"(paren \\( and \\) back\\\\slash \\101) Tj ET\n"
               b"BT /F1 10 Tf 1 0 0 1 72 700 Tm <68657821> Tj ET\n")
    (page,) = parse_pdf(_minimal_pdf(content))
    assert page.body == "paren ( and ) back\\slash A\nhex!"


def test_uncompressed_stream_supported():
    content = b"BT /F1 10 Tf 1 0 0 1 72 714 Tm (plain) Tj ET\n"
    (page,) = parse_pdf(_minimal_pdf(content, compress=False))
    assert page.body == "plain"


def test_unicode_text_roundtrip():
    text = "نص عربي مع (أقواس) و\\شرطة " * 8
    pages = parse_pdf(build_pdf(99, text))
    got = " ".join(p.text for p in pages).split()
    want = text.split()
    # header/footnote may reorder; compare body+feet stream
    body = " ".join(" ".join(p.body.split()) for p in pages).split()
    feet = " ".join(p.footnotes or "" for p in pages).split()
    assert body + feet == want or got == want


# ------------------------------------------------------- hostile payloads

HOSTILE = [
    (b"", "not a PDF"),
    (b"hello", "not a PDF"),
    (b"%PDF-1.4\ngarbage", "no objects"),
    (b"%PDF-1.4\n1 0 obj\n<< >>\n", "truncated object"),
]


@pytest.mark.parametrize("payload,msg", HOSTILE)
def test_hostile_payloads_stable_errors(payload, msg):
    with pytest.raises(PdfError, match=msg):
        parse_pdf(payload)


def test_bad_deflate_and_foreign_filter_stable_errors():
    good = _minimal_pdf(b"BT (x) Tj ET")
    bad_deflate = good.replace(zlib.compress(b"BT (x) Tj ET"),
                               b"\x00" * len(zlib.compress(b"BT (x) Tj ET")))
    with pytest.raises(PdfError, match="bad deflate stream"):
        parse_pdf(bad_deflate)
    foreign = good.replace(b"/FlateDecode", b"/LZWDecodee"[:11])
    with pytest.raises(PdfError, match="unsupported stream filter"):
        parse_pdf(foreign)


def test_truncated_stream_stable_error():
    pdf = _minimal_pdf(b"BT /F1 10 Tf 1 0 0 1 72 714 Tm (abc) Tj ET")
    with pytest.raises(PdfError):
        parse_pdf(pdf[:len(pdf) // 2])


# ------------------------------------------------------ pipeline dispatch

def test_pipeline_dispatch_pdf_envelope_and_spans():
    text = ("words enough to wrap across several lines and trigger the "
            "layout engine with a decent amount of content ") * 3
    r = extract_document("u-pdf", build_pdf(5, text))
    assert r.failed_stage is None
    assert r.extracted_text
    # spans tile extracted_text: in-order, non-overlapping, kinds typed
    pos = 0
    for (bid, s, e, kind) in r.spans:
        assert s == (0 if pos == 0 else pos)
        assert kind in ("header", "body", "footnotes")
        pos = e + 1
    assert pos - 1 == len(r.extracted_text)
    body_and_feet = " ".join(r.body.split() + (r.footnotes or "").split())
    assert body_and_feet == " ".join(text.split())


def test_pipeline_dispatch_pdf_failure_envelope_never_raises():
    r = extract_document("u-bad", b"%PDF-1.4\ntotal garbage no objects")
    assert r.failed_stage == "PDF_PARSE"
    assert r.reason == "no objects"
    assert "NEEDS_ADDITIONAL_REVIEW" in r.flags


def test_pipeline_html_path_unaffected():
    r = extract_document("u-html", "<html><body><p>still html "
                         "path</p></body></html>".encode())
    assert r.failed_stage is None
    assert "still html path" in r.extracted_text


# ------------------------------------------------------------ fuzzing

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs", "Cc", "Zs", "Zl", "Zp")),
    min_size=1, max_size=12)


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=2**31), st.lists(_WORD, max_size=120))
def test_fuzz_roundtrip_any_text_any_layout(doc_id, words):
    """Any text through any seeded layout (all positioning-operator
    variants, kerned TJ, hex strings, scrambled draw order) must
    round-trip as a word sequence."""
    text = " ".join(words)
    pages = parse_pdf(build_pdf(doc_id, text))
    got = " ".join(" ".join(p.body.split()) for p in pages).split()
    got += " ".join(p.footnotes or "" for p in pages).split()
    assert got == text.split()


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_parser_never_hangs_or_leaks_exceptions(payload):
    """Arbitrary bytes behind a %PDF- magic either parse or raise PdfError
    — never any other exception (the pipeline envelope depends on it)."""
    try:
        parse_pdf(b"%PDF-1.4\n" + payload)
    except PdfError:
        pass


# ------------------------------------------------------- byte-golden pin

def test_golden_pdf_bytes_parse_to_pinned_output():
    """Round-trips cannot catch COORDINATED writer+parser drift (both
    moving together still round-trips). This pins the parser against
    checked-in PDF BYTES and the writer against the same pinned parse:
    two-column page, header, footnotes, page numbers, all operator
    variants."""
    import json
    from pathlib import Path

    fx = Path(__file__).parent / "fixtures"
    want = json.load(open(fx / "pdf_golden.json"))
    got = parse_pdf((fx / "pdf_golden.pdf").read_bytes())
    as_dicts = [{"page_no": p.page_no, "header": p.header, "body": p.body,
                 "footnotes": p.footnotes, "page_number": p.page_number,
                 "n_columns": p.n_columns, "n_lines": p.n_lines}
                for p in got]
    assert as_dicts == want["pages"]
    assert got[0].n_columns == 2 and got[0].header and got[-1].footnotes
    # the writer, rebuilt from the pinned inputs, must parse identically
    # (byte-equality would pin zlib's compressor; parse-equality is the
    # semantic contract)
    rebuilt = [{"page_no": p.page_no, "header": p.header, "body": p.body,
                "footnotes": p.footnotes, "page_number": p.page_number,
                "n_columns": p.n_columns, "n_lines": p.n_lines}
               for p in parse_pdf(build_pdf(want["doc_id"], want["text"]))]
    assert rebuilt == want["pages"]


# ------------------------------------------------------------- encryption

def _pages_tuple(pages):
    return [(p.page_no, p.header, p.body, p.footnotes, p.page_number,
             p.n_columns, p.n_lines) for p in pages]


def test_encrypted_empty_password_decrypts_identically():
    """Standard handler V1/R2, empty user password (the ignoreEncryption
    case the reference targets): every stream is RC4-ciphered, so parsing
    without the decrypt path would be garbage — output must match the
    clean document page-for-page."""
    from ocr_platform_spark.functions.pdftext import encrypt_pdf

    for doc_id, text in _docs(12):
        clean = build_pdf(doc_id, text)
        enc = encrypt_pdf(clean)
        assert enc != clean and b"/Encrypt" in enc
        assert _pages_tuple(parse_pdf(enc)) == _pages_tuple(parse_pdf(clean))


def test_encrypted_with_password_routes_stable_error():
    from ocr_platform_spark.functions.pdftext import encrypt_pdf

    enc = encrypt_pdf(build_pdf(3, "secret body " * 40), user_pw=b"hunter2")
    with pytest.raises(PdfError, match=r"password required"):
        parse_pdf(enc)


def test_owner_password_differs_user_empty_still_opens():
    """Owner-password-only protection (print/copy restrictions) leaves the
    user password empty — the overwhelmingly common encrypted form — and
    must open."""
    from ocr_platform_spark.functions.pdftext import encrypt_pdf

    clean = build_pdf(11, "restricted but readable " * 30)
    enc = encrypt_pdf(clean, user_pw=b"", owner_pw=b"owner-secret")
    assert _pages_tuple(parse_pdf(enc)) == _pages_tuple(parse_pdf(clean))


def test_foreign_handler_and_revision_route_stable_errors():
    from ocr_platform_spark.functions.pdftext import encrypt_pdf

    enc = encrypt_pdf(build_pdf(5, "x " * 100))
    with pytest.raises(PdfError, match="unsupported security handler"):
        parse_pdf(enc.replace(b"/Standard", b"/AcmeSec1"))
    with pytest.raises(PdfError, match="unsupported encryption revision"):
        parse_pdf(enc.replace(b"/V 1 /R 2", b"/V 2 /R 3"))
    with pytest.raises(PdfError, match="without file ID"):
        parse_pdf(enc.replace(b"/ID [<", b"/XX [<"))
    # corrupting /U breaks the algorithm-6 check -> password-required path
    import re as _re
    u = _re.search(rb"/U <([0-9a-f]+)>", enc).group(1)
    bad_u = u[:-2] + (b"00" if u[-2:] != b"00" else b"11")
    with pytest.raises(PdfError, match="password required"):
        parse_pdf(enc.replace(b"/U <" + u, b"/U <" + bad_u))


def test_pdf_kernel_routes_encrypted_slice():
    """pdf_pages_rows: the password slice (doc_id % 31 == 9) lands as one
    stable error row; the openable slice (doc_id % 7 == 3) decrypts and
    round-trips word-perfectly (never-drop both ways)."""
    from ocr_platform_spark.operators.pdf_extract import pdf_pages_rows

    text = "alpha beta gamma delta " * 50
    locked = pdf_pages_rows(9, text)       # 9 % 31 == 9
    assert len(locked) == 1
    assert locked[0]["parse_error"] == "encrypted PDF (password required)"
    assert locked[0]["n_pages"] == 0

    opened = pdf_pages_rows(10, text)      # 10 % 7 == 3 -> openable
    assert all(r["parse_error"] is None for r in opened)
    got = " ".join(" ".join(r["body"].split()) for r in opened).split()
    got += " ".join(r["footnotes"] or "" for r in opened).split()
    assert got == text.split()
