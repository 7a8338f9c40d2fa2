"""Deterministic PDF text + layout codec (pure stdlib: zlib, re, hashlib).

Two halves, both pure functions (no Spark imports):

- ``build_pdf(doc_id, text)`` — a deterministic PDF 1.4 *writer* used to
  synthesize layout-bearing test documents from the ``documents`` table:
  US-Letter pages, Flate-compressed content streams, a real xref table,
  header / one- or two-column body / footnote / page-number regions laid
  out by absolute ``Tm`` coordinates. The writer deliberately emits the
  per-line draw operators in a seeded-scrambled order and splits some
  lines into kerned ``TJ`` arrays, so a parser can only recover the text
  by doing actual layout analysis — coordinate-driven reading-order
  reconstruction, not stream-order concatenation.

- ``parse_pdf(data)`` — the *parser/layout analyzer*: walks the object
  graph (trailer → /Root → /Pages → /Kids → /Contents), inflates
  FlateDecode streams, interprets the text operators (Tf Tm Td TD T* TL
  Tj ' TJ, literal + hex strings with escapes), then reconstructs layout
  per page: y-clustered lines, x-gap column detection, reading order
  (header → column 1 → column 2 → footnotes), and region typing from
  (y-band, font-size) — the classic XY-band layout analysis. The page
  number is detected (short digits-only line in the bottom band) and
  excluded from the text, matching the HTML segmenter's contract
  (extract/segment.py).

Reference parity: the reference fetches PDFs and rasterizes pages for a
network OCR service (apps/queue/src/lib/ocr.ts:15-71) and recovers
header/body/footnotes structure with an LLM segment stage
(apps/queue/src/pipeline/segment.ts:39-91). This module is the
deterministic local re-expression of that *what* — per-page text with
layout-derived regions — per the north rule's "PDF/layout parse,
reading-order reconstruction".

Subset contract (documented, asserted by tests): direct /Length values,
FlateDecode or raw streams, text in UTF-8 bytes inside PDF strings,
positioning via Tm/Td/TD/T*. Hostile inputs (truncated, bad xref, bad
deflate, foreign filters) raise ``PdfError`` with stable,
library-independent messages — callers route them into error envelopes.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from dataclasses import dataclass

# ---------------------------------------------------------------- layout
PAGE_W, PAGE_H = 612, 792          # US Letter, 72 dpi points
MARGIN = 72
HEADER_Y = 756                      # top band
BODY_TOP_Y = 714
BODY_BOTTOM_Y = 150
FOOT_TOP_Y = 112                    # footnote band (below a visual gap)
PAGENUM_Y = 40
LEADING = 14
FOOT_LEADING = 10
COL2_X = 322                        # second column x-start (gap > 100 pt)
SIZE_HEADER, SIZE_BODY, SIZE_FOOT, SIZE_PAGENUM = 12, 10, 8, 10

BODY_LINES_PER_COL = (BODY_TOP_Y - BODY_BOTTOM_Y) // LEADING   # 40
_LINE_CHARS = 38                    # wrap width per column

MAX_PDF_BYTES = 32 << 20            # poison-pill guard (cf. png.MAX_PIXELS)
MAX_OBJECTS = 4096
MAX_SHOW_OPS = 200_000


class PdfError(ValueError):
    """Stable, zlib/RE-version-independent parse failure."""


# =================================================================== writer

def _seed_u64(*parts) -> int:
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big")


def _esc(s: str) -> bytes:
    b = s.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _wrap(text: str, width: int) -> list[str]:
    lines: list[str] = []
    cur: list[str] = []
    n = 0
    for w in text.split():
        if n and n + 1 + len(w) > width:
            lines.append(" ".join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += (1 if n else 0) + len(w)
    if cur:
        lines.append(" ".join(cur))
    return lines


def _show_op(x: int, y: int, size: int, text: str, kerned: bool,
             variant: int = 0, hexstr: bool = False) -> bytes:
    """One self-contained BT..ET block whose text lands at (x, y).

    ``variant`` selects the positioning operators (all four reach the
    same final text-space position, so the PARSE is invariant while the
    operator stream differs — this is how the corpus round-trip tests
    cover the whole interpreter, not just Tm):
      0  absolute Tm
      1  Tm one leading above + TL/T* (next-line)
      2  offset Tm + relative Td
      3  Tm one leading above + TL + ' (move-and-show)
    Kerned lines are split into a TJ array with a -333/1000-em word gap;
    ``hexstr`` emits the text as a hex string instead of a literal."""
    if kerned and variant == 3:
        variant = 1   # ' shows a single literal; a TJ array needs the
        # position settled before the show op
    if variant == 1:
        head = (b"BT /F1 %d Tf %d TL 1 0 0 1 %d %d Tm T* "
                % (size, LEADING, x, y + LEADING))
    elif variant == 2:
        head = (b"BT /F1 %d Tf 1 0 0 1 %d %d Tm 10 5 Td "
                % (size, x - 10, y - 5))
    elif variant == 3:
        head = (b"BT /F1 %d Tf %d TL 1 0 0 1 %d %d Tm "
                % (size, LEADING, x, y + LEADING))
    else:
        head = b"BT /F1 %d Tf 1 0 0 1 %d %d Tm " % (size, x, y)
    words = text.split(" ")
    if kerned and len(words) >= 2:
        mid = len(words) // 2
        a, b = " ".join(words[:mid]), " ".join(words[mid:])
        return head + b"[(%s) -333 (%s)] TJ ET\n" % (_esc(a), _esc(b))
    if variant == 3:
        return head + b"(%s) ' ET\n" % _esc(text)
    if hexstr:
        return head + b"<%s> Tj ET\n" % text.encode("utf-8").hex().encode()
    return head + b"(%s) Tj ET\n" % _esc(text)


@dataclass
class PageSpec:
    header: str | None
    col_lines: list[list[str]]      # 1 or 2 columns of body lines
    footnotes: list[str]
    page_number: int | None


def layout_pages(doc_id: int, text: str) -> list[PageSpec]:
    """Deterministic layout plan for a document: seeded choice of
    two-column vs one-column, header/footnote presence, page numbering."""
    seed = _seed_u64("layout", doc_id)
    two_col = bool(seed & 1)
    with_header = bool(seed & 2)
    with_feet = bool(seed & 4)
    with_pagenum = bool(seed & 8)
    # seeded per-column capacity (<= geometric max of 40) so short corpora
    # still exercise multi-page and two-column layouts
    col_cap = (4, 6, 8, 12, 20, 40, 40, 40)[(seed >> 4) & 7]

    lines = _wrap(text, _LINE_CHARS) or [""]
    foot_lines: list[str] = []
    if with_feet and len(lines) > 4:
        # last few lines become footnotes (capped so the footnote band
        # never descends into the page-number band at y<=60)
        k = min(6, max(1, len(lines) // 10))
        foot_lines, lines = lines[-k:], lines[:-k]

    per_page = col_cap * (2 if two_col else 1)
    pages: list[PageSpec] = []
    for p, i in enumerate(range(0, len(lines), per_page)):
        chunk = lines[i:i + per_page]
        if two_col:
            cols = [chunk[:col_cap], chunk[col_cap:]]
            cols = [c for c in cols if c]
        else:
            cols = [chunk]
        pages.append(PageSpec(
            header=f"doc {doc_id} — section {p + 1}" if with_header else None,
            col_lines=cols,
            footnotes=[],
            page_number=(p + 1) if with_pagenum else None,
        ))
    # footnotes belong to the LAST page only
    if pages and foot_lines:
        pages[-1].footnotes = foot_lines
    return pages


def _page_content(doc_id: int, pno: int, spec: PageSpec) -> bytes:
    ops: list[tuple[int, bytes]] = []   # (scramble_key, op_bytes)
    k = 0

    def add(x, y, size, text):
        nonlocal k
        seed = _seed_u64("kern", doc_id, pno, k)
        kerned = bool(seed & 1)
        variant = (seed >> 1) & 3      # Tm / TL+T* / Td / TL+'
        hexstr = bool(seed & 16)
        key = _seed_u64("order", doc_id, pno, k)
        ops.append((key, _show_op(x, y, size, text, kerned, variant,
                                  hexstr)))
        k += 1

    if spec.header:
        add(MARGIN, HEADER_Y, SIZE_HEADER, spec.header)
    for c, col in enumerate(spec.col_lines):
        x = MARGIN if c == 0 else COL2_X
        for j, line in enumerate(col):
            if line:
                add(x, BODY_TOP_Y - j * LEADING, SIZE_BODY, line)
    for j, line in enumerate(spec.footnotes):
        add(MARGIN, FOOT_TOP_Y - j * FOOT_LEADING, SIZE_FOOT, line)
    if spec.page_number is not None:
        add(PAGE_W // 2, PAGENUM_Y, SIZE_PAGENUM, str(spec.page_number))

    # scrambled draw order: reading order must come from coordinates
    ops.sort(key=lambda t: t[0])
    return b"".join(op for _, op in ops)


def build_pdf(doc_id: int, text: str) -> bytes:
    """Deterministic PDF bytes for one document (see module doc)."""
    pages = layout_pages(doc_id, text)
    objs: dict[int, bytes] = {}
    font_num = 3
    objs[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica >>")
    page_nums: list[int] = []
    next_num = 4
    for pno, spec in enumerate(pages):
        content = _page_content(doc_id, pno, spec)
        comp = zlib.compress(content, 6)
        cnum, pnum = next_num, next_num + 1
        next_num += 2
        objs[cnum] = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                      % len(comp)) + comp + b"\nendstream"
        objs[pnum] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
                      b"/Resources << /Font << /F1 %d 0 R >> >> "
                      b"/Contents %d 0 R >>" % (PAGE_W, PAGE_H, font_num, cnum))
        page_nums.append(pnum)
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[2] = (b"<< /Type /Pages /Kids [%s] /Count %d >>"
               % (kids, len(page_nums)))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n, xref_at))
    return bytes(out)


# ============================================================== encryption
# Standard security handler, V1/R2 (40-bit RC4) — the PDF 1.4 subset
# (public spec, ISO 32000 algorithms 2-5). The reference opens encrypted
# PDFs with ``ignoreEncryption: true`` (apps/queue/src/lib/ocr.ts:21-24);
# here the empty-user-password case (the overwhelmingly common "encrypted
# but openable" form that flag targets) DECRYPTS for real, and anything
# else — a real password, another handler/revision, malformed dict —
# raises a stable PdfError that callers route to parse_error rows
# (never-drop). Subset contract: /O /U as hex strings, first /ID element
# hex, V1/R2 only. RC4/MD5 appear for format compatibility when READING
# legacy documents, not as an endorsement of either primitive.

_PAD = bytes((0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
              0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
              0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
              0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A))


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(o: bytes, p: int, id0: bytes,
                  user_pw: bytes = b"") -> bytes:
    """Algorithm 2 (R2/V1): 40-bit file key from the padded user password,
    /O, /P (unsigned little-endian), and the first file ID."""
    padded = (user_pw + _PAD)[:32]
    return hashlib.md5(padded + o
                       + (p & 0xFFFFFFFF).to_bytes(4, "little")
                       + id0).digest()[:5]


def _obj_key(file_key: bytes, num: int, gen: int = 0) -> bytes:
    """Per-object key: MD5(file key + objnum LE3 + gen LE2), truncated."""
    h = hashlib.md5(file_key + num.to_bytes(3, "little")
                    + gen.to_bytes(2, "little")).digest()
    return h[:min(len(file_key) + 5, 16)]


def _owner_value(owner_pw: bytes, user_pw: bytes) -> bytes:
    """Algorithm 3 (R2): /O = RC4 of the padded user password under the
    first 5 MD5 bytes of the padded owner password."""
    key = hashlib.md5((owner_pw + _PAD)[:32]).digest()[:5]
    return _rc4(key, (user_pw + _PAD)[:32])


def encrypt_pdf(data: bytes, user_pw: bytes = b"",
                owner_pw: bytes | None = None) -> bytes:
    """Standard-handler encrypting rewrite of a ``build_pdf`` document —
    exists (like the JPEG/PNG encoders) purely to stage fixtures for the
    decrypt path. RC4 is length-preserving, so every stream is ciphered
    in place; the /Encrypt dict and a fresh trailer (carrying /Encrypt +
    /ID) are appended, which is where the parser's ``rfind(trailer)``
    resolution looks first."""
    if owner_pw is None:
        owner_pw = user_pw
    id0 = hashlib.md5(b"pdf-id|%d|" % len(data) + data[:64]).digest()
    o = _owner_value(owner_pw, user_pw)
    p = -4                                    # all permission bits set
    key = _std_file_key(o, p, id0, user_pw)
    u = _rc4(key, _PAD)

    out = bytearray()
    pos = 0
    max_num = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        max_num = max(max_num, num)
        sm = re.compile(rb"stream\r?\n").search(data, m.end())
        em = data.find(b"endobj", m.end())
        if em == -1:
            raise PdfError("truncated object")
        if sm and sm.start() < em:
            head = data[m.end():sm.start()]
            lm = _LEN_RE.search(head)
            if not lm:
                raise PdfError("stream without direct /Length")
            ln = int(lm.group(1))
            s0 = sm.end()
            out += data[pos:s0]
            out += _rc4(_obj_key(key, num), data[s0:s0 + ln])
            pos = s0 + ln
        else:
            out += data[pos:em]
            pos = em
    out += data[pos:]
    enc_num = max_num + 1
    out += (b"%d 0 obj\n<< /Filter /Standard /V 1 /R 2 /O <%s> /U <%s> "
            b"/P %d >>\nendobj\n"
            % (enc_num, o.hex().encode(), u.hex().encode(), p))
    rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", data)
    root = int(rm.group(1)) if rm else 1
    idh = id0.hex().encode()
    out += (b"trailer\n<< /Size %d /Root %d 0 R /Encrypt %d 0 R "
            b"/ID [<%s> <%s>] >>\nstartxref\n0\n%%%%EOF\n"
            % (enc_num + 1, root, enc_num, idh, idh))
    return bytes(out)


def _encryption(data: bytes,
                objs: dict[int, tuple[bytes, bytes | None]]):
    """Detect + key the standard security handler. Returns the file key,
    or None when the document is unencrypted. Raises stable PdfErrors for
    everything this subset cannot open — callers never drop the row."""
    t = data.rfind(b"trailer")
    scope = data[t:] if t != -1 else data
    em = re.search(rb"/Encrypt\s+(\d+)\s+0\s+R", scope)
    if not em:
        return None
    enc_num = int(em.group(1))
    if enc_num not in objs:
        raise PdfError("dangling encrypt reference")
    head = objs[enc_num][0]
    if b"/Standard" not in head:
        raise PdfError("unsupported security handler")
    vm = re.search(rb"/V\s+(\d+)", head)
    rm = re.search(rb"/R\s+(\d+)", head)
    if (int(vm.group(1)) if vm else 0, int(rm.group(1)) if rm else 0) \
            != (1, 2):
        raise PdfError("unsupported encryption revision")
    om = re.search(rb"/O\s*<([0-9A-Fa-f]+)>", head)
    um = re.search(rb"/U\s*<([0-9A-Fa-f]+)>", head)
    pm = re.search(rb"/P\s+(-?\d+)", head)
    idm = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", scope)
    if not (om and um and pm):
        raise PdfError("malformed encryption dictionary")
    if not idm:
        raise PdfError("encrypted PDF without file ID")
    key = _std_file_key(bytes.fromhex(om.group(1).decode()),
                        int(pm.group(1)),
                        bytes.fromhex(idm.group(1).decode()))
    if _rc4(key, _PAD) != bytes.fromhex(um.group(1).decode()):
        # algorithm 6 check failed — the empty user password doesn't open it
        raise PdfError("encrypted PDF (password required)")
    return key


# =================================================================== parser

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R\b")
_LEN_RE = re.compile(rb"/Length\s+(\d+)\b")
_NUM_RE = re.compile(rb"[+-]?\d*\.?\d+")


def _scan_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """objnum → (dict/body bytes, stream bytes or None). Streams are sliced
    by their direct /Length — never regex-searched, so stream payloads
    containing PDF keywords cannot confuse the scan."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    count = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        count += 1
        if count > MAX_OBJECTS:
            raise PdfError("too many objects")
        num = int(m.group(1))
        body_start = m.end()
        sm = re.compile(rb"stream\r?\n").search(data, body_start)
        em = data.find(b"endobj", body_start)
        if em == -1:
            raise PdfError("truncated object")
        if sm and sm.start() < em:
            head = data[body_start:sm.start()]
            lm = _LEN_RE.search(head)
            if not lm:
                raise PdfError("stream without direct /Length")
            ln = int(lm.group(1))
            s0 = sm.end()
            if s0 + ln > len(data):
                raise PdfError("truncated stream")
            stream = data[s0:s0 + ln]
            em = data.find(b"endobj", s0 + ln)
            if em == -1:
                raise PdfError("truncated object")
            objs[num] = (head, stream)
            pos = em + 6
        else:
            objs[num] = (data[body_start:em], None)
            pos = em + 6
    if not objs:
        raise PdfError("no objects")
    return objs


def _inflate(head: bytes, stream: bytes) -> bytes:
    if b"/Filter" not in head:
        return stream
    if b"/FlateDecode" not in head:
        raise PdfError("unsupported stream filter")
    try:
        return zlib.decompress(stream)
    except zlib.error:
        raise PdfError("bad deflate stream") from None


def _resolve_pages(data: bytes,
                   objs: dict[int, tuple[bytes, bytes | None]]) -> list[int]:
    """trailer /Root → catalog /Pages → /Kids, in document order."""
    t = data.rfind(b"trailer")
    root = None
    if t != -1:
        rm = re.search(rb"/Root\s+(\d+)\s+0\s+R", data[t:])
        if rm:
            root = int(rm.group(1))
    if root is None or root not in objs:
        # damaged trailer: fall back to the (unique) catalog object
        cands = [n for n, (h, _) in objs.items() if b"/Type /Catalog" in h]
        if len(cands) != 1:
            raise PdfError("no document root")
        root = cands[0]
    pm = re.search(rb"/Pages\s+(\d+)\s+0\s+R", objs[root][0])
    if not pm or int(pm.group(1)) not in objs:
        raise PdfError("no page tree")
    tree = objs[int(pm.group(1))][0]
    km = re.search(rb"/Kids\s*\[(.*?)\]", tree, re.S)
    if not km:
        raise PdfError("no page kids")
    kids = [int(g) for g in _REF_RE.findall(km.group(1))]
    if not kids or any(k not in objs for k in kids):
        raise PdfError("dangling page reference")
    return kids


def _pdf_string_tokens(buf: bytes, i: int) -> tuple[str, int]:
    """Parse a literal string starting at '(' — returns (text, next index)."""
    assert buf[i:i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C:                      # backslash
            if i + 1 >= n:
                break
            d = buf[i + 1]
            if d in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f"}[d]
                i += 2
            elif d in b"()\\":
                out.append(d)
                i += 2
            elif 0x30 <= d <= 0x37:        # \ooo octal, up to 3 digits
                j = i + 1
                oct_digits = bytearray()
                while j < n and len(oct_digits) < 3 and 0x30 <= buf[j] <= 0x37:
                    oct_digits.append(buf[j])
                    j += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
                i = j
            else:
                i += 1                     # unknown escape: drop backslash
        elif c == 0x28:                    # nested (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:                    # )
            depth -= 1
            if depth == 0:
                return out.decode("utf-8", errors="replace"), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise PdfError("unterminated string")


@dataclass
class _Run:
    x: float
    y: float
    size: float
    text: str


def _interpret(content: bytes) -> list[_Run]:
    """Minimal text-operator interpreter → positioned text runs."""
    runs: list[_Run] = []
    stack: list = []               # operand stack: numbers / strings / arrays
    tx = ty = 0.0
    size = 0.0
    leading = 0.0
    i, n = 0, len(content)
    arr: list | None = None

    def show(parts) -> None:
        if len(runs) >= MAX_SHOW_OPS:
            raise PdfError("too many text operators")
        # TJ: numbers are -thousandths-of-em kerning; a shift wider than
        # 0.18 em reads as a word gap
        text = ""
        for p in parts:
            if isinstance(p, str):
                text += p
            elif p <= -180:
                text += " "
        if text:
            runs.append(_Run(tx, ty, size, text))

    while i < n:
        c = content[i:i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"(":
            s, i = _pdf_string_tokens(content, i)
            (arr if arr is not None else stack).append(s)
        elif c == b"<":
            j = content.find(b">", i)
            if j == -1:
                raise PdfError("unterminated hex string")
            hx = re.sub(rb"\s", b"", content[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            try:
                s = bytes.fromhex(hx.decode("ascii")).decode(
                    "utf-8", errors="replace")
            except ValueError:
                raise PdfError("bad hex string") from None
            (arr if arr is not None else stack).append(s)
            i = j + 1
        elif c == b"[":
            arr = []
            i += 1
        elif c == b"]":
            stack.append(arr if arr is not None else [])
            arr = None
            i += 1
        elif c == b"/":
            m = re.compile(rb"/[^\s\[\]()<>/]*").match(content, i)
            i = m.end()
            stack.append(m.group().decode("latin-1"))
        else:
            m = _NUM_RE.match(content, i)
            if m and re.match(rb"[+-]?\d|\.\d", content[i:i + 2]):
                v = float(m.group())
                (arr if arr is not None else stack).append(v)
                i = m.end()
                continue
            m = re.compile(rb"[A-Za-z'\"*]+").match(content, i)
            if not m:
                i += 1
                continue
            op = m.group()
            i = m.end()
            if op == b"Tf" and len(stack) >= 1:
                size = float(stack[-1])
            elif op == b"Tm" and len(stack) >= 6:
                tx, ty = float(stack[-2]), float(stack[-1])
            elif op == b"Td" and len(stack) >= 2:
                tx += float(stack[-2])
                ty += float(stack[-1])
            elif op == b"TD" and len(stack) >= 2:
                leading = -float(stack[-1])
                tx += float(stack[-2])
                ty += float(stack[-1])
            elif op == b"TL" and stack:
                leading = float(stack[-1])
            elif op == b"T*":
                ty -= leading
            elif op == b"Tj" and stack and isinstance(stack[-1], str):
                show([stack[-1]])
            elif op == b"'":
                ty -= leading
                if stack and isinstance(stack[-1], str):
                    show([stack[-1]])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                show(stack[-1])
            stack.clear()
    return runs


@dataclass
class PdfPage:
    page_no: int                  # 0-based physical index
    header: str | None
    body: str
    footnotes: str | None
    page_number: int | None       # printed-on-page (None if absent)
    n_columns: int
    n_lines: int

    @property
    def text(self) -> str:
        parts = [p for p in (self.header, self.body, self.footnotes) if p]
        return "\n".join(parts)


_DIGITS_ONLY = re.compile(r"[0-9]{1,5}$")


def _analyze_page(pno: int, runs: list[_Run]) -> PdfPage:
    """XY-band layout analysis: lines from y-clusters, columns from the
    x-start gap, regions from (band, size), reading order col1→col2."""
    if not runs:
        return PdfPage(pno, None, "", None, None, 1, 0)

    # cluster runs into lines on (rounded y); merge same-line runs by x
    by_line: dict[float, list[_Run]] = {}
    for r in runs:
        key = round(r.y / 2.0) * 2.0
        by_line.setdefault(key, []).append(r)

    header_parts: list[tuple[float, str]] = []
    feet: list[tuple[float, str]] = []
    body_lines: list[tuple[float, float, str]] = []   # (x, y, text)
    page_number = None

    for y in by_line:
        parts = sorted(by_line[y], key=lambda r: r.x)
        # a line may hold one run per column — keep runs separate for
        # column assignment; only merge runs closer than 1pt
        for r in parts:
            txt = r.text.strip()
            if not txt:
                continue
            if r.y <= 60 and _DIGITS_ONLY.fullmatch(txt):
                page_number = int(txt)
            elif r.y >= PAGE_H * 0.93:
                header_parts.append((r.x, txt))
            elif r.y <= PAGE_H * 0.18 and r.size < 9:
                feet.append((-r.y, txt))
            else:
                body_lines.append((r.x, r.y, txt))

    # column detection: split body x-starts at the widest gap if > 100pt
    n_columns = 1
    cols: list[list[tuple[float, float, str]]] = [body_lines]
    xs = sorted({x for x, _, _ in body_lines})
    if len(xs) >= 2:
        gaps = [(xs[i + 1] - xs[i], i) for i in range(len(xs) - 1)]
        widest, at = max(gaps)
        if widest > 100:
            split = (xs[at] + xs[at + 1]) / 2
            left = [t for t in body_lines if t[0] < split]
            right = [t for t in body_lines if t[0] >= split]
            # a >100pt gap in line starts is column structure even when one
            # side holds a single line (a short trailing second column)
            if left and right:
                cols = [left, right]
                n_columns = 2

    ordered: list[str] = []
    for col in cols:
        ordered.extend(t for _, _, t in sorted(col, key=lambda t: (-t[1], t[0])))

    header = " ".join(t for _, t in sorted(header_parts)) or None
    footnotes = "\n".join(t for _, t in sorted(feet)) or None
    body = "\n".join(ordered)
    n_lines = len(ordered) + len(feet) + (1 if header else 0)
    return PdfPage(pno, header, body, footnotes, page_number,
                   n_columns, n_lines)


def parse_pdf_runs(data: bytes) -> list[list[_Run]]:
    """Object graph → decrypt → inflate → interpret: the positioned text
    runs of every page, in document order. The shared front half of
    ``parse_pdf`` (layout analysis) and the rasterizer
    (functions/pdfrender.py, which needs coordinates, not text)."""
    if not data or not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF")
    if len(data) > MAX_PDF_BYTES:
        raise PdfError("PDF exceeds size cap")
    objs = _scan_objects(data)
    file_key = _encryption(data, objs)
    pages = _resolve_pages(data, objs)
    out: list[list[_Run]] = []
    for pref in pages:
        head, _ = objs[pref]
        cm = re.search(rb"/Contents\s+(\d+)\s+0\s+R", head)
        if not cm or int(cm.group(1)) not in objs:
            raise PdfError("page without contents")
        cnum = int(cm.group(1))
        chead, cstream = objs[cnum]
        if cstream is None:
            raise PdfError("contents is not a stream")
        if file_key is not None:
            # streams are ciphered under their owning object's key; the
            # decrypt happens BEFORE the filter (encrypt-after-compress)
            cstream = _rc4(_obj_key(file_key, cnum), cstream)
        out.append(_interpret(_inflate(chead, cstream)))
    return out


def parse_pdf(data: bytes) -> list[PdfPage]:
    """Parse + layout-analyze a PDF. Raises PdfError on malformed input."""
    return [_analyze_page(pno, runs)
            for pno, runs in enumerate(parse_pdf_runs(data))]
