"""Regex-driven HTML tokenizer — a drop-in fast path for block parsing.

``html.parser`` is recovery-oriented but pays heavy pure-Python dispatch per
tag (profiling: ~2/3 of extraction time was parser machinery, not our block
logic). This scanner walks the byte stream with compiled regexes and feeds
the SAME ``_BlockParser`` callbacks as the stdlib path, so block output is
identical. Parity is enforced by tests/test_fast_scanner.py: a differential
suite over the full synthetic corpus, every golden fixture, 40+ hand-picked
malformed-HTML edges, and a hypothesis tag-soup fuzzer.

The tag grammar below deliberately mirrors the stdlib tokenizer semantics
(CPython Lib/html/parser.py, html5-tolerant variants) so recovery behavior
on malformed input is identical:

- tolerant tag-name / attribute grammar (quotes delimit only after ``=``;
  bare values may contain ``<``, ``/``, interior quotes);
- junk start tags (``<div class==>``-style) are emitted as raw data;
- <script>/<style> content is CDATA until a *strict* matching close tag;
  a non-matching ``</scriptx>`` inside stays data;
- ``</>`` and bogus ``</...>`` end tags are consumed silently;
- an unterminated construct at EOF emits data up to and including the next
  ``'>'`` (else up to the next ``'<'``, else one char) and resumes;
- text runs are passed through ``html.unescape`` (convert_charrefs=True).
"""

from __future__ import annotations

import re
from html import unescape

_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
_ATTRFIND = re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*")
_LOCATE_START = re.compile(
    r"<[a-zA-Z][^\t\n\r\f />\x00]*"
    r"(?:[\s/]*"
    r"(?:(?<=['\"\s/])[^\s/>][^\s/=>]*"
    r"(?:\s*=+\s*"
    r"(?:'[^']*'"
    r"|\"[^\"]*\""
    r"|(?!['\"])[^>\s]*"
    r")"
    r"\s*"
    r")?(?:\s|/(?!>))*"
    r")*"
    r")?"
    r"\s*")
_ENDTAG_STRICT = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENT_CLOSE = re.compile(r"--\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE = re.compile(r"]\s*>")
_CDATA_ELEMENTS = ("script", "style")
_ASCII_ALPHA_EQ_SLASH = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")

# One-shot fast path for the overwhelmingly common tag shape: lowercase-ish
# name, zero or more space-separated double-quoted attributes whose values
# contain no <, >, & (so no unescape needed and the full-grammar scanner
# would produce the identical result), closed by > or />. Anything else
# falls back to the grammar-mirroring _starttag.
_SIMPLE_START = re.compile(
    r"<([a-zA-Z][-a-zA-Z0-9]*)"
    # attr names lowercase-only: the full path lowercases names before the
    # class compare, so CLASS="x" must fall back to it
    r"((?:\s+[a-z_:][-a-z0-9_:.]*=\"[^\"<>&]*\")*)"
    r"\s*(/?)>")
_SIMPLE_CLASS = re.compile(r"\bclass=\"([^\"]*)\"")
_SIMPLE_END = re.compile(r"</([a-zA-Z][-.a-zA-Z0-9:_]*)>")


def _starttag(html: str, i: int, n: int, sink) -> int:
    """Mirror of parse_starttag + check_for_whole_start_tag.
    Returns the new position, or -1 if the tag is incomplete at EOF."""
    j = _LOCATE_START.match(html, i).end()
    nxt = html[j:j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/":
        if html.startswith("/>", j):
            endpos = j + 2
        else:
            return -1
    elif nxt == "":
        return -1
    elif nxt in _ASCII_ALPHA_EQ_SLASH:
        return -1
    else:
        endpos = j if j > i else i + 1
    tm = _TAGFIND.match(html, i + 1)
    k = tm.end()
    tag = tm.group(1).lower()
    attrs: list[tuple[str, str | None]] = []
    while k < endpos:
        am = _ATTRFIND.match(html, k)
        if not am:
            break
        name, rest, val = am.group(1, 2, 3)
        if not rest:
            val = None
        elif val[:1] == "'" == val[-1:] or val[:1] == '"' == val[-1:]:
            val = val[1:-1]
        if val:
            val = unescape(val)
        if name.lower() == "class":  # the only attr the sink reads
            attrs.append(("class", val))
        k = am.end()
    end = html[k:endpos].strip()
    if end not in (">", "/>"):
        sink.handle_data(html[i:endpos])  # junk tag: raw, NOT unescaped
        return endpos
    if end.endswith("/>"):
        sink.handle_startendtag(tag, attrs)
    else:
        sink.handle_starttag(tag, attrs)
        if tag in _CDATA_ELEMENTS:
            return _cdata(html, endpos, n, sink, tag)
    return endpos


def _cdata(html: str, pos: int, n: int, sink, elem: str) -> int:
    """Raw-text mode: content until a STRICT matching close tag is data we
    discard (the sink ignores script/style content); a close tag for a
    different element stays data; EOF inside closes implicitly."""
    finder = re.compile(r"</\s*%s" % elem, re.IGNORECASE)
    while True:
        cm = finder.search(html, pos)
        if cm is None:
            sink.handle_endtag(elem)  # EOF inside cdata
            return n
        em = _ENDTAG_STRICT.match(html, cm.start())
        if em and em.group(1).lower() == elem:
            sink.handle_endtag(elem)
            return em.end()
        # e.g. '</scriptx>' inside <script>: not a real close — stay in cdata
        gt = html.find(">", cm.start() + 1)
        if gt < 0:
            sink.handle_endtag(elem)
            return n
        pos = gt + 1


def _endtag(html: str, i: int, n: int, sink) -> int:
    """Mirror of parse_endtag (outside cdata mode).
    Returns new position, or -1 if incomplete at EOF."""
    gt = html.find(">", i + 1)
    if gt < 0:
        return -1
    gtpos = gt + 1
    em = _ENDTAG_STRICT.match(html, i)
    if em:
        sink.handle_endtag(em.group(1).lower())
        return gtpos
    nm = _TAGFIND.match(html, i + 2)
    if not nm:
        if html[i:i + 3] == "</>":
            return i + 3
        return gtpos  # bogus comment '</...>': consumed silently
    sink.handle_endtag(nm.group(1).lower())
    gt = html.find(">", nm.end())
    return (gt + 1) if gt >= 0 else n


def scan(html: str, sink) -> None:
    """Tokenize ``html``, dispatching to sink.handle_starttag /
    handle_endtag / handle_startendtag / handle_data (html.parser callback
    contract, attrs limited to what the sink reads: ``class``)."""
    pos = 0
    n = len(html)
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            sink.handle_data(unescape(html[pos:]))
            return
        if lt > pos:
            sink.handle_data(unescape(html[pos:lt]))
        c = html[lt + 1] if lt + 1 < n else ""
        k = -1
        if "a" <= c <= "z" or "A" <= c <= "Z":
            sm = _SIMPLE_START.match(html, lt)
            if sm:
                tag, attrstr, selfclose = sm.group(1, 2, 3)
                tag = tag.lower()
                if "class=\"" in attrstr:
                    # last class wins — same as the full attr loop's append
                    # order feeding the sink's overwrite loop
                    attrs = [("class", v) for v in
                             _SIMPLE_CLASS.findall(attrstr)]
                else:
                    attrs = []
                if selfclose:
                    sink.handle_startendtag(tag, attrs)
                    k = sm.end()
                else:
                    sink.handle_starttag(tag, attrs)
                    k = (_cdata(html, sm.end(), n, sink, tag)
                         if tag in _CDATA_ELEMENTS else sm.end())
            else:
                k = _starttag(html, lt, n, sink)
        elif c == "/":
            em = _SIMPLE_END.match(html, lt)
            if em:
                sink.handle_endtag(em.group(1).lower())
                k = em.end()
            else:
                k = _endtag(html, lt, n, sink)
        elif html.startswith("<!--", lt):
            cm = _COMMENT_CLOSE.search(html, lt + 4)
            k = cm.end() if cm else -1       # comment consumed silently
        elif html.startswith("<![", lt):
            # marked section (<![CDATA[..]]>, MS Office <![if..]>); the
            # stdlib raises on unknown keywords — parity includes that
            nm = _DECLNAME.match(html, lt + 3)
            if lt + 3 == n or (nm and nm.end() == n):
                k = -1                       # name runs to EOF: incomplete
            elif nm is None:
                # stdlib's _scan_name raises here; failing identically IS
                # the parity contract (caller maps it to the error envelope)
                raise AssertionError(
                    "expected name token at %r" % html[lt:lt + 20])
            else:
                name = nm.group().lower().strip()
                if name in ("temp", "cdata", "ignore", "include", "rcdata"):
                    mm = _MARKED_CLOSE.search(html, lt + 3)
                elif name in ("if", "else", "endif"):
                    mm = _MS_MARKED_CLOSE.search(html, lt + 3)
                else:
                    raise AssertionError(
                        "unknown status keyword %r in marked section"
                        % html[lt + 3:nm.end()])
                k = mm.end() if mm else -1   # consumed silently
        elif c in "!?":
            gt = find(">", lt + 1)
            k = (gt + 1) if gt >= 0 else -1  # decl / PI consumed silently
        else:
            # literal '<': one char of data, resume right after it
            nxt = find("<", lt + 1)
            sink.handle_data(unescape(html[lt:nxt if nxt >= 0 else n]))
            pos = nxt if nxt >= 0 else n
            continue
        if k < 0:
            # incomplete construct at EOF: html.parser's close() recovery —
            # data up to and including the next '>', else to the next '<',
            # else one char, then resume
            gt = find(">", lt + 1)
            if gt >= 0:
                k = gt + 1
            else:
                nxt = find("<", lt + 1)
                k = nxt if nxt >= 0 else n
                if k == lt:
                    k = lt + 1
            sink.handle_data(unescape(html[lt:k]))
        pos = k
