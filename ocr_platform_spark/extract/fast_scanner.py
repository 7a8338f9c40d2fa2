"""Regex-driven HTML tokenizer — a drop-in fast path for block parsing.

``html.parser`` is recovery-oriented but pays heavy pure-Python dispatch per
tag (profiling: ~2/3 of extraction time is parser machinery, not our block
logic). This scanner walks the byte stream with one compiled regex and
feeds the SAME ``_BlockSink`` callbacks as the stdlib path, so block output
is identical; tests/test_fast_scanner.py asserts equality against the
stdlib engine over the full synthetic corpus, all golden fixtures, and a
battery of malformed-HTML edge cases.

Fidelity notes (mirroring html.parser with convert_charrefs=True):
- text runs between tags are passed through ``html.unescape`` exactly like
  HTMLParser.goahead does;
- <script>/<style> content is CDATA: consumed raw until the matching
  close tag, never tokenized (html.parser's set_cdata_mode);
- tag names are lowercased; self-closing start tags dispatch to
  ``startendtag`` (our sink: <br/>/<hr/> only);
- comments/declarations/PIs are consumed silently (the sink defines no
  handlers for them);
- any '<' that does not begin a well-formed construct is literal text,
  as is an unterminated construct at EOF.
"""

from __future__ import annotations

import re
from html import unescape

# start tag: name, attr soup (quote-aware so '>' inside quotes is safe),
# optional self-closing slash
_START = (
    r"(?P<name>[a-zA-Z][^\t\n\r\f />\x00]*)"
    r"(?P<attrs>(?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"
    r"(?P<selfclose>/?)>"
)
_TOKEN = re.compile(
    r"<(?:"
    r"(?P<comment>!--.*?-->)|"
    r"(?P<decl>![^>]*>)|"
    r"(?P<pi>\?[^>]*>)|"
    r"(?P<end>/(?P<endname>[a-zA-Z][^\t\n\r\f />\x00]*)[^>]*>)|"
    r"(?P<bogusend>/[^>]*>)|"
    + _START +
    r")",
    re.DOTALL,
)

_CLASS_ATTR = re.compile(
    r"""[\s/]class\s*=\s*("(?P<dq>[^"]*)"|'(?P<sq>[^']*)'|(?P<uq>[^\s"'>]+))""",
    re.IGNORECASE,
)

# CDATA close finders, per html.parser's set_cdata_mode(tag)
_CDATA_CLOSE = {
    "script": re.compile(r"</script", re.IGNORECASE),
    "style": re.compile(r"</style", re.IGNORECASE),
}
_END_AFTER_CDATA = re.compile(r"[^>]*>")


def scan(html: str, sink) -> None:
    """Tokenize ``html``, dispatching to sink.handle_starttag /
    handle_endtag / handle_startendtag / handle_data (html.parser callback
    contract, attrs limited to what the sink reads: ``class``)."""
    pos = 0
    n = len(html)
    find_lt = html.find
    while pos < n:
        lt = find_lt("<", pos)
        if lt < 0:
            sink.handle_data(unescape(html[pos:]))
            return
        if lt > pos:
            sink.handle_data(unescape(html[pos:lt]))
        m = _TOKEN.match(html, lt)
        if m is None:
            # '<' not starting a construct (or unterminated at EOF):
            # literal text through the next char, like html.parser recovery
            nxt = find_lt("<", lt + 1)
            if nxt < 0:
                sink.handle_data(unescape(html[lt:]))
                return
            sink.handle_data(unescape(html[lt:nxt]))
            pos = nxt
            continue
        pos = m.end()
        name = m.group("name")
        if name is not None:
            tag = name.lower()
            attrs_raw = m.group("attrs")
            attrs: list[tuple[str, str | None]] = []
            if attrs_raw and "class" in attrs_raw.lower():
                # emit every class attr (duplicates included) — the sink's
                # own last-non-empty-wins loop then matches html.parser
                for cm in _CLASS_ATTR.finditer(attrs_raw):
                    val = cm.group("dq")
                    if val is None:
                        val = cm.group("sq")
                    if val is None:
                        val = cm.group("uq")
                    attrs.append(("class", unescape(val)))
            if m.group("selfclose"):
                sink.handle_startendtag(tag, attrs)
            else:
                sink.handle_starttag(tag, attrs)
                closer = _CDATA_CLOSE.get(tag)
                if closer is not None:
                    # raw-text element: consume to its close tag unparsed
                    cm2 = closer.search(html, pos)
                    if cm2 is None:
                        sink.handle_endtag(tag)  # EOF inside script/style
                        return
                    em = _END_AFTER_CDATA.match(html, cm2.end())
                    pos = em.end() if em else n
                    sink.handle_endtag(tag)
            continue
        endname = m.group("endname")
        if endname is not None:
            sink.handle_endtag(endname.lower())
        # comments / decls / PIs: consumed silently
