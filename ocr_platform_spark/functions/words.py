"""Word counting + HTML stripping — F1/P7/P8 in SURVEY.md.

Exact reference semantics (apps/web/src/lib/page.ts:3-20, duplicated at
apps/queue/src/queues/page/worker.ts:12-17):

    words = stripHtml(text).trim().match(/[\\p{L}\\p{M}\\p{N}]+/gu)
    count = words ? words.length : 0
    page total = count(content) + count(footnotes)

We use the ``regex`` module for true Unicode property classes — Java/Spark
regex and Python ``re`` differ on \\p{M} handling, so this must stay in
Python (called from pandas UDFs, never re-expressed in Spark SQL).
"""

from __future__ import annotations

import regex

WORD_RE = regex.compile(r"[\p{L}\p{M}\p{N}]+")

# deletion table for every BMP combining mark (category M*): backs the
# count_words diacritics fast path; non-BMP marks just miss the fast path
# and take the exact regex fallback
import unicodedata as _ud

_MARK_DELETE = {c: None for c in range(0x10000)
                if _ud.category(chr(c)).startswith("M")}
del _ud

# Minimal tag stripper with the same observable behavior as the reference's
# string-strip-html for our inputs: remove tags, drop script/style content,
# decode entities; tag boundaries become separators.
_TAG_RE = regex.compile(r"<[^>]*>")
# reference semantics (kept for the parity fuzz test): closed raw-text
# elements have their content removed; unclosed ones are left for _TAG_RE
_SCRIPT_RE = regex.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", regex.IGNORECASE | regex.DOTALL
)
_RAW_ELEMENTS = ("script", "style", "noscript")
# the EXACT word-char class regex \b is defined by — an ASCII approximation
# diverges both ways ('<script->' is a \b boundary, '<scriptñ>' is not)
_WORD_CHAR_RE = regex.compile(r"\w")


def _drop_raw_elements(text: str) -> str:
    """Linear equivalent of ``_SCRIPT_RE.sub(" ", text)`` — the lazy-regex
    form degrades quadratically on adversarial runs of unclosed
    ``<script`` opens (N starts x scan-to-end each), which would stall an
    executor task on a poison-pill document. Valid close positions are
    precomputed once per tag; each open then bisects for the first close
    past its '>': O(n + opens·log closes)."""
    import bisect

    lower = text.lower()
    if not any("<" + t in lower for t in _RAW_ELEMENTS):
        return text  # common case: no raw-text elements at all
    n = len(text)
    # per tag: sorted (close_start, consume_end) of VALID closes (</tag\s*>)
    closes: dict[str, tuple[list[int], list[int]]] = {}
    for tag in _RAW_ELEMENTS:
        starts: list[int] = []
        ends: list[int] = []
        k = lower.find("</" + tag)
        while k != -1:
            j = k + 2 + len(tag)
            while j < n and text[j].isspace():
                j += 1
            if j < n and text[j] == ">":
                starts.append(k)
                ends.append(j + 1)
            k = lower.find("</" + tag, k + 1)
        closes[tag] = (starts, ends)
    out: list[str] = []
    pos = 0
    # memoized next-occurrence per tag (re-find only once consumed) — a
    # fresh find per iteration would rescan to EOF for absent tags
    next_open = {tag: lower.find("<" + tag) for tag in _RAW_ELEMENTS}
    while pos < n:
        best = -1
        which = ""
        for tag in _RAW_ELEMENTS:
            i = next_open[tag]
            if i != -1 and i < pos:
                i = next_open[tag] = lower.find("<" + tag, pos)
            if i != -1 and (best == -1 or i < best):
                best, which = i, tag
        if best == -1:
            out.append(text[pos:])
            break
        after = best + 1 + len(which)
        nxt = text[after:after + 1]
        if nxt and _WORD_CHAR_RE.fullmatch(nxt):  # no \b (e.g. <scripty)
            out.append(text[pos:after])
            pos = after
            continue
        gt = lower.find(">", after)
        if gt == -1:               # open tag never closes with '>'
            out.append(text[pos:])
            break
        starts, ends = closes[which]
        ci = bisect.bisect_right(starts, gt)
        if ci >= len(starts):
            # unclosed: leave everything for _TAG_RE (regex would not match)
            out.append(text[pos:best + 1])
            pos = best + 1
            continue
        out.append(text[pos:best])
        out.append(" ")
        pos = ends[ci]
    return "".join(out)


import html as _html


def _strip_tags_entities(text: str) -> str:
    """strip_html minus its final whitespace canonicalization — shared by
    strip_html and count_words so the tag/entity pipeline can never
    silently diverge between them. Fast paths skip the regex passes when
    their trigger characters are absent (tag-free and entity-free inputs
    are common); outputs are identical to the unconditional pipeline."""
    if "<" in text:
        text = _drop_raw_elements(text)
        text = _TAG_RE.sub(" ", text)
    if "&" in text:
        text = _html.unescape(text)
    return text


def strip_html(text: str) -> str:
    """Strip HTML tags, replacing them with a space, then collapse
    whitespace."""
    # " ".join(split()) ≡ collapse-whitespace-runs + strip, at C speed
    return " ".join(_strip_tags_entities(text).split())


def count_words(text: str | None) -> int:
    """Unicode word-token count over HTML-stripped text (F1).

    Semantics: ``len(WORD_RE.findall(strip_html(text)))``. The hot loop
    fast-paths whitespace tokens that are fully alphanumeric: str.isalnum
    true ⇒ every char is \\p{L} or \\p{N} ⇒ the token IS exactly one
    WORD_RE match (the class has no whitespace, so matches never span
    tokens). Second-level fast path for diacritic-bearing tokens (the
    common miss in Arabic-script text): delete every category-M char with
    a C-speed ``translate``; an alphanumeric (or empty — all-marks)
    residue proves the token ⊂ L∪M∪N ⇒ again exactly one match. Anything
    else (punctuation, symbols) falls back to the regex. ~10x faster than
    findall over the whole string — this sits inside the per-document
    extraction kernel.
    """
    if not text:
        return 0
    # strip_html minus its final " ".join(split()): the token loop splits
    # anyway, and " ".join(x.split()).split() == x.split(), so the
    # canonicalizing join is two wasted passes + one allocation per document
    # in the hot path. Token stream (hence count) is identical.
    n = 0
    findall = WORD_RE.findall
    for tok in _strip_tags_entities(text).split():
        if tok.isalnum():
            n += 1
        else:
            t2 = tok.translate(_MARK_DELETE)
            if not t2 or t2.isalnum():
                n += 1
            else:
                n += len(findall(tok))
    return n


def count_page_words(content: str | None, footnotes: str | None) -> int:
    """Page total = body words + footnote words (ref page/worker.ts:55-59)."""
    return count_words(content) + count_words(footnotes)
