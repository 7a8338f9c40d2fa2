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

# Minimal tag stripper with the same observable behavior as the reference's
# string-strip-html for our inputs: remove tags, drop script/style content,
# decode entities; tag boundaries become separators.
_TAG_RE = regex.compile(r"<[^>]*>")
_SCRIPT_RE = regex.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", regex.IGNORECASE | regex.DOTALL
)


def strip_html(text: str) -> str:
    """Strip HTML tags, replacing them with a space, then collapse whitespace.

    Fast paths skip the regex passes when their trigger characters are
    absent (tag-free and entity-free inputs are common); outputs are
    identical to the unconditional pipeline.
    """
    import html as _html

    if "<" in text:
        text = _SCRIPT_RE.sub(" ", text)
        text = _TAG_RE.sub(" ", text)
    if "&" in text:
        text = _html.unescape(text)
    # " ".join(split()) ≡ collapse-whitespace-runs + strip, at C speed
    return " ".join(text.split())


def count_words(text: str | None) -> int:
    """Unicode word-token count over HTML-stripped text (F1)."""
    if not text:
        return 0
    return len(WORD_RE.findall(strip_html(text)))


def count_page_words(content: str | None, footnotes: str | None) -> int:
    """Page total = body words + footnote words (ref page/worker.ts:55-59)."""
    return count_words(content) + count_words(footnotes)
