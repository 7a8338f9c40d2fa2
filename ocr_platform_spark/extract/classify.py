"""Content-vs-boilerplate block classifier (boilerpipe/trafilatura-style).

The reference delegates "which text is the page's content" to a temperature-0
LLM (ref: apps/queue/src/pipeline/convert-to-html.ts:20-52); we replace the
judgment with deterministic DOM heuristics using the canonical published
signals — link density, text density (word count), tag path — with fixed
thresholds, as mandated by BASELINE.json's north_star.

Pure function; no Spark imports.
"""

from __future__ import annotations

import re

from ocr_platform_spark.extract.html_blocks import Block

# Fixed thresholds (boilerpipe's NumWordsRulesClassifier uses link density
# 0.33 as its primary cut; short low-density blocks are chrome).
MAX_LINK_DENSITY = 0.33
MIN_CONTENT_WORDS = 3
# CJK scripts have no word delimiters, so a whole paragraph counts as ONE
# whitespace word and would fail the gate above; trafilatura-style
# adaptation: enough ideographs also qualifies a block as content
# (~2 chars per word → 6 chars ≈ the 3-word gate).
MIN_CONTENT_CJK_CHARS = 6
_CJK_RANGES = (
    (0x3040, 0x30FF),    # hiragana + katakana
    (0x3400, 0x4DBF),    # CJK ext A
    (0x4E00, 0x9FFF),    # CJK unified
    (0xAC00, 0xD7AF),    # hangul syllables
    (0xF900, 0xFAFF),    # CJK compat
    (0x20000, 0x2FA1F),  # CJK ext B+ (astral)
)


def _cjk_chars(text: str) -> int:
    return sum(1 for ch in text
               if any(lo <= ord(ch) <= hi for lo, hi in _CJK_RANGES))

# Path components that mark navigation / chrome subtrees.
CHROME_PATH_TAGS = ("nav", "aside", "form")
CHROME_CLASS_RE = re.compile(
    r"\b(nav|menu|sidebar|breadcrumb|banner|advert|ad-|social|share|comment|"
    r"related|widget|cookie|copyright)\b",
    re.IGNORECASE,
)
FOOTNOTE_CLASS_RE = re.compile(r"\b(footnote|footnotes|fn|hamish)\b", re.IGNORECASE)

# Footnote line marker: (1) / 1. / 1) with Western or Eastern-Arabic digits,
# numbering styles per ref convert-to-html.ts:15 ("(1)/1./1)").
FOOTNOTE_MARK_RE = re.compile(r"^[\(\[]?[0-9٠-٩۰-۹]{1,3}[\)\]\.\-:]\s")

# Standalone page number: digits possibly wrapped in decoration (- 31 -, ~31~).
PAGENUM_RE = re.compile(
    r"^[\s\-–—~_\*\[\(]*[0-9٠-٩۰-۹]{1,5}[\s\-–—~_\*\]\)]*$"
)

# Structural containers emit their own (usually whitespace-only or duplicated)
# blocks; only leaf-ish tags carry content.
CONTENT_TAGS = frozenset(
    {
        "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "dt", "dd",
        "td", "th", "caption", "blockquote", "pre", "figcaption",
        "div", "center", "section", "article", "main", "body", "header",
    }
)


def _in_chrome(block: Block) -> bool:
    # path is a '/'-join of BLOCK_TAGS (html_blocks pushes only those), and
    # no block tag contains "nav"/"aside"/"form" as a proper substring, so a
    # C-speed substring probe is exactly equivalent to split-and-member —
    # this runs per block and the split allocation showed up in profiles
    path = block.path
    if "nav" in path or "aside" in path or "form" in path:
        return True
    if block.tag in ("nav", "aside", "form"):
        return True
    if CHROME_CLASS_RE.search(block.classes):
        return True
    return False


def _in_footer(block: Block) -> bool:
    # same substring-probe equivalence: no BLOCK_TAG contains "footer"
    return block.tag == "footer" or "footer" in block.path


def is_footnote_text(text: str) -> bool:
    return bool(FOOTNOTE_MARK_RE.match(text))


def is_page_number(text: str) -> bool:
    return bool(PAGENUM_RE.match(text))


def classify_blocks(blocks: list[Block]) -> list[tuple[Block, str]]:
    """Label each block ``content`` / ``footnote`` / ``pagenum`` / ``heading``
    / ``boilerplate``. Returns (block, label) pairs in document order —
    dropped blocks stay in the list (labelled ``boilerplate``) so lineage
    counters (blocks kept/dropped) fall out for free.
    """
    out: list[tuple[Block, str]] = []
    for b in blocks:
        label = _classify_one(b)
        out.append((b, label))
    return out


def _classify_one(b: Block) -> str:
    if b.tag == "title":
        return "boilerplate"  # window title, not page content
    if b.tag not in CONTENT_TAGS and b.tag != "footer":
        return "boilerplate"  # structural container (ul/table/tr/...)
    if _in_chrome(b):
        return "boilerplate"
    if b.link_density > MAX_LINK_DENSITY and not b.headline:
        return "boilerplate"

    footnote_hint = bool(FOOTNOTE_CLASS_RE.search(b.classes))
    if is_page_number(b.text):
        return "pagenum"
    if footnote_hint or (is_footnote_text(b.text) and b.sup_marks == 0 and not b.headline):
        # marker-led short lines in the page tail are footnotes; the
        # segmenter enforces the "trailing region" constraint
        return "footnote"

    if _in_footer(b):
        # footers hold either footnotes (handled above) or copyright chrome
        return "boilerplate"
    if b.headline:
        return "heading"
    if b.n_words < MIN_CONTENT_WORDS \
            and _cjk_chars(b.text) < MIN_CONTENT_CJK_CHARS:
        # short stray fragments are chrome unless they look like a header
        # line (the segmenter may still promote the first heading); CJK
        # text is delimiter-free, so ideograph count substitutes for words
        return "boilerplate"
    return "content"
