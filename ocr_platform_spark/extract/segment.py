"""Region segmentation: classified blocks → {header, body, footnotes,
page_number} + extracted_text + char-span offsets.

Contract mirrors the reference's segment stage output schema
(apps/queue/src/pipeline/segment.ts:4-24; golden sample apps/web/output.json):
``header``/``footnotes`` are null when absent; ``body`` is the main text;
``page_number`` is the printed-on-page number (Western or Eastern-Arabic
digits). Blocks are joined with "\\n"; the page-number block is excluded from
the text (it is navigation, not content).

Pure function; no Spark imports.
"""

from __future__ import annotations

import regex
from dataclasses import dataclass, field

from ocr_platform_spark.extract.html_blocks import Block

_DIGIT_MAP = str.maketrans("٠١٢٣٤٥٦٧٨٩۰۱۲۳۴۵۶۷۸۹", "01234567890123456789")
_NUM_RE = regex.compile(r"[0-9٠-٩۰-۹]{1,5}")


@dataclass
class Segmented:
    header: str | None
    body: str
    footnotes: str | None
    page_number: int | None
    extracted_text: str
    # (block_id, start, end, kind) offsets into extracted_text
    spans: list[tuple[int, int, int, str]] = field(default_factory=list)
    blocks_kept: int = 0
    blocks_dropped: int = 0


def _parse_page_number(text: str) -> int | None:
    m = _NUM_RE.search(text)
    if not m:
        return None
    try:
        return int(m.group(0).translate(_DIGIT_MAP))
    except ValueError:
        return None


def segment_blocks(labelled: list[tuple[Block, str]]) -> Segmented:
    """Assemble regions from (block, label) pairs in document order.

    Rules (deterministic, order-stable):
    - header: the first kept block iff it came from a literal ``<header>``
      element or is the page's ``<h1>`` (ref convert-to-html.ts:10 maps
      ``<h1>`` to the book title); later headings stay in the body.
    - page_number: the FIRST block labelled ``pagenum``; excluded from text.
    - footnotes: the trailing contiguous run of ``footnote`` blocks; a
      footnote-looking block in the middle of the page is body text
      (e.g. a numbered hadith line), mirroring "trailing region" semantics.
    - body: everything else kept, joined with "\\n".
    """
    kept = [(b, lab) for b, lab in labelled if lab != "boilerplate"]
    dropped = len(labelled) - len(kept)

    page_number: int | None = None
    rest: list[tuple[Block, str]] = []
    for b, lab in kept:
        if lab == "pagenum":
            if page_number is None:
                page_number = _parse_page_number(b.text)
            continue  # never part of the text
        rest.append((b, lab))

    # header: first block, only for <header>/<h1>
    header_block: Block | None = None
    if rest and rest[0][0].tag in ("header", "h1"):
        header_block = rest[0][0]
        rest = rest[1:]

    # trailing contiguous footnote run
    cut = len(rest)
    while cut > 0 and rest[cut - 1][1] == "footnote":
        cut -= 1
    body_part = rest[:cut]
    foot_part = rest[cut:]

    # assemble text + spans
    spans: list[tuple[int, int, int, str]] = []
    pieces: list[str] = []
    pos = 0

    def emit(block: Block, kind: str) -> None:
        nonlocal pos
        if pieces:
            pos += 1  # the "\n" separator
        start = pos
        pieces.append(block.text)
        pos += len(block.text)
        spans.append((block.block_id, start, pos, kind))

    if header_block is not None:
        emit(header_block, "header")
    for b, lab in body_part:
        emit(b, "heading" if lab == "heading" else "body")
    for b, _ in foot_part:
        emit(b, "footnote")

    extracted_text = "\n".join(pieces)
    header = header_block.text if header_block is not None else None
    body = "\n".join(b.text for b, _ in body_part)
    footnotes = "\n".join(b.text for b, _ in foot_part) if foot_part else None

    return Segmented(
        header=header,
        body=body,
        footnotes=footnotes,
        page_number=page_number,
        extracted_text=extracted_text,
        spans=spans,
        blocks_kept=len(kept),
        blocks_dropped=dropped,
    )
