"""Per-document extraction pipeline: CORRECT → CONVERT_TO_HTML → SEGMENT.

Stage topology mirrors ref apps/queue/src/pipeline/index.ts:8-130 — each
stage short-circuits into an error envelope naming the ``failed_stage``
(index.ts:60-68, 78-86, 96-104), the row is NEVER dropped, and the best
text so far is kept with a NEEDS_ADDITIONAL_REVIEW flag
(ref apps/queue/src/queues/page/worker.ts:41-46). The per-stage
strict→lenient fallback inside a stage mirrors prepareCaller's azure↔claude
retry (ref apps/queue/src/pipeline/utils.ts:16-36).

Stage contents are deterministic re-expressions of the reference's LLM
stages (temperature-0 contracts):
  CORRECT          text normalization      (ref pipeline/correct.ts:3-49)
  CONVERT_TO_HTML  structure recovery      (ref pipeline/convert-to-html.ts:3-52)
  SEGMENT          region segmentation     (ref pipeline/segment.ts:39-91)

Pure function of (url, html bytes); no Spark imports; this module IS the
golden-file oracle.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field

from ocr_platform_spark.extract.charset import decode_html
from ocr_platform_spark.extract.classify import classify_blocks
from ocr_platform_spark.extract.html_blocks import parse_blocks
from ocr_platform_spark.extract.segment import Segmented, segment_blocks
from ocr_platform_spark.functions.words import count_page_words

STAGE_CORRECT = "CORRECT"
STAGE_HTML = "CONVERT_TO_HTML"
STAGE_SEGMENT = "SEGMENT"
STAGE_PDF = "PDF_PARSE"

FLAG_NEEDS_REVIEW = "NEEDS_ADDITIONAL_REVIEW"  # ref schema.prisma PageFlag
FLAG_EMPTY = "EMPTY"


@dataclass
class ExtractionResult:
    url: str
    extracted_text: str            # byte-identical assertion target
    header: str | None
    body: str
    footnotes: str | None
    page_number: int | None
    total_words: int
    spans: list[tuple[int, int, int, str]]
    failed_stage: str | None = None
    reason: str | None = None
    flags: list[str] = field(default_factory=list)
    # lineage counters (BASELINE.json: docs in/out, bytes parsed,
    # blocks kept/dropped)
    bytes_parsed: int = 0
    blocks_kept: int = 0
    blocks_dropped: int = 0


def _failure(url: str, stage: str, reason: str, best_text: str = "",
             nbytes: int = 0) -> ExtractionResult:
    """Error envelope — keep best-so-far text, flag for review, never drop."""
    return ExtractionResult(
        url=url,
        extracted_text=best_text,
        header=None,
        body=best_text,
        footnotes=None,
        page_number=None,
        total_words=count_page_words(best_text, None),
        spans=[(0, 0, len(best_text), "body")] if best_text else [],
        failed_stage=stage,
        reason=reason,
        flags=[FLAG_NEEDS_REVIEW],
        bytes_parsed=nbytes,
    )


def correct_text(raw: str) -> str:
    """CORRECT stage: content-preserving normalization (P1).

    NFC Unicode normalization + newline canonicalization + removal of
    BOM/zero-width-space (NOT ZWNJ/ZWJ — they are meaningful in Arabic-script
    text). Mirrors the reference's "do not alter content" contract
    (correct.ts system prompt) — only encoding-level repair.
    """
    s = unicodedata.normalize("NFC", raw)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = s.replace("﻿", "").replace("​", "")
    return s


def extract_document(url: str, html: bytes | None,
                     transport_charset: str | None = None) -> ExtractionResult:
    """Full pipeline for one document. Never raises.

    ``transport_charset`` (optional) is the HTTP-header charset label a
    WARC-ingested row carries; with the default None the function stays a
    pure function of (url, html) — the pages-table/golden contract."""
    # ---- stage 1: CORRECT (decode + normalize) --------------------------
    if html is None or len(html) == 0:
        return _failure(url, STAGE_CORRECT, "empty html payload")
    if html[:5] == b"%PDF-":
        # crawl payloads are content-type-mixed: PDF bytes route to the
        # layout parser (functions/pdftext.py), same envelope out
        return extract_pdf_payload(url, html)
    nbytes = len(html)
    try:
        # WHATWG sniff: BOM > transport header label (WARC path only) >
        # meta-declared label > strict utf-8 > windows-1252 fallback
        # (extract/charset.py). Bit-identical with the previous
        # strict-utf-8-then-replace behavior for UTF-8 pages.
        raw, _enc = decode_html(html, transport_charset)
    except Exception as e:  # pragma: no cover - decode_html never raises
        return _failure(url, STAGE_CORRECT, f"undecodable: {e}", nbytes=nbytes)
    try:
        corrected = correct_text(raw)
    except Exception as e:
        return _failure(url, STAGE_CORRECT, f"normalize: {e}", nbytes=nbytes)
    if not corrected.strip():
        return _failure(url, STAGE_CORRECT, "blank after normalization", nbytes=nbytes)

    # ---- stage 2: CONVERT_TO_HTML (structure recovery) -------------------
    try:
        blocks = parse_blocks(corrected)
    except Exception as e:
        return _failure(url, STAGE_HTML, f"parse: {e}", nbytes=nbytes)
    if not blocks:
        return _failure(url, STAGE_HTML, "no text blocks", nbytes=nbytes)

    # ---- stage 3: SEGMENT -------------------------------------------------
    try:
        labelled = classify_blocks(blocks)
        seg: Segmented = segment_blocks(labelled)
    except Exception as e:
        best = "\n".join(b.text for b in blocks)
        return _failure(url, STAGE_SEGMENT, f"segment: {e}", best, nbytes=nbytes)

    flags: list[str] = []
    failed_stage = None
    reason = None
    if not seg.extracted_text:
        # everything classified away: keep best-so-far raw block text,
        # flag for review (ref page/worker.ts:41-46 fallback routing)
        best = "\n".join(b.text for b in blocks)
        res = _failure(url, STAGE_SEGMENT, "empty after segmentation", best,
                       nbytes=nbytes)
        res.blocks_dropped = seg.blocks_dropped
        return res
    if not seg.body:
        flags.append(FLAG_EMPTY)  # ref PageFlag.EMPTY (schema.prisma:93)

    return ExtractionResult(
        url=url,
        extracted_text=seg.extracted_text,
        header=seg.header,
        body=seg.body,
        footnotes=seg.footnotes,
        page_number=seg.page_number,
        total_words=count_page_words(seg.body, seg.footnotes),
        spans=seg.spans,
        failed_stage=failed_stage,
        reason=reason,
        flags=flags,
        bytes_parsed=nbytes,
        blocks_kept=seg.blocks_kept,
        blocks_dropped=seg.blocks_dropped,
    )


def extract_pdf_payload(url: str, data: bytes) -> ExtractionResult:
    """PDF branch of the pipeline: layout parse → same envelope (P2-P4 for
    the PDF half of the north rule). Regions come from the layout analyzer
    (functions/pdftext.py: XY-band + column reading order); the printed
    page number is excluded from the text like the HTML segmenter does.
    Never raises."""
    from ocr_platform_spark.functions.pdftext import PdfError, parse_pdf

    nbytes = len(data)
    try:
        pages = parse_pdf(data)
    except PdfError as e:
        return _failure(url, STAGE_PDF, str(e), nbytes=nbytes)
    except Exception as e:  # pragma: no cover - PdfError covers the subset
        return _failure(url, STAGE_PDF, f"parse: {e}", nbytes=nbytes)

    parts: list[str] = []
    spans: list[tuple[int, int, int, str]] = []
    bodies: list[str] = []
    feet: list[str] = []
    pos = 0
    block_id = 0
    kept = 0
    for p in pages:
        for text, kind in ((p.header, "header"), (p.body, "body"),
                           (p.footnotes, "footnotes")):
            if not text:
                continue
            text = correct_text(text)
            if parts:
                pos += 1                      # the "\n" joiner
            parts.append(text)
            spans.append((block_id, pos, pos + len(text), kind))
            pos += len(text)
            block_id += 1
            kept += 1
            if kind == "body":
                bodies.append(text)
            elif kind == "footnotes":
                feet.append(text)

    extracted = "\n".join(parts)
    if not extracted:
        return _failure(url, STAGE_PDF, "no text in PDF", nbytes=nbytes)
    body_all = "\n".join(bodies)
    feet_all = "\n".join(feet) or None
    return ExtractionResult(
        url=url,
        extracted_text=extracted,
        header=next((correct_text(p.header) for p in pages if p.header),
                    None),
        body=body_all,
        footnotes=feet_all,
        page_number=next((p.page_number for p in pages
                          if p.page_number is not None), None),
        total_words=count_page_words(body_all, feet_all),
        spans=spans,
        flags=[] if body_all else [FLAG_EMPTY],
        bytes_parsed=nbytes,
        blocks_kept=kept,
        blocks_dropped=0,
    )
