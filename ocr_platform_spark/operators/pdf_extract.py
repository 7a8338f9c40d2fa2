"""PDF layout extraction as a Spark operator (north rule: "PDF/layout
parse … reading-order reconstruction").

``extract_pdf_pages`` renders each ``documents`` row into a deterministic
layout-bearing PDF (functions/pdftext.build_pdf — scrambled draw order,
1–2 columns, header/footnote/page-number bands) and parses it back with
the pure-stdlib layout analyzer (parse_pdf), exploding to one row per
physical page. Both halves run inside ONE Arrow-batched ``mapInPandas``
kernel, so no PDF bytes ever cross a shuffle — at 100 TB the stage is
embarrassingly parallel over the scan, and the output rows (text only)
are a fraction of the rendered payload size.

Correctness: the driver's DuckDB oracle reads a fixture parquet staged by
``tools/make_driver_fixtures.py`` running the same pure-Python codec
outside Spark (an independent recomputation of the full pipeline, same
pattern as extract_pages); pytest additionally pins a word-perfect
round-trip (body+footnotes == original text) and adversarial layouts.

Reference parity: PDF page fan-out and per-page text recovery
(apps/queue/src/lib/ocr.ts:35-54 page splitting; pipeline/segment.ts
region typing).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from ocr_platform_spark.operators.registry import fixture_sql as _fixture_sql
from ocr_platform_spark.operators.tables import load

PDF_PAGES_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("page_no", IntegerType(), False),
    StructField("n_pages", IntegerType(), False),
    StructField("n_columns", IntegerType(), False),
    StructField("n_lines", IntegerType(), False),
    StructField("page_number", IntegerType(), True),
    StructField("header", StringType(), True),
    StructField("body", StringType(), False),
    StructField("footnotes", StringType(), True),
    StructField("parse_error", StringType(), True),
])


def pdf_pages_rows(doc_id: int, text: str) -> list[dict]:
    """Pure-Python kernel: render → parse → per-page rows. Never raises;
    malformed input routes into ``parse_error`` (never-drop contract).

    A deterministic slice of the corpus arrives ENCRYPTED (the reference
    opens such PDFs with ignoreEncryption, apps/queue/src/lib/ocr.ts:21-24):
    doc_id % 31 == 9 carries a real user password — those rows must land as
    stable ``parse_error="encrypted PDF (password required)"`` rows — while
    doc_id % 7 == 3 is encrypted but openable (empty user password, the
    common real-world form) and must decrypt to the identical pages."""
    from ocr_platform_spark.functions.pdftext import (
        PdfError, build_pdf, encrypt_pdf, parse_pdf)

    try:
        data = build_pdf(doc_id, text or "")
        if doc_id % 31 == 9:
            data = encrypt_pdf(data, user_pw=b"pw-%d" % doc_id)
        elif doc_id % 7 == 3:
            data = encrypt_pdf(data)
        pages = parse_pdf(data)
    except PdfError as e:
        return [{"doc_id": doc_id, "page_no": 0, "n_pages": 0,
                 "n_columns": 0, "n_lines": 0, "page_number": None,
                 "header": None, "body": "", "footnotes": None,
                 "parse_error": str(e)}]
    return [{"doc_id": doc_id, "page_no": p.page_no, "n_pages": len(pages),
             "n_columns": p.n_columns, "n_lines": p.n_lines,
             "page_number": p.page_number, "header": p.header,
             "body": p.body, "footnotes": p.footnotes, "parse_error": None}
            for p in pages]


def extract_pdf_pages(spark: SparkSession, sf_dir: str,
                      enforce_fixture_pin: bool = True) -> DataFrame:
    # The Spark plan is scale-free; the pin only protects the driver gate,
    # whose oracle fixture is staged from sf0.01 documents (same contract
    # as ann_ivf_topk).
    if enforce_fixture_pin:
        from ocr_platform_spark.operators.registry import assert_fixture_scale

        assert_fixture_scale(sf_dir, "extract_pdf_pages")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PDF_PAGES_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                rows.extend(pdf_pages_rows(int(doc_id), text))
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(kernel, PDF_PAGES_SCHEMA)


QUERIES: dict = {
    "extract_pdf_pages": (
        extract_pdf_pages,
        _fixture_sql("extract_pdf_pages.sf0.01.parquet")),
}
