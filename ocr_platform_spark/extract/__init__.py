"""Pure-Python extraction core.

This package MUST NOT import pyspark: it is the single source of truth
("oracle") for per-document extraction semantics. The Spark job calls exactly
these functions inside Arrow-batched pandas UDFs, and the golden-file tests
pin their output byte-for-byte. Determinism rule: every function here is a
pure function of its input bytes — no env, locale, time, or cross-row state.
"""

from ocr_platform_spark.extract.pipeline import (  # noqa: F401
    ExtractionResult,
    extract_document,
)
from ocr_platform_spark.extract.html_blocks import Block, parse_blocks  # noqa: F401
from ocr_platform_spark.extract.classify import classify_blocks  # noqa: F401
from ocr_platform_spark.extract.segment import segment_blocks  # noqa: F401
