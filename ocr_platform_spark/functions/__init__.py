"""Scalar function library (pure Python — usable inside pandas UDFs and as
the DuckDB-facing oracle semantics). Mirrors SURVEY.md §2.4 (F1–F13)."""

from ocr_platform_spark.functions.words import (  # noqa: F401
    count_words,
    count_page_words,
    strip_html,
)
from ocr_platform_spark.functions.slug import text_to_slug  # noqa: F401
from ocr_platform_spark.functions.hijri import (  # noqa: F401
    gregorian_year_to_hijri_year,
    hijri_year_to_gregorian_year,
)
from ocr_platform_spark.functions.digits import (  # noqa: F401
    to_arabic_digits,
    to_western_digits,
)
from ocr_platform_spark.functions.publishing import extract_publishing_details  # noqa: F401
from ocr_platform_spark.functions.command_score import command_score  # noqa: F401
