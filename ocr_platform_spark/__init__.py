"""ocr_platform_spark — a from-scratch PySpark-native document-extraction
engine with the query/data-processing capabilities of seemorg/ocr-platform.

Layout:
    extract/    pure-Python extraction core (NO Spark imports) — the oracle
    functions/  scalar function library (word count, slug, hijri, digits, ...)
    operators/  relational operator builders (filters, joins, aggregates, ...)
    sources/    read/write helpers (parquet with Iceberg-style manifests)
    plans/      end-to-end job plans (the flagship extraction job)
    streaming/  structured-streaming variants of the batch operators
"""

__version__ = "0.1.0"
