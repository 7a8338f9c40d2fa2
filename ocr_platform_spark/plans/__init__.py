"""End-to-end job plans (the flagship extraction job + derived queries)."""

from ocr_platform_spark.plans.extract_job import (  # noqa: F401
    extract_pages,
    run_extraction_job,
    with_bucket,
    EXTRACTED_SCHEMA,
)
