"""Sources / sinks: distributed page synthesis, parquet+manifest writer,
resume-aware reader. (SURVEY.md §2.1 S1-S9 re-expressed Spark-first.)"""

from ocr_platform_spark.sources.pages import pages_df, PAGES_SCHEMA  # noqa: F401
from ocr_platform_spark.sources.manifest import (  # noqa: F401
    write_with_manifest,
    read_manifest,
    pending_buckets,
)
