from ocr_platform_spark.streaming.ingest import (  # noqa: F401
    extract_stream, run_ingest_stream)
