"""Pytest root conftest — puts the repo root on sys.path so
``ocr_platform_spark`` imports without installation."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))


@pytest.fixture(scope="session")
def spark():
    """Shared local SparkSession (created once; ~15 s JVM start)."""
    from ocr_platform_spark.session import build_spark

    s = build_spark("ocr-platform-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
