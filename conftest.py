"""Pytest root conftest — puts the repo root on sys.path so
``ocr_platform_spark`` imports without installation."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
