"""Static guard: no per-row Python in the engine (SURVEY.md §4.2.2).

BASELINE.json mandates 'no per-row Python' — all Python execution must go
through Arrow-batched pandas APIs (mapInPandas / pandas_udf / applyInPandas).
This test greps the package source for the forbidden constructs.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "ocr_platform_spark"

FORBIDDEN = [
    (re.compile(r"\bF\.udf\b|\bfunctions\.udf\b|@udf\b"), "row-at-a-time Python UDF"),
    (re.compile(r"\.rdd\b"), "RDD access"),
    (re.compile(r"\bsparkContext\.parallelize\b"), "driver-side parallelize"),
    (re.compile(r"\.toPandas\(\)"), "driver-side toPandas in engine code"),
]


def test_no_forbidden_constructs():
    offenders = []
    for path in PKG.rglob("*.py"):
        text = path.read_text()
        for pat, why in FORBIDDEN:
            for m in pat.finditer(text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.relative_to(PKG.parent)}:{line} — {why}")
    assert not offenders, "\n".join(offenders)
