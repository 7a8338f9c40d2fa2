"""F4: Western ↔ Eastern-Arabic digit translation.

Exact 1:1 codepoint mapping (ref apps/web/src/components/tailwind-editor/
arabic-numbers-extension.ts:36-121). Expressible JVM-side as
``F.translate(col, "0123456789", "٠١٢٣٤٥٦٧٨٩")`` — these Python versions
back the pandas-UDF paths and tests.
"""

from __future__ import annotations

_TO_EAST = str.maketrans("0123456789", "٠١٢٣٤٥٦٧٨٩")
_TO_WEST = str.maketrans("٠١٢٣٤٥٦٧٨٩", "0123456789")

WESTERN = "0123456789"
EASTERN = "٠١٢٣٤٥٦٧٨٩"


def to_arabic_digits(text: str) -> str:
    return text.translate(_TO_EAST)


def to_western_digits(text: str) -> str:
    return text.translate(_TO_WEST)
