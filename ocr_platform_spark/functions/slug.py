"""F2: textToSlug — NFD normalize, strip combining diacritics, slugify.

Semantics from ref apps/web/src/lib/slug.ts:3-12 (NFD + strip U+0300-U+036F,
then slugify with lower+trim). Spark lacks NFD, so this runs in a pandas UDF.
"""

from __future__ import annotations

import re
import unicodedata

_COMBINING_RE = re.compile(r"[̀-ͯ]")
# slugify(lower, trim): non-alphanumeric runs → '-', keep unicode letters
_NON_WORD_RE = re.compile(r"[^\w]+", re.UNICODE)


def remove_diacritics(text: str) -> str:
    return _COMBINING_RE.sub("", unicodedata.normalize("NFD", text))


def text_to_slug(text: str) -> str:
    s = remove_diacritics(text).lower().strip()
    s = _NON_WORD_RE.sub("-", s)
    return s.strip("-")
