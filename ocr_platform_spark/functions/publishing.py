"""F6: publishing-details field extraction.

The reference extracts 5 nullable fields from a concatenated Arabic
publishing-details string with an LLM (ref apps/web/src/lib/openai/
extract-publishing-details.ts:5-59); we do it deterministically with
labelled-field regexes. Field labels (from the reference's prompt):

    المحقق = investigator          دار النشر = publisher
    مكان نشر الكتاب = publisher_location    رقم الطبعة = edition_number
    سنة النشر = publication_year (int, strips trailing هـ)
"""

from __future__ import annotations

import regex

from ocr_platform_spark.functions.digits import to_western_digits

_LABELS = {
    "investigator": r"المحقق",
    "publisher": r"دار النشر",
    "publisher_location": r"مكان نشر الكتاب",
    "edition_number": r"رقم الطبعة",
    "publication_year": r"سنة النشر",
}
# value = everything after "label :" up to the next " / " separator or EOS
_FIELD_RES = {
    k: regex.compile(rf"{lab}\s*:\s*([^/]*?)\s*(?:/|$)") for k, lab in _LABELS.items()
}
_YEAR_RE = regex.compile(r"([0-9٠-٩]{3,4})\s*هـ?")


def extract_publishing_details(s: str | None) -> dict:
    """Parse one details string → dict of 5 nullable fields."""
    out: dict = {
        "investigator": None,
        "publisher": None,
        "publisher_location": None,
        "edition_number": None,
        "publication_year": None,
    }
    if not s:
        return out
    for key, pat in _FIELD_RES.items():
        m = pat.search(s)
        if not m:
            continue
        val = m.group(1).strip()
        if not val:
            continue
        if key == "publication_year":
            ym = _YEAR_RE.search(val)
            out[key] = int(to_western_digits(ym.group(1))) if ym else None
        else:
            out[key] = val
    return out
