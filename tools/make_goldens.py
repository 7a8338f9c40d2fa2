"""Regenerate the committed golden extraction fixtures.

Run: python tools/make_goldens.py
Writes tests/fixtures/extraction_goldens.json — 64 synthetic docs (seed 42)
through the pure-Python oracle. The pytest suite and the Spark path must both
match these byte-for-byte (BASELINE.json correctness gate).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ocr_platform_spark.datagen import adversarial_pages, gen_document
from ocr_platform_spark.extract import extract_document

N_DOCS = 64
SEED = 42
FIXTURES = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
OUT = FIXTURES / "extraction_goldens.json"
OUT_ADV = FIXTURES / "adversarial_goldens.json"


def _record(url: str, html: bytes) -> dict:
    rec = dataclasses.asdict(extract_document(url, html))
    rec["spans"] = [list(s) for s in rec["spans"]]
    return rec


def main() -> None:
    records = [_record(d["url"], d["html"])
               for d in (gen_document(i, seed=SEED) for i in range(N_DOCS))]
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(records, ensure_ascii=False, indent=1, sort_keys=True))
    print(f"wrote {len(records)} goldens → {OUT}")

    adv = [_record(d["url"], d["html"]) for d in adversarial_pages()]
    OUT_ADV.write_text(json.dumps(adv, ensure_ascii=False, indent=1,
                                  sort_keys=True))
    print(f"wrote {len(adv)} adversarial goldens → {OUT_ADV}")


if __name__ == "__main__":
    main()
