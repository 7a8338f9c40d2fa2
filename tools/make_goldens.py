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

from ocr_platform_spark.datagen import gen_document
from ocr_platform_spark.extract import extract_document

N_DOCS = 64
SEED = 42
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "extraction_goldens.json"


def main() -> None:
    records = []
    for i in range(N_DOCS):
        d = gen_document(i, seed=SEED)
        r = extract_document(d["url"], d["html"])
        rec = dataclasses.asdict(r)
        rec["spans"] = [list(s) for s in rec["spans"]]
        records.append(rec)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(records, ensure_ascii=False, indent=1, sort_keys=True))
    print(f"wrote {len(records)} goldens → {OUT}")


if __name__ == "__main__":
    main()
