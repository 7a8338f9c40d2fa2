"""SCD-2 temporal history merge (operators/scd2.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.operators.scd2 import (EPOCH1, EPOCH2,
                                               cx_scd2_history,
                                               scd2_merge)

SF_DIR = "/root/testdata/sf0.01"


def _v(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merge_emits_all_four_classes(spark):
    v1 = _v(spark, [(1, "same"), (2, "before"), (3, "going away")])
    v2 = _v(spark, [(1, "same"), (2, "after"), (4, "brand new")])
    rows = sorted(((r["doc_id"], r["valid_from"], r["valid_to"])
                   for r in scd2_merge(v1, v2).collect()))
    assert rows == [
        (1, EPOCH1, None),          # unchanged: one open row
        (2, EPOCH1, EPOCH2),        # changed: closed predecessor...
        (2, EPOCH2, None),          # ...plus the open successor
        (3, EPOCH1, EPOCH2),        # gone: closed, nothing opens
        (4, EPOCH2, None),          # new: open from epoch 2
    ]
    # the two doc-2 versions carry distinct content identities
    md5s = {r["content_md5"] for r in scd2_merge(v1, v2).collect()
            if r["doc_id"] == 2}
    assert len(md5s) == 2


def test_history_invariants_on_driver_corpus(spark):
    rows = cx_scd2_history(spark, SF_DIR).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        # at most one OPEN row per url, ever
        assert sum(1 for r in doc_rows if r["valid_to"] is None) <= 1
        # intervals never invert
        for r in doc_rows:
            if r["valid_to"] is not None:
                assert r["valid_from"] < r["valid_to"]
    # every planted class is live
    n_open = sum(1 for r in rows if r["valid_to"] is None)
    n_closed = len(rows) - n_open
    assert n_open > 0 and n_closed > 0
    assert any(len(v) == 2 for v in by_doc.values())      # changed docs
    gone = [v for v in by_doc.values()
            if len(v) == 1 and v[0]["valid_to"] is not None]
    assert gone                                           # vanished docs
