"""Margin-based bitext mining (operators/bitext.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.operators.bitext import (MARGIN_THRESH_X1E6,
                                                 PLANT_ID_BASE, PLANT_MOD,
                                                 _sides, cx_bitext_mine,
                                                 mine_bitext)

SF_DIR = "/root/testdata/sf0.01"


def test_full_precision_and_recall_on_planted_translations(spark):
    rows = {r["src_id"]: r for r in cx_bitext_mine(spark, SF_DIR).collect()}
    src, _ = _sides(spark, SF_DIR)
    planted_srcs = {r["src_id"] for r in src.collect()
                    if r["src_id"] % PLANT_MOD == 1}
    # recall: every planted translation is mined...
    assert set(rows) == planted_srcs
    # ...precision: and mined AS its twin, nothing else crosses the bar
    for s, r in rows.items():
        assert r["tgt_id"] == s + PLANT_ID_BASE
        assert r["margin_x1e6"] >= MARGIN_THRESH_X1E6
        assert r["cos_x1e6"] > 900_000          # near-copy vector


def test_margin_beats_absolute_threshold_on_hubs(spark):
    """The criterion's reason to exist: a hub vector (near everything)
    must NOT be mined, even though its best cosine clears any absolute
    bar a true pair also clears."""
    import math

    dim = 8
    hubish = [1.0 / math.sqrt(dim)] * dim

    def unit(*idx):
        v = [0.0] * dim
        for i in idx:
            v[i] = 1.0 / math.sqrt(len(idx))
        return v

    # src A is a hub: cos ~0.5+ to every basis target. src B has one
    # true translation t0 and low cosine elsewhere.
    src = spark.createDataFrame(
        [(1, hubish), (2, unit(0, 1))], "src_id long, es array<double>")
    tgt = spark.createDataFrame(
        [(10, unit(0)), (11, unit(1)), (12, unit(2)), (13, unit(3)),
         (14, [x * 0.97 + 0.013 for x in unit(0, 1)])],
        "tgt_id long, et array<double>")
    got = {r["src_id"]: r for r in mine_bitext(src, tgt).collect()}
    assert 2 in got and got[2]["tgt_id"] == 14
    assert 1 not in got        # the hub's margin stays near 1.0


def test_guard_is_wired(spark):
    from unittest.mock import patch

    with patch("ocr_platform_spark.operators.bitext._guard_oracle_scale",
               side_effect=ValueError("quadratic oracle")) as g:
        with pytest.raises(ValueError, match="quadratic"):
            cx_bitext_mine(spark, SF_DIR)
        assert g.called
