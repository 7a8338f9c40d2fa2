"""Containment dedup (operators/containment.py)."""

from __future__ import annotations

import pytest

from ocr_platform_spark.operators.containment import (QUOTE_ID_BASE,
                                                      QUOTE_MOD,
                                                      containment_pairs,
                                                      dd_containment)

SF_DIR = "/root/testdata/sf0.01"


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_subset_direction_and_thresholds(spark):
    big = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(20)) + " totally new suffix here"
    other = " ".join(f"x{i}" for i in range(40))
    pairs = {(r["a_id"], r["b_id"]): r for r in containment_pairs(
        _corpus(spark, [(1, big), (2, quote), (3, other)])).collect()}
    assert set(pairs) == {(2, 1)}            # quote ⊂ big, one direction
    r = pairs[(2, 1)]
    # 18 prefix shingles shared; 4 suffix+boundary shingles unshared
    assert r["na"] == 22 and r["nb"] == 38 and r["inter"] == 18
    assert r["inter"] * 5 >= r["na"] * 4
    # equal-size twins are the symmetric pipeline's job: excluded
    assert containment_pairs(
        _corpus(spark, [(1, big), (2, big)])).collect() == []


def test_quote_pages_caught_where_jaccard_misses(spark):
    from ocr_platform_spark.operators.dedup import dd_ngram_jaccard

    cont = {(r["a_id"], r["b_id"])
            for r in dd_containment(spark, SF_DIR).collect()}
    assert cont
    # planted quotes dominate: quote id back to its source
    planted = {(a, b) for a, b in cont
               if a >= QUOTE_ID_BASE and a - QUOTE_ID_BASE == b}
    assert planted and all(b % QUOTE_MOD == 2 for _, b in planted)
    # the gap this operator exists for: none of these pairs clear the
    # symmetric 0.5-Jaccard bar (quote is ~40% of its source)
    jac = {tuple(sorted((r["a_id"], r["b_id"])))
           for r in dd_ngram_jaccard(spark, SF_DIR).collect()}
    assert all(tuple(sorted((a, b))) not in jac for a, b in planted)


def test_df_cap_scale_path_and_guard(spark):
    from ocr_platform_spark.operators.tables import load
    from ocr_platform_spark.operators.containment import _quote_corpus

    corpus = _quote_corpus(load(spark, SF_DIR, "documents"))
    exact = {(r["a_id"], r["b_id"]) for r in
             containment_pairs(corpus).collect()}
    capped = {(r["a_id"], r["b_id"]) for r in
              containment_pairs(corpus, df_cap=64).collect()}
    # the aggregator-suffix shingle (df = #quote pages > 64) is the
    # only hot posting; dropping it can only RAISE quote→source
    # containment, so the planted pairs survive capping...
    planted_exact = {p for p in exact if p[0] >= QUOTE_ID_BASE}
    planted_capped = {p for p in capped if p[0] >= QUOTE_ID_BASE}
    assert planted_exact and planted_exact <= planted_capped
    # ...and pairs not touching the capped shingle are bit-identical
    assert {p for p in exact if p[0] < QUOTE_ID_BASE} == \
        {p for p in capped if p[0] < QUOTE_ID_BASE}
    with pytest.raises(ValueError, match="quadratic"):
        dd_containment(spark, SF_DIR, max_rows=10)
