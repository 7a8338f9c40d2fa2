"""HLL rollup mergeability (operators/sketches.py:ta_hll_rollup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.operators.sketches import (hll_distinct,
                                                   hll_estimate,
                                                   hll_registers,
                                                   ta_hll_rollup)
from ocr_platform_spark.operators.tables import load

SF_DIR = "/root/testdata/sf0.01"


def test_factored_path_matches_hll_distinct(spark):
    docs = load(spark, SF_DIR, "documents")
    want = {r["source"]: (r["n_reg_hit"], r["hll_est"])
            for r in hll_distinct(docs).collect()}
    got = {r["source"]: (r["n_reg_hit"], r["hll_est"])
           for r in hll_estimate(hll_registers(docs), "source")
           .select("source", "n_reg_hit", "hll_est").collect()}
    assert got == want


def test_merged_registers_equal_direct_corpus_sketch(spark):
    """Mergeability: register-wise MAX over per-host registers must give
    EXACTLY the estimate of a direct whole-corpus run — max is
    associative, so merge-then-estimate IS estimate-over-union."""
    docs = load(spark, SF_DIR, "documents")
    rows = {(r["level"], r["key"]): r
            for r in ta_hll_rollup(spark, SF_DIR).collect()}
    corpus = rows[("corpus", "<ALL>")]
    direct = hll_distinct(docs.withColumn("source", F.lit("<ALL>"))) \
        .collect()
    assert len(direct) == 1
    assert (corpus["n_reg_hit"], corpus["hll_est"]) == \
        (direct[0]["n_reg_hit"], direct[0]["hll_est"])
    # the corpus estimate dominates every single source's
    assert all(corpus["hll_est"] >= r["hll_est"]
               for k, r in rows.items() if k[0] == "source")
    # and the per-source rows are the hll_distinct rows verbatim
    per_src = {k[1]: (r["n_reg_hit"], r["hll_est"])
               for k, r in rows.items() if k[0] == "source"}
    want = {r["source"]: (r["n_reg_hit"], r["hll_est"])
            for r in hll_distinct(docs).collect()}
    assert per_src == want
