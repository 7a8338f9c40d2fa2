"""Recrawl delta (operators/crawldelta.py): kind classification from the
full-outer join sides, bounded levenshtein probe, oracle parity."""

from __future__ import annotations

import duckdb
import pytest

from ocr_platform_spark.operators import crawldelta
from tools.check_oracles import row_multiset

SF_DIR = "/root/testdata/sf0.001"


def test_kinds_from_join_sides(spark):
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["doc_id", "text"])
    v2 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta!xx"), (9, "delta")], ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in crawldelta.crawl_delta(v1, v2).collect()}
    assert out[1]["kind"] == "unchanged" and out[1]["lev_probe"] is None
    # two-sided probe: 3 in the prefix window + 3 in the suffix window
    assert out[2]["kind"] == "changed" and out[2]["lev_probe"] == 6
    assert out[3]["kind"] == "gone" and out[3]["len_new"] is None
    assert out[9]["kind"] == "new" and out[9]["len_old"] is None


def test_epoch_synthesis_covers_every_kind(spark):
    from pyspark.sql import functions as F

    df = crawldelta.cx_crawl_delta(spark, SF_DIR)
    kinds = {r["kind"]: r["n"] for r in
             df.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert set(kinds) == {"new", "gone", "changed", "unchanged"}
    # every changed row carries a positive bounded probe
    bad = df.filter((F.col("kind") == "changed")
                    & ((F.col("lev_probe").isNull())
                       | (F.col("lev_probe") <= 0))).count()
    assert bad == 0


def test_oracle_parity_sf0001(spark):
    df = crawldelta.cx_crawl_delta(spark, SF_DIR)
    got = row_multiset([tuple(r) for r in df.collect()], df.columns)
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    rel = con.sql(crawldelta.CX_CRAWL_DELTA_SQL)
    want = row_multiset(rel.fetchall(), [d[0] for d in rel.description])
    assert got == want


def test_plan_single_key_join_no_cartesian(spark):
    plan = (crawldelta.cx_crawl_delta(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan
