"""Bucketed-layout plan gates: a join of two tables co-bucketed on the
join key must run with ZERO Exchange nodes. (A local in-partition Sort
above each scan remains — Spark 3+ ignores sortBy metadata at read time
because a bucket may span several per-task files — and is asserted
PRESENT so a Spark upgrade that starts eliding it shows up here.)

This pins the storage half of the repo's recurring scale argument
(PLANS.md, sources/bucketed.py): at 10^12 docs, writing the extraction
output bucketed by url-hash means the recrawl-delta epoch join, the
frontier anti-join, and dedup keep-first all read pre-shuffled data —
the 100 TB shuffle never happens. The test also keeps an honesty
control: the SAME join over plain (non-bucketed) parquet MUST show an
Exchange, so the zero-Exchange assertion is known to be discriminating.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load
from ocr_platform_spark.sources.bucketed import read_table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    s = build_spark("bucketing-tests", cores=4)
    # AQE rewrites the join at runtime from shuffle stats; disabling it
    # here makes the compile-time plan the artifact under test. (On a
    # real cluster AQE keeps the bucketed scan exchanges-free too — it
    # only coalesces exchanges that exist.)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield s
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


@pytest.fixture(scope="module")
def epochs(spark):
    """Two crawl epochs of the documents table, co-bucketed on doc_id."""
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", "lang", F.length("text").alias("text_len"))
    write_bucketed(docs, "bk_epoch_a", "doc_id", 8)
    write_bucketed(docs.withColumn("text_len", F.col("text_len") + 1),
                   "bk_epoch_b", "doc_id", 8)
    yield ("bk_epoch_a", "bk_epoch_b")
    for t in ("bk_epoch_a", "bk_epoch_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_cobucketed_join_has_no_exchange(spark, epochs):
    a, b = epochs
    joined = read_table(spark, a).join(read_table(spark, b), "doc_id")
    p = plan_of(joined)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p
    # the scan itself must be bucket-aware, all buckets selected
    assert "Bucketed: true" in p and "SelectedBucketsCount: 8 out of 8" in p
    # local sorts remain (see module docstring) — they are in-partition,
    # not a shuffle; pin them so behavior changes are visible
    assert p.count("Sort [doc_id") == 2


def test_control_plain_parquet_join_does_exchange(spark):
    """Discriminating control: the same join without bucketing MUST
    shuffle — proves the assertion above isn't vacuously true."""
    docs = load(spark, SF_DIR, "documents").select("doc_id", "source")
    other = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    p = plan_of(docs.join(other, "doc_id"))
    assert "Exchange hashpartitioning" in p


def test_cobucketed_join_values_match_plain_join(spark, epochs):
    a, b = epochs
    bucketed = (read_table(spark, a).alias("x")
                .join(read_table(spark, b).alias("y"), "doc_id")
                .select("doc_id", F.col("x.text_len").alias("la"),
                        F.col("y.text_len").alias("lb")))
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", F.length("text").alias("la"))
    plain = docs.join(
        docs.withColumn("la", F.col("la") + 1)
            .withColumnRenamed("la", "lb"), "doc_id")
    assert sorted(bucketed.collect()) == sorted(plain.collect())
    assert bucketed.count() > 0
