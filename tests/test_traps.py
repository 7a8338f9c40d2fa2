"""Crawl-trap detection (operators/traps.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.operators.tables import load
from ocr_platform_spark.operators.traps import (TRAP_CAP, _fetch_log,
                                                cx_trap_detect,
                                                trap_families)

SF_DIR = "/root/testdata/sf0.01"


def test_flags_both_trap_classes_only(spark):
    rows = {(r["host"], r["template"]): r
            for r in cx_trap_detect(spark, SF_DIR).collect()}
    assert set(rows) == {
        ("trap.example.net", "/cal/D/D/view"),   # calendar: one content
        ("shop.example.com", "/item/D"),         # session ids: few contents
    }
    cal = rows[("trap.example.net", "/cal/D/D/view")]
    assert cal["n_contents"] == 1 and cal["n_urls"] >= 100
    sid = rows[("shop.example.com", "/item/D")]
    assert sid["n_contents"] * 5 <= sid["n_urls"]


def test_honest_families_survive(spark):
    """The archive (distinct content per url) and the small misc
    families must NOT flag — the detector's false-positive contract."""
    orders = load(spark, SF_DIR, "orders").where(
        F.col("o_orderkey") < TRAP_CAP)
    fam = (_fetch_log(orders)
           .groupBy(F.regexp_extract("url", r"^https?://([^/]+)", 1)
                    .alias("host"))
           .agg(F.countDistinct("url").alias("u"),
                F.countDistinct("content_key").alias("c"))
           .collect())
    stats = {r["host"]: r for r in fam}
    # the archive is BIGGER than the flagged families and fully distinct
    assert stats["blog.example.org"]["u"] == stats["blog.example.org"]["c"]
    assert stats["blog.example.org"]["u"] >= 100
    flagged_hosts = {r["host"]
                     for r in cx_trap_detect(spark, SF_DIR).collect()}
    assert "blog.example.org" not in flagged_hosts
    assert "misc.example.org" not in flagged_hosts


def test_min_family_guard(spark):
    df = spark.createDataFrame(
        [(f"https://x.org/a/{i}", "same") for i in range(9)],
        "url string, content_key string")
    assert trap_families(df).collect() == []          # 9 < MIN_FAMILY
    df10 = spark.createDataFrame(
        [(f"https://x.org/a/{i}", "same") for i in range(10)],
        "url string, content_key string")
    got = trap_families(df10).collect()
    assert len(got) == 1 and got[0]["template"] == "/a/D"
