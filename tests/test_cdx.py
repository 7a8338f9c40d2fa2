"""SURT keys + CDX capture index (operators/cdx.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_platform_spark.operators.cdx import (LOOKUP_PREFIX, cdx_lookup,
                                              cx_cdx_index, cx_cdx_lookup,
                                              surt_key)

SF_DIR = "/root/testdata/sf0.01"


def _surt(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["s"] for r in
            df.select(surt_key(F.col("url")).alias("s")).collect()]


def test_surt_key_pins(spark):
    got = _surt(
        spark,
        "https://docs.example.com/a/1?b=2&a=1",
        "https://WWW.Example.COM:443/items?a=1#frag",
        "http://example.com",
        "https://shop.example.co.uk/c/9",
        "https://www.example.com/a/1?a=1&b=2",
    )
    assert got == [
        "com,example,docs)/a/1?a=1&b=2",    # host reversed, params sorted
        "com,example)/items?a=1",           # www+port stripped, frag dropped
        "com,example)/",                    # empty path → '/'
        "uk,co,example,shop)/c/9",          # ccTLD NOT special-cased
        "com,example)/a/1?a=1&b=2",
    ]
    # the param-order variants collapse to one key
    assert _surt(spark, "https://x.org/p?b=2&a=1") == \
        _surt(spark, "https://x.org/p?a=1&b=2")


def test_subtree_prefix_covers_subdomains_only(spark):
    idx = cx_cdx_index(spark, SF_DIR)
    hit_hosts = {r["url"].split("/")[2]
                 for r in idx.where(
                     F.col("surt").startswith(LOOKUP_PREFIX)).collect()}
    assert hit_hosts == {"www.example.com", "docs.example.com",
                         "example.com"}
    # one contiguous range: sample.org and the .co.uk host sort outside
    miss = {r["url"].split("/")[2]
            for r in idx.where(
                ~F.col("surt").startswith(LOOKUP_PREFIX)).collect()}
    assert miss == {"blog.sample.org", "shop.example.co.uk"}


def test_lookup_prefix_respects_label_boundary(spark):
    """An unrelated host that merely EXTENDS the last label must not
    match the subtree (the self-review catch)."""
    idx = spark.createDataFrame(
        [("com,example)/a", "https://example.com/a", "2024-01-01", 1),
         ("com,example,docs)/b", "https://docs.example.com/b",
          "2024-01-02", 2),
         ("com,example-shop)/c", "https://example-shop.com/c",
          "2024-01-03", 3),
         ("com,examplezzz)/d", "https://examplezzz.com/d",
          "2024-01-04", 4)],
        "surt string, url string, captured string, o_orderkey long")
    got = {r["surt"] for r in cdx_lookup(idx, "com,example").collect()}
    assert got == {"com,example)/a", "com,example,docs)/b"}


def test_lookup_latest_capture_aggregate(spark):
    rows = {r["surt"]: r for r in cx_cdx_lookup(spark, SF_DIR).collect()}
    assert rows
    idx = cx_cdx_index(spark, SF_DIR).collect()
    # re-captures exist (k DIV 7 groups several keys onto one url)
    assert any(r["n_captures"] > 1 for r in rows.values())
    # per-surt latest date matches a brute recomputation
    brute: dict = {}
    for r in idx:
        if r["surt"].startswith((LOOKUP_PREFIX + ")",
                                 LOOKUP_PREFIX + ",")):
            cur = brute.get(r["surt"])
            if cur is None or r["captured"] > cur:
                brute[r["surt"]] = r["captured"]
    assert {s: r["latest_capture"] for s, r in rows.items()} == brute


def test_sorted_parquet_lookup_pushes_startswith(spark, tmp_path):
    """The layout claim: a surt-sorted index makes a subtree lookup a
    pruned range scan — the StartsWith predicate must reach the parquet
    scan (PushedFilters), riding min/max stats past non-matching files."""
    path = str(tmp_path / "cdx")
    cx_cdx_index(spark, SF_DIR).withColumn(
        "o_orderkey", F.lit(0)).repartitionByRange(
        8, "surt").sortWithinPartitions("surt").write.parquet(path)
    rd = spark.read.parquet(path)
    plan = cdx_lookup(rd, LOOKUP_PREFIX) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "StartsWith" in plan, plan
    got = {r["surt"] for r in cdx_lookup(rd, LOOKUP_PREFIX).collect()}
    want = {r["surt"] for r in cx_cdx_lookup(spark, SF_DIR).collect()}
    assert got == want
