"""Anchor extraction: kernel vectors, hostile payloads, plan shape, and
the links → host-graph chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_platform_spark.extract.links import extract_links
from ocr_platform_spark.operators.weblinks import links_df

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    return build_spark("weblinks-tests", cores=4)


def test_kernel_kinds_and_resolution():
    html = (b'<nav><a href="/m">Menu</a></nav>'
            b'<p><a href="c/d">rel</a> <a href="https://x.y/z">abs</a> '
            b'<a href="#f">frag</a> <a href="mailto:a@b">m</a> '
            b'<a>none</a></p>')
    out = extract_links("https://h.t/a/b", html)
    by = {lk.anchor_text: lk for lk in out}
    assert by["Menu"].kind == "relative" and by["Menu"].boilerplate
    assert by["Menu"].resolved == "https://h.t/m"
    assert by["rel"].resolved == "https://h.t/a/c/d"
    assert not by["rel"].boilerplate
    assert by["abs"].kind == "absolute" and by["abs"].resolved == "https://x.y/z"
    assert by["frag"].kind == "fragment" and by["frag"].resolved is None
    assert by["m"].kind == "other" and by["none"].kind == "other"


def test_kernel_chrome_classes_mark_boilerplate():
    html = b'<div class="sidebar"><a href="/s">S</a></div><p><a href="/c">C</a></p>'
    out = {lk.anchor_text: lk for lk in extract_links("https://h.t/", html)}
    assert out["S"].boilerplate and not out["C"].boilerplate


def test_kernel_never_raises_and_flushes_unclosed():
    assert extract_links("u", None) == []
    assert extract_links("u", b"") == []
    # truncated page: unclosed anchor still emitted
    # \xff\xff: invalid utf-8 but NOT a BOM (\xff\xfe would be a real
    # UTF-16-LE mark, which the charset sniffer now rightly honors)
    out = extract_links("https://h.t/", b"\xff\xff<p><a href='/x'>tail")
    assert len(out) == 1 and out[0].kind == "relative"
    # stray end tags must not underflow chrome depth
    out = extract_links("https://h.t/", b"</nav></nav><p><a href='/y'>y</a></p>")
    assert len(out) == 1 and not out[0].boilerplate


def test_kernel_fuzz_never_raises_and_is_deterministic():
    import random

    from ocr_platform_spark.datagen import gen_document

    rng = random.Random(11)
    base = gen_document(3, 42)["html"]
    for _ in range(200):
        # random byte mutations + truncations of a real page, plus noise
        blob = bytearray(base[:rng.randrange(len(base))])
        for _ in range(rng.randrange(8)):
            if blob:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        out1 = extract_links("https://h.t/p", bytes(blob))
        out2 = extract_links("https://h.t/p", bytes(blob))
        assert out1 == out2
        for lk in out1:
            assert lk.kind in ("absolute", "relative", "fragment", "other")
        assert [lk.link_no for lk in out1] == list(range(len(out1)))
        noise = bytes(rng.randrange(256) for _ in range(rng.randrange(300)))
        assert isinstance(extract_links("u", noise), list)


def test_links_plan_has_no_exchange(spark):
    from ocr_platform_spark.sources.pages import pages_df

    df = links_df(pages_df(spark, 50))
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p


def test_links_feed_the_host_graph(spark):
    """crawl → anchors → host edge list: the input wg_pagerank expects."""
    from ocr_platform_spark.sources.pages import pages_df

    links = links_df(pages_df(spark, 100))
    host = lambda c: F.regexp_extract(c, r"^[a-z]+://([^/]+)", 1)
    edges = (links.filter(F.col("kind") == "absolute")
             .select(host(F.col("url")).alias("src"),
                     host(F.col("resolved")).alias("dst"))
             .filter(F.col("src") != F.col("dst"))
             .distinct())
    assert edges.columns == ["src", "dst"]
    assert edges.count() >= 0  # structure over content: synthetic pages
    # relative links resolve onto the page's own host
    rel = (links.filter(F.col("kind") == "relative")
           .select(host(F.col("url")).alias("a"),
                   host(F.col("resolved")).alias("b")))
    assert rel.filter(F.col("a") != F.col("b")).count() == 0
