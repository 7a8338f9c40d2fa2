"""Heading-outline kernel + query pins (operators/outline.py)."""

from __future__ import annotations

from ocr_platform_spark.operators.outline import (OUTLINE_DOCS,
                                                  scan_headings)

SF_DIR = "/root/testdata/sf0.01"


def test_scan_order_levels_and_text():
    got = scan_headings(
        "<h1>Top</h1><p>x</p><h2>Sec <b>one</b></h2><h3>Sub</h3>")
    assert got == [(0, 1, "Top"), (1, 2, "Sec one"), (2, 3, "Sub")]


def test_scan_implied_close_on_next_heading():
    assert scan_headings("<h2>first<h2>second</h2>") == \
        [(0, 2, "first"), (1, 2, "second")]


def test_scan_cross_level_close_commits():
    assert scan_headings("<h2>open</h3>after") == [(0, 2, "open")]


def test_scan_open_heading_at_eof_never_commits():
    assert scan_headings("<h2>done</h2><h3>dangling") == [(0, 2, "done")]


def test_scan_comment_invisible_cdata_raw():
    assert scan_headings("<h2>a<!-- no -->b</h2>") == [(0, 2, "ab")]
    assert scan_headings(
        "<h2>x <script>a <!-- kept --></script></h2>") == \
        [(0, 2, "x a <!-- kept -->")]


def test_scan_entity_and_empty_and_selfclosed():
    assert scan_headings("<h4>&amp; more</h4>") == [(0, 4, "& more")]
    assert scan_headings("<h2></h2>") == [(0, 2, "")]
    assert scan_headings("<h2/><h3>n</h3>") == [(0, 2, ""), (1, 3, "n")]


def test_extract_headings_query_invariants(spark):
    """Natural page outlines: contiguous per-page indices, h2/h3 levels
    live, every text non-degenerate whitespace-normalized."""
    from ocr_platform_spark.operators.outline import extract_headings

    rows = extract_headings(spark, SF_DIR).collect()
    assert rows
    by_url: dict = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r["heading_idx"])
        assert 1 <= r["level"] <= 6
        assert r["text"] == " ".join(r["text"].split())
    for idxs in by_url.values():
        assert sorted(idxs) == list(range(len(idxs)))
    assert {2, 3} <= {r["level"] for r in rows}
