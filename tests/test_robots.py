"""Robots-exclusion gate (operators/robots.py): RFC 9309 subset semantics
— group attribution, longest-match, allow-wins-ties, default allow — plus
oracle parity at sf0.001 and the broadcast plan shape."""

from __future__ import annotations

import duckdb
import pytest

from ocr_platform_spark.operators import robots
from tools.check_oracles import row_multiset

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rules(spark):
    df = robots.parse_robots(robots.robots_corpus(spark))
    return {(r["host"], r["path"]): r for r in df.collect()}


def test_badbot_group_does_not_leak_into_star(rules):
    """Every host's robots.txt opens with a badbot group whose
    ``Disallow: /`` must bind to badbot only — h1 (no %3/%5 rule) must end
    up with exactly the one shared /private/ rule."""
    h1 = {k: v for k, v in rules.items() if k[0] == "h1.example.net"}
    assert set(h1) == {("h1.example.net", "/private/")}
    assert h1[("h1.example.net", "/private/")]["allow"] == 0


def test_rule_synthesis_families(rules):
    """h0 is %3 and %5: all four * rules present; the empty Disallow and
    the Crawl-delay line must not produce rules."""
    h0 = {p: rules[("h0.example.net", p)]
          for h, p in rules if h == "h0.example.net"}
    assert set(h0) == {"/private/", "/p/", "/p/open/", "/"}
    assert h0["/p/open/"]["allow"] == 1
    assert all(h0[p]["allow"] == 0 for p in ("/private/", "/p/", "/"))


def test_verdicts_longest_match_and_default_allow(spark):
    out = {r["o_orderkey"]: r
           for r in robots.cx_robots_filter(spark, SF_DIR).collect()}
    # o=21: %7==0 → /private/doc21 on h5 → blocked by /private/
    assert out[21]["allowed"] is False
    assert out[21]["matched_rule"] == "/private/"
    # o=36: %7==1 → /p/open/36 on h4... pick o=15: %7==1, host h15 (%3==0
    # AND %5==0) → the /p/open/ allow (len 8) must beat /p/ and /
    assert out[15]["allowed"] is True
    assert out[15]["matched_rule"] == "/p/open/"
    assert out[15]["rule_is_allow"] == 1
    # o=2: /p/2 on h2 (no %3/%5 rules) → no match → default allow
    assert out[2]["allowed"] is True
    assert out[2]["matched_rule"] is None
    assert out[2]["rule_is_allow"] is None
    # o=3: /p/3 on h3 (%3) → /p/ disallow
    assert out[3]["allowed"] is False and out[3]["matched_rule"] == "/p/"
    # o=5: /p/5 on h5 (%5 only) → catch-all / disallow
    assert out[5]["allowed"] is False and out[5]["matched_rule"] == "/"


def test_oracle_parity_sf0001(spark):
    """Spark parse-and-match == DuckDB formula-derived verdicts (the gate
    runs this at sf0.01; this pins it in-suite at sf0.001)."""
    df = robots.cx_robots_filter(spark, SF_DIR)
    cols = df.columns
    got = row_multiset([tuple(r) for r in df.collect()], cols)
    con = duckdb.connect()
    con.sql("CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/orders.parquet')")
    rel = con.sql(robots.CX_ROBOTS_SQL)
    want = row_multiset(rel.fetchall(), [d[0] for d in rel.description])
    assert got == want


def test_plan_broadcasts_rules_no_url_shuffle(spark):
    """The per-host rule arrays must broadcast and the URL side must be a
    pure projection: no sort-merge join, and no exchange anywhere keyed on
    a URL-side column (the only shuffles allowed are the tiny per-host
    rule parse below the BroadcastExchange)."""
    import re

    df = robots.cx_robots_filter(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "o_orderkey" not in keys and "url" not in keys, plan


def test_polite_frontier_semantics(spark):
    """Composition invariants: no disallowed target survives, no crawled
    url re-enters, every host respects the politeness cap, ranks are
    dense from 1."""
    from ocr_platform_spark.operators.robots import (
        CRAWLED_KEYS, FRONTIER_CAP, cx_polite_frontier)

    rows = cx_polite_frontier(spark, SF_DIR).collect()
    assert rows
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
        # robots gate: /private/ is disallowed on EVERY host; full-
        # disallow hosts (hk%5==0, unless /p/open/ allowed) never emit /p/
        assert "/private/" not in r["target"]
        # crawled set: url(k) embeds k, frontier keys are >= CRAWLED_KEYS
        key = int(r["target"].rsplit("/", 1)[-1].lstrip("docpen"))
        assert key >= CRAWLED_KEYS
    for host, hr in by_host.items():
        assert len(hr) <= FRONTIER_CAP
        ranks = sorted(r["fetch_rank"] for r in hr)
        assert ranks == list(range(1, len(hr) + 1))
        hk = int(host[1:].split(".")[0])
        if hk % 5 == 0:  # full-disallow host: only /p/open/ can survive
            assert all("/p/open/" in r["target"] for r in hr), (host, hr)
