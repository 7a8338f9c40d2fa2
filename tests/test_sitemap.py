"""Sitemap ingestion (operators/sitemap.py): real from_xml parse, entry
order/field fidelity, robots-verdict composition, oracle parity at the
generation scale, and the shuffle-free plan."""

from __future__ import annotations

import duckdb
import pytest

from ocr_platform_spark.operators import sitemap
from tools.check_oracles import row_multiset


@pytest.fixture(scope="module")
def rows(spark):
    return sorted(
        (tuple(r) for r in sitemap.cx_sitemap(spark, "unused").collect()))


def test_entry_counts_per_host(rows):
    """Host k declares 5 + k%4 entries; the XML parse must keep them all
    (104 total across 16 hosts)."""
    per_host = {}
    for host, *_ in rows:
        per_host[host] = per_host.get(host, 0) + 1
    assert sum(per_host.values()) == 104
    assert per_host["h0.example.net"] == 5
    assert per_host["h3.example.net"] == 8


def test_fields_round_trip_and_verdicts(rows):
    byk = {(r[0], r[1]): r for r in rows}
    # h0 entry 0: /p/open/s0, k%3==0 host → allowed, priority 1.0 → 100
    h0e0 = byk[("h0.example.net", 0)]
    assert h0e0[2] == "https://h0.example.net/p/open/s0"
    assert h0e0[3] == "2026-01-01" and h0e0[4] == "daily"
    assert h0e0[5] == 100 and h0e0[6] is True
    # h0 entry 2: /private/s2 → blocked; monthly; priority 0.8 → 80
    h0e2 = byk[("h0.example.net", 2)]
    assert h0e2[4] == "monthly" and h0e2[5] == 80 and h0e2[6] is False
    # h1: no host rules beyond /private/ → /p/s1 default-allowed
    assert byk[("h1.example.net", 1)][6] is True
    # h5 (k%5==0): catch-all / blocks even /p/open/ (no allow rule there)
    assert byk[("h5.example.net", 0)][6] is False


def test_oracle_parity(spark):
    df = sitemap.cx_sitemap(spark, "unused")
    got = row_multiset([tuple(r) for r in df.collect()], df.columns)
    con = duckdb.connect()
    rel = con.sql(sitemap.CX_SITEMAP_SQL)
    want = row_multiset(rel.fetchall(), [d[0] for d in rel.description])
    assert got == want


def test_plan_shuffle_free_above_broadcast(spark):
    """One from_xml + explode + broadcast join: no exchange keyed on the
    entry stream (the only exchanges build the tiny rule arrays)."""
    import re

    plan = (sitemap.cx_sitemap(spark, "unused")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "loc" not in keys and "entry_no" not in keys, plan
