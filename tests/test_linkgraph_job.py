"""End-to-end crawl analytics: a hand-built .warc.gz crawl with a KNOWN
cross-host link structure goes in; PageRank ranks come out equal to the
pure-Python replica over the same edge set. Also pins the job's scale
contract: nothing upstream of the bare host-pair distinct shuffles."""

from __future__ import annotations

import pytest

from ocr_platform_spark.plans.linkgraph_job import host_edges, run_linkgraph_job
from ocr_platform_spark.sources.warc import response_record, write_warc
from tests.test_webgraph import _python_pagerank


@pytest.fixture(scope="module")
def spark():
    from ocr_platform_spark.session import build_spark
    return build_spark("linkgraph-tests", cores=4)


def _page(host: str, outlinks: list[str], nav: list[str] = ()) -> bytes:
    nav_html = "".join(f'<a href="https://{h}/x">nav</a>' for h in nav)
    body = "".join(f'<p><a href="https://{h}/p">to {h}</a> text</p>'
                   for h in outlinks)
    return (f"<html><body><nav>{nav_html}</nav>"
            f"<main>{body}<a href='/self'>rel</a>"
            f"<a href='#f'>frag</a></main></body></html>").encode()


# a.com -> b.com, c.com ; b.com -> c.com ; c.com -> a.com ; d.com isolated
# source (links out to a.com only)
_CRAWL = {
    "a.com": ["b.com", "c.com"],
    "b.com": ["c.com"],
    "c.com": ["a.com"],
    "d.com": ["a.com"],
}


@pytest.fixture(scope="module")
def crawl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crawl")
    recs = []
    for i, (host, outs) in enumerate(sorted(_CRAWL.items())):
        recs.append(response_record(
            f"https://{host}/page{i}", f"2026-01-02T00:00:0{i}Z",
            _page(host, outs, nav=["nav-chrome.com"])))
    write_warc(d / "crawl-00.warc.gz", recs)
    return str(d)


def test_linkgraph_matches_python_replica(spark, crawl_dir):
    got = {r["host"]: r["rank_x1e6"]
           for r in run_linkgraph_job(spark, crawl_dir + "/*.warc.gz",
                                      iters=10).collect()}
    # expected edges: the declared cross-host links PLUS the nav chrome
    # target (extraction is never-drop; boilerplate filtering is a
    # downstream choice, not the extractor's)
    edges = {(s, d) for s, outs in _CRAWL.items() for d in outs}
    edges |= {(s, "nav-chrome.com") for s in _CRAWL}
    want = _python_pagerank(edges)
    assert got == want
    # structure sanity: c.com has two in-links from ranked hosts and must
    # outrank the isolated-source d.com
    assert got["c.com"] > got["d.com"]


def test_host_edges_drop_self_and_non_absolute(spark, crawl_dir):
    from ocr_platform_spark.operators.weblinks import links_df
    from ocr_platform_spark.sources.warc import read_warc

    links = links_df(read_warc(spark, crawl_dir + "/*.warc.gz")
                     .select("url", "html"))
    edges = {(r["src"], r["dst"]) for r in host_edges(links).collect()}
    assert ("a.com", "a.com") not in edges          # /self resolved on-host
    assert all(s and d for s, d in edges)
    assert ("a.com", "b.com") in edges


def test_links_stream_matches_batch_and_is_exactly_once(spark, tmp_path):
    """Two crawl drops drained by two availableNow runs: the accumulated
    streamed links equal one batch pass over both files (same kernel),
    and the first file is NOT reprocessed on the second drain."""
    from ocr_platform_spark.operators.weblinks import links_df
    from ocr_platform_spark.plans.linkgraph_job import run_links_stream
    from ocr_platform_spark.sources.warc import read_warc

    crawl = tmp_path / "crawl"
    out = str(tmp_path / "links")
    ckpt = str(tmp_path / "ckpt")
    write_warc(crawl / "drop-1.warc.gz", [response_record(
        "https://a.com/1", "2026-01-02T00:00:00Z", _page("a.com", ["b.com"]))])
    run_links_stream(spark, str(crawl), out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    write_warc(crawl / "drop-2.warc.gz", [response_record(
        "https://c.com/2", "2026-01-02T00:01:00Z", _page("c.com", ["a.com"]))])
    run_links_stream(spark, str(crawl), out, ckpt).awaitTermination(120)

    streamed = sorted(
        tuple(r) for r in spark.read.parquet(out)
        .select("url", "link_no", "href_raw", "kind").collect())
    batch = sorted(
        tuple(r) for r in
        links_df(read_warc(spark, str(crawl) + "/*.warc.gz")
                 .select("url", "html"))
        .select("url", "link_no", "href_raw", "kind").collect())
    assert streamed == batch          # same kernel, exactly-once per file


def test_upstream_of_edge_distinct_is_shuffle_free(spark, crawl_dir):
    from ocr_platform_spark.operators.weblinks import links_df
    from ocr_platform_spark.sources.warc import read_warc

    links = links_df(read_warc(spark, crawl_dir + "/*.warc.gz")
                     .select("url", "html"))
    p = links._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    # the first exchange in the whole job is the distinct over bare pairs
    pe = host_edges(links)._jdf.queryExecution().executedPlan().toString()
    assert pe.count("Exchange") <= 2   # AQE pair: partial/final distinct
