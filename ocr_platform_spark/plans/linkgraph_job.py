"""The composed crawl-analytics job: WARC crawl in, ranked hosts out.

    .warc.gz crawl files
      → parse (sources/warc.py, zero-shuffle container kernel)
      → clean captures (parse_error IS NULL, html present)
      → anchor extraction (operators/weblinks.py, zero-shuffle kernel)
      → host edge list (absolute cross-host links, distinct)
      → PageRank (operators/webgraph.py, exact-integer recurrence)

Everything upstream of the edge-list distinct is shuffle-free: WARC bytes
and page html stay on the executor that scanned them, and the first
exchange in the whole job operates on bare (src_host, dst_host) pairs —
the smallest possible representation of the crawl. This is the plan a
100 TB crawl wants: the 10^10-edge graph, not the 100 TB of html, is
what shuffles.

Reference parity: composes the reference's ingest → process → aggregate
flow (apps/queue/src/index.ts pipeline stages) into one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_platform_spark.operators.weblinks import links_df
from ocr_platform_spark.operators.webgraph import PR_ITERS, pagerank_ranks


def _host(col):
    return F.regexp_extract(col, r"^[a-z]+://([^/]+)", 1)


def host_edges(links: DataFrame) -> DataFrame:
    """Anchor rows → distinct cross-host edge list (the host web graph)."""
    return (links.filter(F.col("kind") == "absolute")
            .select(_host(F.col("url")).alias("src"),
                    _host(F.col("resolved")).alias("dst"))
            .filter((F.col("src") != F.col("dst")) & (F.col("dst") != ""))
            .distinct())


def run_linkgraph_job(spark: SparkSession, warc_glob: str,
                      iters: int = PR_ITERS) -> DataFrame:
    """crawl glob → (host, rank_x1e6), descending by rank."""
    from ocr_platform_spark.sources.warc import read_warc

    pages = read_warc(spark, warc_glob)
    clean = pages.filter(F.col("parse_error").isNull()
                         & F.col("html").isNotNull())
    edges = host_edges(links_df(clean.select("url", "html")))
    rank = pagerank_ranks(edges, iters)
    return (rank.select(F.col("h").alias("host"),
                        F.col("rank").alias("rank_x1e6"))
            .orderBy(F.desc("rank_x1e6"), "host"))
